"""End-to-end pipeline tests on synthetic CSVs: schema, sentinel semantics,
ordering, error containment (SURVEY.md C10-C13)."""

import datetime
import os

import numpy as np
import pytest

from montecarlooptionspricer_tpu.config import (AUGMENTED_COLUMNS,
                                                MarketDefaults,
                                                PipelineConfig, PricingConfig)
from montecarlooptionspricer_tpu.pipeline import csv_io, spot
from montecarlooptionspricer_tpu.pipeline.driver import run_pipeline
from montecarlooptionspricer_tpu.pipeline.writer import (OrderedResultWriter,
                                                         SafeFileWriter)

OPTION_HEADER = ("ticker,option_type,quote_date,underlying_last,dte,"
                 "strike_distance_pct,delta,gamma,vega,theta,rho,iv,volume,"
                 "last,dividend")


def make_spot_csv(path, rng, tickers=("aapl", "msft"), days=400,
                  end=datetime.date(2023, 6, 30)):
    header = ["Date"] + [t.upper() for t in tickers]
    rows = []
    prices = {t: 100.0 for t in tickers}
    for back in range(days, -1, -1):
        d = end - datetime.timedelta(days=back)
        row = [f"{d.month}/{d.day}/{d.year}"]
        for t in tickers:
            prices[t] *= float(np.exp(rng.normal(0.0003, 0.012)))
            row.append(f"{prices[t]:.4f}")
        rows.append(row)
    csv_io.write_csv(path, header, rows)
    return {t: prices[t] for t in tickers}


def make_option_csv(path, rows):
    with open(path, "w") as f:
        f.write(OPTION_HEADER + "\n")
        for r in rows:
            f.write(r + "\n")


@pytest.fixture
def workdir(tmp_path, rng, monkeypatch):
    monkeypatch.chdir(tmp_path)
    finals = make_spot_csv("nasdaq_stock_data.csv", rng)
    return finals


def opt_row(ticker="AAPL", option_type=0, date="6/30/2023", s=100.0, dte=30.0,
            sdp=0.02, dividend="0.01"):
    # ticker is lowercased by the spot loader; option rows use the raw token.
    return (f"{ticker.lower()},{option_type},{date},{s},{dte},{sdp},"
            f"0.5,0.01,0.2,-0.05,0.03,0.25,100,2.5,{dividend}")


def read_output(path="option_data_augmented.csv"):
    header, rows = csv_io.read_table(path)
    return header, rows


def test_pipeline_end_to_end(workdir):
    # Anchor underlying_last at the simulated final spot so the strike
    # (underlying_last * (1 - sdp), PredictionGen.cpp:704) tracks the path
    # start S0 = hist[-1] and the options are near-the-money.
    s = round(workdir["aapl"], 4)
    make_option_csv("option_data.csv", [
        opt_row(option_type=0, dte=30.0, s=s, sdp=-0.02),
        opt_row(option_type=1, dte=30.0, s=s, sdp=0.02),
        opt_row(option_type=0, dte=45.0, s=s, sdp=-0.02),
    ])
    rc = run_pipeline(PipelineConfig(), PricingConfig(rows_per_batch=4),
                      MarketDefaults())
    assert rc == 0
    header, rows = read_output()
    assert header[-6:] == list(AUGMENTED_COLUMNS)
    assert len(rows) == 3
    for row in rows:
        vals = [float(v) for v in row[-6:]]
        assert all(np.isfinite(vals))
        # vol/momentum computed from 400-day history must be nonzero
        assert vals[4] > 0.0
        # at least one pricer produced a nonzero price
        assert any(abs(v) > 0 for v in vals[:4])
    assert os.path.exists("error_log.txt")
    assert os.path.exists("spot_data_diagnostic.csv")


def test_pipeline_sentinel_rows(workdir):
    make_option_csv("option_data.csv", [
        "too,short,row",                                   # <15 cols
        opt_row(s="-5.0"),                                 # invalid numeric
        opt_row(ticker="ZZZZ"),                            # no spot history
        opt_row(dte=0.5),                                  # 0 steps
        opt_row(),                                         # good row
    ])
    rc = run_pipeline(PipelineConfig(), PricingConfig(rows_per_batch=4),
                      MarketDefaults())
    assert rc == 0
    _, rows = read_output()
    assert len(rows) == 5
    for i in (0, 1, 2, 3):
        assert rows[i][-6:] == ["0"] * 6, rows[i]
    assert any(float(v) != 0.0 for v in rows[4][-6:])
    # order preserved: first token of each output row matches input order
    assert rows[0][0] == "too"


def test_pipeline_backup_of_existing_output(workdir):
    make_option_csv("option_data.csv", [opt_row()])
    with open("option_data_augmented.csv", "w") as f:
        f.write("old contents\n")
    run_pipeline(PipelineConfig(), PricingConfig(rows_per_batch=2),
                 MarketDefaults())
    assert open("option_data_augmented.backup.csv").read() == "old contents\n"


def test_pipeline_deterministic(workdir):
    make_option_csv("option_data.csv", [opt_row(), opt_row(dte=60.0)])
    run_pipeline(PipelineConfig(), PricingConfig(rows_per_batch=2, seed=5),
                 MarketDefaults())
    first = open("option_data_augmented.csv").read()
    run_pipeline(PipelineConfig(), PricingConfig(rows_per_batch=2, seed=5),
                 MarketDefaults())
    assert open("option_data_augmented.csv").read() == first


def test_spot_helpers(rng):
    assert spot.compute_max_days(30) == 300
    assert spot.compute_max_days(100) == 600
    assert spot.compute_max_days(365) == 1460
    assert spot.compute_max_days(1000) == 1825
    d = spot.parse_date_mmddyyyy("3/7/2021")
    assert (d.year, d.month, d.day) == (2021, 3, 7)
    assert spot.parse_date_mmddyyyy("garbage") is None

    prices = list(100.0 * np.exp(np.cumsum(rng.normal(0, 0.01, 30))))
    vol, mom = spot.twenty_day_vol_and_momentum(prices)
    assert vol > 0
    expected_mom = float(np.sum(np.log(np.asarray(prices[-21:])[1:]
                                       / np.asarray(prices[-21:])[:-1])))
    assert mom == pytest.approx(expected_mom, rel=1e-9)
    assert spot.twenty_day_vol_and_momentum(prices[:10]) == (0.0, 0.0)


def test_fetch_spot_history_window():
    data = {"abc": {20230101 + i: 100.0 + i for i in range(0, 28)}}
    hist = spot.fetch_spot_history(data, "abc", datetime.date(2023, 1, 28),
                                   dte=1)
    # 10*1 = 10 days back + quote day, all present
    assert len(hist) == 11
    assert hist[-1] == 127.0
    assert spot.fetch_spot_history(data, "zzz", datetime.date(2023, 1, 5), 1) == []


def test_ordered_writer(tmp_path):
    path = str(tmp_path / "out.csv")
    with SafeFileWriter(path) as w:
        ow = OrderedResultWriter(w, 4)
        ow.put(2, "c")
        ow.put(0, "a")
        assert ow.next_row_to_write == 1
        ow.put(1, "b")
        assert ow.next_row_to_write == 3
        ow.put(3, "d")
    assert open(path).read() == "a\nb\nc\nd\n"


def test_csv_split_semantics():
    assert csv_io.split_line("a,b,c\n") == ["a", "b", "c"]
    assert csv_io.split_line("a,b,\n") == ["a", "b"]
    assert csv_io.split_line("a,,b") == ["a", "", "b"]
    assert csv_io.split_line("\n") == []


def test_pipeline_resume_appends_remaining_rows(workdir):
    s = round(workdir["aapl"], 4)
    make_option_csv("option_data.csv", [
        opt_row(option_type=0, dte=30.0, s=s, sdp=-0.02),
        opt_row(option_type=1, dte=30.0, s=s, sdp=0.02),
        opt_row(option_type=0, dte=45.0, s=s, sdp=-0.02),
    ])
    run_pipeline(PipelineConfig(), PricingConfig(rows_per_batch=4, seed=5),
                 MarketDefaults())
    full = open("option_data_augmented.csv").read()

    # Simulate an interrupted run: keep header + first row only.
    lines = full.splitlines(keepends=True)
    with open("option_data_augmented.csv", "w") as f:
        f.writelines(lines[:2])

    rc = run_pipeline(PipelineConfig(), PricingConfig(rows_per_batch=4,
                                                      seed=5),
                      MarketDefaults(), resume=True)
    assert rc == 0
    resumed = open("option_data_augmented.csv").read()
    assert resumed == full                 # identical to the one-shot run
    # resume must not clobber the backup path with partial output
    assert not os.path.exists("option_data_augmented.backup.csv")


def test_resume_repairs_partial_line_and_trailing_sentinels(tmp_path):
    """_resume_row_count's two crash-state repairs: a truncated trailing
    line (mid-write kill) and a trailing sentinel run (signal-interrupted
    run sentinel-fills every unprocessed row) are excluded from the done
    count AND truncated, so the append-mode writer never merges onto a
    corrupt tail and resume never becomes a no-op.  Mid-file sentinels
    (genuine per-row validation failures) still count as done."""
    from montecarlooptionspricer_tpu.pipeline.driver import (
        SENTINEL, _resume_row_count)

    hdr = "h1,h2"
    path = str(tmp_path / "out.csv")

    # Partial trailing line: 2 complete rows + an unterminated third.
    with open(path, "w") as f:
        f.write(hdr + "\nrow0,1\nrow1,2\nrow2,")
    assert _resume_row_count(path, hdr) == 2
    assert open(path).read() == hdr + "\nrow0,1\nrow1,2\n"  # tail truncated

    # Trailing sentinel run after a mid-file sentinel: the mid-file one
    # counts (priced rows follow it), the trailing run is re-processed.
    with open(path, "w") as f:
        f.write(hdr + "\n")
        f.write("bad" + SENTINEL + "\n")     # validation failure: done
        f.write("good,0.5\n")                # priced row: done
        f.write("fill" + SENTINEL + "\n")    # terminate-fill: redo
        f.write("fill" + SENTINEL + "\n")    # terminate-fill: redo
    assert _resume_row_count(path, hdr) == 2
    assert open(path).read() == hdr + "\nbad" + SENTINEL + "\ngood,0.5\n"

    # Foreign header: untouched, count 0.
    with open(path, "w") as f:
        f.write("other\njunk,1\n")
    assert _resume_row_count(path, hdr) == 0
    assert open(path).read() == "other\njunk,1\n"


def test_resume_marker_caps_done_count(tmp_path):
    """A gracefully terminated run flushes already-priced HIGH-index rows
    after the terminate-fill sentinels (buckets price out of row order), so
    the file looks complete to the trailing-run heuristic.  The `.resume`
    sidecar written by the terminating run caps the done count at the first
    terminate-filled row and truncates the file there."""
    from montecarlooptionspricer_tpu.pipeline.driver import (
        RESUME_MARKER_SUFFIX, SENTINEL, _resume_row_count)

    hdr = "h1,h2"
    path = str(tmp_path / "out.csv")
    body = (hdr + "\n"
            + "row0,1\n"                      # priced
            + "fill" + SENTINEL + "\n"        # terminate-fill (row 1)
            + "fill" + SENTINEL + "\n"        # terminate-fill (row 2)
            + "row3,4\n")                     # priced BEFORE the kill,
    with open(path, "w") as f:                # flushed after the fills
        f.write(body)

    # Without the marker the heuristic is fooled: all 4 rows look done.
    assert _resume_row_count(path, hdr) == 4

    with open(path, "w") as f:
        f.write(body)
    with open(path + RESUME_MARKER_SUFFIX, "w") as f:
        f.write("1\n")
    assert _resume_row_count(path, hdr) == 1
    assert open(path).read() == hdr + "\nrow0,1\n"  # truncated at the cap


def test_pipeline_interrupted_run_leaves_marker_and_resumes(workdir,
                                                            monkeypatch):
    """End-to-end sidecar round trip: a device failure in the LOW-index
    bucket after the HIGH-index bucket already priced leaves interleaved
    terminate-fill sentinels; the marker makes --resume redo them and the
    final output equals a clean one-shot run."""
    from montecarlooptionspricer_tpu.pipeline import driver as driver_mod

    s = round(workdir["aapl"], 4)
    rows = [
        opt_row(option_type=0, dte=120.0, s=s, sdp=-0.02),  # big bucket
        opt_row(option_type=1, dte=15.0, s=s, sdp=0.02),    # small bucket
        opt_row(option_type=0, dte=15.0, s=s, sdp=-0.02),   # small bucket
    ]
    make_option_csv("option_data.csv", rows)
    cfgs = lambda: (PipelineConfig(), PricingConfig(rows_per_batch=4, seed=5),
                    MarketDefaults())

    run_pipeline(*cfgs())
    clean = open("option_data_augmented.csv").read()
    assert not os.path.exists("option_data_augmented.csv.resume")

    # Interrupted run: the small (15d) bucket prices first; the big (120d)
    # bucket's batch raises, so row 0 is terminate-filled while rows 1-2
    # are real — the interleaved state the marker exists for.
    real_price = driver_mod.BatchedPricer.price

    def boom_on_big(self, tasks, seed):
        if max(t.n_steps for t in tasks) > 60:
            raise RuntimeError("injected failure in big bucket")
        return real_price(self, tasks, seed)

    monkeypatch.setattr(driver_mod.BatchedPricer, "price", boom_on_big)
    rc = run_pipeline(*cfgs())
    assert rc == 1
    marker = "option_data_augmented.csv.resume"
    assert os.path.exists(marker) and open(marker).read().strip() == "0"
    _, out_rows = read_output()
    assert len(out_rows) == 3
    assert out_rows[0][-6:] == ["0"] * 6          # terminate-filled
    assert out_rows[1][-6:] != ["0"] * 6          # priced before the kill

    # Resume with the fault removed: identical to the clean one-shot run,
    # marker consumed.
    monkeypatch.setattr(driver_mod.BatchedPricer, "price", real_price)
    rc = run_pipeline(*cfgs(), resume=True)
    assert rc == 0
    assert open("option_data_augmented.csv").read() == clean
    assert not os.path.exists(marker)


def test_health_kill_is_catastrophic(workdir):
    """A health-check kill (RSS/error limits, PredictionGen.cpp:506-516)
    must exit non-zero and leave the resume marker, not report success."""
    make_option_csv("option_data.csv", [
        opt_row(option_type=0, dte=30.0, s=round(workdir["aapl"], 4)),
        opt_row(option_type=1, dte=30.0, s=round(workdir["aapl"], 4)),
    ])
    rc = run_pipeline(
        PipelineConfig(max_memory_bytes=1, health_check_interval_s=0.01),
        PricingConfig(rows_per_batch=1), MarketDefaults())
    assert rc == 1
    log_text = open("error_log.txt").read()
    assert "health check failed" in log_text.lower()
    # Every row the kill pre-empted is sentinel-filled and marked for redo.
    _, out_rows = read_output()
    assert len(out_rows) == 2
    if any(r[-6:] == ["0"] * 6 for r in out_rows):
        assert os.path.exists("option_data_augmented.csv.resume")


def test_pipeline_resume_ignores_foreign_output(workdir):
    make_option_csv("option_data.csv", [opt_row()])
    with open("option_data_augmented.csv", "w") as f:
        f.write("some,other,header\njunk,row,1\n")
    rc = run_pipeline(PipelineConfig(), PricingConfig(rows_per_batch=2),
                      MarketDefaults(), resume=True)
    assert rc == 0
    header, rows = read_output()
    assert header[-6:] == list(AUGMENTED_COLUMNS)
    assert len(rows) == 1


def test_pipeline_device_failure_contained(workdir, monkeypatch):
    """Fault injection (SURVEY.md section 5.3): a device-pass blow-up marks
    catastrophic failure (thread-error path, PredictionGen.cpp:867-881) but
    every affected row still reaches the output as an ordered sentinel and
    the failure is logged."""
    from montecarlooptionspricer_tpu.pipeline import driver as driver_mod

    s = round(workdir["aapl"], 4)
    make_option_csv("option_data.csv", [
        opt_row(option_type=0, dte=30.0, s=s, sdp=-0.02),
        opt_row(option_type=1, dte=30.0, s=s, sdp=0.02),
    ])

    def boom(self, tasks, seed):
        raise RuntimeError("injected device failure")

    monkeypatch.setattr(driver_mod.BatchedPricer, "price", boom)
    rc = run_pipeline(PipelineConfig(), PricingConfig(rows_per_batch=4),
                      MarketDefaults())
    # fail() marks catastrophic failure -> exit code 1, but every row is
    # still emitted as a sentinel and the output stays ordered.
    assert rc == 1
    _, rows = read_output()
    assert len(rows) == 2
    for row in rows:
        assert row[-6:] == ["0"] * 6
    log_text = open("error_log.txt").read()
    assert "Thread error: injected device failure" in log_text


def test_pipeline_antithetic_rows(workdir):
    """--antithetic pipeline: rows price finitely through the paired
    bucketed generator, and qmc+antithetic rejects at config time."""
    s = round(workdir["aapl"], 4)
    make_option_csv("option_data.csv", [
        opt_row(option_type=0, dte=30.0, s=s, sdp=-0.02),
        opt_row(option_type=1, dte=45.0, s=s, sdp=0.02),
    ])
    rc = run_pipeline(PipelineConfig(),
                      PricingConfig(rows_per_batch=4, antithetic=True),
                      MarketDefaults())
    assert rc == 0
    _, rows = read_output()
    assert len(rows) == 2
    for row in rows:
        vals = [float(v) for v in row[-6:]]
        assert all(np.isfinite(vals))
        assert any(abs(v) > 0 for v in vals[:4])
    with pytest.raises(ValueError, match="antithetic"):
        PricingConfig(qmc=True, antithetic=True)
    with pytest.raises(ValueError, match="even"):
        PricingConfig(num_paths=251, antithetic=True)


@pytest.mark.slow
def test_pipeline_2048_bucket_compiles_within_hbm():
    """Regression for the r04 10k-row soak OOM (VERIFY_r04 §11): the
    largest pipeline bucket (n_pad=2048 — dtes up to the reference's
    1825-day history cap) at the default 64-row x 250-path batch must
    compile within one v5e chip's HBM.  Pre-fix, branching.py's one-shot
    [N, T, B] gather tile-padded its s32 index tensor to 15.62 GiB and
    XLA:TPU refused the program (18.32G > 15.75G)."""
    import jax
    import jax.numpy as jnp

    if jax.devices()[0].platform != "tpu":
        pytest.skip("HBM budget is only checkable on a real TPU")
    from montecarlooptionspricer_tpu.pipeline.driver import BatchedPricer

    bp = BatchedPricer(PricingConfig(), MarketDefaults())
    fn = bp._build(2048, 2048)
    batch = PricingConfig().rows_per_batch
    keys = jax.vmap(jax.random.fold_in, (None, 0))(
        jax.random.key(0), jnp.arange(batch))
    f32 = lambda v: jnp.full((batch,), v, jnp.float32)
    lowered = fn.lower(keys, jnp.ones((batch,), bool),
                       jnp.full((batch,), 1795, jnp.int32), f32(100.0),
                       f32(0.04), f32(0.1), f32(1.5), f32(-0.7), f32(100.0),
                       f32(1795 / 252.0), f32(0.3), f32(0.0))
    compiled = lowered.compile()   # pre-fix: raises RESOURCE_EXHAUSTED here
    mem = compiled.memory_analysis()
    if mem is not None and hasattr(mem, "temp_size_in_bytes"):
        assert mem.temp_size_in_bytes < 12 * 1024**3, mem.temp_size_in_bytes
