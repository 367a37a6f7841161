"""End-to-end CLI tests: TrainNN and EvaluateNN executables driven exactly
as a user would (TrainNN.cpp:19-132, EvaluateNN.cpp:10-104), on tiny
synthetic data so the whole flow — CSV load, train with checkpointing, model
save/load round-trip, MC-dropout smoke predictions, evaluation CSV +
MAE/RMSE/coverage — runs in seconds on CPU."""

import os

import numpy as np
import pytest

from montecarlooptionspricer_tpu.config import INPUT_COLUMNS, TARGET_COLUMN


def _write_feature_csv(path, rng, n_rows: int) -> None:
    cols = list(INPUT_COLUMNS) + [TARGET_COLUMN, "ignored_extra"]
    x = rng.normal(size=(n_rows, len(INPUT_COLUMNS)))
    # Deterministic, learnable target: linear in two features + noise.
    y = 2.0 + 0.5 * x[:, 0] - 0.25 * x[:, 1] + 0.01 * rng.normal(size=n_rows)
    with open(path, "w") as f:
        f.write(",".join(cols) + "\n")
        for i in range(n_rows):
            row = list(x[i]) + [y[i], 99.0]
            f.write(",".join(f"{v:.6f}" for v in row) + "\n")


@pytest.fixture
def data_dir(tmp_path, rng, monkeypatch):
    for name, n in (("train_data.csv", 64), ("valid_data.csv", 16),
                    ("test_data.csv", 16)):
        _write_feature_csv(tmp_path / name, rng, n)
    monkeypatch.chdir(tmp_path)
    return tmp_path


@pytest.mark.slow
def test_train_then_evaluate_cli(data_dir):
    from montecarlooptionspricer_tpu.cli import evaluate_nn, train_nn

    rc = train_nn.main([
        "--num-epochs", "7",        # crosses the warmup->MDN boundary (5)
        "--batch-size", "32",
        "--mc-samples", "5",
        "--model-file", "model_cli_test",
        "--checkpoint-file", "ckpt_cli_test",
    ])
    assert rc == 0
    assert os.path.exists("model_cli_test.msgpack")
    assert os.path.exists("ckpt_cli_test.msgpack")

    rc = evaluate_nn.main([
        "--model-file", "model_cli_test",
        "--results-csv", "eval_cli_test.csv",
        "--n-samples", "5",
        "--batch-size", "8",
    ])
    assert rc == 0
    with open("eval_cli_test.csv") as f:
        lines = f.read().strip().splitlines()
    assert lines[0] == "Index,Actual,Mean,Lower,Upper,Error,InsideInterval"
    assert len(lines) == 1 + 16
    for line in lines[1:]:
        parts = line.split(",")
        assert len(parts) == 7
        mean, lower, upper = map(float, parts[2:5])
        assert np.isfinite(mean) and lower <= mean <= upper


@pytest.mark.slow
def test_train_cli_resumes_from_checkpoint(data_dir):
    from montecarlooptionspricer_tpu.cli import train_nn

    args = ["--batch-size", "32", "--model-file", "model_resume",
            "--checkpoint-file", "ckpt_resume"]
    assert train_nn.main(args + ["--num-epochs", "2"]) == 0
    mtime = os.path.getmtime("ckpt_resume.msgpack")
    # Second invocation resumes at epoch 3 (BayesianNN.cpp:391-403 semantics)
    # and reaches 4.
    assert train_nn.main(args + ["--num-epochs", "4"]) == 0
    assert os.path.getmtime("ckpt_resume.msgpack") >= mtime
    from montecarlooptionspricer_tpu.nn import checkpoint as ckpt_lib
    from montecarlooptionspricer_tpu.nn.trainer import BayesianTrainer

    t = BayesianTrainer(len(INPUT_COLUMNS), 64)
    t.tx = t._make_tx(3e-4)
    restored = ckpt_lib.load_checkpoint("ckpt_resume", t.params,
                                        t.tx.init(t.params))
    assert restored is not None
    assert restored[2] == 4


def test_price_cli_single_and_chain(capsys):
    import json

    from montecarlooptionspricer_tpu.cli import price as price_cli

    rc = price_cli.main(["--s0", "100", "--strike", "102", "--put",
                         "--maturity", "0.12", "--steps", "24",
                         "--paths", "4096", "--chunk-paths", "2048"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["price"] > 0 and out["n_paths"] == 4096

    rc = price_cli.main(["--strikes", "95,100,105", "--put",
                         "--maturity", "0.12", "--steps", "24",
                         "--paths", "4096", "--chunk-paths", "2048"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert len(out["prices"]) == 3
    assert out["prices"][0] < out["prices"][2]  # put value rises in strike
    assert all(v > 0 or np.isnan(v) for v in out["implied_vols"])

    rc = price_cli.main(["--s0", "100", "--strike", "102", "--put",
                         "--maturity", "0.12", "--steps", "24",
                         "--paths", "4096", "--chunk-paths", "2048",
                         "--greeks"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert -1.0 <= out["delta"] <= 0.0 and out["vega_xi"] > 0


def test_price_cli_pilot_paths_knob(capsys):
    """--pilot-paths sizes the LSM policy fit (VERIFY_r05 §6.5: at long
    horizons policy-fit noise dominates the reported conditional stderr,
    so the knob must reach the engine).  Two pilot sizes at the same
    seed fit different policies -> different attained lower bounds;
    the same pilot size twice is bitwise-reproducible."""
    import json

    from montecarlooptionspricer_tpu.cli import price as price_cli

    base = ["--s0", "100", "--strike", "102", "--put",
            "--maturity", "0.12", "--steps", "24",
            "--paths", "4096", "--chunk-paths", "2048"]

    def run(extra):
        assert price_cli.main(base + extra) == 0
        return json.loads(capsys.readouterr().out.strip())["price"]

    p_small = run(["--pilot-paths", "512"])
    p_small2 = run(["--pilot-paths", "512"])
    p_big = run(["--pilot-paths", "2048"])
    assert p_small == p_small2          # determinism at fixed pilot
    assert p_small != p_big             # the knob reaches the policy fit
    assert abs(p_small - p_big) < 1.0   # ... but both are sane prices


def test_price_cli_argument_validation(capsys):
    from montecarlooptionspricer_tpu.cli import price as price_cli

    assert price_cli.main(["--paths", "0"]) == 2
    # --strikes + --greeks is now a supported combination (whole-smile
    # risk, StreamingChainPricer.price_and_greeks); CV/bounds are not.
    assert price_cli.main(["--strikes", "95,100", "--control-variate"]) == 2
    assert price_cli.main(["--strikes", "95,100", "--bounds"]) == 2
    assert price_cli.main(["--bounds", "--greeks"]) == 2
    capsys.readouterr()
    # non-block-aligned paths/chunks round down instead of crashing
    rc = price_cli.main(["--paths", "1000", "--chunk-paths", "1000",
                         "--steps", "8", "--maturity", "0.05"])
    assert rc == 0
    import json
    out = json.loads(capsys.readouterr().out.strip())
    assert out["n_paths"] == 768  # 1000 -> 768 (3 blocks of 256)


@pytest.mark.slow
def test_price_cli_serve_mode():
    """--serve: JSON-lines in, JSON-lines out; repricing a fresh strike
    strip of the same length reuses the compiled programs (compiled=false
    on the second response); a bad request yields an error response without
    killing the server."""
    import json
    import subprocess
    import sys

    reqs = "\n".join([
        json.dumps({"id": 1, "strikes": [95.0, 100.0, 105.0], "put": True,
                    "maturity": 0.1, "steps": 8, "paths": 1024}),
        json.dumps({"id": 2, "strikes": [92.0, 99.0, 111.0], "put": True,
                    "maturity": 0.1, "steps": 8, "paths": 1024}),
        json.dumps({"id": 3, "strikes": [], "put": True}),
        json.dumps({"id": 4, "strikes": [100.0, 103.0, 106.0], "put": True,
                    "maturity": 0.1, "steps": 8, "paths": 1024,
                    "xi": 0.09}),
        json.dumps({"id": 5, "strikes": [95.0, 100.0, 105.0], "put": True,
                    "maturity": 0.1, "steps": 8, "paths": 1024,
                    "greeks": True}),
        json.dumps({"id": 6, "strikes": [96.0, 101.0, 104.0], "put": True,
                    "maturity": 0.1, "steps": 8, "paths": 1024,
                    "greeks": True}),
    ]) + "\n"
    # jax.config, not the env var: the ambient axon plugin ignores
    # JAX_PLATFORMS, so a bare subprocess would price through the TPU
    # tunnel (slow, and racy against other tests' device work).
    prog = ("import jax, sys; jax.config.update('jax_platforms', 'cpu'); "
            "from montecarlooptionspricer_tpu.cli.price import main; "
            "sys.exit(main(['--serve', '--chunk-paths', '1024', "
            "'--pathgen', 'xla']))")
    out = subprocess.run(
        [sys.executable, "-c", prog],
        input=reqs, capture_output=True, text=True, timeout=600,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [json.loads(l) for l in out.stdout.strip().splitlines()]
    assert [r["id"] for r in lines] == [1, 2, 3, 4, 5, 6]
    r1, r2, r3, r4, r5, r6 = lines
    assert r1["compiled"] and len(r1["prices"]) == 3
    assert r1["prices"][0] < r1["prices"][1] < r1["prices"][2]
    assert not r2["compiled"]            # fresh strikes, same programs
    assert r2["prices"][0] < r2["prices"][2]
    assert "error" in r3
    # market params are per-call traced inputs (round 3): a changed xi
    # reprices against the SAME compiled programs
    assert not r4["compiled"]
    # tripled forward variance makes every put in the strip worth more
    assert r4["prices"][1] > r2["prices"][1]
    # per-quote smile risk: first greeks quote compiles the extra
    # program (honestly reported), the second rides it
    assert r5["compiled"] and len(r5["delta"]) == 3
    assert r5["delta"][0] > r5["delta"][2]       # put delta falls in K
    assert all(np.isfinite(v) for v in r5["vega_h"])
    assert not r6["compiled"] and len(r6["vega_xi"]) == 3


@pytest.mark.slow
def test_price_cli_serve_buckets_maturities():
    """Serve-mode step bucketing: maturities quantize to pow2 step
    buckets, so a second expiry in the same bucket reuses the compiled
    programs (compiled=false) with the true step count as a traced
    input."""
    import json
    import subprocess
    import sys

    reqs = "\n".join([
        json.dumps({"id": 1, "strikes": [95.0, 105.0], "put": True,
                    "maturity": 0.08, "paths": 1024}),   # 20 steps -> 32
        json.dumps({"id": 2, "strikes": [95.0, 105.0], "put": True,
                    "maturity": 0.12, "paths": 1024}),   # 30 steps -> 32
    ]) + "\n"
    prog = ("import jax, sys; jax.config.update('jax_platforms', 'cpu'); "
            "from montecarlooptionspricer_tpu.cli.price import main; "
            "sys.exit(main(['--serve', '--chunk-paths', '1024', "
            "'--pathgen', 'xla']))")
    out = subprocess.run(
        [sys.executable, "-c", prog],
        input=reqs, capture_output=True, text=True, timeout=600,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert out.returncode == 0, out.stderr[-2000:]
    r1, r2 = [json.loads(l) for l in out.stdout.strip().splitlines()]
    assert r1["compiled"] and r1["n_steps"] == 20
    assert not r2["compiled"] and r2["n_steps"] == 30
    # longer-dated puts are worth more at the same strikes
    assert r2["prices"][0] > r1["prices"][0] - 0.05
    assert r2["prices"][1] > r1["prices"][1] - 0.05


@pytest.mark.slow
def test_price_cli_serve_guards_and_reuse_buckets():
    """Serve-mode hardening: (a) huge-steps / huge-paths / huge-strip
    requests are rejected up front (error response, server stays up, no
    pricer built); (b) strip LENGTHS bucket to pow2 so a 3-strike and a
    4-strike board share one compiled program; (c) a fresh path budget
    reuses the compiled pricer (n_paths is per-call, not a cache key)."""
    import json
    import subprocess
    import sys

    reqs = "\n".join([
        json.dumps({"id": 1, "strike": 100.0, "put": True,
                    "maturity": 0.1, "steps": 500000, "paths": 1024}),
        json.dumps({"id": 2, "strike": 100.0, "put": True,
                    "maturity": 0.1, "steps": 8, "paths": 1e9}),
        json.dumps({"id": 3, "strikes": [100.0] * 9, "put": True,
                    "maturity": 0.1, "steps": 8, "paths": 1024}),
        json.dumps({"id": 4, "strikes": [95.0, 100.0, 105.0], "put": True,
                    "maturity": 0.1, "steps": 8, "paths": 1024}),
        json.dumps({"id": 5, "strikes": [94.0, 99.0, 104.0, 109.0],
                    "put": True, "maturity": 0.1, "steps": 8,
                    "paths": 1024}),
        json.dumps({"id": 6, "strikes": [95.0, 100.0, 105.0], "put": True,
                    "maturity": 0.1, "steps": 8, "paths": 2048}),
        json.dumps({"id": 7, "strike": 100.0, "put": True,
                    "maturity": 0.1, "steps": 8, "paths": 1024,
                    "hurst": -0.1}),
        # json.loads accepts bare NaN/Infinity tokens, and NaN passes every
        # sign comparison: non-finite maturity/strike/market values must be
        # rejected, never priced into a success-shaped response.
        '{"id": 8, "strike": 100.0, "put": true, "maturity": NaN, '
        '"steps": 8, "paths": 1024}',
        '{"id": 9, "strikes": [Infinity], "put": true, "maturity": 0.1, '
        '"steps": 8, "paths": 1024}',
        '{"id": 10, "strike": 100.0, "put": true, "maturity": 0.1, '
        '"steps": 8, "paths": 1024, "s0": NaN}',
    ]) + "\n"
    prog = ("import jax, sys; jax.config.update('jax_platforms', 'cpu'); "
            "from montecarlooptionspricer_tpu.cli.price import main; "
            "sys.exit(main(['--serve', '--chunk-paths', '1024', "
            "'--pathgen', 'xla', '--max-strikes', '8']))")
    out = subprocess.run(
        [sys.executable, "-c", prog],
        input=reqs, capture_output=True, text=True, timeout=600,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [json.loads(l) for l in out.stdout.strip().splitlines()]
    assert [r["id"] for r in lines] == [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]
    r1, r2, r3, r4, r5, r6, r7, r8, r9, r10 = lines
    assert "max-steps" in r1["error"]
    assert "max-paths" in r2["error"]
    assert "max-strikes" in r3["error"]
    # 3 strikes -> pow2 bucket 4: first board compiles ...
    assert r4["compiled"] and len(r4["prices"]) == 3
    assert r4["prices"][0] < r4["prices"][1] < r4["prices"][2]
    # ... the 4-strike board lands in the SAME bucket: no recompile,
    # and the response is the real strip length, not the bucket.
    assert not r5["compiled"] and len(r5["prices"]) == 4
    # a doubled path budget reuses the pricer too (chunk unchanged).
    assert not r6["compiled"] and r6["n_paths"] == 2048
    # every served price carries an error bar
    assert len(r6["stderrs"]) == 3
    # market validation: H outside (0, 1) is rejected before NaN prices
    # can reach the JSON stream
    assert "hurst" in r7["error"]
    # non-finite request values are errors, not success-shaped responses
    assert "maturity" in r8["error"]
    assert "strikes" in r9["error"]
    assert "s0" not in r10 and "market" in r10["error"]


@pytest.mark.slow
def test_price_cli_serve_reprices_fresh_hurst_without_recompile():
    """Serve mode: H is a traced per-request input (the pricer is built
    traced_h=True and hurst stays out of the cache key), so intraday H
    recalibration reprices with compiled=false."""
    import json
    import subprocess
    import sys

    reqs = "\n".join([
        json.dumps({"id": 1, "strikes": [95.0, 105.0], "put": True,
                    "maturity": 0.1, "steps": 8, "paths": 1024,
                    "hurst": 0.1}),
        json.dumps({"id": 2, "strikes": [95.0, 105.0], "put": True,
                    "maturity": 0.1, "steps": 8, "paths": 1024,
                    "hurst": 0.35}),
        json.dumps({"id": 3, "strikes": [95.0, 105.0], "put": True,
                    "maturity": 0.1, "steps": 8, "paths": 1024,
                    "s0": 97.0, "xi": 0.06, "r": 0.03}),
    ]) + "\n"
    prog = ("import jax, sys; jax.config.update('jax_platforms', 'cpu'); "
            "from montecarlooptionspricer_tpu.cli.price import main; "
            "sys.exit(main(['--serve', '--chunk-paths', '1024', "
            "'--pathgen', 'xla']))")
    out = subprocess.run(
        [sys.executable, "-c", prog],
        input=reqs, capture_output=True, text=True, timeout=600,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert out.returncode == 0, out.stderr[-2000:]
    r1, r2, r3 = [json.loads(l) for l in out.stdout.strip().splitlines()]
    assert r1["compiled"]
    assert not r2["compiled"]            # fresh H, same programs
    # rougher vs smoother vol changes the near-the-money price
    assert r1["prices"] != r2["prices"]
    # per-tick market updates (s0/xi/r) reprice without compiling either
    assert not r3["compiled"]
    # spot down -> both puts worth more than at s0=100
    assert r3["prices"][1] > r1["prices"][1]


@pytest.mark.slow
def test_price_cli_serve_warm_buckets():
    """--warm-buckets compiles the named shape classes before serving:
    the FIRST real quote in a warmed class answers compiled=false, and
    warmup self-responses never reach the client stream."""
    import json
    import subprocess
    import sys

    reqs = json.dumps({"id": 1, "strikes": [95.0, 100.0], "put": True,
                       "maturity": 0.1, "steps": 20, "paths": 1024}) + "\n"
    prog = ("import jax, sys; jax.config.update('jax_platforms', 'cpu'); "
            "from montecarlooptionspricer_tpu.cli.price import main; "
            "sys.exit(main(['--serve', '--chunk-paths', '1024', "
            "'--pathgen', 'xla', '--warm-buckets', '20x2']))")
    out = subprocess.run(
        [sys.executable, "-c", prog],
        input=reqs, capture_output=True, text=True, timeout=600,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [json.loads(l) for l in out.stdout.strip().splitlines()]
    assert len(lines) == 1          # the warm response stayed out of stdout
    assert lines[0]["id"] == 1
    assert not lines[0]["compiled"]  # class was pre-warmed


@pytest.mark.slow
def test_price_cli_serve_compile_count_100_replay():
    """Compile-count regression on a 100-request fully-mixed replay
    (VERDICT r04 item 7): 4 shape classes (steps buckets {8, 32} x strip
    buckets {2, 4}) with boards, budgets, markets, H, and seeds varying
    per quote, greeks every 5th quote, plus 2 malformed injections.
    Exactly 8 compiled=true rows (4 pricer classes + 4 lazy greeks
    programs), 2 contained error rows, everything else warm."""
    import json
    import subprocess
    import sys

    reqs = []
    for i in range(100):
        k = [2, 3][i % 2]
        steps = [8, 24][(i // 2) % 2]               # buckets 8 / 32
        reqs.append(json.dumps({
            "id": i,
            "strikes": [94.0 + 4 * j + (i % 9) * 0.5 for j in range(k)],
            "put": True, "steps": steps, "maturity": steps / 252.0,
            "paths": [1024, 2048][i % 2],
            "hurst": 0.1 + 0.02 * (i % 8),
            "s0": 100.0 + 0.2 * (i % 7),
            "xi": 0.04 + 0.002 * (i % 4),
            "seed": i, "greeks": i % 5 == 4,
        }))
    reqs.insert(33, "{broken json")
    reqs.insert(66, json.dumps({"id": "bad", "strike": 100.0,
                                "maturity": 0.1, "hurst": 2.0}))
    prog = ("import jax, sys; jax.config.update('jax_platforms', 'cpu'); "
            "from montecarlooptionspricer_tpu.cli.price import main; "
            "sys.exit(main(['--serve', '--chunk-paths', '1024', "
            "'--pathgen', 'xla']))")
    out = subprocess.run(
        [sys.executable, "-c", prog],
        input="\n".join(reqs) + "\n", capture_output=True, text=True,
        timeout=1200, env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert out.returncode == 0, out.stderr[-2000:]
    rows = [json.loads(l) for l in out.stdout.strip().splitlines()]
    assert len(rows) == 102
    errors = [r for r in rows if "error" in r]
    assert len(errors) == 2                      # containment, in place
    compiled = [r for r in rows if r.get("compiled")]
    assert len(compiled) == 8, [r["id"] for r in compiled]
    ok = [r for r in rows if "error" not in r]
    assert all(r["prices"] for r in ok)
    assert sum("delta" in r for r in ok) == 20   # every 5th quote


def test_price_cli_chain_greeks(capsys):
    """--strikes + --greeks: per-strike price + full Greek set arrays,
    each with stderrs, plus implied vols from the greek prices."""
    import json

    from montecarlooptionspricer_tpu.cli import price as price_cli

    rc = price_cli.main(["--strikes", "98,102", "--put",
                         "--maturity", "0.05", "--steps", "8",
                         "--paths", "2048", "--chunk-paths", "1024"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert "delta" not in out      # plain chain: prices/stderrs/ivs only
    rc = price_cli.main(["--strikes", "98,102", "--put", "--greeks",
                         "--maturity", "0.05", "--steps", "8",
                         "--paths", "2048", "--chunk-paths", "1024"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip())
    for name in ("prices", "delta", "vega_xi", "vega_eta", "rho_rate",
                 "vega_h", "implied_vols"):
        assert len(out[name]) == 2, name
    assert all(len(v) == 2 for v in out["stderrs"].values())
    assert out["delta"][0] > out["delta"][1]    # put delta falls in strike
