"""The reference's ACTUAL product loop, chained end to end through the
three CLIs on one dataset: PredictionGen augments the option CSV with the
six pricer/feature columns (PredictionGen.cpp:471-477), TrainNN trains the
Bayesian meta-model on the 17-feature rows (TrainNN.cpp:30-37), EvaluateNN
reports MC-dropout uncertainty metrics on held-out rows
(EvaluateNN.cpp:15-21).

Round 2 tested each stage in isolation (the NN CLIs on synthetic normals);
this module pins the INTER-STAGE CONTRACT — a schema drift between the
pipeline's output and the NN's input would fail here and nowhere else."""

import datetime
import os

import numpy as np
import pytest

from montecarlooptionspricer_tpu.config import (AUGMENTED_COLUMNS,
                                                INPUT_COLUMNS, TARGET_COLUMN)
from montecarlooptionspricer_tpu.pipeline import csv_io

OPTION_HEADER = ("ticker,option_type,quote_date,underlying_last,dte,"
                 "strike_distance_pct,delta,gamma,vega,theta,rho,iv,volume,"
                 "last,dividend")


def _make_inputs(rng, n_rows: int):
    """option_data.csv + nasdaq_stock_data.csv in the cwd (the pipeline's
    default file contract, PredictionGen.cpp:398-440)."""
    end = datetime.date(2023, 6, 30)
    price = 100.0
    rows = []
    for back in range(400, -1, -1):
        d = end - datetime.timedelta(days=back)
        price *= float(np.exp(rng.normal(0.0003, 0.012)))
        rows.append([f"{d.month}/{d.day}/{d.year}", f"{price:.4f}"])
    csv_io.write_csv("nasdaq_stock_data.csv", ["Date", "AAPL"], rows)

    with open("option_data.csv", "w") as f:
        f.write(OPTION_HEADER + "\n")
        for i in range(n_rows):
            option_type = i % 2
            dte = float(12 + 3 * (i % 4))
            sdp = round(rng.uniform(-0.03, 0.03), 4)
            last = round(abs(rng.normal(2.5, 1.0)) + 0.1, 4)
            f.write(f"aapl,{option_type},6/30/2023,{price:.4f},{dte},{sdp},"
                    f"0.5,0.01,0.2,-0.05,0.03,0.25,100,{last},0.01\n")
    return price


@pytest.mark.slow
def test_three_cli_hybrid_workflow_end_to_end(tmp_path, rng, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from montecarlooptionspricer_tpu.cli import (evaluate_nn, prediction_gen,
                                                 train_nn)

    _make_inputs(rng, n_rows=24)

    # Stage 1: the pricing pipeline (PredictionGen equivalent).
    rc = prediction_gen.main(["--num-paths", "64", "--rows-per-batch", "8"])
    assert rc == 0
    header, rows = csv_io.read_table("option_data_augmented.csv")
    assert header[-6:] == list(AUGMENTED_COLUMNS)
    # The inter-stage contract: the augmented CSV carries every one of the
    # NN's 17 input features plus the target, by exact header name.
    assert set(INPUT_COLUMNS) <= set(header)
    assert TARGET_COLUMN in header
    assert len(rows) == 24
    priced = [r for r in rows if any(float(v) != 0.0 for v in r[-6:])]
    assert len(priced) >= 20, "too many sentinel rows to train on"

    # Stage 2/3 consume SPLITS of stage 1's output — same file format, no
    # transformation (the reference user splits the augmented CSV by hand;
    # TrainNN.cpp:47-54 reads three files of the same schema).
    def write_split(path, subset):
        csv_io.write_csv(path, header, subset)

    write_split("train_data.csv", rows[:16])
    write_split("valid_data.csv", rows[16:20])
    write_split("test_data.csv", rows[20:24])

    rc = train_nn.main([
        "--num-epochs", "7",      # crosses the warmup->MDN loss switch (5)
        "--batch-size", "8",
        "--mc-samples", "5",
        "--model-file", "hybrid_model",
        "--checkpoint-file", "hybrid_ckpt",
    ])
    assert rc == 0
    assert os.path.exists("hybrid_model.msgpack")

    rc = evaluate_nn.main([
        "--model-file", "hybrid_model",
        "--results-csv", "hybrid_eval.csv",
        "--n-samples", "5",
        "--batch-size", "4",
    ])
    assert rc == 0
    with open("hybrid_eval.csv") as f:
        lines = f.read().strip().splitlines()
    assert lines[0] == "Index,Actual,Mean,Lower,Upper,Error,InsideInterval"
    assert len(lines) == 1 + 4
    for line in lines[1:]:
        parts = line.split(",")
        actual, mean, lower, upper = map(float, parts[1:5])
        assert np.isfinite(mean) and lower <= mean <= upper
        # Actual round-trips from stage 1's CSV (the 'last' column).
        assert actual > 0


@pytest.mark.slow
def test_hybrid_workflow_with_malformed_rows_skip_bad_rows(tmp_path, rng,
                                                           monkeypatch):
    """Real PredictionGen outputs carry malformed input rows sentinel-filled
    VERBATIM (PredictionGen.cpp:825-847): a short row stays ragged and a
    garbage field stays non-numeric.  The strict NN loader (reference
    std::stof semantics) must crash on such a split; --skip-bad-rows must
    train through it.  This pins the data-prep contract the 4.2k-row soak
    run hit in practice (VERIFY_r04 §10)."""
    monkeypatch.chdir(tmp_path)
    from montecarlooptionspricer_tpu.cli import prediction_gen, train_nn

    _make_inputs(rng, n_rows=16)
    with open("option_data.csv", "a") as f:
        f.write("aapl,1,6/30/2023,100.0\n")  # ragged: 4 of 15 fields
        f.write("aapl,0,6/30/2023,100.0,12.0,NaNsense,0.5,0.01,0.2,-0.05,"
                "0.03,0.25,100,2.5,0.01\n")  # right arity, garbage field

    rc = prediction_gen.main(["--num-paths", "64", "--rows-per-batch", "8"])
    assert rc == 0
    # Raw line count (read_table can't see ragged rows as rows of the
    # table contract): 18 data lines survive, malformed ones verbatim.
    with open("option_data_augmented.csv") as f:
        lines = f.read().strip().splitlines()
    assert len(lines) == 1 + 18
    bad = [ln for ln in lines[1:]
           if ln.count(",") != lines[0].count(",") or "NaNsense" in ln]
    assert len(bad) == 2, "malformed rows should pass through sentineled"

    header = lines[0]
    for name, rows in (("train_data.csv", lines[1:]),
                       ("valid_data.csv", lines[1:5]),
                       ("test_data.csv", lines[5:9])):
        with open(name, "w") as f:
            f.write(header + "\n" + "\n".join(rows) + "\n")

    args = ["--num-epochs", "2", "--batch-size", "8", "--mc-samples", "3",
            "--model-file", "m2", "--checkpoint-file", "c2"]
    with pytest.raises(ValueError):
        train_nn.main(args)  # strict default = reference crash semantics
    rc = train_nn.main(args + ["--skip-bad-rows"])
    assert rc == 0
    assert os.path.exists("m2.msgpack")
