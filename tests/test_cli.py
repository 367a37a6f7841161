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


def test_price_cli_argument_validation(capsys):
    from montecarlooptionspricer_tpu.cli import price as price_cli

    assert price_cli.main(["--paths", "0"]) == 2
    assert price_cli.main(["--strikes", "95,100", "--greeks"]) == 2
    capsys.readouterr()
    # non-block-aligned paths/chunks round down instead of crashing
    rc = price_cli.main(["--paths", "1000", "--chunk-paths", "1000",
                         "--steps", "8", "--maturity", "0.05"])
    assert rc == 0
    import json
    out = json.loads(capsys.readouterr().out.strip())
    assert out["n_paths"] == 768  # 1000 -> 768 (3 blocks of 256)
