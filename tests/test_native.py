"""Native fast-CSV extension: build (when a compiler is present), and assert
byte-identical output vs the Python fallback (SURVEY.md C19/C22: the
reference's data loading is native C++; ours is too, with a pure-Python
fallback)."""

import importlib
import shutil
import subprocess
import sys

import numpy as np
import pytest

from montecarlooptionspricer_tpu.pipeline import csv_io

NATIVE_DIR = __file__.rsplit("/tests/", 1)[0] + "/native"


@pytest.fixture(scope="module")
def native_module():
    if not csv_io.native_available():
        if shutil.which("g++") is None and shutil.which("c++") is None:
            pytest.skip("no C++ compiler")
        subprocess.run(["make", "-C", NATIVE_DIR, f"PY={sys.executable}"],
                       check=True, capture_output=True)
        importlib.reload(csv_io)
    if not csv_io.native_available():
        pytest.skip("native extension unavailable after build")
    return csv_io._native


def test_native_matches_python_fallback(native_module, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text(
        "a,b,c\n"
        "1,2,3\n"
        "\n"                    # empty line skipped
        "4,,6\n"               # embedded empty field kept
        "7,8,\n"               # trailing comma: no trailing empty field
        "x y,z w,  q\r\n"      # CRLF + spaces preserved inside fields
        ",\n"                   # single delimiter -> ['']
    )
    native = native_module.read_table(str(p))

    # Force the Python path for comparison.
    header_py = []
    rows_py = []
    with open(p) as f:
        header_py = csv_io.split_line(f.readline())
        for line in f:
            if line.strip() == "":
                continue
            rows_py.append(csv_io.split_line(line))

    assert list(native[0]) == header_py
    assert [list(r) for r in native[1]] == rows_py
    assert rows_py[2] == ["7", "8"]
    assert rows_py[4] == [""]


def test_native_errors(native_module, tmp_path):
    with pytest.raises(OSError):
        native_module.read_table(str(tmp_path / "missing.csv"))
    empty = tmp_path / "empty.csv"
    empty.write_text("")
    with pytest.raises(ValueError):
        native_module.read_table(str(empty))


def test_native_large_roundtrip(native_module, tmp_path, rng):
    p = tmp_path / "big.csv"
    n = 20_000
    with open(p, "w") as f:
        f.write("c0,c1,c2,c3\n")
        for i in range(n):
            f.write(f"{i},{rng.uniform():.8f},tick{i % 97},{-i}\n")
    header, rows = native_module.read_table(str(p))
    assert len(rows) == n
    assert rows[12345][0] == "12345"
    assert rows[-1][3] == f"-{n - 1}"


@pytest.fixture
def features_module():
    try:
        from montecarlooptionspricer_tpu import _features
    except ImportError:
        pytest.skip("native _features extension not built (make -C native)")
    return _features


def test_features_estimate_params_matches_numpy(features_module, rng):
    from montecarlooptionspricer_tpu.ops import estimators

    prices = np.asarray(100.0 * np.exp(np.cumsum(
        rng.normal(3e-4, 0.012, 700))), dtype=np.float64)
    s0, xi, h, eta, rho = features_module.estimate_params(prices, 1 / 252.0)
    rets = estimators.log_returns(prices)
    assert s0 == prices[-1]
    assert xi == pytest.approx(estimators.estimate_xi(rets), rel=1e-12)
    assert h == pytest.approx(estimators.hurst_exponent_dfa(rets), rel=1e-9)
    assert eta == pytest.approx(estimators.estimate_eta(rets), rel=1e-12)
    assert rho == pytest.approx(estimators.estimate_rho(rets), rel=1e-9)
    # short history raises like the reference (RoughVolatility.cpp:318-320)
    with pytest.raises(ValueError):
        features_module.estimate_params(np.asarray([1.0]))
    # plain Python lists accepted too
    s0b, *_ = features_module.estimate_params(list(prices))
    assert s0b == s0


def test_features_hurst_white_noise(features_module, rng):
    # White noise has H ~ 0.5; matches the NumPy DFA bit-for-bit-ish.
    from montecarlooptionspricer_tpu.ops import estimators

    x = rng.normal(size=4096)
    h_native = features_module.hurst_dfa(x)
    h_numpy = estimators.hurst_exponent_dfa(x)
    assert h_native == pytest.approx(h_numpy, abs=1e-9)
    assert 0.3 < h_native < 0.7


def test_features_vol_momentum_matches_python(features_module, rng):
    from montecarlooptionspricer_tpu.pipeline import spot

    hist = list(100.0 * np.exp(np.cumsum(rng.normal(0, 0.01, 60))))
    v_n, m_n = features_module.vol_momentum(np.asarray(hist))
    # Force the Python fallback for comparison.
    from montecarlooptionspricer_tpu.ops import estimators as est_mod
    saved = est_mod._native
    est_mod._native = None
    try:
        v_p, m_p = spot.twenty_day_vol_and_momentum(hist)
    finally:
        est_mod._native = saved
    assert v_n == pytest.approx(v_p, rel=1e-12)
    assert m_n == pytest.approx(m_p, rel=1e-12)
    # short history -> zeros (PredictionGen.cpp:316-318)
    assert features_module.vol_momentum(hist[:10]) == (0.0, 0.0)
    # embedded non-positive prices zero those returns, not the whole window
    bad = hist[:]
    bad[-5] = -1.0
    v_b, m_b = features_module.vol_momentum(np.asarray(bad))
    assert np.isfinite(v_b) and np.isfinite(m_b)
