"""Literal compiled-C++ head-to-head (BASELINE.md accuracy criterion).

Compiles the unmodified reference pricer sources with the local Eigen shim
and compares per-pricer means against the rebuild at matched config.  The
heavyweight report lives in parity/run_parity.py; this test runs a reduced
rep count.

Gate design (de-flaked, round 3): the per-attempt gate is worst |z| <= 3
over 8 independent pricer/type comparisons, whose null false-failure rate
is p ~= 1 - (2*Phi(3) - 1)^8 ~= 2.1% — material enough that CI would
redden weekly.  The test therefore runs MEDIAN-OF-3 independent redraws
(the C++ side reseeds from random_device by construction,
RoughVolatility.cpp:239; ours advances seed0): it passes as soon as 2
attempts pass and fails as soon as 2 attempts fail.  Null family-wise
false-failure ~= 3p^2 ~= 0.13% per suite run; unlike a best-of-3 rule
(which a ~3-sigma-scale REAL bias would slip past ~90% of the time at
per-attempt fail rates near 50%), the median rule still fails such a
regression with ~50% probability per run and a gross break (|bias| >>
stderr) always.  The observed |z| tables are printed on failure."""

import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

HERE = os.path.dirname(os.path.abspath(__file__))
PARITY = os.path.join(os.path.dirname(HERE), "parity")


@pytest.mark.skipif(
    not os.path.isdir("/root/reference") or shutil.which("g++") is None,
    reason="needs the reference checkout and g++")
def test_compiled_reference_head_to_head():
    sys.path.insert(0, PARITY)
    import run_parity

    exe = run_parity.build_harness()
    hist = run_parity.make_history()
    hist_file = "/tmp/parity_hist_test.txt"
    np.savetxt(hist_file, hist)

    reps, steps, paths = 8, 63, 2000
    passes, fails = 0, []
    for attempt in range(3):
        cpp, strike = run_parity.run_cpp(exe, hist_file, steps, paths,
                                         reps, 0.02)
        ours, _ = run_parity.run_ours(hist, steps, paths, reps, strike,
                                      seed0=1000 + 100000 * attempt)
        lines, worst = run_parity.compare(cpp, ours, reps)
        if worst <= 3.0:
            passes += 1
            if passes == 2:          # median decided: pass
                return
        else:
            fails.append((worst, lines))
            if len(fails) == 2:      # median decided: fail
                break
    table = "\n".join(
        f"failed attempt {i}: worst |z| = {w:.2f}\n" + "\n".join(
            f"  {typ:4s} {k:11s} cpp={ma:.4f} ours={mb:.4f} "
            f"delta={d:+.4f} se={se:.4f} |z|={z:.2f}"
            for typ, k, ma, mb, d, se, z in ls)
        for i, (w, ls) in enumerate(fails))
    raise AssertionError(
        "compiled-C++ parity exceeded 3 combined stderr on 2 of 3 "
        "independent redraws (null probability ~0.13%):\n" + table)


@pytest.mark.skipif(
    not os.path.isdir("/root/reference") or shutil.which("g++") is None,
    reason="needs the reference checkout and g++")
def test_compiled_reference_bench_runs():
    sys.path.insert(0, PARITY)
    import run_parity

    exe = run_parity.build_harness()
    hist = run_parity.make_history()
    hist_file = "/tmp/parity_hist_test.txt"
    np.savetxt(hist_file, hist)
    out = subprocess.run([exe, "bench", hist_file, "4"], check=True,
                         capture_output=True, text=True)
    import json
    row = json.loads(out.stdout)
    assert row["rows_per_sec"] > 0
