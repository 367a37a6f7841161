"""Literal compiled-C++ head-to-head (BASELINE.md accuracy criterion).

Builds the UNMODIFIED reference pricer sources (parity/Makefile + the local
Eigen shim), runs them and the TPU rebuild on the SAME historical series at
matched (paths, steps, strike) config, and compares per-pricer means within
2 combined MC-stderr.  Writes PARITY_CPP.md.

Run:  python parity/run_parity.py [--reps 16] [--paths 2000] [--steps 63]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def build_harness() -> str:
    exe = os.path.join(HERE, "harness")
    subprocess.run(["make", "-C", HERE], check=True, capture_output=True)
    return exe


def make_history(seed: int = 42, days: int = 600) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return 100.0 * np.exp(np.cumsum(rng.normal(3e-4, 0.012, days)))


def run_cpp(exe: str, hist_file: str, steps: int, paths: int, reps: int,
            sdp: float):
    out = subprocess.run(
        [exe, "parity", hist_file, str(steps), str(paths), str(reps),
         str(sdp)], check=True, capture_output=True, text=True)
    rows = [json.loads(line) for line in out.stdout.splitlines()]
    res = {}
    for is_call in (0, 1):
        sel = [r for r in rows if r["is_call"] == is_call]
        res[bool(is_call)] = {
            k: np.array([r[k] for r in sel])
            for k in ("asymptotic", "branching", "lsm", "martingale")}
    return res, rows[0]["strike"]


def run_ours(hist: np.ndarray, steps: int, paths: int, reps: int,
             strike: float, seed0: int = 1000):
    # Force CPU for hermetic, tunnel-free runs; float32 on-device like the
    # production path (the C++ reference is float64 — part of what the
    # 2-stderr band absorbs).
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    sys.path.insert(0, REPO)
    import jax
    import jax.numpy as jnp

    from montecarlooptionspricer_tpu.models import rough_volatility
    from montecarlooptionspricer_tpu.models.pricing import PricerSpec, price_all
    from montecarlooptionspricer_tpu.ops.estimators import estimate_params
    from montecarlooptionspricer_tpu.pipeline.spot import (
        twenty_day_vol_and_momentum)

    p = estimate_params(hist)
    sigma, _ = twenty_day_vol_and_momentum(list(hist))
    dt = 1.0 / 252.0

    @jax.jit
    def one(key, is_call):
        kp, kr = jax.random.split(key)
        paths_blk = rough_volatility.generate_paths(
            kp, p.s0, p.xi, p.h, p.eta, p.rho, p.r, steps, paths, dt)
        spec = PricerSpec(r=p.r, strike=strike, maturity=steps * dt, dt=dt,
                          is_call=is_call, sigma=sigma, dividend=0.08)
        out = price_all(paths_blk, spec, kr)
        return jnp.stack([out["asymptotic"], out["branching"], out["lsm"],
                          out["martingale"]])

    res = {}
    for is_call in (False, True):
        vals = np.stack([
            np.asarray(one(jax.random.key(seed0 + 7 * i), is_call))
            for i in range(reps)])
        res[is_call] = {k: vals[:, j] for j, k in enumerate(
            ("asymptotic", "branching", "lsm", "martingale"))}
    return res, p


def compare(cpp, ours, reps: int):
    lines = []
    worst = 0.0
    for is_call in (False, True):
        for k in ("asymptotic", "branching", "lsm", "martingale"):
            a, b = cpp[is_call][k], ours[is_call][k]
            delta = float(a.mean() - b.mean())
            stderr = float(np.sqrt(a.var(ddof=1) / len(a)
                                   + b.var(ddof=1) / len(b)))
            z = abs(delta) / max(stderr, 1e-12)
            worst = max(worst, z)
            lines.append((("call" if is_call else "put"), k,
                          float(a.mean()), float(b.mean()), delta, stderr, z))
    return lines, worst


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=16)
    ap.add_argument("--paths", type=int, default=2000)
    ap.add_argument("--steps", type=int, default=63)
    ap.add_argument("--sdp", type=float, default=0.02)
    ap.add_argument("--bench-rows", type=int, default=12)
    ap.add_argument("--out", default=os.path.join(REPO, "PARITY_CPP.md"))
    args = ap.parse_args()

    exe = build_harness()
    hist = make_history()
    hist_file = "/tmp/parity_hist.txt"
    np.savetxt(hist_file, hist)

    cpp, strike = run_cpp(exe, hist_file, args.steps, args.paths, args.reps,
                          args.sdp)
    ours, params = run_ours(hist, args.steps, args.paths, args.reps, strike)
    lines, worst = compare(cpp, ours, args.reps)

    bench = subprocess.run(
        [exe, "bench", hist_file, str(args.bench_rows)], check=True,
        capture_output=True, text=True)
    bench_row = json.loads(bench.stdout)

    with open(args.out, "w") as f:
        f.write(
            "# PARITY — compiled C++ reference vs TPU rebuild\n\n"
            "The UNMODIFIED reference pricer sources "
            "(`/root/reference/src/models/*.cpp`) compiled in place with "
            "g++ -O2 -fopenmp and a ~150-line Eigen shim "
            "(`parity/eigen_shim/Eigen/Dense`; bdcSvd least squares == "
            "normal equations for the reference's full-rank 3-column "
            "systems), then run head-to-head against the rebuild on the "
            "same historical series at matched (paths, steps, strike).\n\n"
            f"Config: paths={args.paths}, steps={args.steps}, "
            f"strike={strike:.4f}, reps={args.reps} per side, params "
            f"estimated from the shared history (xi={params.xi:.6f}, "
            f"h={params.h:.6f}, eta={params.eta:.6f}, "
            f"rho={params.rho:.6f}).  The reference's RNG is "
            "irreproducible by construction (random_device seeding, "
            "RoughVolatility.cpp:239), so the comparison is distributional:"
            " |mean difference| vs the 2-combined-MC-stderr band — "
            "BASELINE.md's accuracy criterion, literally.\n\n"
            "| type | pricer | C++ mean | rebuild mean | delta | stderr | "
            "|z| | pass(2se) |\n|---|---|---|---|---|---|---|---|\n")
        for typ, k, ma, mb, d, se, z in lines:
            f.write(f"| {typ} | {k} | {ma:.4f} | {mb:.4f} | {d:+.4f} | "
                    f"{se:.4f} | {z:.2f} | {'yes' if z <= 2 else 'NO'} |\n")
        f.write(
            f"\nWorst |z| = {worst:.2f}.\n\n"
            "## Compiled-reference throughput (this host)\n\n"
            f"Full pipeline rows (250-path generation + all four pricers, "
            f"OpenMP dynamic): **{bench_row['rows_per_sec']:.2f} rows/s** "
            f"({bench_row['rows']} rows in {bench_row['seconds']:.2f} s, "
            f"{os.cpu_count()} CPU core(s) visible).\n")
    print(f"wrote {args.out}; worst |z| = {worst:.2f}; "
          f"cpp bench {bench_row['rows_per_sec']:.2f} rows/s")
    return 0 if worst <= 3.0 else 1


if __name__ == "__main__":
    sys.exit(main())
