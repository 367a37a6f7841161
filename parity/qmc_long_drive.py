"""Long-horizon fused-QMC drive (r04 verdict item 4).

Measures, at the reference's maximum horizon (1825 steps,
PredictionGen.cpp:718-737 budgets whole rows by MC variance), three ways
of running `qmc=True` at 1e7-path scale:

  * plain fused pallas stream (chol slab kernel, in-kernel PRNG) — the
    throughput ceiling and the stderr baseline;
  * fused-QMC long-horizon (NEW): Sobol/PCA planes built in XLA, priced
    through the slab noise-in kernel — was a silent ~4x-slower XLA
    fallback before this round;
  * XLA-QMC (the old fallback): same Sobol planes, XLA path generator.

Effective speedup at fixed accuracy = (thr_q / thr_ref) * (se_ref/se_q)^2.

Run (TPU):  PYTHONPATH=/root/.axon_site:/root/repo python parity/qmc_long_drive.py
Smoke (CPU): add --steps 200 --paths 4096 --chunk 1024 --block 64
(off-TPU the pallas streams run through the TPU-semantics interpreter —
orders of magnitude slower, so keep smoke shapes tiny; throughput
numbers are only meaningful on hardware)
"""

from __future__ import annotations

import argparse
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1825)
    ap.add_argument("--paths", type=float, default=1e7)
    ap.add_argument("--chunk", type=int, default=1 << 16)
    ap.add_argument("--block", type=int, default=256)
    args = ap.parse_args()

    import jax

    from montecarlooptionspricer_tpu.models import engine

    n_steps = args.steps
    chunk = args.chunk
    n_paths = max(chunk, (int(args.paths) // chunk) * chunk)
    dt = 1.0 / 252.0

    on_tpu = jax.devices()[0].platform == "tpu"

    def run(label: str, **kw):
        if not on_tpu and kw.get("pathgen_impl") == "pallas":
            kw["pallas_interpret"] = True
        cfg = engine.StreamConfig(
            n_paths=n_paths, n_steps=n_steps, chunk_paths=chunk,
            pilot_paths=min(1 << 15, max(1 << 10, n_paths // 4)), dt=dt,
            chunks_per_call=min(16, n_paths // chunk),
            pallas_block_paths=args.block, cumsum_impl="matmul",
            fgn_matmul_dtype="bfloat16", **kw)
        pr = engine.StreamingPricer(100.0, 0.04, 0.1, 1.5, -0.4, 0.04,
                                    105.0, n_steps * dt, False, cfg)
        # warm (compile) on one chunk
        pr.price(jax.random.key(0), n_paths=chunk)
        t0 = time.perf_counter()
        p, se = pr.price(jax.random.key(42), with_stderr=True)
        el = time.perf_counter() - t0
        thr = n_paths / el
        tiled = getattr(pr, "_qmc_tiled", None)
        print(f"| {label} | {p:.4f} ± {se:.5f} | {el:.2f}s | "
              f"{thr/1e6:.2f}M paths/s | fused={getattr(pr, '_qmc_fused', None)} "
              f"tiled={tiled.__name__.rsplit('.', 1)[-1] if tiled else '-'} |",
              flush=True)
        return p, se, thr

    print(f"n_paths={n_paths:,} n_steps={n_steps} chunk={chunk} "
          f"block={args.block} device={jax.devices()[0].platform}",
          flush=True)
    print("| stream | price ± se | wall | throughput | path |")
    print("|---|---|---|---|---|")
    p0, se0, thr0 = run("plain fused (PRNG slab)", pathgen_impl="pallas")
    p1, se1, thr1 = run("fused QMC long-horizon (NEW)",
                        pathgen_impl="pallas", qmc=True)
    p2, se2, thr2 = run("XLA QMC (old fallback)",
                        pathgen_impl="xla", qmc=True)

    import numpy as np
    z01 = abs(p1 - p0) / max(1e-12, float(np.hypot(se0, se1)))
    z12 = abs(p1 - p2) / max(1e-12, float(np.hypot(se1, se2)))
    eff = (thr1 / thr0) * (se0 / se1) ** 2
    print(f"\nagreement: |z| fused-QMC vs plain {z01:.2f}, vs XLA-QMC "
          f"{z12:.2f}")
    print(f"fused-QMC vs XLA-QMC throughput: {thr1/thr2:.2f}x")
    print(f"effective speedup at fixed accuracy vs plain fused: "
          f"{eff:.2f}x  (thr ratio {thr1/thr0:.2f} x variance win "
          f"({se0/se1:.2f})^2)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
