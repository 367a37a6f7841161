"""Probe: single-tile fused chol kernel vs the step-tiled slab, 513+ steps.

The probe's original question — can the chol form's single-resident-
matrix footprint raise the fused kernel's step cap past the spectral
512? — was answered YES and ADOPTED (VERIFY_r03 §11):
pathgen_pallas.supports is now form-aware with MAX_KERNEL_STEPS_CHOL =
1024, and the engine auto-clamps the path block to
pathgen_pallas.max_block_paths (a logged warning names the effective
block, so the fused leg's timing below may run a SMALLER block than
requested past 768 pad — read the warning when comparing ratios).

The probe remains useful as the A/B harness for re-measuring the two
forms on new hardware: it forces the slab leg (the adopted cap would
route 513-1024-step chol to the fused kernel in both legs) and patches
both caps for horizons past 1024.

Usage:  python parity/single_tile_cap.py [--steps 730] [--paths 2097152]
        [--block 256]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def run(n_steps: int, n_paths: int, block: int) -> None:
    import jax

    from montecarlooptionspricer_tpu.models import engine, pathgen_pallas

    mkt = dict(s0=100.0, xi=0.04, h=0.1, eta=1.5, rho=-0.4, r=0.04,
               strike=100.0, maturity=n_steps / 252.0, is_call=False)
    base = dict(n_paths=n_paths, n_steps=n_steps, chunk_paths=1 << 18,
                pilot_paths=1 << 15, pathgen_impl="pallas",
                pallas_block_paths=block, fgn_form="chol")

    def timed(label, **kw):
        pricer = engine.StreamingPricer(**mkt,
                                        config=engine.StreamConfig(**base,
                                                                   **kw))
        p = pricer.price(jax.random.key(0))          # compile + warm
        t0 = time.perf_counter()
        p = pricer.price(jax.random.key(1))
        p = float(np.asarray(p))                     # axon: fetch to sync
        dt_s = time.perf_counter() - t0
        print(f"  {label}: {dt_s:6.3f}s  {n_paths / dt_s / 1e6:6.2f}M "
              f"paths/s  price={p:.4f}", flush=True)
        return dt_s

    s_pad = -(-n_steps // 128) * 128
    print(f"steps={n_steps} (s_pad={s_pad}) paths={n_paths} block={block}",
          flush=True)
    # Slab leg: force the step-tiled path — the ADOPTED form-aware cap
    # (pathgen_pallas.MAX_KERNEL_STEPS_CHOL = 1024, the outcome of this
    # probe, VERIFY_r03 §11) would otherwise route 513-1024-step chol to
    # the fused kernel in both legs.
    saved = (pathgen_pallas.MAX_KERNEL_STEPS,
             pathgen_pallas.MAX_KERNEL_STEPS_CHOL)
    pathgen_pallas.MAX_KERNEL_STEPS_CHOL = pathgen_pallas.MAX_KERNEL_STEPS
    try:
        t_slab = timed("chol slab, forced", tiled_impl="slab")
    finally:
        (pathgen_pallas.MAX_KERNEL_STEPS,
         pathgen_pallas.MAX_KERNEL_STEPS_CHOL) = saved

    pathgen_pallas.MAX_KERNEL_STEPS = max(saved[0], s_pad)
    pathgen_pallas.MAX_KERNEL_STEPS_CHOL = max(saved[1], s_pad)
    try:
        t_fused = timed("single-tile fused, patched cap")
        print(f"  fused/slab: {t_slab / t_fused:.2f}x", flush=True)
    except Exception as e:  # Mosaic VMEM rejection is an expected outcome
        print(f"  single-tile fused REJECTED at s_pad={s_pad}: "
              f"{type(e).__name__}: {e}", flush=True)
    finally:
        (pathgen_pallas.MAX_KERNEL_STEPS,
         pathgen_pallas.MAX_KERNEL_STEPS_CHOL) = saved


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=730)
    ap.add_argument("--paths", type=int, default=1 << 21)
    ap.add_argument("--block", type=int, default=256)
    args = ap.parse_args()
    run(args.steps, args.paths, args.block)


if __name__ == "__main__":
    main()
