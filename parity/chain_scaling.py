"""Chain-kernel K-scaling benchmark (real TPU).

Measures the fused K-strike chain kernel's wall time at K in {1, 10, 50}
against the single-strike baseline — the VERDICT r02 item 6 metric: how
many single-strike runs does a 50-strike strip cost?  Path generation is
paid once per chunk regardless of K; the per-strike marginal cost is the
in-kernel policy sweep (VPU-bound), which is what `--form` selects:

  boundary  — precomputed exercise intervals, ~7 VPU op-slots/cell/strike
              (pathgen_pallas.boundary_rows / _policy_value_boundary)
  quadratic — cell-level quadratic evaluation, ~13 op-slots
              (the round-2 form, _policy_value_minreduce)

Usage (through the axon tunnel):
    python parity/chain_scaling.py [--paths 8388608] [--steps 365]
        [--block 512] [--form boundary|quadratic|both]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def run(form: str, n_paths: int, n_steps: int, block: int,
        sweep: str = "auto") -> None:
    import jax

    from montecarlooptionspricer_tpu.models import engine

    strikes_all = np.linspace(80.0, 120.0, 50)
    mkt = dict(s0=100.0, xi=0.04, h=0.1, eta=1.5, rho=-0.4, r=0.04)
    maturity = n_steps / 252.0
    rows = []
    for n_k in (1, 10, 50):
        strikes = [float(v) for v in strikes_all[:n_k]]
        cfg = engine.StreamConfig(
            n_paths=n_paths, n_steps=n_steps, chunk_paths=1 << 19,
            pilot_paths=1 << 15, pathgen_impl="pallas",
            pallas_block_paths=block, chain_policy_form=form,
            chain_sweep_impl=sweep)
        pricer = engine.StreamingChainPricer(
            **mkt, strikes=strikes, maturity=maturity, is_call=False,
            config=cfg)
        p = pricer.price(jax.random.key(0))          # compile + warm
        t0 = time.perf_counter()
        p = pricer.price(jax.random.key(1))
        jax.block_until_ready(p)
        dt_s = time.perf_counter() - t0
        # p[0] is the SAME strike (strikes_all[0]) at every K — a cheap
        # cross-K price-consistency eyeball alongside the timing.
        rows.append((n_k, dt_s, n_paths / dt_s, n_k * n_paths / dt_s,
                     float(np.asarray(p)[0])))
        print(f"  K={n_k:3d}: {dt_s:6.3f}s  {n_paths / dt_s / 1e6:6.2f}M "
              f"paths/s  {n_k * n_paths / dt_s / 1e6:7.1f}M strike-evals/s"
              f"  p[0]={rows[-1][4]:.4f}", flush=True)
    base = rows[0][1]
    print(f"  K=50 / K=1 cost ratio: {rows[-1][1] / base:.2f}x"
          f"  (bar: <= 4x, r02 measured ~10x)", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--paths", type=int, default=1 << 23)
    ap.add_argument("--steps", type=int, default=365)
    ap.add_argument("--block", type=int, default=512)
    ap.add_argument("--form", default="both",
                    choices=["boundary", "quadratic", "both"])
    ap.add_argument("--sweep", default="auto",
                    choices=["auto", "grid", "regen"],
                    help="multi-group sweep kernel: grid = one pallas_call "
                         "with the path block in VMEM scratch (r04); "
                         "regen = one pass per 10-strike group (r03)")
    args = ap.parse_args()
    forms = (["boundary", "quadratic"] if args.form == "both"
             else [args.form])
    for form in forms:
        print(f"form={form} paths={args.paths} steps={args.steps} "
              f"block={args.block} sweep={args.sweep}", flush=True)
        run(form, args.paths, args.steps, args.block, args.sweep)


if __name__ == "__main__":
    main()
