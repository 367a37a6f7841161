"""Probe: (a) grid-kernel marginal cost per group step, (b) whether the
regen design stays linear past 10-strike groups (the CHAIN_GROUP cap).

The r03 K-sweep showed generation dominates the regen design's cost, so
K=50/K=1 ~ ceil(K/CHAIN_GROUP).  If Mosaic schedules a 17- or 25-strike
boundary sweep linearly (the ~10 cap was measured on the quadratic form,
13 op-slots/cell/strike vs boundary's ~7), raising the group size is the
cheapest route to the <=4x bar.  Usage:
    python parity/group_probe.py [--paths 8388608] [--steps 365]
"""
from __future__ import annotations

import argparse
import time

import numpy as np


def time_chain(n_k, n_paths, n_steps, block, sweep, group=None):
    import jax

    from montecarlooptionspricer_tpu.models import engine, pathgen_pallas

    old = pathgen_pallas.CHAIN_GROUP
    if group is not None:
        pathgen_pallas.CHAIN_GROUP = group
    try:
        strikes = [float(v) for v in np.linspace(80.0, 120.0, n_k)]
        cfg = engine.StreamConfig(
            n_paths=n_paths, n_steps=n_steps, chunk_paths=1 << 19,
            pilot_paths=1 << 15, pathgen_impl="pallas",
            pallas_block_paths=block, chain_policy_form="boundary",
            chain_sweep_impl=sweep)
        pricer = engine.StreamingChainPricer(
            s0=100.0, xi=0.04, h=0.1, eta=1.5, rho=-0.4, r=0.04,
            strikes=strikes, maturity=n_steps / 252.0, is_call=False,
            config=cfg)
        p = pricer.price(jax.random.key(0))
        t0 = time.perf_counter()
        p = pricer.price(jax.random.key(1))
        jax.block_until_ready(p)
        dt = time.perf_counter() - t0
        return dt, float(np.asarray(p)[0])
    finally:
        pathgen_pallas.CHAIN_GROUP = old


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--paths", type=int, default=1 << 23)
    ap.add_argument("--steps", type=int, default=365)
    ap.add_argument("--block", type=int, default=512)
    args = ap.parse_args()

    print("== grid marginal (group axis cost) ==", flush=True)
    for n_k in (20, 30, 50):
        dt, p0 = time_chain(n_k, args.paths, args.steps, args.block, "grid")
        print(f"  grid  K={n_k:3d} ({-(-n_k // 10)} groups): {dt:6.3f}s"
              f"  p[0]={p0:.4f}", flush=True)

    print("== regen with larger CHAIN_GROUP at K=50 ==", flush=True)
    for group in (10, 13, 17, 25, 50):
        dt, p0 = time_chain(50, args.paths, args.steps, args.block,
                            "regen", group=group)
        n_g = -(-50 // group)
        print(f"  regen group={group:2d} ({n_g} passes): {dt:6.3f}s"
              f"  p[0]={p0:.4f}", flush=True)

    print("== K=1 baseline x3 (denominator noise) ==", flush=True)
    for rep in range(3):
        dt, p0 = time_chain(1, args.paths, args.steps, args.block, "regen")
        print(f"  K=1: {dt:6.3f}s  p[0]={p0:.4f}", flush=True)


if __name__ == "__main__":
    main()
