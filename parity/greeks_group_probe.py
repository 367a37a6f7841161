"""Probe: chain GREEKS kernel K-scaling, grid vs regen sweep (real TPU).

The price-chain grid kernel measured WORSE than regen (parity/group_probe
.py) because decoupled sweeps lose their MXU cover.  The Greeks chain is
the one place gen-once could still win: its per-block dominant cost is
the 6 tangent-plane MXU matmuls, which the grid design pays once per
block instead of once per group.  Usage:
    python parity/greeks_group_probe.py [--paths 4194304] [--steps 365]
"""
from __future__ import annotations

import argparse
import time

import numpy as np


def time_greeks(n_k, n_paths, n_steps, block, sweep):
    import jax

    from montecarlooptionspricer_tpu.models import engine

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
    out = pricer.price_and_greeks(jax.random.key(0))
    t0 = time.perf_counter()
    out = pricer.price_and_greeks(jax.random.key(1))
    jax.block_until_ready(jax.tree_util.tree_leaves(out))
    dt = time.perf_counter() - t0
    leaf = np.asarray(jax.tree_util.tree_leaves(out)[0])
    return dt, float(leaf.ravel()[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--paths", type=int, default=1 << 22)
    ap.add_argument("--steps", type=int, default=365)
    ap.add_argument("--block", type=int, default=512)
    args = ap.parse_args()
    for sweep in ("grid", "regen"):
        for n_k in (1, 10, 50):
            dt, v0 = time_greeks(n_k, args.paths, args.steps, args.block,
                                 sweep)
            print(f"  {sweep:5s} K={n_k:3d}: {dt:6.3f}s  v0={v0:.4f}",
                  flush=True)


if __name__ == "__main__":
    main()
