"""Whole-smile Greeks K-scaling benchmark (real TPU).

Measures the fused chain Greeks kernel (StreamingChainPricer.
price_and_greeks on the chol + log-boundary pallas configuration —
pathgen_pallas._chain_greeks_body) against (a) the fused chain PRICE
path at the same K (what the full risk block costs over prices alone)
and (b) the XLA jvp chain Greeks stream (the general fallback this
kernel replaces at single-tile horizons).

Usage (through the axon tunnel):
    python parity/chain_greeks_scaling.py [--paths 8388608] [--steps 365]
        [--block 512] [--jvp-paths 1048576]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def _time(fn):
    fn()                                   # compile + warm
    t0 = time.perf_counter()
    out = fn()                             # price()/price_and_greeks()
    np.asarray(out[0] if isinstance(out, tuple) else out)
    return time.perf_counter() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--paths", type=int, default=1 << 23)
    ap.add_argument("--steps", type=int, default=365)
    ap.add_argument("--block", type=int, default=512)
    ap.add_argument("--jvp-paths", type=int, default=1 << 20,
                    help="path budget for the jvp reference rows (it is "
                         "~an order of magnitude slower; rates are "
                         "path-count-free)")
    args = ap.parse_args()

    import jax

    from montecarlooptionspricer_tpu.models import engine
    from montecarlooptionspricer_tpu.utils import enable_persistent_cache

    enable_persistent_cache()
    strikes_all = np.linspace(80.0, 120.0, 50)
    mkt = dict(s0=100.0, xi=0.04, h=0.1, eta=1.5, rho=-0.4, r=0.04)
    maturity = args.steps / 252.0

    print(f"fused chain Greeks vs price, {args.paths:.2e} paths x "
          f"{args.steps} steps (block {args.block}):", flush=True)
    fused_rows = []
    for n_k in (1, 3, 10, 50):
        strikes = [float(v) for v in strikes_all[:n_k]]
        cfg = engine.StreamConfig(
            n_paths=args.paths, n_steps=args.steps, chunk_paths=1 << 19,
            pilot_paths=1 << 15, pathgen_impl="pallas",
            pallas_block_paths=args.block)
        pricer = engine.StreamingChainPricer(
            **mkt, strikes=strikes, maturity=maturity, is_call=False,
            config=cfg)
        assert pricer._fused_greek_stream is not None
        t_price = _time(lambda: pricer.price(jax.random.key(1)))
        t_greek = _time(
            lambda: pricer.price_and_greeks(jax.random.key(1)))
        fused_rows.append((n_k, t_greek))
        print(f"  K={n_k:3d}: price {t_price:6.3f}s | greeks "
              f"{t_greek:6.3f}s = {t_greek / t_price:4.2f}x price, "
              f"{args.paths / t_greek / 1e6:6.2f}M paths/s, "
              f"{6 * n_k * args.paths / t_greek / 1e6:7.1f}M "
              f"greek-evals/s", flush=True)
    print(f"  K=50 / K=1 greeks cost ratio: "
          f"{fused_rows[-1][1] / fused_rows[0][1]:.2f}x", flush=True)

    print(f"XLA jvp chain Greeks (fallback), {args.jvp_paths:.2e} paths:",
          flush=True)
    for n_k in (1, 10):
        strikes = [float(v) for v in strikes_all[:n_k]]
        # Small chunks: the jvp holds 5 tangent path planes per chunk
        # (1 << 17 at 365 steps overflows the 16G HBM at K >= 10).
        cfg = engine.StreamConfig(
            n_paths=args.jvp_paths, n_steps=args.steps,
            chunk_paths=1 << 15, pilot_paths=1 << 15)
        pricer = engine.StreamingChainPricer(
            **mkt, strikes=strikes, maturity=maturity, is_call=False,
            config=cfg)
        t_jvp = _time(
            lambda: pricer.price_and_greeks(jax.random.key(1)))
        rate = args.jvp_paths / t_jvp
        fused_rate = args.paths / dict(fused_rows)[n_k]
        print(f"  K={n_k:3d}: {t_jvp:6.3f}s  {rate / 1e6:6.2f}M paths/s "
              f"-> fused = {fused_rate / rate:4.1f}x", flush=True)


if __name__ == "__main__":
    main()
