"""Seed-to-seed spread of the scrambled-QMC estimators (VERIFY_r05 §6.5).

The long-horizon drive (qmc_long_drive.py) found the fused-QMC and
XLA-QMC prices 0.021 apart (0.3% of price) — |z| = 11.5 on their tiny
across-chunk stderrs.  The two constructions assign the same leading
Sobol dimensions to DIFFERENT integrand coordinates (chol-slab time-step
loadings vs spectral frequency loadings), so each carries its own
finite-sample QMC bias.  This probe separates scramble noise from that
construction bias: each construction runs at K seeds (independent
scramble rotations); if the per-construction seed spread matches its
reported stderr while the two means stay ~0.02 apart, the gap is stable
construction bias, not an unbiasedness bug.  Both remain consistent with
the plain-MC price at ITS stderr, which is the unbiasedness anchor
(scrambled Sobol is unbiased over rotations; at finite N each fixed
construction has higher-order bias terms the stderr does not see —
Owen's classic result).

Shapes/config match qmc_long_drive.py exactly so the warm XLA cache hits.

Run (TPU):  PYTHONPATH=/root/.axon_site:/root/repo python parity/qmc_seed_spread.py
Smoke (CPU): --steps 200 --paths 4096 --chunk 1024 --block 64 --seeds 2
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
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--decompose", action="store_true",
                    help="variance decomposition on the plain fused stream: "
                         "(a) fixed pilot policy x varying stream seeds — "
                         "spread should match the reported stderr; (b) "
                         "varying pilot x fixed stream — the policy-fit "
                         "variance the stderr (documented as conditional on "
                         "the policy) does not include")
    args = ap.parse_args()

    import jax
    import numpy as np

    from montecarlooptionspricer_tpu.models import engine

    n_steps = args.steps
    chunk = args.chunk
    n_paths = max(chunk, (int(args.paths) // chunk) * chunk)
    dt = 1.0 / 252.0
    on_tpu = jax.devices()[0].platform == "tpu"

    def build(**kw):
        if not on_tpu and kw.get("pathgen_impl") == "pallas":
            kw["pallas_interpret"] = True
        cfg = engine.StreamConfig(
            n_paths=n_paths, n_steps=n_steps, chunk_paths=chunk,
            pilot_paths=min(1 << 15, max(1 << 10, n_paths // 4)), dt=dt,
            chunks_per_call=min(16, n_paths // chunk),
            pallas_block_paths=args.block, cumsum_impl="matmul",
            fgn_matmul_dtype="bfloat16", **kw)
        return engine.StreamingPricer(100.0, 0.04, 0.1, 1.5, -0.4, 0.04,
                                      105.0, n_steps * dt, False, cfg)

    if args.decompose:
        pr = build(pathgen_impl="pallas")
        pr.price(jax.random.key(0), n_paths=chunk)  # warm
        cfg = pr.config
        n_chunks = n_paths // cfg.chunk_paths

        def priced(k_pilot_seed, k_stream_seed):
            k_pilot, _ = pr._keys(jax.random.key(k_pilot_seed))
            _, k_stream = pr._keys(jax.random.key(k_stream_seed))
            fits = pr._fit(k_pilot)
            total = done = 0
            while done < n_chunks:
                count = min(cfg.chunks_per_call, n_chunks - done)
                t, _ = pr._stream(k_stream, fits, done, count)
                total += float(t)
                done += count
            return total / n_paths

        _, se = pr.price(jax.random.key(100), with_stderr=True)
        print(f"reported per-run stderr (conditional on policy): {se:.5f}")
        for label, pilots, streams in (
                ("fixed policy, varying stream", [42] * args.seeds,
                 range(100, 100 + args.seeds)),
                ("varying policy, fixed stream", range(100, 100 + args.seeds),
                 [42] * args.seeds)):
            vals = [priced(kp, ks) for kp, ks in zip(pilots, streams)]
            print(f"{label}: " + " ".join(f"{v:.4f}" for v in vals)
                  + f"  -> spread {max(vals) - min(vals):.4f}", flush=True)
        return 0

    variants = [
        ("plain fused (PRNG)", dict(pathgen_impl="pallas")),
        ("fused QMC", dict(pathgen_impl="pallas", qmc=True)),
        ("XLA QMC", dict(pathgen_impl="xla", qmc=True)),
    ]
    print(f"n_paths={n_paths:,} n_steps={n_steps} seeds={args.seeds} "
          f"device={jax.devices()[0].platform}", flush=True)
    print("| construction | per-seed price ± se | mean | seed spread (max-min) |")
    print("|---|---|---|---|")
    means = {}
    for label, kw in variants:
        pr = build(**kw)
        pr.price(jax.random.key(0), n_paths=chunk)  # warm
        vals, ses = [], []
        for s in range(args.seeds):
            t0 = time.perf_counter()
            p, se = pr.price(jax.random.key(100 + s), with_stderr=True)
            el = time.perf_counter() - t0
            vals.append(float(p))
            ses.append(float(se))
            print(f"|   {label} seed {100 + s} | {p:.4f} ± {se:.5f} "
                  f"({el:.1f}s) | | |", flush=True)
        m, spread = float(np.mean(vals)), float(np.max(vals) - np.min(vals))
        means[label] = (m, float(np.mean(ses)), spread)
        print(f"| **{label}** | | {m:.4f} | {spread:.4f} |", flush=True)

    (mp, sep, _), (mf, sef, spf), (mx, sex, spx) = (
        means[v[0]] for v in variants)
    print(f"\nconstruction gap fused-QMC vs XLA-QMC: {mf - mx:+.4f} "
          f"(seed spreads {spf:.4f} / {spx:.4f})")
    print(f"fused-QMC vs plain-MC anchor: {(mf - mp):+.4f} "
          f"({abs(mf - mp) / max(1e-12, sep):.2f}x the plain stderr)")
    print(f"XLA-QMC vs plain-MC anchor: {(mx - mp):+.4f} "
          f"({abs(mx - mp) / max(1e-12, sep):.2f}x the plain stderr)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
