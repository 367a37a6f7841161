"""Triage probe for the r04 TPU serve burn-in RSS failure (VERDICT r04
weak #1): `parity/serve_burnin.py --requests 10000 --evict` tripped its
own flatness predicate on the real chip (first-half max 758 MiB,
second-half max 1670 MiB, rc=1).  Three candidate causes, separable by
this probe (in-process, same LRU mechanics as `cli/price.py serve`):

  A. **Per-request leak** — RSS grows with WARM requests against a fixed
     set of cached pricers.  Phase A prices S sweeps through N <= 16
     classes with NO eviction; growth after sweep 1 indicts the request
     path itself.
  B. **Eviction leak** — evicted pricers' compiled executables are
     retained (e.g. by a strong reference in a JAX global cache), so
     cycling M > 16 classes through the 16-entry LRU grows RSS linearly
     with SWEEPS.  Phase B cycles 24 classes for S sweeps, takes weakrefs
     to every evicted pricer and its jitted `_stream` wrapper, and counts
     survivors after gc.collect() — a nonzero survivor count is the
     smoking gun; linear per-sweep RSS growth without survivors points at
     allocator retention instead.
  C. **Legitimate compile footprint** — RSS steps up with each NEW
     program compile and plateaus on re-sweeps.  Phase B's per-sweep
     profile distinguishes it from B: sweep 1 pays 24 compiles, sweep 2+
     pays only the ~8 classes evicted by LRU churn, so growth must decay
     toward the allocator-reuse plateau if executables are freed.

Run:  python parity/serve_leak_probe.py [--sweeps 4] [--lru 16]
      (CPU by default; on the TPU host it probes the real backend.)
Writes one markdown table per phase; paste into VERIFY_r05.md.
"""

from __future__ import annotations

import argparse
import gc
import sys
import time
import weakref
from collections import OrderedDict


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for ln in f:
            if ln.startswith("VmRSS:"):
                return int(ln.split()[1]) / 1024.0
    return 0.0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sweeps", type=int, default=4)
    ap.add_argument("--lru", type=int, default=16)
    ap.add_argument("--chunk", type=int, default=256)
    args = ap.parse_args()

    import jax

    from montecarlooptionspricer_tpu.models import engine

    platform = jax.devices()[0].platform
    pathgen = "xla"  # serve mode's bucketed pricers always ride XLA
    key = jax.random.key(0)

    def make_pricer(bucket: int, k_bucket: int):
        cfg = engine.StreamConfig(
            n_paths=args.chunk, n_steps=bucket, chunk_paths=args.chunk,
            pilot_paths=min(1 << 16, args.chunk), chunks_per_call=64,
            pathgen_impl=pathgen, cumsum_impl="matmul")
        strikes = [90.0 + j for j in range(k_bucket)]
        return engine.StreamingChainPricer(
            100.0, 0.04, 0.1, 1.5, -0.4, 0.04, strikes=strikes,
            maturity=bucket / 252.0, is_call=False, config=cfg,
            bucketed=True, traced_market=True)

    def price_once(pricer, k_bucket: int, seed: int):
        strikes = [90.0 + j for j in range(k_bucket)]
        p, se = pricer.price(
            jax.random.key(seed), with_stderr=True, strikes=strikes,
            n_paths=args.chunk, n_steps_live=max(1, (3 * pricer.config
                                                     .n_steps) // 4),
            maturity=pricer.config.n_steps / 252.0,
            hurst=0.1, market=dict(s0=100.0, xi=0.04, r=0.04, eta=1.5))
        return float(p[0])

    # ---- Phase A: warm requests, fixed cache, NO eviction -------------
    classes_a = [(b, k) for b in (8, 16) for k in (1, 2, 4, 8)]  # 8 <= 16
    lru: OrderedDict = OrderedDict()
    print(f"platform={platform}  chunk={args.chunk}  lru={args.lru}")
    print("\n## Phase A — warm requests against a fixed cache "
          f"({len(classes_a)} classes, no eviction)\n")
    print("| sweep | RSS MiB | delta | compiles |")
    print("|---|---|---|---|")
    prev = rss_mb()
    a_deltas = []
    for s in range(args.sweeps):
        compiles = 0
        for i, (b, k) in enumerate(classes_a):
            if (b, k) not in lru:
                lru[(b, k)] = make_pricer(b, k)
                compiles += 1
            lru.move_to_end((b, k))
            price_once(lru[(b, k)], k, seed=s * 100 + i)
        gc.collect()
        now = rss_mb()
        a_deltas.append(now - prev)
        print(f"| {s} | {now:.0f} | {now - prev:+.0f} | {compiles} |")
        prev = now

    # ---- Phase B: 24 classes > 16-entry LRU, cycled ---------------------
    classes_b = [(b, k) for b in (8, 16, 32, 64) for k in (1, 2, 4, 8, 16,
                                                           32)]
    lru.clear()
    gc.collect()
    evicted_refs: list[tuple[weakref.ref, weakref.ref]] = []
    print(f"\n## Phase B — {len(classes_b)} classes cycled through the "
          f"{args.lru}-entry LRU ({args.sweeps} sweeps)\n")
    print("| sweep | RSS MiB | delta | compiles | evicted | "
          "survivors (pricer/jit) |")
    print("|---|---|---|---|---|---|")
    prev = rss_mb()
    b_deltas = []
    for s in range(args.sweeps):
        compiles = evictions = 0
        for i, (b, k) in enumerate(classes_b):
            if (b, k) not in lru:
                lru[(b, k)] = make_pricer(b, k)
                compiles += 1
                if len(lru) > args.lru:
                    _, dead = lru.popitem(last=False)
                    evicted_refs.append((weakref.ref(dead),
                                         weakref.ref(dead._stream)))
                    # Drop the probe's own reference immediately — the
                    # first run of this probe held the LAST evicted
                    # pricer in this local across the whole sweep and
                    # reported a phantom 1/1 survivor count.
                    del dead
                    evictions += 1
            lru.move_to_end((b, k))
            price_once(lru[(b, k)], k, seed=s * 100 + i)
        gc.collect()
        alive_p = sum(r() is not None for r, _ in evicted_refs)
        alive_j = sum(r() is not None for _, r in evicted_refs)
        now = rss_mb()
        b_deltas.append(now - prev)
        print(f"| {s} | {now:.0f} | {now - prev:+.0f} | {compiles} | "
              f"{evictions} | {alive_p}/{alive_j} |")
        prev = now

    gc.collect()
    alive_p = sum(r() is not None for r, _ in evicted_refs)
    alive_j = sum(r() is not None for _, r in evicted_refs)
    print(f"\nfinal: {len(evicted_refs)} evictions, survivors "
          f"pricer={alive_p} jit={alive_j}; RSS {rss_mb():.0f} MiB")

    # Verdicts, printed so the VERIFY paste is self-contained.
    tail_a = a_deltas[2:] or a_deltas[1:]
    tail_b = b_deltas[2:] or b_deltas[1:]
    leak_a = sum(tail_a) / max(1, len(tail_a))
    leak_b = sum(tail_b) / max(1, len(tail_b))
    print(f"steady per-sweep growth: phase A {leak_a:+.1f} MiB/sweep "
          f"({len(classes_a) * args.sweeps} warm quotes), "
          f"phase B {leak_b:+.1f} MiB/sweep (LRU churn)")
    if alive_p or alive_j:
        print("VERDICT: eviction leak — evicted pricers/executables "
              "survive gc (strong refs somewhere)")
        return 1
    print("VERDICT: no retained executables; any RSS growth is compile "
          "footprint / allocator retention, not a serve-layer leak")
    return 0


if __name__ == "__main__":
    sys.exit(main())
