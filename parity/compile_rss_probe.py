"""Localize the ~6.5 MiB/compile host-RSS retention that
parity/serve_leak_probe.py measured on the TPU backend (phase B: linear
~155 MiB per 24-compile sweep with ZERO Python-retained executables;
the CPU backend shows ~0).  Three loops, RSS sampled after gc per
iteration:

  A. compile-and-drop UNIQUE programs (distinct HLO per iteration via a
     baked constant) — growth here is per-COMPILE runtime retention
     (XLA compile arenas / PJRT executable registry / axon
     remote-compile client), independent of the serve layer;
  B. compile-and-drop the SAME program (identical HLO) — growth here
     would implicate the load/instantiate path rather than compilation;
  C. execute-only on one retained program — growth here would be a
     per-dispatch leak (the burn-in's flat main phase says no).

Run:  python parity/compile_rss_probe.py [--iters 40]
"""

from __future__ import annotations

import argparse
import gc
import sys


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for ln in f:
            if ln.startswith("VmRSS:"):
                return int(ln.split()[1]) / 1024.0
    return 0.0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=40)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    print(f"platform={jax.devices()[0].platform}")

    def make(i: int, unique: bool):
        c = float(i) if unique else 0.0

        def f(x):
            # A real (small) program: matmul + elementwise, shapes fixed;
            # `c` baked as a constant makes the HLO unique per i.
            return jnp.tanh(x @ x.T + c).sum()

        return jax.jit(f)

    x = jnp.ones((256, 256), jnp.float32)

    for label, unique in (("A unique-program compile+drop", True),
                          ("B same-program compile+drop", False)):
        gc.collect()
        base = rss_mb()
        marks = []
        for i in range(args.iters):
            f = make(i, unique)
            f(x).block_until_ready()
            del f
            if (i + 1) % 10 == 0 or i + 1 == args.iters:
                gc.collect()
                marks.append(rss_mb() - base)
        per = (marks[-1] - marks[0]) / max(1, args.iters - 10) \
            if len(marks) > 1 else marks[-1] / max(1, args.iters)
        print(f"{label}: +{marks[-1]:.0f} MiB over {args.iters} "
              f"(cum at each 10: {[f'{m:+.0f}' for m in marks]}; "
              f"steady ~{per:.2f} MiB/compile)")

    g = jax.jit(lambda x, s: jnp.tanh(x @ x.T + s).sum())
    g(x, 0.0).block_until_ready()
    gc.collect()
    base = rss_mb()
    for i in range(args.iters * 25):
        g(x, float(i)).block_until_ready()
    gc.collect()
    print(f"C execute-only x{args.iters * 25}: {rss_mb() - base:+.0f} MiB")

    # D. the REAL serve workload's program: build + compile + price + drop
    # the SAME bucketed chain-pricer class repeatedly.  A/B result (TPU
    # v5e): loops A-C are ~0 while D leaks ~5-7 MiB/iteration — the
    # retention tracks the pricer's LARGE compiled programs (thousands of
    # HLO ops), not compilation per se.
    from montecarlooptionspricer_tpu.models import engine

    def one_pricer(i: int):
        cfg = engine.StreamConfig(n_paths=256, n_steps=32, chunk_paths=256,
                                  pilot_paths=256, chunks_per_call=64,
                                  pathgen_impl="xla", cumsum_impl="matmul")
        pr = engine.StreamingChainPricer(
            100.0, 0.04, 0.1, 1.5, -0.4, 0.04, strikes=[95.0, 105.0],
            maturity=32 / 252.0, is_call=False, config=cfg, bucketed=True,
            traced_market=True)
        p, _ = pr.price(jax.random.key(i), with_stderr=True,
                        strikes=[95.0, 105.0], n_paths=256,
                        n_steps_live=24, maturity=24 / 252.0, hurst=0.1,
                        market=dict(s0=100.0, xi=0.04, r=0.04, eta=1.5))
        return float(p[0])

    one_pricer(0)
    gc.collect()
    base = rss_mb()
    n_d = max(10, args.iters // 2)
    marks = []
    for i in range(n_d):
        one_pricer(i + 1)
        if (i + 1) % 5 == 0 or i + 1 == n_d:
            gc.collect()
            marks.append(rss_mb() - base)
    print(f"D same-class pricer compile+price+drop x{n_d}: "
          f"+{marks[-1]:.0f} MiB (cum at each 5: "
          f"{[f'{m:+.0f}' for m in marks]}; "
          f"~{marks[-1] / n_d:.2f} MiB/iter)")

    # E. loop D + jax.clear_caches() per iteration.  Measured (TPU v5e):
    # ~6.5 MiB/iter — clearing JAX's Python-level jit caches does NOT
    # release the retention, so the holder is below JAX (PJRT client /
    # axon remote-compile channel / heap allocator).
    gc.collect()
    base = rss_mb()
    marks = []
    for i in range(n_d):
        one_pricer(1000 + i)
        jax.clear_caches()
        if (i + 1) % 5 == 0 or i + 1 == n_d:
            gc.collect()
            marks.append(rss_mb() - base)
    print(f"E same-class + clear_caches x{n_d}: +{marks[-1]:.0f} MiB "
          f"(~{marks[-1] / n_d:.2f} MiB/iter)")

    # F. loop D + malloc_trim(0) per iteration: if RSS returns here, the
    # "retention" is glibc keeping FREED heap mapped (arena fragmentation
    # from the compile path's large transient allocations) — fixable in
    # serve mode by trimming after evictions — not live memory.
    import ctypes
    libc = ctypes.CDLL("libc.so.6", use_errno=True)
    gc.collect()
    libc.malloc_trim(0)
    base = rss_mb()
    marks = []
    for i in range(2000, 2000 + n_d):
        one_pricer(i)
        gc.collect()
        libc.malloc_trim(0)
        if (i - 2000 + 1) % 5 == 0 or i - 2000 + 1 == n_d:
            marks.append(rss_mb() - base)
    print(f"F same-class + malloc_trim x{n_d}: +{marks[-1]:.0f} MiB "
          f"(cum at each 5: {[f'{m:+.0f}' for m in marks]}; "
          f"~{marks[-1] / n_d:.2f} MiB/iter)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
