"""Close the 1e7-vs-1e8 throughput accounting (VERDICT r03 weak #1).

The same streaming program measured 43-46M paths/s at 1e7x365 but 62M at
1e8x365.  Hypothesis: the 1e7 number divides by a wall time that includes
FIXED costs — the pilot generation + LSM backward-induction fit and the
host->device dispatch round trips through the axon tunnel — which amortize
10x better at 1e8.  This probe separates the pieces with direct timing
(and optionally a jax.profiler trace):

  1. fit-only wall time (pilot gen + lsm_fit, materialized);
  2. stream-only wall time at 76 chunks (1e7) and 763 chunks (1e8),
     fits precomputed — the STEADY-STATE rate;
  3. a zero-chunk stream call — the pure dispatch round trip;
  4. end-to-end price() at both sizes — what bench.py historically timed.

If steady-state(1e7) ~= steady-state(1e8) and
end-to-end(1e7) ~= fit + dispatch + stream(1e7), the spread is explained
with no residual.  Run on the real TPU:  python parity/spread_probe.py
(PROBE_TRACE=/tmp/trace captures a profiler trace of one 1e7 stream call).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    from montecarlooptionspricer_tpu.utils import enable_persistent_cache

    enable_persistent_cache()
    import jax

    from montecarlooptionspricer_tpu.models import engine

    N_STEPS, CHUNK, PILOT = 365, 1 << 17, 1 << 17
    S0, XI, H, ETA, RHO, R = 100.0, 0.04, 0.1, 1.5, -0.4, 0.04
    STRIKE, DT = 105.0, 1.0 / 252.0
    cfg = engine.StreamConfig(
        n_paths=CHUNK * 76, n_steps=N_STEPS, chunk_paths=CHUNK,
        pilot_paths=PILOT, dt=DT, chunks_per_call=763,
        pathgen_impl="pallas", rng_impl="rbg", cumsum_impl="matmul",
        pallas_block_paths=512)
    pricer = engine.StreamingPricer(S0, XI, H, ETA, RHO, R, STRIKE,
                                    N_STEPS * DT, False, cfg)

    k_pilot, k_stream = pricer._keys(jax.random.key(42))

    # Warm everything (compiles + cache load).
    fits = jax.device_get(pricer._fit(k_pilot))
    fits_d = pricer._fit(k_pilot)
    _ = jax.device_get(pricer._stream(k_stream, fits_d, 0, 1))

    def timed(fn, reps=5):
        vals = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            vals.append(time.perf_counter() - t0)
        return min(vals), np.median(vals)

    # 1. fit only (fetch one leaf to materialize).
    t_fit, t_fit_med = timed(
        lambda: jax.device_get(pricer._fit(k_pilot)))
    log(f"fit (pilot {PILOT} paths + LSM induction): min {t_fit*1e3:.1f} ms"
        f" / med {t_fit_med*1e3:.1f} ms")

    # 2. dispatch round trip: a zero-chunk stream call.
    t_rtt, t_rtt_med = timed(
        lambda: jax.device_get(pricer._stream(k_stream, fits_d, 0, 0)))
    log(f"zero-chunk dispatch round trip: min {t_rtt*1e3:.1f} ms / med "
        f"{t_rtt_med*1e3:.1f} ms")

    # 3. stream-only at both sizes (fits already on device).
    for n_chunks, tag in ((76, "1e7"), (763, "1e8")):
        t, t_med = timed(
            lambda n=n_chunks: jax.device_get(
                pricer._stream(k_stream, fits_d, 0, n)), reps=3)
        paths = n_chunks * CHUNK
        log(f"stream-only {tag} ({n_chunks} chunks = {paths:.3g} paths): "
            f"min {t:.3f} s -> {paths/t/1e6:.1f}M paths/s steady "
            f"(med {paths/t_med/1e6:.1f}M)")

    # 4. end-to-end price() at both sizes (bench.py's historical quantity).
    for n_paths, tag in ((CHUNK * 76, "1e7"), (CHUNK * 763, "1e8")):
        t0 = time.perf_counter()
        pricer.price(jax.random.key(43), n_paths=n_paths)
        t = time.perf_counter() - t0
        tot = n_paths + PILOT
        log(f"end-to-end {tag} price(): {t:.3f} s -> {tot/t/1e6:.1f}M "
            f"paths/s incl. pilot")

    trace_dir = os.environ.get("PROBE_TRACE")
    if trace_dir:
        import jax.profiler

        with jax.profiler.trace(trace_dir):
            jax.device_get(pricer._stream(k_stream, fits_d, 0, 76))
            jax.device_get(pricer._fit(k_pilot))
        log(f"profiler trace written to {trace_dir}")
    del fits


if __name__ == "__main__":
    main()
