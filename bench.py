"""Headline benchmark: rBergomi path generation + LSM American-put pricing
throughput (paths/sec/chip) at ~1e7 paths x 365 steps on one TPU chip.

This is the BASELINE.md target workload ("paths/sec/chip at 1e7 paths x 365
steps ... priced with LSM").  The reference publishes no numbers
(BASELINE.json published: {}), so ``vs_baseline`` is measured here against a
*batched NumPy float64* implementation of the same algorithm on the host —
a deliberately strong stand-in for the reference's single-node C++ (batched
MKL-backed FFT beats the reference's serial per-path hand-rolled radix-2
loop, RoughVolatility.cpp:346-348).

Prints exactly ONE JSON line to stdout; all telemetry goes to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


# Workload (overridable for smoke runs).
N_STEPS = int(os.environ.get("BENCH_STEPS", 365))
CHUNK = int(os.environ.get("BENCH_CHUNK", 1 << 17))
N_CHUNKS = int(os.environ.get("BENCH_CHUNKS", 76))      # ~1e7 paths
PILOT = int(os.environ.get("BENCH_PILOT", 1 << 17))
BASELINE_PATHS = int(os.environ.get("BENCH_BASELINE_PATHS", 4096))

S0, XI, H, ETA, RHO, R = 100.0, 0.04, 0.1, 1.5, -0.4, 0.04
STRIKE, DT = 105.0, 1.0 / 252.0
MATURITY = N_STEPS * DT
IS_CALL = False
POLY_ORDER = 2


def numpy_baseline(n_paths: int) -> float:
    """Reference-equivalent single-host pipeline in float64 NumPy: spectral
    fGN via batched FFT, Euler log-recursion, value-carrying LSM backward
    induction with per-step lstsq.  Returns paths/sec."""
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()

    t = np.arange(N_STEPS + 1) * DT
    lam = 0.5 * t ** (2 * H)
    m1 = 1 << (N_STEPS + 1 - 1).bit_length()
    phi = np.conj(np.fft.fft(lam, n=m1))
    z = rng.standard_normal((n_paths, N_STEPS)) + 1j * rng.standard_normal(
        (n_paths, N_STEPS))
    m2 = 1 << (N_STEPS - 1).bit_length()
    x = np.real(np.fft.fft(phi[:N_STEPS] * z, n=m2, axis=1))[:, :N_STEPS] / m2
    x *= np.sqrt(2 * H) * ETA
    v = XI * np.exp(x - 0.5 * ETA**2 * t[:N_STEPS] ** (2 * H))
    w1 = rng.standard_normal((n_paths, N_STEPS))
    w2 = rng.standard_normal((n_paths, N_STEPS))
    dw = (RHO * w1 + np.sqrt(1 - RHO**2) * w2) * np.sqrt(DT)
    inc = (R - 0.5 * v) * DT + np.sqrt(np.maximum(v, 0.0)) * dw
    s = S0 * np.exp(np.cumsum(inc, axis=1))
    paths = np.concatenate([np.full((n_paths, 1), S0), s], axis=1)

    disc = np.exp(-R * DT)
    values = np.maximum(STRIKE - paths[:, -1], 0.0)
    for j in range(N_STEPS - 1, -1, -1):
        vd = values * disc
        p = np.maximum(STRIKE - paths[:, j], 0.0)
        itm = p > 1e-14
        values = vd
        if itm.any():
            # continuation evaluated on the ITM rows only, like the
            # reference algorithm (tests/oracles.py)
            a = np.vander(paths[itm, j], POLY_ORDER + 1, increasing=True)
            c, *_ = np.linalg.lstsq(a, vd[itm], rcond=None)
            values = vd.copy()
            values[itm] = np.maximum(p[itm], a @ c)
    _ = values.mean()
    return n_paths / (time.perf_counter() - t0)


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def probe_device() -> None:
    """Fail FAST if the device backend is unreachable.

    jax.devices() blocks indefinitely when the tunneled TPU's relay is
    down — a hung bench is indistinguishable from a slow one to the
    caller.  A bounded subprocess probe (the hang lives in backend C++
    where in-process alarms can't interrupt) turns that into a prompt,
    diagnosable failure.  BENCH_NO_PROBE=1 skips it."""
    if os.environ.get("BENCH_NO_PROBE") == "1":
        return
    import subprocess

    timeout_s = int(os.environ.get("BENCH_PROBE_TIMEOUT", 240))
    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, check=True,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    except subprocess.TimeoutExpired:
        log(f"device backend unreachable: jax.devices() exceeded "
            f"{timeout_s}s (tunnel down?) — aborting instead of hanging")
        sys.exit(1)
    except subprocess.CalledProcessError as e:
        log(f"device backend probe failed (rc={e.returncode}) — aborting")
        sys.exit(1)


def main() -> None:
    probe_device()

    from montecarlooptionspricer_tpu.utils import enable_persistent_cache

    cache_dir = enable_persistent_cache()
    log(f"compilation cache: {cache_dir}")

    import jax

    from montecarlooptionspricer_tpu.models import engine

    dev = jax.devices()[0]
    log(f"device: {dev} platform={dev.platform}")

    n_paths = CHUNK * N_CHUNKS
    # Measured-fastest v5e configuration (see models/engine.StreamConfig):
    # fused Pallas path kernel (in-kernel hardware PRNG, MXU fGN + MXU
    # triangular-matmul accumulation).  BENCH_PATHGEN=xla selects the
    # portable generator (rbg RNG, MXU cumsum, bf16 fGN inputs).
    pathgen = os.environ.get("BENCH_PATHGEN", "pallas")
    # Measured dtype defaults (v5e): the short-horizon fused kernel is
    # VPU-bound, so bf16 fGN only adds cast work (f32 36.3M vs bf16 34.1M
    # paths/s at 1e7x365); past the single-tile limit the step-tiled kernel
    # is MXU-bound on the [s_pad, s_pad] fGN matmul and bf16 slabs win.
    from montecarlooptionspricer_tpu.models import pathgen_pallas
    # Form-aware: the engine resolves fgn_form auto -> chol, whose
    # single-tile cap is 1024 padded steps — 513-1024-step runs are
    # single-tile (VPU-bound, f32), not long-horizon.
    bench_form = os.environ.get("BENCH_FGN_FORM", "auto")
    resolved_form = "chol" if bench_form in ("auto", "chol") else bench_form
    long_horizon = not pathgen_pallas.supports(N_STEPS, resolved_form)
    default_fgn = ("bfloat16" if (pathgen != "pallas" or long_horizon)
                   else "float32")
    cfg = engine.StreamConfig(n_paths=n_paths, n_steps=N_STEPS,
                              chunk_paths=CHUNK, pilot_paths=PILOT, dt=DT,
                              poly_order=POLY_ORDER,
                              chunks_per_call=N_CHUNKS,
                              pathgen_impl=pathgen,
                              rng_impl=os.environ.get("BENCH_RNG", "rbg"),
                              cumsum_impl="matmul",
                              pallas_block_paths=int(
                                  os.environ.get("BENCH_BLOCK", 512)),
                              tiled_impl=os.environ.get(
                                  "BENCH_TILED", "auto"),
                              fgn_form=os.environ.get(
                                  "BENCH_FGN_FORM", "auto"),
                              policy_form=os.environ.get(
                                  "BENCH_POLICY", "boundary"),
                              # A/B only: pairing changes the sample's
                              # joint law (see StreamConfig.antithetic),
                              # so the headline stays plain MC.
                              antithetic=os.environ.get(
                                  "BENCH_ANTITHETIC") == "1",
                              pallas_interleave=int(os.environ.get(
                                  "BENCH_INTERLEAVE", 1)),
                              pallas_schedule=os.environ.get(
                                  "BENCH_SCHEDULE", "chained"),
                              fgn_matmul_dtype=os.environ.get(
                                  "BENCH_FGN_DTYPE", default_fgn))
    pricer = engine.StreamingPricer(S0, XI, H, ETA, RHO, R, STRIKE,
                                    MATURITY, IS_CALL, cfg)

    # Warmup: same compiled programs (chunk count is a traced argument),
    # one chunk of work.
    t0 = time.perf_counter()
    pricer.price(jax.random.key(0), n_paths=CHUNK)
    log(f"warmup (compile + 1 chunk): {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    price = pricer.price(jax.random.key(42))
    elapsed = time.perf_counter() - t0
    throughput = (n_paths + PILOT) / elapsed
    log(f"price={price:.6f} paths={n_paths + PILOT} elapsed={elapsed:.3f}s "
        f"throughput={throughput:,.0f} paths/s/chip (END-TO-END: includes "
        "the pilot fit and per-call dispatch)")

    # Steady-state: the stream program alone, fits precomputed — the rate
    # the kernel sustains once fixed costs (pilot fit ~47 ms, axon-tunnel
    # dispatch ~33 ms/call) are amortized.  This is why a 1e8 end-to-end
    # run measures ~63M while 1e7 measures ~43-53M: same program, fixed
    # costs 10x better amortized (parity/spread_probe.py, VERIFY_r04).
    k_pilot, k_stream = pricer._keys(jax.random.key(42))
    fits_d = pricer._fit(k_pilot)
    jax.device_get(pricer._stream(k_stream, fits_d, 0, 1))  # warm
    t_stream = min(_timed(lambda: jax.device_get(
        pricer._stream(k_stream, fits_d, 0, N_CHUNKS))) for _ in range(3))
    steady = n_paths / t_stream
    log(f"steady-state (stream-only, {N_CHUNKS} chunks): {t_stream:.3f}s "
        f"-> {steady:,.0f} paths/s/chip")

    # Session RTT + pilot cost, measured IN-RUN so every BENCH_r*.json is
    # self-normalizing (VERIFY_r05 §5): the end-to-end number is
    # t_stream + t_pilot + dispatch RTTs, and the 40.0-45.5M
    # session-to-session spread is tunnel-RTT weather on those fixed
    # costs, not kernel variance.  rtt_ms = median round-trip of a warm
    # trivial program; pilot_ms = warm pilot fit + fit-consts dispatch.
    import jax.numpy as jnp

    triv = jax.jit(lambda x: x + 1.0)
    jax.device_get(triv(jnp.zeros(8, jnp.float32)))  # warm/compile
    rtts = sorted(_timed(lambda: jax.device_get(
        triv(jnp.zeros(8, jnp.float32)))) for _ in range(21))
    rtt_ms = rtts[10] * 1e3
    t_pilot = min(_timed(lambda: jax.block_until_ready(
        pricer._fit(k_pilot))) for _ in range(3))
    fixed_ms = t_pilot * 1e3 + 2 * rtt_ms
    # Same numerator as the measured end-to-end line (n_paths + PILOT):
    # price() streams n_paths on top of the PILOT-path policy fit, and
    # `throughput` counts both.
    predicted = (n_paths + PILOT) / (t_stream + fixed_ms / 1e3)
    log(f"session RTT median {rtt_ms:.1f} ms; pilot fit {t_pilot*1e3:.0f} "
        f"ms; fixed-cost model predicts end-to-end "
        f"{predicted:,.0f} paths/s (measured {throughput:,.0f})")

    log(f"measuring NumPy float64 baseline on {BASELINE_PATHS} paths...")
    base = numpy_baseline(BASELINE_PATHS)
    log(f"baseline: {base:,.0f} paths/s (batched NumPy, single host)")

    # Metric name reflects the ACTUAL workload so env-override smoke runs
    # can't be mistaken for the headline 1e7x365 number.
    total = n_paths + PILOT
    mag = f"{total:.0e}".replace("e+0", "e").replace("e+", "e")
    print(json.dumps({
        "metric": f"rbergomi_lsm_paths_per_sec_per_chip_{mag}x{N_STEPS}",
        "value": round(throughput, 1),
        "unit": "paths/s/chip",
        "vs_baseline": round(throughput / base, 2),
        # Steady-state stream rate (fixed pilot-fit + dispatch costs
        # excluded) — the 1e8-equivalent rate of the same program.
        "steady_state": round(steady, 1),
        # Self-normalizing context (VERIFY_r05 §5): this session's tunnel
        # RTT and pilot-fit cost.  end-to-end ~= (n_paths + pilot) /
        # (t_stream + pilot_ms + 2*rtt_ms); the spread across
        # BENCH_r*.json files is carried by these two numbers, not the
        # kernel.
        "rtt_ms": round(rtt_ms, 1),
        "pilot_ms": round(t_pilot * 1e3, 1),
        "fixed_cost_predicted": round(predicted, 1),
    }))


if __name__ == "__main__":
    main()
