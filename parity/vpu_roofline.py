"""Empirical VPU-transcendental roofline for the chol fused kernel
(VERDICT r03 weak #1 / next-round item 2).

The r02 "~65% of MXU roofline" claim died with the Cholesky rewrite: the
f32 ~= bf16 ablation proved the kernel VPU-bound, but nothing said what
fraction of the chip's TRANSCENDENTAL ceiling the measured throughput
represents.  Vendor tables don't publish per-op transcendental rates for
v5e, so this script measures them directly with single-purpose Pallas
microkernels on the same chip:

  * exp ceiling:     independent exps per cell, VMEM-resident, [8, 128]
                     output stripe per grid step (no large transfers);
  * normals ceiling: the kernel's own _normals Box-Muller path (hardware
                     PRNG bits -> log/sqrt/sincos), same code the
                     production kernels call.

Fixed costs (the ~33 ms axon dispatch round trip, output fetch, grid
overhead) are cancelled by the TWO-POINT method: each microkernel runs at
two work levels and the rate is ops_delta / time_delta.  The RTT's ±3 ms
jitter is amortized by queueing R asynchronous invocations per timing and
fetching only the last output (one device stream executes them in
dispatch order), so each delta is ~10x the jitter.

Accounting for the chol + log-boundary priced kernel, per (path, padded
step) cell: 2 standard normals (one fGN plane N + one Brownian plane W),
1 exp (sv; the log-boundary policy needs no per-cell exp), ~17
non-transcendental VPU op-slots (Euler increment ~7, log-boundary policy
~10 — counted from _logpaths_from_x + _policy_value_log_boundary), and
2*s_pad MXU MACs (the fGN matmul X = N @ Lt and the cumsum-as-matmul,
each s_pad MACs/cell).  Transcendentals and elementwise ops share the
VPU's issue slots; the MXU runs concurrently, so the speed-of-light
bound per cell is

  t_cell >= max(2/r_nrm + 1/r_exp + 17/r_fma,  2*s_pad/r_mxu)

with every rate MEASURED on this chip (r_fma via the with_fma delta,
r_mxu via a dependent-chain matmul microkernel at the kernel's own
[512, s_pad] @ [s_pad, s_pad] shape, f32 and bf16).  The printed
attribution says which unit binds and hence what the next lever is.
Run on the real TPU:
ROOFLINE_PATHS_PER_SEC=63.5e6 python parity/vpu_roofline.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


BLOCK, LANES = 512, 512
R = 8  # async invocations per timing (amortizes the tunnel RTT jitter)


def main():
    from montecarlooptionspricer_tpu.utils import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from montecarlooptionspricer_tpu.models.pathgen_pallas import _normals

    grid_n = 64

    def nrm_kernel(seed_ref, out_ref, *, k: int, unroll: int = 1,
                   with_exp: bool = False, with_fma: int = 0):
        # The hardware-PRNG draw is a side effect no compiler rewrite can
        # elide (a pure dependent-exp chain measured FLAT in K — XLA/
        # Mosaic eliminated it), so the normals rate and the exp/FMA
        # rates are all measured on bodies the compiler provably
        # executes.  fori_loop keeps the Mosaic program size
        # K-independent (an unrolled K=512 body took minutes to
        # compile); its ~0.5 us/iteration bookkeeping cancels because
        # every delta below is taken at FIXED K: the normals rate from
        # the inner ``unroll`` delta (extra planes per iteration), the
        # exp/FMA rates from in-situ with_exp/with_fma deltas.
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))

        def body(_, acc):
            for _ in range(unroll):
                a, b = _normals((BLOCK // 2, LANES))
                plane = jnp.concatenate([a, b], axis=0)
                if with_exp:
                    plane = jnp.exp(plane * 1e-3)
                for _ in range(with_fma):
                    # Dependent per-cell FMA chain, but each iteration
                    # is a full [BLOCK, LANES] plane (2048 independent
                    # vregs), so the VPU pipeline stays full.
                    plane = plane * 0.999999 + 1e-7
                acc = acc + plane
            return acc

        acc = jax.lax.fori_loop(0, k, body,
                                jnp.zeros((BLOCK, LANES), jnp.float32))
        out_ref[...] = jnp.sum(acc, axis=0, keepdims=True
                               ).reshape(1, LANES)[:, :128] * jnp.ones(
                                   (8, 128), jnp.float32)

    def run_at(kernel_fn, k, **kw):
        call = pl.pallas_call(
            functools.partial(kernel_fn, k=k, **kw),
            grid=(grid_n,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((grid_n * 8, 128), jnp.float32),
        )
        f = jax.jit(lambda s: call(s))
        seed = jnp.asarray([7], jnp.int32)
        log(f"  compiling nrm k={k} {kw}...")
        np.asarray(f(seed))  # compile
        log("  compiled; timing...")
        best = np.inf
        for _ in range(7):
            t0 = time.perf_counter()
            for _ in range(R):
                out = f(seed)
            np.asarray(out)
            best = min(best, time.perf_counter() - t0)
        return best / R

    K2 = 256
    t_n1 = run_at(nrm_kernel, K2, unroll=1)
    t_n3 = run_at(nrm_kernel, K2, unroll=3)
    d_ops = grid_n * BLOCK * LANES * K2 * 2
    rate_nrm = d_ops / (t_n3 - t_n1)
    log(f"normals: t(K={K2},u=1)={t_n1*1e3:.2f} ms, t(u=3)="
        f"{t_n3*1e3:.2f} ms -> {rate_nrm/1e9:.1f} G normals/s")
    # exp via the in-situ delta at the same K (identical draws, one extra
    # exp per cell per iteration).
    t_e2 = run_at(nrm_kernel, K2, with_exp=True)
    rate_exp = (grid_n * BLOCK * LANES * K2) / (t_e2 - t_n1)
    log(f"normals+exp: t(K={K2})={t_e2*1e3:.2f} ms -> exp rate "
        f"{rate_exp/1e9:.1f} G exp/s (delta vs normals-only)")

    # VPU elementwise (FMA-slot) rate: in-situ delta at the same K with 8
    # extra dependent FMAs per cell per iteration.
    J = 8
    t_f2 = run_at(nrm_kernel, K2, with_fma=J)
    rate_fma = (grid_n * BLOCK * LANES * K2 * J) / (t_f2 - t_n1)
    log(f"normals+{J}fma: t(K={K2})={t_f2*1e3:.2f} ms -> FMA slot rate "
        f"{rate_fma/1e9:.1f} G slots/s (delta vs normals-only)")

    n_steps = int(os.environ.get("ROOFLINE_STEPS", 365))
    s_pad = -(-n_steps // 128) * 128

    # MXU matmul rate at the kernel's own shape: dependent chain
    # A = A @ I so Mosaic can't elide any product; per iteration
    # BLOCK * s_pad * s_pad MACs.  Production form includes the cast
    # (zr.astype(dtype) in _fgn_x), so the bf16 variant casts per step.
    def mm_kernel(seed_ref, b_ref, out_ref, *, k: int, unroll: int, dtype):
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))
        a0, _ = _normals((BLOCK, s_pad))

        def body(_, a):
            for _ in range(unroll):
                a = jnp.dot(a.astype(dtype), b_ref[:],
                            preferred_element_type=jnp.float32)
            return a

        a = jax.lax.fori_loop(0, k, body, a0)
        out_ref[...] = jnp.sum(a, axis=0, keepdims=True
                               ).reshape(1, s_pad)[:, :128] * jnp.ones(
                                   (8, 128), jnp.float32)

    def run_mm(k, unroll, dtype):
        call = pl.pallas_call(
            functools.partial(mm_kernel, k=k, unroll=unroll, dtype=dtype),
            grid=(grid_n,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec((s_pad, s_pad), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((grid_n * 8, 128), jnp.float32),
        )
        f = jax.jit(lambda s, b: call(s, b))
        seed = jnp.asarray([7], jnp.int32)
        eye = jnp.eye(s_pad, dtype=dtype)
        log(f"  compiling mm k={k} u={unroll} {jnp.dtype(dtype).name}...")
        np.asarray(f(seed, eye))  # compile
        log("  compiled; timing...")
        best = np.inf
        for _ in range(7):
            t0 = time.perf_counter()
            for _ in range(R):
                out = f(seed, eye)
            np.asarray(out)
            best = min(best, time.perf_counter() - t0)
        return best / R

    KM = 256
    rates_mxu = {}
    for dtype in (jnp.float32, jnp.bfloat16):
        t1, t3 = run_mm(KM, 1, dtype), run_mm(KM, 3, dtype)
        d_macs = grid_n * BLOCK * s_pad * s_pad * KM * 2
        rates_mxu[jnp.dtype(dtype).name] = rate = d_macs / (t3 - t1)
        log(f"matmul[{BLOCK},{s_pad}]@[{s_pad},{s_pad}] {jnp.dtype(dtype).name}: "
            f"t(K={KM},u=1)={t1*1e3:.2f} ms, t(u=3)={t3*1e3:.2f} ms -> "
            f"{rate/1e12:.1f} T MAC/s")

    measured = float(os.environ.get("ROOFLINE_PATHS_PER_SEC", 63.5e6))
    mxu_dtype = os.environ.get("ROOFLINE_MXU_DTYPE", "float32")
    N_ELEM = 17
    t_vpu = 2.0 / rate_nrm + 1.0 / rate_exp + N_ELEM / rate_fma
    t_mxu = 2.0 * s_pad / rates_mxu[mxu_dtype]
    t_path_meas = 1.0 / measured
    t_cell_meas = t_path_meas / s_pad
    log(f"chol kernel accounting at {n_steps} steps (s_pad {s_pad}, "
        f"fgn/cumsum matmuls {mxu_dtype}):")
    log(f"  VPU bound/cell: {t_vpu*1e12:.1f} ps (normals "
        f"{2/rate_nrm*1e12:.1f} + exp {1/rate_exp*1e12:.1f} + "
        f"{N_ELEM} elem {N_ELEM/rate_fma*1e12:.1f})")
    log(f"  MXU bound/cell: {t_mxu*1e12:.1f} ps ({2*s_pad} MACs at "
        f"{rates_mxu[mxu_dtype]/1e12:.1f} T MAC/s)")
    # Two bounds: "overlap" assumes VPU and MXU stages run concurrently
    # (they cannot within one dependency chain: PRNG -> fGN matmul ->
    # Euler -> cumsum matmul -> policy is serial per block); "serial"
    # charges their sum — the realistic floor for the current kernel
    # structure.  Daylight between the serial bound and the measurement
    # is intra-kernel data movement (materialized [block, s_pad] planes
    # between stages) and stage latency, not arithmetic.
    for name, t_cell_bound in (("overlap", max(t_vpu, t_mxu)),
                               ("serial", t_vpu + t_mxu)):
        log(f"  {name} bound {s_pad*t_cell_bound*1e9:.1f} ns/path vs "
            f"measured {t_path_meas*1e9:.1f} ns/path -> fraction "
            f"{t_cell_bound / t_cell_meas:.2f}")
    frac = (t_vpu + t_mxu) / t_cell_meas
    print(f"ROOFLINE: compute speed-of-light fraction = {frac:.2f} "
          f"serial / {max(t_vpu, t_mxu)/t_cell_meas:.2f} overlap "
          f"(measured {measured/1e6:.1f}M paths/s; normals "
          f"{rate_nrm/1e9:.0f} G/s, exp {rate_exp/1e9:.0f} G/s, fma "
          f"{rate_fma/1e9:.0f} G/s, mxu f32 "
          f"{rates_mxu['float32']/1e12:.1f} / bf16 "
          f"{rates_mxu['bfloat16']/1e12:.1f} T MAC/s)")


if __name__ == "__main__":
    main()
