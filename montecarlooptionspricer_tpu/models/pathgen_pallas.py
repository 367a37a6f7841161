"""Pallas TPU kernel: fused rBergomi path generation.

The reference generates each path serially — fresh mt19937 draws, three
hand-rolled FFTs, then a scalar Euler loop (RoughVolatility.cpp:346-365).
The XLA version (models/engine.make_chunk_pathgen) already batches all of
that; this kernel removes the remaining HBM traffic: the four noise planes
(Zr, Zi, W1, W2 — 4 x [chunk, steps] float32) are never materialized in HBM.
Per grid block it

  1. seeds the per-core PRNG from (seed, block_id) — counter-based,
     reproducible, and race-free by construction (the reference's shared
     generator is a data race, BranchingProcessPricer.cpp:84-108);
  2. draws uniform bits and converts to normals via Box-Muller on the VPU;
  3. runs the spectral fGN synthesis as two MXU matmuls against the
     precomputed [steps_pad, steps_pad] matrices (ops.fgn.fgn_matrices
     semantics, zero-padded to lane multiples);
  4. applies the forward-variance curve and the correlated Euler
     log-recursion as a cumulative sum, writing only the final
     [block, steps+1] price block.

Distribution-equivalent to the XLA generator (tests/test_pallas.py checks
moments); bitwise RNG streams differ (Box-Muller vs inverse-CDF threefry).
"""

from __future__ import annotations

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
TWO_PI = 2.0 * math.pi


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _uniform_open(bits):
    """uint32 -> float32 uniform in (0, 1]: (bits >> 8) * 2^-24, shifted
    away from zero so log() is safe.  Mosaic has no uint32->f32 cast, so
    route through int32 (after >> 8 the value fits in 24 bits, positive)."""
    u = (bits >> 8).astype(jnp.int32).astype(jnp.float32) * (1.0 / (1 << 24))
    return u + (0.5 / (1 << 24))


def _normals(shape):
    """Two independent standard-normal arrays via one Box-Muller pair."""
    b1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    b2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    u1 = _uniform_open(b1)
    u2 = _uniform_open(b2)
    rad = jnp.sqrt(-2.0 * jnp.log(u1))
    ang = TWO_PI * u2
    return rad * jnp.cos(ang), rad * jnp.sin(ang)


def _euler_from_noise(zr, zi, w1, w2, cr_ref, ci_ref, vd_ref, tri_ref,
                      out_ref, *, n_steps: int, s_pad: int, xi: float,
                      r: float, rho: float, dt: float, log_s0: float):
    """Shared math path: fGN matmul + variance curve + Euler accumulation."""
    block = out_ref.shape[0]
    # fGN via MXU: X = Zr @ Cr - Zi @ Ci (padded cols of C are zero, so the
    # padded tail of Z is annihilated in the products' valid columns).
    x = (jnp.dot(zr, cr_ref[:], preferred_element_type=jnp.float32)
         - jnp.dot(zi, ci_ref[:], preferred_element_type=jnp.float32))

    v = xi * jnp.exp(x + vd_ref[:])                     # forward variance
    rho_c = math.sqrt(max(0.0, 1.0 - rho * rho))
    dw = (rho * w1 + rho_c * w2) * math.sqrt(dt)
    inc = (r - 0.5 * v) * dt + jnp.sqrt(jnp.maximum(v, 0.0)) * dw

    # Zero the padded step columns so the accumulation stays flat past
    # n_steps (belt and braces: tri's padded rows are zero too).
    col = jax.lax.broadcasted_iota(jnp.int32, (block, s_pad), 1)
    inc = jnp.where(col < n_steps, inc, 0.0)

    # Cumulative sum as an MXU product with the upper-triangular ones
    # matrix (Pallas TPU has no cumsum lowering; the matmul is also the
    # faster form at these step counts).
    log_s = log_s0 + jnp.dot(inc, tri_ref[:],
                             preferred_element_type=jnp.float32)
    s = jnp.exp(log_s)
    # out[:, 0] = S0; out[:, 1:n_steps+1] = S.
    out_ref[:, 0] = jnp.full((block,), math.exp(log_s0), jnp.float32)
    out_ref[:, 1:] = s[:, : out_ref.shape[1] - 1]


def _pathgen_kernel(seed_ref, cr_ref, ci_ref, vd_ref, tri_ref, out_ref, **kw):
    """Production kernel: in-kernel hardware PRNG (zero HBM noise traffic)."""
    pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    block, s_pad = out_ref.shape[0], kw["s_pad"]
    zr, zi = _normals((block, s_pad))
    w1, w2 = _normals((block, s_pad))
    _euler_from_noise(zr, zi, w1, w2, cr_ref, ci_ref, vd_ref, tri_ref,
                      out_ref, **kw)


def _pathgen_kernel_noise_in(noise_ref, cr_ref, ci_ref, vd_ref, tri_ref,
                             out_ref, **kw):
    """Test kernel: noise supplied as input — lets the math path be checked
    bit-for-bit against the XLA generator on any backend (the TPU
    interpreter stubs prng_random_bits to zeros in this JAX version)."""
    _euler_from_noise(noise_ref[0], noise_ref[1], noise_ref[2], noise_ref[3],
                      cr_ref, ci_ref, vd_ref, tri_ref, out_ref, **kw)


MAX_KERNEL_STEPS = 512


def supports(n_steps: int) -> bool:
    """Whether the fused kernel fits VMEM: the three [s_pad, s_pad]
    constants (Cr, Ci, tri) plus four noise planes per block must stay
    well under the ~16 MiB/core budget; past ~512 padded steps they don't
    (the streaming engine falls back to the XLA generator there)."""
    return _round_up(n_steps, LANE) <= MAX_KERNEL_STEPS


def _build(s0, xi, h, eta, rho, r, n_steps: int, dt: float,
           chunk_paths: int, block_paths: int, interpret: bool,
           noise_input: bool):
    if chunk_paths % block_paths:
        raise ValueError("chunk_paths must divide by block_paths")
    if not supports(n_steps):
        raise ValueError(
            f"n_steps={n_steps} pads past {MAX_KERNEL_STEPS} lanes; the "
            "fused kernel's VMEM-resident spectral matrices do not fit — "
            "use the XLA generator (pathgen_impl='xla')")
    s_pad = _round_up(n_steps, LANE)
    out_cols = _round_up(n_steps + 1, LANE)

    from .engine import _fgn_matrices_host

    cr, ci = _fgn_matrices_host(n_steps, h, eta, dt, jnp.float32)
    cr_p = jnp.zeros((s_pad, s_pad), jnp.float32).at[:n_steps, :n_steps].set(cr)
    ci_p = jnp.zeros((s_pad, s_pad), jnp.float32).at[:n_steps, :n_steps].set(ci)
    t = np.arange(n_steps, dtype=np.float64) * dt
    vd = -0.5 * (eta * eta) * t ** (2.0 * h)
    vd_p = jnp.zeros((1, s_pad), jnp.float32).at[0, :n_steps].set(
        jnp.asarray(vd, jnp.float32))
    # Upper-triangular ones, rows past n_steps zeroed (annihilates padding).
    tri = np.triu(np.ones((s_pad, s_pad), np.float32))
    tri[n_steps:, :] = 0.0
    tri_p = jnp.asarray(tri)

    kw = dict(n_steps=n_steps, s_pad=s_pad, xi=float(xi), r=float(r),
              rho=float(rho), dt=float(dt), log_s0=float(math.log(s0)))
    body = _pathgen_kernel_noise_in if noise_input else _pathgen_kernel
    kernel = functools.partial(body, **kw)

    first_spec = (
        pl.BlockSpec((4, block_paths, s_pad), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM) if noise_input
        else pl.BlockSpec(memory_space=pltpu.SMEM))
    grid = (chunk_paths // block_paths,)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            first_spec,                                     # seed or noise
            pl.BlockSpec((s_pad, s_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),          # Cr
            pl.BlockSpec((s_pad, s_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),          # Ci
            pl.BlockSpec((1, s_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),          # var drift
            pl.BlockSpec((s_pad, s_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),          # cumsum tri
        ],
        out_specs=pl.BlockSpec((block_paths, out_cols), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((chunk_paths, out_cols), jnp.float32),
        interpret=pltpu.InterpretParams() if interpret else False,
    )
    return call, (cr_p, ci_p, vd_p, tri_p), s_pad


def make_pallas_pathgen(s0, xi, h, eta, rho, r, n_steps: int, dt: float,
                        chunk_paths: int, block_paths: int = 256,
                        interpret: bool = False):
    """Build seed -> [chunk_paths, n_steps + 1] float32 rBergomi generator
    with in-kernel RNG.

    ``seed`` is an int32 scalar; the kernel folds the grid block id into the
    PRNG seed, so pass a distinct seed per chunk for independent chunks.
    """
    call, consts, _ = _build(s0, xi, h, eta, rho, r, n_steps, dt, chunk_paths,
                             block_paths, interpret, noise_input=False)

    def gen(seed) -> jax.Array:
        seed_arr = jnp.atleast_1d(jnp.asarray(seed, jnp.int32))
        out = call(seed_arr, *consts)
        return out[:, : n_steps + 1]

    return gen


def make_pallas_pathgen_from_noise(s0, xi, h, eta, rho, r, n_steps: int,
                                   dt: float, chunk_paths: int,
                                   block_paths: int = 256,
                                   interpret: bool = False):
    """Test variant: noise [4, chunk, s_pad] (Zr, Zi, W1, W2) supplied by the
    caller, so the kernel's math path can be compared elementwise against
    the XLA generator on any backend."""
    call, consts, s_pad = _build(s0, xi, h, eta, rho, r, n_steps, dt,
                                 chunk_paths, block_paths, interpret,
                                 noise_input=True)

    def gen(noise) -> jax.Array:
        assert noise.shape == (4, chunk_paths, s_pad), (noise.shape, s_pad)
        out = call(noise.astype(jnp.float32), *consts)
        return out[:, : n_steps + 1]

    return gen, s_pad
