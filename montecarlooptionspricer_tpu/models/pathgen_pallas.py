"""Pallas TPU kernel: fused rBergomi path generation.

The reference generates each path serially — fresh mt19937 draws, three
hand-rolled FFTs, then a scalar Euler loop (RoughVolatility.cpp:346-365).
The XLA version (models/engine.make_chunk_pathgen) already batches all of
that; this kernel removes the remaining HBM traffic: the three noise planes
(Zr, Zi, W — 3 x [chunk, steps] float32; the reference's w1/w2 pair is one
normal in distribution, see _paths_from_noise) are never materialized in
HBM.  Per grid block it

  1. seeds the per-core PRNG from (seed, block_id) — counter-based,
     reproducible, and race-free by construction (the reference's shared
     generator is a data race, BranchingProcessPricer.cpp:84-108);
  2. draws uniform bits and converts to normals via Box-Muller on the VPU
     (1.5 pairs per 3 normals, sin via sqrt — see _normals/_normals3);
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


_MIX1 = np.uint32(0x9E3779B1).astype(np.int32)  # golden-ratio odd constant
_MIX2 = np.uint32(0x85EBCA77).astype(np.int32)  # murmur3-style odd constant


def _fold_words(a, b):
    """Mix the (run_word, stream_index) carrier into one int32 seed word
    (Mosaic's prng_seed takes at most 2 values and we also fold the grid
    block id).  For a FIXED run word the map b -> h is a composition of
    bijections (xor, odd multiply, xorshift mod 2^32), so distinct stream
    indices within a run can never collide; across runs collisions are the
    usual 2^-32 per pair."""
    h = (a * _MIX1) ^ b
    h = h * _MIX2
    return h ^ jax.lax.shift_right_logical(h, 13)


def _uniform_open(bits):
    """uint32 -> float32 uniform in (0, 1]: (bits >> 8) * 2^-24, shifted
    away from zero so log() is safe.  Mosaic has no uint32->f32 cast, so
    route through int32 (after >> 8 the value fits in 24 bits, positive)."""
    u = (bits >> 8).astype(jnp.int32).astype(jnp.float32) * (1.0 / (1 << 24))
    return u + (0.5 / (1 << 24))


# Compute Box-Muller's sin(2*pi*u) as sign(u<0.5)*sqrt(1-cos^2) instead of a
# second transcendental.  Measured on v5e at 1e7x365 (fused kernel, block
# 512): plain sin 36.3M paths/s vs the sqrt form 32.8M — the VPU's hardware
# sin is cheaper than sqrt + select + the extra multiply, so this stays OFF;
# kept as a build-time flag because the tradeoff is hardware-generation
# specific.
SIN_VIA_SQRT = False


def _normals(shape):
    """Two independent standard-normal arrays via one Box-Muller pair."""
    b1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    b2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    u1 = _uniform_open(b1)
    u2 = _uniform_open(b2)
    rad = jnp.sqrt(-2.0 * jnp.log(u1))
    c = jnp.cos(TWO_PI * u2)
    if SIN_VIA_SQRT:
        # sin(2*pi*u2) >= 0 iff u2 < 0.5; |sin| = sqrt(1-cos^2).  The f32
        # cancellation near |cos|=1 perturbs tiny |sin| values by ~1e-4
        # absolute — far below the f32 Box-Muller noise floor that matters
        # for MC moments (tests/test_engine.py checks prices on hardware).
        s = jnp.sqrt(jnp.maximum(0.0, 1.0 - c * c))
        s = jnp.where(u2 < 0.5, s, -s)
    else:
        s = jnp.sin(TWO_PI * u2)
    return rad * c, rad * s


def _normals3(block: int, s_pad: int):
    """Three standard-normal [block, s_pad] planes from 1.5 Box-Muller pairs
    — 3 normals per 2 uniform draws instead of 2, cutting the VPU
    transcendental count 25% (the kernel's measured bound at short
    horizons).  Requires block % 16 == 0 so the row slices stay
    sublane-aligned."""
    half = block // 2
    n1, n2 = _normals((block + half, s_pad))
    zr, zi = n1[:block], n2[:block]
    w = jnp.concatenate([n1[block:], n2[block:]], axis=0)
    return zr, zi, w


def _logpaths_from_noise(zr, zi, w, cr_ref, ci_ref, vd_ref, tri_ref, *,
                         n_steps: int, s_pad: int, xi: float, r: float,
                         dt: float, log_s0: float):
    """Shared math path: fGN matmul + variance curve + Euler accumulation.
    Returns log S [block, s_pad] with column c = step c+1 (pad columns
    flat).

    ``w`` is the single price-Brownian plane: the reference's
    rho*w1 + sqrt(1-rho^2)*w2 is one N(0,1) independent of the fGN driver
    for any rho (RoughVolatility.cpp:355-358 draws both fresh), so drawing
    it directly is distribution-identical and 25% cheaper — see
    rough_volatility.euler_log_paths.

    With ``zi is None`` (the "chol" fGN form), ``zr`` is ONE normal plane
    and ``cr_ref`` the Cholesky factor Lt of the spectral map's covariance
    (engine._chol_matrix_host): X = N @ Lt — same Gaussian law from half
    the noise and one matmul.

    HALF-SCALED constants contract: the fGN matrices arrive pre-scaled by
    0.5 (_fgn_consts) and ``vd_ref`` carries 0.5*(ln xi + drift)
    (_half_var_drift), so ONE exp yields sqrt(v) directly and v = sv*sv —
    eliminating the sqrt(v) transcendental and the max(v, 0) clamp per
    cell (exp is positive by construction).  Multiplication by 0.5 is
    exact in binary floating point, so the computed map is identical."""
    return _logpaths_from_x(
        _fgn_x(zr, zi, cr_ref, ci_ref), w, vd_ref, tri_ref,
        n_steps=n_steps, s_pad=s_pad, xi=xi, r=r, dt=dt, log_s0=log_s0)


def _fgn_x(zr, zi, cr_ref, ci_ref):
    """The half-scaled fGN plane from the driver noise — the linear stage
    of _logpaths_from_noise.  fGN via MXU: X = Zr @ Cr - Zi @ Ci (padded
    cols of C are zero, so the padded tail of Z is annihilated in the
    products' valid columns); X = N @ Lt for the chol form (zi None).
    The matrices' dtype drives the matmul precision: bf16 inputs with f32
    accumulation run ~2x faster on the MXU, adding ~0.4% relative noise
    to X — far below MC noise at any realistic path count.  Linearity is
    the antithetic kernels' lever: the partner's plane is -X, so the
    matmul is computed once per pair."""
    if zi is None:
        return jnp.dot(zr.astype(cr_ref.dtype), cr_ref[:],
                       preferred_element_type=jnp.float32)
    return (jnp.dot(zr.astype(cr_ref.dtype), cr_ref[:],
                    preferred_element_type=jnp.float32)
            - jnp.dot(zi.astype(ci_ref.dtype), ci_ref[:],
                      preferred_element_type=jnp.float32))


def _logpaths_from_x_anti(x, w, vd_ref, tri_ref, **kw):
    """Antithetic nonlinear stage: ``x``/``w`` carry HALF the block's
    rows; returns log S for the full block with members in the halves.
    Measured dead end (v5e, 1e7x365): exploiting sv+ * sv- = exp(2 vd)
    to replace the partner's exp with one divide landed at 57-61M
    paths/s vs 59-62M for the plain two-exp form — the VPU divide costs
    ~an exp here — so the pair simply evaluates both exps on the
    concatenated plane (also keeps each member's arithmetic EXACTLY the
    plain body's, which the pair tests pin at rtol 1e-6)."""
    x = jnp.concatenate([x, -x], axis=0)
    w = jnp.concatenate([w, -w], axis=0)
    return _logpaths_from_x(x, w, vd_ref, tri_ref, **kw)


def _logpaths_from_x(x, w, vd_ref, tri_ref, *, n_steps: int, s_pad: int,
                     xi: float, r: float, dt: float, log_s0: float):
    """The nonlinear stage of _logpaths_from_noise: variance curve + Euler
    accumulation from an already-materialized fGN plane ``x``."""
    del xi, s_pad  # xi folded into vd_ref as ln(xi)/2 (half-scaled)
    sv = jnp.exp(x + vd_ref[:])            # sqrt of the forward variance
    return _euler_from_sv(sv, w, tri_ref, n_steps=n_steps, r=r, dt=dt,
                          log_s0=log_s0)


def _euler_inc(x, w, vd_ref, *, n_steps: int, r: float, dt: float):
    """The VPU half of the nonlinear stage alone: exp + Euler increments,
    WITHOUT the cumsum matmul — the split point of the staggered two-half
    schedule (_priced_log_subvals_staggered), which wants each half's
    MXU cumsum adjacent in program order to the OTHER half's VPU work.
    Arithmetic identical to _logpaths_from_x up to the cumsum."""
    sv = jnp.exp(x + vd_ref[:])
    block, s_pad = sv.shape
    v = sv * sv
    inc = (r - 0.5 * v) * dt + sv * (w * math.sqrt(dt))
    col = jax.lax.broadcasted_iota(jnp.int32, (block, s_pad), 1)
    return jnp.where(col < n_steps, inc, 0.0)


def _cumsum_log(inc, tri_ref, log_s0: float):
    """The MXU half: cumulative sum as an upper-triangular matmul (cf.
    _euler_from_sv) from already-masked increments."""
    return log_s0 + jnp.dot(inc, tri_ref[:],
                            preferred_element_type=jnp.float32)


def _euler_from_sv(sv, w, tri_ref, *, n_steps: int, r: float, dt: float,
                   log_s0: float):
    """Euler accumulation from the sqrt-variance plane (shared tail of
    the plain and antithetic nonlinear stages)."""
    block, s_pad = sv.shape
    v = sv * sv
    inc = (r - 0.5 * v) * dt + sv * (w * math.sqrt(dt))

    # Zero the padded step columns so the accumulation stays flat past
    # n_steps (belt and braces: tri's padded rows are zero too).
    col = jax.lax.broadcasted_iota(jnp.int32, (block, s_pad), 1)
    inc = jnp.where(col < n_steps, inc, 0.0)

    # Cumulative sum as an MXU product with the upper-triangular ones
    # matrix (Pallas TPU has no cumsum lowering; the matmul is also the
    # faster form at these step counts).
    return log_s0 + jnp.dot(inc, tri_ref[:],
                            preferred_element_type=jnp.float32)


def _paths_from_noise(*args, **kw):
    """S = exp(log S) of _logpaths_from_noise — the form consumers of the
    PRICE plane use.  The log-boundary priced kernel skips this exp (one
    per cell) and works on the log plane directly (_policy_value_log_
    boundary: one exp per PATH at the stop step)."""
    return jnp.exp(_logpaths_from_noise(*args, **kw))


def _draw_planes(block: int, s_pad: int, fgn_form: str):
    """In-kernel noise planes for the requested fGN form: (Zr, Zi, W) for
    the spectral map, (N, None, W) for the Cholesky map — one Box-Muller
    pair exactly, 33% fewer draws."""
    if fgn_form == "chol":
        n, w = _normals((block, s_pad))
        return n, None, w
    return _normals3(block, s_pad)


def _noise_planes(noise_ref, fgn_form: str):
    """Injected-noise unpack mirroring _draw_planes (2 planes for chol)."""
    if fgn_form == "chol":
        return noise_ref[0], None, noise_ref[1]
    return noise_ref[0], noise_ref[1], noise_ref[2]


def _mats2(mats):
    """(Cr, Ci) for the spectral form; (Lt, None) for the chol form."""
    return (mats[0], mats[1]) if len(mats) == 2 else (mats[0], None)


def n_planes(fgn_form: str) -> int:
    """Noise planes consumed per path block by the given fGN form."""
    return 2 if fgn_form == "chol" else 3


def _euler_from_noise(zr, zi, w, cr_ref, ci_ref, vd_ref, tri_ref,
                      out_ref, antithetic: bool = False, **kw):
    block = out_ref.shape[0]
    x = _fgn_x(zr, zi, cr_ref, ci_ref)
    stage = _logpaths_from_x_anti if antithetic else _logpaths_from_x
    s = jnp.exp(stage(x, w, vd_ref, tri_ref, **kw))
    # out[:, 0] = S0; out[:, 1:n_steps+1] = S.  When n_steps is a lane
    # multiple, out has one more padded lane-group than s (out_cols =
    # round_up(n_steps + 1) > s_pad) — pad s to fit.
    want = out_ref.shape[1] - 1
    if s.shape[1] < want:
        s = jnp.pad(s, ((0, 0), (0, want - s.shape[1])))
    out_ref[:, 0] = jnp.full((block,), math.exp(kw["log_s0"]), jnp.float32)
    out_ref[:, 1:] = s[:, :want]


def _policy_value(s, su_ref, pol_ref, *, is_call: bool, strike: float):
    """In-kernel LSM exercise policy (models/engine.lsm_policy_value for
    columns 1..n_steps; column 0 is handled by the caller since every path
    shares S0): first column where the payoff is in the money and beats the
    fitted continuation takes its discounted payoff.  "First" is computed
    MXU-style: prior-exercise counts via a strictly-upper-triangular ones
    matmul (no cumsum in Mosaic)."""
    c0, c1, c2 = pol_ref[0, :], pol_ref[1, :], pol_ref[2, :]
    mu, sd = pol_ref[3, :], pol_ref[4, :]
    eps, disc = pol_ref[5, :], pol_ref[6, :]

    p = jnp.maximum(s - strike, 0.0) if is_call else jnp.maximum(
        strike - s, 0.0)
    z = (s - mu) / sd
    cont = (c2 * z + c1) * z + c0
    # {0,1} indicators are exact in bf16 and the f32 accumulation keeps the
    # prior-exercise counts exact, so this matmul can always run at the
    # MXU's bf16 rate.
    exf = ((p > eps) & (p >= cont)).astype(jnp.float32)
    prior = jnp.dot(exf.astype(su_ref.dtype), su_ref[:],
                    preferred_element_type=jnp.float32)
    first = exf * (prior == 0.0).astype(jnp.float32)
    return jnp.sum(first * p * disc)


def _policy_value_minreduce(s, pol_row, col, *, is_call: bool):
    """`_policy_value` with the first-exercise step found by a min-index
    reduction instead of the strict-upper-triangular matmul: idx = min of
    the column index over exercising columns, then a one-hot select.  ~12
    VPU ops per cell, no MXU work — the right form when many policies are
    evaluated on one path block (the chain kernel).  ``col`` is the shared
    [block, s_pad] column iota (hoisted out of the per-strike loop); the
    per-step 1/sd is hoisted to a [s_pad] vector so the cell-level divide
    becomes a multiply.

    The strike comes from the policy table (row 7, replicated across
    columns), NOT a compile-time constant: a serving process can then
    price fresh strike strips against the same compiled kernel."""
    c0, c1, c2 = pol_row[0, :], pol_row[1, :], pol_row[2, :]
    mu, inv_sd = pol_row[3, :], 1.0 / pol_row[4, :]
    eps, disc = pol_row[5, :], pol_row[6, :]
    strike = pol_row[7, :]
    p = jnp.maximum(s - strike, 0.0) if is_call else jnp.maximum(
        strike - s, 0.0)
    z = (s - mu) * inv_sd
    cont = (c2 * z + c1) * z + c0
    exf = (p > eps) & (p >= cont)
    big = jnp.int32(1 << 30)
    idx = jnp.min(jnp.where(exf, col, big), axis=1, keepdims=True)
    first = (col == idx).astype(jnp.float32)
    return jnp.sum(first * p * disc)


def _policy_value_boundary(s, pol_row, col, ds, *, is_call: bool):
    """Boundary-form LSM exercise policy: the per-(step,strike) quadratic
    decision is precomputed into an exercise INTERVAL [lo, hi]
    (boundary_rows — the solution set of "payoff >= fitted quadratic" is
    an interval for every convex-continuation fit), so the in-kernel
    test is two compares and the exercise value is one subtract against
    the hoisted disc*S plane (``ds``, shared across the strike strip).
    ~7 VPU op-slots per cell per strike vs ~13 for the cell-level
    quadratic (_policy_value_minreduce): the chain kernel's per-strike
    marginal cost is a pure VPU-elementwise floor, so the op cut is the
    K-scaling lever (VERIFY_r02 section 1c)."""
    lo = pol_row[0, :]
    hi = pol_row[1, :]
    dk = pol_row[2, :]
    exf = (s >= lo) & (s <= hi)
    big = jnp.int32(1 << 30)
    idx = jnp.min(jnp.where(exf, col, big), axis=1, keepdims=True)
    val = (ds - dk) if is_call else (dk - ds)
    return jnp.sum(jnp.where(col == idx, val, 0.0))


def _policy_value_log_boundary(ls, pol_ref, *, is_call: bool,
                               strike: float):
    """Log-space boundary policy on the LOG price plane: the exercise
    interval test runs directly on log S (log_boundary_rows pre-logs the
    endpoints — exp is monotone, so the decisions are those of
    _policy_value_boundary up to one-ulp root-band rounding), the stop
    step's log price and discount are extracted by one-hot masked
    reductions, and exp runs once per PATH at the stop step instead of
    once per cell in the path plane — the fused kernels' measured bound
    is VPU transcendentals, and this removes 1 of the 5 per-cell slots
    (VERIFY_r03 §12).  Non-exercising paths reduce to ls_stop = d_stop =
    0, so their value term is d_stop * payoff = 0 exactly."""
    llo, lhi, disc = pol_ref[0, :], pol_ref[1, :], pol_ref[2, :]
    col = jax.lax.broadcasted_iota(jnp.int32, ls.shape, 1)
    exf = (ls >= llo) & (ls <= lhi)
    big = jnp.int32(1 << 30)
    idx = jnp.min(jnp.where(exf, col, big), axis=1, keepdims=True)
    first = col == idx
    ls_stop = jnp.sum(jnp.where(first, ls, 0.0), axis=1, keepdims=True)
    d_stop = jnp.sum(jnp.where(first, disc, 0.0), axis=1, keepdims=True)
    s_stop = jnp.exp(ls_stop)
    p = s_stop - strike if is_call else strike - s_stop
    # max() guards the f32 root band at the ITM cap (a decision flip
    # there must never contribute a negative payoff).
    return jnp.sum(d_stop * jnp.maximum(p, 0.0))


def log_boundary_rows(table) -> jax.Array:
    """boundary_rows -> the log-space [8, s_pad] table consumed by
    _policy_value_log_boundary: row 0 = log lo, row 1 = log hi, row 2 =
    the discount, row 3 = the strike (boundary_rows' constant row 4;
    the priced kernels read rows 0-2 only, the chain Greeks kernel
    reads row 3 so the strike stays a traced table input).  Built
    in-graph per fit (cheap [s_pad] ops).  The +-1e30 sentinels survive:
    lo <= 0 means every S > 0 passes the lower test (log -> -1e30); an
    empty set's lo = +1e30 / hi = -1e30 keep their signs, and
    log(1e30) ~= 69 still exceeds any real log price by orders of
    magnitude — but the sentinel is kept exact anyway."""
    big = jnp.float32(1e30)
    lo, hi, disc, strike = table[0], table[1], table[3], table[4]
    safe_log = lambda v: jnp.log(jnp.maximum(v, 1e-38))
    llo = jnp.where(lo <= 0.0, -big, jnp.where(lo >= big, big, safe_log(lo)))
    lhi = jnp.where(hi <= 0.0, -big, jnp.where(hi >= big, big, safe_log(hi)))
    zeros = jnp.zeros_like(disc)
    return jnp.stack([llo, lhi, disc, strike, zeros, zeros, zeros, zeros])


# Strikes per grid step of the chain policy kernel.  The policy sweep is
# a pure VPU-elementwise pass whose cost is linear in the unroll count
# only up to ~10 strikes per kernel body — past that, Mosaic's scheduling
# degrades superlinearly (measured v5e, 8.4M x 365, boundary form:
# unrolled K=50 marginal ~38 ms/strike, one-strike-per-iteration
# fori_loop ~17 ms — each in-kernel dynamic table slice costs ~0.7 us of
# exposed DMA latency — vs ~6 ms for a 10-strike unroll).
CHAIN_GROUP = 10


def _sweep_values(s, pol_ref, out_shape, *, is_call: bool, group: int,
                  policy_form: str):
    """One strike group's [8, LANE] partial-sum tile, lane g = the g-th
    strike's path-block payoff sum (Mosaic cannot store scalars to VMEM,
    so the per-strike sums are composed into one vector store via lane
    masks).  Strikes live in the policy tables; only the strip's GROUP
    COUNT is compiled in."""
    lane = jax.lax.broadcasted_iota(jnp.int32, out_shape, 1)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    if policy_form == "boundary":
        # disc*S is strike-independent: pay it once per group (every
        # boundary_rows table carries the same disc row 3).
        ds = s * pol_ref[0, 3, :]
        value = functools.partial(_policy_value_boundary, s, col=col,
                                  ds=ds, is_call=is_call)
    else:
        value = functools.partial(_policy_value_minreduce, s, col=col,
                                  is_call=is_call)
    acc = jnp.zeros(out_shape, jnp.float32)
    for g in range(group):
        acc = acc + jnp.where(lane == g, value(pol_ref[g]), 0.0)
    return acc


def _chain_paths(zr, zi, w, mats, vd_ref, tri_ref, antithetic: bool, **kw):
    """Path plane for the chain kernels.  With ``antithetic``, the noise
    carries HALF the block's rows and the pair (N, W) / (-N, -W) fills
    the block halves — one fGN matmul per pair (the map is linear, see
    _fgn_x), exactly the priced kernels' pairing.  Each group
    regenerates from the same seed, so pairing is bitwise-consistent
    across the strip's groups."""
    x = _fgn_x(zr, zi, *_mats2(mats))
    if antithetic:
        x = jnp.concatenate([x, -x], axis=0)
        w = jnp.concatenate([w, -w], axis=0)
    return jnp.exp(_logpaths_from_x(x, w, vd_ref, tri_ref, **kw))


def _chain_kernel(seed_ref, *refs, block_paths: int, is_call: bool,
                  group: int, policy_form: str,
                  fgn_form: str = "spectral", antithetic: bool = False,
                  **kw):
    """Fused short-strip chain kernel (n_k <= CHAIN_GROUP): one path
    block, the whole strip's policies, [8, LANE] partial sums — path data
    never leaves VMEM and path generation is paid once for the strip."""
    *mats, vd_ref, tri_ref, pol_ref, out_ref = refs
    pltpu.prng_seed(_fold_words(seed_ref[0], seed_ref[1]), pl.program_id(0))
    rows = block_paths // 2 if antithetic else block_paths
    zr, zi, w = _draw_planes(rows, kw["s_pad"], fgn_form)
    s = _chain_paths(zr, zi, w, mats, vd_ref, tri_ref, antithetic, **kw)
    out_ref[...] = _sweep_values(s, pol_ref, out_ref.shape,
                                 is_call=is_call, group=group,
                                 policy_form=policy_form)


def _chain_kernel_noise_in(noise_ref, *refs, block_paths: int,
                           is_call: bool, group: int, policy_form: str,
                           fgn_form: str = "spectral",
                           antithetic: bool = False, **kw):
    """Noise-injection variant of the fused chain kernel."""
    *mats, vd_ref, tri_ref, pol_ref, out_ref = refs
    zr, zi, w = _noise_planes(noise_ref, fgn_form)
    s = _chain_paths(zr, zi, w, mats, vd_ref, tri_ref, antithetic, **kw)
    out_ref[...] = _sweep_values(s, pol_ref, out_ref.shape,
                                 is_call=is_call, group=group,
                                 policy_form=policy_form)


def _chain_kernel_grid(first_ref, *refs, block_paths: int, is_call: bool,
                       group: int, policy_form: str,
                       fgn_form: str = "spectral",
                       antithetic: bool = False,
                       noise_input: bool = False, **kw):
    """Grid-over-groups chain kernel: grid = (path_blocks, n_groups) with
    the GROUP axis fastest.  The path block is generated ONCE per path
    block — at group step j == 0, into a VMEM scratch plane — and every
    group's policy sweep re-reads the scratch, so a K-strike strip pays
    path generation once per block instead of once per ceil(K/10) group
    (the regen design's cost model; VERIFY_r03 §6 measured K=50 ~ 6x K=1
    because generation dominates the marginal group).  Each group's
    [group, 8, s_pad] policy-table block is streamed by the Pallas
    pipeline (block index = j — a STATIC per-step slice, none of the
    in-kernel dynamic-slice DMA latency that sank the fori_loop form),
    and the per-group sweep stays <= CHAIN_GROUP strikes so Mosaic's
    scheduling stays in its linear regime.  Seeding is the regen
    kernel's exactly — (seed, path-block id) — so prices match the
    regen design bitwise.

    MEASURED WORSE than regen on v5e (VERIFY_r04 §6): the sweep-only
    grid steps (j > 0) run ~10x slower per sweep than the same sweep
    fused with generation — without the generator's matmuls in the same
    executed path, Mosaic's schedule exposes the VPU sweep's latency
    (the HBM-materialization dead end of VERIFY_r03 §6, reproduced in
    VMEM).  Kept as an explicitly selectable A/B arm, not the default."""
    *mats, vd_ref, tri_ref, pol_ref, out_ref, s_ref = refs
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _generate():
        if noise_input:
            zr, zi, w = _noise_planes(first_ref, fgn_form)
        else:
            pltpu.prng_seed(_fold_words(first_ref[0], first_ref[1]),
                            pl.program_id(0))
            rows = block_paths // 2 if antithetic else block_paths
            zr, zi, w = _draw_planes(rows, kw["s_pad"], fgn_form)
        s_ref[...] = _chain_paths(zr, zi, w, mats, vd_ref, tri_ref,
                                  antithetic, **kw)

    out_ref[...] = _sweep_values(s_ref[...], pol_ref, out_ref.shape,
                                 is_call=is_call, group=group,
                                 policy_form=policy_form)


def _pathgen_kernel(seed_ref, *refs, fgn_form: str = "spectral", **kw):
    """Production kernel: in-kernel hardware PRNG (zero HBM noise traffic).
    Seeded from (mix(run_word, stream_index), block_id), so runs /
    pilot-vs-chunks / blocks can never collide by arithmetic on a single
    word (see _fold_words).  With antithetic, half the rows are drawn
    and the pair fills the block halves (_logpaths_from_x_anti)."""
    *mats, vd_ref, tri_ref, out_ref = refs
    pltpu.prng_seed(_fold_words(seed_ref[0], seed_ref[1]), pl.program_id(0))
    block, s_pad = out_ref.shape[0], kw["s_pad"]
    rows = block // 2 if kw.get("antithetic") else block
    zr, zi, w = _draw_planes(rows, s_pad, fgn_form)
    _euler_from_noise(zr, zi, w, *_mats2(mats), vd_ref, tri_ref,
                      out_ref, **kw)


def _pathgen_kernel_noise_in(noise_ref, *refs, fgn_form: str = "spectral",
                             **kw):
    """Test kernel: noise supplied as input (3 planes Zr/Zi/W, or 2 planes
    N/W for the chol form) — lets the math path be checked bit-for-bit
    against the XLA generator on any backend (the TPU interpreter stubs
    prng_random_bits to zeros in this JAX version)."""
    *mats, vd_ref, tri_ref, out_ref = refs
    zr, zi, w = _noise_planes(noise_ref, fgn_form)
    _euler_from_noise(zr, zi, w, *_mats2(mats), vd_ref, tri_ref,
                      out_ref, **kw)


def _store_priced(out_ref, s, val, cv_disc, n_steps: int):
    """Write the block's partial sums into the [8, LANE] output stripe.
    Lane 0 = policy payoff sum; with cv_disc set, lane 1 = the martingale
    control sum cv_disc * sum(S_T) (terminal step n_steps is column
    n_steps - 1 of the in-kernel price block)."""
    if cv_disc is None:
        out_ref[...] = jnp.full(out_ref.shape, val, jnp.float32)
        return
    # Lane-masked full reduce, not a column slice: Mosaic's layouts handle
    # a whole-block masked sum; s[:, j] extracts one lane with a vpad
    # layout its multi_reduction lowering rejects.
    scol = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    cv = cv_disc * jnp.sum(jnp.where(scol == n_steps - 1, s, 0.0))
    lane = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 1)
    out_ref[...] = (jnp.where(lane == 0, val, 0.0)
                    + jnp.where(lane == 1, cv, 0.0))


def _cv_log_sum(ls, cv_disc, n_steps: int):
    """Martingale-control partial sum from the LOG price plane: the
    terminal log price per path comes from a one-hot masked row
    reduction, so exp runs once per path instead of once per cell."""
    scol = jax.lax.broadcasted_iota(jnp.int32, ls.shape, 1)
    ls_t = jnp.sum(jnp.where(scol == n_steps - 1, ls, 0.0), axis=1,
                   keepdims=True)
    return cv_disc * jnp.sum(jnp.exp(ls_t))


def _store_priced_log(out_ref, val, cv):
    """_store_priced's lane layout for the log-plane body: lane 0 = the
    policy payoff sum, lane 1 = the control sum (when ``cv`` is not
    None, see _cv_log_sum)."""
    if cv is None:
        out_ref[...] = jnp.full(out_ref.shape, val, jnp.float32)
        return
    lane = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 1)
    out_ref[...] = (jnp.where(lane == 0, val, 0.0)
                    + jnp.where(lane == 1, cv, 0.0))


def _priced_log_subvals(noise, mats, vd_ref, tri_ref, pol_ref, *,
                        is_call: bool, strike: float, cv_disc,
                        antithetic: bool, **kw):
    """One (sub-)block's (policy value sum, control sum) on the log
    plane — the unit the interleaved kernels replicate."""
    zr, zi, w = noise
    x = _fgn_x(zr, zi, *_mats2(mats))
    stage = _logpaths_from_x_anti if antithetic else _logpaths_from_x
    ls = stage(x, w, vd_ref, tri_ref, **kw)
    val = _policy_value_log_boundary(ls, pol_ref, is_call=is_call,
                                     strike=strike)
    cv = (None if cv_disc is None
          else _cv_log_sum(ls, cv_disc, kw["n_steps"]))
    return val, cv


def _priced_log_subvals_staggered(noise_ab, mats, vd_ref, tri_ref, pol_ref,
                                  *, is_call: bool, strike: float, cv_disc,
                                  n_steps: int, r: float, dt: float,
                                  log_s0: float, **_):
    """Hand-STAGGERED two-half software pipeline of the log-boundary
    priced body (VERIFY_r04 §4's named lever, r04 verdict item 6): the
    two halves' stages are interleaved in PROGRAM ORDER so that each
    half's MXU stage (fGN matmul, cumsum matmul) sits adjacent to the
    OTHER half's VPU stage (Box-Muller / Euler increments / policy
    sweep), giving Mosaic's list scheduler locally-visible independent
    VPU+MXU pairs to overlap — unlike ``interleave``, which emits each
    sub-chain's five serialized stages back-to-back and asks the
    scheduler to overlap across whole chains.

    ``noise_ab`` is a pair of THUNKS, one per half, each returning that
    half's (zr, zi, w) planes when called — so half B's Box-Muller draw
    lands in program order right after half A's fGN matmul (the VPU/MXU
    pair that matters most: normals are the largest VPU stage).
    Arithmetic per half is exactly _priced_log_subvals on the same rows,
    and the f32 reductions combine as valA + valB — bitwise-identical
    partial sums to interleave=2's chained loop on the same draws (the
    hardware A/B's correctness check, tests/test_pallas.py)."""
    c2 = _mats2(mats)
    draw_a, draw_b = noise_ab
    zrA, ziA, wA = draw_a()                                   # VPU A0
    xA = _fgn_x(zrA, ziA, *c2)                                # MXU A1
    zrB, ziB, wB = draw_b()                                   # VPU B0 | A1
    incA = _euler_inc(xA, wA, vd_ref, n_steps=n_steps, r=r,
                      dt=dt)                                  # VPU A2
    xB = _fgn_x(zrB, ziB, *c2)                                # MXU B1 | A2
    lsA = _cumsum_log(incA, tri_ref, log_s0)                  # MXU A3
    incB = _euler_inc(xB, wB, vd_ref, n_steps=n_steps, r=r,
                      dt=dt)                                  # VPU B2 | A3
    valA = _policy_value_log_boundary(lsA, pol_ref, is_call=is_call,
                                      strike=strike)          # VPU A4
    lsB = _cumsum_log(incB, tri_ref, log_s0)                  # MXU B3 | A4
    valB = _policy_value_log_boundary(lsB, pol_ref, is_call=is_call,
                                      strike=strike)          # VPU B4
    val = valA + valB
    cv = (None if cv_disc is None
          else _cv_log_sum(lsA, cv_disc, n_steps)
          + _cv_log_sum(lsB, cv_disc, n_steps))
    return val, cv


def _priced_body(noise, *refs, is_call: bool, strike: float, cv_disc,
                 policy_form: str, antithetic: bool = False, **kw):
    """Shared body of the fused priced kernels: paths + policy + store.

    policy_form="log_boundary" (the engine's default via StreamConfig.
    policy_form="boundary") works on the LOG price plane end to end —
    no per-cell exp, no strict-upper matmul (the first-exercise step
    comes from a min-index reduction); "quadratic" is the cell-level
    quadratic on the S plane (the r02 form, kept for A/B and direct
    callers).

    ``antithetic=True`` (log_boundary only): ``noise`` carries HALF the
    block's rows and the body prices both (N, W) and (-N, -W) — each
    member's path law is exactly the standard one (standard normals are
    symmetric), so the block's payoff sum covers block_paths paths from
    half the Box-Muller draws (the kernel's measured VPU bound), with
    pair members negatively correlated (the classic variance reduction).
    The fGN map is LINEAR in the noise, so the partner's plane is -X:
    the [rows, s_pad] fGN matmul runs once per pair (see _fgn_x), member
    planes stacked as block halves through the shared nonlinear stage."""
    if policy_form == "log_boundary":
        *mats, vd_ref, tri_ref, pol_ref, out_ref = refs
        val, cv = _priced_log_subvals(noise, mats, vd_ref, tri_ref,
                                      pol_ref, is_call=is_call,
                                      strike=strike, cv_disc=cv_disc,
                                      antithetic=antithetic, **kw)
        _store_priced_log(out_ref, val, cv)
    else:
        *mats, vd_ref, tri_ref, su_ref, pol_ref, out_ref = refs
        s = _paths_from_noise(*noise, *_mats2(mats), vd_ref, tri_ref, **kw)
        val = _policy_value(s, su_ref, pol_ref, is_call=is_call,
                            strike=strike)
        _store_priced(out_ref, s, val, cv_disc, kw["n_steps"])


def _priced_kernel(seed_ref, *refs, block_paths: int, is_call: bool,
                   strike: float, cv_disc=None, fgn_form: str = "spectral",
                   policy_form: str = "quadratic",
                   antithetic: bool = False, interleave: int = 1,
                   schedule: str = "chained", **kw):
    """Fully fused kernel: RNG + paths + LSM policy value, emitting ONE
    partial sum per grid block — path data never leaves VMEM.  With
    cv_disc, also emits the martingale-control partial sum so the control
    variate rides the fused kernel instead of the generic path stream.
    With antithetic, half the rows are drawn and the pair (noise, -noise)
    prices the full block (see _priced_body).

    ``interleave`` > 1 (log_boundary only) splits the block into that
    many INDEPENDENT sub-block chains inside one kernel body — the
    roofline's named lever (VERIFY_r04 §4): each sub-chain is
    PRNG → fGN matmul → Euler → cumsum matmul → policy, and independent
    chains give Mosaic's scheduler the freedom to overlap one sub-block's
    MXU matmuls with another's Box-Muller/policy VPU work, which a single
    serialized chain cannot.  Estimator-identical (same per-path law,
    disjoint PRNG draws, sums added); f32 summation order differs from
    interleave=1."""
    pltpu.prng_seed(_fold_words(seed_ref[0], seed_ref[1]), pl.program_id(0))
    rows = block_paths // 2 if antithetic else block_paths
    if interleave == 1 or policy_form != "log_boundary":
        noise = _draw_planes(rows, kw["s_pad"], fgn_form)
        _priced_body(noise, *refs, is_call=is_call, strike=strike,
                     cv_disc=cv_disc, policy_form=policy_form,
                     antithetic=antithetic, **kw)
        return
    *mats, vd_ref, tri_ref, pol_ref, out_ref = refs
    if schedule == "staggered":
        # Hand-staggered two-half pipeline (interleave must be 2; maker
        # validates).  Same PRNG consumption order as the chained loop
        # below — half A's planes drawn first — so results are bitwise
        # equal; only the program order of the stages differs.
        sub = rows // 2
        draw = lambda: _draw_planes(sub, kw["s_pad"], fgn_form)
        val, cv = _priced_log_subvals_staggered(
            (draw, draw), mats, vd_ref, tri_ref, pol_ref,
            is_call=is_call, strike=strike, cv_disc=cv_disc, **kw)
        _store_priced_log(out_ref, val, cv)
        return
    sub = rows // interleave
    val = cv = 0.0
    for _ in range(interleave):
        noise = _draw_planes(sub, kw["s_pad"], fgn_form)
        v, c = _priced_log_subvals(noise, mats, vd_ref, tri_ref, pol_ref,
                                   is_call=is_call, strike=strike,
                                   cv_disc=cv_disc, antithetic=antithetic,
                                   **kw)
        val = val + v
        cv = None if c is None else cv + c
    _store_priced_log(out_ref, val, cv)


def _priced_kernel_noise_in(noise_ref, *refs, block_paths: int,
                            is_call: bool, strike: float, cv_disc=None,
                            fgn_form: str = "spectral",
                            policy_form: str = "quadratic",
                            antithetic: bool = False, interleave: int = 1,
                            schedule: str = "chained", **kw):
    """Test variant of the fused kernel with injected noise planes.
    ``interleave`` consumes disjoint row slices per sub-chain, so each
    sub-chain's arithmetic equals a plain sub-sized block's on the same
    noise rows; ``schedule="staggered"`` consumes the same two half
    slices through the staggered body (bitwise-equal sums by design)."""
    if interleave == 1 or policy_form != "log_boundary":
        noise = _noise_planes(noise_ref, fgn_form)
        _priced_body(noise, *refs, is_call=is_call, strike=strike,
                     cv_disc=cv_disc, policy_form=policy_form,
                     antithetic=antithetic, **kw)
        return
    *mats, vd_ref, tri_ref, pol_ref, out_ref = refs
    rows = (block_paths // 2 if antithetic else block_paths)
    if schedule == "staggered":
        sub = rows // 2

        def half(t):
            def thunk():
                zr, zi, w = _noise_planes(noise_ref, fgn_form)
                return (zr[t * sub:(t + 1) * sub],
                        None if zi is None else zi[t * sub:(t + 1) * sub],
                        w[t * sub:(t + 1) * sub])
            return thunk

        val, cv = _priced_log_subvals_staggered(
            (half(0), half(1)), mats, vd_ref, tri_ref, pol_ref,
            is_call=is_call, strike=strike, cv_disc=cv_disc, **kw)
        _store_priced_log(out_ref, val, cv)
        return
    sub = rows // interleave
    val = cv = 0.0
    for t in range(interleave):
        zr, zi, w = _noise_planes(noise_ref, fgn_form)
        noise = (zr[t * sub:(t + 1) * sub],
                 None if zi is None else zi[t * sub:(t + 1) * sub],
                 w[t * sub:(t + 1) * sub])
        v, c = _priced_log_subvals(noise, mats, vd_ref, tri_ref, pol_ref,
                                   is_call=is_call, strike=strike,
                                   cv_disc=cv_disc, antithetic=antithetic,
                                   **kw)
        val = val + v
        cv = None if c is None else cv + c
    _store_priced_log(out_ref, val, cv)


def _greeks_body(noise, lt_ref, dlt_ref, vd_ref, tri_ref, aux_ref, pol_ref,
                 out_ref, *, n_steps: int, s_pad: int, s0: float, xi: float,
                 eta: float, r: float, dt: float, log_s0: float,
                 is_call: bool, strike: float, antithetic: bool = False):
    """Fused pathwise Greeks: price + (delta, vega_xi, vega_eta, rho_rate,
    vega_h) partial sums per block — hand-rolled forward-mode tangents of
    the log-boundary policy value, entirely in VMEM (_tangent_planes +
    _greek_stop_vals).  Cost over the priced kernel: 4 extra MXU matmuls
    (n@dLt', three tangent cumsums) + O(1) VPU planes — measured ~2x the
    price-only kernel, ~5x the XLA jvp stream (VERIFY_r03 §13).
    ``antithetic``: noise carries half the rows, pairs fill the block
    halves (see _tangent_planes)."""
    planes = _tangent_planes(noise, lt_ref, dlt_ref, vd_ref, tri_ref,
                             aux_ref, n_steps=n_steps, s_pad=s_pad,
                             eta=eta, r=r, dt=dt, log_s0=log_s0,
                             antithetic=antithetic)
    vals = _greek_stop_vals(planes, pol_ref, is_call=is_call, s0=s0,
                            xi=xi, r=r, dt=dt, strike=strike)
    lane = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 1)
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for i, val in enumerate(vals):
        acc = acc + jnp.where(lane == i, val, 0.0)
    out_ref[...] = acc


def _tangent_planes(noise, lt_ref, dlt_ref, vd_ref, tri_ref, aux_ref, *,
                    n_steps: int, s_pad: int, eta: float, r: float,
                    dt: float, log_s0: float, antithetic: bool = False):
    """Strike-independent forward-tangent planes of the fused Greeks
    kernels: (ls, cumb, cume, cumh, col) for one path block.

    With the exercise policy fixed (the envelope convention of the XLA
    streaming Greeks, engine.price_and_greeks), the per-path value is
    V = d(r, t*) * payoff(S*) at the stop step, so every tangent needs
    only d ln S* /d theta.  All market parameters except s0/r enter
    ls only through ln sv = x' + hvd (half-scaled constants), whose
    increment tangent is (d ln sv/d theta) * B with the SHARED bracket
    B = sv*w*sqrt(dt) - v*dt:

      xi:  d ln sv/d xi  = 1/(2 xi)                 (scalar => cumsum(B))
      eta: d ln sv/d eta = x'/eta + de_row          (fGN linear in eta)
      h:   d ln sv/d h   = n @ dLt' + dh_row        (host f64 dLt/dh)
      r:   d ls/d r = t (affine), plus dd/dr = -t d
      s0:  d ls/d s0 = 1/s0

    ``aux_ref`` rows: 1 = de_row, 2 = dh_row (drift times c*dt,
    matching _half_var_drift); the stop step's time and discount are
    recomputed from idx in _greek_stop_vals instead of a row 0.

    ``antithetic``: ``noise`` carries HALF the block's rows; both noise
    matmuls (n @ Lt', n @ dLt' — linear maps) run once per pair and the
    members fill the block halves with negated planes through the shared
    nonlinear stage, exactly the priced kernels' pairing."""
    n, w = noise
    x = jnp.dot(n.astype(lt_ref.dtype), lt_ref[:],
                preferred_element_type=jnp.float32)
    hx = jnp.dot(n.astype(dlt_ref.dtype), dlt_ref[:],
                 preferred_element_type=jnp.float32)
    if antithetic:
        x = jnp.concatenate([x, -x], axis=0)
        hx = jnp.concatenate([hx, -hx], axis=0)
        w = jnp.concatenate([w, -w], axis=0)
    block = x.shape[0]
    sv = jnp.exp(x + vd_ref[:])
    v = sv * sv
    svw = sv * (w * math.sqrt(dt))
    col = jax.lax.broadcasted_iota(jnp.int32, (block, s_pad), 1)
    live = col < n_steps
    inc = jnp.where(live, (r - 0.5 * v) * dt + svw, 0.0)
    b = jnp.where(live, svw - v * dt, 0.0)

    ls = log_s0 + jnp.dot(inc, tri_ref[:],
                          preferred_element_type=jnp.float32)
    cumb = jnp.dot(b, tri_ref[:], preferred_element_type=jnp.float32)
    earg = x * (1.0 / eta) + aux_ref[1, :]
    cume = jnp.dot(earg * b, tri_ref[:],
                   preferred_element_type=jnp.float32)
    harg = hx + aux_ref[2, :]
    cumh = jnp.dot(harg * b, tri_ref[:],
                   preferred_element_type=jnp.float32)
    return ls, cumb, cume, cumh, col


def _greek_stop_vals(planes, pol, *, is_call: bool, s0: float,
                     xi: float, r: float, dt: float, strike=None):
    """One policy's six Greek partial sums (GREEK_ORDER) from the shared
    tangent planes: interval test on the log plane, one-hot stop-step
    reductions of the four per-path planes, epilogue per
    _tangent_planes' tangent algebra.

    The stop step's TIME and DISCOUNT come from ``idx`` directly —
    t* = (idx+1)*dt and d* = exp(-r t*), the same f32 product and exp
    _table_prep bakes into the disc row — instead of one-hot table-row
    reductions: two fewer [block, s_pad] passes per policy, which is the
    chain kernel's per-strike marginal cost.  ``strike=None`` (the chain
    kernels) reads the strike from the table's constant row 3 (a [s_pad]
    max, not a plane pass), keeping it a traced table input; the
    single-strike kernel passes its compile-time strike."""
    ls, cumb, cume, cumh, col = planes
    llo, lhi = pol[0, :], pol[1, :]
    exf = (ls >= llo) & (ls <= lhi)
    big = jnp.int32(1 << 30)
    idx = jnp.min(jnp.where(exf, col, big), axis=1, keepdims=True)
    first = col == idx
    red = lambda a: jnp.sum(jnp.where(first, a, 0.0), axis=1,
                            keepdims=True)
    ls_s, cb_s, ce_s, ch_s = red(ls), red(cumb), red(cume), red(cumh)

    # ex gates everything: with no exercise idx stays at big, and the
    # huge t* must not leak (r = 0 would give d* = 1, r < 0 an inf).
    ex = idx < big
    t_raw = (idx.astype(jnp.float32) + 1.0) * dt
    d_s = jnp.where(ex, jnp.exp(-r * t_raw), 0.0)
    t_s = jnp.where(ex, t_raw, 0.0)
    k = jnp.max(pol[3, :]) if strike is None else strike

    s_stop = jnp.exp(ls_s)
    sgn = 1.0 if is_call else -1.0
    p = sgn * (s_stop - k)
    act = (d_s > 0.0) & (p > 0.0)
    pv = jnp.where(act, d_s * p, 0.0)                # discounted payoff
    base = jnp.where(act, d_s * sgn * s_stop, 0.0)   # d * p'(S) * S
    return [
        jnp.sum(pv),                                     # price
        jnp.sum(base) * (1.0 / s0),                      # delta
        jnp.sum(base * cb_s) * (1.0 / (2.0 * xi)),       # vega_xi
        jnp.sum(base * ce_s),                            # vega_eta
        jnp.sum(t_s * (base - pv)),                      # rho_rate
        jnp.sum(base * ch_s),                            # vega_h
    ]


def _chain_greeks_body(noise, lt_ref, dlt_ref, vd_ref, tri_ref, aux_ref,
                       pol_ref, out_ref, *, n_steps: int, s_pad: int,
                       s0: float, xi: float, eta: float, r: float,
                       dt: float, log_s0: float, is_call: bool,
                       group: int, antithetic: bool = False):
    """Fused whole-smile Greeks: the strike-independent tangent planes
    (6 MXU matmuls — the block's dominant cost) are computed ONCE per
    path block and swept by the group's policies, the Greeks analogue of
    _chain_kernel's generation amortization.  Lane g*8 + i of the output
    stripe holds strike g's i-th GREEK_ORDER partial sum (group <=
    CHAIN_GROUP = 10 -> at most 80 of the 128 lanes)."""
    planes = _tangent_planes(noise, lt_ref, dlt_ref, vd_ref, tri_ref,
                             aux_ref, n_steps=n_steps, s_pad=s_pad,
                             eta=eta, r=r, dt=dt, log_s0=log_s0,
                             antithetic=antithetic)
    lane = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 1)
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for g in range(group):
        vals = _greek_stop_vals(planes, pol_ref[g], is_call=is_call,
                                s0=s0, xi=xi, r=r, dt=dt)
        for i, val in enumerate(vals):
            acc = acc + jnp.where(lane == g * 8 + i, val, 0.0)
    out_ref[...] = acc


def _greek_rows(block_paths: int, antithetic: bool) -> int:
    """In-kernel noise rows per block for the Greeks kernels: half under
    antithetic (pairs fill the block halves, see _tangent_planes)."""
    return block_paths // 2 if antithetic else block_paths


def _chain_greeks_kernel(seed_ref, *refs, block_paths: int, **kw):
    pltpu.prng_seed(_fold_words(seed_ref[0], seed_ref[1]), pl.program_id(0))
    n, w = _normals((_greek_rows(block_paths, kw.get("antithetic", False)),
                     kw["s_pad"]))
    _chain_greeks_body((n, w), *refs, **kw)


def _chain_greeks_kernel_noise_in(noise_ref, *refs, block_paths: int,
                                  **kw):
    del block_paths
    _chain_greeks_body((noise_ref[0], noise_ref[1]), *refs, **kw)


def _chain_greeks_kernel_grid(first_ref, *refs, block_paths: int,
                              is_call: bool, group: int,
                              noise_input: bool = False,
                              antithetic: bool = False, **kw):
    """Grid-over-groups whole-smile Greeks kernel (the _chain_kernel_grid
    analogue): grid = (path blocks, strike groups), group axis fastest.
    The strike-independent tangent planes — the block's dominant cost,
    6 MXU matmuls (_tangent_planes) — are computed ONCE per path block
    at group step j == 0 into a [4, block, s_pad] VMEM scratch and every
    group's policy sweep re-reads them, so a K-strike risk strip pays
    the tangent matmuls once per block instead of once per
    ceil(K/10) group.  Seeding matches the regen kernel, so outputs
    agree bitwise."""
    *body_refs, out_ref, planes_ref = refs
    lt_ref, dlt_ref, vd_ref, tri_ref, aux_ref, pol_ref = body_refs
    j = pl.program_id(1)
    s_pad = kw["s_pad"]

    @pl.when(j == 0)
    def _generate():
        if noise_input:
            noise = (first_ref[0], first_ref[1])
        else:
            pltpu.prng_seed(_fold_words(first_ref[0], first_ref[1]),
                            pl.program_id(0))
            noise = _normals((_greek_rows(block_paths, antithetic), s_pad))
        ls, cumb, cume, cumh, _ = _tangent_planes(
            noise, lt_ref, dlt_ref, vd_ref, tri_ref, aux_ref,
            n_steps=kw["n_steps"], s_pad=s_pad, eta=kw["eta"], r=kw["r"],
            dt=kw["dt"], log_s0=kw["log_s0"], antithetic=antithetic)
        planes_ref[0] = ls
        planes_ref[1] = cumb
        planes_ref[2] = cume
        planes_ref[3] = cumh

    col = jax.lax.broadcasted_iota(jnp.int32, (block_paths, s_pad), 1)
    planes = (planes_ref[0], planes_ref[1], planes_ref[2], planes_ref[3],
              col)
    lane = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 1)
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for g in range(group):
        vals = _greek_stop_vals(planes, pol_ref[g], is_call=is_call,
                                s0=kw["s0"], xi=kw["xi"], r=kw["r"],
                                dt=kw["dt"])
        for i, val in enumerate(vals):
            acc = acc + jnp.where(lane == g * 8 + i, val, 0.0)
    out_ref[...] = acc


def _greeks_kernel(seed_ref, *refs, block_paths: int, **kw):
    pltpu.prng_seed(_fold_words(seed_ref[0], seed_ref[1]), pl.program_id(0))
    n, w = _normals((_greek_rows(block_paths, kw.get("antithetic", False)),
                     kw["s_pad"]))
    _greeks_body((n, w), *refs, **kw)


def _greeks_kernel_noise_in(noise_ref, *refs, block_paths: int, **kw):
    del block_paths
    _greeks_body((noise_ref[0], noise_ref[1]), *refs, **kw)


def _greeks_consts(n_steps: int, s_pad: int, xi, h, eta, dt, fgn_dtype):
    """Host-side VMEM constants shared by the fused Greeks kernels:
    (lt', dlt', vd, tri, aux) — the half-scaled Cholesky factor, its host
    f64 dLt/dH, the half var-drift row, the cumsum triangle, and the
    tangent rows (see _tangent_planes), each padded to [*, s_pad]."""
    from .engine import _chol_dh_matrix_host, _chol_matrix_host

    lt = _chol_matrix_host(n_steps, h, eta, dt, jnp.dtype(fgn_dtype))
    dlt = _chol_dh_matrix_host(n_steps, h, eta, dt, jnp.dtype(fgn_dtype))
    pad_mat = lambda m: (jnp.zeros((s_pad, s_pad), fgn_dtype)
                         .at[:n_steps, :n_steps].set(0.5 * m))
    vd_p = _half_var_drift(n_steps, s_pad, xi, h, eta, dt)
    tri = np.triu(np.ones((s_pad, s_pad), np.float32))
    tri[n_steps:, :] = 0.0
    # Host tangent rows (see _tangent_planes): de, dh.
    td = np.arange(n_steps, dtype=np.float64) * dt        # drift times
    t2h = td ** (2.0 * h)
    lnt = np.where(td > 0, np.log(np.maximum(td, 1e-300)), 0.0)
    aux = np.zeros((8, s_pad), np.float32)
    aux[1, :n_steps] = -0.5 * eta * t2h
    aux[2, :n_steps] = -0.5 * (eta * eta) * t2h * lnt
    return pad_mat(lt), pad_mat(dlt), vd_p, jnp.asarray(tri), \
        jnp.asarray(aux)


def make_pallas_greeks_chunk(s0, xi, h, eta, rho, r, strike, maturity,
                             dt: float, n_steps: int, chunk_paths: int,
                             block_paths: int = 256, is_call: bool = False,
                             interpret: bool = False,
                             noise_input: bool = False,
                             fgn_dtype=jnp.float32,
                             antithetic: bool = False):
    """Fused streaming Greeks unit: (seed, log-boundary policy table) ->
    [6] chunk partial sums (price, delta, vega_xi, vega_eta, rho_rate,
    vega_h) under the fitted exercise policy — see _greeks_body.
    Chol fGN form and log-boundary policy only (the measured-fastest
    configuration; the XLA jvp stream remains the general fallback).

    antithetic=True pairs the block (half the draws, both noise matmuls
    shared per pair — _tangent_planes); injected noise then carries
    block_paths/2 rows per plane."""
    if chunk_paths % block_paths:
        raise ValueError("chunk_paths must divide by block_paths")
    if not noise_input and block_paths % 16:
        raise ValueError("block_paths must divide by 16 for in-kernel RNG")
    if antithetic and block_paths % 32:
        raise ValueError("antithetic needs block_paths % 32 == 0 (half "
                         "the rows are drawn, and the Box-Muller row "
                         "slices must stay sublane-aligned)")
    # Two [s_pad, s_pad] matrices resident (Lt' + dLt') — the spectral
    # budget is the right byte model.
    if not supports(n_steps, "spectral"):
        raise ValueError("n_steps too large for the fused Greeks kernel")
    _check_block_budget(n_steps, block_paths, "spectral")
    s_pad = _round_up(n_steps, LANE)
    noise_rows = block_paths // 2 if antithetic else block_paths
    lt_p, dlt_p, vd_p, tri_p, aux_p = _greeks_consts(
        n_steps, s_pad, xi, h, eta, dt, fgn_dtype)

    kw = dict(n_steps=n_steps, s_pad=s_pad, s0=float(s0), xi=float(xi),
              eta=float(eta), r=float(r), dt=float(dt),
              log_s0=float(math.log(s0)), is_call=bool(is_call),
              strike=float(strike), block_paths=block_paths,
              antithetic=bool(antithetic))
    body = _greeks_kernel_noise_in if noise_input else _greeks_kernel
    kernel = functools.partial(body, **kw)
    grid_n = chunk_paths // block_paths
    first_spec = (
        pl.BlockSpec((2, noise_rows, s_pad), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM) if noise_input
        else pl.BlockSpec(memory_space=pltpu.SMEM))
    mat_spec = pl.BlockSpec((s_pad, s_pad), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(grid_n,),
        in_specs=[
            first_spec,                                     # seed or noise
            mat_spec,                                       # Lt' (chol)
            mat_spec,                                       # dLt'/dh
            pl.BlockSpec((1, s_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),          # half var drift
            mat_spec,                                       # cumsum tri
            pl.BlockSpec((8, s_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),          # tangent rows
            pl.BlockSpec((8, s_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),          # policy rows
        ],
        out_specs=pl.BlockSpec((8, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid_n * 8, LANE), jnp.float32),
        interpret=pltpu.InterpretParams() if interpret else False,
    )

    def chunk_sums(seed_or_noise, rows) -> jax.Array:
        """[6] partial sums for the chunk; ``rows`` = log_boundary_rows(
        boundary_rows(...))."""
        if noise_input:
            first = seed_or_noise.astype(jnp.float32)
        else:
            first = _as_seed_words(seed_or_noise)
        out = call(first, lt_p, dlt_p, vd_p, tri_p, aux_p, rows)
        return jnp.sum(out[::8, :6], axis=0)

    return chunk_sums, s_pad


def make_pallas_chain_greeks_chunk(s0, xi, h, eta, rho, r, strikes,
                                   maturity, dt: float, n_steps: int,
                                   chunk_paths: int,
                                   block_paths: int = 256,
                                   is_call: bool = False,
                                   interpret: bool = False,
                                   noise_input: bool = False,
                                   fgn_dtype=jnp.float32,
                                   antithetic: bool = False,
                                   sweep_impl: str = "auto"):
    """Fused whole-smile streaming Greeks unit: (seed, policy tables
    [K, 8, s_pad]) -> [6, K] chunk partial sums in GREEK_ORDER, sharing
    each in-VMEM path block AND its tangent planes (the 6 MXU matmuls of
    _tangent_planes — the dominant per-block cost) across the strike
    strip.  Tables are log_boundary_rows(boundary_rows(...)) per strike,
    stacked on a leading axis; the strike rides each table's disc*strike
    row, so fresh strips reuse the compiled kernel.

    Grouping mirrors make_pallas_priced_chain, including sweep_impl:
    "regen" (the auto default) runs one fused pass per group, reusing
    the seed so every group regenerates bitwise-identical planes;
    "grid" selects _chain_greeks_kernel_grid (tangent planes in VMEM
    scratch, computed once per block) — measured WORSE than regen even
    here, where the 6 tangent matmuls dominate (v5e 4.2M x 365 K=50:
    grid 1.75 s vs regen 1.29 s, VERIFY_r04 §6 — the decoupled sweep
    steps lose their MXU scheduling cover).  The per-strike marginal is a pure VPU
    sweep either way (7 one-hot reductions + the interval test).  Chol
    fGN form + log-boundary policy only, like make_pallas_greeks_chunk;
    the XLA jvp stream remains the general fallback."""
    n_k = int(strikes) if isinstance(strikes, int) else len(strikes)
    if chunk_paths % block_paths:
        raise ValueError("chunk_paths must divide by block_paths")
    if not noise_input and block_paths % 16:
        raise ValueError("block_paths must divide by 16 for in-kernel RNG")
    if antithetic and block_paths % 32:
        raise ValueError("antithetic needs block_paths % 32 == 0 (half "
                         "the rows are drawn, and the Box-Muller row "
                         "slices must stay sublane-aligned)")
    # Lt' + dLt' resident -> the spectral byte model, which also matches
    # the chain kernel's conservative 512-step cap (VERIFY_r03 §11).
    if not supports(n_steps, "spectral"):
        raise ValueError(
            "n_steps too large for the fused chain Greeks kernel")
    _check_block_budget(n_steps, block_paths, "spectral")
    s_pad = _round_up(n_steps, LANE)
    noise_rows = block_paths // 2 if antithetic else block_paths
    group = min(n_k, CHAIN_GROUP)
    n_g = -(-n_k // group)
    k_tab = n_g * group
    consts = _greeks_consts(n_steps, s_pad, xi, h, eta, dt, fgn_dtype)

    kw = dict(n_steps=n_steps, s_pad=s_pad, s0=float(s0), xi=float(xi),
              eta=float(eta), r=float(r), dt=float(dt),
              log_s0=float(math.log(s0)), is_call=bool(is_call),
              group=group, block_paths=block_paths,
              antithetic=bool(antithetic))
    if sweep_impl not in ("auto", "grid", "regen"):
        raise ValueError(f"unknown sweep_impl {sweep_impl!r}")
    grid_n = chunk_paths // block_paths
    # auto -> regen: the grid design pays generation once per block but
    # its sweep-only grid steps measured ~4-10x slower than the same
    # sweep fused with generation (v5e, 8.4M x 365: grid K=50 2.09 s vs
    # regen 1.05 s; Greeks 1.75 s vs 1.29 s) — the decoupled-sweep wall,
    # same phenomenon as the r03 HBM-materialization dead end.  "grid"
    # stays selectable for A/B (parity/group_probe.py).
    use_grid = n_g > 1 and sweep_impl == "grid"
    interp = pltpu.InterpretParams() if interpret else False

    def _in_specs(gmap):
        # Input specs shared by both grid arities (regen: grid (grid_n,);
        # grid-over-groups: grid (grid_n, n_g)); ``gmap`` lifts each
        # path-block index map to the call's arity.  The group-tables
        # spec is the one input that genuinely differs (grid streams
        # group j; regen re-feeds one group), so it stays at the call
        # sites — as do the out/scratch specs.
        first = (pl.BlockSpec((2, noise_rows, s_pad),
                              gmap(lambda i: (0, i, 0)),
                              memory_space=pltpu.VMEM) if noise_input
                 else pl.BlockSpec(memory_space=pltpu.SMEM))
        mat = pl.BlockSpec((s_pad, s_pad), gmap(lambda i: (0, 0)),
                           memory_space=pltpu.VMEM)
        return [
            first,                                      # seed or noise
            mat,                                        # Lt' (chol)
            mat,                                        # dLt'/dh
            pl.BlockSpec((1, s_pad), gmap(lambda i: (0, 0)),
                         memory_space=pltpu.VMEM),      # half var drift
            mat,                                        # cumsum tri
            pl.BlockSpec((8, s_pad), gmap(lambda i: (0, 0)),
                         memory_space=pltpu.VMEM),      # tangent rows
        ]

    if use_grid:
        call = pl.pallas_call(
            functools.partial(_chain_greeks_kernel_grid, **kw,
                              noise_input=noise_input),
            grid=(grid_n, n_g),
            in_specs=[
                *_in_specs(_with_group_axis),
                pl.BlockSpec((group, 8, s_pad), lambda i, j: (j, 0, 0),
                             memory_space=pltpu.VMEM),      # group j tables
            ],
            out_specs=pl.BlockSpec((8, LANE), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((grid_n * 8, n_g * LANE),
                                           jnp.float32),
            scratch_shapes=[pltpu.VMEM((4, block_paths, s_pad),
                                       jnp.float32)],
            interpret=interp,
        )
    else:
        body = (_chain_greeks_kernel_noise_in if noise_input
                else _chain_greeks_kernel)
        call = pl.pallas_call(
            functools.partial(body, **kw),
            grid=(grid_n,),
            in_specs=[
                *_in_specs(lambda f: f),
                pl.BlockSpec((group, 8, s_pad), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),      # group's tables
            ],
            out_specs=pl.BlockSpec((8, LANE), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((grid_n * 8, LANE), jnp.float32),
            interpret=interp,
        )

    def chunk_sums(seed_or_noise, tables) -> jax.Array:
        """[6, K] partial sums for the chunk; ``tables`` is [K, 8, s_pad]
        of log_boundary_rows(boundary_rows(...))."""
        if noise_input:
            first = seed_or_noise.astype(jnp.float32)
        else:
            first = _as_seed_words(seed_or_noise)
        if k_tab > n_k:
            pad = jnp.broadcast_to(tables[-1:],
                                   (k_tab - n_k, *tables.shape[1:]))
            tables = jnp.concatenate([tables, pad])
        if use_grid:
            out = call(first, *consts, tables)
            # Stripe rows collapse across grid blocks; within group j's
            # 128-lane block, lane g*8 + i is local strike g's i-th
            # output (see _chain_greeks_kernel_grid).
            sums = jnp.sum(out[::8], axis=0)
            vals = sums.reshape(n_g, LANE // 8, 8)[:, :group, :6]
            return vals.reshape(k_tab, 6)[:n_k].T
        vals = []
        for g in range(n_g):
            out = call(first, *consts, tables[g * group:(g + 1) * group])
            # Stripe rows collapse across grid blocks; lane g*8 + i is
            # strike g's i-th output (see _chain_greeks_body).
            sums = jnp.sum(out[::8], axis=0)
            vals.append(sums.reshape(LANE // 8, 8)[:group, :6])
        return jnp.concatenate(vals)[:n_k].T

    return chunk_sums, s_pad


MAX_KERNEL_STEPS = 512        # spectral: hardware-measured cap (VERIFY_r02)
MAX_KERNEL_STEPS_CHOL = 1024  # chol: hardware-measured cap (VERIFY_r03 §11)

# VMEM byte model for max_block_paths, calibrated against real v5e Mosaic
# compiles (parity/single_tile_cap.py, VERIFY_r03 §11): at (chol,
# s_pad=1024) block 256 overran the 16 MiB scoped-vmem limit by 60 KiB
# while block 128 compiled and ran, and (chol, s_pad=768, block 256) fits.
# Block-scaled planes measured ~7.3 at the failure point; 8 is the
# conservative round-up (noise + path/price + val/scratch planes).
_VMEM_SOFT_BUDGET = 15_500_000
_BLOCK_PLANES = 8


def max_block_paths(n_steps: int, fgn_form: str = "spectral") -> int:
    """Largest pow2 path block (<= 512) whose fused-kernel VMEM footprint
    fits the scoped budget at this horizon, or 0 if none does.

    Footprint = resident [s_pad, s_pad] constants (fGN matrices + cumsum
    tri in f32, plus the priced kernels' strict-upper counting matrix in
    bf16 — included unconditionally so the bound covers the worst caller)
    + _BLOCK_PLANES block-scaled [block, s_pad] f32 planes."""
    s_pad = _round_up(n_steps, LANE)
    n_mats = 1 if fgn_form == "chol" else 2
    resident = (n_mats + 1) * s_pad * s_pad * 4 + s_pad * s_pad * 2
    blk = 512
    while blk >= 16 and (resident + blk * s_pad * 4 * _BLOCK_PLANES
                         > _VMEM_SOFT_BUDGET):
        blk //= 2
    return blk if blk >= 16 else 0


def _check_block_budget(n_steps: int, block_paths: int,
                        fgn_form: str) -> None:
    """Loud rejection of a path block the VMEM budget cannot admit at this
    horizon (a silent Mosaic scoped-vmem overrun is a compile-time crash
    with an opaque message; this names the fix)."""
    cap = max_block_paths(n_steps, fgn_form)
    if block_paths > cap:
        raise ValueError(
            f"block_paths={block_paths} exceeds the fused kernel's VMEM "
            f"budget at n_steps={n_steps} ({fgn_form}): max is {cap} "
            "(the engine clamps automatically; direct callers must pass "
            "block_paths <= max_block_paths(n_steps, fgn_form))")


def supports(n_steps: int, fgn_form: str = "spectral") -> bool:
    """Whether the fused kernel fits VMEM: the [s_pad, s_pad] constants
    plus the per-block noise/path planes must stay well under the
    ~16 MiB/core budget.  The bound is form-AWARE: the chol form keeps
    one [s_pad, s_pad] matrix resident instead of two, raising its
    hardware-measured cap to 1024 padded steps (1.09-1.19x the step-tiled
    slab over 513-1024, VERIFY_r03 §11) — at a reduced path block past
    768 (see max_block_paths; the engine clamps automatically)."""
    cap = MAX_KERNEL_STEPS_CHOL if fgn_form == "chol" else MAX_KERNEL_STEPS
    return (_round_up(n_steps, LANE) <= cap
            and max_block_paths(n_steps, fgn_form) >= 16)


def _with_group_axis(imap):
    """Lift a path-block BlockSpec index map ``i -> coords`` to the
    (path block, strike group) grid of the grid-over-groups chain
    kernels; the group coordinate is ignored by every input except the
    policy tables (whose spec is written at the call sites)."""
    return lambda i, j: imap(i)


def _fgn_consts(n_steps: int, s_pad: int, h, eta, dt, fgn_dtype,
                fgn_form: str):
    """Padded VMEM-resident fGN constants + their BlockSpecs: [Cr, Ci]
    (spectral) or [Lt] (chol — half the resident bytes, half the matmul
    FLOPs, same Gaussian law; see engine._chol_matrix_host).

    Matrices are PRE-SCALED by 0.5 (exact — a binary exponent shift, even
    in bf16) so the kernel's variance exp yields sqrt(v) directly; see
    the _paths_from_noise half-scaled constants contract."""
    from .engine import _chol_matrix_host, _fgn_matrices_host

    if fgn_form == "chol":
        lt = _chol_matrix_host(n_steps, h, eta, dt, jnp.dtype(fgn_dtype))
        mats = [jnp.zeros((s_pad, s_pad), fgn_dtype)
                .at[:n_steps, :n_steps].set(0.5 * lt)]
    elif fgn_form == "spectral":
        cr, ci = _fgn_matrices_host(n_steps, h, eta, dt,
                                    jnp.dtype(fgn_dtype))
        mats = [jnp.zeros((s_pad, s_pad), fgn_dtype)
                .at[:n_steps, :n_steps].set(0.5 * m) for m in (cr, ci)]
    else:
        raise ValueError(f"unknown fgn_form: {fgn_form!r}")
    specs = [pl.BlockSpec((s_pad, s_pad), lambda i: (0, 0),
                          memory_space=pltpu.VMEM) for _ in mats]
    return mats, specs


def _half_var_drift(n_steps: int, s_pad: int, xi, h, eta, dt) -> jax.Array:
    """[1, s_pad] VMEM row of 0.5*(ln xi - 0.5 eta^2 t_c^{2H}) at the
    increment times t_c = c*dt, c = 0..n_steps-1 (the reference's
    forwardVariance convention; pad columns zero — inc is masked there
    anyway): with the half-scaled fGN matrices, sv = exp(x' + this) is
    exactly sqrt(xi * exp(X - eta^2/2 t^{2H})) = sqrt(forward
    variance)."""
    t = np.arange(n_steps, dtype=np.float64) * dt
    hvd = 0.5 * (math.log(xi) - 0.5 * (eta * eta) * t ** (2.0 * h))
    return jnp.zeros((1, s_pad), jnp.float32).at[0, :n_steps].set(
        jnp.asarray(hvd, jnp.float32))


def _build(s0, xi, h, eta, rho, r, n_steps: int, dt: float,
           chunk_paths: int, block_paths: int, interpret: bool,
           noise_input: bool, fgn_dtype=jnp.float32,
           fgn_form: str = "spectral", antithetic: bool = False):
    if chunk_paths % block_paths:
        raise ValueError("chunk_paths must divide by block_paths")
    if not noise_input and block_paths % 16:
        raise ValueError("block_paths must divide by 16 (the 1.5-pair "
                         "Box-Muller scheme slices at block and block*3/2, "
                         "which must stay sublane-aligned)")
    if antithetic and block_paths % 32:
        raise ValueError("antithetic needs block_paths % 32 == 0 (half "
                         "the rows are drawn, and the Box-Muller row "
                         "slices must stay sublane-aligned)")
    if not supports(n_steps, fgn_form):
        raise ValueError(
            f"n_steps={n_steps} pads past the fused kernel's "
            f"{fgn_form} VMEM cap; "
            "use the step-tiled kernel (pathgen_tiled) or the XLA generator")
    _check_block_budget(n_steps, block_paths, fgn_form)
    s_pad = _round_up(n_steps, LANE)
    out_cols = _round_up(n_steps + 1, LANE)

    mats, mat_specs = _fgn_consts(n_steps, s_pad, h, eta, dt, fgn_dtype,
                                  fgn_form)
    vd_p = _half_var_drift(n_steps, s_pad, xi, h, eta, dt)
    # Upper-triangular ones, rows past n_steps zeroed (annihilates padding).
    tri = np.triu(np.ones((s_pad, s_pad), np.float32))
    tri[n_steps:, :] = 0.0
    tri_p = jnp.asarray(tri)

    kw = dict(n_steps=n_steps, s_pad=s_pad, xi=float(xi), r=float(r),
              dt=float(dt), log_s0=float(math.log(s0)), fgn_form=fgn_form,
              antithetic=bool(antithetic))
    body = _pathgen_kernel_noise_in if noise_input else _pathgen_kernel
    kernel = functools.partial(body, **kw)

    planes = n_planes(fgn_form)
    noise_rows = block_paths // 2 if antithetic else block_paths
    first_spec = (
        pl.BlockSpec((planes, noise_rows, s_pad), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM) if noise_input
        else pl.BlockSpec(memory_space=pltpu.SMEM))
    grid = (chunk_paths // block_paths,)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            first_spec,                                     # seed or noise
            *mat_specs,                                     # Cr/Ci or Lt
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
    return call, (*mats, vd_p, tri_p), s_pad


def make_pallas_pathgen(s0, xi, h, eta, rho, r, n_steps: int, dt: float,
                        chunk_paths: int, block_paths: int = 256,
                        interpret: bool = False, fgn_dtype=jnp.float32,
                        fgn_form: str = "spectral",
                        antithetic: bool = False):
    """Build seed -> [chunk_paths, n_steps + 1] float32 rBergomi generator
    with in-kernel RNG.

    ``seed`` is an int32 scalar or a 2-vector (run_word, stream_index); the
    kernel additionally folds the grid block id into the PRNG seed.  Pass
    distinct stream indices per chunk for independent chunks.

    antithetic=True fills each block with block_paths/2 pairs
    (N, W) / (-N, -W) sharing one fGN matmul — whole-path consumers
    (bounds, generic policy streams) inherit the pairing.
    """
    call, consts, _ = _build(s0, xi, h, eta, rho, r, n_steps, dt, chunk_paths,
                             block_paths, interpret, noise_input=False,
                             fgn_dtype=fgn_dtype, fgn_form=fgn_form,
                             antithetic=antithetic)

    def gen(seed) -> jax.Array:
        out = call(_as_seed_words(seed), *consts)
        return out[:, : n_steps + 1]

    return gen


def _as_seed_words(seed) -> jax.Array:
    """Normalize a scalar or (run_word, stream_index) pair to int32 [2]."""
    arr = jnp.atleast_1d(jnp.asarray(seed, jnp.int32))
    if arr.shape[0] == 1:
        arr = jnp.concatenate([arr, jnp.zeros(1, jnp.int32)])
    return arr[:2]


def policy_rows(fits, r, strike, maturity, dt, n_steps: int, is_call: bool):
    """[8, s_pad] per-column policy table for the fused kernel, built
    in-graph from forward-time PolyFit arrays (models/lsm.lsm_fit output).

    Column c of the kernel's price block is step j = c + 1; row layout:
    c0, c1, c2 (standardized poly coeffs), mu, sd, itm-eps, discount, pad.
    The terminal column always exercises (c0 = -BIG, eps = -1); steps past
    maturity and pad columns never do (eps = +BIG).
    """
    s_pad = _round_up(n_steps, LANE)
    c0, c1, c2, mu, sd, eps, disc = _table_prep(
        fits, r, maturity, dt, n_steps, s_pad, terminal_eps=-1.0)
    # Row 7 carries the (possibly traced) strike, replicated across
    # columns: the chain kernel reads it from the table instead of baking
    # it in, so fresh strike strips reuse the compiled kernel (serving).
    strike_row = jnp.broadcast_to(jnp.asarray(strike, jnp.float32), (s_pad,))
    return jnp.stack([c0, c1, c2, mu, sd, eps, disc, strike_row])


def _table_prep(fits, r, maturity, dt, n_steps: int, s_pad: int,
                terminal_eps: float):
    """Shared policy-table scaffolding for policy_rows / boundary_rows:
    column-shifted fit arrays, the integer-exact live-window eps, and the
    pilot-consistent undipped exp(-r t) discount (see
    engine.lsm_policy_value's consistency contract).  The two table forms
    differ only in the terminal column's eps: policy_rows forces exercise
    there (-1, with c0 = -BIG), boundary_rows keeps the ITM test (1e-14)."""
    big = jnp.float32(1e30)
    dtf = jnp.float32

    t = (jnp.arange(1, n_steps + 1, dtype=jnp.float32)) * dt  # step times
    # fits arrays cover steps 0..n_steps-1; column c uses step c+1 for
    # c < n_steps-1; the terminal column (c = n_steps-1) is forced.
    def shifted(a, fill, pad_value=0.0):
        v = jnp.concatenate([a[1:].astype(dtf), jnp.asarray([fill], dtf)])
        return jnp.pad(v, (0, s_pad - n_steps), constant_values=pad_value)

    c0 = shifted(fits.coeffs[:, 0], -1e30)
    c1 = shifted(fits.coeffs[:, 1], 0.0)
    c2 = shifted(fits.coeffs[:, 2], 0.0)
    mu = shifted(fits.mu, 0.0)
    # pad sd with 1 so the pad columns' z stays finite (their eps already
    # disables exercise).
    sd = jnp.maximum(shifted(fits.sd, 1.0, pad_value=1.0), 1e-30)

    # Integer-exact live window (ops.timegrid.step_mask semantics).
    from ..ops.timegrid import step_mask

    live = step_mask(n_steps + 1, dt, maturity)[1:]
    eps = jnp.where(live, jnp.float32(1e-14), big)
    eps = eps.at[n_steps - 1].set(terminal_eps)
    eps = jnp.pad(eps, (0, s_pad - n_steps), constant_values=1e30)
    disc = jnp.exp(-r * t).astype(dtf)
    disc = jnp.pad(disc, (0, s_pad - n_steps))
    return c0, c1, c2, mu, sd, eps, disc


def boundary_rows(fits, r, strike, maturity, dt, n_steps: int,
                  is_call: bool):
    """[8, s_pad] exercise-INTERVAL policy table for the chain kernel's
    ``policy_form="boundary"`` fast path.

    The fitted LSM decision at step j is "exercise iff payoff > eps and
    payoff >= c2 z^2 + c1 z + c0" (policy_rows semantics) — a sign test
    of a QUADRATIC in S, so its solution set is known at table-build
    time: for every convex-continuation fit (the canonical case — the
    parabola opens upward, c2 > 0) it is a single S-interval, possibly
    bounded on BOTH sides (deep ITM the extrapolated quadratic rises
    above the linear payoff, so the fitted policy genuinely says
    continue there), and the in-kernel test collapses to two compares
    against precomputed roots.  Rows:

      0: lo — exercise iff S >= lo ...
      1: hi — ... and S <= hi
      2: disc * strike (the exercise value is row2 - disc*S for puts)
      3: discount exp(-r t) (shared across strikes — the kernel hoists
         the disc*S plane once per strike strip)
      4: the strike, replicated across all columns (read by the chain
         Greeks kernel via log_boundary_rows, as a row max)
      5-7: zero (layout padding to the [8, s_pad] table shape)

    Exactness vs the quadratic form: decisions agree except (a) within
    f32 rounding of the roots (the quadratic's own f32 evaluation
    wobbles there too) and (b) for a CONCAVE-continuation fit (c2 < 0)
    whose solution set splits into two components — clipped to the
    deep-ITM component, which perturbs the policy only where payoff ~=
    fitted continuation, a second-order value change (the envelope
    argument; agreement is asserted cell-level in tests/test_chain.py).
    The terminal column exercises iff ITM instead of policy_rows'
    exercise-always — value-identical, since an OTM terminal exercise
    contributes max(payoff, 0) = 0 there (LSMPricer.cpp:29-38
    semantics).

    Root finding is branchless f32 jnp (tables build in-graph from
    traced fits/strikes — the serving fast path reuses compiled
    programs for fresh strips), solved in the fit's own standardized
    z basis (raw-S coefficients cancel catastrophically for small sd)
    with the stable quadratic form q = -(b + sign(b) sqrt(b^2-4ac))/2,
    roots q/a and c/q, endpoints mapped back via S = mu + sd z.
    """
    s_pad = _round_up(n_steps, LANE)
    big = jnp.float32(1e30)
    dtf = jnp.float32

    # Terminal eps: ITM test only (see docstring); policy_rows' -1
    # sentinel would shift the ITM cap by a full dollar here.
    c0, c1, c2, mu, sd, eps, disc = _table_prep(
        fits, r, maturity, dt, n_steps, s_pad, terminal_eps=1e-14)

    strike = jnp.asarray(strike, dtf)
    # Solve the exercise condition in the STANDARDIZED z = (S - mu)/sd
    # basis the fit lives in.  (Converting to raw-S coefficients first
    # scales them like (mu/sd)^2, and their f32 discriminant b^2 - 4ac
    # cancels catastrophically for small sd — measured decision flips far
    # outside the root band, growing like 1/sd^2.  z-basis coefficients
    # stay O(fit), and S = mu + sd z is monotone increasing, so interval
    # endpoints map through directly.)
    #   put:  strike - S >= cont  ->  -c2 z^2 - (c1+sd) z + (strike-mu-c0)
    #   call: S - strike >= cont  ->  -c2 z^2 + (sd-c1) z + (mu-strike-c0)
    if is_call:
        a, b, c = -c2, sd - c1, mu - strike - c0
        # ITM cap: S > strike + eps, i.e. S >= nextafter(strike + eps).
        cap = jax.lax.nextafter(strike + jnp.maximum(eps, 0.0), big)
    else:
        a, b, c = -c2, -(sd + c1), strike - mu - c0
        cap = jax.lax.nextafter(strike - jnp.maximum(eps, 0.0), -big)
    # The terminal column always exercises when ITM: its c0 = -1e30 makes
    # c ~= +1e30, landing in the linear all-exercise branch (the ITM cap
    # then carries the whole decision).

    lin = jnp.abs(a) <= 1e-25
    safe_b = jnp.where(jnp.abs(b) > 1e-30, b, 1.0)
    s_lin = -c / safe_b
    disc_q = b * b - 4.0 * a * c
    sq = jnp.sqrt(jnp.maximum(disc_q, 0.0))
    qq = -0.5 * (b + jnp.where(b < 0, -sq, sq))
    safe_a = jnp.where(lin, jnp.float32(1.0), a)
    safe_qq = jnp.where(jnp.abs(qq) > 1e-30, qq, 1e-30)
    r1 = qq / safe_a
    r2 = c / safe_qq
    rlo = jnp.minimum(r1, r2)
    rhi = jnp.maximum(r1, r2)
    # {q >= 0} as [set_lo, set_hi] (empty encoded as [big, -big]):
    #   a<0 (convex continuation, canonical): between the roots;
    #   a>0 (concave): outside the roots -> clip to the deep-ITM
    #       component ((-inf, rlo] for puts, [rhi, inf) for calls);
    #   linear: a half-line by sign(b); b==0: everywhere/nowhere.
    lin_lo = jnp.where(jnp.abs(b) <= 1e-30,
                       jnp.where(c >= 0, -big, big),
                       jnp.where(b > 0, s_lin, -big))
    lin_hi = jnp.where(jnp.abs(b) <= 1e-30,
                       jnp.where(c >= 0, big, -big),
                       jnp.where(b > 0, big, s_lin))
    if is_call:
        quad_lo = jnp.where(a < 0, jnp.where(disc_q < 0, big, rlo),
                            jnp.where(disc_q < 0, -big, rhi))
        quad_hi = jnp.where(a < 0, jnp.where(disc_q < 0, -big, rhi),
                            big)
    else:
        quad_lo = jnp.where(a < 0, jnp.where(disc_q < 0, big, rlo),
                            -big)
        quad_hi = jnp.where(a < 0, jnp.where(disc_q < 0, -big, rhi),
                            jnp.where(disc_q < 0, big, rlo))
    zlo = jnp.where(lin, lin_lo, quad_lo)
    zhi = jnp.where(lin, lin_hi, quad_hi)
    # Map the z endpoints back to S.  The +-big sentinels (empty set /
    # unbounded side) must stay sentinels: passing them through
    # mu + sd*z with a tiny sd would shrink an unbounded side to a
    # finite band.
    set_lo = jnp.where(jnp.abs(zlo) >= big, zlo, mu + sd * zlo)
    set_hi = jnp.where(jnp.abs(zhi) >= big, zhi, mu + sd * zhi)
    # Intersect with the ITM cap (put: S <= cap; call: S >= cap).
    if is_call:
        lo_row = jnp.maximum(set_lo, cap)
        hi_row = set_hi
    else:
        lo_row = set_lo
        hi_row = jnp.minimum(set_hi, cap)

    zeros = jnp.zeros((s_pad,), dtf)
    strike_row = jnp.broadcast_to(strike, (s_pad,))
    return jnp.stack([lo_row, hi_row, disc * strike, disc,
                      strike_row, zeros, zeros, zeros])


def boundary_policy_value(paths, table, n_steps: int, is_call: bool):
    """XLA-side evaluation of ONE boundary_rows table on generated paths
    [n, >= n_steps+1] (column j = step j): the reference comparator for
    the boundary-form chain kernel.  Uses the same f32 compares and the
    same dk - disc*S value arithmetic, so decisions and per-path values
    are bitwise those of the kernel on bitwise-equal paths; only the
    summation order differs.  Column 0 (shared S0) is excluded, exactly
    like the kernel (engine handles time-0 outside)."""
    s = paths[:, 1:n_steps + 1].astype(jnp.float32)
    lo = table[0, :n_steps]
    hi = table[1, :n_steps]
    dk = table[2, :n_steps]
    ds = s * table[3, :n_steps]
    exf = (s >= lo) & (s <= hi)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    big = jnp.int32(1 << 30)
    idx = jnp.min(jnp.where(exf, col, big), axis=1, keepdims=True)
    val = (ds - dk) if is_call else (dk - ds)
    return jnp.sum(jnp.where(col == idx, val, 0.0))


def time0_value(fits, s0, strike, is_call: bool):
    """(exercises_at_0, payoff_at_0): every path shares S0, so time-0
    exercise is a single scalar decision handled outside the kernel
    (lsm_policy_value's column 0)."""
    p0 = max(s0 - strike, 0.0) if is_call else max(strike - s0, 0.0)
    z0 = (s0 - fits.mu[0]) / fits.sd[0]
    cont0 = (fits.coeffs[0, 2] * z0 + fits.coeffs[0, 1]) * z0 \
        + fits.coeffs[0, 0]
    ex0 = jnp.logical_and(p0 > 1e-14, p0 >= cont0)
    return ex0, p0


def make_pallas_priced_chunk(s0, xi, h, eta, rho, r, strike, maturity,
                             dt: float, n_steps: int, chunk_paths: int,
                             block_paths: int = 256, is_call: bool = False,
                             interpret: bool = False,
                             noise_input: bool = False,
                             fgn_dtype=jnp.float32,
                             with_cv: bool = False,
                             fgn_form: str = "spectral",
                             policy_form: str = "quadratic",
                             antithetic: bool = False,
                             interleave: int = 1,
                             schedule: str = "chained"):
    """Fully fused streaming unit: (seed, policy table) -> chunk payoff
    sum under the fitted exercise policy.  Paths live and die in VMEM;
    HBM traffic is one float per grid block.

    ``interleave`` > 1 (boundary form only) splits each block into that
    many independent sub-block chains inside one kernel body so Mosaic
    can overlap one sub-chain's MXU matmuls with another's VPU work —
    see _priced_kernel.  Estimator-identical; f32 summation order
    differs from interleave=1.

    ``schedule="staggered"`` (requires interleave=2, boundary form, no
    antithetic) runs the two halves through the hand-staggered software
    pipeline instead of the chained loop — same draws, bitwise-equal
    sums, different program order (see _priced_log_subvals_staggered).

    policy_form="boundary" evaluates the policy in LOG space (exercise
    intervals pre-logged by log_boundary_rows; one exp per path at the
    stop step instead of one per cell) — the engine's default via
    StreamConfig.policy_form; "quadratic" is the cell-level quadratic on
    the S plane against policy_rows tables.

    with_cv=True additionally returns the martingale-control partial sum
    sum(e^{-r T} S_T) per chunk (engine.martingale_control semantics), so
    StreamConfig(control_variate=True) keeps the fused kernel instead of
    falling back to the ~2x slower generic path stream.

    antithetic=True prices each chunk as chunk_paths/2 antithetic pairs
    — every path's marginal law is unchanged, half the Box-Muller draws
    (the kernel's measured VPU transcendental bound), pairwise-negative
    payoff correlation (see _priced_body).  Boundary policy form only;
    injected noise then carries chunk_paths/2 rows per plane."""
    if chunk_paths % block_paths:
        raise ValueError("chunk_paths must divide by block_paths")
    if antithetic and policy_form != "boundary":
        raise ValueError("antithetic requires policy_form='boundary' "
                         "(the log-plane fused body)")
    if antithetic and block_paths % 32:
        raise ValueError("antithetic needs block_paths % 32 == 0 (half "
                         "the rows are drawn, and the Box-Muller row "
                         "slices must stay sublane-aligned)")
    if not noise_input and block_paths % 16:
        raise ValueError("block_paths must divide by 16 for in-kernel RNG")
    if not supports(n_steps, fgn_form):
        raise ValueError("n_steps too large for the fused kernel")
    _check_block_budget(n_steps, block_paths, fgn_form)
    s_pad = _round_up(n_steps, LANE)

    mats, mat_specs = _fgn_consts(n_steps, s_pad, h, eta, dt, fgn_dtype,
                                  fgn_form)
    vd_p = _half_var_drift(n_steps, s_pad, xi, h, eta, dt)
    tri = np.triu(np.ones((s_pad, s_pad), np.float32))
    tri[n_steps:, :] = 0.0
    tri_p = jnp.asarray(tri)
    # {0,1} exactly representable; accumulation is f32 -> exact counts at
    # the bf16 MXU rate.
    if policy_form not in ("quadratic", "boundary"):
        raise ValueError(f"unknown policy_form {policy_form!r}")
    log_boundary = policy_form == "boundary"
    consts = [*mats, vd_p, tri_p]
    const_specs = [
        *mat_specs,                                     # Cr/Ci or Lt
        pl.BlockSpec((1, s_pad), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),          # var drift
        pl.BlockSpec((s_pad, s_pad), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),          # cumsum tri
    ]
    if not log_boundary:
        # The quadratic form finds "first exercise" via a strict-upper
        # counting matmul; the log-boundary form min-reduces instead and
        # needs no [s_pad, s_pad] bf16 matrix at all.
        consts.append(jnp.asarray(
            np.triu(np.ones((s_pad, s_pad), np.float32), k=1),
            jnp.bfloat16))
        const_specs.append(pl.BlockSpec((s_pad, s_pad), lambda i: (0, 0),
                                        memory_space=pltpu.VMEM))

    if interleave > 1:
        if not log_boundary:
            raise ValueError("interleave > 1 requires the boundary "
                             "policy form (the log-plane fused body)")
        rows = block_paths // 2 if antithetic else block_paths
        sub = rows // interleave
        if sub * interleave != rows or sub % 16:
            raise ValueError(
                f"interleave={interleave} must split the block's "
                f"{rows} noise rows into equal 16-aligned sub-blocks")
    if schedule not in ("chained", "staggered"):
        raise ValueError(f"unknown schedule {schedule!r}")
    if schedule == "staggered" and (interleave != 2 or antithetic
                                    or not log_boundary):
        raise ValueError("schedule='staggered' is the two-half pipeline: "
                         "it requires interleave=2, the boundary policy "
                         "form, and no antithetic pairing")
    kw = dict(n_steps=n_steps, s_pad=s_pad, xi=float(xi), r=float(r),
              dt=float(dt), log_s0=float(math.log(s0)),
              block_paths=block_paths, is_call=bool(is_call),
              strike=float(strike), fgn_form=fgn_form,
              policy_form="log_boundary" if log_boundary else "quadratic",
              antithetic=bool(antithetic), interleave=int(interleave),
              schedule=str(schedule))
    if with_cv:
        kw["cv_disc"] = float(math.exp(-r * n_steps * dt))
    body = _priced_kernel_noise_in if noise_input else _priced_kernel
    kernel = functools.partial(body, **kw)
    grid_n = chunk_paths // block_paths
    noise_rows = block_paths // 2 if antithetic else block_paths
    first_spec = (
        pl.BlockSpec((n_planes(fgn_form), noise_rows, s_pad),
                     lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM) if noise_input
        else pl.BlockSpec(memory_space=pltpu.SMEM))
    call = pl.pallas_call(
        kernel,
        grid=(grid_n,),
        in_specs=[
            first_spec,                                     # seed or noise
            *const_specs,
            pl.BlockSpec((8, s_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),          # policy rows
        ],
        # Mosaic requires >= (8, 128) blocks: each grid step owns an 8-row
        # stripe and broadcasts its partial sum into it.
        out_specs=pl.BlockSpec((8, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid_n * 8, LANE), jnp.float32),
        interpret=pltpu.InterpretParams() if interpret else False,
    )

    def chunk_sum(seed_or_noise, rows):
        """``rows``: policy_rows output for the quadratic form,
        log_boundary_rows(boundary_rows(...)) for the boundary form."""
        if noise_input:
            first = seed_or_noise.astype(jnp.float32)
        else:
            first = _as_seed_words(seed_or_noise)
        out = call(first, *consts, rows)
        if with_cv:
            return jnp.sum(out[::8, 0]), jnp.sum(out[::8, 1])
        return jnp.sum(out[::8, 0])

    return chunk_sum, s_pad


def make_pallas_priced_chain(s0, xi, h, eta, rho, r, strikes, maturity,
                             dt: float, n_steps: int, chunk_paths: int,
                             block_paths: int = 256, is_call: bool = False,
                             interpret: bool = False,
                             noise_input: bool = False,
                             fgn_dtype=jnp.float32,
                             fgn_form: str = "spectral",
                             policy_form: str = "boundary",
                             antithetic: bool = False,
                             sweep_impl: str = "auto"):
    """Fused K-strike streaming unit: (seed, policy_tables [K, 8, s_pad])
    -> [K] chunk payoff sums, sharing ONE in-VMEM path block across the
    whole strike strip.  Policy tables are per-strike `boundary_rows`
    (policy_form="boundary", the fast default — two-compare interval
    exercise tests, see _policy_value_boundary) or `policy_rows`
    (policy_form="quadratic" — the cell-level quadratic), stacked on a
    leading axis.

    The strip is swept in groups of <= CHAIN_GROUP strikes.
    sweep_impl="regen" (the auto default) runs one fused pass per
    group, REUSING the seed so every group regenerates bitwise-identical
    paths (the PRNG is keyed on (seed, block id) only) — K strikes cost
    ceil(K / CHAIN_GROUP) fused passes.  sweep_impl="grid" selects the
    grid-over-groups kernel: one pallas_call with grid (path_blocks,
    n_groups), the path block generated once into VMEM scratch and
    re-swept by every group (see _chain_kernel_grid).  Both kernels
    seed identically, so their sums agree bitwise (tests/test_pallas.py
    pins this).  Three decoupled-sweep alternatives have now measured
    WORSE than regen on v5e (VERIFY_r03 §6, VERIFY_r04 §6): a
    >10-strike unroll (Mosaic schedules the policy sweep superlinearly
    past ~10 strikes — 4.4 ms/strike at group 10 rising to 37 ms at
    group 50), materializing paths to HBM for a separate policy-sweep
    kernel (~5x slower per strike), and the grid kernel itself (K=50:
    2.09 s vs regen's 1.05 s at 8.4M x 365 — its sweep-only grid steps
    lose the generator matmuls' scheduling cover, the same wall as the
    HBM form).  Generation therefore cannot be amortized below one pass
    per group on this hardware; regen at group 10 is the measured
    optimum of every family tried.

    antithetic=True (boundary form only): each block prices
    block_paths/2 pairs (N, W) / (-N, -W) sharing one fGN matmul (see
    _chain_paths) — same estimator semantics as the single-strike
    priced kernel's pairing; injected noise then carries block_paths/2
    rows per plane."""
    if policy_form not in ("boundary", "quadratic"):
        raise ValueError(f"unknown policy_form {policy_form!r}")
    if sweep_impl not in ("auto", "grid", "regen"):
        raise ValueError(f"unknown sweep_impl {sweep_impl!r}")
    if antithetic and policy_form != "boundary":
        raise ValueError("antithetic requires policy_form='boundary' "
                         "(the production chain form)")
    if antithetic and block_paths % 32:
        raise ValueError("antithetic needs block_paths % 32 == 0 (half "
                         "the rows are drawn, and the Box-Muller row "
                         "slices must stay sublane-aligned)")
    n_k = int(strikes) if isinstance(strikes, int) else len(strikes)
    if chunk_paths % block_paths:
        raise ValueError("chunk_paths must divide by block_paths")
    if not noise_input and block_paths % 16:
        raise ValueError("block_paths must divide by 16 for in-kernel RNG")
    # The chain kernel keeps the CONSERVATIVE spectral cap for both forms:
    # its per-group policy tables and K-lane value scratch add VMEM the
    # max_block_paths byte model does not account for, and the raised chol
    # cap is only hardware-validated for the single-strike kernels
    # (VERIFY_r03 §11).  Horizons past 512 fall back to the XLA chain.
    if _round_up(n_steps, LANE) > MAX_KERNEL_STEPS:
        raise ValueError("n_steps too large for the fused chain kernel")
    s_pad = _round_up(n_steps, LANE)
    group = min(n_k, CHAIN_GROUP)
    n_g = -(-n_k // group)
    k_tab = n_g * group

    mats, _ = _fgn_consts(n_steps, s_pad, h, eta, dt, fgn_dtype,
                          fgn_form)   # specs rebuilt per grid arity below
    vd_p = _half_var_drift(n_steps, s_pad, xi, h, eta, dt)
    tri = np.triu(np.ones((s_pad, s_pad), np.float32))
    tri[n_steps:, :] = 0.0
    tri_p = jnp.asarray(tri)

    kw = dict(n_steps=n_steps, s_pad=s_pad, xi=float(xi), r=float(r),
              dt=float(dt), log_s0=float(math.log(s0)),
              block_paths=block_paths, fgn_form=fgn_form,
              antithetic=bool(antithetic))
    pol_kw = dict(is_call=bool(is_call), group=group,
                  policy_form=policy_form)
    grid_n = chunk_paths // block_paths
    interp = pltpu.InterpretParams() if interpret else False
    noise_rows = block_paths // 2 if antithetic else block_paths

    def _in_specs(gmap):
        # Input specs shared by both grid arities; ``gmap`` lifts each
        # path-block index map to the call's arity (see _with_group_axis).
        # The group-tables spec genuinely differs and stays at the call
        # sites, as do the out specs.
        first = (pl.BlockSpec((n_planes(fgn_form), noise_rows, s_pad),
                              gmap(lambda i: (0, i, 0)),
                              memory_space=pltpu.VMEM) if noise_input
                 else pl.BlockSpec(memory_space=pltpu.SMEM))
        return [
            first,                                          # seed or noise
            *(pl.BlockSpec((s_pad, s_pad), gmap(lambda i: (0, 0)),
                           memory_space=pltpu.VMEM)
              for _ in mats),                               # Cr/Ci or Lt
            pl.BlockSpec((1, s_pad), gmap(lambda i: (0, 0)),
                         memory_space=pltpu.VMEM),          # var drift
            pl.BlockSpec((s_pad, s_pad), gmap(lambda i: (0, 0)),
                         memory_space=pltpu.VMEM),          # cumsum tri
        ]

    # auto -> regen: the grid design pays generation once per block but
    # its sweep-only grid steps measured ~4-10x slower than the same
    # sweep fused with generation (v5e, 8.4M x 365: grid K=50 2.09 s vs
    # regen 1.05 s; Greeks 1.75 s vs 1.29 s) — the decoupled-sweep wall,
    # same phenomenon as the r03 HBM-materialization dead end.  "grid"
    # stays selectable for A/B (parity/group_probe.py).
    use_grid = n_g > 1 and sweep_impl == "grid"
    if use_grid:
        # One pallas_call over (path blocks, groups), group axis fastest:
        # the scratch path plane is generated at j == 0 and re-swept by
        # every group's statically-blocked policy tables.
        fused = pl.pallas_call(
            functools.partial(_chain_kernel_grid, **kw, **pol_kw,
                              noise_input=noise_input),
            grid=(grid_n, n_g),
            in_specs=[
                *_in_specs(_with_group_axis),
                pl.BlockSpec((group, 8, s_pad), lambda i, j: (j, 0, 0),
                             memory_space=pltpu.VMEM),  # group j's tables
            ],
            out_specs=pl.BlockSpec((8, LANE), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((grid_n * 8, n_g * LANE),
                                           jnp.float32),
            scratch_shapes=[pltpu.VMEM((block_paths, s_pad), jnp.float32)],
            interpret=interp,
        )

        def run(first, tables):
            return fused(first, *mats, vd_p, tri_p, tables)
    else:
        body = _chain_kernel_noise_in if noise_input else _chain_kernel
        fused = pl.pallas_call(
            functools.partial(body, **kw, **pol_kw),
            grid=(grid_n,),
            in_specs=[
                *_in_specs(lambda f: f),
                pl.BlockSpec((group, 8, s_pad), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),      # group's tables
            ],
            out_specs=pl.BlockSpec((8, LANE), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((grid_n * 8, LANE), jnp.float32),
            interpret=interp,
        )

        def run(first, tables):
            # One fused pass per strike group, same seed/noise -> the PRNG
            # regenerates bitwise-identical paths for every group.
            outs = [fused(first, *mats, vd_p, tri_p,
                          tables[g * group:(g + 1) * group])
                    for g in range(n_g)]
            return jnp.concatenate(outs, axis=1)

    def chunk_sums(seed_or_noise, tables) -> jax.Array:
        """[K] payoff sums for the chunk.  ``tables`` is [K, 8, s_pad]."""
        if noise_input:
            first = seed_or_noise.astype(jnp.float32)
        else:
            first = _as_seed_words(seed_or_noise)
        if k_tab > n_k:
            # Pad the strip to a whole number of groups by repeating the
            # last table; the padded lanes are dropped below.
            pad = jnp.broadcast_to(tables[-1:],
                                   (k_tab - n_k, *tables.shape[1:]))
            tables = jnp.concatenate([tables, pad])
        out = run(first, tables)
        # [grid_n, n_g * LANE] -> per-group lanes 0..group-1 hold strikes
        sums = jnp.sum(out[::8], axis=0).reshape(n_g, LANE)[:, :group]
        return sums.reshape(-1)[:n_k]

    return chunk_sums, s_pad


def make_pallas_pathgen_from_noise(s0, xi, h, eta, rho, r, n_steps: int,
                                   dt: float, chunk_paths: int,
                                   block_paths: int = 256,
                                   interpret: bool = False,
                                   fgn_form: str = "spectral",
                                   antithetic: bool = False):
    """Test variant: noise [planes, chunk, s_pad] supplied by the caller
    (Zr, Zi, W spectral; N, W chol), so the kernel's math path can be
    compared elementwise against the XLA generator on any backend.
    With antithetic the planes carry chunk/2 rows each."""
    call, consts, s_pad = _build(s0, xi, h, eta, rho, r, n_steps, dt,
                                 chunk_paths, block_paths, interpret,
                                 noise_input=True, fgn_form=fgn_form,
                                 antithetic=antithetic)
    planes = n_planes(fgn_form)
    noise_rows = chunk_paths // 2 if antithetic else chunk_paths

    def gen(noise) -> jax.Array:
        assert noise.shape == (planes, noise_rows, s_pad), (
            noise.shape, planes, s_pad)
        out = call(noise.astype(jnp.float32), *consts)
        return out[:, : n_steps + 1]

    return gen, s_pad
