"""Four-step (Cooley-Tukey) factored-DFT Pallas kernels: fused rBergomi
paths (+ LSM policy) at long horizons in O(s^1.x) MXU FLOPs per path.

The slab-tiled kernels (models/pathgen_pallas_tiled) compute the fGN
synthesis X = Re[(Zr + i Zi) * phi @ W] as a DENSE [s_pad, s_pad] matmul —
O(s_pad^2) FLOPs per path, the measured wall at the reference's 1825-step
horizon (VERIFY_r02.md section 15).  But the spectral map is a LENGTH-m2
DFT with a diagonal phi in front (the reference's own batched-FFT form,
/root/reference/src/models/RoughVolatility.cpp:264-292), and a DFT of
composite length N = N1*N2 factors exactly (four-step algorithm):

  k = N2*k1 + k2,  m = m1 + N1*m2   (N1 = 128 = one lane group/step tile)
  X[p, m1 + N1*m2] = Re sum_k2 W_N2^{k2 m2} * W_N^{k2 m1}
                            * sum_k1 a[p, N2 k1 + k2] * W_N1^{k1 m1}

so the synthesis becomes ONE [block*N2, 128] x [128, 128] complex matmul
(stage 1, contracting k1 — a perfect MXU shape), an elementwise twiddle,
and a per-output-tile combination over the N2 stage-1 rows (stage 2 — N2
scalar*matrix FMAs on the VPU, the tile index m2 IS the kernel's step-tile
grid index).  FLOPs per path drop from 2*s_pad^2 dense MACs to
~4*N2*128^2/s_pad * s_pad + 2*N2*s_pad ~= 4*128*m2 + 2*N2*m2: ~7-8x fewer
at 1825 steps, with the remaining MACs in MXU-native [*, 128] x [128, 128]
form.

The classic four-step transpose is FREE here: the driver noise is iid, so
the kernel simply draws it directly in the transposed (k2-major-row,
k1-lane) layout stage 1 wants — a permutation of an iid array is the same
distribution.  The diagonal phi (and the overall scale) rides the same
layout as a [N2, 128] pattern multiplied before stage 1; the inter-stage
twiddle W_N^{k2 m1} is another [N2, 128] pattern.  Stage 2's W_N2^{k2 m2}
factors reduce (k2*m2) mod N2 exactly, so no large-angle f32 cosine loss.

Same streaming structure as the slab-tiled kernels: grid = (path_blocks,
step_tiles), per-path cumsum carry and first-exercise stop flag across
tiles, [8, LANE] output stripe per path block.  Noise-injection variants
check the math path elementwise on the CPU interpreter against the dense
form (tests/test_pallas_factored.py); the RNG variant price-agrees on
hardware (tests/test_engine.py).
"""

from __future__ import annotations

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.fgn import next_pow2 as _next_pow2
from .pathgen_pallas import LANE, _as_seed_words, _normals, _round_up
from .pathgen_pallas_tiled import (TILE, _VMEM_BUDGET, _accumulate_priced,
                                   _draw_w, _euler_tile,
                                   _finalize_priced_log, _pair_tiles,
                                   _policy_tile, _policy_tile_log,
                                   _seed_tile)

assert TILE == LANE  # stage 2's output tile is one lane group

# Scratch + resident-input budget is SHARED with the slab module: the
# engine's auto kernel selection compares both modules' supports(), so the
# two budgets drifting independently would silently shift the crossover.


def max_factored_steps(block_paths: int = 256,
                       fgn_dtype=jnp.float32,
                       noise_input: bool = False) -> int:
    """Largest n_steps the factored kernels support: the two [block, N2,
    128] f32 stage-1 scratch planes (N2*128 = m2 = next_pow2(n_steps))
    plus fill-group temporaries must fit the VMEM budget.  The
    noise-injection variants (tests; the engine's fused-QMC stream)
    additionally keep their [3, block, m2] f32 input block resident —
    charged here so a build at the production edge fails at validation,
    not inside Mosaic on hardware (same contract as
    pathgen_pallas_tiled.max_tiled_steps)."""
    del fgn_dtype  # scratch is always f32 (bf16 measured slower, below)
    # 2 f32 planes of block*m2 + ~2 MiB headroom for fill temporaries,
    # pipelined out tiles, and Mosaic's own stack.
    per_m2 = (2 + (3 if noise_input else 0)) * 4 * block_paths
    m2_max = (_VMEM_BUDGET - (2 << 20)) // per_m2
    # Largest pow2 <= m2_max (m2 is always a power of two).
    p = 1
    while p * 2 <= m2_max:
        p *= 2
    return p


def supports(n_steps: int, block_paths: int = 256,
             fgn_dtype=jnp.float32, noise_input: bool = False) -> bool:
    """Steps must span >= 2 lane groups (below that the single-tile kernel
    owns the workload) and the stage-1 scratch must fit VMEM."""
    if n_steps <= LANE:
        return False
    return _next_pow2(n_steps) <= max_factored_steps(block_paths, fgn_dtype,
                                                     noise_input)


def _consts(s0, xi, h, eta, rho, r, n_steps: int, dt: float, fgn_dtype):
    """Host-precomputed constant blocks shared by both factored kernels:
    stage-1 DFT matrices, transposed-layout phi pattern, inter-stage
    twiddle, plus the Euler-tile constants of the slab-tiled kernels."""
    del rho  # distributionally inert — see pathgen_pallas._paths_from_noise
    s_pad = _round_up(n_steps, LANE)
    m2 = _next_pow2(n_steps)
    n1, n2 = LANE, m2 // LANE

    # phi exactly as engine._fgn_matrices_host (float64 host precision).
    # The extra 0.5 pre-halves the (linear) factored map — the half-scaled
    # constants contract of pathgen_pallas._paths_from_noise, letting
    # _euler_tile's one exp yield sqrt(v) directly.
    t = np.arange(n_steps + 1, dtype=np.float64) * dt
    lam = 0.5 * t ** (2.0 * h)
    phi = np.conj(np.fft.fft(lam, n=_next_pow2(lam.size)))
    scale = 0.5 * np.sqrt(2.0 * h) * eta / m2
    a_diag = np.zeros(m2, np.complex128)
    a_diag[:n_steps] = phi[:n_steps] * scale

    k1 = np.arange(n1)
    k2 = np.arange(n2)
    # Transposed-layout phi pattern: row k2, lane k1 <-> logical
    # k = N2*k1 + k2 (the layout the driver noise is drawn in).
    phi_t = a_diag[n2 * k1[None, :] + k2[:, None]]           # [n2, n1]
    f1 = np.exp(-2j * np.pi * np.outer(k1, k1) / n1)         # [k1, m1]
    tw = np.exp(-2j * np.pi * np.outer(k2, np.arange(n1)) / m2)  # [k2, m1]

    fd = jnp.dtype(fgn_dtype)
    consts = (
        jnp.asarray(f1.real, fd), jnp.asarray(f1.imag, fd),
        jnp.asarray(phi_t.real, jnp.float32),
        jnp.asarray(phi_t.imag, jnp.float32),
        jnp.asarray(tw.real, jnp.float32),
        jnp.asarray(tw.imag, jnp.float32),
    )
    from .pathgen_pallas import _half_var_drift

    vd_p = _half_var_drift(n_steps, s_pad, xi, h, eta, dt)
    tri = jnp.asarray(np.triu(np.ones((TILE, TILE), np.float32)))
    # bf16 like pathgen_pallas_tiled: {0,1} indicator counts stay exact.
    su = jnp.asarray(np.triu(np.ones((TILE, TILE), np.float32), k=1),
                     jnp.bfloat16)
    kw = dict(n_steps=n_steps, s_pad=s_pad, xi=float(xi), r=float(r),
              dt=float(dt), log_s0=float(math.log(s0)))
    return s_pad, m2, n2, consts, (vd_p, tri, su), kw


def _fill_group(block: int, n2: int) -> int:
    """Paths per stage-1 fill group: ~512 matmul rows per group bounds the
    Box-Muller stack temporaries; must divide block."""
    gp = max(1, 512 // n2)
    while block % gp:
        gp //= 2
    return max(1, gp)


def _stage1(zr3, zi3, f1r_ref, f1i_ref, pr_ref, pi_ref, tr_ref, ti_ref,
            fgn_dtype):
    """(n2, gp, LANE) k2-plane-major noise -> twiddled stage-1 output pair
    in the same layout.

    a = z * phi; S = a @ F1 (contract k1 on the MXU); S' = S * twiddle.
    The [n2, LANE] patterns broadcast along the per-plane path axis.  The
    k2-MAJOR layout matters: each k2's rows form a contiguous [gp, LANE]
    plane, so stage 2's per-k2 reads are tile-aligned slab accesses, not
    strided sublane extractions (measured 4.5x on v5e)."""
    n2, gp = zr3.shape[0], zr3.shape[1]
    rows = gp * n2
    pr = pr_ref[:][:, None, :]
    pi = pi_ref[:][:, None, :]
    ar3 = zr3 * pr - zi3 * pi
    ai3 = zr3 * pi + zi3 * pr
    ar = ar3.reshape(rows, LANE).astype(fgn_dtype)
    ai = ai3.reshape(rows, LANE).astype(fgn_dtype)
    f1r, f1i = f1r_ref[:], f1i_ref[:]
    sr = (jnp.dot(ar, f1r, preferred_element_type=jnp.float32)
          - jnp.dot(ai, f1i, preferred_element_type=jnp.float32))
    si = (jnp.dot(ar, f1i, preferred_element_type=jnp.float32)
          + jnp.dot(ai, f1r, preferred_element_type=jnp.float32))
    sr3 = sr.reshape(zr3.shape)
    si3 = si.reshape(zr3.shape)
    tr = tr_ref[:][:, None, :]
    ti = ti_ref[:][:, None, :]
    return sr3 * tr - si3 * ti, sr3 * ti + si3 * tr


def _fill_stage1(f1r_ref, f1i_ref, pr_ref, pi_ref, tr_ref, ti_ref, sr_ref,
                 si_ref, *, block: int, n2: int, fgn_dtype, noise=None):
    """Run stage 1 + twiddle for the whole path block into the (n2, block,
    LANE) scratch pair, in path groups that bound the VMEM stack.  With
    ``noise`` (injected (n2, block, LANE) planes) the draw is skipped."""
    gp = _fill_group(block, n2)
    for g in range(block // gp):
        sl = slice(g * gp, (g + 1) * gp)   # static python bounds
        if noise is None:
            zr_c, zi_c = _normals((n2 * gp, LANE))
            zr3 = zr_c.reshape(n2, gp, LANE)
            zi3 = zi_c.reshape(n2, gp, LANE)
        else:
            zr3 = noise[0][:, sl, :]
            zi3 = noise[1][:, sl, :]
        spr, spi = _stage1(zr3, zi3, f1r_ref, f1i_ref, pr_ref, pi_ref,
                           tr_ref, ti_ref, fgn_dtype)
        sr_ref[:, sl, :] = spr.astype(sr_ref.dtype)
        si_ref[:, sl, :] = spi.astype(si_ref.dtype)


def _stage2_tile(sr_ref, si_ref, j, *, n2: int, block: int):
    """Output step tile j (= the four-step m2 index) from the twiddled
    stage-1 scratch: X_tile = sum_k2 Re[S'[k2] * W_n2^{k2 j}] — N2
    scalar*slab FMAs over contiguous [block, LANE] k2 planes.
    (k2*j) mod n2 reduces the angle exactly (the factor is n2-periodic),
    so f32 cosine never sees a large argument."""
    x = jnp.zeros((block, LANE), jnp.float32)
    for k2 in range(n2):
        ang = (2.0 * math.pi / n2) * ((k2 * j) % n2).astype(jnp.float32)
        x = x + sr_ref[k2] * jnp.cos(ang) + si_ref[k2] * jnp.sin(ang)
    return x


def _factored_pathgen_kernel(seed_ref, f1r_ref, f1i_ref, pr_ref, pi_ref,
                             tr_ref, ti_ref, vd_ref, tri_ref, out_ref,
                             sr_ref, si_ref, carry_ref, *, block: int,
                             n_tiles: int, n2: int, fgn_dtype,
                             antithetic: bool = False, **kw):
    i, j = pl.program_id(0), pl.program_id(1)
    _seed_tile(seed_ref, i, j, n_tiles)
    rows = block // 2 if antithetic else block

    @pl.when(j == 0)
    def _():
        _fill_stage1(f1r_ref, f1i_ref, pr_ref, pi_ref, tr_ref, ti_ref,
                     sr_ref, si_ref, block=rows, n2=n2,
                     fgn_dtype=fgn_dtype)
        carry_ref[:] = jnp.zeros_like(carry_ref)

    x = _stage2_tile(sr_ref, si_ref, j, n2=n2, block=rows)
    w = _draw_w(rows)
    # The DFT is linear in the noise — BOTH stages are, so the partner's
    # step tile is just -x: one stage-1 fill and one stage-2 combination
    # per pair (the stage scratch holds only the half block).
    x, w = _pair_tiles(x, w, antithetic)
    out_ref[:] = _euler_tile(
        x, w, vd_ref, tri_ref, carry_ref, j, block=block,
        n_steps=kw["n_steps"], xi=kw["xi"], r=kw["r"], dt=kw["dt"],
        log_s0=kw["log_s0"])


def _factored_pathgen_kernel_noise_in(noise_ref, f1r_ref, f1i_ref, pr_ref,
                                      pi_ref, tr_ref, ti_ref, vd_ref,
                                      tri_ref, out_ref, sr_ref, si_ref,
                                      carry_ref, *, block: int,
                                      n_tiles: int, n2: int, fgn_dtype,
                                      antithetic: bool = False, **kw):
    """Noise-injection variant: planes 0/1 are the driver normals in the
    kernel's TRANSPOSED storage order ([rows, m2] with flat column
    c = k2*LANE + k1 <-> logical k = N2*k1 + k2); plane 2 is the price
    Brownian in natural step order (first s_pad columns used).  Under
    ``antithetic`` the planes carry rows = block/2."""
    j = pl.program_id(1)
    rows = block // 2 if antithetic else block

    @pl.when(j == 0)
    def _():
        zr3 = jnp.swapaxes(noise_ref[0].reshape(rows, n2, LANE), 0, 1)
        zi3 = jnp.swapaxes(noise_ref[1].reshape(rows, n2, LANE), 0, 1)
        _fill_stage1(f1r_ref, f1i_ref, pr_ref, pi_ref, tr_ref, ti_ref,
                     sr_ref, si_ref, block=rows, n2=n2,
                     fgn_dtype=fgn_dtype, noise=(zr3, zi3))
        carry_ref[:] = jnp.zeros_like(carry_ref)

    x = _stage2_tile(sr_ref, si_ref, j, n2=n2, block=rows)
    w = noise_ref[2, :, pl.ds(j * TILE, TILE)]
    x, w = _pair_tiles(x, w, antithetic)
    out_ref[:] = _euler_tile(
        x, w, vd_ref, tri_ref, carry_ref, j, block=block,
        n_steps=kw["n_steps"], xi=kw["xi"], r=kw["r"], dt=kw["dt"],
        log_s0=kw["log_s0"])


def _priced_refs(refs, policy_form: str):
    """(policy refs, stage scratch, refs to zero at j == 0) for the two
    factored priced kernels' ref layout (mirrors pathgen_pallas_tiled.
    _priced_refs_layout: the log-boundary form has no strict-upper input
    and carries two extra per-path scratch accumulators, and its out_ref
    is written wholesale at the last tile — no zero-init)."""
    if policy_form == "log_boundary":
        vd_ref, pol_ref, tri_ref, out_ref = refs[:4]
        sr_ref, si_ref = refs[4:6]
        zero_refs = refs[6:]           # carry, stop, lsst, dst
        return (vd_ref, pol_ref, tri_ref, None, out_ref), (sr_ref, si_ref), \
            list(zero_refs)
    vd_ref, pol_ref, tri_ref, su_ref, out_ref = refs[:5]
    sr_ref, si_ref, carry_ref, stop_ref = refs[5:]
    return (vd_ref, pol_ref, tri_ref, su_ref, out_ref), (sr_ref, si_ref), \
        [carry_ref, stop_ref, out_ref]


def _priced_step(x, w, refs, j, *, block: int, n_tiles: int,
                 is_call: bool, strike: float, cv_disc, policy_form: str,
                 **kw):
    """Shared per-tile Euler + policy + store of the factored priced
    kernels (same semantics as pathgen_pallas_tiled._priced_tile_body)."""
    if policy_form == "log_boundary":
        vd_ref, pol_ref, tri_ref, out_ref = refs[:4]
        carry_ref, stop_ref, lsst_ref, dst_ref = refs[6:]
        ls = _euler_tile(x, w, vd_ref, tri_ref, carry_ref, j, block=block,
                         n_steps=kw["n_steps"], xi=kw["xi"], r=kw["r"],
                         dt=kw["dt"], log_s0=kw["log_s0"], return_log=True)
        _policy_tile_log(ls, pol_ref, stop_ref, lsst_ref, dst_ref)

        @pl.when(j == n_tiles - 1)
        def _():
            _finalize_priced_log(out_ref, ls, lsst_ref, dst_ref, cv_disc,
                                 j, n_steps=kw["n_steps"], strike=strike,
                                 is_call=is_call)
    else:
        vd_ref, pol_ref, tri_ref, su_ref, out_ref = refs[:5]
        carry_ref, stop_ref = refs[7], refs[8]
        s = _euler_tile(x, w, vd_ref, tri_ref, carry_ref, j, block=block,
                        n_steps=kw["n_steps"], xi=kw["xi"], r=kw["r"],
                        dt=kw["dt"], log_s0=kw["log_s0"])
        val = _policy_tile(s, pol_ref, su_ref, stop_ref, is_call=is_call,
                           strike=strike)
        _accumulate_priced(out_ref, s, val, cv_disc, j,
                           n_steps=kw["n_steps"])


def _factored_priced_kernel(seed_ref, f1r_ref, f1i_ref, pr_ref, pi_ref,
                            tr_ref, ti_ref, *refs, block: int,
                            n_tiles: int, n2: int, fgn_dtype,
                            is_call: bool, strike: float, cv_disc=None,
                            policy_form: str = "quadratic",
                            antithetic: bool = False, **kw):
    i, j = pl.program_id(0), pl.program_id(1)
    _seed_tile(seed_ref, i, j, n_tiles)
    _, (sr_ref, si_ref), zero_refs = _priced_refs(refs, policy_form)
    rows = block // 2 if antithetic else block

    @pl.when(j == 0)
    def _():
        _fill_stage1(f1r_ref, f1i_ref, pr_ref, pi_ref, tr_ref, ti_ref,
                     sr_ref, si_ref, block=rows, n2=n2,
                     fgn_dtype=fgn_dtype)
        for ref in zero_refs:
            ref[...] = jnp.zeros_like(ref)

    x = _stage2_tile(sr_ref, si_ref, j, n2=n2, block=rows)
    w = _draw_w(rows)
    # Both DFT stages are linear in the noise: one stage-1 fill and one
    # stage-2 combination per pair; the partner's tile is -x.
    x, w = _pair_tiles(x, w, antithetic)
    _priced_step(x, w, refs, j, block=block, n_tiles=n_tiles,
                 is_call=is_call, strike=strike, cv_disc=cv_disc,
                 policy_form=policy_form, **kw)


def _factored_priced_kernel_noise_in(noise_ref, f1r_ref, f1i_ref, pr_ref,
                                     pi_ref, tr_ref, ti_ref, *refs,
                                     block: int, n_tiles: int, n2: int,
                                     fgn_dtype, is_call: bool,
                                     strike: float, cv_disc=None,
                                     policy_form: str = "quadratic",
                                     antithetic: bool = False, **kw):
    j = pl.program_id(1)
    _, (sr_ref, si_ref), zero_refs = _priced_refs(refs, policy_form)
    rows = block // 2 if antithetic else block

    @pl.when(j == 0)
    def _():
        zr3 = jnp.swapaxes(noise_ref[0].reshape(rows, n2, LANE), 0, 1)
        zi3 = jnp.swapaxes(noise_ref[1].reshape(rows, n2, LANE), 0, 1)
        _fill_stage1(f1r_ref, f1i_ref, pr_ref, pi_ref, tr_ref, ti_ref,
                     sr_ref, si_ref, block=rows, n2=n2,
                     fgn_dtype=fgn_dtype, noise=(zr3, zi3))
        for ref in zero_refs:
            ref[...] = jnp.zeros_like(ref)

    x = _stage2_tile(sr_ref, si_ref, j, n2=n2, block=rows)
    w = noise_ref[2, :, pl.ds(j * TILE, TILE)]
    x, w = _pair_tiles(x, w, antithetic)
    _priced_step(x, w, refs, j, block=block, n_tiles=n_tiles,
                 is_call=is_call, strike=strike, cv_disc=cv_disc,
                 policy_form=policy_form, **kw)


def _validate(chunk_paths: int, block_paths: int, n_steps: int, fgn_dtype,
              antithetic: bool = False, noise_input: bool = False):
    if chunk_paths % block_paths:
        raise ValueError("chunk_paths must divide by block_paths")
    if block_paths % 16:
        raise ValueError("block_paths must divide by 16 (sublane-aligned "
                         "Box-Muller halves)")
    if antithetic and block_paths % 32:
        raise ValueError("antithetic needs block_paths % 32 == 0 (half "
                         "the rows are drawn, and the Box-Muller row "
                         "slices must stay sublane-aligned)")
    if not supports(n_steps, block_paths, fgn_dtype, noise_input):
        raise ValueError(
            f"n_steps={n_steps} outside the factored kernel's range at "
            f"block_paths={block_paths} (needs LANE < steps, pow2 bucket "
            f"<= {max_factored_steps(block_paths, fgn_dtype, noise_input)}"
            f"{' with injected noise resident' if noise_input else ''})")


def _common_specs(m2: int, noise_input: bool, block_paths: int,
                  fgn_dtype, noise_rows: int | None = None):
    n1 = LANE
    n2 = m2 // LANE
    # Under antithetic, noise planes and the stage scratch hold only the
    # pair halves (noise_rows = block/2): the stage-2 negation expands
    # them to the full block.
    rows = block_paths if noise_rows is None else noise_rows
    first_spec = (
        pl.BlockSpec((3, rows, m2), lambda i, j: (0, i, 0),
                     memory_space=pltpu.VMEM) if noise_input
        else pl.BlockSpec(memory_space=pltpu.SMEM))
    const_specs = [
        pl.BlockSpec((n1, n1), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),               # F1 real
        pl.BlockSpec((n1, n1), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),               # F1 imag
        pl.BlockSpec((n2, n1), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),               # phi pattern re
        pl.BlockSpec((n2, n1), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),               # phi pattern im
        pl.BlockSpec((n2, n1), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),               # twiddle re
        pl.BlockSpec((n2, n1), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),               # twiddle im
    ]
    # S' scratch stays f32: a bf16 variant was measured SLOWER on v5e at
    # 1e7x1825 (5.53M vs 5.89M paths/s) — the write/read conversions cost
    # more than the halved VMEM traffic saves on this VPU-bound kernel.
    scratch = [
        pltpu.VMEM((n2, rows, n1), jnp.float32),             # S' real
        pltpu.VMEM((n2, rows, n1), jnp.float32),             # S' imag
        pltpu.VMEM((block_paths, LANE), jnp.float32),        # cumsum carry
    ]
    return first_spec, const_specs, scratch


def make_factored_pathgen(s0, xi, h, eta, rho, r, n_steps: int, dt: float,
                          chunk_paths: int, block_paths: int = 256,
                          interpret: bool = False,
                          noise_input: bool = False,
                          fgn_dtype=jnp.float32,
                          antithetic: bool = False):
    """Factored-DFT seed -> [chunk_paths, n_steps + 1] rBergomi generator
    (seed semantics match pathgen_pallas.make_pallas_pathgen).

    antithetic=True fills each block with block_paths/2 (Z, W) / (-Z, -W)
    pairs: BOTH DFT stages are linear in the driver noise, so one stage-1
    fill and one per-tile stage-2 combination serve the pair (the
    partner's tile is -x) — half the Box-Muller draws and half the
    stage-1/stage-2 arithmetic.  Injected noise then carries
    block_paths/2 rows per plane."""
    _validate(chunk_paths, block_paths, n_steps, fgn_dtype, antithetic,
              noise_input)
    noise_rows = block_paths // 2 if antithetic else block_paths
    s_pad, m2, n2, consts, (vd_p, tri, _su), kw = _consts(
        s0, xi, h, eta, rho, r, n_steps, dt, fgn_dtype)
    n_tiles = s_pad // TILE
    grid = (chunk_paths // block_paths, n_tiles)
    body = (_factored_pathgen_kernel_noise_in if noise_input
            else _factored_pathgen_kernel)
    kernel = functools.partial(body, block=block_paths, n_tiles=n_tiles,
                               n2=n2, fgn_dtype=jnp.dtype(fgn_dtype),
                               antithetic=bool(antithetic), **kw)
    first_spec, const_specs, scratch = _common_specs(
        m2, noise_input, block_paths, fgn_dtype, noise_rows)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[first_spec] + const_specs + [
            pl.BlockSpec((1, TILE), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),           # var-drift tile
            pl.BlockSpec((TILE, TILE), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),           # tri (cumsum)
        ],
        out_specs=pl.BlockSpec((block_paths, TILE), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((chunk_paths, s_pad), jnp.float32),
        scratch_shapes=scratch,
        interpret=pltpu.InterpretParams() if interpret else False,
    )

    def gen(seed_or_noise) -> jax.Array:
        first = (seed_or_noise.astype(jnp.float32) if noise_input
                 else _as_seed_words(seed_or_noise))
        s = call(first, *consts, vd_p, tri)
        s0_col = jnp.full((chunk_paths, 1), float(s0), jnp.float32)
        return jnp.concatenate([s0_col, s[:, :n_steps]], axis=-1)

    return gen, s_pad


def make_factored_priced_chunk(s0, xi, h, eta, rho, r, strike, maturity,
                               dt: float, n_steps: int, chunk_paths: int,
                               block_paths: int = 256,
                               is_call: bool = False,
                               interpret: bool = False,
                               noise_input: bool = False,
                               fgn_dtype=jnp.float32,
                               with_cv: bool = False,
                               policy_form: str = "quadratic",
                               antithetic: bool = False):
    """Factored-DFT fully fused streaming unit: (seed, policy table) ->
    chunk payoff sum under the fitted exercise policy (policy-table and
    policy_form semantics match pathgen_pallas.make_pallas_priced_chunk:
    "boundary" consumes log_boundary_rows tables, evaluated in LOG space;
    "quadratic" consumes policy_rows; with_cv adds the martingale-control
    partial sum in lane 1).

    antithetic=True (boundary form only, matching the other priced
    kernels) prices each block as block_paths/2 (Z, W) / (-Z, -W) pairs —
    both DFT stages are linear, so the pair shares one stage-1 fill and
    one stage-2 combination per tile (see make_factored_pathgen).
    Injected noise then carries block_paths/2 rows per plane."""
    if policy_form not in ("quadratic", "boundary"):
        raise ValueError(f"unknown policy_form {policy_form!r}")
    log_boundary = policy_form == "boundary"
    if antithetic and not log_boundary:
        raise ValueError("antithetic requires policy_form='boundary' "
                         "(the log-plane factored body)")
    _validate(chunk_paths, block_paths, n_steps, fgn_dtype, antithetic,
              noise_input)
    noise_rows = block_paths // 2 if antithetic else block_paths
    s_pad, m2, n2, consts, (vd_p, tri, su), kw = _consts(
        s0, xi, h, eta, rho, r, n_steps, dt, fgn_dtype)
    n_tiles = s_pad // TILE
    grid_n = chunk_paths // block_paths
    body = (_factored_priced_kernel_noise_in if noise_input
            else _factored_priced_kernel)
    extra = ({"cv_disc": float(math.exp(-r * n_steps * dt))}
             if with_cv else {})
    kernel = functools.partial(
        body, block=block_paths, n_tiles=n_tiles,
        n2=n2, fgn_dtype=jnp.dtype(fgn_dtype),
        is_call=bool(is_call), strike=float(strike),
        policy_form="log_boundary" if log_boundary else "quadratic",
        antithetic=bool(antithetic), **extra, **kw)
    first_spec, const_specs, scratch = _common_specs(
        m2, noise_input, block_paths, fgn_dtype, noise_rows)
    in_specs = [first_spec] + const_specs + [
        pl.BlockSpec((1, TILE), lambda i, j: (0, j),
                     memory_space=pltpu.VMEM),           # var-drift tile
        pl.BlockSpec((8, TILE), lambda i, j: (0, j),
                     memory_space=pltpu.VMEM),           # policy tile
        pl.BlockSpec((TILE, TILE), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),           # tri (cumsum)
    ]
    if not log_boundary:
        in_specs.append(pl.BlockSpec((TILE, TILE), lambda i, j: (0, 0),
                                     memory_space=pltpu.VMEM))  # strict-up
    extra_scratch = 3 if log_boundary else 1   # stop (+ lsst, dst)
    call = pl.pallas_call(
        kernel,
        grid=(grid_n, n_tiles),
        in_specs=in_specs,
        # One [8, LANE] stripe per path block, revisited across step tiles.
        out_specs=pl.BlockSpec((8, LANE), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid_n * 8, LANE), jnp.float32),
        scratch_shapes=scratch + [
            pltpu.VMEM((block_paths, LANE), jnp.float32),
        ] * extra_scratch,
        interpret=pltpu.InterpretParams() if interpret else False,
    )

    def chunk_sum(seed_or_noise, rows):
        """``rows``: policy_rows output for the quadratic form,
        log_boundary_rows(boundary_rows(...)) for the boundary form."""
        first = (seed_or_noise.astype(jnp.float32) if noise_input
                 else _as_seed_words(seed_or_noise))
        if log_boundary:
            out = call(first, *consts, vd_p, rows, tri)
        else:
            out = call(first, *consts, vd_p, rows, tri, su)
        if with_cv:
            return jnp.sum(out[::8, 0]), jnp.sum(out[::8, 1])
        return jnp.sum(out[::8, 0])

    return chunk_sum, s_pad


# Uniform long-horizon kernel interface (models/engine selects between
# this module and pathgen_pallas_tiled by `supports` + StreamConfig
# .tiled_impl; both expose the same maker names and seed semantics).
make_tiled_pathgen = make_factored_pathgen
make_tiled_priced_chunk = make_factored_priced_chunk


def transposed_to_logical(cols: int) -> np.ndarray:
    """Column permutation mapping the kernel's transposed driver-noise
    storage (flat c = k2*LANE + k1) to logical step-frequency order
    (k = N2*k1 + k2), for the noise-injection tests: given injected plane
    ZT, the logical plane is Z[:, logical_index] = ZT."""
    n2 = cols // LANE
    k1 = np.arange(LANE)
    k2 = np.arange(n2)
    # flat transposed index (k2, k1) -> logical k
    return (n2 * k1[None, :] + k2[:, None]).reshape(-1)
