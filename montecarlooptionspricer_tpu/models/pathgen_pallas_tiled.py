"""Step-tiled Pallas TPU kernels: fused rBergomi paths (+ LSM policy) at
long horizons.

The single-tile kernels (models/pathgen_pallas) hold the three
[s_pad, s_pad] spectral/accumulation matrices entirely in VMEM, which caps
them at ~512 padded steps; the reference's workload reaches 1825 steps
(/root/reference/src/core/PredictionGen.cpp:247-258, :718 — steps =
floor(maturity*252), history capped at 1825 days).  These kernels stream
the step axis instead:

  grid = (path_blocks, step_tiles), step tiles innermost.  Per path block,
  the fGN driver noise (Zr, Zi) is drawn ONCE into VMEM scratch at the
  first step tile; each tile then

    1. pulls a [s_pad, TILE] column slab of the spectral matrices from HBM
       (double-buffered by the Pallas pipeline) and computes the fGN tile
       X[:, tile] = Zr @ Cr[:, tile] - Zi @ Ci[:, tile] on the MXU;
    2. draws the price-Brownian tile in-kernel (one Box-Muller pair per two
       normals) and advances the Euler log-price with a [TILE, TILE]
       triangular matmul plus a running per-path carry — the cross-tile
       cumsum state;
    3. (priced variant) evaluates the LSM exercise policy on the tile,
       with a per-path "already stopped" flag carrying the first-exercise
       semantics across tiles.

HBM traffic per chunk: the spectral slabs (re-read once per path block) and
one float per grid row — the path matrix itself never exists in HBM at ANY
horizon.  The fGN matmul is O(s_pad^2) per path, so past ~1000 steps the
MXU — not the VPU — is the bound; bf16 spectral slabs double that ceiling.

Distribution-identical to the XLA generator; the math path is checked
elementwise against it via noise injection (tests/test_pallas_tiled.py, CPU
interpreter), and the RNG variant price-agrees on hardware
(tests/test_engine.py::test_tiled_streaming_price_matches_xla).
"""

from __future__ import annotations

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pathgen_pallas import (LANE, _as_seed_words, _fold_words, _normals,
                             _round_up, n_planes)

TILE = LANE  # step-tile width; == LANE so the carry/stop scratch ([block,
#              LANE], all lanes equal) broadcasts against tile arrays with
#              no lane slicing.

# Budget for everything the kernel keeps resident in VMEM (scratch + the
# pipelined slabs); the hardware has ~16 MiB/core — leave room for Mosaic's
# own temporaries.
_VMEM_BUDGET = 12 * 1024 * 1024


def max_tiled_steps(block_paths: int = 256, fgn_dtype=jnp.float32,
                    fgn_form: str = "spectral",
                    noise_input: bool = False) -> int:
    """Largest n_steps the tiled kernels support at this block size/dtype:
    driver-noise scratch (2 planes spectral, 1 chol) + double-buffered
    matrix slabs (2 matrices spectral, 1 chol) must fit the VMEM budget.
    The noise-injection test variant additionally keeps its
    [planes, block, s_pad] f32 input block resident — charged here so a
    test build at the production edge fails at validation, not inside
    Mosaic on hardware."""
    item = jnp.dtype(fgn_dtype).itemsize
    n_mats = 1 if fgn_form == "chol" else 2
    per_spad = (n_planes(fgn_form) - 1) * block_paths * item \
        + 2 * n_mats * TILE * item
    if noise_input:
        per_spad += n_planes(fgn_form) * block_paths * 4
    return (_VMEM_BUDGET - (1 << 20)) // per_spad


def supports(n_steps: int, block_paths: int = 256,
             fgn_dtype=jnp.float32, fgn_form: str = "spectral",
             noise_input: bool = False) -> bool:
    return _round_up(n_steps, LANE) <= max_tiled_steps(
        block_paths, fgn_dtype, fgn_form, noise_input=noise_input)


def _consts(s0, xi, h, eta, rho, r, n_steps: int, dt: float, fgn_dtype,
            fgn_form: str = "spectral"):
    """Host-precomputed constant blocks shared by both tiled kernels:
    ([Cr, Ci] spectral / [Lt] chol — see engine._chol_matrix_host), then
    var-drift, cumsum tri, strict-upper."""
    del rho  # distributionally inert — see pathgen_pallas._paths_from_noise
    s_pad = _round_up(n_steps, LANE)
    from .engine import _chol_matrix_host, _fgn_matrices_host

    # Matrices pre-scaled by 0.5 and the half variance drift (ln xi
    # folded in): one exp yields sqrt(v) directly in _euler_tile — see
    # pathgen_pallas._paths_from_noise's half-scaled constants contract.
    if fgn_form == "chol":
        lt = _chol_matrix_host(n_steps, h, eta, dt, jnp.dtype(fgn_dtype))
        mats = (jnp.zeros((s_pad, s_pad), fgn_dtype)
                .at[:n_steps, :n_steps].set(0.5 * lt),)
    elif fgn_form == "spectral":
        cr, ci = _fgn_matrices_host(n_steps, h, eta, dt,
                                    jnp.dtype(fgn_dtype))
        mats = tuple(jnp.zeros((s_pad, s_pad), fgn_dtype)
                     .at[:n_steps, :n_steps].set(0.5 * m) for m in (cr, ci))
    else:
        raise ValueError(f"unknown fgn_form: {fgn_form!r}")
    from .pathgen_pallas import _half_var_drift

    vd_p = _half_var_drift(n_steps, s_pad, xi, h, eta, dt)
    tri = jnp.asarray(np.triu(np.ones((TILE, TILE), np.float32)))
    # {0,1} indicators are exact in bf16 and the accumulation is f32, so
    # the per-tile prior-exercise count matmul runs at the bf16 MXU rate
    # (the single-tile kernel's su is bf16 for the same reason).
    su = jnp.asarray(np.triu(np.ones((TILE, TILE), np.float32), k=1),
                     jnp.bfloat16)
    kw = dict(n_steps=n_steps, s_pad=s_pad, xi=float(xi), r=float(r),
              dt=float(dt), log_s0=float(math.log(s0)))
    return s_pad, (mats, vd_p, tri, su), kw


def _fgn_tile(planes, mat_refs):
    """X[:, tile] from the driver planes: Zr @ Cr - Zi @ Ci (spectral) or
    N @ Lt (chol) column slabs."""
    if len(mat_refs) == 1:
        return jnp.dot(planes[0], mat_refs[0][:],
                       preferred_element_type=jnp.float32)
    return (jnp.dot(planes[0], mat_refs[0][:],
                    preferred_element_type=jnp.float32)
            - jnp.dot(planes[1], mat_refs[1][:],
                      preferred_element_type=jnp.float32))


def _euler_tile(x, w, vd_ref, tri_ref, carry_ref, j, *, block: int,
                n_steps: int, xi: float, r: float, dt: float,
                log_s0: float, return_log: bool = False):
    """One step-tile of the Euler log-recursion.  Returns S for the tile
    (or log S with ``return_log`` — the log-boundary policy path skips
    the per-cell exp) and advances the per-path cumsum carry
    (all-lanes-equal [block, LANE])."""
    del xi  # folded into vd_ref as ln(xi)/2 (half-scaled constants)
    # Half-scaled constants contract (pathgen_pallas._paths_from_noise):
    # x and vd arrive pre-halved with ln(xi)/2 folded in, so one exp is
    # sqrt(v) — no sqrt / max(v, 0) per cell.
    sv = jnp.exp(x + vd_ref[:])
    v = sv * sv
    inc = (r - 0.5 * v) * dt + sv * (w * math.sqrt(dt))
    # Mask the padded step columns (vd/C pads are zero, which still leaves
    # inc = (r - 1/2) dt + noise there).
    col = jax.lax.broadcasted_iota(jnp.int32, (block, TILE), 1) + j * TILE
    inc = jnp.where(col < n_steps, inc, 0.0)
    local = jnp.dot(inc, tri_ref[:], preferred_element_type=jnp.float32)
    ls = log_s0 + carry_ref[:] + local
    carry_ref[:] = carry_ref[:] + jnp.sum(inc, axis=1, keepdims=True)
    return ls if return_log else jnp.exp(ls)


def _policy_tile(s, pol_ref, su_ref, stop_ref, *, is_call: bool,
                 strike: float):
    """Tile slice of pathgen_pallas._policy_value with the first-exercise
    state carried across tiles in ``stop_ref``.  Returns the tile's payoff
    contribution (scalar)."""
    c0, c1, c2 = pol_ref[0, :], pol_ref[1, :], pol_ref[2, :]
    mu, sd = pol_ref[3, :], pol_ref[4, :]
    eps, disc = pol_ref[5, :], pol_ref[6, :]
    p = jnp.maximum(s - strike, 0.0) if is_call else jnp.maximum(
        strike - s, 0.0)
    z = (s - mu) / sd
    cont = (c2 * z + c1) * z + c0
    exf = ((p > eps) & (p >= cont)).astype(jnp.float32)
    prior = jnp.dot(exf.astype(su_ref.dtype), su_ref[:],
                    preferred_element_type=jnp.float32)
    first = exf * (prior == 0.0) * (stop_ref[:] == 0.0)
    stop_ref[:] = jnp.maximum(stop_ref[:],
                              jnp.max(exf, axis=1, keepdims=True))
    return jnp.sum(first * p * disc)


def _policy_tile_log(ls, pol_ref, stop_ref, lsst_ref, dst_ref):
    """Tile slice of the LOG-space boundary policy (pathgen_pallas.
    _policy_value_log_boundary) with cross-tile first-exercise state:
    ``stop_ref`` marks paths already exercised in an earlier tile;
    ``lsst_ref`` / ``dst_ref`` accumulate the stop step's log price and
    discount (each path contributes at most once — the one-hot in-tile
    min-index AND the not-yet-stopped mask), finalized to a value by
    _finalize_priced_log at the last tile.  Policy tiles are
    log_boundary_rows slices: row 0 = log lo, row 1 = log hi, row 2 =
    discount."""
    llo, lhi, disc = pol_ref[0, :], pol_ref[1, :], pol_ref[2, :]
    exf = (ls >= llo) & (ls <= lhi)
    col = jax.lax.broadcasted_iota(jnp.int32, ls.shape, 1)
    big = jnp.int32(1 << 30)
    idx = jnp.min(jnp.where(exf, col, big), axis=1, keepdims=True)
    first = (col == idx) & (stop_ref[:] == 0.0)
    lsst_ref[:] = lsst_ref[:] + jnp.sum(jnp.where(first, ls, 0.0), axis=1,
                                        keepdims=True)
    dst_ref[:] = dst_ref[:] + jnp.sum(jnp.where(first, disc, 0.0), axis=1,
                                      keepdims=True)
    stop_ref[:] = jnp.maximum(
        stop_ref[:], jnp.max(exf.astype(jnp.float32), axis=1,
                             keepdims=True))


def _finalize_priced_log(out_ref, ls, lsst_ref, dst_ref, cv_disc, j, *,
                         n_steps: int, strike: float, is_call: bool):
    """Last-tile epilogue of the log-boundary priced kernels: ONE exp per
    path at the accumulated stop step (never-exercising paths reduce to
    lsst = dst = 0, so their term is 0 exactly), written into lane 0 of
    the [8, LANE] output stripe; with cv_disc, the martingale-control
    sum (terminal log price, one more exp per path) into lane 1.  The
    scratch planes are all-lanes-equal, so the full-plane sum counts
    each path LANE times — hence the 1/LANE."""
    sstop = jnp.exp(lsst_ref[:])
    p = (sstop - strike) if is_call else (strike - sstop)
    val = jnp.sum(dst_ref[:] * jnp.maximum(p, 0.0)) * (1.0 / LANE)
    if cv_disc is None:
        out_ref[...] = jnp.full(out_ref.shape, val, jnp.float32)
        return
    col = jax.lax.broadcasted_iota(jnp.int32, ls.shape, 1) + j * TILE
    lst = jnp.sum(jnp.where(col == n_steps - 1, ls, 0.0), axis=1,
                  keepdims=True)
    cv = cv_disc * jnp.sum(jnp.exp(lst))
    lane = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 1)
    out_ref[...] = (jnp.where(lane == 0, val, 0.0)
                    + jnp.where(lane == 1, cv, 0.0))


def _draw_w(block: int):
    """One price-Brownian tile [block, TILE]: one Box-Muller pair per two
    normals (block % 16 == 0 keeps the halves sublane-aligned)."""
    n1, n2 = _normals((block // 2, TILE))
    return jnp.concatenate([n1, n2], axis=0)


def _fill_driver_noise(plane_refs, block: int, n_tiles: int, fgn_dtype):
    """Draw the fGN driver plane(s) into scratch one TILE-wide column chunk
    at a time: a single full-plane Box-Muller materializes ~7 [block, s_pad]
    f32 temporaries on the kernel's VMEM stack (measured 30 MB at block 512
    x 1920 lanes — an OOM); chunking bounds the stack at [block, TILE].
    Spectral: (Zr, Zi), one pair per column chunk.  Chol: one plane N,
    each pair filling two column chunks (half the draws)."""
    if len(plane_refs) == 1:
        (n_ref,) = plane_refs
        for c in range(0, n_tiles, 2):
            n1, n2 = _normals((block, TILE))
            n_ref[:, c * TILE:(c + 1) * TILE] = n1.astype(fgn_dtype)
            if c + 1 < n_tiles:
                n_ref[:, (c + 1) * TILE:(c + 2) * TILE] = n2.astype(
                    fgn_dtype)
        return
    zr_ref, zi_ref = plane_refs
    for c in range(n_tiles):
        zr_c, zi_c = _normals((block, TILE))
        zr_ref[:, c * TILE:(c + 1) * TILE] = zr_c.astype(fgn_dtype)
        zi_ref[:, c * TILE:(c + 1) * TILE] = zi_c.astype(fgn_dtype)


def _seed_tile(seed_ref, i, j, n_tiles: int):
    # Distinct stream per (path block, step tile); the full-entropy carrier
    # words are mixed exactly as in the single-tile kernels.
    pltpu.prng_seed(_fold_words(seed_ref[0], seed_ref[1]), i * n_tiles + j)


def _tiled_pathgen_kernel(seed_ref, *refs, block: int, n_tiles: int,
                          fgn_dtype, fgn_form: str = "spectral",
                          antithetic: bool = False, **kw):
    nm = 1 if fgn_form == "chol" else 2
    mats = refs[:nm]
    vd_ref, tri_ref, out_ref = refs[nm:nm + 3]
    plane_refs, carry_ref = refs[nm + 3:-1], refs[-1]
    i, j = pl.program_id(0), pl.program_id(1)
    _seed_tile(seed_ref, i, j, n_tiles)
    rows = block // 2 if antithetic else block

    @pl.when(j == 0)
    def _():
        _fill_driver_noise(plane_refs, rows, n_tiles, fgn_dtype)
        carry_ref[:] = jnp.zeros_like(carry_ref)

    x = _fgn_tile([p[:] for p in plane_refs], mats)
    w = _draw_w(rows)
    x, w = _pair_tiles(x, w, antithetic)
    out_ref[:] = _euler_tile(
        x, w, vd_ref, tri_ref, carry_ref, j, block=block,
        n_steps=kw["n_steps"], xi=kw["xi"], r=kw["r"], dt=kw["dt"],
        log_s0=kw["log_s0"])


def _tiled_pathgen_kernel_noise_in(noise_ref, *refs, block: int,
                                   n_tiles: int, fgn_dtype,
                                   fgn_form: str = "spectral",
                                   antithetic: bool = False, **kw):
    """Noise-injection variant (full-width planes Zr/Zi/W, or N/W chol):
    CPU-interpretable elementwise check of the tiled math path.  Under
    ``antithetic`` the planes carry block/2 rows."""
    nm = 1 if fgn_form == "chol" else 2
    mats = refs[:nm]
    vd_ref, tri_ref, out_ref = refs[nm:nm + 3]
    plane_refs, carry_ref = refs[nm + 3:-1], refs[-1]
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        for p, ref in enumerate(plane_refs):
            ref[:] = noise_ref[p].astype(fgn_dtype)
        carry_ref[:] = jnp.zeros_like(carry_ref)

    x = _fgn_tile([p[:] for p in plane_refs], mats)
    w = noise_ref[nm, :, pl.ds(j * TILE, TILE)]
    x, w = _pair_tiles(x, w, antithetic)
    out_ref[:] = _euler_tile(
        x, w, vd_ref, tri_ref, carry_ref, j, block=block,
        n_steps=kw["n_steps"], xi=kw["xi"], r=kw["r"], dt=kw["dt"],
        log_s0=kw["log_s0"])


def _accumulate_priced(out_ref, s, val, cv_disc, j, *, n_steps: int):
    """Accumulate the tile's policy value into lane 0 of the [8, LANE]
    output stripe — and, with cv_disc set, the martingale-control
    contribution cv_disc * sum(S at the terminal step) into lane 1 (only
    the tile containing global column n_steps - 1 contributes; the masked
    sum is zero elsewhere).  Mirrors pathgen_pallas._store_priced."""
    if cv_disc is None:
        out_ref[...] = out_ref[...] + val
        return
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * TILE
    cv = cv_disc * jnp.sum(jnp.where(col == n_steps - 1, s, 0.0))
    lane = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 1)
    out_ref[...] = (out_ref[...] + jnp.where(lane == 0, val, 0.0)
                    + jnp.where(lane == 1, cv, 0.0))


def _priced_tile_body(x, w, refs, nm, j, *, block: int, n_tiles: int,
                      is_call: bool, strike: float, cv_disc,
                      policy_form: str, **kw):
    """Shared per-tile policy/store step of the tiled priced kernels (the
    two kernel bodies differ only in where noise comes from).  Returns
    the ref-layout metadata needed by the j == 0 initializer: (plane_refs,
    zero_refs) — for the log-boundary form out_ref is written wholesale
    at the last tile, so it needs no zero-init."""
    if policy_form == "log_boundary":
        vd_ref, pol_ref, tri_ref, out_ref = refs[nm:nm + 4]
        carry_ref, stop_ref, lsst_ref, dst_ref = refs[-4:]
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
        vd_ref, pol_ref, tri_ref, su_ref, out_ref = refs[nm:nm + 5]
        carry_ref, stop_ref = refs[-2], refs[-1]
        s = _euler_tile(x, w, vd_ref, tri_ref, carry_ref, j, block=block,
                        n_steps=kw["n_steps"], xi=kw["xi"], r=kw["r"],
                        dt=kw["dt"], log_s0=kw["log_s0"])
        val = _policy_tile(s, pol_ref, su_ref, stop_ref, is_call=is_call,
                           strike=strike)
        _accumulate_priced(out_ref, s, val, cv_disc, j,
                           n_steps=kw["n_steps"])


def _priced_refs_layout(refs, nm, policy_form: str):
    """(plane_refs, refs to zero at j == 0) for the given ref layout."""
    if policy_form == "log_boundary":
        out_ref = refs[nm + 3]
        plane_refs = refs[nm + 4:-4]
        zero_refs = refs[-4:]          # carry, stop, lsst, dst
        del out_ref  # written wholesale at the last tile
        return plane_refs, list(zero_refs)
    out_ref = refs[nm + 4]
    plane_refs = refs[nm + 5:-2]
    return plane_refs, [refs[-2], refs[-1], out_ref]


def _pair_tiles(x, w, antithetic: bool):
    """Antithetic stacking of a step tile: the fGN map is LINEAR in the
    driver noise (pathgen_pallas._fgn_x), so the partner's tile is -x —
    the [rows, s_pad] x [s_pad, TILE] matmul AND the driver Box-Muller
    draws run once per pair; members ride the block halves through the
    shared nonlinear stage (their carry/stop/lsst/dst state rows are
    disjoint, so cross-tile semantics are untouched)."""
    if not antithetic:
        return x, w
    return (jnp.concatenate([x, -x], axis=0),
            jnp.concatenate([w, -w], axis=0))


def _tiled_priced_kernel(seed_ref, *refs, block: int, n_tiles: int,
                         fgn_dtype, is_call: bool, strike: float,
                         cv_disc=None, fgn_form: str = "spectral",
                         policy_form: str = "quadratic",
                         antithetic: bool = False, **kw):
    nm = 1 if fgn_form == "chol" else 2
    mats = refs[:nm]
    plane_refs, zero_refs = _priced_refs_layout(refs, nm, policy_form)
    i, j = pl.program_id(0), pl.program_id(1)
    _seed_tile(seed_ref, i, j, n_tiles)
    rows = block // 2 if antithetic else block

    @pl.when(j == 0)
    def _():
        _fill_driver_noise(plane_refs, rows, n_tiles, fgn_dtype)
        for ref in zero_refs:
            ref[...] = jnp.zeros_like(ref)

    x = _fgn_tile([p[:] for p in plane_refs], mats)
    w = _draw_w(rows)
    x, w = _pair_tiles(x, w, antithetic)
    _priced_tile_body(x, w, refs, nm, j, block=block, n_tiles=n_tiles,
                      is_call=is_call, strike=strike, cv_disc=cv_disc,
                      policy_form=policy_form, **kw)


def _tiled_priced_kernel_noise_in(noise_ref, *refs, block: int,
                                  n_tiles: int, fgn_dtype, is_call: bool,
                                  strike: float, cv_disc=None,
                                  fgn_form: str = "spectral",
                                  policy_form: str = "quadratic",
                                  antithetic: bool = False, **kw):
    nm = 1 if fgn_form == "chol" else 2
    mats = refs[:nm]
    plane_refs, zero_refs = _priced_refs_layout(refs, nm, policy_form)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        for p, ref in enumerate(plane_refs):
            ref[:] = noise_ref[p].astype(fgn_dtype)
        for ref in zero_refs:
            ref[...] = jnp.zeros_like(ref)

    x = _fgn_tile([p[:] for p in plane_refs], mats)
    w = noise_ref[nm, :, pl.ds(j * TILE, TILE)]
    x, w = _pair_tiles(x, w, antithetic)
    _priced_tile_body(x, w, refs, nm, j, block=block, n_tiles=n_tiles,
                      is_call=is_call, strike=strike, cv_disc=cv_disc,
                      policy_form=policy_form, **kw)


def _validate(chunk_paths: int, block_paths: int, n_steps: int,
              noise_input: bool, fgn_dtype, fgn_form: str = "spectral"):
    if chunk_paths % block_paths:
        raise ValueError("chunk_paths must divide by block_paths")
    if block_paths % 16:
        raise ValueError("block_paths must divide by 16 (sublane-aligned "
                         "Box-Muller halves)")
    limit = max_tiled_steps(block_paths, fgn_dtype, fgn_form, noise_input)
    if _round_up(n_steps, LANE) > limit:
        raise ValueError(
            f"n_steps={n_steps} exceeds the tiled kernel's VMEM budget at "
            f"block_paths={block_paths} (max {limit}"
            f"{' with injected noise resident' if noise_input else ''}); "
            "lower block_paths, use bf16 spectral slabs, or the XLA "
            "generator")


def make_tiled_pathgen(s0, xi, h, eta, rho, r, n_steps: int, dt: float,
                       chunk_paths: int, block_paths: int = 256,
                       interpret: bool = False, noise_input: bool = False,
                       fgn_dtype=jnp.float32, fgn_form: str = "spectral",
                       antithetic: bool = False):
    """Step-tiled seed -> [chunk_paths, n_steps + 1] rBergomi generator for
    horizons past the single-tile kernel's VMEM cap (seed semantics match
    pathgen_pallas.make_pallas_pathgen).

    antithetic=True fills each block with block_paths/2 (N, W) / (-N, -W)
    pairs (rows i and i + block/2 are partners): half the driver draws AND
    half the O(s_pad^2)-per-path fGN matmul (the partner's tile is -x,
    _pair_tiles), exactly the priced kernel's pairing — this is what lets
    whole-path consumers (the duality-bounds stream) pair at long
    horizons.  Injected noise then carries block_paths/2 rows."""
    if antithetic and block_paths % 32:
        raise ValueError("antithetic needs block_paths % 32 == 0 (half "
                         "the rows are drawn, and the Box-Muller row "
                         "slices must stay sublane-aligned)")
    _validate(chunk_paths, block_paths, n_steps, noise_input, fgn_dtype,
              fgn_form)
    noise_rows = block_paths // 2 if antithetic else block_paths
    s_pad, (mats, vd_p, tri, _su), kw = _consts(
        s0, xi, h, eta, rho, r, n_steps, dt, fgn_dtype, fgn_form)
    n_tiles = s_pad // TILE
    planes = n_planes(fgn_form)
    grid = (chunk_paths // block_paths, n_tiles)
    body = (_tiled_pathgen_kernel_noise_in if noise_input
            else _tiled_pathgen_kernel)
    kernel = functools.partial(body, block=block_paths, n_tiles=n_tiles,
                               fgn_dtype=jnp.dtype(fgn_dtype),
                               fgn_form=fgn_form,
                               antithetic=bool(antithetic), **kw)
    first_spec = (
        pl.BlockSpec((planes, noise_rows, s_pad), lambda i, j: (0, i, 0),
                     memory_space=pltpu.VMEM) if noise_input
        else pl.BlockSpec(memory_space=pltpu.SMEM))
    mat_specs = [pl.BlockSpec((s_pad, TILE), lambda i, j: (0, j),
                              memory_space=pltpu.VMEM) for _ in mats]
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            first_spec,
            *mat_specs,                                     # Cr/Ci|Lt slabs
            pl.BlockSpec((1, TILE), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),          # var-drift tile
            pl.BlockSpec((TILE, TILE), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),          # tri (cumsum)
        ],
        out_specs=pl.BlockSpec((block_paths, TILE), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((chunk_paths, s_pad), jnp.float32),
        scratch_shapes=[
            *([pltpu.VMEM((noise_rows, s_pad), jnp.dtype(fgn_dtype))]
              * (planes - 1)),                 # driver noise (rows/pair
            #                                    halved under antithetic)
            pltpu.VMEM((block_paths, LANE), jnp.float32),            # carry
        ],
        interpret=pltpu.InterpretParams() if interpret else False,
    )

    def gen(seed_or_noise) -> jax.Array:
        first = (seed_or_noise.astype(jnp.float32) if noise_input
                 else _as_seed_words(seed_or_noise))
        s = call(first, *mats, vd_p, tri)
        s0_col = jnp.full((chunk_paths, 1), float(s0), jnp.float32)
        return jnp.concatenate([s0_col, s[:, :n_steps]], axis=-1)

    return gen, s_pad


def make_tiled_priced_chunk(s0, xi, h, eta, rho, r, strike, maturity,
                            dt: float, n_steps: int, chunk_paths: int,
                            block_paths: int = 256, is_call: bool = False,
                            interpret: bool = False,
                            noise_input: bool = False,
                            fgn_dtype=jnp.float32,
                            with_cv: bool = False,
                            fgn_form: str = "spectral",
                            policy_form: str = "quadratic",
                            antithetic: bool = False):
    """Step-tiled fully fused streaming unit: (seed, policy table) ->
    chunk payoff sum under the fitted exercise policy, at ANY horizon the
    VMEM noise scratch allows (policy-table and policy_form semantics
    match pathgen_pallas.make_pallas_priced_chunk: "boundary" consumes
    log_boundary_rows tables and evaluates in LOG space — no per-cell
    exp, no strict-upper matrix; "quadratic" consumes policy_rows).

    antithetic=True (boundary form only) prices each block as
    block_paths/2 pairs (N, W) / (-N, -W): at long horizons this halves
    BOTH measured bounds at once — the driver Box-Muller draws (the VPU
    transcendental bound) and the O(s_pad^2)-per-path fGN matmul (the
    MXU bound), since the partner's fGN tile is just -x (_pair_tiles).
    Injected noise then carries block_paths/2 rows per plane."""
    if policy_form not in ("quadratic", "boundary"):
        raise ValueError(f"unknown policy_form {policy_form!r}")
    log_boundary = policy_form == "boundary"
    if antithetic and not log_boundary:
        raise ValueError("antithetic requires policy_form='boundary' "
                         "(the log-plane tiled body)")
    if antithetic and block_paths % 32:
        raise ValueError("antithetic needs block_paths % 32 == 0 (half "
                         "the rows are drawn, and the Box-Muller row "
                         "slices must stay sublane-aligned)")
    _validate(chunk_paths, block_paths, n_steps, noise_input, fgn_dtype,
              fgn_form)
    noise_rows = block_paths // 2 if antithetic else block_paths
    s_pad, (mats, vd_p, tri, su), kw = _consts(
        s0, xi, h, eta, rho, r, n_steps, dt, fgn_dtype, fgn_form)
    n_tiles = s_pad // TILE
    planes = n_planes(fgn_form)
    grid_n = chunk_paths // block_paths
    body = (_tiled_priced_kernel_noise_in if noise_input
            else _tiled_priced_kernel)
    extra = ({"cv_disc": float(math.exp(-r * n_steps * dt))}
             if with_cv else {})
    kernel = functools.partial(
        body, block=block_paths, n_tiles=n_tiles,
        fgn_dtype=jnp.dtype(fgn_dtype),
        is_call=bool(is_call), strike=float(strike), fgn_form=fgn_form,
        policy_form="log_boundary" if log_boundary else "quadratic",
        antithetic=bool(antithetic), **extra, **kw)
    first_spec = (
        pl.BlockSpec((planes, noise_rows, s_pad), lambda i, j: (0, i, 0),
                     memory_space=pltpu.VMEM) if noise_input
        else pl.BlockSpec(memory_space=pltpu.SMEM))
    mat_specs = [pl.BlockSpec((s_pad, TILE), lambda i, j: (0, j),
                              memory_space=pltpu.VMEM) for _ in mats]
    in_specs = [
        first_spec,
        *mat_specs,                                     # Cr/Ci|Lt slabs
        pl.BlockSpec((1, TILE), lambda i, j: (0, j),
                     memory_space=pltpu.VMEM),          # var-drift tile
        pl.BlockSpec((8, TILE), lambda i, j: (0, j),
                     memory_space=pltpu.VMEM),          # policy tile
        pl.BlockSpec((TILE, TILE), lambda i, j: (0, 0),
                     memory_space=pltpu.VMEM),          # tri (cumsum)
    ]
    consts = [*mats, vd_p]
    if not log_boundary:
        in_specs.append(pl.BlockSpec((TILE, TILE), lambda i, j: (0, 0),
                                     memory_space=pltpu.VMEM))  # strict-up
    # The log form's first-exercise comes from a min-index reduction (no
    # strict-upper matrix); it instead carries two extra per-path scratch
    # accumulators (stop log price / discount).
    extra_scratch = 2 if log_boundary else 0
    call = pl.pallas_call(
        kernel,
        grid=(grid_n, n_tiles),
        in_specs=in_specs,
        # One [8, LANE] stripe per path block, revisited across step tiles
        # (index_map ignores j, so the block stays in VMEM until i changes).
        out_specs=pl.BlockSpec((8, LANE), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid_n * 8, LANE), jnp.float32),
        scratch_shapes=[
            *([pltpu.VMEM((noise_rows, s_pad), jnp.dtype(fgn_dtype))]
              * (planes - 1)),                 # driver noise (rows/pair
            #                                    halved under antithetic)
            pltpu.VMEM((block_paths, LANE), jnp.float32),            # carry
            pltpu.VMEM((block_paths, LANE), jnp.float32),            # stop
            *([pltpu.VMEM((block_paths, LANE), jnp.float32)]
              * extra_scratch),                             # lsst, dst
        ],
        interpret=pltpu.InterpretParams() if interpret else False,
    )

    def chunk_sum(seed_or_noise, rows):
        """``rows``: policy_rows output for the quadratic form,
        log_boundary_rows(boundary_rows(...)) for the boundary form."""
        first = (seed_or_noise.astype(jnp.float32) if noise_input
                 else _as_seed_words(seed_or_noise))
        if log_boundary:
            out = call(first, *consts, rows, tri)
        else:
            out = call(first, *consts, rows, tri, su)
        if with_cv:
            return jnp.sum(out[::8, 0]), jnp.sum(out[::8, 1])
        return jnp.sum(out[::8, 0])

    return chunk_sum, s_pad
