"""Large-scale pricing engine: fit-then-stream LSM at 1e7-1e8+ paths.

The reference holds its whole [250 x steps] path matrix in memory per row
(PredictionGen.cpp:736-737); at the rebuild's target scale (1e8 paths x 365
steps, BASELINE.md north star) the path matrix would be ~150 GB — far past
HBM.  The TPU-native design never materializes it:

  phase 1 (pilot):  generate a pilot block that fits comfortably in HBM,
                    run the in-memory LSM backward induction, keep the
                    per-step regression fits (models/lsm.lsm_fit);
  phase 2 (stream): re-generate paths chunk by chunk from counter-based
                    keys and apply the fitted exercise *policy* forward —
                    stop at the first in-the-money step whose immediate
                    payoff beats the fitted continuation — accumulating
                    only the discounted-payoff sum.  O(chunk) memory at any
                    path count, and chunks shard trivially across a mesh.

The streamed estimate is the standard fit-on-pilot LSM lower-bound
estimator (policy fixed before evaluation, no foresight bias); the
reference-parity estimator (value-carrying backward induction,
LSMPricer.cpp:69-85) remains available at matched path counts via
models/lsm.lsm_price.

The hot path generator uses the MXU form of the fGN synthesis
(ops.fgn.fgn_matrices): two [chunk, steps] x [steps, steps] matmuls replace
the reference's 3 FFTs per path (RoughVolatility.cpp:346-348), keeping the
FLOPs on the systolic array.
"""

from __future__ import annotations

import dataclasses
import functools
import logging
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.payoff import payoff
from ..ops.regression import PolyFit, eval_poly, fit_poly_masked
from ..ops.timegrid import step_mask
from .lsm import ITM_EPS, lsm_fit


@dataclasses.dataclass(frozen=True)
class StreamConfig:
    n_paths: int
    n_steps: int
    chunk_paths: int = 1 << 16
    pilot_paths: int = 1 << 14
    dt: float = 1.0 / 252.0
    poly_order: int = 2
    dtype: str = "float32"     # path dtype; fGN matmul inputs may be bf16
    fgn_matmul_dtype: str = "float32"
    # RNG: "threefry" is the cross-platform counter-based default;
    # "rbg" uses XLA's rng_bit_generator (hardware-accelerated on TPU,
    # several x faster, still deterministic per backend).
    rng_impl: str = "threefry"
    # Log-price accumulation: "cumsum" (XLA associative scan, VPU) or
    # "matmul" (product with an upper-triangular ones matrix — runs on the
    # MXU, measured ~1.5x faster end-to-end on v5e at 365 steps).
    cumsum_impl: str = "cumsum"
    # fGN synthesis inside the XLA generator: "matmul" (MXU, O(steps^2) per
    # path), "fft" (batched spectral form, O(steps log steps) per path), or
    # "auto" (= matmul).  Measured v5e, 1e6x1825 streamed LSM: matmul 2.97M
    # paths/s vs fft 1.64M — despite ~25x fewer FLOPs, XLA's TPU FFT is
    # VPU/transpose-bound and loses to the systolic array; on CPU the two
    # are within ~15%.  "fft" stays available for memory-constrained cases
    # (no [steps, steps] constants resident).  Ignored by Pallas kernels.
    fgn_impl: str = "auto"
    # fGN linear-map factorization inside the FUSED Pallas kernels:
    # "spectral" — the reference-shaped two-matrix map Zr @ Cr - Zi @ Ci;
    # "chol" — the Cholesky factor of the SAME covariance (identical
    # Gaussian law, engine._chol_matrix_host): one normal plane instead of
    # two (33% fewer Box-Muller draws — the kernel's measured VPU bound)
    # and one [s, s] matmul instead of two; "auto" — measured winner
    # (chol).  The XLA generator and the factored-DFT long-horizon kernel
    # keep the spectral form (the DFT's frequency-domain structure has no
    # Cholesky analogue); the slab tiled kernel honors both.  An EXPLICIT
    # "chol" that resolves to the factored kernel errors rather than
    # silently benchmarking the wrong map.
    fgn_form: str = "auto"
    # Path generator: "xla" (portable, counter-based keys) or "pallas"
    # (fused TPU kernel, in-kernel hardware PRNG — noise planes never touch
    # HBM; fastest measured form, TPU only).  Distribution-equivalent,
    # different RNG streams.
    pathgen_impl: str = "xla"
    # Long-horizon fused-kernel algorithm (past the single-tile VMEM cap):
    # "factored" — four-step Cooley-Tukey DFT on the MXU, O(m2 * 128)
    # MACs/path (pathgen_pallas_factored; ~7x fewer FLOPs at 1825 steps);
    # "slab" — dense [s_pad, s_pad] spectral matmul streamed as column
    # slabs (pathgen_pallas_tiled); "auto" — factored where supported,
    # slab otherwise.
    tiled_impl: str = "auto"
    # Grid block height for the Pallas kernels.  At 365 steps on v5e the
    # fused kernel measures 36.3M paths/s at 512 vs 32.7M at 256 (fewer
    # grid launches, better VPU occupancy); 768+ exceeds the 16M scoped
    # VMEM limit (768 needs 17.7M).  256 stays the
    # default because 512's VMEM headroom at the single-tile kernel's upper
    # step range (~512 steps) is untested; bench.py runs 512.
    pallas_block_paths: int = 256
    # With pathgen_impl="pallas" and poly_order=2, fuse the LSM policy
    # evaluation into the kernel too: each grid block emits one partial
    # payoff sum and path data never leaves VMEM.
    fuse_policy: bool = True
    # Randomized QMC for the price Brownian: scrambled Sobol + per-chunk
    # digital shift + Brownian PCA (see make_chunk_pathgen).  With
    # pathgen_impl="pallas" at single-tile horizons the Sobol planes are
    # built in XLA per chunk and fed through the fused kernels'
    # noise_input entries (_make_fused_qmc_noise), so the variance win
    # composes with fused-kernel throughput; elsewhere (long horizons,
    # bucketed/serving chains — the fused kernels bake their step count)
    # QMC rides the XLA generator.  Measured 1-4.5x stderr reduction per
    # path by workload (VERIFY_r03 §28) — the advantage tracks how much
    # payoff variance the PCA'd Brownian carries.
    qmc: bool = False
    # Extend the Sobol set to the fGN planes too (3*n_steps dims, the
    # generate_paths_qmc layout): the right choice on high-vol-of-vol
    # markets where the variance rides the fGN, at 3x the base-set
    # footprint.  Requires qmc=True.
    qmc_fgn: bool = False
    # Leading Sobol dimensions per noise plane (truncated-PCA QMC): the
    # price Brownian's first qmc_dim PCA components (eigen-ordered, so
    # they carry almost all exploitable variance) ride the Sobol set and
    # the tail is PRNG-filled; qmc_fgn planes truncate identically.
    # Bounds the [chunk, dim] uint32 Sobol base a compiled program
    # carries: the FULL 1825-step set at chunk 2^16 is ~0.5 GB and
    # exceeds the axon tunnel's remote-compile limit (VERIFY_r05 §3).
    # Horizons <= qmc_dim are exact (no truncation).
    qmc_dim: int = 256
    # Martingale control variate: corrects the streamed estimate with
    # beta * (mean e^{-rT} S_T - s0), beta fitted on the pilot block.
    # Unbiased (the control's mean is exactly s0 under this model) with
    # ~2-4x lower variance for near-the-money contracts.  Rides the fused
    # kernel (which emits the control sum alongside the payoff sum) at
    # single-tile step counts; elsewhere the generic path stream.
    control_variate: bool = False
    # Chain-kernel exercise-policy representation (fused K-strike kernel
    # only): "boundary" — the fitted quadratic's decision is precomputed
    # into per-(step,strike) exercise boundaries at table-build time
    # (pathgen_pallas.boundary_rows), collapsing the in-kernel test to
    # one compare per cell (~2.5x fewer VPU op-slots per strike — the
    # measured per-strike floor, VERIFY_r02 section 1c); "quadratic" —
    # evaluate the quadratic per cell (lsm_policy_value's exact f32
    # decision semantics).  The boundary decisions differ only within
    # f32 rounding of the root and for pathological non-ITM-anchored
    # fits (clipped; second-order value impact — see boundary_rows).
    chain_policy_form: str = "boundary"
    # Chain-kernel strike-group sweep: "grid" — one pallas_call with a
    # (path blocks, strike groups) grid; the path block is generated
    # once into VMEM scratch and re-swept by every group's tables, so a
    # K-strike strip pays generation once per block
    # (pathgen_pallas._chain_kernel_grid); "regen" — one fused pass per
    # ceil(K/10) group, each regenerating the block from the shared
    # seed.  "auto" = regen: grid measured WORSE on v5e (K=50 price
    # 2.09 s vs 1.05 s; Greeks 1.75 s vs 1.29 s — its decoupled sweep
    # steps lose the generator matmuls' scheduling cover, VERIFY_r04
    # §6).  The two kernels' sums agree bitwise, so "grid" remains a
    # safe A/B arm.
    chain_sweep_impl: str = "auto"
    # Single-strike fused kernel: split each path block into this many
    # INDEPENDENT sub-block chains inside one kernel body (boundary
    # policy form only).  A single block's PRNG -> fGN matmul -> Euler ->
    # cumsum matmul -> policy chain is serial, so the VPU and MXU take
    # turns; independent sub-chains let Mosaic overlap one sub-block's
    # matmuls with another's Box-Muller/policy work (the VERIFY_r04 §4
    # roofline lever).  1 = off (the measured default until hardware
    # proves a win); estimator-identical either way.
    pallas_interleave: int = 1
    # Program-order schedule of the interleaved sub-chains in the fused
    # priced kernel: "chained" emits each sub-chain's stages
    # back-to-back; "staggered" (requires pallas_interleave=2, boundary
    # policy, no antithetic) hand-staggers the two halves so each MXU
    # stage neighbors the other half's VPU stage — the roofline's
    # hand-scheduled double-buffer lever (VERIFY_r04 §4 / r04 verdict
    # item 6).  Same draws, bitwise-equal sums; A/B via BENCH_SCHEDULE.
    # Hardware A/B (VERIFY_r05 §6.3): throughput-neutral vs chained
    # (-0.3%) and below the interleave=1 baseline (-1.8%) — Mosaic does
    # not convert the staggered program order into VPU/MXU overlap, so
    # both levers stay opt-in measurement knobs, default off.
    pallas_schedule: str = "chained"
    # Run every Pallas kernel in the TPU-semantics INTERPRETER instead of
    # compiling for the chip.  Validation/debugging knob only (orders of
    # magnitude slower): it lets the fused code paths — single-tile,
    # slab, factored, chain, QMC noise-in — compile AND execute on the
    # virtual CPU mesh, which is how __graft_entry__.dryrun_multichip
    # gives the pallas streams multi-chip coverage without TPU hardware.
    pallas_interpret: bool = False
    # Single-strike fused-kernel exercise-policy representation:
    # "boundary" — boundary_rows intervals evaluated in LOG space
    # (pathgen_pallas.log_boundary_rows / _policy_value_log_boundary):
    # the interval test runs on the log price plane, so the per-cell
    # exp(log S) disappears (one exp per PATH at the stop step) and the
    # strict-upper counting matmul is replaced by a min-index reduction —
    # the kernels' measured bound is VPU transcendentals, making this the
    # fast default (VERIFY_r03 §12); "quadratic" — the cell-level
    # quadratic on the S plane (lsm_policy_value's exact f32 decision
    # semantics, the r02 form).  Decision differences are the same
    # one-ulp root-band class as chain_policy_form's.
    policy_form: str = "boundary"
    # Antithetic pairing: each chunk prices chunk_paths/2 pairs
    # (N, W) / (-N, -W) — every path's marginal law is exactly the
    # standard one (standard normals are symmetric), from HALF the
    # Box-Muller draws (the fused kernels' measured VPU transcendental
    # bound), with pair members negatively correlated (the classic
    # variance reduction for monotone payoffs).  Chunk totals stay iid,
    # so the streamed stderr remains exact and automatically reflects
    # the reduction.  The fGN map is linear in the noise, so the pair
    # also shares ONE fGN synthesis (the partner's plane is its
    # negation) — at long horizons (the slab kernel) that halves the
    # O(s_pad^2)-per-path MXU bound too.
    #
    # Coverage (complete as of r04): the fused boundary kernels pair
    # prices at EVERY horizon (single-tile, slab, factored DFT — both
    # DFT stages are linear, so the partner's plane is a negation in
    # every factorization) and chains AND Greeks (both noise matmuls
    # shared, pathgen_pallas._tangent_planes); the XLA generator pairs
    # at the noise-plane level, so every whole-path surface inherits
    # it — generic stream, CV, duality bounds, jvp Greeks,
    # bucketed/serving chains; the pallas whole-path generators pair
    # too (single-tile, slab, factored — pallas-config bounds at any
    # horizon).  Rejected loudly where no pairing exists: QMC (its
    # stratification replaces pairing) and quadratic policy forms.
    # OFF by default: the plain-MC estimator is the reference-parity
    # default, and pairing changes the sample's joint law (dependence
    # within pairs) even though each path's law and the estimator's
    # mean do not move.
    antithetic: bool = False
    # Chunks per device program: the chunk loop runs as an on-device
    # fori_loop, so host<->device round-trips happen once per
    # `chunks_per_call` chunks, not per chunk (the axon-tunnel dispatch
    # latency makes per-chunk host loops pathological).
    chunks_per_call: int = 16

    def __post_init__(self):
        # Catch enum typos at construction: a misspelled form would
        # otherwise be silently accepted on every XLA code path (only the
        # Pallas builders resolve it) — "testing" nothing.
        if self.fgn_form not in ("auto", "spectral", "chol"):
            raise ValueError(f"unknown fgn_form: {self.fgn_form!r}")
        if self.tiled_impl not in ("auto", "factored", "slab"):
            raise ValueError(f"unknown tiled_impl: {self.tiled_impl!r}")
        if self.chain_policy_form not in ("boundary", "quadratic"):
            raise ValueError(
                f"unknown chain_policy_form: {self.chain_policy_form!r}")
        if self.chain_sweep_impl not in ("auto", "grid", "regen"):
            raise ValueError(
                f"unknown chain_sweep_impl: {self.chain_sweep_impl!r}")
        if self.qmc_fgn and not self.qmc:
            raise ValueError("qmc_fgn requires qmc=True")
        if self.qmc_dim < 1:
            raise ValueError("qmc_dim must be >= 1")
        if self.antithetic and self.qmc:
            # Already rejected downstream by make_chunk_pathgen; rejecting
            # at construction keeps the fused noise-in paths (which never
            # reach that builder) from silently combining a Sobol set
            # with pairing it would break.
            raise ValueError("antithetic is incompatible with qmc (the "
                             "Sobol set has its own stratification)")
        if self.policy_form not in ("boundary", "quadratic"):
            raise ValueError(
                f"unknown policy_form: {self.policy_form!r}")
        if self.pallas_schedule not in ("chained", "staggered"):
            raise ValueError(
                f"unknown pallas_schedule: {self.pallas_schedule!r}")
        if self.pallas_schedule == "staggered" and (
                self.pallas_interleave != 2 or self.antithetic
                or self.policy_form != "boundary"):
            raise ValueError(
                "pallas_schedule='staggered' is the two-half pipeline: "
                "it requires pallas_interleave=2, policy_form='boundary' "
                "and antithetic=False")
        # interleave < 1 would run the kernel's sub-block loop zero times
        # (all-zero sums -> a silent price of 0.0) or divide by zero at
        # trace time; the kernel builders only validate values > 1.
        if not isinstance(self.pallas_interleave, int) \
                or self.pallas_interleave < 1:
            raise ValueError(
                f"pallas_interleave must be a positive int, got "
                f"{self.pallas_interleave!r}")


def _fgn_matrices_np(n_steps: int, h: float, eta: float, dt: float) -> tuple:
    """Spectral matrices in float64 on host (NumPy).

    Same math as ops.fgn.fgn_matrices, in float64 host precision (the
    [n, n] complex intermediate overflows float32's exponent headroom for
    large n; ops/fgn's float32 form is the on-device variant for tests)."""
    t = np.arange(n_steps + 1, dtype=np.float64) * dt
    lam = 0.5 * t ** (2.0 * h)
    m1 = 1
    while m1 < lam.size:
        m1 <<= 1
    phi = np.conj(np.fft.fft(lam, n=m1))
    m2 = 1
    while m2 < n_steps:
        m2 <<= 1
    k = np.arange(n_steps)[:, None].astype(np.float64)
    m = np.arange(n_steps)[None, :].astype(np.float64)
    c = phi[:n_steps, None] * np.exp(-2j * np.pi * k * m / m2)
    scale = np.sqrt(2.0 * h) * eta / m2
    cr = np.asarray(np.real(c) * scale)
    ci = np.asarray(np.imag(c) * scale)
    return cr, ci


@functools.lru_cache(maxsize=64)
def _fgn_matrices_host(n_steps: int, h: float, eta: float, dt: float,
                       dtype) -> tuple:
    """float64 spectral matrices cast for the MXU, as device constants.

    Cached: a StreamingPricer builds up to five generators (pilot/chunk/
    fused/Greeks variants) from the same (n_steps, h, eta, dt).  Safe to
    cache as device arrays because builders only run outside jit traces."""
    cr, ci = _fgn_matrices_np(n_steps, h, eta, dt)
    return jnp.asarray(cr, dtype), jnp.asarray(ci, dtype)


@functools.lru_cache(maxsize=64)
def _chol_matrix_host(n_steps: int, h: float, eta: float, dt: float, dtype):
    """Upper-triangular Lt with X = N @ Lt distributed EXACTLY as the
    spectral map Zr @ Cr - Zi @ Ci (N, Zr, Zi iid standard normal planes).

    The spectral fGN is a linear map of iid normals, hence Gaussian with
    covariance Cov = Cr^T Cr + Ci^T Ci; a Gaussian law is fully determined
    by its covariance, so the Cholesky factor L (Cov = L L^T, f64 host
    precision) reproduces it from HALF the noise (one plane instead of two)
    and ONE [n, n] matmul instead of two — a 33% cut in the kernel's
    Box-Muller draws (its measured VPU bound) and a 50% cut in its
    spectral-matmul MXU FLOPs.  Returns L^T so the kernel's row-major
    path-block matmul X[p, :] = N[p, :] @ Lt keeps the [paths, steps]
    layout of the spectral form."""
    return jnp.asarray(_chol_np(n_steps, h, eta, dt).T, dtype)


def _chol_np(n_steps: int, h: float, eta: float, dt: float) -> np.ndarray:
    """Lower-triangular f64 Cholesky factor of the spectral fGN
    covariance (the host core of _chol_matrix_host)."""
    cr, ci = _fgn_matrices_np(n_steps, h, eta, dt)
    cov = cr.T @ cr + ci.T @ ci
    # The Gram form is PSD by construction; rank deficiency (possible in
    # exact arithmetic only at degenerate parameters) surfaces as f64
    # roundoff, handled by an escalating diagonal jitter.  The jitter is
    # bounded by 1e-6 * max-variance — orders of magnitude below the f32
    # cast noise the kernel already carries.
    scale = float(np.max(np.diag(cov))) or 1.0
    for jitter in (0.0, 1e-14, 1e-10, 1e-6):
        try:
            return np.linalg.cholesky(cov + jitter * scale *
                                      np.eye(n_steps))
        except np.linalg.LinAlgError:
            continue
    raise np.linalg.LinAlgError(
        f"fGN covariance not PSD at n={n_steps}, h={h}")


def _chol_dh_matrix_host(n_steps: int, h: float, eta: float, dt: float,
                         dtype, eps: float = 1e-5):
    """d(Lt)/dH by f64 central finite difference — the host constant
    behind the fused kernel's pathwise vega_h (pathgen_pallas.
    _greeks_body).  The map h -> Lt is smooth away from the jitter
    fallback (which never engages at realistic parameters), so the
    truncation error is O(eps^2) ~ 1e-10 relative — far below the f32
    cast the kernel applies and the MC noise of any Greek estimate.
    An analytic alternative (differentiating the spectral build and the
    Cholesky) buys nothing at that accuracy level."""
    lp = _chol_np(n_steps, h + eps, eta, dt)
    lm = _chol_np(n_steps, h - eps, eta, dt)
    return jnp.asarray(((lp - lm) / (2.0 * eps)).T, dtype)


def _safe_tpow(t, p):
    """t**p with a traced exponent, safe at t == 0 under AD: jnp.power's
    exponent-JVP is x**p * log(x) -> nan at x = 0; route through a
    where-guarded exp/log so value AND derivative are 0 there (the
    correct limit for p > 0)."""
    pos = t > 0
    safe_t = jnp.where(pos, t, 1.0)
    return jnp.where(pos, jnp.exp(p * jnp.log(safe_t)), 0.0)


def make_chunk_pathgen(s0, xi, h, eta, rho, r, n_steps: int, dt: float,
                       chunk_paths: int, dtype=jnp.float32,
                       fgn_dtype=jnp.float32, cumsum_impl: str = "cumsum",
                       qmc: bool = False, fgn_impl: str = "matmul",
                       traced_h: bool = False, antithetic: bool = False,
                       qmc_fgn: bool = False, qmc_dim: int = 256):
    """Build chunk_paths-sized rBergomi generator key -> [chunk, steps+1]
    using the MXU fGN matmul.  Statistically identical to
    rough_volatility.generate_paths (different RNG stream layout).

    antithetic=True draws HALF the noise and fills the chunk with
    (Z, W) / (-Z, -W) pairs (rows i and i + chunk/2 are partners): every
    path's marginal law is exactly the standard one, the fGN matmul runs
    once per pair (the spectral map is linear; the partner's plane is a
    negation), and pair members are negatively correlated — any
    downstream consumer of whole paths (LSM policy values, martingale
    controls, duality bounds, pathwise jvp tangents) inherits the
    variance reduction with iid chunk totals, so streamed stderrs stay
    exact.  Incompatible with qmc (the Sobol set has its own pairing-free
    stratification).

    cumsum_impl="matmul" computes the log-price accumulation as a product
    with an upper-triangular ones matrix — MXU work instead of the VPU
    associative scan, measurably faster on TPU for step counts in the
    hundreds.

    qmc=True drives the PRICE Brownian from randomized quasi-Monte Carlo:
    one scrambled-Sobol base set per (chunk_paths, n_steps) shape (host-
    cached device constant), digitally shifted per chunk key, mapped to
    normals by inverse CDF and rotated through the Brownian PCA matrix so
    the low Sobol dimensions carry the path's dominant variance modes
    (ops/qmc.py).  By default only the price Brownian is low-discrepancy;
    the two fGN planes stay pseudo-random (tripling the base-set
    footprint buys nothing when the Brownian carries the payoff
    variance).  ``qmc_fgn=True`` extends the Sobol set to 3*n_steps
    dimensions covering the fGN planes too — the right choice on
    HIGH-vol-of-vol markets where the variance rides the fGN (measured:
    VERIFY_r03 §28's eta=1.5 / 32-step case is ~1x with the default and
    recovers the multi-x reduction with qmc_fgn; the layout matches
    rough_volatility.generate_paths_qmc, which always QMCs all three).
    Per-chunk shifts are independent, so chunk estimates stay independent
    and unbiased — streaming accumulation and stderr logic are unchanged.
    Capability upgrade over the reference's plain pseudo-random MC
    (src/models/RoughVolatility.cpp:238-262) at streaming scale."""
    # Unit-eta spectral matrices: the fGN is LINEAR in eta (X = eta * Xhat,
    # RoughVolatility.cpp:264-292 scale factor) and the variance-curve
    # compensator -eta^2 t^{2H}/2 is analytic, so factoring eta out of the
    # host-precomputed matrices makes it a call-time (traceable) scalar —
    # the AD surface for the vol-of-vol vega users actually hedge.  Only H
    # stays baked in (it shapes the kernel itself).
    #
    # fgn_impl selects the synthesis algorithm (identical distribution and
    # noise layout, same math to accumulation order):
    #   "matmul" — X = Z @ C on the MXU, O(s^2)/path.  Fastest for the
    #       step counts where the [s, s] matrices tile well (<= ~512).
    #   "fft"    — the reference's own batched spectral form
    #       Re(FFT(phi * Z))/M2 (ops/fgn.py), O(s log s)/path.  For long
    #       horizons (1825 steps) the matmul form's quadratic FLOPs
    #       dominate the whole generator; the FFT form trades them for one
    #       batched complex64 FFT.
    if antithetic:
        if qmc:
            raise ValueError("antithetic is incompatible with qmc")
        if chunk_paths % 2:
            raise ValueError("antithetic needs an even chunk_paths")
    n_draw = chunk_paths // 2 if antithetic else chunk_paths
    if traced_h:
        # Hurst becomes a CALL-TIME (possibly traced) scalar: the spectral
        # matrices are built in-graph (ops/fgn, f32) instead of baked from
        # host float64.  The [n, n] build costs ~1/chunk_paths of the fGN
        # matmul itself, so per-chunk rebuilds are noise; what it buys is
        # (a) vega_h via forward-mode AD and (b) recompile-free H
        # recalibration in serve mode.
        if fgn_impl != "matmul":
            raise ValueError("traced_h requires the matmul fGN synthesis")
    elif fgn_impl == "fft":
        t64 = np.arange(n_steps + 1, dtype=np.float64) * dt
        lam = 0.5 * t64 ** (2.0 * h)
        m1 = 1
        while m1 < lam.size:
            m1 <<= 1
        phi_host = np.conj(np.fft.fft(lam, n=m1))[:n_steps]
        m2 = 1
        while m2 < n_steps:
            m2 <<= 1
        # Two real planes, not one complex constant: complex host->device
        # transfers are UNIMPLEMENTED on the axon TPU backend; the complex
        # value is assembled inside the jitted generator instead.
        phi_re = jnp.asarray(phi_host.real, jnp.float32)
        phi_im = jnp.asarray(phi_host.imag, jnp.float32)
        fft_scale = float(np.sqrt(2.0 * h)) / m2
    elif fgn_impl == "matmul":
        cr, ci = _fgn_matrices_host(n_steps, h, 1.0, dt, fgn_dtype)
    else:
        raise ValueError(f"unknown fgn_impl: {fgn_impl!r}")
    t = jnp.arange(n_steps + 1, dtype=dtype) * dt
    t_pow = jnp.power(t[:n_steps], 2.0 * h)
    sqrt_dt = float(np.sqrt(dt))
    # The reference's price Brownian rho*w1 + sqrt(1-rho^2)*w2 is built from
    # two normals both independent of the fGN driver (RoughVolatility.cpp:
    # 355-358), so it is EXACTLY one N(0,1) draw per step for any rho — see
    # rough_volatility.euler_log_paths.  One plane instead of two: 25% fewer
    # draws at streaming scale.
    del rho
    if cumsum_impl == "matmul":
        tri = jnp.triu(jnp.ones((n_steps, n_steps), dtype))
        cumsum = lambda inc: jnp.matmul(
            inc, tri, preferred_element_type=jnp.float32)
    elif cumsum_impl == "cumsum":
        cumsum = lambda inc: jnp.cumsum(inc, axis=-1)
    else:
        raise ValueError(f"unknown cumsum_impl: {cumsum_impl!r}")

    if qmc_fgn and not qmc:
        raise ValueError("qmc_fgn requires qmc=True")
    if qmc_fgn and fgn_impl == "fft":
        raise ValueError("qmc_fgn requires the matmul fGN synthesis "
                         "(the fft branch draws its own noise)")
    if qmc:
        from ..ops import qmc as qmc_mod

        # Truncated-PCA Sobol set (see StreamConfig.qmc_dim): the leading
        # q_w eigen-ordered PCA components per plane ride the Sobol set,
        # the tail is PRNG-filled in gen_with_params.
        q_w = min(n_steps, qmc_dim)
        qdim = 3 * q_w if qmc_fgn else q_w
        sobol_bits = jnp.asarray(qmc_mod.sobol_base(chunk_paths, qdim))
        # PCA map already carries the sqrt(dt) scale: rows of the Brownian
        # covariance factor, differenced to increments (M M^T = dt*I).
        pca_t = jnp.asarray(qmc_mod.brownian_pca_matrix(n_steps, dt)).T

    def gen_with_params(key, s0_, xi_, r_, eta_, n_live=None, h_=None):
        """(s0, xi, r, eta) as call-time (possibly traced) scalars — the AD
        surface for streaming Greeks.  With ``traced_h`` at build time,
        ``h_`` joins them (in-graph spectral build, completing the Greek
        set with vega_h); otherwise h stays baked into the
        host-precomputed spectral matrices and ``h_`` must be None.  rho
        is distributionally irrelevant either way (see above).

        ``n_live`` (optional traced int): zero the log-price increments at
        steps >= n_live, so the path stays FLAT past its true horizon — the
        padding contract that lets one compiled program at a bucketed step
        count price any shorter-dated contract exactly (cf.
        rough_volatility.generate_paths_bucketed / lsm.lsm_fit's
        pad-step-identity semantics)."""
        if traced_h:
            from ..ops.fgn import fgn_matrices, next_pow2

            hh = jnp.asarray(h if h_ is None else h_, jnp.float32)
            lam = 0.5 * _safe_tpow(t, 2.0 * hh)
            # Pad to the same next_pow2 M1 the host build uses.  The
            # explicit complex64 cast matters on the axon TPU backend:
            # jit-compiling an FFT of a REAL input hangs the backend
            # (and the tunnel), while the complex-input FFT is the
            # round-2-measured working path (fgn_impl="fft").
            lam_c = lam.astype(jnp.complex64)
            phi_t = jnp.conj(jnp.fft.fft(lam_c, n=next_pow2(n_steps + 1)))
            cr_t, ci_t = fgn_matrices(phi_t, n_steps, hh, 1.0, fgn_dtype)
            t_pow_ = _safe_tpow(t[:n_steps], 2.0 * hh)
        else:
            if h_ is not None:
                raise ValueError("h is baked in; build with traced_h=True")
            t_pow_ = t_pow
            if fgn_impl == "matmul":
                cr_t, ci_t = cr, ci
        kz, kw = jax.random.split(key)
        if fgn_impl == "fft":
            zf = jax.random.normal(kz, (2, n_draw, n_steps),
                                   jnp.float32)
            phi_c = jax.lax.complex(phi_re, phi_im)[None, :]
            a = phi_c * jax.lax.complex(zf[0], zf[1])
            x_hat = (jnp.real(jnp.fft.fft(a, n=m2, axis=-1))[..., :n_steps]
                     * fft_scale)
        if qmc:
            kw, kt = jax.random.split(kw)
            zq = qmc_mod.normals(sobol_bits, kw)
            zw = zq[:, :q_w]
            if q_w < n_steps:
                # PRNG-fill the trailing PCA components (truncated set,
                # see StreamConfig.qmc_dim).
                zw = jnp.concatenate(
                    [zw, jax.random.normal(kt, (n_draw, n_steps - q_w),
                                           jnp.float32)], axis=1)
            # Full precision: the PCA rotation realizes the low-discrepancy
            # structure; bf16 matmul noise (~0.4% relative) would drown the
            # sub-MC-noise accuracy QMC exists to deliver.
            dw = jnp.matmul(zw, pca_t,
                            precision=jax.lax.Precision.HIGHEST)
            dw = dw.astype(dtype)
        else:
            dw = jax.random.normal(kw, (n_draw, n_steps),
                                   dtype) * sqrt_dt
        if fgn_impl == "matmul":
            if qmc_fgn:
                # Sobol dims [q, 2q) / [2q, 3q) are (Zr, Zi) — the layout
                # of rough_volatility.generate_paths_qmc's complex plane,
                # truncated per plane; tails are PRNG-filled.
                z = jnp.stack([zq[:, q_w:2 * q_w],
                               zq[:, 2 * q_w:3 * q_w]])
                if q_w < n_steps:
                    z = jnp.concatenate(
                        [z, jax.random.normal(
                            kz, (2, n_draw, n_steps - q_w), jnp.float32)],
                        axis=2)
                z = z.astype(fgn_dtype)
            else:
                z = jax.random.normal(kz, (2, n_draw, n_steps), fgn_dtype)
            x_hat = (jnp.matmul(z[0], cr_t,
                                preferred_element_type=jnp.float32)
                     - jnp.matmul(z[1], ci_t,
                                  preferred_element_type=jnp.float32))
        if antithetic:
            # Pair members via the fGN map's linearity (in both the fft
            # and matmul syntheses): ONE synthesis per pair, the partner's
            # plane is its negation.
            x_hat = jnp.concatenate([x_hat, -x_hat], axis=0)
            dw = jnp.concatenate([dw, -dw], axis=0)
        v = xi_ * jnp.exp(eta_ * x_hat - 0.5 * (eta_ * eta_) * t_pow_)
        inc = (r_ - 0.5 * v) * dt + jnp.sqrt(jnp.maximum(0.0, v)) * dw
        if n_live is not None:
            col = jnp.arange(n_steps, dtype=jnp.int32)[None, :]
            inc = jnp.where(col < jnp.asarray(n_live, jnp.int32), inc, 0.0)
        log_s = jnp.log(s0_) + cumsum(inc)
        s = jnp.exp(log_s).astype(dtype)
        s0_col = jnp.full((chunk_paths, 1), 1.0, dtype) * s0_
        return jnp.concatenate([s0_col, s], axis=-1)

    def gen(key, n_live=None):
        return gen_with_params(key, s0, xi, r, eta, n_live)

    gen.with_params = gen_with_params
    return gen


def _make_fused_qmc_noise(config: "StreamConfig", n_steps: int, s_pad: int,
                          fgn_form: str, dt: float):
    """key -> [n_planes, chunk_paths, s_pad] noise for the fused kernels'
    ``noise_input`` entries, with the PRICE Brownian plane driven by
    randomized QMC (scrambled Sobol + per-chunk digital shift + Brownian
    PCA — exactly make_chunk_pathgen's scheme) instead of the in-kernel
    hardware PRNG.

    This is what lets ``StreamConfig(qmc=True, pathgen_impl="pallas")``
    keep the fused policy/boundary evaluation and MXU fGN matmul: the
    planes are built in XLA (ndtri + one PCA matmul per chunk), streamed
    through HBM block by block (~3 KB/path — two orders of magnitude
    under the v5e HBM roofline at fused-kernel throughput), and consumed
    by `_priced_kernel_noise_in` / `_chain_kernel_noise_in`.

    Plane layout matches `pathgen_pallas._noise_planes`:
      chol     -> (N, W)       with X = N @ Lt;
      spectral -> (Zr, Zi, W)  with X = Zr @ Cr - Zi @ Ci.
    The kernel scales W by sqrt(dt) itself, so the PCA'd increments are
    divided back by sqrt(dt) here (the map M has M M^T = dt * I).

    ``qmc_fgn=True`` extends the Sobol set to the fGN plane(s) too.  For
    the spectral form the dimension layout matches the XLA generator
    ([0, n) Brownian, [n, 2n) Zr, [2n, 3n) Zi); the chol form consumes
    ONE fGN plane, so its set is 2n-dimensional ([n, 2n) -> N) — a
    different (smaller) point-set assignment than the XLA generator's,
    same Gaussian law.  Padded columns are zero (annihilated by the
    matrices' zero pad rows, like the in-kernel draws).

    ``fgn_form="factored"`` targets the long-horizon four-step-DFT
    kernels (r04 verdict item 4): ``s_pad`` is then the kernel's m2 =
    next_pow2(n_steps) plane width and the two fGN planes are
    FREQUENCY-domain draws over the m2-wide plane (the kernel's
    transposed k-layout consumes iid normals, so any assignment is the
    same law).

    TRUNCATED Sobol set (StreamConfig.qmc_dim): only the leading
    ``qmc_dim`` PCA components of the price Brownian ride the Sobol set;
    the remaining components are PRNG normals.  brownian_pca_matrix
    orders components by decreasing Brownian-covariance eigenvalue, so
    the truncation keeps virtually all of the variance the
    low-discrepancy structure can exploit (the standard
    effective-dimension argument), while bounding the host-materialized
    [chunk, qdim] uint32 base — the full 1825-step set at chunk 2^16 is
    a ~0.5 GB program constant that exceeds the axon tunnel's
    remote-compile request limit (measured HTTP 413, VERIFY_r05 §3).
    ``qmc_fgn`` planes truncate identically; for the factored form the
    leading dims are the LOW frequencies, where the fGN spectral mass
    sits."""
    from ..ops import qmc as qmc_mod

    chunk = config.chunk_paths
    factored = fgn_form == "factored"
    n_fgn_planes = 1 if fgn_form == "chol" else 2
    # Width of the Sobol slice feeding each fGN plane: the dense forms
    # draw n_steps time-domain columns (pad annihilated); the factored
    # form draws the m2-wide frequency plane.
    fgn_dim = s_pad if factored else n_steps
    q_w = min(n_steps, config.qmc_dim)
    q_f = min(fgn_dim, config.qmc_dim)
    qdim = q_w + (n_fgn_planes * q_f if config.qmc_fgn else 0)
    sobol_bits = jnp.asarray(qmc_mod.sobol_base(chunk, qdim))
    pca_t = jnp.asarray(qmc_mod.brownian_pca_matrix(n_steps, dt)).T
    inv_sqrt_dt = float(1.0 / np.sqrt(dt))
    pad = ((0, 0), (0, s_pad - n_steps))

    def noise_fn(key):
        kq, kp, kt = jax.random.split(key, 3)
        zq = qmc_mod.normals(sobol_bits, kq)
        zw = zq[:, :q_w]
        if q_w < n_steps:          # PRNG-fill the trailing PCA components
            zw = jnp.concatenate(
                [zw, jax.random.normal(kt, (chunk, n_steps - q_w),
                                       jnp.float32)], axis=1)
        # Full precision for the PCA rotation (see make_chunk_pathgen):
        # bf16 matmul noise would drown the sub-MC accuracy QMC buys.
        w = jnp.pad(jnp.matmul(zw, pca_t,
                               precision=jax.lax.Precision.HIGHEST)
                    * inv_sqrt_dt, pad)
        if config.qmc_fgn:
            kfs = jax.random.split(kp, n_fgn_planes)

            def fgn_plane(i):
                p = zq[:, q_w + i * q_f:q_w + (i + 1) * q_f]
                if q_f < fgn_dim:  # PRNG-fill the trailing dims
                    p = jnp.concatenate(
                        [p, jax.random.normal(kfs[i],
                                              (chunk, fgn_dim - q_f),
                                              jnp.float32)], axis=1)
                return p if factored else jnp.pad(p, pad)

            planes = [fgn_plane(i) for i in range(n_fgn_planes)]
        elif n_fgn_planes == 1:
            planes = [jax.random.normal(kp, (chunk, s_pad), jnp.float32)]
        else:
            z = jax.random.normal(kp, (2, chunk, s_pad), jnp.float32)
            planes = [z[0], z[1]]
        return jnp.stack([*planes, w])

    return noise_fn


def _resolve_tiled_module(config: "StreamConfig", n_steps: int, fgn_dtype,
                          noise_input: bool = False):
    """Long-horizon fused-kernel module for step counts past the
    single-tile VMEM cap, honoring StreamConfig.tiled_impl; None when
    neither kernel's budget covers the horizon (the XLA generator takes
    over).  Both modules expose make_tiled_pathgen /
    make_tiled_priced_chunk with identical seed and policy-table
    semantics, so callers are agnostic to the algorithm.

    ``noise_input=True`` resolves against the NOISE-INPUT VMEM budgets
    (the fused-QMC stream, r04 verdict item 4): the injected
    [planes, block, width] f32 stack stays resident per block, lowering
    the step ceilings (slab chol ~3.7k steps at block 256, factored
    m2 <= 2048).  The explicit-impl ValueErrors keep their A/B-integrity
    contract in this mode too: a benchmark labeled 'factored'/'slab'
    must never silently measure the XLA generator."""
    from . import pathgen_pallas_factored, pathgen_pallas_tiled

    impl = config.tiled_impl
    if impl not in ("auto", "factored", "slab"):
        raise ValueError(f"unknown tiled_impl: {impl!r}")
    block = config.pallas_block_paths
    form = _resolve_fgn_form(config)
    # Measured v5e (1e7 paths, bf16): the chol slab beats the factored DFT
    # at every horizon both cover — 7.29M vs 5.87M paths/s at 1825 steps,
    # 2.56M vs 1.98M at 4000 — because the long-horizon kernels are
    # VPU-bound (RNG + exp/sqrt), and the chol form draws one fGN plane
    # instead of two (m2-wide complex Z), while its single triangular
    # matrix stays under the MXU/HBM ceilings.  Auto therefore prefers
    # chol slabs; the factored DFT covers horizons past the slab VMEM
    # budget and the spectral-form configurations.
    if (impl == "auto" and form == "chol"
            and pathgen_pallas_tiled.supports(n_steps, block, fgn_dtype,
                                              form,
                                              noise_input=noise_input)):
        return pathgen_pallas_tiled
    if impl in ("auto", "factored") and pathgen_pallas_factored.supports(
            n_steps, block, fgn_dtype, noise_input=noise_input):
        if config.fgn_form == "chol":
            # An EXPLICIT chol request cannot ride the factored DFT (its
            # frequency-domain structure has no Cholesky analogue); erroring
            # preserves A/B integrity — fgn_form="auto" takes the silent
            # spectral fallback instead.
            raise ValueError(
                "fgn_form='chol' cannot run on the factored-DFT long-horizon "
                "kernel (spectral-only); use fgn_form='auto', or "
                "tiled_impl='slab' at horizons within the slab VMEM budget")
        return pathgen_pallas_factored
    if impl == "factored":
        # EXPLICITLY requested kernel can't cover the horizon: erroring
        # preserves A/B integrity (same contract as the chol-on-factored
        # case above) — a benchmark labeled "factored" must never silently
        # measure the XLA generator.  "auto" keeps the silent fallback.
        raise ValueError(
            f"tiled_impl='factored' cannot cover n_steps={n_steps} at "
            f"block {block}{' with injected noise resident' if noise_input else ''} "
            f"(past the kernel's VMEM budget); use tiled_impl='auto' for "
            "the XLA fallback")
    if pathgen_pallas_tiled.supports(n_steps, block, fgn_dtype, form,
                                     noise_input=noise_input):
        return pathgen_pallas_tiled
    if impl == "slab":
        raise ValueError(
            f"tiled_impl='slab' cannot cover n_steps={n_steps} at block "
            f"{block} with fgn_form={form!r}"
            f"{' and injected noise resident' if noise_input else ''} "
            "(past the slab VMEM budget); use tiled_impl='auto' for the "
            "XLA fallback")
    return None


def _tiled_maker_kwargs(tiled, config: "StreamConfig",
                        priced: bool = False) -> dict:
    """Extra maker kwargs for the resolved tiled module: the slab kernel
    takes the fGN form; the factored four-step DFT is spectral-only (its
    frequency-domain structure has no Cholesky analogue); both priced
    makers take the policy form and (r04) antithetic pairing — both DFT
    stages and the slab matmul are linear in the noise, so the partner's
    plane is a negation in every factorization."""
    from . import pathgen_pallas_tiled

    kw = {"policy_form": config.policy_form} if priced else {}
    kw["interpret"] = config.pallas_interpret
    if tiled is pathgen_pallas_tiled:
        kw["fgn_form"] = _resolve_fgn_form(config)
    if priced:
        kw["antithetic"] = config.antithetic
    return kw


def _resolve_fgn_impl(config: "StreamConfig", n_steps: int) -> str:
    """"auto" resolves to the measured-fastest synthesis (see StreamConfig
    .fgn_impl): matmul at every step count on both TPU and CPU."""
    if config.fgn_impl != "auto":
        return config.fgn_impl
    return "matmul"


def _resolve_fgn_form(config: "StreamConfig") -> str:
    """"auto" resolves to the measured-fastest fused-kernel fGN map (see
    StreamConfig.fgn_form)."""
    if config.fgn_form != "auto":
        return config.fgn_form
    return "chol"


def _fused_rows_builder(config: "StreamConfig", tiled, r, strike, maturity,
                        dt, n_steps: int, is_call: bool):
    """fits -> policy-table builder matched to StreamConfig.policy_form:
    log-space boundary tables under "boundary" (built in-graph from the
    pilot fit, so serving's traced-fit reuse carries over; consumed by
    every fused priced kernel family — single-tile, slab, factored);
    quadratic policy_rows under "quadratic"."""
    from . import pathgen_pallas

    del tiled  # every fused priced kernel family honors both forms now
    if config.policy_form == "boundary":
        def make_rows(fits):
            tab = pathgen_pallas.boundary_rows(fits, r, strike, maturity,
                                               dt, n_steps, is_call)
            return pathgen_pallas.log_boundary_rows(tab)
    else:
        def make_rows(fits):
            return pathgen_pallas.policy_rows(fits, r, strike, maturity,
                                              dt, n_steps, is_call)
    return make_rows


def _fused_block(config: "StreamConfig", n_steps: int) -> int:
    """Path block for the single-tile fused kernel: the configured block,
    clamped to the kernel's VMEM budget at this horizon.  The clamp only
    engages where the configured block cannot compile at all (e.g. chol
    past 768 padded steps admits 128, not the default 256 —
    pathgen_pallas.max_block_paths); the block is a scheduling knob, so
    clamping changes PRNG block-stream assignment but never the law.
    The clamp is LOGGED so a benchmark labeled with the requested block
    never silently measures a different grid (parity scripts print the
    effective block from this warning)."""
    import logging

    from . import pathgen_pallas

    cap = pathgen_pallas.max_block_paths(n_steps,
                                         _resolve_fgn_form(config))
    if config.pallas_block_paths > cap:
        logging.getLogger(__name__).warning(
            "pallas_block_paths=%d exceeds the fused kernel's VMEM budget "
            "at n_steps=%d; running block %d",
            config.pallas_block_paths, n_steps, cap)
    return min(config.pallas_block_paths, cap)


def lsm_policy_value(paths, fits: PolyFit, r, strike, maturity, dt,
                     is_call: bool, n_steps_live=None):
    """Per-chunk sum of discounted payoffs under the fitted exercise policy.

    Exercise at the first step j < n_steps that is in the money and whose
    immediate payoff is >= the fitted continuation value; otherwise exercise
    the terminal payoff.  Returns (sum, count).

    Consistency contract with the pilot (models/lsm._lsm_backward): the
    exercise window uses the same integer-exact step mask, and values
    discount with exp(-r*t) at the stop step — the pilot discounts EVERY
    step including those past maturity (reference behavior,
    LSMPricer.cpp:44-49), so clipping t at maturity here would bias the
    streamed estimate against the fit whenever n_steps*dt > maturity.
    """
    value = lsm_policy_path_values(paths, fits, r, strike, maturity, dt,
                                   is_call, n_steps_live)
    return jnp.sum(value), paths.shape[0]


def lsm_policy_path_values(paths, fits: PolyFit, r, strike, maturity, dt,
                           is_call: bool, n_steps_live=None):
    """Per-path discounted payoff under the fitted exercise policy [n].

    ``n_steps_live`` (optional traced int): the contract's true horizon
    when ``paths`` is a step-bucketed block (flat past n_steps_live; see
    make_chunk_pathgen's n_live).  The terminal exercise is forced at
    column n_steps_live and pad columns can never exercise, so the padded
    program prices exactly as the exact-shape one."""
    n, m = paths.shape
    t = jnp.arange(m, dtype=paths.dtype) * dt
    p = payoff(is_call, paths, strike)

    # Continuation from the per-step fits: coeffs[j] in z_j = (S - mu_j)/sd_j
    # (eval_poly broadcasts the per-step leading axis of the fits).
    s_steps = paths[:, : m - 1]                           # [n, m-1]
    cont = eval_poly(fits, s_steps)

    live = step_mask(m - 1, dt, maturity)[None, :]
    exercise = (p[:, : m - 1] > ITM_EPS) & (p[:, : m - 1] >= cont) & live
    # Terminal step always "exercises" whatever payoff remains.
    exercise = jnp.concatenate(
        [exercise, jnp.ones((n, 1), bool)], axis=-1)
    if n_steps_live is not None:
        col = jnp.arange(m, dtype=jnp.int32)[None, :]
        nl = jnp.asarray(n_steps_live, jnp.int32)
        exercise = (exercise & (col < nl)) | (col == nl)
    stop = jnp.argmax(exercise, axis=-1)
    disc = jnp.exp(-r * t)
    return jnp.take_along_axis(p * disc[None, :], stop[:, None], axis=-1)[:, 0]


def _hedge_martingale(paths, delta_fits: PolyFit, r, strike, dt,
                      is_call: bool):
    """[n, m] path values of the delta-hedge martingale
    M_t = sum_{k<t} g_k(S_k) * (e^{-r t_{k+1}} S_{k+1} - e^{-r t_k} S_k),
    with g_k = the derivative of the pilot's fitted continuation value,
    clipped to the no-arbitrage delta band.

    M is a TRUE martingale for ANY deterministic per-step functions g_k:
    g_k(S_k) is F_k-measurable (predictable) and the discounted stock is
    an exact martingale under the Euler log scheme, so
    E[g_k(S_k) * Delta_k | F_k] = 0 regardless of how badly g
    approximates the real delta — approximation quality affects only the
    TIGHTNESS of the dual bound, never its validity.  This is the
    primal-dual hedging martingale (the discrete delta hedge of the
    fitted value function), far tighter than a constant-beta stock
    martingale: the hedge tracks Z path by path."""
    n, m = paths.shape
    t = jnp.arange(m, dtype=paths.dtype) * dt
    disc = jnp.exp(-r * t)[None, :]
    s_steps = paths[:, : m - 1]
    zstd = (s_steps - delta_fits.mu[None, :]) / delta_fits.sd[None, :]
    order = delta_fits.coeffs.shape[-1] - 1
    dv = jnp.zeros_like(zstd)
    for k in range(order, 0, -1):        # Horner on the derivative
        dv = dv * zstd + k * delta_fits.coeffs[None, :, k]
    dv = dv / delta_fits.sd[None, :]
    # The value fits cover exercise and continuation regions alike (the
    # regressed value-to-go IS the payoff on exercising paths); the clip
    # to the no-arbitrage delta band guards polynomial extrapolation
    # tails.
    g = (jnp.clip(dv, 0.0, 1.0) if is_call
         else jnp.clip(dv, -1.0, 0.0))
    ds = disc[:, 1:] * paths[:, 1:] - disc[:, : m - 1] * s_steps
    return jnp.concatenate(
        [jnp.zeros((n, 1), paths.dtype),
         jnp.cumsum(g * ds, axis=1)], axis=1)


# Quartic value-to-go fits for the dual's hedge deltas: measured on the
# GBM limit (63 steps, 8k pilot), the duality gap is 19% with the LSM
# continuation quadratic's derivative, 6.2% with a quadratic value fit,
# 4.1% with the quartic (order 5 is flat, and a 64k pilot moves nothing:
# the quartic is bias-limited, not noise-limited; the analytic-delta floor
# is 1.4%, the rest being discrete-hedging variance picked up by the max).
HEDGE_POLY_ORDER = 4


def fit_hedge_deltas(pilot, fits: PolyFit, r, strike, maturity, dt,
                     is_call: bool, axis_name=None) -> PolyFit:
    """Per-step quadratic fits of the VALUE-TO-GO function, whose
    derivatives drive the dual's delta hedge (_hedge_martingale).

    The continuation fits from the LSM backward induction make poor hedge
    deltas — they are trained on ITM rows only and carry the
    value-ratchet's upward bias, and their derivative extrapolates badly
    (measured: 19% duality gap vs 1.4% with the analytic delta on the GBM
    limit).  Instead, regress each step's realized value-to-go — the
    discounted payoff actually collected from step k onward under the
    fitted exercise policy, an unbiased noisy sample of V(S_k) — on S_k
    over ALL pilot paths.  [m-1] PolyFits, vmapped fit_poly_masked."""
    n, m = pilot.shape
    t = jnp.arange(m, dtype=pilot.dtype) * dt
    disc = jnp.exp(-r * t)
    p = payoff(is_call, pilot, strike)
    s_steps = pilot[:, : m - 1]
    cont = eval_poly(fits, s_steps)
    live = step_mask(m - 1, dt, maturity)[None, :]
    ex = (p[:, : m - 1] > ITM_EPS) & (p[:, : m - 1] >= cont) & live
    ex = jnp.concatenate([ex, jnp.ones((n, 1), bool)], axis=1)
    # tau_k = first exercise step >= k (reverse running minimum).
    idx = jnp.where(ex, jnp.arange(m)[None, :], m)
    tau = jax.lax.cummin(idx, axis=1, reverse=True)
    z_at_tau = jnp.take_along_axis(p * disc[None, :], tau, axis=1)
    vtg = z_at_tau / disc[None, :]        # time-k dollars

    ones = jnp.ones((n,), pilot.dtype)

    def one(s_col, y_col):
        return fit_poly_masked(s_col, y_col, ones, HEDGE_POLY_ORDER,
                               axis_name)

    return jax.vmap(one)(s_steps.T, vtg[:, : m - 1].T)


def dual_upper_values(paths, delta_fits: PolyFit, lam, r, strike,
                      maturity, dt, is_call: bool):
    """Per-path duality upper-bound values [n]: max over exercise dates of
    Z_t - lam * M_t with Z_t = e^{-rt} payoff(S_t) and M the delta-hedge
    martingale (_hedge_martingale).

    For ANY scale lam, E[max_t (Z_t - lam M_t)] >= sup_tau E[Z_tau] — the
    Rogers/Haugh-Kogan duality bound — so the streamed mean is a rigorous
    UPPER bound complementing the fitted-policy LSM LOWER bound; lam only
    controls tightness (fit_dual_scale).  Exercise dates mirror
    lsm_policy_value's window: step 0, live steps (t <= maturity), and the
    terminal step always.  The reference's C9 pricer
    (MartingaleOptimizationPricer.cpp:66-117) uses the same dual form but
    with a heuristic NON-martingale poly penalty — a point estimate, not a
    bound; this is the capability upgrade at streaming scale."""
    m = paths.shape[1]
    t = jnp.arange(m, dtype=paths.dtype) * dt
    disc = jnp.exp(-r * t)[None, :]
    z = payoff(is_call, paths, strike) * disc
    mart = _hedge_martingale(paths, delta_fits, r, strike, dt,
                             is_call)
    live = jnp.concatenate([step_mask(m - 1, dt, maturity),
                            jnp.ones((1,), bool)])[None, :]
    vals = jnp.where(live, z - lam * mart, -jnp.inf)
    return jnp.max(vals, axis=1)


def fit_dual_scale(paths, delta_fits: PolyFit, r, strike, maturity, dt,
                   is_call: bool, axis_name=None):
    """Minimize the pilot's dual bound over the hedge scale lam
    (coarse-to-fine grid; the objective is convex in lam — a max of affine
    functions — so two refinement passes land within grid resolution of
    the optimum).  With a mesh axis the per-lam means pool across shards,
    so every shard picks the same lam.

    The per-path arrays (Z and the unit-scale hedge martingale) are
    hoisted out of the sweep, and lams run under lax.map — one [n, m] pass
    per lam instead of a vmapped [n_lams, n, m] blowup (tens of GB at
    production pilot sizes)."""
    from ..ops.reductions import global_mean

    m = paths.shape[1]
    t = jnp.arange(m, dtype=paths.dtype) * dt
    disc = jnp.exp(-r * t)[None, :]
    z = payoff(is_call, paths, strike) * disc
    mart = _hedge_martingale(paths, delta_fits, r, strike, dt,
                             is_call)
    live = jnp.concatenate([step_mask(m - 1, dt, maturity),
                            jnp.ones((1,), bool)])[None, :]

    def obj(lam):
        vals = jnp.where(live, z - lam * mart, -jnp.inf)
        return global_mean(jnp.max(vals, axis=1), axis_name)

    lams = jnp.linspace(0.0, 2.0, 41)
    vals = jax.lax.map(obj, lams)
    i0 = jnp.argmin(vals)

    # If the coarse argmin lands on the upper grid boundary the bracket
    # would silently loosen (the bound stays VALID for any lam, only less
    # tight); extend the search to [2, 10] in that case instead of
    # accepting the edge.  The fine half-width tracks the grid spacing of
    # whichever stage won (0.05 for the base grid, 0.1 for the coarser
    # extension).  lam = 0 is a natural boundary (no hedge), not a cap.
    ext = jnp.linspace(2.0, 10.0, 41)

    def _extended(_):
        ev = jax.lax.map(obj, ext)
        return ext[jnp.argmin(ev)], jnp.asarray(0.1, lams.dtype)

    def _interior(_):
        return lams[i0], jnp.asarray(0.05, lams.dtype)

    l0, half = jax.lax.cond(i0 == lams.shape[0] - 1, _extended, _interior,
                            None)
    fine = l0 + jnp.linspace(-1.0, 1.0, 21) * half
    fvals = jax.lax.map(obj, fine)
    return fine[jnp.argmin(fvals)]


def martingale_control(paths, r, dt):
    """Per-path martingale control variate: e^{-r T} S_T — its expectation
    is EXACTLY S0 under the model's Euler log scheme (the exponential
    compensator is exact and the price Brownian is independent of the
    variance driver, the reference quirk documented in
    rough_volatility.generate_paths_qmc)."""
    m = paths.shape[1]
    return jnp.exp(-r * (m - 1) * dt) * paths[:, -1]


def _pvary(x, axis_name):
    """Mark ``x`` device-varying along ``axis_name`` for shard_map's
    replication tracking (fori_loop carries must match the body's vma type).
    jax.lax.pvary was deprecated in favor of pcast(to='varying') (jax 0.9);
    support both so a jax bump is deliberate, not breaking."""
    if hasattr(jax.lax, "pcast"):
        return jax.lax.pcast(x, axis_name, to="varying")
    return jax.lax.pvary(x, axis_name)  # pragma: no cover - jax < 0.8


# Report order of every Greeks surface (price_and_greeks tuples/rows and
# the CLI JSON keys derive from this): the jvp primal tuple is
# (s0, xi, r, eta, h), permuted so the vega family groups together.
GREEK_ORDER = ("price", "delta", "vega_xi", "vega_eta", "rho_rate",
               "vega_h")


def _greek_jvp_loop(chunk_val, market, count, out_tail, ax):
    """Shared jvp scaffolding of every streaming-Greeks surface: one
    vmapped jax.jvp over the five market basis tangents per chunk (the
    primal is tangent-independent, so vmap computes it once), stacked
    into GREEK_ORDER rows, accumulated with per-chunk second moments
    over a fori_loop.  ``chunk_val(params, i)`` returns the chunk's
    policy-value total(s) with trailing shape ``out_tail`` for market
    params (s0, xi, r, eta, h)."""
    eye = jnp.eye(5, dtype=jnp.float32)
    tangents = tuple(eye[:, j] for j in range(5))

    def body(i, carry):
        tot, sq = carry
        vals, grads = jax.vmap(
            lambda t: jax.jvp(lambda pr: chunk_val(pr, i),
                              (market,), (t,)))(tangents)
        # params (s0, xi, r, eta, h) -> GREEK_ORDER.
        c = jnp.stack([vals[0], grads[0], grads[1], grads[3],
                       grads[2], grads[4]])
        return tot + c, sq + c * c

    init = jnp.zeros((6, *out_tail), jnp.float32)
    if ax is not None:
        init = _pvary(init, ax)
    return jax.lax.fori_loop(0, count, body, (init, init))


def _pilot_stream_keys(key, pathgen_impl: str, rng_impl: str):
    """(pilot, stream) RNG carriers for a fit-then-stream run.

    Pallas carriers are (run_word, stream_index) int32 pairs.  The run
    word (31 bits from the threefry key) separates runs; the stream index
    separates pilot (3<<28, beyond every chunk range) from chunks (start+i
    plus (shard+1)<<20 offsets, bounded by the price()-time guards) — so
    pilot and stream noise can never coincide (no foresight bias) and
    nothing overflows int32."""
    if pathgen_impl == "pallas":
        run = jax.random.randint(key, (), 0, 2**31 - 1, dtype=jnp.int32)
        k_pilot = jnp.stack([run, jnp.int32(3 << 28)])
        k_stream = jnp.stack([run, jnp.int32(0)])
        return k_pilot, k_stream
    if rng_impl != "threefry":
        key = _rekey(key, rng_impl)
    return jax.random.split(key)


def _rekey(key, impl: str):
    """Re-key into the requested PRNG family (e.g. "rbg", XLA's
    hardware-accelerated rng_bit_generator) carrying the FULL key entropy —
    collapsing to one 31-bit seed would collide distinct user keys at
    birthday-2^31 scale."""
    tmpl = jax.random.key_data(jax.random.key(0, impl=impl))
    bits = jax.random.bits(key, tmpl.shape, jnp.uint32)
    return jax.random.wrap_key_data(bits.astype(tmpl.dtype), impl=impl)


def _check_pallas_chunk_range(pathgen_impl: str, n_chunks: int,
                              n_dev: int) -> None:
    """Guard the pallas (run_word, stream_index) seed scheme's ranges: the
    stream-index word reserves a < 2^20 chunk range per shard (shard
    offsets are (index+1) << 20, pilot marker 3 << 28); violating a bound
    would silently duplicate RNG streams across chunks or shards."""
    if pathgen_impl != "pallas":
        return
    if n_chunks >= 1 << 20:
        raise ValueError(
            f"{n_chunks} chunks exceeds the pallas seed scheme's "
            "2^20 range — raise chunk_paths or use pathgen_impl='xla'")
    if n_dev > 256:
        raise ValueError("pallas seed scheme supports <= 256 shards")


def _chunk_stderr(totals, sumsq, m: int, per_chunk: int,
                  center: float = 0.0):
    """Stderr of a per-path streamed mean from its iid per-chunk totals.

    ``totals``/``sumsq`` are float64 scalars or arrays: the sum of the
    ``m`` iid chunk totals and the sum of their squares (accumulated on
    device at one FMA per chunk).  Two honesty caveats shared by every
    streaming surface: with a single chunk there is no variance
    information (stderr = NaN, never a false 0.0), and the on-device f32
    accumulation of c^2 floors the detectable relative chunk spread at
    ~3e-4 — below that the reported stderr clips toward 0.  For plain MC
    that floor only bites near-deterministic deep-ITM payoffs, but a
    control variate puts the TYPICAL spread under it: those surfaces
    accumulate (c - center)^2 around a pilot-derived ``center`` instead
    (the floor then applies to the spread RELATIVE TO the residual
    |total - center|, restoring full resolution whenever the pilot lands
    within ~1e4 chunk-sds of the truth — thousands of sds of slack)."""
    totals = np.asarray(totals, np.float64)
    sumsq = np.asarray(sumsq, np.float64)
    if m < 2:
        return np.full_like(totals, np.nan)
    mean_c = totals / m - center
    var_c = np.maximum(sumsq / m - mean_c ** 2, 0.0) * (m / (m - 1.0))
    return np.sqrt(var_c / m) / per_chunk


def _shard_map_wrappers(mesh, axis_name: str, check_vma: bool = True):
    """(replicated_out, summed_out) builders for running per-shard
    functions under shard_map on a 1-D mesh.

    replicated_out wraps a function whose outputs are replicated across
    shards (e.g. regression fits from psum'd moments) and exposes one
    copy; summed_out wraps a function emitting per-shard partial sums
    (scalars or pytrees thereof) and reduces them.  Shared by
    StreamingPricer and StreamingChainPricer so shard_map plumbing changes
    land in exactly one place.

    ``check_vma=False`` when any per-shard body contains a pallas_call:
    pallas_call outputs carry no vma (varying-across-mesh-axes) type, so
    shard_map's replication tracking rejects them (jax 0.9).  The
    wrappers' out_specs already state the truth (everything
    device-varying along the mesh axis); disabling the checker for those
    bodies loses only the static replication audit, not any collective
    semantics."""
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map
        # jax >= 0.8 shard_map takes check_vma; only pass it when
        # disabling the audit, so the default stays whatever jax ships.
        sm_kw = {} if check_vma else {"check_vma": False}
    except ImportError:  # pragma: no cover - jax < 0.8
        # The pre-0.8 API spells the replication audit check_rep (and
        # predates the vma type system entirely).
        from jax.experimental.shard_map import shard_map
        sm_kw = {} if check_vma else {"check_rep": False}

    def replicated_out(fn, n_in: int):
        sm = shard_map(
            lambda *a: jax.tree.map(lambda x: x[None], fn(*a)),
            mesh=mesh, in_specs=(P(),) * n_in,
            out_specs=P(axis_name), **sm_kw)
        return jax.jit(
            lambda *a: jax.tree.map(lambda x: x[0], sm(*a)))

    def summed_out(fn, n_in: int):
        sm = shard_map(
            lambda *a: jax.tree.map(lambda x: x[None], fn(*a)),
            mesh=mesh, in_specs=(P(),) * n_in,
            out_specs=P(axis_name), **sm_kw)
        return jax.jit(
            lambda *a: jax.tree.map(lambda x: jnp.sum(x, axis=0),
                                    sm(*a)))

    return replicated_out, summed_out


class StreamingPricer:
    """Reusable fit-then-stream pricer: builds its two jitted programs ONCE
    per (market params, contract, config) and reuses them across ``price``
    calls.

    Two compile units total, regardless of path count or call pattern:
      * ``_fit``   — pilot path block + LSM backward induction -> PolyFit;
      * ``_stream``— on-device ``lax.fori_loop`` over chunks with the chunk
        *count as a traced argument* (a dynamic while-loop bound), so the
        final partial call reuses the same executable instead of triggering
        a recompile.  One host dispatch covers ``chunks_per_call`` chunks;
        no path data ever crosses the host boundary, only the accumulated
        payoff sum.
    """

    def __init__(self, s0, xi, h, eta, rho, r, strike, maturity,
                 is_call: bool, config: StreamConfig, mesh=None,
                 axis_name: str = "data"):
        """With ``mesh`` (a 1-D jax.sharding.Mesh), both programs run under
        shard_map: every device generates and prices its own chunk per loop
        step (so one "chunk" means mesh_size * chunk_paths paths), the pilot
        fit pools regression moments across shards with psum, and only
        scalar partial sums cross the ICI — the multi-chip form of the
        BASELINE.md north-star run."""
        dtype = jnp.dtype(config.dtype)
        fgn_dtype = jnp.dtype(config.fgn_matmul_dtype)
        n_steps, dt = config.n_steps, config.dt
        self.config = config
        self.mesh = mesh
        self.n_dev = 1 if mesh is None else mesh.shape[axis_name]

        pathgen_impl = config.pathgen_impl
        qmc_fused = False
        qmc_tiled = None
        if config.qmc:
            # The fused kernels' in-kernel PRNG can't consume a Sobol
            # point set, but their noise_input entries CAN: the QMC
            # planes are built in XLA per chunk (_make_fused_qmc_noise)
            # and fed through the noise-in priced kernels — the
            # single-tile `_priced_kernel_noise_in` where it is eligible,
            # and PAST its step cap the long-horizon slab / factored-DFT
            # noise-in kernels (r04 verdict item 4) — keeping the fused
            # policy/boundary evaluation and MXU fGN synthesis at every
            # horizon the kernels cover.  Everything else about the
            # pricer (keys, pilot, whole-path consumers — bounds,
            # Greeks) rides the XLA generator exactly as before.
            if pathgen_impl == "pallas":
                from . import pathgen_pallas as _pp_q

                eligible = config.fuse_policy and config.poly_order == 2
                if eligible and _pp_q.supports(n_steps,
                                               _resolve_fgn_form(config)):
                    qmc_fused = True
                elif eligible:
                    qmc_tiled = _resolve_tiled_module(config, n_steps,
                                                      fgn_dtype,
                                                      noise_input=True)
                    qmc_fused = qmc_tiled is not None
                if not qmc_fused:
                    # LOUD fallback (no silent ~4x throughput downgrade):
                    # the horizon/config is outside every noise-in fused
                    # kernel, so QMC streams through the XLA generator.
                    logging.getLogger(__name__).warning(
                        "qmc=True with pathgen_impl='pallas': no fused "
                        "noise-in kernel covers n_steps=%d at this config "
                        "(fuse_policy=%s, poly_order=%d, block=%d); the "
                        "QMC stream rides the XLA generator at reduced "
                        "throughput", n_steps, config.fuse_policy,
                        config.poly_order, config.pallas_block_paths)
            pathgen_impl = "xla"
        tiled = None
        if pathgen_impl == "pallas":
            from . import pathgen_pallas

            if pathgen_pallas.supports(n_steps, _resolve_fgn_form(config)):
                pass  # single-tile kernel: everything VMEM-resident
            else:
                # Past the single-tile VMEM cap (512 padded steps
                # spectral, 1024 chol) the resident [s_pad, s_pad]
                # matrices don't fit; a long-horizon kernel module takes
                # over (chol slab by default, factored four-step DFT for
                # spectral/longer horizons).  Beyond even those budgets
                # the XLA generator handles any length (HBM-resident
                # matrices).
                tiled = _resolve_tiled_module(config, n_steps, fgn_dtype)
                if tiled is None:
                    pathgen_impl = "xla"
        single_tile_fused = ((pathgen_impl == "pallas" and tiled is None)
                             or (qmc_fused and qmc_tiled is None))
        if not single_tile_fused and (config.pallas_interleave != 1
                                      or config.pallas_schedule
                                      != "chained"):
            # The interleave/staggered schedules exist only in the
            # SINGLE-TILE fused priced kernel body; a config that
            # resolves to a long-horizon tiled kernel or the XLA
            # generator would silently measure the plain body under an
            # interleave/staggered label (A/B integrity, cf.
            # _resolve_tiled_module's explicit-impl errors).
            raise ValueError(
                f"pallas_interleave={config.pallas_interleave} / "
                f"pallas_schedule={config.pallas_schedule!r} require the "
                f"single-tile fused priced kernel, but n_steps={n_steps} "
                f"at this config resolves to "
                f"{'a long-horizon tiled kernel' if (tiled is not None or qmc_tiled is not None) else 'the XLA generator'}")
        if pathgen_impl == "pallas":
            if tiled is not None:
                tiled_kw = _tiled_maker_kwargs(tiled, config)
                pilot_gen, _ = tiled.make_tiled_pathgen(
                    s0, xi, h, eta, rho, r, n_steps, dt, config.pilot_paths,
                    block_paths=config.pallas_block_paths,
                    fgn_dtype=fgn_dtype, **tiled_kw)
                chunk_gen, _ = tiled.make_tiled_pathgen(
                    s0, xi, h, eta, rho, r, n_steps, dt, config.chunk_paths,
                    block_paths=config.pallas_block_paths,
                    fgn_dtype=fgn_dtype,
                    # Whole-path consumers (the duality-bounds stream)
                    # inherit the pairing at long horizons too; the pilot
                    # stays plain (cf. the single-tile branch).
                    antithetic=config.antithetic, **tiled_kw)
            else:
                pilot_gen = pathgen_pallas.make_pallas_pathgen(
                    s0, xi, h, eta, rho, r, n_steps, dt, config.pilot_paths,
                    block_paths=_fused_block(config, n_steps),
                    fgn_dtype=fgn_dtype, fgn_form=_resolve_fgn_form(config),
                    interpret=config.pallas_interpret)
                chunk_gen = pathgen_pallas.make_pallas_pathgen(
                    s0, xi, h, eta, rho, r, n_steps, dt, config.chunk_paths,
                    block_paths=_fused_block(config, n_steps),
                    fgn_dtype=fgn_dtype, fgn_form=_resolve_fgn_form(config),
                    interpret=config.pallas_interpret,
                    # Whole-path consumers of the chunk stream (the
                    # duality-bounds sides) inherit the pairing; the
                    # pilot stays plain (cf. the XLA branch).
                    antithetic=config.antithetic)
            # Carriers are int32 (run_word, stream_index) pairs; the kernel
            # also folds the grid block id.  Chunk i advances the stream
            # index; the run word never changes within a run.
            next_carrier = lambda seed, i: seed.at[1].add(i)
        elif pathgen_impl == "xla":
            # The PILOT stays plain under antithetic: the policy fit wants
            # the most independent sample it can get, and pairing there
            # would buy nothing (the envelope protects the price against
            # pilot noise anyway).
            pilot_gen = make_chunk_pathgen(
                s0, xi, h, eta, rho, r, n_steps, dt, config.pilot_paths,
                dtype, fgn_dtype, config.cumsum_impl, qmc=config.qmc, qmc_fgn=config.qmc_fgn, qmc_dim=config.qmc_dim,
                fgn_impl=_resolve_fgn_impl(config, n_steps))
            chunk_gen = make_chunk_pathgen(
                s0, xi, h, eta, rho, r, n_steps, dt, config.chunk_paths,
                dtype, fgn_dtype, config.cumsum_impl, qmc=config.qmc, qmc_fgn=config.qmc_fgn, qmc_dim=config.qmc_dim,
                fgn_impl=_resolve_fgn_impl(config, n_steps),
                antithetic=config.antithetic)
            next_carrier = jax.random.fold_in
        else:
            raise ValueError(f"unknown pathgen_impl: {config.pathgen_impl!r}")
        self._pathgen_impl = pathgen_impl
        self._pathgen_tiled = tiled is not None
        self._qmc_fused = qmc_fused
        self._qmc_tiled = qmc_tiled  # long-horizon noise-in module or None

        ax = axis_name if mesh is not None else None
        if mesh is None:
            shard_mix = lambda c: c
        elif pathgen_impl == "pallas":
            # Distinct stream-index block per shard (counts stay < 2^20).
            shard_mix = lambda c: c.at[1].add(
                (jax.lax.axis_index(axis_name) + jnp.int32(1))
                * jnp.int32(1 << 20))
        else:
            shard_mix = lambda c: jax.random.fold_in(
                c, jax.lax.axis_index(axis_name))

        def fit_fn(k):
            pilot = pilot_gen(shard_mix(k))
            _, fits = lsm_fit(pilot, r, strike, maturity, dt, is_call,
                              config.poly_order, axis_name=ax)
            return fits

        def stream_fn(k, fits, start, count):
            k = shard_mix(k)

            def body(i, carry):
                tot, sq = carry
                paths = chunk_gen(next_carrier(k, start + i))
                s, _ = lsm_policy_value(paths, fits, r, strike, maturity,
                                        dt, is_call)
                s = s.astype(jnp.float32)
                # Chunk totals are iid: their second moment gives an exact
                # stderr for the streamed mean (one FMA per chunk; the host
                # aggregates across calls/shards).
                return tot + s, sq + s * s

            init = jnp.zeros((), jnp.float32)
            if ax is not None:
                # Mark the carry device-varying so its type matches the
                # body output under shard_map's replication tracking.
                init = _pvary(init, ax)
            return jax.lax.fori_loop(0, count, body, (init, init))

        self._cv = bool(config.control_variate)
        self._s0 = float(s0)

        _anti_ok = (
            # Fused log-boundary bodies pair in-kernel at EVERY horizon
            # (single-tile, slab, factored DFT — the fGN map is linear in
            # the noise in every factorization, so the partner's plane is
            # a negation; r03 verdict item 3 closed the factored gap) ...
            (pathgen_impl == "pallas"
             and config.fuse_policy and config.poly_order == 2
             and config.policy_form == "boundary")
            # ... and the XLA generator pairs at the noise-plane level, so
            # EVERY whole-path consumer (generic stream, CV, bounds)
            # inherits it.  QMC has its own stratification (no pairing).
            or (pathgen_impl == "xla" and not config.qmc))
        if config.antithetic and not _anti_ok:
            # Loud rejection: silently streaming plain MC under an
            # antithetic config would misreport the estimator.
            raise ValueError(
                "antithetic=True requires either a fused boundary "
                "configuration (pathgen_impl='pallas', fuse_policy, "
                "poly_order=2, policy_form='boundary' — any horizon) or "
                "the XLA generator without QMC")
        if self._cv:
            from ..ops.reductions import global_mean, psum_if

            def fit_fn(k):  # noqa: F811 — CV variant: (fits, beta, center)
                pilot = pilot_gen(shard_mix(k))
                _, fits = lsm_fit(pilot, r, strike, maturity, dt, is_call,
                                  config.poly_order, axis_name=ax)
                av = lsm_policy_path_values(pilot, fits, r, strike,
                                            maturity, dt, is_call)
                cv = martingale_control(pilot, r, dt)
                # Pooled beta: with a mesh, the centered moments psum across
                # shards so every device fits the same (replicated) beta.
                av_m, cv_m = global_mean(av, ax), global_mean(cv, ax)
                cvc = cv - cv_m
                avc = av - av_m
                beta = (psum_if(jnp.sum(cvc * avc), ax)
                        / jnp.maximum(psum_if(jnp.sum(cvc * cvc), ax), 1e-12))
                # Pilot estimate of E[corrected chunk total]: the variance
                # accumulator centers on it, because the CV-corrected
                # spread is ~1e-5 relative — far below the raw f32 c^2
                # floor (see _chunk_stderr) — so the UNcentered sum of
                # squares would cancel to a false stderr = 0.  Replicated
                # (pooled means), so mesh shards center identically.
                center = ((av_m - beta * cv_m)
                          * jnp.float32(config.chunk_paths))
                return fits, beta, center

            def stream_fn(k, fits_beta, start, count):  # noqa: F811
                fits, beta, center = fits_beta
                k = shard_mix(k)

                def body(i, carry):
                    a, c, sq = carry
                    paths = chunk_gen(next_carrier(k, start + i))
                    vals = lsm_policy_path_values(paths, fits, r, strike,
                                                  maturity, dt, is_call)
                    cv = martingale_control(paths, r, dt)
                    da = jnp.sum(vals).astype(jnp.float32)
                    dc = jnp.sum(cv).astype(jnp.float32)
                    # The CV-corrected chunk total a - beta*c is the iid
                    # quantity whose spread sets the (reduced) stderr;
                    # accumulated CENTERED on the pilot estimate (see
                    # fit_fn) so f32 keeps the reduced spread's bits.
                    t = (da - beta.astype(jnp.float32) * dc
                         - center.astype(jnp.float32))
                    return a + da, c + dc, sq + t * t

                zero = jnp.zeros((), jnp.float32)
                if ax is not None:
                    zero = _pvary(zero, ax)
                return jax.lax.fori_loop(0, count, body, (zero, zero, zero))

        if (pathgen_impl == "pallas" and config.fuse_policy
                and config.poly_order == 2 and self._cv):
            # Control variate WITHOUT leaving the fused kernel: the kernel
            # emits (policy payoff sum, e^{-rT} S_T sum) per chunk, so CV
            # users keep the fused-vs-generic throughput edge at both the
            # single-tile and step-tiled horizons.
            from . import pathgen_pallas

            if tiled is not None:
                priced_chunk_cv, _ = tiled.make_tiled_priced_chunk(
                    s0, xi, h, eta, rho, r, strike, maturity, dt,
                    n_steps, config.chunk_paths,
                    block_paths=config.pallas_block_paths,
                    is_call=is_call, fgn_dtype=fgn_dtype, with_cv=True,
                    **_tiled_maker_kwargs(tiled, config, priced=True))
            else:
                priced_chunk_cv, _ = pathgen_pallas.make_pallas_priced_chunk(
                    s0, xi, h, eta, rho, r, strike, maturity, dt, n_steps,
                    config.chunk_paths,
                    block_paths=_fused_block(config, n_steps),
                    is_call=is_call, fgn_dtype=fgn_dtype, with_cv=True,
                    fgn_form=_resolve_fgn_form(config),
                    policy_form=config.policy_form,
                    antithetic=config.antithetic,
                    interleave=config.pallas_interleave,
                    schedule=config.pallas_schedule,
                    interpret=config.pallas_interpret)
            make_rows_cv = _fused_rows_builder(config, tiled, r, strike,
                                               maturity, dt, n_steps,
                                               is_call)

            def stream_fn(k, fits_beta, start, count):  # noqa: F811
                fits, beta, center = fits_beta
                k = shard_mix(k)
                rows = make_rows_cv(fits)
                ex0, p0 = pathgen_pallas.time0_value(fits, s0, strike,
                                                     is_call)

                def body(i, carry):
                    a, c, sq = carry
                    da, dc = priced_chunk_cv(k.at[1].add(start + i), rows)
                    # Corrected total centered on the pilot estimate —
                    # the CV-reduced spread is below the raw f32 c^2
                    # floor (see _chunk_stderr / the XLA CV stream).
                    t = (da - beta.astype(jnp.float32) * dc
                         - center.astype(jnp.float32))
                    return a + da, c + dc, sq + t * t

                zero = jnp.zeros((), jnp.float32)
                if ax is not None:
                    zero = _pvary(zero, ax)
                a, c, sq = jax.lax.fori_loop(0, count, body,
                                             (zero, zero, zero))
                # Time-0 exercise: the run is the deterministic immediate
                # payoff; returning cv == count*chunk*s0 makes the beta
                # correction vanish exactly instead of adding noise (and
                # every corrected chunk total is the same constant, so
                # the centered variance estimate collapses to 0 on the
                # host: sumsq/m == (totals/m - center)^2 exactly).
                n_f = (count * config.chunk_paths).astype(jnp.float32)
                a = jnp.where(ex0, jnp.float32(p0) * n_f, a)
                c = jnp.where(ex0, jnp.float32(self._s0) * n_f, c)
                t0 = ((jnp.float32(p0)
                       - beta.astype(jnp.float32) * jnp.float32(self._s0))
                      * jnp.float32(config.chunk_paths)
                      - center.astype(jnp.float32))
                sq = jnp.where(ex0, count.astype(jnp.float32) * t0 * t0, sq)
                return a, c, sq

        if (pathgen_impl == "pallas" and config.fuse_policy
                and config.poly_order == 2 and not self._cv):
            from . import pathgen_pallas

            if tiled is not None:
                priced_chunk, _ = tiled.make_tiled_priced_chunk(
                    s0, xi, h, eta, rho, r, strike, maturity, dt, n_steps,
                    config.chunk_paths,
                    block_paths=config.pallas_block_paths,
                    is_call=is_call, fgn_dtype=fgn_dtype,
                    **_tiled_maker_kwargs(tiled, config, priced=True))
            else:
                priced_chunk, _ = pathgen_pallas.make_pallas_priced_chunk(
                    s0, xi, h, eta, rho, r, strike, maturity, dt, n_steps,
                    config.chunk_paths,
                    block_paths=_fused_block(config, n_steps),
                    is_call=is_call, fgn_dtype=fgn_dtype,
                    fgn_form=_resolve_fgn_form(config),
                    policy_form=config.policy_form,
                    antithetic=config.antithetic,
                    interleave=config.pallas_interleave,
                    schedule=config.pallas_schedule,
                    interpret=config.pallas_interpret)
            make_rows = _fused_rows_builder(config, tiled, r, strike,
                                            maturity, dt, n_steps, is_call)

            def stream_fn(k, fits, start, count):  # noqa: F811 — fused form
                k = shard_mix(k)
                rows = make_rows(fits)
                ex0, p0 = pathgen_pallas.time0_value(fits, s0, strike,
                                                     is_call)

                def body(i, carry):
                    tot, sq = carry
                    c = priced_chunk(k.at[1].add(start + i), rows)
                    return tot + c, sq + c * c

                init = jnp.zeros((), jnp.float32)
                if ax is not None:
                    init = _pvary(init, ax)
                total, sq = jax.lax.fori_loop(0, count, body, (init, init))
                # Time-0 exercise: every path shares S0, so the whole run
                # collapses to the immediate payoff (lsm_policy_value's
                # column 0, handled outside the kernel); every chunk total
                # is the same constant, so the variance estimate is 0.
                all0 = jnp.float32(p0) * (count * config.chunk_paths
                                          ).astype(jnp.float32)
                c0 = jnp.float32(p0) * jnp.float32(config.chunk_paths)
                sq0 = count.astype(jnp.float32) * c0 * c0
                return (jnp.where(ex0, all0, total),
                        jnp.where(ex0, sq0, sq))

        if qmc_fused:
            # QMC through the FUSED kernel: the Sobol planes are built in
            # XLA per chunk (threefry keys — pathgen_impl is "xla" here)
            # and consumed by the noise_input fused kernel, so qmc=True
            # keeps the in-VMEM policy evaluation and MXU fGN matmul
            # instead of dropping to the XLA policy stream.  The variance
            # win then COMPOSES with fused-kernel throughput (r03 verdict
            # item 1).  CV composes too (the kernel's with_cv lane).
            from . import pathgen_pallas

            if qmc_tiled is not None:
                # Long-horizon fused QMC: the slab / factored noise-in
                # priced kernels take the same [planes, chunk, width]
                # stack; the factored kernel's planes are m2-wide
                # frequency draws (see _make_fused_qmc_noise).
                from . import pathgen_pallas_factored as _ppf_q

                tkw = _tiled_maker_kwargs(qmc_tiled, config, priced=True)
                priced_q, q_s_pad = qmc_tiled.make_tiled_priced_chunk(
                    s0, xi, h, eta, rho, r, strike, maturity, dt, n_steps,
                    config.chunk_paths,
                    block_paths=config.pallas_block_paths,
                    is_call=is_call, noise_input=True,
                    fgn_dtype=fgn_dtype, with_cv=self._cv, **tkw)
                if qmc_tiled is _ppf_q:
                    from ..ops.fgn import next_pow2 as _np2

                    noise_fn = _make_fused_qmc_noise(
                        config, n_steps, _np2(n_steps), "factored", dt)
                else:
                    noise_fn = _make_fused_qmc_noise(
                        config, n_steps, q_s_pad,
                        _resolve_fgn_form(config), dt)
            else:
                q_form = _resolve_fgn_form(config)
                priced_q, q_s_pad = pathgen_pallas.make_pallas_priced_chunk(
                    s0, xi, h, eta, rho, r, strike, maturity, dt, n_steps,
                    config.chunk_paths,
                    block_paths=_fused_block(config, n_steps),
                    is_call=is_call, noise_input=True, fgn_dtype=fgn_dtype,
                    with_cv=self._cv, fgn_form=q_form,
                    policy_form=config.policy_form,
                    interleave=config.pallas_interleave,
                    schedule=config.pallas_schedule,
                    interpret=config.pallas_interpret)
                noise_fn = _make_fused_qmc_noise(config, n_steps, q_s_pad,
                                                 q_form, dt)
            make_rows_q = _fused_rows_builder(config, qmc_tiled, r, strike,
                                              maturity, dt, n_steps,
                                              is_call)
            if self._cv:
                def stream_fn(k, fits_beta, start, count):  # noqa: F811
                    fits, beta, center = fits_beta
                    k = shard_mix(k)
                    rows = make_rows_q(fits)
                    ex0, p0 = pathgen_pallas.time0_value(fits, s0, strike,
                                                         is_call)

                    def body(i, carry):
                        a, c, sq = carry
                        da, dc = priced_q(
                            noise_fn(jax.random.fold_in(k, start + i)),
                            rows)
                        t = (da - beta.astype(jnp.float32) * dc
                             - center.astype(jnp.float32))
                        return a + da, c + dc, sq + t * t

                    zero = jnp.zeros((), jnp.float32)
                    if ax is not None:
                        zero = _pvary(zero, ax)
                    a, c, sq = jax.lax.fori_loop(0, count, body,
                                                 (zero, zero, zero))
                    # Time-0 exercise: cf. the fused CV stream above.
                    n_f = (count * config.chunk_paths).astype(jnp.float32)
                    a = jnp.where(ex0, jnp.float32(p0) * n_f, a)
                    c = jnp.where(ex0, jnp.float32(self._s0) * n_f, c)
                    t0 = ((jnp.float32(p0) - beta.astype(jnp.float32)
                           * jnp.float32(self._s0))
                          * jnp.float32(config.chunk_paths)
                          - center.astype(jnp.float32))
                    sq = jnp.where(ex0,
                                   count.astype(jnp.float32) * t0 * t0, sq)
                    return a, c, sq
            else:
                def stream_fn(k, fits, start, count):  # noqa: F811
                    k = shard_mix(k)
                    rows = make_rows_q(fits)
                    ex0, p0 = pathgen_pallas.time0_value(fits, s0, strike,
                                                         is_call)

                    def body(i, carry):
                        tot, sq = carry
                        c = priced_q(
                            noise_fn(jax.random.fold_in(k, start + i)),
                            rows)
                        return tot + c, sq + c * c

                    init = jnp.zeros((), jnp.float32)
                    if ax is not None:
                        init = _pvary(init, ax)
                    total, sq = jax.lax.fori_loop(0, count, body,
                                                  (init, init))
                    all0 = jnp.float32(p0) * (count * config.chunk_paths
                                              ).astype(jnp.float32)
                    c0 = jnp.float32(p0) * jnp.float32(config.chunk_paths)
                    sq0 = count.astype(jnp.float32) * c0 * c0
                    return (jnp.where(ex0, all0, total),
                            jnp.where(ex0, sq0, sq))

        # --- streaming Greeks machinery (XLA generator, mesh-capable) -----
        # Forward-mode AD through the chunk loop: one tangent per market
        # input, O(chunk) memory at any path count (reverse mode would have
        # to checkpoint every chunk).  The exercise policy (pilot fits) is
        # held fixed — the envelope derivative, standard for LSM Greeks.
        # Dedicated traced-H builds (never reused from the price path):
        # Hurst joins the AD surface, so the in-graph spectral build is
        # mandatory here regardless of the price path's generator.
        xla_gen = make_chunk_pathgen(
            s0, xi, h, eta, rho, r, n_steps, dt, config.chunk_paths, dtype,
            fgn_dtype, config.cumsum_impl, qmc=config.qmc, qmc_fgn=config.qmc_fgn, qmc_dim=config.qmc_dim,
            fgn_impl="matmul", traced_h=True,
            # jvp tangents of paired paths are a valid paired estimator
            # (the pairing lives in the noise; the tangents are w.r.t.
            # market params) — XLA-config Greeks inherit antithetic.
            # Pallas configs reject antithetic Greeks instead (their fast
            # path is the unpaired fused kernel), so this gen never runs
            # paired there.
            antithetic=config.antithetic)
        xla_pilot = make_chunk_pathgen(
            s0, xi, h, eta, rho, r, n_steps, dt, config.pilot_paths, dtype,
            fgn_dtype, config.cumsum_impl, qmc=config.qmc, qmc_fgn=config.qmc_fgn, qmc_dim=config.qmc_dim,
            fgn_impl="matmul", traced_h=True)
        self._market = (float(s0), float(xi), float(r), float(eta),
                        float(h))

        # Greeks always ride threefry keys (the AD surface is the XLA
        # generator), so their shard mix is key-based even when the price
        # path uses pallas carriers.
        if mesh is None:
            xla_shard_mix = lambda c: c
        else:
            xla_shard_mix = lambda c: jax.random.fold_in(
                c, jax.lax.axis_index(axis_name))

        def greek_fit_fn(k):
            _, fits = lsm_fit(xla_pilot(xla_shard_mix(k)), r, strike,
                              maturity, dt, is_call, config.poly_order,
                              axis_name=ax)
            return fits

        def greek_stream_fn(k, fits, start, count, market):
            k = xla_shard_mix(k)
            # One vmapped jvp over the five basis tangents PER CHUNK
            # (_greek_jvp_loop): the primal computation is tangent-
            # independent, so vmap leaves it unbatched (computed once)
            # and only the tangent path runs x5 — ~primal + 5 tangents
            # instead of 5 x (primal + tangent).  (jax.linearize would
            # share the primal too, but it has to store per-iteration
            # residuals of the chunk fori_loop — the O(n_chunks * chunk)
            # memory this streaming design exists to avoid.)  Running the
            # jvp inside the chunk loop (rather than around it) exposes
            # the iid per-chunk totals of every output, whose second
            # moments give the Greeks their own standard errors — same
            # estimator, same FLOPs, richer carry.

            def chunk_val(params, i):
                s0_, xi_, r_, eta_, h_ = params
                paths = xla_gen.with_params(
                    jax.random.fold_in(k, start + i), s0_, xi_, r_, eta_,
                    h_=h_)
                s, _ = lsm_policy_value(paths, fits, r_, strike,
                                        maturity, dt, is_call)
                return s.astype(jnp.float32)

            return _greek_jvp_loop(chunk_val, market, count, (), ax)

        # --- fused-kernel Greeks fast path --------------------------------
        # The chol + log-boundary fused kernel computes all six outputs
        # (price, delta, vega_xi, vega_eta, rho_rate, vega_h) in VMEM with
        # hand-rolled forward tangents (pathgen_pallas._greeks_body) —
        # measured ~5x the XLA jvp stream.  Eligible exactly where the
        # fused priced kernel runs with the boundary policy at single-tile
        # horizons; everywhere else price_and_greeks keeps the jvp stream.
        fused_greek_fns = None
        if (pathgen_impl == "pallas" and tiled is None
                and config.fuse_policy and config.poly_order == 2
                and config.policy_form == "boundary"
                and _resolve_fgn_form(config) == "chol" and not config.qmc):
            from . import pathgen_pallas

            # Lt' AND dLt'/dH resident: the greeks kernel needs the
            # two-matrix (spectral) VMEM cap even in chol form —
            # 513..1024-step chol configs price single-tile but keep the
            # jvp stream for Greeks.
            fused_greeks_ok = pathgen_pallas.supports(n_steps, "spectral")
        else:
            fused_greeks_ok = False
        if fused_greeks_ok:
            greeks_chunk, _ = pathgen_pallas.make_pallas_greeks_chunk(
                s0, xi, h, eta, rho, r, strike, maturity, dt, n_steps,
                config.chunk_paths,
                block_paths=_fused_block(config, n_steps),
                is_call=is_call, fgn_dtype=fgn_dtype,
                antithetic=config.antithetic,
                interpret=config.pallas_interpret)

            def fused_greek_fit_fn(k):
                pilot = pilot_gen(shard_mix(k))
                _, fits = lsm_fit(pilot, r, strike, maturity, dt, is_call,
                                  config.poly_order, axis_name=ax)
                return fits

            # Same table pipeline as the price stream (policy_form ==
            # "boundary" by eligibility), so a table-construction change
            # can never diverge the Greeks' policy from the price path's.
            make_greek_rows = _fused_rows_builder(
                config, None, r, strike, maturity, dt, n_steps, is_call)

            def fused_greek_stream_fn(k, fits, start, count):
                k = shard_mix(k)
                rows = make_greek_rows(fits)
                ex0, p0 = pathgen_pallas.time0_value(fits, s0, strike,
                                                     is_call)

                def body(i, carry):
                    tot, sq = carry
                    c = greeks_chunk(k.at[1].add(start + i), rows)
                    return tot + c, sq + c * c

                init = jnp.zeros((6,), jnp.float32)
                if ax is not None:
                    init = _pvary(init, ax)
                tot, sq = jax.lax.fori_loop(0, count, body, (init, init))
                # Time-0 exercise: V = p0 deterministically — only delta
                # survives (p0 has no xi/r/eta/h dependence; d ls/d s0 at
                # t = 0 gives payoff' = +-1).
                c0 = jnp.asarray(
                    [p0, 1.0 if is_call else -1.0, 0.0, 0.0, 0.0, 0.0],
                    jnp.float32)
                n_f = (count * config.chunk_paths).astype(jnp.float32)
                per_chunk = c0 * jnp.float32(config.chunk_paths)
                tot = jnp.where(ex0, c0 * n_f, tot)
                sq = jnp.where(ex0,
                               count.astype(jnp.float32)
                               * per_chunk * per_chunk, sq)
                return tot, sq

            fused_greek_fns = (fused_greek_fit_fn, fused_greek_stream_fn)

        # --- streaming duality bounds: LSM lower + dual upper ------------
        # Same chunks price both sides: the fitted-policy value (lower
        # bound) and the beta-martingale dual (upper bound,
        # dual_upper_values) — a rigorous price bracket at any path count.
        def bounds_fit_fn(k):
            from ..ops.reductions import global_mean

            pilot = pilot_gen(shard_mix(k))
            _, fits = lsm_fit(pilot, r, strike, maturity, dt, is_call,
                              config.poly_order, axis_name=ax)
            deltas = fit_hedge_deltas(pilot, fits, r, strike, maturity, dt,
                                      is_call, axis_name=ax)
            lam = fit_dual_scale(pilot, deltas, r, strike, maturity, dt,
                                 is_call, axis_name=ax)
            # Pilot estimates of E[chunk total] for both sides: the dual
            # upper's chunk spread is SMALL by construction (martingale
            # control), often under the raw f32 c^2 floor — the variance
            # accumulators center on these (cf. the CV stream's fix).
            lv = lsm_policy_path_values(pilot, fits, r, strike, maturity,
                                        dt, is_call)
            uv = dual_upper_values(pilot, deltas, lam, r, strike,
                                   maturity, dt, is_call)
            cc = jnp.stack([global_mean(lv, ax), global_mean(uv, ax)]
                           ) * jnp.float32(config.chunk_paths)
            return fits, deltas, lam, cc

        def bounds_stream_fn(k, fits_lam, start, count):
            fits, deltas, lam, cc = fits_lam
            k = shard_mix(k)
            lo_c, up_c = cc[0].astype(jnp.float32), cc[1].astype(jnp.float32)

            def body(i, carry):
                lo, up, lsq, usq = carry
                paths = chunk_gen(next_carrier(k, start + i))
                s, _ = lsm_policy_value(paths, fits, r, strike, maturity,
                                        dt, is_call)
                d = jnp.sum(dual_upper_values(paths, deltas, lam, r,
                                              strike, maturity, dt,
                                              is_call))
                s = s.astype(jnp.float32)
                d = d.astype(jnp.float32)
                return (lo + s, up + d,
                        lsq + (s - lo_c) * (s - lo_c),
                        usq + (d - up_c) * (d - up_c))

            zero = jnp.zeros((), jnp.float32)
            if ax is not None:
                zero = _pvary(zero, ax)
            return jax.lax.fori_loop(0, count, body,
                                     (zero, zero, zero, zero))

        self._fused_greek_fit = self._fused_greek_stream = None
        if mesh is None:
            self._fit = jax.jit(fit_fn)
            self._stream = jax.jit(stream_fn)
            self._greek_fit = jax.jit(greek_fit_fn)
            self._greek_stream = jax.jit(greek_stream_fn)
            self._bounds_fit = jax.jit(bounds_fit_fn)
            self._bounds_stream = jax.jit(bounds_stream_fn)
            if fused_greek_fns is not None:
                self._fused_greek_fit = jax.jit(fused_greek_fns[0])
                self._fused_greek_stream = jax.jit(fused_greek_fns[1])
        else:
            replicated_out, summed_out = _shard_map_wrappers(
                mesh, axis_name,
                check_vma=not (pathgen_impl == "pallas" or qmc_fused))
            self._fit = replicated_out(fit_fn, 1)
            self._stream = summed_out(stream_fn, 4)
            self._greek_fit = replicated_out(greek_fit_fn, 1)
            self._greek_stream = summed_out(greek_stream_fn, 5)
            self._bounds_fit = replicated_out(bounds_fit_fn, 1)
            self._bounds_stream = summed_out(bounds_stream_fn, 4)
            if fused_greek_fns is not None:
                self._fused_greek_fit = replicated_out(fused_greek_fns[0], 1)
                self._fused_greek_stream = summed_out(fused_greek_fns[1], 4)

    def _keys(self, key):
        return _pilot_stream_keys(key, self._pathgen_impl,
                                  self.config.rng_impl)

    def price(self, key, progress=None, n_paths: Optional[int] = None,
              with_stderr: bool = False):
        """Price on ``n_paths`` (default ``config.n_paths``) fresh paths
        derived from ``key``.  Any multiple of ``chunk_paths`` (times the
        mesh size when sharded) reuses the same compiled programs.

        ``with_stderr=True`` returns (price, stderr): the standard error
        of the streamed mean from the empirical variance of the iid
        per-chunk totals (see _chunk_stderr for the caveats) — for the
        control-variate configuration the variance is that of the
        CORRECTED chunk totals, so the reported bar reflects the CV's
        variance reduction.  Conditional on the pilot's fitted policy, the
        standard LSM convention."""
        config = self.config
        if n_paths is None:
            n_paths = config.n_paths
        per_step = config.chunk_paths * self.n_dev
        n_chunks, rem = divmod(n_paths, per_step)
        if rem:
            raise ValueError(
                f"n_paths={n_paths} not divisible by chunk_paths * devices="
                f"{per_step}")
        _check_pallas_chunk_range(self._pathgen_impl, n_chunks, self.n_dev)
        k_pilot, k_stream = self._keys(key)
        fits = self._fit(k_pilot)
        m = n_chunks * self.n_dev

        # Host accumulation in float64: each on-device call sums at most
        # chunks_per_call chunks in float32 (bounded magnitude); the
        # cross-call reduction happens here at full precision.
        if self._cv:
            amer = cv = sq = 0.0
            done = 0
            while done < n_chunks:
                count = min(config.chunks_per_call, n_chunks - done)
                a, c, q = self._stream(k_stream, fits, done, count)
                amer += float(a)
                cv += float(c)
                sq += float(q)
                done += count
                if progress is not None:
                    progress(done, n_chunks)
            beta = float(fits[1])
            value = amer / n_paths - beta * (cv / n_paths - self._s0)
            if not with_stderr:
                return value
            # sq was accumulated centered on the pilot estimate fits[2]
            # (see the CV fit_fn) — without the centering the CV-reduced
            # chunk spread falls below _chunk_stderr's raw f32 floor and
            # the bar collapses to a false 0.
            se = _chunk_stderr(amer - beta * cv, sq, m, config.chunk_paths,
                               center=float(fits[2]))
            return value, float(se)

        total = sq = 0.0
        done = 0
        while done < n_chunks:
            count = min(config.chunks_per_call, n_chunks - done)
            t, q = self._stream(k_stream, fits, done, count)
            total += float(t)
            sq += float(q)
            done += count
            if progress is not None:
                progress(done, n_chunks)
        if not with_stderr:
            return total / n_paths
        return (total / n_paths,
                float(_chunk_stderr(total, sq, m, config.chunk_paths)))

    def price_with_bounds(self, key, n_paths: Optional[int] = None,
                          with_stderr: bool = False):
        """(lower, upper): a rigorous price bracket from the same streamed
        chunks — the fitted-policy LSM value (a lower bound: any concrete
        stopping rule under-exercises the optimum) and the beta-martingale
        dual (an upper bound for ANY beta, see dual_upper_values), beta
        tuned on the pilot.  The bracket width is the duality gap, a
        computable certificate of pricing accuracy no point estimator
        offers — including the reference's four (PredictionGen.cpp:788-791
        averages heuristics with no error bar).

        ``with_stderr=True`` returns (lower, upper, lower_se, upper_se):
        per-bound standard errors from the iid per-chunk totals
        (_chunk_stderr caveats apply), so the MC noise on each end of the
        bracket is distinguishable from the duality gap itself."""
        config = self.config
        if n_paths is None:
            n_paths = config.n_paths
        per_step = config.chunk_paths * self.n_dev
        n_chunks, rem = divmod(n_paths, per_step)
        if rem:
            raise ValueError(
                f"n_paths={n_paths} not divisible by chunk_paths * devices="
                f"{per_step}")
        _check_pallas_chunk_range(self._pathgen_impl, n_chunks, self.n_dev)
        k_pilot, k_stream = self._keys(key)
        fits_lam = self._bounds_fit(k_pilot)

        lo = up = lsq = usq = 0.0
        done = 0
        while done < n_chunks:
            count = min(config.chunks_per_call, n_chunks - done)
            a, b, ql, qu = self._bounds_stream(k_stream, fits_lam, done,
                                               count)
            lo += float(a)
            up += float(b)
            lsq += float(ql)
            usq += float(qu)
            done += count
        if not with_stderr:
            return lo / n_paths, up / n_paths
        m = n_chunks * self.n_dev
        per = config.chunk_paths
        # sq accumulators are centered on the pilot estimates (the dual
        # upper's spread sits under the raw f32 floor — see
        # bounds_fit_fn / _chunk_stderr's center contract).
        cc = np.asarray(fits_lam[3], np.float64)
        return (lo / n_paths, up / n_paths,
                float(_chunk_stderr(lo, lsq, m, per, center=cc[0])),
                float(_chunk_stderr(up, usq, m, per, center=cc[1])))

    def price_and_greeks(self, key, n_paths: Optional[int] = None,
                         with_stderr: bool = False):
        """(price, delta, vega_xi, vega_eta, rho_rate, vega_h) at
        streaming scale: forward-mode pathwise derivatives w.r.t.
        (s0, xi, r, eta, h) accumulated chunk by chunk — Greeks on 1e8+
        paths in O(chunk) memory, with the exercise policy fixed from the
        pilot fit.  vega_eta (vol-of-vol sensitivity) rides the
        eta-linearity of the fGN; vega_h (roughness sensitivity,
        completing the Greek set) rides the traced-H in-graph spectral
        build (make_chunk_pathgen traced_h) — only the
        distribution-irrelevant rho has no derivative.  On the fused
        chol + log-boundary single-tile configuration the whole
        computation runs as hand-rolled in-kernel tangents instead
        (pathgen_pallas._greeks_body, ~5x the jvp stream; vega_h rides
        a host f64 dLt/dH matrix); every other configuration uses
        forward-mode jvp through the XLA generator (threefry keys)
        regardless of ``pathgen_impl``.  With a mesh, chunks shard
        across devices (both paths compose with shard_map; partial sums
        stack and reduce on the host).
        ``with_stderr=True`` returns (greeks_tuple, stderr_tuple): each
        output's standard error from its iid per-chunk totals
        (_chunk_stderr caveats apply) — the same per-chunk jvp exposes
        them at one FMA per output per chunk.  No reference
        equivalent."""
        config = self.config
        # antithetic needs no special-casing here: the fused Greeks
        # kernel pairs in-kernel (_tangent_planes) and the jvp stream's
        # generator pairs at the noise level, so every selection path
        # honors the config's estimator.
        if n_paths is None:
            n_paths = config.n_paths
        n_chunks, rem = divmod(n_paths, config.chunk_paths * self.n_dev)
        if rem:
            raise ValueError(
                f"n_paths={n_paths} not divisible by chunk_paths * devices="
                f"{config.chunk_paths * self.n_dev}")
        if self._fused_greek_stream is not None:
            # Fused-kernel fast path (chol + log-boundary single-tile
            # configs): pallas carriers, in-kernel tangents.
            _check_pallas_chunk_range("pallas", n_chunks, self.n_dev)
            k_pilot, k_stream = self._keys(key)
            fits = self._fused_greek_fit(k_pilot)
            step = lambda done, count: self._fused_greek_stream(
                k_stream, fits, done, count)
        else:
            k_pilot, k_stream = jax.random.split(key)
            fits = self._greek_fit(k_pilot)
            market = tuple(jnp.float32(v) for v in self._market)
            step = lambda done, count: self._greek_stream(
                k_stream, fits, done, count, market)

        totals = np.zeros(6, np.float64)
        sumsq = np.zeros(6, np.float64)
        done = 0
        while done < n_chunks:
            count = min(config.chunks_per_call, n_chunks - done)
            t, q = jax.device_get(step(done, count))
            totals += np.asarray(t, np.float64)
            sumsq += np.asarray(q, np.float64)
            done += count
        out = tuple(float(v) for v in totals / n_paths)
        if not with_stderr:
            return out
        se = _chunk_stderr(totals, sumsq, n_chunks * self.n_dev,
                           config.chunk_paths)
        return out, tuple(float(v) for v in se)


class StreamingChainPricer:
    """Price a whole strike strip on SHARED paths — the serving shape of a
    production pricer (one underlying, one expiry, K strikes).

    Path generation is the dominant cost; sharing it across the chain makes
    K strikes cost barely more than one.  The pilot fit vmaps the LSM
    backward induction over strikes (one PolyFit per strike), and each
    streamed chunk evaluates all K exercise policies on the same path
    block.  Estimates across strikes are positively correlated (same
    draws), which is exactly what a smooth implied-vol smile wants.

    With ``pathgen_impl="pallas"`` (and the fused-kernel conditions:
    poly_order 2, fuse_policy, n_steps within the single-tile VMEM cap) the
    stream runs the fused K-policy chain kernel
    (pathgen_pallas.make_pallas_priced_chain): ONE in-VMEM path block per
    chunk evaluated against a [K, 8, s_pad] policy table, so K strikes pay
    path generation once.  Otherwise the portable XLA generator evaluates
    the K policies vmapped.  With ``mesh`` (1-D), chunks shard across
    devices and pilot regression moments psum — same scheme as
    StreamingPricer.

    No reference equivalent (the reference prices each CSV row with its own
    fresh 250-path simulation, PredictionGen.cpp:718-737).
    """

    def __init__(self, s0, xi, h, eta, rho, r, strikes, maturity,
                 is_call: bool, config: StreamConfig, mesh=None,
                 axis_name: str = "data", bucketed: bool = False,
                 traced_h: bool = False, traced_market: bool = False):
        """``traced_market=True`` (bucketed only) makes the WHOLE market —
        s0, xi, r, eta, AND the Hurst exponent — traced per-call inputs
        (``price(..., market=, hurst=)``): the spectral matrices build
        in-graph from traced H (make_chunk_pathgen traced_h) and the
        other parameters ride gen_with_params / the traced discounting in
        lsm_fit/lsm_policy_value.  A serving process then compiles ONE
        program pair per (step bucket, strip bucket, call/put) SHAPE
        class, and every quote — per-tick spot updates, intraday H/xi
        recalibration, fresh strikes, fresh expiries, fresh path
        budgets — reprices against it (cli/price.py --serve).
        ``traced_h=True`` is the backwards-compatible alias (it traces
        the full market too; only rho stays baked, being distributionally
        inert — see make_chunk_pathgen).

        ``bucketed=True`` compiles the pricer at config.n_steps as a
        step BUCKET: ``price(..., n_steps_live=, maturity=)`` then prices
        any contract with n_steps_live <= n_steps against the same
        compiled programs — paths stay flat past the live horizon
        (make_chunk_pathgen n_live) and the policy's terminal exercise is
        forced at the live step (lsm_policy_path_values n_steps_live), so
        the padded program prices exactly like an exact-shape one.  A
        whole option board then costs one compile per bucket instead of
        one per distinct expiry (the serving analogue of the pipeline's
        pow2 dte quantization).  Forces the XLA generator (the fused
        kernels bake their step count)."""
        dtype = jnp.dtype(config.dtype)
        fgn_dtype = jnp.dtype(config.fgn_matmul_dtype)
        n_steps, dt = config.n_steps, config.dt
        self.config = config
        self.mesh = mesh
        self.n_dev = 1 if mesh is None else mesh.shape[axis_name]
        self.strikes = jnp.asarray(strikes, dtype)
        strikes_f = [float(v) for v in np.asarray(strikes)]
        n_k = len(strikes_f)
        self._bucketed = bool(bucketed)
        traced_market = bool(traced_market or traced_h)
        self._traced_market = traced_market
        self._market_defaults = dict(s0=float(s0), xi=float(xi),
                                     r=float(r), eta=float(eta),
                                     hurst=float(h))
        self._maturity = float(maturity)
        if traced_market and not bucketed:
            raise ValueError("traced_market/traced_h require "
                             "bucketed=True (the serving configuration)")

        pathgen_impl = config.pathgen_impl
        if pathgen_impl not in ("xla", "pallas"):
            # Same loud rejection as StreamingPricer: a typo'd impl must
            # not silently price through the XLA path.
            raise ValueError(f"unknown pathgen_impl: {pathgen_impl!r}")
        if config.control_variate:
            raise ValueError(
                "control_variate is not supported by the chain pricer: the "
                "fused K-strike kernel emits per-strike payoff sums only "
                "(no control sums), and silently returning plain-MC stderrs "
                "would misattribute the missing variance reduction.  Use "
                "StreamingPricer per strike for CV estimates.")
        qmc_fused = False
        if config.qmc or bucketed:
            if config.qmc and not bucketed and pathgen_impl == "pallas":
                # Non-bucketed QMC chains keep the fused K-policy kernel
                # via its noise_input entry (cf. StreamingPricer's
                # qmc_fused path).  Bucketed/serving chains stay XLA by
                # construction: the fused kernels bake their step count,
                # and bucketing exists precisely to trace it.
                from . import pathgen_pallas as _pp_q

                # The chain kernel keeps the conservative SPECTRAL cap
                # for both fGN forms (see make_pallas_priced_chain).
                qmc_fused = (config.fuse_policy and config.poly_order == 2
                             and _pp_q.supports(n_steps))
            pathgen_impl = "xla"  # keys/pilot/Greeks ride the XLA generator
        if pathgen_impl == "pallas":
            from . import pathgen_pallas

            if not (pathgen_pallas.supports(n_steps) and config.fuse_policy
                    and config.poly_order == 2):
                pathgen_impl = "xla"
        if config.antithetic and not (
                (pathgen_impl == "pallas"
                 and config.chain_policy_form == "boundary")
                or (pathgen_impl == "xla" and not config.qmc)):
            # Same loud-rejection contract as StreamingPricer: pairing
            # exists in the fused boundary chain kernel and the XLA
            # generator — silently streaming plain MC would misreport
            # the estimator.
            raise ValueError(
                "antithetic=True on the chain pricer requires the fused "
                "boundary chain kernel (pathgen_impl='pallas', "
                "fuse_policy, poly_order=2, chain_policy_form='boundary', "
                "n_steps within the chain kernel cap) or the XLA "
                "generator without QMC (incl. bucketed/serving chains)")
        self._pathgen_impl = pathgen_impl
        self._qmc_fused = qmc_fused

        ax = axis_name if mesh is not None else None
        if mesh is None:
            shard_mix = lambda c: c
        elif pathgen_impl == "pallas":
            shard_mix = lambda c: c.at[1].add(
                (jax.lax.axis_index(axis_name) + jnp.int32(1))
                * jnp.int32(1 << 20))
        else:
            shard_mix = lambda c: jax.random.fold_in(
                c, jax.lax.axis_index(axis_name))

        if pathgen_impl == "pallas":
            pilot_gen = pathgen_pallas.make_pallas_pathgen(
                s0, xi, h, eta, rho, r, n_steps, dt, config.pilot_paths,
                block_paths=config.pallas_block_paths, fgn_dtype=fgn_dtype,
                fgn_form=_resolve_fgn_form(config),
                interpret=config.pallas_interpret)
            chain_chunk, _ = pathgen_pallas.make_pallas_priced_chain(
                s0, xi, h, eta, rho, r, strikes_f, maturity, dt, n_steps,
                config.chunk_paths, block_paths=config.pallas_block_paths,
                is_call=is_call, fgn_dtype=fgn_dtype,
                fgn_form=_resolve_fgn_form(config),
                policy_form=config.chain_policy_form,
                antithetic=config.antithetic,
                sweep_impl=config.chain_sweep_impl,
                interpret=config.pallas_interpret)
        else:
            pilot_gen = make_chunk_pathgen(
                s0, xi, h, eta, rho, r, n_steps, dt, config.pilot_paths,
                dtype, fgn_dtype, config.cumsum_impl, qmc=config.qmc, qmc_fgn=config.qmc_fgn, qmc_dim=config.qmc_dim,
                fgn_impl=_resolve_fgn_impl(config, n_steps),
                traced_h=traced_market)
            chunk_gen = make_chunk_pathgen(
                s0, xi, h, eta, rho, r, n_steps, dt, config.chunk_paths,
                dtype, fgn_dtype, config.cumsum_impl, qmc=config.qmc, qmc_fgn=config.qmc_fgn, qmc_dim=config.qmc_dim,
                fgn_impl=_resolve_fgn_impl(config, n_steps),
                traced_h=traced_market,
                # Noise-level pairing (pilot stays plain, cf.
                # StreamingPricer): bucketed/serving chains and their
                # traced-market jvp Greeks all inherit it.
                antithetic=config.antithetic)

        if traced_market:
            def fit_fn(k, strikes_, n_live, mat, mkt):
                s0_, xi_, r_, eta_, h_ = mkt
                pilot = pilot_gen.with_params(shard_mix(k), s0_, xi_, r_,
                                              eta_, n_live, h_=h_)

                def one(strike):
                    _, fits = lsm_fit(pilot, r_, strike, mat, dt, is_call,
                                      config.poly_order, axis_name=ax,
                                      n_steps=n_live)
                    return fits

                return jax.vmap(one)(strikes_)
        elif bucketed:
            def fit_fn(k, strikes_, n_live, mat):
                pilot = pilot_gen(shard_mix(k), n_live)

                def one(strike):
                    _, fits = lsm_fit(pilot, r, strike, mat, dt, is_call,
                                      config.poly_order, axis_name=ax,
                                      n_steps=n_live)
                    return fits

                return jax.vmap(one)(strikes_)
        else:
            def fit_fn(k, strikes_):
                pilot = pilot_gen(shard_mix(k))

                def one(strike):
                    _, fits = lsm_fit(pilot, r, strike, maturity, dt,
                                      is_call, config.poly_order,
                                      axis_name=ax)
                    return fits

                return jax.vmap(one)(strikes_)

        if pathgen_impl == "pallas":
            from . import pathgen_pallas as _pp

            row_fn = (_pp.boundary_rows
                      if config.chain_policy_form == "boundary"
                      else _pp.policy_rows)

            def stream_fn(k, fits, strikes_, start, count):
                k = shard_mix(k)
                tables = jax.vmap(
                    lambda fit, strike: row_fn(
                        fit, r, strike, maturity, dt, n_steps, is_call)
                )(fits, strikes_)

                def body(i, carry):
                    tot, sq = carry
                    c = chain_chunk(k.at[1].add(start + i), tables)
                    # Chunk totals are iid across chunks: their second
                    # moment yields an exact stderr for the streamed mean
                    # (price() aggregates across calls/shards on the host).
                    return tot + c, sq + c * c

                init = jnp.zeros(n_k, jnp.float32)
                if ax is not None:
                    init = _pvary(init, ax)
                totals, sumsq = jax.lax.fori_loop(0, count, body,
                                                  (init, init))
                # Per-strike time-0 exercise (every path shares S0; column
                # 0 is decided outside the kernel, cf. StreamingPricer).
                p0 = jnp.maximum(
                    jnp.where(is_call, s0 - strikes_, strikes_ - s0), 0.0)
                z0 = (s0 - fits.mu[:, 0]) / fits.sd[:, 0]
                cont0 = ((fits.coeffs[:, 0, 2] * z0 + fits.coeffs[:, 0, 1])
                         * z0 + fits.coeffs[:, 0, 0])
                ex0 = (p0 > ITM_EPS) & (p0 >= cont0)
                nchunk = (count * config.chunk_paths).astype(jnp.float32)
                all0 = (p0 * nchunk).astype(jnp.float32)
                # Deterministic time-0 value: every chunk total equals
                # p0 * chunk_paths, so the variance estimate is exactly 0.
                c0_tot = p0 * jnp.float32(config.chunk_paths)
                sq0 = count.astype(jnp.float32) * c0_tot * c0_tot
                return (jnp.where(ex0, all0, totals),
                        jnp.where(ex0, sq0, sumsq))
        elif bucketed:
            def stream_fn(k, fits, strikes_, start, count, n_live, mat,
                          *mkt):
                k = shard_mix(k)
                r_ = mkt[0][2] if traced_market else r

                def chunk_vals(i):
                    kk = jax.random.fold_in(k, start + i)
                    if traced_market:
                        s0_, xi_, rr, eta_, h_ = mkt[0]
                        paths = chunk_gen.with_params(kk, s0_, xi_, rr,
                                                      eta_, n_live, h_=h_)
                    else:
                        paths = chunk_gen(kk, n_live)

                    def one(strike, fit):
                        s, _ = lsm_policy_value(paths, fit, r_, strike,
                                                mat, dt, is_call,
                                                n_steps_live=n_live)
                        return s.astype(jnp.float32)

                    return jax.vmap(one)(strikes_, fits)

                def acc(i, carry):
                    tot, sq = carry
                    c = chunk_vals(i)
                    return tot + c, sq + c * c

                init = jnp.zeros(n_k, jnp.float32)
                if ax is not None:
                    init = _pvary(init, ax)
                return jax.lax.fori_loop(0, count, acc, (init, init))
        else:
            def stream_fn(k, fits, strikes_, start, count):
                k = shard_mix(k)

                def chunk_vals(i):
                    paths = chunk_gen(jax.random.fold_in(k, start + i))

                    def one(strike, fit):
                        s, _ = lsm_policy_value(paths, fit, r, strike,
                                                maturity, dt, is_call)
                        return s.astype(jnp.float32)

                    return jax.vmap(one)(strikes_, fits)

                def acc(i, carry):
                    tot, sq = carry
                    c = chunk_vals(i)
                    return tot + c, sq + c * c

                init = jnp.zeros(n_k, jnp.float32)
                if ax is not None:
                    init = _pvary(init, ax)
                return jax.lax.fori_loop(0, count, acc, (init, init))

        if qmc_fused:
            # QMC through the FUSED chain kernel (cf. StreamingPricer's
            # qmc_fused stream): Sobol planes built in XLA per chunk, fed
            # through `_chain_kernel_noise_in`; every strike group re-reads
            # the same noise array, so groups see bitwise-identical paths
            # exactly like the in-kernel-PRNG chain.
            from . import pathgen_pallas

            q_form = _resolve_fgn_form(config)
            chain_q, q_s_pad = pathgen_pallas.make_pallas_priced_chain(
                s0, xi, h, eta, rho, r, strikes_f, maturity, dt, n_steps,
                config.chunk_paths, block_paths=config.pallas_block_paths,
                is_call=is_call, noise_input=True, fgn_dtype=fgn_dtype,
                fgn_form=q_form, policy_form=config.chain_policy_form,
                sweep_impl=config.chain_sweep_impl,
                interpret=config.pallas_interpret)
            noise_fn = _make_fused_qmc_noise(config, n_steps, q_s_pad,
                                             q_form, dt)
            q_row_fn = (pathgen_pallas.boundary_rows
                        if config.chain_policy_form == "boundary"
                        else pathgen_pallas.policy_rows)

            def stream_fn(k, fits, strikes_, start, count):  # noqa: F811
                k = shard_mix(k)
                tables = jax.vmap(
                    lambda fit, strike: q_row_fn(
                        fit, r, strike, maturity, dt, n_steps, is_call)
                )(fits, strikes_)

                def body(i, carry):
                    tot, sq = carry
                    c = chain_q(
                        noise_fn(jax.random.fold_in(k, start + i)), tables)
                    return tot + c, sq + c * c

                init = jnp.zeros(n_k, jnp.float32)
                if ax is not None:
                    init = _pvary(init, ax)
                totals, sumsq = jax.lax.fori_loop(0, count, body,
                                                  (init, init))
                # Per-strike time-0 exercise (cf. the fused chain stream).
                p0 = jnp.maximum(
                    jnp.where(is_call, s0 - strikes_, strikes_ - s0), 0.0)
                z0 = (s0 - fits.mu[:, 0]) / fits.sd[:, 0]
                cont0 = ((fits.coeffs[:, 0, 2] * z0 + fits.coeffs[:, 0, 1])
                         * z0 + fits.coeffs[:, 0, 0])
                ex0 = (p0 > ITM_EPS) & (p0 >= cont0)
                nchunk = (count * config.chunk_paths).astype(jnp.float32)
                all0 = (p0 * nchunk).astype(jnp.float32)
                c0_tot = p0 * jnp.float32(config.chunk_paths)
                sq0 = count.astype(jnp.float32) * c0_tot * c0_tot
                return (jnp.where(ex0, all0, totals),
                        jnp.where(ex0, sq0, sumsq))

        # --- per-strike streaming Greeks (whole-smile risk) ---------------
        # Forward-mode jvp over the five market tangents of the chunk's
        # [K] policy-value vector — the per-strike analogue of
        # StreamingPricer.price_and_greeks, on the SAME shared path
        # stream (so per-strike Greeks are positively correlated across
        # the smile, like the prices).  Two variants: non-bucketed builds
        # dedicated traced-H generators (Hurst joins the AD surface);
        # traced-market/serving pricers jvp directly over their
        # ALREADY-traced market inputs (the chunk generator is traced_h
        # by construction), so a serving process compiles ONE extra
        # program per shape class, lazily on the first greeks quote.
        # Plain-bucketed (baked market) pricers have no greeks surface.
        self._greek_fit = self._greek_stream = None
        if traced_market:
            def greek_stream_fn(k, fits, strikes_, start, count, n_live,
                                mat, mkt):
                k = shard_mix(k)

                def chunk_val(m5, i):
                    s0_, xi_, r_, eta_, h_ = m5
                    paths = chunk_gen.with_params(
                        jax.random.fold_in(k, start + i), s0_, xi_, r_,
                        eta_, n_live, h_=h_)

                    def one(strike, fit):
                        s, _ = lsm_policy_value(paths, fit, r_, strike,
                                                mat, dt, is_call,
                                                n_steps_live=n_live)
                        return s.astype(jnp.float32)

                    return jax.vmap(one)(strikes_, fits)       # [K]

                return _greek_jvp_loop(chunk_val, mkt, count, (n_k,), ax)
        elif not bucketed:
            xg_gen = make_chunk_pathgen(
                s0, xi, h, eta, rho, r, n_steps, dt, config.chunk_paths,
                dtype, fgn_dtype, config.cumsum_impl, qmc=config.qmc, qmc_fgn=config.qmc_fgn, qmc_dim=config.qmc_dim,
                fgn_impl="matmul", traced_h=True,
                # Paired jvp Greeks for XLA chain configs (pilot plain);
                # pallas chains reject antithetic Greeks, so this gen
                # never runs paired there — cf. StreamingPricer.
                antithetic=config.antithetic)
            xg_pilot = make_chunk_pathgen(
                s0, xi, h, eta, rho, r, n_steps, dt, config.pilot_paths,
                dtype, fgn_dtype, config.cumsum_impl, qmc=config.qmc, qmc_fgn=config.qmc_fgn, qmc_dim=config.qmc_dim,
                fgn_impl="matmul", traced_h=True)
            self._market = (float(s0), float(xi), float(r), float(eta),
                            float(h))
            if mesh is None:
                xg_mix = lambda c: c
            else:
                xg_mix = lambda c: jax.random.fold_in(
                    c, jax.lax.axis_index(axis_name))

            def greek_fit_fn(k, strikes_):
                pilot = xg_pilot(xg_mix(k))

                def one(strike):
                    _, fits = lsm_fit(pilot, r, strike, maturity, dt,
                                      is_call, config.poly_order,
                                      axis_name=ax)
                    return fits

                return jax.vmap(one)(strikes_)

            def greek_stream_fn(k, fits, strikes_, start, count, market):
                k = xg_mix(k)

                def chunk_val(params, i):
                    s0_, xi_, r_, eta_, h_ = params
                    paths = xg_gen.with_params(
                        jax.random.fold_in(k, start + i), s0_, xi_, r_,
                        eta_, h_=h_)

                    def one(strike, fit):
                        s, _ = lsm_policy_value(paths, fit, r_, strike,
                                                maturity, dt, is_call)
                        return s.astype(jnp.float32)

                    return jax.vmap(one)(strikes_, fits)       # [K]

                return _greek_jvp_loop(chunk_val, market, count, (n_k,),
                                       ax)

        # --- fused-kernel chain Greeks fast path --------------------------
        # The chol + log-boundary chain Greeks kernel sweeps every
        # strike's policy over ONE set of in-VMEM tangent planes per path
        # block (pathgen_pallas._chain_greeks_body) — whole-smile risk at
        # fused-kernel speed, the Greeks analogue of the fused chain
        # price path.  Eligible exactly where the fused chain price
        # kernel runs with the boundary policy in the chol form
        # (pathgen_impl == "pallas" already folds in fuse_policy /
        # poly_order 2 / not qmc / not bucketed); everywhere else
        # price_and_greeks keeps the jvp stream.
        fused_greek_stream_fn = None
        if (pathgen_impl == "pallas" and not bucketed
                and config.chain_policy_form == "boundary"
                and _resolve_fgn_form(config) == "chol"
                and pathgen_pallas.supports(n_steps, "spectral")):
            chain_greeks_chunk, _ = pathgen_pallas.make_pallas_chain_greeks_chunk(
                s0, xi, h, eta, rho, r, n_k, maturity, dt, n_steps,
                config.chunk_paths,
                block_paths=_fused_block(config, n_steps),
                is_call=is_call, fgn_dtype=fgn_dtype,
                antithetic=config.antithetic,
                sweep_impl=config.chain_sweep_impl,
                interpret=config.pallas_interpret)

            def fused_greek_stream_fn(k, fits, strikes_, start, count):
                k = shard_mix(k)
                # Same table pipeline as the chain price stream, so the
                # Greeks' per-strike policies can never diverge from the
                # price path's.
                tables = jax.vmap(
                    lambda fit, strike: pathgen_pallas.log_boundary_rows(
                        pathgen_pallas.boundary_rows(
                            fit, r, strike, maturity, dt, n_steps,
                            is_call)))(fits, strikes_)

                def body(i, carry):
                    tot, sq = carry
                    c = chain_greeks_chunk(k.at[1].add(start + i), tables)
                    return tot + c, sq + c * c

                init = jnp.zeros((6, n_k), jnp.float32)
                if ax is not None:
                    init = _pvary(init, ax)
                tot, sq = jax.lax.fori_loop(0, count, body, (init, init))
                # Per-strike time-0 exercise: V = p0 deterministically —
                # only delta survives (cf. the single-strike fused path).
                p0 = jnp.maximum(
                    jnp.where(is_call, s0 - strikes_, strikes_ - s0), 0.0)
                z0 = (s0 - fits.mu[:, 0]) / fits.sd[:, 0]
                cont0 = ((fits.coeffs[:, 0, 2] * z0 + fits.coeffs[:, 0, 1])
                         * z0 + fits.coeffs[:, 0, 0])
                ex0 = (p0 > ITM_EPS) & (p0 >= cont0)
                sgn = 1.0 if is_call else -1.0
                c0 = jnp.stack([p0, jnp.full_like(p0, sgn)]
                               + [jnp.zeros_like(p0)] * 4)       # [6, K]
                n_f = (count * config.chunk_paths).astype(jnp.float32)
                per_chunk = c0 * jnp.float32(config.chunk_paths)
                tot = jnp.where(ex0[None, :], c0 * n_f, tot)
                sq = jnp.where(ex0[None, :],
                               count.astype(jnp.float32)
                               * per_chunk * per_chunk, sq)
                return tot, sq

        self._fused_greek_stream = None
        if mesh is None:
            self._fit = jax.jit(fit_fn)
            self._stream = jax.jit(stream_fn)
            if traced_market:
                self._greek_stream = jax.jit(greek_stream_fn)
            elif not bucketed:
                self._greek_fit = jax.jit(greek_fit_fn)
                self._greek_stream = jax.jit(greek_stream_fn)
            if fused_greek_stream_fn is not None:
                self._fused_greek_stream = jax.jit(fused_greek_stream_fn)
        else:
            replicated_out, summed_out = _shard_map_wrappers(
                mesh, axis_name,
                check_vma=not (pathgen_impl == "pallas" or qmc_fused))
            n_fit_in = 5 if traced_market else (4 if bucketed else 2)
            n_stream_in = 8 if traced_market else (7 if bucketed else 5)
            self._fit = replicated_out(fit_fn, n_fit_in)
            self._stream = summed_out(stream_fn, n_stream_in)
            if traced_market:
                self._greek_stream = summed_out(greek_stream_fn, 8)
            elif not bucketed:
                self._greek_fit = replicated_out(greek_fit_fn, 2)
                self._greek_stream = summed_out(greek_stream_fn, 6)
            if fused_greek_stream_fn is not None:
                self._fused_greek_stream = summed_out(
                    fused_greek_stream_fn, 5)

    def price_and_greeks(self, key, n_paths: Optional[int] = None,
                         with_stderr: bool = False, strikes=None,
                         n_steps_live: Optional[int] = None,
                         maturity: Optional[float] = None,
                         hurst: Optional[float] = None, market=None):
        """Per-strike (price, delta, vega_xi, vega_eta, rho_rate, vega_h)
        arrays [K] at streaming scale — the whole smile's risk from ONE
        shared path stream (estimates positively correlated across
        strikes, exactly what a smooth risk surface wants).  Forward-mode
        jvp with the per-strike exercise policies fixed from the pilot
        fit; see StreamingPricer.price_and_greeks for the estimator's
        conventions and stderr semantics.

        On the fused chol + log-boundary chain configuration the whole
        computation runs as hand-rolled in-kernel tangents swept across
        the strip (pathgen_pallas._chain_greeks_body): the tangent
        planes are computed once per path block and every strike's
        policy reduces against them, so K strikes of full risk cost
        ~ceil(K/10) single-strike fused Greeks passes.  The fits come
        from the SAME pilot as :meth:`price` (policy-identical by
        construction); every other configuration uses the forward-mode
        jvp through the XLA generator.

        On a traced-market (serving) pricer the jvp runs over the
        already-traced market inputs, so the per-call arguments of
        :meth:`price` (fresh strikes / n_steps_live / maturity / market /
        hurst) all apply and every quote shape reuses ONE extra compiled
        program per shape class — a quote with `greeks` costs ~the five
        tangents, nothing more.  Plain-bucketed pricers (market baked at
        compile time) have no greeks surface.  No reference
        equivalent."""
        if self._greek_stream is None and self._fused_greek_stream is None:
            raise ValueError(
                "price_and_greeks is not available on a plain-bucketed "
                "chain pricer (its market is baked at compile time); use "
                "a non-bucketed StreamingChainPricer, or bucketed=True "
                "with traced_market=True (the serving configuration)")
        # antithetic needs no special-casing: the fused chain Greeks
        # kernel pairs in-kernel and the jvp streams' generators pair at
        # the noise level (cf. StreamingPricer.price_and_greeks).
        config = self.config
        if strikes is None:
            strikes = self.strikes
        else:
            strikes = jnp.asarray(strikes, jnp.dtype(config.dtype))
            if strikes.shape != self.strikes.shape:
                raise ValueError(
                    f"strike strip length {strikes.shape} != compiled "
                    f"length {self.strikes.shape}; build a new pricer")
        if n_paths is None:
            n_paths = config.n_paths
        n_chunks, rem = divmod(n_paths, config.chunk_paths * self.n_dev)
        if rem:
            raise ValueError(
                f"n_paths={n_paths} not divisible by chunk_paths * devices="
                f"{config.chunk_paths * self.n_dev}")

        if self._traced_market:
            if n_steps_live is None:
                raise ValueError("bucketed pricer needs n_steps_live")
            if not 1 <= n_steps_live <= config.n_steps:
                raise ValueError(
                    f"n_steps_live={n_steps_live} outside [1, "
                    f"{config.n_steps}] bucket")
            if market is not None:
                bad = set(market) - {"s0", "xi", "r", "eta"}
                if bad:
                    raise ValueError(f"unknown market override keys: {bad} "
                                     "(use s0/xi/r/eta; hurst= for H)")
            m = dict(self._market_defaults)
            if market:
                m.update(market)
            if hurst is not None:
                m["hurst"] = hurst
            mkt = tuple(jnp.float32(m[k])
                        for k in ("s0", "xi", "r", "eta", "hurst"))
            nl = jnp.int32(n_steps_live)
            mat = jnp.float32(self._maturity if maturity is None
                              else maturity)
            k_pilot, k_stream = _pilot_stream_keys(key, self._pathgen_impl,
                                                   config.rng_impl)
            fits = self._fit(k_pilot, strikes, nl, mat, mkt)
            stream = self._greek_stream
            stream_args = (nl, mat, mkt)
        else:
            if (n_steps_live is not None or maturity is not None
                    or hurst is not None or market is not None):
                raise ValueError(
                    "n_steps_live/maturity/market/hurst are per-call "
                    "inputs only for a traced-market pricer")
            if self._fused_greek_stream is not None:
                # Fused-kernel fast path: pallas carriers, the SAME
                # pilot/fits as price() (policy-identical by
                # construction), in-kernel tangents.
                _check_pallas_chunk_range("pallas", n_chunks, self.n_dev)
                k_pilot, k_stream = _pilot_stream_keys(
                    key, "pallas", config.rng_impl)
                fits = self._fit(k_pilot, strikes)
                stream = self._fused_greek_stream
            else:
                k_pilot, k_stream = jax.random.split(key)
                fits = self._greek_fit(k_pilot, strikes)
                stream = self._greek_stream
            stream_args = () if self._fused_greek_stream is not None \
                else (tuple(jnp.float32(v) for v in self._market),)

        n_k = strikes.shape[0]
        totals = np.zeros((6, n_k), np.float64)
        sumsq = np.zeros((6, n_k), np.float64)
        done = 0
        while done < n_chunks:
            count = min(config.chunks_per_call, n_chunks - done)
            t, q = jax.device_get(stream(
                k_stream, fits, strikes, done, count, *stream_args))
            totals += np.asarray(t, np.float64)
            sumsq += np.asarray(q, np.float64)
            done += count
        out = totals / n_paths
        if not with_stderr:
            return out
        se = _chunk_stderr(totals, sumsq, n_chunks * self.n_dev,
                           config.chunk_paths)
        return out, se

    def price(self, key, progress=None, n_paths: Optional[int] = None,
              strikes=None, n_steps_live: Optional[int] = None,
              maturity: Optional[float] = None, with_stderr: bool = False,
              hurst: Optional[float] = None, market=None):
        """[K] prices for the strike strip on ``n_paths`` shared paths
        (times the mesh size when sharded).  ``with_stderr=True`` returns
        (prices, stderrs): per-strike standard errors of the streamed
        means, computed from the empirical variance of the iid per-chunk
        totals — a free byproduct of the stream (the extra accumulator is
        one multiply-add per chunk).  The stderr is conditional on the
        pilot's fitted policy (the standard LSM convention): it measures
        path-sampling noise, not pilot-to-pilot policy variation.

        ``strikes`` (default: the construction-time strip) may be any
        fresh strip of the SAME length — strikes are traced inputs
        everywhere (the fused chain kernel reads them from its policy
        tables), so repricing a new strip reuses the compiled programs.
        This is the serving fast path (cli/price.py --serve).

        With ``bucketed=True`` at construction, ``n_steps_live`` (the
        contract's true step count, <= config.n_steps) and ``maturity``
        are also traced per-call inputs: any shorter-dated contract prices
        against the same compiled programs."""
        config = self.config
        if self._bucketed:
            if n_steps_live is None:
                raise ValueError("bucketed pricer needs n_steps_live")
            if not 1 <= n_steps_live <= config.n_steps:
                raise ValueError(
                    f"n_steps_live={n_steps_live} outside [1, "
                    f"{config.n_steps}] bucket")
        elif n_steps_live is not None or maturity is not None:
            raise ValueError(
                "n_steps_live/maturity are per-call inputs only for a "
                "bucketed pricer (construct with bucketed=True)")
        if (hurst is not None or market is not None) \
                and not self._traced_market:
            raise ValueError("hurst/market are per-call inputs only for "
                             "a traced-market pricer (construct with "
                             "traced_market=True)")
        if market is not None:
            bad = set(market) - {"s0", "xi", "r", "eta"}
            if bad:
                raise ValueError(f"unknown market override keys: {bad} "
                                 "(use s0/xi/r/eta; hurst= for H)")
        if strikes is None:
            strikes = self.strikes
        else:
            strikes = jnp.asarray(strikes, jnp.dtype(config.dtype))
            if strikes.shape != self.strikes.shape:
                raise ValueError(
                    f"strike strip length {strikes.shape} != compiled "
                    f"length {self.strikes.shape}; build a new pricer")
        if n_paths is None:
            n_paths = config.n_paths
        per_step = config.chunk_paths * self.n_dev
        n_chunks, rem = divmod(n_paths, per_step)
        if rem:
            raise ValueError(
                f"n_paths={n_paths} not divisible by chunk_paths * devices="
                f"{per_step}")
        _check_pallas_chunk_range(self._pathgen_impl, n_chunks, self.n_dev)
        k_pilot, k_stream = _pilot_stream_keys(key, self._pathgen_impl,
                                               config.rng_impl)
        if self._bucketed:
            nl = jnp.int32(n_steps_live)
            mat = jnp.float32(self._maturity if maturity is None
                              else maturity)
            fit_args = (nl, mat)
            if self._traced_market:
                m = dict(self._market_defaults)
                if market:
                    m.update(market)
                if hurst is not None:
                    m["hurst"] = hurst
                fit_args += (tuple(
                    jnp.float32(m[k])
                    for k in ("s0", "xi", "r", "eta", "hurst")),)
        else:
            fit_args = ()
        fits = self._fit(k_pilot, strikes, *fit_args)

        totals = np.zeros(strikes.shape[0], np.float64)
        sumsq = np.zeros(strikes.shape[0], np.float64)
        done = 0
        while done < n_chunks:
            count = min(config.chunks_per_call, n_chunks - done)
            t, sq = jax.device_get(self._stream(k_stream, fits, strikes,
                                                done, count, *fit_args))
            totals += np.asarray(t, np.float64)
            sumsq += np.asarray(sq, np.float64)
            done += count
            if progress is not None:
                progress(done, n_chunks)
        prices = totals / n_paths
        if not with_stderr:
            return prices
        # Chunk totals are iid; n_chunks * n_dev of them were summed (see
        # _chunk_stderr for the single-chunk and f32-floor caveats).
        return prices, _chunk_stderr(totals, sumsq, n_chunks * self.n_dev,
                                     config.chunk_paths)


@functools.lru_cache(maxsize=16)
def _cached_pricer(s0, xi, h, eta, rho, r, strike, maturity, is_call,
                   config) -> StreamingPricer:
    return StreamingPricer(s0, xi, h, eta, rho, r, strike, maturity,
                           is_call, config)


def price_rbergomi_lsm_streaming(key, s0, xi, h, eta, rho, r, strike,
                                 maturity, is_call: bool,
                                 config: StreamConfig,
                                 progress=None) -> float:
    """North-star workload: price one American option on ``config.n_paths``
    rBergomi paths with LSM, never holding more than one chunk in memory.

    Thin wrapper over :class:`StreamingPricer`; pricers are memoized on the
    full (market, contract, config) signature so repeated calls — including
    calls at different ``n_paths`` with the same chunk size — reuse the same
    two compiled programs."""
    base = dataclasses.replace(config, n_paths=config.chunk_paths)
    pricer = _cached_pricer(float(s0), float(xi), float(h), float(eta),
                            float(rho), float(r), float(strike),
                            float(maturity), bool(is_call), base)
    return pricer.price(key, progress=progress, n_paths=config.n_paths)
