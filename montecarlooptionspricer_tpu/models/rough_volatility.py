"""Rough-Bergomi stock-price path generation — TPU-native equivalent of
src/models/RoughVolatility.cpp:312-368 (GenerateStockPricePaths).

Where the reference loops serially over paths, re-seeding an mt19937 from
``random_device`` per call and running a hand-rolled radix-2 FFT per path
(RoughVolatility.cpp:346-365), this module generates the whole [paths, steps]
block at once:

  * counter-based threefry keys -> reproducible by construction;
  * one batched spectral transform for the fGN (XLA FFT, or an MXU matmul
    via ops.fgn.fgn_matrices — the TPU-first form);
  * the Euler log-price recursion S_j = S_{j-1} exp((r - v/2) dt + sqrt(v) dW)
    collapses to a cumulative sum in log space — no scan, no sequential
    dependency, pure VPU work.

Everything is shape-static and jit/vmap/shard_map-ready: `paths` is the axis
to shard across the TPU mesh (SURVEY.md section 5.8).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops import fgn as fgn_ops
from ..ops import rng as rng_ops
from ..ops.estimators import RBergomiParams, estimate_params


def variance_curve(key: jax.Array, xi, h, eta, n_steps: int, n_paths: int,
                   dt: float, dtype=jnp.float32):
    """Per-path forward-variance curves v[paths, steps] via spectral fGN
    (RoughVolatility.cpp:337-349)."""
    time_grid = jnp.arange(n_steps + 1, dtype=dtype) * dt
    lam = fgn_ops.rbergomi_lambda(time_grid, h)
    phi = fgn_ops.rbergomi_phi(lam)
    z = rng_ops.complex_normal(key, (n_paths, n_steps), dtype)
    x = fgn_ops.fractional_gaussian(phi, z, h, eta)
    return fgn_ops.forward_variance(x, time_grid, xi, h, eta)


def euler_log_paths(key: jax.Array, s0, r, rho, v, dt: float,
                    dtype=jnp.float32):
    """Euler log-price recursion given variance curves v
    (RoughVolatility.cpp:351-365), as a cumsum: returns [paths, steps+1]
    with column 0 == s0.

    The reference draws TWO fresh normals per step and combines them as
    dW = rho*dw1 + sqrt(1-rho^2)*dw2 (RoughVolatility.cpp:355-358) — but
    both are independent of the fGN variance driver Z, so dW is EXACTLY one
    N(0, dt) increment, independent of v, for any rho.  We draw that single
    normal directly: identical distribution (not merely approximate), 25%
    fewer RNG draws.  ``rho`` is kept in the signature for API parity and is
    distributionally inert — faithfully mirroring the reference quirk."""
    del rho  # inert under the reference's (mis-)specified correlation
    n_paths, n_steps = v.shape
    w = rng_ops.normal(key, (n_paths, n_steps), dtype)
    sqrt_dt = jnp.sqrt(jnp.asarray(dt, dtype))
    increments = (r - 0.5 * v) * dt + jnp.sqrt(jnp.maximum(0.0, v)) * (
        w * sqrt_dt)
    log_s = jnp.log(jnp.asarray(s0, dtype)) + jnp.cumsum(increments, axis=-1)
    s = jnp.exp(log_s)
    s0_col = jnp.full((n_paths, 1), s0, dtype)
    return jnp.concatenate([s0_col, s], axis=-1)


def generate_paths(key: jax.Array, s0, xi, h, eta, rho, r,
                   n_steps: int, n_paths: int, dt: float = 1.0 / 252.0,
                   dtype=jnp.float32) -> jax.Array:
    """rBergomi price paths [n_paths, n_steps + 1], paths[.., 0] == s0.

    The parameter block mirrors GenerateStockPricePaths
    (RoughVolatility.cpp:312-344); parameters may be Python floats or traced
    scalars (so the pipeline can vmap rows over per-row estimates).
    """
    k_var, k_euler = jax.random.split(key)
    v = variance_curve(k_var, xi, h, eta, n_steps, n_paths, dt, dtype)
    return euler_log_paths(k_euler, s0, r, rho, v, dt, dtype)


def generate_paths_qmc(key: jax.Array, s0, xi, h, eta, rho, r,
                       n_steps: int, n_paths: int, dt: float = 1.0 / 252.0,
                       base_u: Optional[jax.Array] = None,
                       dtype=jnp.float32) -> jax.Array:
    """rBergomi paths driven by randomized quasi-Monte Carlo noise
    (ops.qmc): same model recursion as `generate_paths`, but the 3*n_steps
    driver normals per path come from a digitally-shifted scrambled Sobol
    set via the inverse CDF, with the price Brownian built by the PCA
    construction so the lowest (best-distributed) Sobol dimensions carry
    most of the variance.  `key` only randomizes the shift — distinct keys
    give independent unbiased estimates.

    Dimension budget exploits a reference quirk faithfully mirrored by
    `generate_paths`: the reference correlates two Brownians that are BOTH
    independent of the variance driver (RoughVolatility.cpp:356-358), so
    rho*dW1 + sqrt(1-rho^2)*dW2 is distributionally one N(0, dt) increment
    and one PCA-constructed Brownian (n dims) replaces the (w1, w2) pair
    exactly in distribution.

    No reference equivalent (the reference is plain pseudo-random MC); at
    the pipeline's 250-path budget this cuts price RMSE several-fold
    (tests/test_qmc.py quantifies it on the Black-Scholes control).
    """
    from ..ops import qmc

    if base_u is None:
        base_u = qmc.sobol_base(n_paths, 3 * n_steps)
    z = qmc.normals(base_u, key).astype(dtype)        # [n_paths, 3*n_steps]
    zc = jax.lax.complex(z[:, n_steps:2 * n_steps], z[:, 2 * n_steps:])

    time_grid = jnp.arange(n_steps + 1, dtype=dtype) * dt
    lam = fgn_ops.rbergomi_lambda(time_grid, h)
    phi = fgn_ops.rbergomi_phi(lam)
    x = fgn_ops.fractional_gaussian(phi, zc, h, eta)
    v = fgn_ops.forward_variance(x, time_grid, xi, h, eta)

    pca = qmc.brownian_pca_matrix(n_steps, float(dt))
    dw = jnp.matmul(z[:, :n_steps], pca.T,
                    preferred_element_type=jnp.float32).astype(dtype)
    increments = (r - 0.5 * v) * dt + jnp.sqrt(jnp.maximum(0.0, v)) * dw
    log_s = jnp.log(jnp.asarray(s0, dtype)) + jnp.cumsum(increments, axis=-1)
    s = jnp.exp(log_s)
    s0_col = jnp.full((n_paths, 1), s0, dtype)
    return jnp.concatenate([s0_col, s], axis=-1)


def generate_paths_bucketed(key: jax.Array, s0, xi, h, eta, rho, r,
                            n_steps, n_pad: int, m1: int, n_paths: int,
                            dt: float = 1.0 / 252.0,
                            dtype=jnp.float32,
                            antithetic: bool = False) -> jax.Array:
    """Padded-shape rBergomi generator with a *traced* per-row ``n_steps``:
    arrays are static [n_paths, n_pad + 1], but the model semantics follow
    the row's exact step count, so columns 0..n_steps are distributed
    exactly as `generate_paths` at that step count and the remaining
    columns stay flat at S_{n_steps}.

    This is the compile-shape quantization of the pipeline (one program per
    (n_pad, m1) bucket instead of one per distinct dte —
    PredictionGen.cpp:542-546's dynamic scheduling handles arbitrary rows
    for free; XLA needs static shapes).  The bucketing contract that makes
    padding EXACT rather than approximate:

      * ``n_pad`` = next_pow2(n_steps) — which IS the reference's circular
        convolution length M2 (RoughVolatility.cpp:269), so it is constant
        across the bucket and the padded-width FFT is the row's exact
        transform;
      * ``m1`` = next_pow2(n_steps + 1), the lambda-spectrum FFT length
        (RoughVolatility.cpp:212-225) — constant across the bucket except
        where n_steps is itself a power of two (those rows form their own
        (n_pad, 2*n_pad) bucket);
      * lambda is masked past n_steps before the m1 FFT and phi*Z past
        n_steps - 1 before the M2 FFT, reproducing the exact program's
        spectra; increment columns past n_steps are zeroed.

    ``rho`` is distributionally inert (see euler_log_paths).

    ``antithetic=True`` draws HALF the noise and fills the block with
    (Z, W) / (-Z, -W) pairs — rows i and i + n_paths/2 are partners with
    exactly-standard marginal path law and ONE shared fGN transform per
    pair (the spectral map is linear); the classic variance reduction
    for the pipeline's 250-path row budget.  OFF by default (plain MC is
    the reference-parity row estimator).
    """
    del rho
    if n_pad & (n_pad - 1):
        raise ValueError(f"n_pad={n_pad} must be a power of two (it is the "
                         "reference's circular-convolution length M2)")
    if antithetic and n_paths % 2:
        raise ValueError("antithetic needs an even n_paths")
    n_steps = jnp.asarray(n_steps, jnp.int32)
    k_var, k_euler = jax.random.split(key)

    n_draw = n_paths // 2 if antithetic else n_paths
    zc = rng_ops.complex_normal(k_var, (n_draw, n_pad), dtype)
    w = rng_ops.normal(k_euler, (n_draw, n_pad), dtype)
    sqrt_dt = jnp.sqrt(jnp.asarray(dt, dtype))
    return _bucketed_paths_from_noise(s0, xi, h, eta, r, n_steps, n_pad, m1,
                                      zc, w * sqrt_dt, dt, dtype,
                                      antithetic=antithetic)


def _bucketed_paths_from_noise(s0, xi, h, eta, r, n_steps, n_pad: int,
                               m1: int, zc, dw, dt, dtype,
                               antithetic: bool = False) -> jax.Array:
    """Shared masked-spectrum fGN + Euler-cumsum core of the two bucketed
    generators: ``zc`` is the complex fGN noise plane, ``dw`` the Brownian
    increments INCLUDING their sqrt(dt) scale (white noise * sqrt(dt) for
    the threefry variant, the PCA construction for QMC).  Factored so the
    masking / FFT contract — the subtlest code in this file, see
    generate_paths_bucketed's docstring — has exactly one implementation.
    With ``antithetic``, the noise planes carry HALF the rows and the
    pair (noise, -noise) fills the block halves — the fGN transform runs
    once per pair (it is linear in ``zc``)."""
    time_grid = jnp.arange(n_pad + 1, dtype=dtype) * dt
    lam = fgn_ops.rbergomi_lambda(time_grid, h)
    lam = jnp.where(jnp.arange(n_pad + 1) <= n_steps, lam, 0.0)
    phi = jnp.conj(jnp.fft.fft(lam, n=m1, axis=-1))

    kmask = jnp.arange(n_pad) < n_steps
    a = jnp.where(kmask[None, :], phi[:n_pad] * zc, 0.0)
    x = (jnp.sqrt(2.0 * h) * eta
         * jnp.real(jnp.fft.fft(a, n=n_pad, axis=-1)) / n_pad)
    if antithetic:
        x = jnp.concatenate([x, -x], axis=0)
        dw = jnp.concatenate([dw, -dw], axis=0)

    v = fgn_ops.forward_variance(x, time_grid, xi, h, eta)
    inc = (r - 0.5 * v) * dt + jnp.sqrt(jnp.maximum(0.0, v)) * dw
    inc = jnp.where(kmask[None, :], inc, 0.0)
    log_s = jnp.log(jnp.asarray(s0, dtype)) + jnp.cumsum(inc, axis=-1)
    s = jnp.exp(log_s)
    s0_col = jnp.full((x.shape[0], 1), 1.0, dtype) * s0
    return jnp.concatenate([s0_col, s], axis=-1)


def generate_paths_qmc_bucketed(key: jax.Array, s0, xi, h, eta, rho, r,
                                n_steps, n_pad: int, m1: int, n_paths: int,
                                dt: float = 1.0 / 252.0,
                                base_u: Optional[jax.Array] = None,
                                dtype=jnp.float32) -> jax.Array:
    """Quantized-shape variant of `generate_paths_qmc` (see
    `generate_paths_bucketed` for the (n_pad, m1) contract).  The PCA
    Brownian is built at n_pad steps; any orthogonal construction yields
    exactly-distributed increments, so using the first n_steps of them is
    exact — only the variance-allocation advantage degrades slightly for
    rows shorter than the bucket."""
    from ..ops import qmc

    del rho
    if n_pad & (n_pad - 1):
        raise ValueError(f"n_pad={n_pad} must be a power of two")
    n_steps = jnp.asarray(n_steps, jnp.int32)
    if base_u is None:
        base_u = qmc.sobol_base(n_paths, 3 * n_pad)
    z = qmc.normals(base_u, key).astype(dtype)          # [n_paths, 3*n_pad]
    zc = jax.lax.complex(z[:, n_pad:2 * n_pad], z[:, 2 * n_pad:])

    pca = qmc.brownian_pca_matrix(n_pad, float(dt))
    dw = jnp.matmul(z[:, :n_pad], pca.T,
                    preferred_element_type=jnp.float32).astype(dtype)
    return _bucketed_paths_from_noise(s0, xi, h, eta, r, n_steps, n_pad, m1,
                                      zc, dw, dt, dtype)


def generate_paths_from_history(key: jax.Array, historical_prices,
                                forward_steps: int, path_num: int,
                                r: float = 0.04, dt: float = 1.0 / 252.0,
                                dtype=jnp.float32) -> jax.Array:
    """Drop-in equivalent of RoughVolatility::GenerateStockPricePaths
    (RoughVolatility.cpp:312-368): estimates (xi, H, eta, rho) from the
    history on host, then generates paths on device."""
    p: RBergomiParams = estimate_params(historical_prices, r=r, dt_yr=dt)
    return generate_paths(key, p.s0, p.xi, p.h, p.eta, p.rho, p.r,
                          forward_steps, path_num, dt, dtype)
