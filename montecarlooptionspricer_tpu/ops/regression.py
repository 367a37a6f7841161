"""Masked polynomial least squares — the regression workhorse of the LSM and
martingale pricers.

TPU-native equivalent of the Eigen ``bdcSvd(...).solve`` calls in
src/models/LSMPricer.cpp:61-76 and MartingaleOptimizationPricer.cpp:156-170.
The reference gathers the in-the-money rows into a dense [n_itm, order+1]
matrix and runs an SVD; under jit the ITM set is data-dependent, so the
rebuild keeps static shapes and uses *weighted* normal equations instead:
OTM rows get weight 0, which leaves the least-squares solution unchanged.

Conditioning: the reference regresses on raw monomials 1, S, S^2 with
S ~ O(100), whose Gram matrix is hopeless in float32.  We therefore fit in a
standardized variable z = (x - mu) / sd — the same polynomial space, so the
*fitted values* agree with the reference's within MC error (exactly, in exact
arithmetic, when the design is full rank) — and the Gram matrix stays O(1)
conditioned.  The Gram/moment accumulation is a plain sum over the sample
axis, so under `shard_map` it reduces with one tiny `psum` of a
[(order+1)^2 + (order+1)] block per step — the clean TPU idiom for
distributed LSM (SURVEY.md section 5.8).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .reductions import psum_if as _psum_if


class PolyFit(NamedTuple):
    """A polynomial fit in standardized coordinates."""

    coeffs: jax.Array  # [order+1] coefficients in z = (x - mu) / sd
    mu: jax.Array      # scalar center
    sd: jax.Array      # scalar scale


def poly_basis(z, order: int):
    """[..., order+1] monomial basis 1, z, ..., z^order
    (LSMPricer.cpp:9-17)."""
    return jnp.stack([z ** k for k in range(order + 1)], axis=-1)




def fit_poly_masked(x, y, w, order: int, axis_name: Optional[str] = None,
                    ridge: float = 1e-7) -> PolyFit:
    """Weighted polynomial least squares min_c sum_i w_i (P_c(x_i) - y_i)^2.

    Args:
      x: [n] regressor (e.g. stock prices).
      y: [n] targets (e.g. discounted continuation values).
      w: [n] weights; {0,1} masks reproduce the reference's ITM row
        selection (LSMPricer.cpp:51-58).
      order: polynomial order (PredictionGen.cpp:790 uses 2).
      axis_name: if set, moments are psum-reduced over this mesh axis so the
        fit pools samples across shards.
      ridge: tiny Tikhonov term standing in for the SVD's implicit
        regularization of rank-deficient designs.

    Returns:
      PolyFit evaluable with `eval_poly`.  With zero total weight the fit
      evaluates to a huge constant (~1e30): a fitted continuation that
      nothing beats, so a policy evaluated from it never exercises at that
      step — consistent with the backward induction's own empty-ITM skip
      (LSMPricer.cpp:60), which ignores the fit entirely.  Without this, a
      downstream policy evaluation at a step whose fit saw no ITM samples
      would read cont=0 and exercise on first touch (a systematic bias).
    """
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    w = w.astype(jnp.float32)

    wsum = _psum_if(jnp.sum(w), axis_name)
    safe_wsum = jnp.maximum(wsum, 1.0)
    mu = _psum_if(jnp.sum(w * x), axis_name) / safe_wsum
    var = _psum_if(jnp.sum(w * (x - mu) ** 2), axis_name) / safe_wsum
    # Relative floor: a (near-)constant regressor (e.g. the S0 column at
    # step 0, where every path holds the same price) must behave as a pure
    # intercept fit, like the reference SVD's min-norm solution on a rank-1
    # design — not blow up z to float32 roundoff ratios.
    sd_floor = 1e-6 * (jnp.abs(mu) + 1.0)
    # max(sqrt(var), floor) == sqrt(max(var, floor^2)) for monotone sqrt,
    # but only the latter is grad-safe: the former hits 0 * sqrt'(0) = NaN
    # in reverse mode whenever var == 0 (e.g. the constant S0 column), which
    # would poison the AD Greeks (models/greeks.py).
    sd = jnp.sqrt(jnp.maximum(var, sd_floor * sd_floor))

    z = (x - mu) / sd
    basis = poly_basis(z, order)                     # [n, p+1]
    wb = basis * w[..., None]
    gram = _psum_if(wb.T @ basis, axis_name)         # [p+1, p+1]
    rhs = _psum_if(wb.T @ y, axis_name)              # [p+1]

    # Trace-scaled Tikhonov: gram is PSD by construction, so gram + lam*I is
    # SPD and the solve cannot produce NaN in float32 even for
    # rank-deficient designs (constant or all-masked regressors).
    eye = jnp.eye(order + 1, dtype=gram.dtype)
    lam = ridge * (jnp.trace(gram) / (order + 1) + 1.0)
    a = gram + lam * eye
    if order + 1 <= 3:
        # Closed-form adjugate solve: pure elementwise ops that XLA fuses
        # into the surrounding scan body — the factored LAPACK-style solve
        # costs several extra kernel launches per LSM backward step, which
        # dominates the latency-bound per-row pipeline workload.
        coeffs = _solve_spd_small(a, rhs)
    else:
        chol = jax.scipy.linalg.cho_factor(a, lower=True)
        coeffs = jax.scipy.linalg.cho_solve(chol, rhs)
    dead = jnp.zeros_like(coeffs).at[..., 0].set(1e30)
    coeffs = jnp.where(wsum > 0, coeffs, dead)
    return PolyFit(coeffs, mu, sd)


def _solve_spd_small(a, b):
    """Solve a x = b for symmetric positive-definite a of size 1..3 via the
    explicit adjugate — branch-free, fully fusible."""
    n = a.shape[-1]
    if n == 1:
        return b / a[..., 0, 0:1]
    if n == 2:
        a00, a01, a11 = a[..., 0, 0], a[..., 0, 1], a[..., 1, 1]
        det = a00 * a11 - a01 * a01
        x0 = (a11 * b[..., 0] - a01 * b[..., 1]) / det
        x1 = (a00 * b[..., 1] - a01 * b[..., 0]) / det
        return jnp.stack([x0, x1], axis=-1)
    a00, a01, a02 = a[..., 0, 0], a[..., 0, 1], a[..., 0, 2]
    a11, a12, a22 = a[..., 1, 1], a[..., 1, 2], a[..., 2, 2]
    c00 = a11 * a22 - a12 * a12
    c01 = a02 * a12 - a01 * a22
    c02 = a01 * a12 - a02 * a11
    c11 = a00 * a22 - a02 * a02
    c12 = a01 * a02 - a00 * a12
    c22 = a00 * a11 - a01 * a01
    det = a00 * c00 + a01 * c01 + a02 * c02
    b0, b1, b2 = b[..., 0], b[..., 1], b[..., 2]
    x0 = (c00 * b0 + c01 * b1 + c02 * b2) / det
    x1 = (c01 * b0 + c11 * b1 + c12 * b2) / det
    x2 = (c02 * b0 + c12 * b1 + c22 * b2) / det
    return jnp.stack([x0, x1, x2], axis=-1)


def eval_poly(fit: PolyFit, x):
    """Evaluate the fitted polynomial at x (Horner in z), matching
    LSMPricer.cpp:78-84 / MartingaleOptimizationPricer.cpp:180-189 up to the
    internal reparameterization."""
    z = (x - fit.mu) / fit.sd
    order = fit.coeffs.shape[-1] - 1
    val = fit.coeffs[..., order]
    for k in range(order - 1, -1, -1):
        val = val * z + fit.coeffs[..., k]
    return val
