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
                    ridge: float = 1e-6) -> PolyFit:
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
    # Snap z to exactly 0 when the variance floor engaged (constant
    # regressor).  The floor alone is not enough: TPU reduces compute mu
    # with O(1e-5) relative roundoff, so x - mu is a nonzero *constant*
    # ~1e-4 and z becomes a constant ~0.1 instead of 0 — a rank-1 design
    # NOT at the origin, whose near-singular solve amplifies f32 noise into
    # garbage coefficients (measured: cont ~4x the true continuation at a
    # constant step, ratcheted into +300% call prices via max(p, cont)).
    # With z == 0 the fit degrades to the pure intercept the floor intended.
    z = jnp.where(var > sd_floor * sd_floor, z, 0.0)
    basis = poly_basis(z, order)                     # [n, p+1]
    wb = basis * w[..., None]
    # precision=HIGHEST: TPU matmuls default to bf16 inputs, and the ~0.4%
    # relative error that injects into the Gram/rhs moments is NOT benign
    # here — LSM carries max(payoff, fitted continuation) backward
    # (LSMPricer.cpp:78-85), a ratchet that rectifies zero-mean fit noise
    # into a systematic upward price bias (measured +50% on ITM calls at
    # 2000x63 on v5e).  These are [n, order+1] matmuls; full precision is
    # free next to the surrounding work.
    hi = jax.lax.Precision.HIGHEST
    gram = _psum_if(jnp.matmul(wb.T, basis, precision=hi), axis_name)
    rhs = _psum_if(jnp.matmul(wb.T, y, precision=hi), axis_name)

    # Diagonal-scaled Tikhonov: gram is PSD by construction, so gram + lam*D
    # is SPD and the solve cannot produce NaN in float32 even for
    # rank-deficient designs (constant or all-masked regressors).  lam is
    # sized for float32: the moment products that feed the factorization
    # carry ~1e-7 relative noise, so regularization much below ~1e-6 of the
    # diagonal is pure noise (the round-1 1e-7-of-mean-trace choice was
    # ~3e-8 of the leading entry — below machine eps, i.e. no
    # regularization at all in f32).  1e-6 of the diagonal perturbs a
    # well-conditioned quadratic fit in its 6th digit — far inside MC noise.
    eye = jnp.eye(order + 1, dtype=gram.dtype)
    # The default IS the floor: 1e-6 is the smallest f32-meaningful ridge
    # (see above), and the clamp keeps any smaller caller value from
    # silently meaning "no regularization at all".
    lam = jnp.maximum(ridge, 1e-6)
    diag = jnp.diagonal(gram, axis1=-2, axis2=-1)
    a = gram + (lam * (diag + 1.0))[..., None, :] * eye
    if order + 1 <= 3:
        # Closed-form Cholesky solve: pure elementwise ops that XLA fuses
        # into the surrounding scan body — the factored LAPACK-style solve
        # costs several extra kernel launches per LSM backward step, which
        # dominates the latency-bound per-row pipeline workload.  Cholesky,
        # not the adjugate: the adjugate's det is a difference of cofactor
        # products that cancel catastrophically for near-rank-1 designs
        # (near-constant price columns), producing solutions far outside
        # the ||rhs||/lam_min stability bound; Cholesky is backward-stable.
        coeffs = _solve_spd_small(a, rhs)
    else:
        chol = jax.scipy.linalg.cho_factor(a, lower=True)
        coeffs = jax.scipy.linalg.cho_solve(chol, rhs)
    dead = jnp.zeros_like(coeffs).at[..., 0].set(1e30)
    coeffs = jnp.where(wsum > 0, coeffs, dead)
    return PolyFit(coeffs, mu, sd)


def _solve_spd_small(a, b):
    """Solve a x = b for symmetric positive-definite a of size 1..3 via an
    explicit (unrolled) Cholesky factorization — branch-free, fully fusible
    elementwise ops, and backward-stable where the previous adjugate form
    was not: for near-rank-1 gram matrices the adjugate's det/cofactors are
    differences of cancelling products, and the f32 cancellation noise is
    amplified by 1/det into unbounded coefficients.  Cholesky keeps the
    solution within the regularized system's ||b||/lam_min bound.

    The sqrt/divide pivots are clamped to a tiny positive floor so a
    rank-deficient `a` (possible only if the caller skipped the ridge)
    yields finite output instead of NaN.
    """
    n = a.shape[-1]
    tiny = jnp.asarray(1e-30, a.dtype)
    if n == 1:
        return b / jnp.maximum(a[..., 0, 0:1], tiny)
    if n == 2:
        a00, a01, a11 = a[..., 0, 0], a[..., 0, 1], a[..., 1, 1]
        l00 = jnp.sqrt(jnp.maximum(a00, tiny))
        l10 = a01 / l00
        l11 = jnp.sqrt(jnp.maximum(a11 - l10 * l10, tiny))
        # Forward substitution L y = b, then back substitution L^T x = y.
        y0 = b[..., 0] / l00
        y1 = (b[..., 1] - l10 * y0) / l11
        x1 = y1 / l11
        x0 = (y0 - l10 * x1) / l00
        return jnp.stack([x0, x1], axis=-1)
    a00, a01, a02 = a[..., 0, 0], a[..., 0, 1], a[..., 0, 2]
    a11, a12, a22 = a[..., 1, 1], a[..., 1, 2], a[..., 2, 2]
    l00 = jnp.sqrt(jnp.maximum(a00, tiny))
    l10 = a01 / l00
    l20 = a02 / l00
    l11 = jnp.sqrt(jnp.maximum(a11 - l10 * l10, tiny))
    l21 = (a12 - l20 * l10) / l11
    l22 = jnp.sqrt(jnp.maximum(a22 - l20 * l20 - l21 * l21, tiny))
    b0, b1, b2 = b[..., 0], b[..., 1], b[..., 2]
    y0 = b0 / l00
    y1 = (b1 - l10 * y0) / l11
    y2 = (b2 - l20 * y0 - l21 * y1) / l22
    x2 = y2 / l22
    x1 = (y1 - l21 * x2) / l11
    x0 = (y0 - l10 * x1 - l20 * x2) / l00
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
