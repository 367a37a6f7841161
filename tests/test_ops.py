"""Unit tests for L0 numerics: payoff, regression, estimators."""

import numpy as np
import jax.numpy as jnp

from montecarlooptionspricer_tpu.ops import estimators
from montecarlooptionspricer_tpu.ops.payoff import payoff
from montecarlooptionspricer_tpu.ops.regression import (
    eval_poly, fit_poly_masked, poly_basis)

import oracles


def test_step_mask_on_grid_f32_maturity_keeps_final_step():
    """An on-grid maturity that arrives as float32(n*dt) — the serve path
    traces maturity in f32 — must keep step n alive for EVERY step count:
    the old fixed 1e-4 slack was below the f32 rounding of maturity/dt
    past ~2000 steps, silently disabling exercise on the final day."""
    from montecarlooptionspricer_tpu.ops.timegrid import step_mask

    dt = 1.0 / 252.0
    for n in (16, 365, 512, 1825, 2034, 2048, 3000, 4096):
        mat = jnp.float32(n * dt)
        live = np.asarray(step_mask(n + 2, dt, mat))
        assert live[: n + 1].all(), f"step {n} dead at n={n}"
        assert not live[n + 1], f"step {n + 1} live at n={n}"
        # half-step off-grid maturities classify identically to exact math
        live = np.asarray(step_mask(n + 2, dt, jnp.float32((n + 0.5) * dt)))
        assert live[: n + 1].all() and not live[n + 1]


def test_payoff_matches_reference_semantics():
    s = jnp.array([80.0, 100.0, 120.0])
    k = 100.0
    np.testing.assert_allclose(payoff(True, s, k), [0.0, 0.0, 20.0])
    np.testing.assert_allclose(payoff(False, s, k), [20.0, 0.0, 0.0])
    for sv in [80.0, 100.0, 120.0]:
        assert float(payoff(True, jnp.float32(sv), k)) == oracles.payoff(True, sv, k)
        assert float(payoff(False, jnp.float32(sv), k)) == oracles.payoff(False, sv, k)


def test_poly_basis():
    b = poly_basis(jnp.array([2.0, 3.0]), 3)
    np.testing.assert_allclose(b, [[1, 2, 4, 8], [1, 3, 9, 27]])


def test_masked_polyfit_matches_lstsq(rng):
    # Weighted fit on a masked subset must match an unweighted f64 lstsq on
    # the gathered subset (the reference's ITM-gather, LSMPricer.cpp:61-76).
    n = 400
    x = rng.uniform(50.0, 150.0, n)
    y = 3.0 + 0.5 * x - 0.002 * x * x + rng.normal(0, 0.5, n)
    mask = (rng.uniform(size=n) < 0.6).astype(np.float64)
    idx = mask > 0

    fit = fit_poly_masked(jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32),
                          jnp.asarray(mask, jnp.float32), 2)
    ours = np.asarray(eval_poly(fit, jnp.asarray(x, jnp.float32)))

    a = np.vander(x[idx], 3, increasing=True)
    c, *_ = np.linalg.lstsq(a, y[idx], rcond=None)
    ref = np.vander(x, 3, increasing=True) @ c

    np.testing.assert_allclose(ours[idx], ref[idx], rtol=2e-3, atol=2e-2)


def test_masked_polyfit_constant_regressor_is_pure_intercept():
    """A constant price column (every path at S0, LSM step 0) must fit the
    weighted mean of y exactly — even when mu carries reduce roundoff.

    Regression guard for a real TPU failure: the on-device mean of 2000
    copies of 100.0 came back as 100.0000076, the sd floor then produced a
    constant z = -0.0755 instead of 0, and the old adjugate solve of the
    resulting near-rank-1 gram amplified f32 cancellation noise into
    coefficients of O(1000) — ratcheted by LSM's max(payoff, continuation)
    into +300% call prices.  The fix snaps z to 0 whenever the variance
    floor engages; this test drives the same path by constructing the same
    off-center constant design directly."""
    n = 2000
    x = jnp.full((n,), 100.0, jnp.float32)
    y = jnp.asarray(np.random.default_rng(0).normal(5.8, 1.0, n), jnp.float32)
    w = jnp.ones((n,), jnp.float32)
    fit = fit_poly_masked(x, y, w, 2)
    cont = np.asarray(eval_poly(fit, x))
    np.testing.assert_allclose(cont, float(jnp.mean(y)), rtol=1e-5)
    # Off-center variant: simulate the TPU's inexact mean by shifting the
    # evaluation points relative to the fit's own center.  The z-snap makes
    # the fit constant, so any eval point must return the same intercept.
    cont_off = np.asarray(eval_poly(fit, x + 0.001))
    np.testing.assert_allclose(cont_off, float(jnp.mean(y)), rtol=1e-5)


def test_masked_polyfit_near_rank1_design_is_stable():
    """A nearly-constant regressor (price moved ~1e-4 relative in one step)
    must yield a bounded fit: predictions within the data range, not the
    O(1000) blowups the adjugate solve produced on near-singular grams."""
    rng = np.random.default_rng(7)
    x = (100.0 + 1e-3 * rng.normal(size=2000)).astype(np.float32)
    y = rng.normal(5.8, 1.0, 2000).astype(np.float32)
    fit = fit_poly_masked(jnp.asarray(x), jnp.asarray(y),
                          jnp.ones(2000, jnp.float32), 2)
    cont = np.asarray(eval_poly(fit, jnp.asarray(x)))
    assert np.all(np.isfinite(cont))
    assert cont.min() > y.min() - 1.0 and cont.max() < y.max() + 1.0


def test_masked_polyfit_zero_weight_never_exercises():
    """A fit with no in-the-money samples must evaluate to a huge
    continuation (nothing beats it => a policy never exercises there),
    not 0 (which a fitted policy would exercise against on first touch)."""
    x = jnp.linspace(1.0, 2.0, 16)
    fit = fit_poly_masked(x, x, jnp.zeros_like(x), 2)
    assert np.all(np.asarray(eval_poly(fit, x)) >= 1e29)


def test_estimate_xi_eta_rho(rng):
    rets = rng.normal(0.0005, 0.01, 500)
    dt = 1.0 / 252.0
    assert abs(estimators.estimate_xi(rets, dt) - np.var(rets, ddof=1) / dt) < 1e-12
    assert abs(estimators.estimate_eta(rets) - 2 * np.std(rets, ddof=1)) < 1e-12
    rho = estimators.estimate_rho(rets)
    assert -1.0 <= rho <= 0.0  # clamped negative (RoughVolatility.cpp:165-167)
    # Degenerate cases
    assert estimators.estimate_xi(np.array([0.01]), dt) == 0.0


def test_hurst_dfa_white_noise(rng):
    # DFA slope of i.i.d. noise ~ 0.5; of a random walk ~ 1.5.
    noise = rng.normal(0, 1, 4096)
    h = estimators.hurst_exponent_dfa(noise)
    assert 0.35 < h < 0.65
    walk = np.cumsum(noise)
    h_walk = estimators.hurst_exponent_dfa(walk)
    assert h_walk > 1.2
    # Short-series fallback (RoughVolatility.cpp:74, :110)
    assert estimators.hurst_exponent_dfa(np.array([1.0])) == 0.5
    assert estimators.hurst_exponent_dfa(np.arange(8.0)) == 0.5


def test_estimate_params_raises_on_short_history():
    import pytest
    with pytest.raises(ValueError):
        estimators.estimate_params(np.array([100.0]))


def test_estimate_params_end_to_end(rng):
    prices = 100.0 * np.exp(np.cumsum(rng.normal(0.0002, 0.01, 800)))
    p = estimators.estimate_params(prices)
    assert p.s0 == prices[-1]
    assert p.xi > 0 and p.eta > 0 and p.rho <= 0 and p.r == 0.04
