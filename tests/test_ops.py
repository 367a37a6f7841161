"""Unit tests for L0 numerics: payoff, regression, estimators."""

import numpy as np
import jax.numpy as jnp

from montecarlooptionspricer_tpu.ops import estimators
from montecarlooptionspricer_tpu.ops.payoff import payoff
from montecarlooptionspricer_tpu.ops.regression import (
    eval_poly, fit_poly_masked, poly_basis)

import oracles


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
