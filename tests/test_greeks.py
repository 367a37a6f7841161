"""AD pathwise Greeks: validate against Black-Scholes closed forms on the
European GBM control case, and sanity-bound the American LSM case."""

import math

import numpy as np
import pytest

import jax

from montecarlooptionspricer_tpu.models import greeks
from montecarlooptionspricer_tpu.models.closed_form import black_scholes


def _bs_delta_vega_rho(s0, k, r, sigma, t, is_call=True):
    d1 = (math.log(s0 / k) + (r + 0.5 * sigma**2) * t) / (sigma * math.sqrt(t))
    d2 = d1 - sigma * math.sqrt(t)
    from math import erf, exp, pi, sqrt

    N = lambda x: 0.5 * (1.0 + erf(x / sqrt(2.0)))
    pdf = lambda x: exp(-0.5 * x * x) / sqrt(2.0 * pi)
    if is_call:
        delta = N(d1)
        rho = k * t * exp(-r * t) * N(d2)
    else:
        delta = N(d1) - 1.0
        rho = -k * t * exp(-r * t) * N(-d2)
    vega = s0 * pdf(d1) * sqrt(t)
    return delta, vega, rho


@pytest.mark.parametrize("is_call", [True, False])
def test_european_greeks_match_black_scholes(is_call):
    s0, k, r, sigma, t = 100.0, 105.0, 0.04, 0.25, 0.5
    g = greeks.european_greeks(jax.random.key(7), s0, sigma, r, k, t,
                               n_steps=32, n_paths=200_000, is_call=is_call)
    bs_price = black_scholes(s0, k, r, sigma, t, is_call)
    d, v, rho = _bs_delta_vega_rho(s0, k, r, sigma, t, is_call)
    assert g.price == pytest.approx(bs_price, rel=0.02)
    assert g.delta == pytest.approx(d, abs=0.02)
    assert g.vega_xi == pytest.approx(v, rel=0.05)
    assert g.rho_rate == pytest.approx(rho, rel=0.06, abs=0.5)


def test_european_greeks_rejects_inconsistent_dt():
    """The GBM control diffuses exactly to maturity: an explicit dt with
    n_steps*dt != maturity used to price the wrong horizon discounted over
    the right one, silently (e.g. the codebase-conventional dt=1/252)."""
    with pytest.raises(ValueError, match="maturity"):
        greeks.european_greeks(jax.random.key(0), 100.0, 0.2, 0.05, 100.0,
                               0.5, n_steps=63, n_paths=128, dt=1 / 252.0)
    # consistent explicit dt is fine
    g = greeks.european_greeks(jax.random.key(0), 100.0, 0.2, 0.05, 100.0,
                               0.5, n_steps=63, n_paths=128, dt=0.5 / 63)
    assert g.price > 0


def test_black_scholes_zero_vol_limit_is_discounted_forward():
    """sigma -> 0 must be continuous: the zero-vol price is the DISCOUNTED
    forward intrinsic (the spot intrinsic sits below the no-arbitrage
    lower bound S - K e^{-rT})."""
    s0, k, r, t = 100.0, 90.0, 0.05, 1.0
    limit = black_scholes(s0, k, r, 1e-9, t, True)
    exact = black_scholes(s0, k, r, 0.0, t, True)
    assert exact == pytest.approx(limit, abs=1e-5)
    assert exact >= s0 - k * np.exp(-r * t) - 1e-12
    # expired option: plain intrinsic, both types
    assert black_scholes(s0, k, r, 0.3, 0.0, True) == 10.0
    assert black_scholes(s0, k, r, 0.0, t, False) == 0.0


def test_lsm_greeks_bounds_and_determinism():
    key = jax.random.key(3)
    kwargs = dict(s0=100.0, xi=0.04, h=0.1, eta=1.5, rho=-0.4, r=0.04,
                  strike=105.0, maturity=0.25, n_steps=64, n_paths=8192,
                  is_call=False)
    g1 = greeks.lsm_greeks(key, **kwargs)
    g2 = greeks.lsm_greeks(key, **kwargs)
    assert g1 == g2                       # bitwise deterministic per seed
    assert g1.price > 0
    assert -1.0 - 1e-3 <= g1.delta <= 0.0  # American put delta in [-1, 0]
    assert g1.vega_xi > 0.0               # more variance -> pricier option
    assert np.isfinite(g1.rho_rate)
