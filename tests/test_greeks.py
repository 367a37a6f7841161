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
