"""Parity tests: each TPU pricer vs its NumPy oracle on identical path
matrices (the SURVEY.md section 4 "statistical parity ... at matched path
counts" harness, made *deterministic* by sharing paths and branch draws)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from montecarlooptionspricer_tpu.models import (
    asymptotic_price, branching_price, lower_bound, lsm_price,
    martingale_price, upper_bound)
from montecarlooptionspricer_tpu.models import gbm
from montecarlooptionspricer_tpu.models.closed_form import (
    binomial_american, black_scholes)

import oracles

R, STRIKE, DT = 0.04, 100.0, 1.0 / 252.0


def make_paths(rng, n=250, steps=50, s0=100.0, sigma=0.3):
    w = rng.normal(size=(n, steps))
    inc = (R - 0.5 * sigma**2) * DT + sigma * np.sqrt(DT) * w
    return np.concatenate(
        [np.full((n, 1), s0), s0 * np.exp(np.cumsum(inc, axis=1))], axis=1)


@pytest.fixture
def paths(rng):
    return make_paths(rng)


@pytest.mark.parametrize("is_call", [True, False])
def test_asymptotic_parity(paths, is_call):
    maturity = paths.shape[1] * DT  # all steps live
    sigma, dividend = 0.3, 0.08
    ref = oracles.asymptotic_price(paths, R, STRIKE, maturity, DT, is_call,
                                   sigma, dividend)
    ours = float(asymptotic_price(jnp.asarray(paths, jnp.float32), R, STRIKE,
                                  maturity, DT, is_call, sigma, dividend))
    assert abs(ours - ref) < 5e-3 * max(1.0, abs(ref)) + 1e-3


def test_asymptotic_long_maturity_negative_log(rng):
    # maturity > 1 year: eps*ln(1/eps) < 0 early on -> C++ NaN boundary ->
    # empty exercise region; check we reproduce that path.
    paths = make_paths(rng, n=100, steps=400)
    maturity = 400 * DT  # ~1.59y
    ref = oracles.asymptotic_price(paths, R, STRIKE, maturity, DT, False,
                                   0.3, 0.08)
    ours = float(asymptotic_price(jnp.asarray(paths, jnp.float32), R, STRIKE,
                                  maturity, DT, False, 0.3, 0.08))
    assert abs(ours - ref) < 5e-3 * max(1.0, abs(ref)) + 1e-3


def test_asymptotic_skips_nonfinite(paths):
    bad = paths.copy()
    bad[3, 10] = np.nan
    bad[7, 20] = np.inf
    maturity = paths.shape[1] * DT
    ref = oracles.asymptotic_price(bad, R, STRIKE, maturity, DT, False, 0.3, 0.08)
    ours = float(asymptotic_price(jnp.asarray(bad, jnp.float32), R, STRIKE,
                                  maturity, DT, False, 0.3, 0.08))
    assert np.isfinite(ours)
    assert abs(ours - ref) < 5e-3 * max(1.0, abs(ref)) + 1e-3


@pytest.mark.parametrize("is_call", [True, False])
def test_lsm_parity(paths, is_call):
    maturity = paths.shape[1] * DT
    ref = oracles.lsm_price(paths, R, STRIKE, maturity, DT, is_call, 2)
    ours = float(lsm_price(jnp.asarray(paths, jnp.float32), R, STRIKE,
                           maturity, DT, is_call, 2))
    assert abs(ours - ref) < 2e-2 * max(1.0, abs(ref)), (ours, ref)


def test_lsm_maturity_cut(paths):
    # t > maturity steps only discount (LSMPricer.cpp:44-49).
    maturity = 20 * DT
    ref = oracles.lsm_price(paths, R, STRIKE, maturity, DT, False, 2)
    ours = float(lsm_price(jnp.asarray(paths, jnp.float32), R, STRIKE,
                           maturity, DT, False, 2))
    assert abs(ours - ref) < 2e-2 * max(1.0, abs(ref))


def test_lsm_deep_otm_no_itm_paths(rng):
    # Strike far below all puts -> ITM set empty at every step.
    paths = make_paths(rng, n=64, steps=20, s0=100.0)
    maturity = 21 * DT
    ref = oracles.lsm_price(paths, R, 1.0, maturity, DT, False, 2)
    ours = float(lsm_price(jnp.asarray(paths, jnp.float32), R, 1.0, maturity,
                           DT, False, 2))
    assert ours == pytest.approx(ref, abs=1e-6)
    assert ours == 0.0


@pytest.mark.parametrize("is_call", [True, False])
def test_branching_lower_parity(paths, is_call):
    m = paths.shape[1]
    ex = np.arange(m - 1)
    maturity = m * DT
    ref = oracles.branching_lower(paths, R, STRIKE, maturity, DT, is_call, ex)
    ours = float(lower_bound(jnp.asarray(paths, jnp.float32), R, STRIKE,
                             maturity, DT, is_call, jnp.asarray(ex)))
    assert abs(ours - ref) < 5e-3 * max(1.0, abs(ref)) + 1e-3


@pytest.mark.parametrize("is_call", [True, False])
def test_branching_upper_parity_fixed_branches(paths, rng, is_call):
    n, m = paths.shape
    ex = np.arange(m - 1)
    maturity = m * DT
    nb = 5
    rp = rng.integers(0, n, size=(n, ex.size, nb))
    ref = oracles.branching_upper(paths, R, STRIKE, maturity, DT, is_call,
                                  nb, ex, rp)
    ours = float(upper_bound(jnp.asarray(paths, jnp.float32), R, STRIKE,
                             maturity, DT, is_call, nb, jnp.asarray(ex),
                             key=None, rp=jnp.asarray(rp)))
    assert abs(ours - ref) < 5e-3 * max(1.0, abs(ref)) + 1e-3


def test_branching_upper_maturity_cut(rng):
    paths = make_paths(rng, n=60, steps=30)
    ex = np.arange(29)
    maturity = 15 * DT  # break mid-way (BranchingProcessPricer.cpp:96-99)
    nb = 4
    rp = rng.integers(0, 60, size=(60, ex.size, nb))
    ref = oracles.branching_upper(paths, R, STRIKE, maturity, DT, False, nb,
                                  ex, rp)
    ours = float(upper_bound(jnp.asarray(paths, jnp.float32), R, STRIKE,
                             maturity, DT, False, nb, jnp.asarray(ex),
                             key=None, rp=jnp.asarray(rp)))
    assert abs(ours - ref) < 5e-3 * max(1.0, abs(ref)) + 1e-3


def test_branching_upper_key_draws_equal_injected_foldin(paths):
    """The key-drawing path accumulates its B branch gathers one [N, T]
    plane at a time (fori_loop — the one-shot [N, T, B] gather OOM'd the
    2048-step pipeline bucket on chip, VERIFY_r04 §11).  Pin its
    arithmetic to the vectorized injected-rp form by rebuilding the same
    fold_in draws as an explicit rp tensor."""
    m = paths.shape[1]
    n = paths.shape[0]
    ex = np.arange(m - 1)
    maturity = m * DT
    nb = 4
    key = jax.random.key(42)
    rp = np.stack(
        [np.asarray(jax.random.randint(jax.random.fold_in(key, b),
                                       (n, ex.size), 0, n))
         for b in range(nb)], axis=-1)
    via_key = float(upper_bound(jnp.asarray(paths, jnp.float32), R, STRIKE,
                                maturity, DT, True, nb, jnp.asarray(ex),
                                key=key))
    via_rp = float(upper_bound(jnp.asarray(paths, jnp.float32), R, STRIKE,
                               maturity, DT, True, nb, jnp.asarray(ex),
                               key=None, rp=jnp.asarray(rp)))
    assert np.isclose(via_key, via_rp, rtol=1e-5, atol=1e-6), (via_key,
                                                               via_rp)


def test_branching_price_statistical(paths):
    # Full price with internal RNG: must land between (noisy) bounds.
    m = paths.shape[1]
    ex = jnp.arange(m - 1)
    maturity = m * DT
    p = float(branching_price(jnp.asarray(paths, jnp.float32), R, STRIKE,
                              maturity, DT, False, 10, ex, jax.random.key(0)))
    lo = float(lower_bound(jnp.asarray(paths, jnp.float32), R, STRIKE,
                           maturity, DT, False, ex))
    assert p >= lo - 1e-6
    assert np.isfinite(p)


@pytest.mark.parametrize("is_call", [True, False])
def test_martingale_parity(paths, is_call):
    m = paths.shape[1]
    maturity = m * DT
    ref = oracles.martingale_price(paths, R, STRIKE, maturity, DT, is_call, 2)
    ours = float(martingale_price(jnp.asarray(paths, jnp.float32), R, STRIKE,
                                  maturity, DT, is_call, 2))
    assert abs(ours - ref) < 3e-2 * max(1.0, abs(ref)), (ours, ref)


def test_lsm_brackets_binomial_american_put():
    # American put under GBM: LSM (value-carrying variant, upward-biased)
    # should sit near the binomial price and above the European price.
    s0, k, r, sigma, t = 100.0, 110.0, 0.05, 0.25, 0.5
    steps = 50
    dt = t / steps
    paths = gbm.generate_paths(jax.random.key(42), s0, sigma, r, steps,
                               20_000, dt)
    price = float(lsm_price(paths, r, k, t, dt, False, 2))
    amer = binomial_american(s0, k, r, sigma, t, False, steps=2000)
    euro = black_scholes(s0, k, r, sigma, t, False)
    assert euro - 0.15 < price < amer * 1.10, (price, euro, amer)
    assert abs(price - amer) / amer < 0.10


def test_implied_vol_round_trip():
    from montecarlooptionspricer_tpu.models.closed_form import (black_scholes,
                                                                implied_vol)

    for sigma in (0.08, 0.25, 0.9):
        for is_call in (True, False):
            p = black_scholes(100.0, 112.0, 0.03, sigma, 0.75, is_call,
                              dividend=0.01)
            iv = implied_vol(p, 100.0, 112.0, 0.03, 0.75, is_call,
                             dividend=0.01)
            assert iv == pytest.approx(sigma, abs=1e-6)
    # no-arbitrage violations -> NaN
    assert np.isnan(implied_vol(-0.5, 100.0, 112.0, 0.03, 0.75, True))
    assert np.isnan(implied_vol(500.0, 100.0, 112.0, 0.03, 0.75, True))
