"""Path-generation tests: GBM vs Black-Scholes (BASELINE.json config #1),
rBergomi Euler recursion vs oracle, determinism."""

import numpy as np
import jax
import jax.numpy as jnp

from montecarlooptionspricer_tpu.models import gbm, rough_volatility
from montecarlooptionspricer_tpu.models.closed_form import black_scholes

import oracles


def test_gbm_european_call_vs_black_scholes():
    # Config #1 of BASELINE.json: European call under GBM, 1e5 paths x 252
    # steps, RNG + payoff mean, CPU-runnable.
    s0, k, r, sigma, t = 100.0, 105.0, 0.04, 0.2, 1.0
    n_paths, n_steps = 100_000, 252
    dt = t / n_steps
    paths = gbm.generate_paths(jax.random.key(7), s0, sigma, r, n_steps,
                               n_paths, dt)
    payoff = jnp.maximum(paths[:, -1] - k, 0.0) * np.exp(-r * t)
    price = float(jnp.mean(payoff))
    stderr = float(jnp.std(payoff)) / np.sqrt(n_paths)
    ref = black_scholes(s0, k, r, sigma, t, True)
    assert abs(price - ref) < 3.0 * stderr + 1e-3, (price, ref, stderr)


def test_gbm_martingale_property():
    s0, r, sigma, t = 50.0, 0.03, 0.35, 0.5
    n_paths, n_steps = 200_000, 64
    dt = t / n_steps
    paths = gbm.generate_paths(jax.random.key(3), s0, sigma, r, n_steps,
                               n_paths, dt)
    disc_terminal = jnp.exp(-r * t) * paths[:, -1]
    mean = float(jnp.mean(disc_terminal))
    stderr = float(jnp.std(disc_terminal)) / np.sqrt(n_paths)
    assert abs(mean - s0) < 4.0 * stderr + 0.02


def test_euler_recursion_matches_oracle(rng):
    # Same variance curves + same noise => same paths as the C++ loop.
    s0, r, rho, dt = 120.0, 0.04, -0.4, 1.0 / 252.0
    n_paths, n_steps = 6, 40
    v = rng.uniform(0.01, 0.09, (n_paths, n_steps))
    w1 = rng.normal(size=(n_paths, n_steps))
    w2 = rng.normal(size=(n_paths, n_steps))
    ref = oracles.euler_paths(s0, r, rho, v, w1, w2, dt)

    # Reproduce euler_log_paths' math with injected noise.
    sqrt_dt = np.sqrt(dt)
    dw = (rho * w1 + np.sqrt(1 - rho**2) * w2) * sqrt_dt
    inc = (r - 0.5 * v) * dt + np.sqrt(np.maximum(0.0, v)) * dw
    ours = np.concatenate(
        [np.full((n_paths, 1), s0),
         s0 * np.exp(np.cumsum(inc, axis=1))], axis=1)
    np.testing.assert_allclose(ours, ref, rtol=1e-10)

    # And the jitted device version agrees to float32 accuracy.  The device
    # generator draws ONE normal per step (the reference's rho*w1 +
    # sqrt(1-rho^2)*w2 is exactly one N(0,1), independent of v, because both
    # w's are independent of the fGN driver — RoughVolatility.cpp:355-358);
    # inject that combined normal through the rng_ops.normal seam.
    import montecarlooptionspricer_tpu.models.rough_volatility as rv
    import montecarlooptionspricer_tpu.ops.rng as rng_ops

    w = rho * w1 + np.sqrt(1 - rho**2) * w2
    orig = rng_ops.normal
    try:
        rng_ops.normal = lambda key, shape, dtype=jnp.float32: (
            jnp.asarray(w, dtype))
        dev = rv.euler_log_paths(jax.random.key(0), s0, r, rho,
                                 jnp.asarray(v, jnp.float32), dt)
    finally:
        rng_ops.normal = orig
    np.testing.assert_allclose(np.asarray(dev), ref, rtol=5e-4)


def test_rbergomi_paths_shape_and_start():
    key = jax.random.key(11)
    paths = rough_volatility.generate_paths(
        key, s0=250.0, xi=0.04, h=0.1, eta=1.9, rho=-0.3, r=0.04,
        n_steps=100, n_paths=64)
    assert paths.shape == (64, 101)
    np.testing.assert_allclose(np.asarray(paths[:, 0]), 250.0)
    assert bool(jnp.all(paths > 0))
    assert bool(jnp.all(jnp.isfinite(paths)))


def test_rbergomi_deterministic_per_seed():
    kwargs = dict(s0=100.0, xi=0.05, h=0.15, eta=1.2, rho=-0.5, r=0.04,
                  n_steps=60, n_paths=32)
    a = rough_volatility.generate_paths(jax.random.key(5), **kwargs)
    b = rough_volatility.generate_paths(jax.random.key(5), **kwargs)
    c = rough_volatility.generate_paths(jax.random.key(6), **kwargs)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_generate_from_history_smoke(rng):
    prices = 100.0 * np.exp(np.cumsum(rng.normal(0.0002, 0.012, 400)))
    paths = rough_volatility.generate_paths_from_history(
        jax.random.key(1), prices, forward_steps=30, path_num=16)
    assert paths.shape == (16, 31)
    np.testing.assert_allclose(np.asarray(paths[:, 0]), prices[-1], rtol=1e-5)


def test_bucketed_pathgen_antithetic_pairing(rng):
    """generate_paths_bucketed(antithetic=True): rows [:half] EQUAL the
    plain half-size call on the same key (identical draw calls), and
    rows [half:] equal the shared core run on the negated draws."""
    import jax
    import jax.numpy as jnp
    from montecarlooptionspricer_tpu.models import rough_volatility as rv
    from montecarlooptionspricer_tpu.ops import rng as rng_ops

    s0, xi, h, eta, rho, r = 100.0, 0.04, 0.12, 1.3, -0.4, 0.04
    n_steps, n_pad, m1, n, dt = 24, 32, 32, 64, 1 / 252.0
    half = n // 2
    key = jax.random.key(13)

    got = np.asarray(rv.generate_paths_bucketed(
        key, s0, xi, h, eta, rho, r, n_steps, n_pad, m1, n, dt,
        antithetic=True))
    want0 = np.asarray(rv.generate_paths_bucketed(
        key, s0, xi, h, eta, rho, r, n_steps, n_pad, m1, half, dt))
    np.testing.assert_allclose(got[:half], want0, rtol=1e-6)

    k_var, k_euler = jax.random.split(key)
    zc = rng_ops.complex_normal(k_var, (half, n_pad), jnp.float32)
    w = rng_ops.normal(k_euler, (half, n_pad), jnp.float32)
    want1 = np.asarray(rv._bucketed_paths_from_noise(
        s0, xi, h, eta, r, jnp.asarray(n_steps, jnp.int32), n_pad, m1,
        -zc, -w * np.float32(np.sqrt(dt)), dt, jnp.float32))
    np.testing.assert_allclose(got[half:], want1, rtol=1e-6)
