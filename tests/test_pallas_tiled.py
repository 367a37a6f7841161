"""Step-tiled Pallas kernel tests (long-horizon path generation + fused
policy).  The math path runs elementwise against the XLA generator via the
noise-injection variants on the CPU interpreter; the in-kernel RNG variant
is exercised on hardware (tests/test_engine.py, bench.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from montecarlooptionspricer_tpu.models import (engine, pathgen_pallas,
                                                pathgen_pallas_tiled)
from test_pallas import KW, xla_paths_from_noise


def test_supports_reference_horizon():
    # The reference's longest workload is 1825 steps
    # (PredictionGen.cpp:247-258); the tiled kernel must cover it in f32 at
    # the default block size (the single-tile kernel caps at 512).
    assert not pathgen_pallas.supports(1825)
    assert pathgen_pallas_tiled.supports(1825)
    assert pathgen_pallas_tiled.supports(
        1825, fgn_dtype=jnp.bfloat16)


def test_tiled_pathgen_matches_xla_elementwise(rng):
    # 200 steps -> s_pad 256 -> 2 step tiles: exercises the cross-tile
    # cumsum carry.
    n_steps, chunk = 200, 128
    gen, s_pad = pathgen_pallas_tiled.make_tiled_pathgen(
        **KW, n_steps=n_steps, dt=1 / 252, chunk_paths=chunk,
        block_paths=64, interpret=True, noise_input=True)
    assert s_pad == 256
    noise = np.zeros((3, chunk, s_pad), np.float32)
    noise[:, :, :n_steps] = rng.normal(size=(3, chunk, n_steps))
    noise[:, :, n_steps:] = 99.0  # padded tail must be ignored
    ours = np.asarray(gen(jnp.asarray(noise)))
    ref = xla_paths_from_noise(noise, n_steps)
    assert ours.shape == (chunk, n_steps + 1)
    np.testing.assert_allclose(ours, ref, rtol=2e-4)
    assert np.all(np.isfinite(ours))


def test_tiled_pathgen_matches_single_tile_kernel(rng):
    # Same injected noise through both kernels: the step-tiled math is the
    # same computation re-blocked, so prices agree to f32 reassociation.
    n_steps, chunk = 96, 64
    noise = np.zeros((3, chunk, 128), np.float32)
    noise[:, :, :n_steps] = rng.normal(size=(3, chunk, n_steps))
    one, _ = pathgen_pallas.make_pallas_pathgen_from_noise(
        **KW, n_steps=n_steps, dt=1 / 252, chunk_paths=chunk,
        block_paths=32, interpret=True)
    tiled, _ = pathgen_pallas_tiled.make_tiled_pathgen(
        **KW, n_steps=n_steps, dt=1 / 252, chunk_paths=chunk,
        block_paths=32, interpret=True, noise_input=True)
    a = np.asarray(one(jnp.asarray(noise)))
    b = np.asarray(tiled(jnp.asarray(noise)))
    np.testing.assert_allclose(a, b, rtol=2e-5)


@pytest.mark.slow
def test_tiled_priced_kernel_matches_xla_policy(rng):
    """Tiled fused (paths + LSM policy) == XLA generator + lsm_policy_value
    on identical injected noise, across a multi-tile horizon."""
    from montecarlooptionspricer_tpu.models.lsm import lsm_fit

    s0, xi, h, eta, rho, r = 100.0, 0.04, 0.2, 1.0, -0.4, 0.04
    n_steps, chunk, dt = 200, 128, 1 / 252.0
    strike, maturity, is_call = 97.0, 200 / 252.0, False

    pilot = engine.make_chunk_pathgen(s0, xi, h, eta, rho, r, n_steps, dt,
                                      1 << 11)(jax.random.key(0))
    _, fits = lsm_fit(pilot, r, strike, maturity, dt, is_call, 2)

    gen, s_pad = pathgen_pallas_tiled.make_tiled_pathgen(
        s0, xi, h, eta, rho, r, n_steps, dt, chunk, block_paths=64,
        interpret=True, noise_input=True)
    noise = jnp.asarray(rng.standard_normal((3, chunk, s_pad)), jnp.float32)
    paths = gen(noise)
    want, _ = engine.lsm_policy_value(paths, fits, r, strike, maturity, dt,
                                      is_call)

    priced, s_pad2 = pathgen_pallas_tiled.make_tiled_priced_chunk(
        s0, xi, h, eta, rho, r, strike, maturity, dt, n_steps, chunk,
        block_paths=64, is_call=is_call, interpret=True, noise_input=True)
    assert s_pad2 == s_pad
    rows = pathgen_pallas.policy_rows(fits, r, strike, maturity, dt,
                                      n_steps, is_call)
    got = priced(noise, rows)
    ex0, _ = pathgen_pallas.time0_value(fits, s0, strike, is_call)
    assert not bool(ex0)
    np.testing.assert_allclose(float(got), float(want), rtol=2e-4)


@pytest.mark.slow
def test_tiled_priced_first_exercise_across_tiles(rng):
    """A path that exercises in tile 0 must NOT contribute again from a
    later tile (the cross-tile stopped flag)."""
    from montecarlooptionspricer_tpu.models.lsm import lsm_fit

    s0, xi, h, eta, rho, r = 100.0, 0.09, 0.3, 1.5, -0.4, 0.04
    n_steps, chunk, dt = 160, 64, 1 / 252.0
    strike, maturity, is_call = 99.0, 160 / 252.0, False

    pilot = engine.make_chunk_pathgen(s0, xi, h, eta, rho, r, n_steps, dt,
                                      1 << 11)(jax.random.key(2))
    _, fits = lsm_fit(pilot, r, strike, maturity, dt, is_call, 2)
    gen, s_pad = pathgen_pallas_tiled.make_tiled_pathgen(
        s0, xi, h, eta, rho, r, n_steps, dt, chunk, block_paths=32,
        interpret=True, noise_input=True)
    noise = jnp.asarray(3.0 * rng.standard_normal((3, chunk, s_pad)),
                        jnp.float32)  # wild noise -> many early exercises
    paths = gen(noise)
    want, _ = engine.lsm_policy_value(paths, fits, r, strike, maturity, dt,
                                      is_call)
    priced, _ = pathgen_pallas_tiled.make_tiled_priced_chunk(
        s0, xi, h, eta, rho, r, strike, maturity, dt, n_steps, chunk,
        block_paths=32, is_call=is_call, interpret=True, noise_input=True)
    rows = pathgen_pallas.policy_rows(fits, r, strike, maturity, dt,
                                      n_steps, is_call)
    got = priced(noise, rows)
    np.testing.assert_allclose(float(got), float(want), rtol=2e-4)


def test_tiled_rejects_past_vmem_budget():
    with pytest.raises(ValueError):
        pathgen_pallas_tiled.make_tiled_pathgen(
            **KW, n_steps=40_000, dt=1 / 252, chunk_paths=256,
            block_paths=256)


def test_tiled_priced_kernel_cv_output(rng):
    """with_cv=True on the tiled kernel: lane 1 equals the martingale
    control e^{-rT} sum(S_T) from the same paths (the terminal column
    lives mid-tile for this horizon), and lane 0 is unchanged."""
    from montecarlooptionspricer_tpu.models.lsm import lsm_fit

    s0, xi, h, eta, rho, r = 100.0, 0.04, 0.2, 1.0, -0.4, 0.04
    n_steps, chunk, dt = 200, 128, 1 / 252.0
    strike, maturity, is_call = 97.0, 200 / 252.0, False

    pilot = engine.make_chunk_pathgen(s0, xi, h, eta, rho, r, n_steps, dt,
                                      1 << 11)(jax.random.key(0))
    _, fits = lsm_fit(pilot, r, strike, maturity, dt, is_call, 2)
    rows = pathgen_pallas.policy_rows(fits, r, strike, maturity, dt,
                                      n_steps, is_call)

    gen, s_pad = pathgen_pallas_tiled.make_tiled_pathgen(
        s0, xi, h, eta, rho, r, n_steps, dt, chunk, block_paths=64,
        interpret=True, noise_input=True)
    noise = jnp.asarray(rng.standard_normal((3, chunk, s_pad)), jnp.float32)
    paths = gen(noise)
    want_cv = float(jnp.sum(engine.martingale_control(
        paths[:, :n_steps + 1], r, dt)))

    kw = dict(strike=strike, maturity=maturity, dt=dt, n_steps=n_steps,
              chunk_paths=chunk, block_paths=64, is_call=is_call,
              interpret=True, noise_input=True)
    plain, _ = pathgen_pallas_tiled.make_tiled_priced_chunk(
        s0, xi, h, eta, rho, r, **kw)
    cv, _ = pathgen_pallas_tiled.make_tiled_priced_chunk(
        s0, xi, h, eta, rho, r, **kw, with_cv=True)
    got_plain = float(plain(noise, rows))
    got_a, got_c = cv(noise, rows)
    np.testing.assert_allclose(float(got_a), got_plain, rtol=1e-6)
    np.testing.assert_allclose(float(got_c), want_cv, rtol=2e-5)

def test_tiled_priced_log_boundary_matches_comparator(rng):
    """Tiled fused with policy_form="boundary" (LOG-space interval test,
    cross-tile stop accumulators, one exp per path at the last tile —
    VERIFY_r03 §12) == the XLA boundary-form comparator on identical
    injected noise, across a multi-tile horizon, incl. the CV lane."""
    from montecarlooptionspricer_tpu.models.lsm import lsm_fit

    s0, xi, h, eta, rho, r = 100.0, 0.04, 0.2, 1.0, -0.4, 0.04
    n_steps, chunk, dt = 200, 128, 1 / 252.0
    strike, maturity, is_call = 97.0, 200 / 252.0, False

    pilot = engine.make_chunk_pathgen(s0, xi, h, eta, rho, r, n_steps, dt,
                                      1 << 11)(jax.random.key(0))
    _, fits = lsm_fit(pilot, r, strike, maturity, dt, is_call, 2)

    gen, s_pad = pathgen_pallas_tiled.make_tiled_pathgen(
        s0, xi, h, eta, rho, r, n_steps, dt, chunk, block_paths=64,
        interpret=True, noise_input=True)
    # wilder noise than the quadratic test: exercises must land in
    # multiple tiles for the cross-tile accumulators to be exercised
    noise = jnp.asarray(1.5 * rng.standard_normal((3, chunk, s_pad)),
                        jnp.float32)
    paths = gen(noise)

    tab = pathgen_pallas.boundary_rows(fits, r, strike, maturity, dt,
                                       n_steps, is_call)
    want = pathgen_pallas.boundary_policy_value(paths, tab, n_steps,
                                                is_call)
    rows = pathgen_pallas.log_boundary_rows(tab)

    priced_cv, s_pad2 = pathgen_pallas_tiled.make_tiled_priced_chunk(
        s0, xi, h, eta, rho, r, strike, maturity, dt, n_steps, chunk,
        block_paths=64, is_call=is_call, interpret=True, noise_input=True,
        policy_form="boundary", with_cv=True)
    assert s_pad2 == s_pad
    got, cv = priced_cv(noise, rows)
    np.testing.assert_allclose(float(got), float(want), rtol=5e-4)
    want_cv = float(np.exp(-r * n_steps * dt)
                    * np.sum(np.asarray(paths)[:, n_steps]))
    np.testing.assert_allclose(float(cv), want_cv, rtol=2e-4)


def test_tiled_priced_antithetic_matches_pair(rng):
    """Tiled antithetic=True on injected noise (chunk/2 rows per plane)
    equals the plain tiled kernel run on +noise plus on -noise: the pair
    shares one fGN matmul per tile (the partner's tile is -x, see
    _pair_tiles) but each member's arithmetic — including the cross-tile
    carry/stop/lsst/dst state in its block half — is the plain body's.
    Multi-tile horizon, chol form, CV lane included."""
    from montecarlooptionspricer_tpu.models.lsm import lsm_fit

    s0, xi, h, eta, rho, r = 100.0, 0.04, 0.2, 1.0, -0.4, 0.04
    n_steps, chunk, dt = 200, 128, 1 / 252.0
    strike, maturity, is_call = 97.0, 200 / 252.0, False
    half = chunk // 2

    pilot = engine.make_chunk_pathgen(s0, xi, h, eta, rho, r, n_steps, dt,
                                      1 << 11)(jax.random.key(0))
    _, fits = lsm_fit(pilot, r, strike, maturity, dt, is_call, 2)
    rows = pathgen_pallas.log_boundary_rows(
        pathgen_pallas.boundary_rows(fits, r, strike, maturity, dt,
                                     n_steps, is_call))

    kw = dict(is_call=is_call, interpret=True, noise_input=True,
              policy_form="boundary", fgn_form="chol", with_cv=True)
    anti, s_pad = pathgen_pallas_tiled.make_tiled_priced_chunk(
        s0, xi, h, eta, rho, r, strike, maturity, dt, n_steps, chunk,
        block_paths=64, antithetic=True, **kw)
    plain, _ = pathgen_pallas_tiled.make_tiled_priced_chunk(
        s0, xi, h, eta, rho, r, strike, maturity, dt, n_steps, half,
        block_paths=32, **kw)

    noise = jnp.asarray(1.5 * rng.standard_normal((2, half, s_pad)),
                        jnp.float32)
    got_v, got_c = anti(noise, rows)
    vp, cp = plain(noise, rows)
    vm, cm = plain(-noise, rows)
    np.testing.assert_allclose(float(got_v), float(vp) + float(vm),
                               rtol=1e-5)
    np.testing.assert_allclose(float(got_c), float(cp) + float(cm),
                               rtol=1e-5)


def test_tiled_pathgen_antithetic_matches_pair(rng):
    """r04: slab whole-path generator antithetic=True on injected noise
    (block/2 rows per plane) == plain slab rows on +noise stacked on
    -noise per block — this is the pairing that lets price_with_bounds
    stream paired paths at long horizons (VERDICT r03 item 3)."""
    s0, xi, h, eta, rho, r = 100.0, 0.04, 0.2, 1.0, -0.4, 0.04
    n_steps, chunk, dt = 200, 128, 1 / 252.0

    kw = dict(interpret=True, noise_input=True, fgn_form="chol")
    anti, s_pad = pathgen_pallas_tiled.make_tiled_pathgen(
        s0, xi, h, eta, rho, r, n_steps, dt, chunk, block_paths=64,
        antithetic=True, **kw)
    plain, _ = pathgen_pallas_tiled.make_tiled_pathgen(
        s0, xi, h, eta, rho, r, n_steps, dt, chunk // 2, block_paths=32,
        **kw)

    noise = jnp.asarray(rng.standard_normal((2, chunk // 2, s_pad)),
                        jnp.float32)
    got = np.asarray(anti(noise))
    p_plus = np.asarray(plain(noise))
    p_minus = np.asarray(plain(-noise))
    want = np.concatenate([p_plus[:32], p_minus[:32],
                           p_plus[32:], p_minus[32:]], axis=0)
    np.testing.assert_allclose(got, want, rtol=1e-6)
