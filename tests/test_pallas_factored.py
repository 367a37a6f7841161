"""Factored-DFT (four-step) Pallas kernel tests.  The math path runs
elementwise against the dense-spectral XLA form via the noise-injection
variants on the CPU interpreter (the injected driver planes live in the
kernel's transposed storage order; transposed_to_logical maps them to the
logical frequency order the dense matrices consume).  The in-kernel RNG
variant is exercised on hardware (tests/test_engine.py, bench.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from montecarlooptionspricer_tpu.models import (engine, pathgen_pallas,
                                                pathgen_pallas_factored,
                                                pathgen_pallas_tiled)
from test_pallas import KW, xla_paths_from_noise


def _logical_noise(noise_t, n_steps):
    """[3, chunk, m2] kernel-layout noise -> [3, chunk, >=n_steps] logical
    planes for xla_paths_from_noise (driver planes permuted; the price
    Brownian plane is already in step order)."""
    m2 = noise_t.shape[-1]
    perm = pathgen_pallas_factored.transposed_to_logical(m2)
    out = np.array(noise_t)
    for p in (0, 1):
        logical = np.empty_like(noise_t[p])
        logical[:, perm] = noise_t[p]
        out[p] = logical
    return out


def test_supports_range():
    # Below one lane group the single-tile kernel owns the workload; the
    # factored kernel covers the reference's 1825-step horizon and beyond.
    assert not pathgen_pallas_factored.supports(64)
    assert pathgen_pallas_factored.supports(200)
    assert pathgen_pallas_factored.supports(1825)
    assert pathgen_pallas_factored.supports(1825, block_paths=512)
    assert not pathgen_pallas_factored.supports(40_000)


def test_factored_pathgen_matches_dense_elementwise(rng):
    # 200 steps -> s_pad 256, m2 256, N2 = 2: exercises the cross-tile
    # cumsum carry and a nontrivial stage-2 combination.
    n_steps, chunk = 200, 128
    gen, s_pad = pathgen_pallas_factored.make_factored_pathgen(
        **KW, n_steps=n_steps, dt=1 / 252, chunk_paths=chunk,
        block_paths=64, interpret=True, noise_input=True)
    assert s_pad == 256
    noise = rng.normal(size=(3, chunk, 256)).astype(np.float32)
    ours = np.asarray(gen(jnp.asarray(noise)))
    ref = xla_paths_from_noise(_logical_noise(noise, n_steps), n_steps)
    assert ours.shape == (chunk, n_steps + 1)
    np.testing.assert_allclose(ours, ref, rtol=2e-4)
    assert np.all(np.isfinite(ours))


def test_factored_pathgen_long_horizon_matches_dense(rng):
    # The reference's max horizon shape class (m2 = 2048, N2 = 16) at a
    # reduced step count for CPU-interpreter speed: n_steps = 1100 ->
    # s_pad 1152 (9 tiles), m2 2048.
    n_steps, chunk = 1100, 32
    gen, s_pad = pathgen_pallas_factored.make_factored_pathgen(
        **KW, n_steps=n_steps, dt=1 / 252, chunk_paths=chunk,
        block_paths=16, interpret=True, noise_input=True)
    assert s_pad == 1152
    noise = rng.normal(size=(3, chunk, 2048)).astype(np.float32)
    ours = np.asarray(gen(jnp.asarray(noise)))
    ref = xla_paths_from_noise(_logical_noise(noise, n_steps), n_steps)
    np.testing.assert_allclose(ours, ref, rtol=5e-4)


def test_factored_matches_slab_tiled_on_same_logical_noise(rng):
    # The factored kernel computes the SAME linear map as the dense slab
    # kernel (bit-compatible up to accumulation order): same logical
    # noise through both -> matching paths.
    n_steps, chunk = 200, 64
    noise_t = rng.normal(size=(3, chunk, 256)).astype(np.float32)
    noise_l = _logical_noise(noise_t, n_steps)

    fact, s_pad = pathgen_pallas_factored.make_factored_pathgen(
        **KW, n_steps=n_steps, dt=1 / 252, chunk_paths=chunk,
        block_paths=32, interpret=True, noise_input=True)
    slab, s_pad2 = pathgen_pallas_tiled.make_tiled_pathgen(
        **KW, n_steps=n_steps, dt=1 / 252, chunk_paths=chunk,
        block_paths=32, interpret=True, noise_input=True)
    assert s_pad == s_pad2 == 256
    a = np.asarray(fact(jnp.asarray(noise_t)))
    b = np.asarray(slab(jnp.asarray(noise_l[:, :, :s_pad])))
    np.testing.assert_allclose(a, b, rtol=2e-4)


@pytest.mark.slow
def test_factored_priced_kernel_matches_xla_policy(rng):
    """Factored fused (paths + LSM policy) == XLA generator +
    lsm_policy_value on identical injected noise, across a multi-tile
    horizon with early exercises."""
    from montecarlooptionspricer_tpu.models.lsm import lsm_fit

    s0, xi, h, eta, rho, r = 100.0, 0.04, 0.2, 1.0, -0.4, 0.04
    n_steps, chunk, dt = 200, 128, 1 / 252.0
    strike, maturity, is_call = 97.0, 200 / 252.0, False

    pilot = engine.make_chunk_pathgen(s0, xi, h, eta, rho, r, n_steps, dt,
                                      1 << 11)(jax.random.key(0))
    _, fits = lsm_fit(pilot, r, strike, maturity, dt, is_call, 2)

    gen, s_pad = pathgen_pallas_factored.make_factored_pathgen(
        s0, xi, h, eta, rho, r, n_steps, dt, chunk, block_paths=64,
        interpret=True, noise_input=True)
    noise = jnp.asarray(rng.standard_normal((3, chunk, 256)), jnp.float32)
    paths = gen(noise)
    want, _ = engine.lsm_policy_value(paths, fits, r, strike, maturity, dt,
                                      is_call)

    priced, s_pad2 = pathgen_pallas_factored.make_factored_priced_chunk(
        s0, xi, h, eta, rho, r, strike, maturity, dt, n_steps, chunk,
        block_paths=64, is_call=is_call, interpret=True, noise_input=True)
    assert s_pad2 == s_pad
    rows = pathgen_pallas.policy_rows(fits, r, strike, maturity, dt,
                                      n_steps, is_call)
    got = priced(noise, rows)
    ex0, _ = pathgen_pallas.time0_value(fits, s0, strike, is_call)
    assert not bool(ex0)
    np.testing.assert_allclose(float(got), float(want), rtol=2e-4)


def test_factored_priced_kernel_cv_output(rng):
    """with_cv=True: lane 1 equals the martingale control e^{-rT} sum(S_T)
    from the same paths, lane 0 unchanged."""
    from montecarlooptionspricer_tpu.models.lsm import lsm_fit

    s0, xi, h, eta, rho, r = 100.0, 0.04, 0.2, 1.0, -0.4, 0.04
    n_steps, chunk, dt = 200, 64, 1 / 252.0
    strike, maturity, is_call = 97.0, 200 / 252.0, False

    pilot = engine.make_chunk_pathgen(s0, xi, h, eta, rho, r, n_steps, dt,
                                      1 << 11)(jax.random.key(0))
    _, fits = lsm_fit(pilot, r, strike, maturity, dt, is_call, 2)
    rows = pathgen_pallas.policy_rows(fits, r, strike, maturity, dt,
                                      n_steps, is_call)

    gen, s_pad = pathgen_pallas_factored.make_factored_pathgen(
        s0, xi, h, eta, rho, r, n_steps, dt, chunk, block_paths=32,
        interpret=True, noise_input=True)
    noise = jnp.asarray(rng.standard_normal((3, chunk, 256)), jnp.float32)
    paths = gen(noise)
    want_cv = float(jnp.sum(engine.martingale_control(
        paths[:, :n_steps + 1], r, dt)))

    kw = dict(strike=strike, maturity=maturity, dt=dt, n_steps=n_steps,
              chunk_paths=chunk, block_paths=32, is_call=is_call,
              interpret=True, noise_input=True)
    plain, _ = pathgen_pallas_factored.make_factored_priced_chunk(
        s0, xi, h, eta, rho, r, **kw)
    cv, _ = pathgen_pallas_factored.make_factored_priced_chunk(
        s0, xi, h, eta, rho, r, **kw, with_cv=True)
    got_plain = float(plain(noise, rows))
    got_a, got_c = cv(noise, rows)
    np.testing.assert_allclose(float(got_a), got_plain, rtol=1e-6)
    np.testing.assert_allclose(float(got_c), want_cv, rtol=2e-5)


def test_factored_rejects_bad_shapes():
    with pytest.raises(ValueError):
        pathgen_pallas_factored.make_factored_pathgen(
            **KW, n_steps=40_000, dt=1 / 252, chunk_paths=256,
            block_paths=256)
    with pytest.raises(ValueError):
        pathgen_pallas_factored.make_factored_pathgen(
            **KW, n_steps=200, dt=1 / 252, chunk_paths=100,
            block_paths=64)

def test_factored_priced_log_boundary_matches_comparator(rng):
    """Factored-DFT fused with policy_form="boundary" == the XLA
    boundary-form comparator on identical injected noise (the factored
    kernel's x reaches _euler_tile pre-halved through the 0.5-scaled
    spectral diagonal — see _consts)."""
    from montecarlooptionspricer_tpu.models import pathgen_pallas
    from montecarlooptionspricer_tpu.models.lsm import lsm_fit

    s0, xi, h, eta, rho, r = 100.0, 0.04, 0.2, 1.0, -0.4, 0.04
    n_steps, chunk, dt = 200, 128, 1 / 252.0
    strike, maturity, is_call = 97.0, 200 / 252.0, False

    pilot = engine.make_chunk_pathgen(s0, xi, h, eta, rho, r, n_steps, dt,
                                      1 << 11)(jax.random.key(0))
    _, fits = lsm_fit(pilot, r, strike, maturity, dt, is_call, 2)

    gen, m2 = pathgen_pallas_factored.make_factored_pathgen(
        s0, xi, h, eta, rho, r, n_steps, dt, chunk, block_paths=64,
        interpret=True, noise_input=True)
    noise = jnp.asarray(1.5 * rng.standard_normal((3, chunk, m2)),
                        jnp.float32)
    paths = gen(noise)

    tab = pathgen_pallas.boundary_rows(fits, r, strike, maturity, dt,
                                       n_steps, is_call)
    want = pathgen_pallas.boundary_policy_value(paths, tab, n_steps,
                                                is_call)

    priced, _ = pathgen_pallas_factored.make_factored_priced_chunk(
        s0, xi, h, eta, rho, r, strike, maturity, dt, n_steps, chunk,
        block_paths=64, is_call=is_call, interpret=True, noise_input=True,
        policy_form="boundary")
    got = priced(noise, pathgen_pallas.log_boundary_rows(tab))
    np.testing.assert_allclose(float(got), float(want), rtol=5e-4)


def test_factored_pathgen_antithetic_matches_pair(rng):
    """r04: factored whole-path generator antithetic=True on injected
    noise (block/2 rows per plane) == plain factored rows on +noise
    stacked on -noise per block: BOTH DFT stages are linear, so one
    stage-1 fill and one stage-2 combination serve the pair, while each
    member's Euler arithmetic is the plain body's."""
    n_steps, chunk = 200, 128
    half_block, block = 32, 64
    anti, s_pad = pathgen_pallas_factored.make_factored_pathgen(
        **KW, n_steps=n_steps, dt=1 / 252, chunk_paths=chunk,
        block_paths=block, interpret=True, noise_input=True,
        antithetic=True)
    plain, _ = pathgen_pallas_factored.make_factored_pathgen(
        **KW, n_steps=n_steps, dt=1 / 252, chunk_paths=chunk // 2,
        block_paths=half_block, interpret=True, noise_input=True)

    m2 = 256
    noise = jnp.asarray(rng.normal(size=(3, chunk // 2, m2)), jnp.float32)
    got = np.asarray(anti(noise))
    p_plus = np.asarray(plain(noise))
    p_minus = np.asarray(plain(-noise))
    want = np.concatenate([p_plus[:32], p_minus[:32],
                           p_plus[32:], p_minus[32:]], axis=0)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_factored_priced_antithetic_matches_pair(rng):
    """r04: factored priced kernel antithetic=True equals the plain
    factored kernel on +noise plus on -noise (value and CV lanes) — the
    long-horizon analogue of the single-tile and slab pair tests,
    closing the last priced-kernel pairing gap (VERDICT r03 item 3)."""
    from montecarlooptionspricer_tpu.models.lsm import lsm_fit

    s0, xi, h, eta, rho, r = KW["s0"], KW["xi"], KW["h"], KW["eta"], \
        KW["rho"], KW["r"]
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
              policy_form="boundary", with_cv=True)
    anti, s_pad = pathgen_pallas_factored.make_factored_priced_chunk(
        s0, xi, h, eta, rho, r, strike, maturity, dt, n_steps, chunk,
        block_paths=64, antithetic=True, **kw)
    plain, _ = pathgen_pallas_factored.make_factored_priced_chunk(
        s0, xi, h, eta, rho, r, strike, maturity, dt, n_steps, half,
        block_paths=32, **kw)

    m2 = 256
    noise = jnp.asarray(rng.normal(size=(3, half, m2)), jnp.float32)
    got_v, got_c = anti(noise, rows)
    vp, cp = plain(noise, rows)
    vm, cm = plain(-noise, rows)
    np.testing.assert_allclose(float(got_v), float(vp) + float(vm),
                               rtol=1e-5)
    np.testing.assert_allclose(float(got_c), float(cp) + float(cm),
                               rtol=1e-5)


def test_factored_antithetic_rejects_quadratic():
    with pytest.raises(ValueError, match="antithetic"):
        pathgen_pallas_factored.make_factored_priced_chunk(
            100.0, 0.04, 0.2, 1.0, -0.4, 0.04, 97.0, 200 / 252.0,
            1 / 252.0, 200, 128, block_paths=64, antithetic=True,
            policy_form="quadratic")
