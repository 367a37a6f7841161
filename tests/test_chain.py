"""Strike-chain pricer: fused K-policy kernel correctness (noise-injected,
CPU interpreter) and mesh sharding of chain / control-variate / Greeks
(virtual 8-device CPU mesh)."""

import numpy as np
import jax
import pytest
import jax.numpy as jnp

from montecarlooptionspricer_tpu.models import engine, pathgen_pallas
from montecarlooptionspricer_tpu.models.lsm import lsm_fit
from montecarlooptionspricer_tpu.parallel import make_mesh

MKT = dict(s0=100.0, xi=0.04, h=0.2, eta=1.0, rho=-0.4, r=0.04)


@pytest.mark.slow
def test_chain_kernel_matches_vmapped_policy(rng):
    """Fused K-policy chain kernel == XLA generator + per-strike
    lsm_policy_value on identical injected noise."""
    n_steps, chunk, dt = 48, 256, 1 / 252.0
    strikes = [94.0, 100.0, 106.0]
    maturity, is_call = 48 / 252.0, False

    pilot = engine.make_chunk_pathgen(**MKT, n_steps=n_steps, dt=dt,
                                      chunk_paths=1 << 11)(jax.random.key(0))

    def one_fit(strike):
        _, fits = lsm_fit(pilot, MKT["r"], strike, maturity, dt, is_call, 2)
        return fits

    fits = jax.vmap(one_fit)(jnp.asarray(strikes))

    gen, s_pad = pathgen_pallas.make_pallas_pathgen_from_noise(
        **MKT, n_steps=n_steps, dt=dt, chunk_paths=chunk, block_paths=64,
        interpret=True)
    noise = jnp.asarray(rng.standard_normal((3, chunk, s_pad)), jnp.float32)
    paths = gen(noise)

    want = []
    for k, strike in enumerate(strikes):
        fit_k = jax.tree.map(lambda a: a[k], fits)
        s, _ = engine.lsm_policy_value(paths, fit_k, MKT["r"], strike,
                                       maturity, dt, is_call)
        want.append(float(s))

    chain, s_pad2 = pathgen_pallas.make_pallas_priced_chain(
        **MKT, strikes=strikes, maturity=maturity, dt=dt, n_steps=n_steps,
        chunk_paths=chunk, block_paths=64, is_call=is_call, interpret=True,
        noise_input=True)
    assert s_pad2 == s_pad
    tables = jax.vmap(
        lambda fit, strike: pathgen_pallas.policy_rows(
            fit, MKT["r"], strike, maturity, dt, n_steps, is_call)
    )(fits, jnp.asarray(strikes))
    got = np.asarray(chain(noise, tables))
    np.testing.assert_allclose(got, np.asarray(want), rtol=2e-4)

needs_mesh = pytest.mark.skipif(
    jax.device_count() < 8,
    reason="needs the 8-device virtual CPU mesh (hardware runs see 1 chip)")


@needs_mesh
@pytest.mark.slow
def test_chain_pricer_sharded_matches_single_device():
    """Mesh-sharded chain (XLA path) within MC error of the single-device
    chain; shapes/finiteness exact."""
    strikes = [95.0, 100.0, 105.0]
    cfg = engine.StreamConfig(n_paths=1 << 14, n_steps=24,
                              chunk_paths=1 << 10, pilot_paths=1 << 9)
    single = engine.StreamingChainPricer(**MKT, strikes=strikes,
                                         maturity=24 / 252.0, is_call=False,
                                         config=cfg)
    p1 = single.price(jax.random.key(3))

    mesh = make_mesh(8)
    cfg8 = engine.StreamConfig(n_paths=1 << 14, n_steps=24,
                               chunk_paths=1 << 7, pilot_paths=1 << 6)
    sharded = engine.StreamingChainPricer(**MKT, strikes=strikes,
                                          maturity=24 / 252.0, is_call=False,
                                          config=cfg8, mesh=mesh)
    p8 = sharded.price(jax.random.key(3))
    assert p8.shape == (3,)
    assert np.all(np.diff(p8) > 0)  # put prices increase with strike
    np.testing.assert_allclose(p8, p1, rtol=0.15, atol=0.1)


@needs_mesh
@pytest.mark.slow
def test_control_variate_sharded_matches_single_device():
    kwargs = dict(**MKT, strike=102.0, maturity=24 / 252.0, is_call=False)
    cfg = engine.StreamConfig(n_paths=1 << 14, n_steps=24,
                              chunk_paths=1 << 10, pilot_paths=1 << 10,
                              control_variate=True)
    p1 = engine.StreamingPricer(**kwargs, config=cfg).price(jax.random.key(5))

    mesh = make_mesh(8)
    cfg8 = engine.StreamConfig(n_paths=1 << 14, n_steps=24,
                               chunk_paths=1 << 7, pilot_paths=1 << 7,
                               control_variate=True)
    p8 = engine.StreamingPricer(**kwargs, config=cfg8,
                                mesh=mesh).price(jax.random.key(5))
    assert np.isfinite(p8)
    np.testing.assert_allclose(p8, p1, rtol=0.1, atol=0.06)


@needs_mesh
@pytest.mark.slow
def test_streaming_greeks_sharded_matches_single_device():
    kwargs = dict(**MKT, strike=102.0, maturity=24 / 252.0, is_call=False)
    cfg = engine.StreamConfig(n_paths=1 << 14, n_steps=24,
                              chunk_paths=1 << 10, pilot_paths=1 << 10)
    g1 = engine.StreamingPricer(**kwargs, config=cfg).price_and_greeks(
        jax.random.key(6))

    mesh = make_mesh(8)
    cfg8 = engine.StreamConfig(n_paths=1 << 14, n_steps=24,
                               chunk_paths=1 << 7, pilot_paths=1 << 7)
    g8 = engine.StreamingPricer(**kwargs, config=cfg8,
                                mesh=mesh).price_and_greeks(jax.random.key(6))
    assert all(np.isfinite(v) for v in g8)
    # put delta negative on both, price/delta within MC error
    assert g1[1] < 0 and g8[1] < 0
    np.testing.assert_allclose(g8[0], g1[0], rtol=0.1, atol=0.06)
    np.testing.assert_allclose(g8[1], g1[1], rtol=0.25, atol=0.1)


@pytest.mark.slow
def test_chain_reprices_fresh_strikes_without_rebuild():
    """price(key, strikes=...) on a fresh strip must equal a pricer built
    with that strip (strikes are traced inputs end to end — the serving
    fast path), and reject length mismatches."""
    import pytest

    cfg = engine.StreamConfig(n_paths=1 << 13, n_steps=24,
                              chunk_paths=1 << 12, pilot_paths=1 << 11)
    base = engine.StreamingChainPricer(
        **MKT, strikes=[95.0, 100.0, 105.0], maturity=24 / 252.0,
        is_call=False, config=cfg)
    fresh = [90.0, 98.0, 110.0]
    got = base.price(jax.random.key(2), strikes=fresh)
    want = engine.StreamingChainPricer(
        **MKT, strikes=fresh, maturity=24 / 252.0, is_call=False,
        config=cfg).price(jax.random.key(2))
    np.testing.assert_allclose(got, want, rtol=1e-6)
    assert got[0] < got[1] < got[2]  # put prices rise in strike
    with pytest.raises(ValueError):
        base.price(jax.random.key(2), strikes=[95.0, 100.0])


@pytest.mark.slow
def test_bucketed_chain_matches_exact_shape():
    """A chain pricer compiled at a step BUCKET (bucketed=True) pricing a
    shorter contract via traced (n_steps_live, maturity) must agree with
    the exact-shape pricer within MC error, be deterministic, and reject
    out-of-bucket step counts."""
    import pytest

    cfg24 = engine.StreamConfig(n_paths=1 << 14, n_steps=24,
                                chunk_paths=1 << 12, pilot_paths=1 << 12)
    exact = engine.StreamingChainPricer(
        **MKT, strikes=[95.0, 100.0, 105.0], maturity=24 / 252,
        is_call=False, config=cfg24)
    pe = exact.price(jax.random.key(3))

    cfg32 = engine.StreamConfig(n_paths=1 << 14, n_steps=32,
                                chunk_paths=1 << 12, pilot_paths=1 << 12)
    buck = engine.StreamingChainPricer(
        **MKT, strikes=[95.0, 100.0, 105.0], maturity=32 / 252,
        is_call=False, config=cfg32, bucketed=True)
    pb = buck.price(jax.random.key(3), n_steps_live=24, maturity=24 / 252)
    np.testing.assert_allclose(pb, pe, atol=0.12)   # different draws
    assert np.all(pb == buck.price(jax.random.key(3), n_steps_live=24,
                                   maturity=24 / 252))
    # shorter-dated put strip is cheaper at every strike (same draws)
    pb16 = buck.price(jax.random.key(3), n_steps_live=16,
                      maturity=16 / 252)
    assert np.all(pb16 <= pb + 0.05)
    with pytest.raises(ValueError):
        buck.price(jax.random.key(3), n_steps_live=33)
    with pytest.raises(ValueError):
        exact.price(jax.random.key(3), n_steps_live=16)


@needs_mesh
@pytest.mark.slow
def test_bucketed_chain_on_mesh_matches_single_device():
    """Bucketed chain under an 8-device mesh: the (n_live, maturity)
    traced scalars must thread through the shard_map wrappers (the
    n_fit_in=4 / n_stream_in=7 arity path) and agree with the
    single-device bucketed run statistically."""
    cfg = engine.StreamConfig(n_paths=1 << 14, n_steps=32,
                              chunk_paths=1 << 12, pilot_paths=1 << 12)
    single = engine.StreamingChainPricer(
        **MKT, strikes=[95.0, 100.0, 105.0], maturity=32 / 252,
        is_call=False, config=cfg, bucketed=True)
    p1 = single.price(jax.random.key(4), n_steps_live=24, maturity=24 / 252)

    mesh = make_mesh(8)
    cfg8 = engine.StreamConfig(n_paths=1 << 14, n_steps=32,
                               chunk_paths=1 << 9, pilot_paths=1 << 9)
    sharded = engine.StreamingChainPricer(
        **MKT, strikes=[95.0, 100.0, 105.0], maturity=32 / 252,
        is_call=False, config=cfg8, mesh=mesh, bucketed=True)
    p8 = sharded.price(jax.random.key(4), n_steps_live=24,
                       maturity=24 / 252)
    assert np.all(np.isfinite(p8))
    np.testing.assert_allclose(p8, p1, rtol=0.1, atol=0.12)


@pytest.mark.slow
def test_chain_stderr_calibrated():
    """with_stderr=True: the chunk-total-based stderr must be on the order
    of (and not exceed by much) the empirical spread of prices across
    independent keys at a FIXED policy scale; since the empirical spread
    also includes pilot-policy variation, stderr <= ~empirical + noise."""
    cfg = engine.StreamConfig(n_paths=1 << 15, n_steps=24,
                              chunk_paths=1 << 11, pilot_paths=1 << 12)
    ch = engine.StreamingChainPricer(
        **MKT, strikes=[95.0, 100.0, 105.0], maturity=24 / 252,
        is_call=False, config=cfg)
    p, se = ch.price(jax.random.key(0), with_stderr=True)
    assert np.all(se > 0) and np.all(np.isfinite(se))
    reps = np.stack([ch.price(jax.random.key(i)) for i in range(10)])
    emp = reps.std(axis=0, ddof=1)
    # same order of magnitude; chunk-based se excludes policy variation
    assert np.all(se < 3 * emp + 1e-4) and np.all(se > emp / 6), (se, emp)
    # back-compat: default return is just the price vector
    p_only = ch.price(jax.random.key(0))
    np.testing.assert_allclose(p_only, p)


@pytest.mark.slow
def test_chain_stderr_single_chunk_is_nan():
    """A single-chunk run has no variance information: with_stderr must
    report NaN, never a false claim of zero uncertainty."""
    cfg = engine.StreamConfig(n_paths=1 << 12, n_steps=16,
                              chunk_paths=1 << 12, pilot_paths=1 << 11)
    ch = engine.StreamingChainPricer(
        **MKT, strikes=[100.0], maturity=16 / 252, is_call=False,
        config=cfg)
    p, se = ch.price(jax.random.key(0), with_stderr=True)
    assert np.isfinite(p[0]) and np.isnan(se[0])


def test_traced_h_chain_reprices_fresh_hurst():
    """traced_h=True: the Hurst exponent is a per-call traced input — a
    changed H reprices against the SAME compiled programs and matches a
    pricer BUILT at that H (spectral matrices build in-graph, f32, vs the
    baked host-f64 path: tolerance covers the precision delta)."""
    cfg = engine.StreamConfig(n_paths=1 << 13, n_steps=32,
                              chunk_paths=1 << 11, pilot_paths=1 << 11)
    kw = dict(strikes=[95.0, 100.0, 105.0], maturity=32 / 252.0,
              is_call=False, config=cfg, bucketed=True)
    tr = engine.StreamingChainPricer(100.0, 0.04, 0.2, 1.0, -0.4, 0.04,
                                     **kw, traced_h=True)
    key = jax.random.key(3)
    call = dict(n_steps_live=24, maturity=24 / 252.0)
    p_a = tr.price(key, **call, hurst=0.2)
    p_b = tr.price(key, **call, hurst=0.35)
    assert not np.allclose(p_a, p_b)      # H genuinely moves the price
    # matches a pricer constructed at the new H (same keys, baked f64
    # matrices vs the in-graph f32 build)
    st = engine.StreamingChainPricer(100.0, 0.04, 0.35, 1.0, -0.4, 0.04,
                                     **kw)
    p_ref = st.price(key, **call)
    np.testing.assert_allclose(p_b, p_ref, rtol=5e-3, atol=0.02)
    # default hurst = the construction-time value
    np.testing.assert_allclose(tr.price(key, **call), p_a)
    # hurst on a non-traced pricer is an error
    with pytest.raises(ValueError):
        st.price(key, **call, hurst=0.3)
