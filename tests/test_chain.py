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
        noise_input=True, policy_form="quadratic")
    assert s_pad2 == s_pad
    tables = jax.vmap(
        lambda fit, strike: pathgen_pallas.policy_rows(
            fit, MKT["r"], strike, maturity, dt, n_steps, is_call)
    )(fits, jnp.asarray(strikes))
    got = np.asarray(chain(noise, tables))
    np.testing.assert_allclose(got, np.asarray(want), rtol=2e-4)


@pytest.mark.slow
@pytest.mark.parametrize("is_call", [False, True])
def test_chain_boundary_kernel_matches_table_eval(rng, is_call):
    """Boundary-form chain kernel == the XLA boundary_policy_value
    comparator on identical injected noise (same f32 compares, same
    dk - disc*S value arithmetic => identical per-path decisions; only
    summation order differs), for puts AND calls."""
    n_steps, chunk, dt = 48, 256, 1 / 252.0
    strikes = [94.0, 100.0, 106.0]
    maturity = 48 / 252.0

    pilot = engine.make_chunk_pathgen(**MKT, n_steps=n_steps, dt=dt,
                                      chunk_paths=1 << 11)(jax.random.key(0))

    def one_fit(strike):
        _, fits = lsm_fit(pilot, MKT["r"], strike, maturity, dt, is_call, 2)
        return fits

    fits = jax.vmap(one_fit)(jnp.asarray(strikes))
    tables = jax.vmap(
        lambda fit, strike: pathgen_pallas.boundary_rows(
            fit, MKT["r"], strike, maturity, dt, n_steps, is_call)
    )(fits, jnp.asarray(strikes))

    gen, s_pad = pathgen_pallas.make_pallas_pathgen_from_noise(
        **MKT, n_steps=n_steps, dt=dt, chunk_paths=chunk, block_paths=64,
        interpret=True)
    noise = jnp.asarray(rng.standard_normal((3, chunk, s_pad)), jnp.float32)
    paths = gen(noise)

    want = [float(pathgen_pallas.boundary_policy_value(
        paths, tables[k], n_steps, is_call)) for k in range(len(strikes))]

    chain, _ = pathgen_pallas.make_pallas_priced_chain(
        **MKT, strikes=strikes, maturity=maturity, dt=dt, n_steps=n_steps,
        chunk_paths=chunk, block_paths=64, is_call=is_call, interpret=True,
        noise_input=True, policy_form="boundary")
    got = np.asarray(chain(noise, tables))
    np.testing.assert_allclose(got, np.asarray(want), rtol=2e-4)


@pytest.mark.slow
@pytest.mark.parametrize("fgn_form,antithetic",
                         [("spectral", False), ("chol", False),
                          ("chol", True)])
def test_chain_grid_sweep_matches_regen(rng, fgn_form, antithetic):
    """Grid-over-groups chain kernel (one pallas_call, path block in VMEM
    scratch, grid = (blocks, groups)) == the regen design (one pass per
    group, paths regenerated) BITWISE on identical injected noise: the
    per-block arithmetic is the same code (_chain_paths + _sweep_values
    per group) in the same reduction order — only WHERE the path plane
    lives differs.  25 strikes = 3 groups of 10 with tail padding, so
    the group streaming and pad-lane dropping are both exercised."""
    n_steps, chunk, dt = 48, 256, 1 / 252.0
    strikes = [float(v) for v in np.linspace(85.0, 115.0, 25)]
    maturity, is_call = 48 / 252.0, False

    pilot = engine.make_chunk_pathgen(**MKT, n_steps=n_steps, dt=dt,
                                      chunk_paths=1 << 11)(jax.random.key(0))

    def one_fit(strike):
        _, fits = lsm_fit(pilot, MKT["r"], strike, maturity, dt, is_call, 2)
        return fits

    fits = jax.vmap(one_fit)(jnp.asarray(strikes))
    tables = jax.vmap(
        lambda fit, strike: pathgen_pallas.boundary_rows(
            fit, MKT["r"], strike, maturity, dt, n_steps, is_call)
    )(fits, jnp.asarray(strikes))

    kw = dict(**MKT, strikes=strikes, maturity=maturity, dt=dt,
              n_steps=n_steps, chunk_paths=chunk, block_paths=64,
              is_call=is_call, interpret=True, noise_input=True,
              policy_form="boundary", fgn_form=fgn_form,
              antithetic=antithetic)
    grid_chain, s_pad = pathgen_pallas.make_pallas_priced_chain(
        **kw, sweep_impl="grid")
    regen_chain, _ = pathgen_pallas.make_pallas_priced_chain(
        **kw, sweep_impl="regen")
    n_pl = pathgen_pallas.n_planes(fgn_form)
    rows_n = chunk // 2 if antithetic else chunk
    noise = jnp.asarray(rng.standard_normal((n_pl, rows_n, s_pad)),
                        jnp.float32)
    got = np.asarray(grid_chain(noise, tables))
    want = np.asarray(regen_chain(noise, tables))
    assert got.shape == (25,)
    np.testing.assert_array_equal(got, want)


def test_chain_grid_engine_matches_regen_on_chip():
    """StreamingChainPricer with chain_sweep_impl='grid' == 'regen' on
    the real TPU, bitwise: identical seeding, identical per-block
    arithmetic, identical host accumulation order — only where the path
    plane lives differs.  (CPU runs skip: the fused chain kernel
    compiles on-chip only.)"""
    import jax as _jax

    if _jax.devices()[0].platform != "tpu":
        pytest.skip("requires a real TPU (fused kernels compile on-chip)")
    strikes = [float(v) for v in np.linspace(85.0, 115.0, 25)]
    base = dict(n_paths=1 << 16, n_steps=48, chunk_paths=1 << 14,
                pilot_paths=1 << 12, pathgen_impl="pallas",
                pallas_block_paths=256)
    prices = {}
    for impl in ("grid", "regen"):
        p = engine.StreamingChainPricer(
            **MKT, strikes=strikes, maturity=48 / 252.0, is_call=False,
            config=engine.StreamConfig(**base, chain_sweep_impl=impl))
        prices[impl] = np.asarray(p.price(jax.random.key(3)))
    np.testing.assert_array_equal(prices["grid"], prices["regen"])
    assert np.all(np.isfinite(prices["grid"]))


@pytest.mark.parametrize("is_call", [False, True])
def test_boundary_rows_decision_matches_quadratic(is_call):
    """The precomputed exercise boundary reproduces the fitted quadratic's
    per-cell decision on a dense S grid: exact agreement away from the
    root (|payoff - continuation| beyond f32 wobble), and misclassified
    cells confined to that near-boundary band where the two policies are
    value-equivalent to first order."""
    n_steps, dt = 32, 1 / 252.0
    maturity, strike = 32 / 252.0, 100.0
    # Pilot size only shapes WHICH quadratic gets fitted — the decision-
    # match property must hold for any fit — so keep it small and fast.
    pilot = engine.make_chunk_pathgen(**MKT, n_steps=n_steps, dt=dt,
                                      chunk_paths=1 << 11)(jax.random.key(1))
    _, fits = lsm_fit(pilot, MKT["r"], strike, maturity, dt, is_call, 2)

    quad = np.asarray(pathgen_pallas.policy_rows(
        fits, MKT["r"], strike, maturity, dt, n_steps, is_call),
        np.float32)
    bnd = np.asarray(pathgen_pallas.boundary_rows(
        fits, MKT["r"], strike, maturity, dt, n_steps, is_call),
        np.float32)

    s = np.linspace(40.0, 180.0, 4001, dtype=np.float32)[:, None]
    c0, c1, c2, mu, sd, eps = (quad[i, :n_steps] for i in range(6))
    p = np.maximum(s - strike, 0) if is_call else np.maximum(strike - s, 0)
    z = (s - mu) / sd
    cont = (c2 * z + c1) * z + c0
    ex_quad = (p > eps) & (p >= cont)
    lo, hi = bnd[0, :n_steps], bnd[1, :n_steps]
    ex_bnd = (s >= lo) & (s <= hi)

    diff = ex_quad != ex_bnd
    # The terminal column is allowed to differ exactly on OTM cells:
    # policy_rows exercises ALWAYS there (eps = -1) with value
    # max(payoff, 0) = 0, boundary_rows exercises iff ITM — the same
    # value, and no later step exists to steal priority from.
    terminal_otm = np.zeros_like(diff)
    terminal_otm[:, n_steps - 1] = p[:, 0] <= 0
    # Any other disagreement sits in the near-root band where payoff ~=
    # cont (f32 root rounding) — the interval form is EXACT for the
    # canonical convex-continuation fit away from the roots.
    near = np.abs(p - cont) <= 1e-3 * (1.0 + np.abs(cont))
    assert not np.any(diff & ~near & ~terminal_otm), (
        f"{np.sum(diff & ~near & ~terminal_otm)} decisions flipped away "
        "from the boundary")
    # and the genuine flips are vanishingly rare on a dense grid
    assert (diff & ~terminal_otm).mean() < 1e-3


def test_boundary_rows_small_sd_no_phantom_interval():
    """A small fit sd must not corrupt the exercise interval: raw-S
    quadratic coefficients scale like (mu/sd)^2 and their f32
    discriminant cancels catastrophically — a phantom exercise band
    near mu where the fitted policy says continue by ~100 value points.
    The z-basis solve keeps coefficients O(fit).  Here continuation
    (>= 3 everywhere) always exceeds the near-the-money payoff, so
    every non-terminal column's interval must be EMPTY, and decisions
    must match the quadratic evaluator on a dense grid around mu."""
    from montecarlooptionspricer_tpu.ops import PolyFit

    n_steps, dt = 4, 1 / 252.0
    maturity, strike = 4 / 252.0, 100.0
    coeffs = np.zeros((n_steps, 3), np.float32)
    coeffs[:, 0] = 3.0
    coeffs[:, 2] = 2.85
    fits = PolyFit(coeffs=jnp.asarray(coeffs),
                   mu=jnp.full((n_steps,), 99.35, jnp.float32),
                   sd=jnp.full((n_steps,), 0.003, jnp.float32))
    bnd = np.asarray(pathgen_pallas.boundary_rows(
        fits, MKT["r"], strike, maturity, dt, n_steps, False), np.float32)
    lo, hi = bnd[0, :n_steps], bnd[1, :n_steps]
    assert np.all(lo[:-1] > hi[:-1]), (lo, hi)  # empty before terminal

    quad = np.asarray(pathgen_pallas.policy_rows(
        fits, MKT["r"], strike, maturity, dt, n_steps, False), np.float32)
    s = np.linspace(94.0, 104.0, 2001, dtype=np.float32)[:, None]
    c0, c1, c2, mu, sd, eps = (quad[i, :n_steps] for i in range(6))
    p = np.maximum(strike - s, 0)
    z = (s - mu) / sd
    cont = (c2 * z + c1) * z + c0
    ex_quad = (p > eps) & (p >= cont)
    ex_bnd = (s >= lo) & (s <= hi)
    terminal_otm = np.zeros_like(ex_quad)
    terminal_otm[:, n_steps - 1] = p[:, 0] <= 0
    assert not np.any((ex_quad != ex_bnd) & ~terminal_otm)


@pytest.mark.slow
def test_chain_boundary_kernel_large_strip_grouped_loop(rng):
    """Strips with n_k > CHAIN_GROUP run one fused pass per strike group,
    regenerating bitwise-identical paths from the shared seed/noise — must
    match the per-strike comparator exactly like the fused short-strip
    path, including the non-multiple-of-group tail (18 = 10 + 8)."""
    n_steps, chunk, dt = 32, 128, 1 / 252.0
    strikes = [float(v) for v in np.linspace(88.0, 112.0, 18)]
    maturity, is_call = 32 / 252.0, False

    pilot = engine.make_chunk_pathgen(**MKT, n_steps=n_steps, dt=dt,
                                      chunk_paths=1 << 10)(jax.random.key(0))

    def one_fit(strike):
        _, fits = lsm_fit(pilot, MKT["r"], strike, maturity, dt, is_call, 2)
        return fits

    fits = jax.vmap(one_fit)(jnp.asarray(strikes))
    tables = jax.vmap(
        lambda fit, strike: pathgen_pallas.boundary_rows(
            fit, MKT["r"], strike, maturity, dt, n_steps, is_call)
    )(fits, jnp.asarray(strikes))

    gen, s_pad = pathgen_pallas.make_pallas_pathgen_from_noise(
        **MKT, n_steps=n_steps, dt=dt, chunk_paths=chunk, block_paths=64,
        interpret=True)
    noise = jnp.asarray(rng.standard_normal((3, chunk, s_pad)), jnp.float32)
    paths = gen(noise)
    want = [float(pathgen_pallas.boundary_policy_value(
        paths, tables[k], n_steps, is_call)) for k in range(len(strikes))]

    chain, _ = pathgen_pallas.make_pallas_priced_chain(
        **MKT, strikes=strikes, maturity=maturity, dt=dt, n_steps=n_steps,
        chunk_paths=chunk, block_paths=64, is_call=is_call, interpret=True,
        noise_input=True, policy_form="boundary")
    got = np.asarray(chain(noise, tables))
    np.testing.assert_allclose(got, np.asarray(want), rtol=2e-4, atol=1e-3)


def test_boundary_rows_concave_fit_clips_to_deep_itm_component():
    """A concave-continuation fit (c2 < 0) can split the exercise set in
    two; boundary_rows keeps the deep-ITM component (documented clip).
    Build such a fit synthetically and check the interval against the
    quadratic decision: agreement on the kept component, the detached
    near-boundary component dropped."""
    from montecarlooptionspricer_tpu.ops import PolyFit

    n_steps, dt = 4, 1 / 252.0
    maturity, strike = 4 / 252.0, 100.0
    # every step: cont = -0.05 z^2 + 3, z = s - 100 -> payoff (100 - s)
    # >= cont solves u = 100 - s >= 2.6491 or u <= -22.649 (an OTM-side
    # branch the ITM cap removes); deep-ITM component survives as
    # s <= 97.3509.
    coeffs = np.zeros((n_steps, 3), np.float32)
    coeffs[:, 0] = 3.0
    coeffs[:, 2] = -0.05
    fits = PolyFit(coeffs=jnp.asarray(coeffs),
                   mu=jnp.full((n_steps,), 100.0, jnp.float32),
                   sd=jnp.ones((n_steps,), jnp.float32))
    bnd = np.asarray(pathgen_pallas.boundary_rows(
        fits, MKT["r"], strike, maturity, dt, n_steps, False), np.float32)
    lo, hi = bnd[0, 0], bnd[1, 0]
    assert lo < 40.0                      # unbounded below (deep ITM)
    assert abs(hi - 97.3509) < 0.01
    # and on sampled prices the decisions match the quadratic exactly
    s = np.linspace(50.0, 99.9, 997, dtype=np.float32)
    p = 100.0 - s
    cont = -0.05 * (s - 100.0) ** 2 + 3.0
    ex_quad = (p > 1e-14) & (p >= cont)
    ex_bnd = (s >= lo) & (s <= hi)
    np.testing.assert_array_equal(ex_bnd, ex_quad)


@pytest.mark.slow
def test_chain_boundary_price_matches_quadratic_form(rng):
    """Boundary- and quadratic-form chain kernels on the SAME injected
    noise price within a hair of each other: decisions differ only in the
    near-root band, where exercising or continuing is value-neutral to
    first order."""
    n_steps, chunk, dt = 48, 512, 1 / 252.0
    strikes = [94.0, 100.0, 106.0]
    maturity, is_call = 48 / 252.0, False

    pilot = engine.make_chunk_pathgen(**MKT, n_steps=n_steps, dt=dt,
                                      chunk_paths=1 << 11)(jax.random.key(0))

    def one_fit(strike):
        _, fits = lsm_fit(pilot, MKT["r"], strike, maturity, dt, is_call, 2)
        return fits

    fits = jax.vmap(one_fit)(jnp.asarray(strikes))
    strikes_j = jnp.asarray(strikes)
    s_pad = pathgen_pallas._round_up(n_steps, pathgen_pallas.LANE)
    noise = jnp.asarray(rng.standard_normal((3, chunk, s_pad)), jnp.float32)
    got = {}
    for form, row_fn in (("boundary", pathgen_pallas.boundary_rows),
                         ("quadratic", pathgen_pallas.policy_rows)):
        chain, _ = pathgen_pallas.make_pallas_priced_chain(
            **MKT, strikes=strikes, maturity=maturity, dt=dt,
            n_steps=n_steps, chunk_paths=chunk, block_paths=64,
            is_call=is_call, interpret=True, noise_input=True,
            policy_form=form)
        tables = jax.vmap(
            lambda fit, strike: row_fn(fit, MKT["r"], strike, maturity,
                                       dt, n_steps, is_call)
        )(fits, strikes_j)
        got[form] = np.asarray(chain(noise, tables))
    # per-path mean within 2 cents across the strip (same paths)
    np.testing.assert_allclose(got["boundary"] / chunk,
                               got["quadratic"] / chunk, atol=0.02)

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


@pytest.mark.slow  # integration-grade (13 s): bucketed traced-H chain
# repricing is also covered by the full suite and dryrun_multichip item 8;
# the traced-H MATH stays fast-tier via the vega_h finite-difference test.
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


def test_chain_antithetic_matches_pair(rng):
    """Chain antithetic=True on injected noise (chunk/2 rows per plane)
    equals the plain chain kernel run on +noise plus on -noise, per
    strike: the pair shares one fGN matmul (_chain_paths) but each
    member's path/policy arithmetic is the plain body's.  Chol form,
    boundary policy — the production chain configuration."""
    n_steps, chunk, dt = 48, 256, 1 / 252.0
    strikes = [94.0, 100.0, 106.0]
    maturity, is_call = 48 / 252.0, False
    half = chunk // 2

    pilot = engine.make_chunk_pathgen(**MKT, n_steps=n_steps, dt=dt,
                                      chunk_paths=1 << 11)(jax.random.key(0))

    def one_fit(strike):
        _, fits = lsm_fit(pilot, MKT["r"], strike, maturity, dt, is_call, 2)
        return fits

    fits = jax.vmap(one_fit)(jnp.asarray(strikes))
    tables = jax.vmap(
        lambda fit, strike: pathgen_pallas.boundary_rows(
            fit, MKT["r"], strike, maturity, dt, n_steps, is_call)
    )(fits, jnp.asarray(strikes))

    kw = dict(**MKT, strikes=strikes, maturity=maturity, dt=dt,
              n_steps=n_steps, is_call=is_call, interpret=True,
              noise_input=True, policy_form="boundary", fgn_form="chol")
    anti, s_pad = pathgen_pallas.make_pallas_priced_chain(
        chunk_paths=chunk, block_paths=64, antithetic=True, **kw)
    plain, _ = pathgen_pallas.make_pallas_priced_chain(
        chunk_paths=half, block_paths=32, **kw)

    noise = jnp.asarray(rng.standard_normal((2, half, s_pad)), jnp.float32)
    got = np.asarray(anti(noise, tables))
    want = np.asarray(plain(noise, tables)) + np.asarray(
        plain(-noise, tables))
    np.testing.assert_allclose(got, want, rtol=1e-5)
