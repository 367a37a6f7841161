"""Fused in-kernel pathwise Greeks (pathgen_pallas.make_pallas_greeks_chunk).

The kernel computes hand-rolled forward tangents of the log-boundary
policy value.  The CPU test validates ALL six outputs against an
INDEPENDENT oracle: a float64 NumPy reimplementation of the noise ->
value map (chol paths + S-space boundary-interval policy with the table
held fixed — the envelope convention), differentiated by central finite
differences.  Agreement is to f32 kernel noise; any sign/formula error
in a tangent would be orders of magnitude larger.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from montecarlooptionspricer_tpu.models import engine, pathgen_pallas
from montecarlooptionspricer_tpu.models.lsm import lsm_fit

MKT = dict(s0=100.0, xi=0.04, h=0.2, eta=1.0, rho=-0.4, r=0.04)
N_STEPS, CHUNK, DT = 48, 256, 1 / 252.0
STRIKE, MATURITY, IS_CALL = 97.0, 48 / 252.0, False


def _oracle_value(noise, lo, hi, s0, xi, r, eta, h):
    """f64 sum of discounted payoffs under the FIXED S-space interval
    table (envelope: the table does not move with the parameters)."""
    n = noise[0, :, :N_STEPS].astype(np.float64)
    w = noise[1, :, :N_STEPS].astype(np.float64)
    lt = engine._chol_np(N_STEPS, h, eta, DT).T      # upper, f64
    x = n @ lt
    td = np.arange(N_STEPS) * DT
    v = xi * np.exp(x - 0.5 * eta * eta * td ** (2.0 * h))
    inc = (r - 0.5 * v) * DT + np.sqrt(v) * w * np.sqrt(DT)
    ls = np.log(s0) + np.cumsum(inc, axis=1)
    s = np.exp(ls)
    exf = (s >= lo[:N_STEPS]) & (s <= hi[:N_STEPS])
    any_ex = exf.any(axis=1)
    stop = np.where(any_ex, exf.argmax(axis=1), 0)
    t_stop = (stop + 1) * DT
    s_stop = s[np.arange(s.shape[0]), stop]
    p = np.maximum(s_stop - STRIKE, 0.0) if IS_CALL else np.maximum(
        STRIKE - s_stop, 0.0)
    return float(np.sum(np.where(any_ex, np.exp(-r * t_stop) * p, 0.0)))


def test_fused_greeks_match_f64_fd_oracle(rng):
    pilot = engine.make_chunk_pathgen(**MKT, n_steps=N_STEPS, dt=DT,
                                      chunk_paths=1 << 11)(jax.random.key(0))
    _, fits = lsm_fit(pilot, MKT["r"], STRIKE, MATURITY, DT, IS_CALL, 2)
    tab = pathgen_pallas.boundary_rows(fits, MKT["r"], STRIKE, MATURITY,
                                       DT, N_STEPS, IS_CALL)
    lo = np.asarray(tab[0], np.float64)
    hi = np.asarray(tab[1], np.float64)

    greeks, s_pad = pathgen_pallas.make_pallas_greeks_chunk(
        **MKT, strike=STRIKE, maturity=MATURITY, dt=DT, n_steps=N_STEPS,
        chunk_paths=CHUNK, block_paths=64, is_call=IS_CALL,
        interpret=True, noise_input=True)
    noise = np.zeros((2, CHUNK, s_pad), np.float32)
    noise[:, :, :N_STEPS] = rng.standard_normal((2, CHUNK, N_STEPS))
    got = np.asarray(greeks(jnp.asarray(noise),
                            pathgen_pallas.log_boundary_rows(tab)))

    base = dict(s0=MKT["s0"], xi=MKT["xi"], r=MKT["r"], eta=MKT["eta"],
                h=MKT["h"])
    val = _oracle_value(noise, lo, hi, **base)
    eps = dict(s0=1e-3, xi=1e-6, r=1e-5, eta=1e-5, h=1e-5)

    def fd(name):
        up = dict(base); up[name] += eps[name]
        dn = dict(base); dn[name] -= eps[name]
        return (_oracle_value(noise, lo, hi, **up)
                - _oracle_value(noise, lo, hi, **dn)) / (2 * eps[name])

    want = np.array([val, fd("s0"), fd("xi"), fd("eta"), fd("r"),
                     fd("h")])
    # f32 kernel vs f64 oracle: path-level f32 noise accumulates through
    # the tangent cumsums; 0.5% relative (on the largest output scale)
    # still catches any sign/term error by 2+ orders of magnitude.
    scale = np.maximum(np.abs(want), 1e-3 * np.max(np.abs(want)))
    rel = np.abs(got - want) / scale
    assert np.all(rel < 5e-3), (got, want, rel)


def test_fused_greeks_engine_path_selected():
    """StreamingPricer exposes the fused Greeks machinery exactly on the
    eligible configuration, and falls back to the jvp stream elsewhere."""
    kwargs = dict(s0=100.0, xi=0.04, h=0.2, eta=1.0, rho=-0.4, r=0.04,
                  strike=102.0, maturity=32 / 252.0, is_call=False)
    base = dict(n_paths=1 << 12, n_steps=32, chunk_paths=1 << 10,
                pilot_paths=1 << 10)
    p = engine.StreamingPricer(
        **kwargs, config=engine.StreamConfig(**base,
                                             pathgen_impl="pallas"))
    assert p._fused_greek_stream is not None
    for bad in (dict(pathgen_impl="xla"),
                dict(pathgen_impl="pallas", policy_form="quadratic"),
                dict(pathgen_impl="pallas", fgn_form="spectral"),
                dict(pathgen_impl="pallas", qmc=True)):
        p = engine.StreamingPricer(
            **kwargs, config=engine.StreamConfig(**base, **bad))
        assert p._fused_greek_stream is None, bad


def test_fused_greeks_match_jvp_stream_on_chip():
    """The fused in-kernel Greeks agree with the XLA jvp stream within
    combined MC error on every output, evaluated under the SAME fitted
    policy (real TPU only).  Sharing the fits matters: price is
    envelope-protected against pilot-policy noise but its DERIVATIVES
    are not (a shifted exercise boundary moves t* by O(1) on an O(eps)
    band — first-order in the fit noise), so two pricers with
    independent pilots measurably disagree on rho while both are
    correct for their own policy (the CPU f64 FD oracle above pins the
    kernel's estimand exactly)."""
    if jax.devices()[0].platform != "tpu":
        pytest.skip("requires a real TPU for in-kernel PRNG")
    kwargs = dict(s0=100.0, xi=0.04, h=0.2, eta=1.0, rho=-0.4, r=0.04,
                  strike=102.0, maturity=48 / 252.0, is_call=False)
    n_paths, chunk = 1 << 16, 1 << 14
    base = dict(n_paths=n_paths, n_steps=48, chunk_paths=chunk,
                pilot_paths=1 << 13)
    n_chunks = n_paths // chunk
    fused = engine.StreamingPricer(
        **kwargs, config=engine.StreamConfig(**base,
                                             pathgen_impl="pallas"))
    assert fused._fused_greek_stream is not None
    xla = engine.StreamingPricer(
        **kwargs, config=engine.StreamConfig(**base))
    assert xla._fused_greek_stream is None

    k_pilot, k_stream = fused._keys(jax.random.key(3))
    fits = fused._fused_greek_fit(k_pilot)
    tf, qf = jax.device_get(
        fused._fused_greek_stream(k_stream, fits, 0, n_chunks))
    market = tuple(jnp.float32(v) for v in xla._market)
    kx = jax.random.split(jax.random.key(3))[1]
    tx, qx = jax.device_get(
        xla._greek_stream(kx, fits, 0, n_chunks, market))

    gf, gx = np.asarray(tf) / n_paths, np.asarray(tx) / n_paths
    sf = engine._chunk_stderr(np.asarray(tf, np.float64),
                              np.asarray(qf, np.float64), n_chunks, chunk)
    sx = engine._chunk_stderr(np.asarray(tx, np.float64),
                              np.asarray(qx, np.float64), n_chunks, chunk)
    names = ("price", "delta", "vega_xi", "vega_eta", "rho_rate",
             "vega_h")
    for name, a, b, ea, eb in zip(names, gf, gx, sf, sx):
        tol = 4.0 * float(np.hypot(ea, eb)) + 2e-3 * max(abs(a), abs(b))
        assert abs(a - b) < tol, (name, a, b, ea, eb)


def _chain_fits_and_tables(key, strikes):
    """Shared pilot -> per-strike (fits, log-boundary tables), the chain
    pricer's exact table pipeline."""
    pilot = engine.make_chunk_pathgen(**MKT, n_steps=N_STEPS, dt=DT,
                                      chunk_paths=1 << 11)(key)

    def one(strike):
        _, fits = lsm_fit(pilot, MKT["r"], strike, MATURITY, DT, IS_CALL, 2)
        return fits

    fits = jax.vmap(one)(jnp.asarray(strikes))
    tables = jax.vmap(
        lambda fit, strike: pathgen_pallas.log_boundary_rows(
            pathgen_pallas.boundary_rows(fit, MKT["r"], strike, MATURITY,
                                         DT, N_STEPS, IS_CALL)))(
        fits, jnp.asarray(strikes, jnp.float32))
    return fits, tables


@pytest.mark.parametrize("strikes", [[94.0, 99.0, 104.0],
                                     list(np.linspace(88.0, 112.0, 13))])
def test_fused_chain_greeks_match_single_strike_kernel(rng, strikes):
    """The chain Greeks kernel's per-strike columns equal the
    single-strike fused Greeks kernel on the SAME injected noise: the
    tangent planes are shared by construction, and the epilogues differ
    only in f32 rounding (the chain recovers d*payoff from the table's
    disc*strike row; the single-strike kernel bakes the strike).  The
    13-strike case exercises grouping (two kernel passes over regenerated
    planes) and the partial-group table padding."""
    chunk = 128
    chain, s_pad = pathgen_pallas.make_pallas_chain_greeks_chunk(
        **MKT, strikes=len(strikes), maturity=MATURITY, dt=DT,
        n_steps=N_STEPS, chunk_paths=chunk, block_paths=64,
        is_call=IS_CALL, interpret=True, noise_input=True)
    noise = np.zeros((2, chunk, s_pad), np.float32)
    noise[:, :, :N_STEPS] = rng.standard_normal((2, chunk, N_STEPS))
    noise = jnp.asarray(noise)
    _, tables = _chain_fits_and_tables(jax.random.key(1), strikes)
    got = np.asarray(chain(noise, tables))
    assert got.shape == (6, len(strikes))

    for j, k in enumerate(strikes):
        single, _ = pathgen_pallas.make_pallas_greeks_chunk(
            **MKT, strike=k, maturity=MATURITY, dt=DT, n_steps=N_STEPS,
            chunk_paths=chunk, block_paths=64, is_call=IS_CALL,
            interpret=True, noise_input=True)
        want = np.asarray(single(noise, tables[j]))
        scale = np.maximum(np.abs(want), 1e-3 * np.max(np.abs(want)))
        assert np.all(np.abs(got[:, j] - want) / scale < 1e-4), (
            k, got[:, j], want)


@pytest.mark.parametrize("antithetic", [False, True])
def test_chain_greeks_grid_sweep_matches_regen(rng, antithetic):
    """Grid-over-groups chain Greeks kernel (tangent planes in VMEM
    scratch, grid = (blocks, groups)) == the regen design BITWISE on
    identical injected noise — the per-block arithmetic is the same
    (_tangent_planes + per-group _greek_stop_vals) in the same reduction
    order.  25 strikes = 3 groups with tail padding; the antithetic case
    pins the paired generation into scratch too."""
    chunk = 128
    rows = chunk // 2 if antithetic else chunk
    strikes = [float(v) for v in np.linspace(85.0, 115.0, 25)]
    kw = dict(**MKT, strikes=len(strikes), maturity=MATURITY, dt=DT,
              n_steps=N_STEPS, chunk_paths=chunk, block_paths=64,
              is_call=IS_CALL, interpret=True, noise_input=True,
              antithetic=antithetic)
    grid_chain, s_pad = pathgen_pallas.make_pallas_chain_greeks_chunk(
        **kw, sweep_impl="grid")
    regen_chain, _ = pathgen_pallas.make_pallas_chain_greeks_chunk(
        **kw, sweep_impl="regen")
    noise = jnp.asarray(rng.standard_normal((2, rows, s_pad)),
                        jnp.float32)
    _, tables = _chain_fits_and_tables(jax.random.key(1), strikes)
    got = np.asarray(grid_chain(noise, tables))
    want = np.asarray(regen_chain(noise, tables))
    assert got.shape == (6, 25)
    np.testing.assert_array_equal(got, want)


def test_fused_chain_greeks_engine_path_selected():
    """StreamingChainPricer exposes the fused chain Greeks machinery
    exactly on the eligible configuration (the fused chain price
    configuration with the boundary policy in the chol form)."""
    kwargs = dict(s0=100.0, xi=0.04, h=0.2, eta=1.0, rho=-0.4, r=0.04,
                  strikes=[98.0, 102.0], maturity=32 / 252.0,
                  is_call=False)
    base = dict(n_paths=1 << 12, n_steps=32, chunk_paths=1 << 10,
                pilot_paths=1 << 10)
    p = engine.StreamingChainPricer(
        **kwargs, config=engine.StreamConfig(**base,
                                             pathgen_impl="pallas"))
    assert p._fused_greek_stream is not None
    for bad in (dict(pathgen_impl="xla"),
                dict(pathgen_impl="pallas", chain_policy_form="quadratic"),
                dict(pathgen_impl="pallas", fgn_form="spectral"),
                dict(pathgen_impl="pallas", qmc=True)):
        p = engine.StreamingChainPricer(
            **kwargs, config=engine.StreamConfig(**base, **bad))
        assert p._fused_greek_stream is None, bad
    bucketed = engine.StreamingChainPricer(
        **kwargs, config=engine.StreamConfig(**base,
                                             pathgen_impl="pallas"),
        bucketed=True)
    assert bucketed._fused_greek_stream is None


def test_fused_chain_greeks_match_single_strike_on_chip():
    """Engine-level agreement on the real TPU: the fused chain
    price_and_greeks equals per-strike fused StreamingPricer
    price_and_greeks with the same key — identical pilot (the chain fit
    vmaps the same lsm_fit over the same pilot paths), identical
    in-kernel noise (same (seed, block) PRNG keying, same block size),
    so every column agrees to the epilogues' f32 rounding."""
    if jax.devices()[0].platform != "tpu":
        pytest.skip("requires a real TPU for in-kernel PRNG")
    kwargs = dict(s0=100.0, xi=0.04, h=0.2, eta=1.0, rho=-0.4, r=0.04,
                  maturity=48 / 252.0, is_call=False)
    cfg = engine.StreamConfig(n_paths=1 << 15, n_steps=48,
                              chunk_paths=1 << 13, pilot_paths=1 << 12,
                              pathgen_impl="pallas")
    strikes = [96.0, 100.0, 104.0]
    chain = engine.StreamingChainPricer(**kwargs, strikes=strikes,
                                        config=cfg)
    assert chain._fused_greek_stream is not None
    g, se = chain.price_and_greeks(jax.random.key(5), with_stderr=True)
    assert np.all(np.isfinite(g)) and np.all(np.isfinite(se))
    for j, k in enumerate(strikes):
        single = engine.StreamingPricer(**kwargs, strike=k, config=cfg)
        assert single._fused_greek_stream is not None
        gs = np.asarray(single.price_and_greeks(jax.random.key(5)))
        scale = np.maximum(np.abs(gs), 1e-3 * np.max(np.abs(gs)))
        assert np.all(np.abs(g[:, j] - gs) / scale < 1e-3), (
            k, g[:, j], gs)
    # Monotone put smile sanity on the fused path.
    assert g[0, 0] < g[0, 1] < g[0, 2]


def test_chain_greeks_match_per_strike_stream():
    """StreamingChainPricer.price_and_greeks == per-strike
    StreamingPricer.price_and_greeks on the XLA path: with the same key,
    both fit from the SAME pilot paths and stream the SAME chunks (the
    traced-H generator and fold_in key schedule are shared), so every
    per-strike column must agree to vmap-vs-scalar numerics — policy,
    paths, and estimator all identical."""
    kwargs = dict(s0=100.0, xi=0.04, h=0.2, eta=1.0, rho=-0.4, r=0.04,
                  maturity=32 / 252.0, is_call=False)
    cfg = engine.StreamConfig(n_paths=1 << 13, n_steps=32,
                              chunk_paths=1 << 11, pilot_paths=1 << 10)
    strikes = [95.0, 100.0, 105.0]
    chain = engine.StreamingChainPricer(**kwargs, strikes=strikes,
                                        config=cfg)
    g, se = chain.price_and_greeks(jax.random.key(9), with_stderr=True)
    assert g.shape == (6, 3) and se.shape == (6, 3)
    assert np.all(np.isfinite(g))
    for j, k in enumerate(strikes):
        single = engine.StreamingPricer(**kwargs, strike=k, config=cfg)
        gs = single.price_and_greeks(jax.random.key(9))
        np.testing.assert_allclose(g[:, j], np.asarray(gs), rtol=2e-4,
                                   atol=1e-5)
    # Monotone smile sanity: put prices and |delta| increase in strike.
    assert g[0, 0] < g[0, 1] < g[0, 2]
    assert g[1, 0] > g[1, 1] > g[1, 2]        # delta more negative


def test_chain_greeks_bucketed_rejected():
    cfg = engine.StreamConfig(n_paths=1 << 12, n_steps=32,
                              chunk_paths=1 << 10, pilot_paths=1 << 9)
    chain = engine.StreamingChainPricer(
        s0=100.0, xi=0.04, h=0.2, eta=1.0, rho=-0.4, r=0.04,
        strikes=[100.0], maturity=32 / 252.0, is_call=False, config=cfg,
        bucketed=True)
    with pytest.raises(ValueError, match="bucketed"):
        chain.price_and_greeks(jax.random.key(0))


def test_serving_chain_greeks_match_non_bucketed():
    """A traced-market (serving) pricer's price_and_greeks — jvp over its
    already-traced market inputs — agrees with the non-bucketed chain
    greeks on the same contract at an exact-shape bucket (same threefry
    key schedule, same traced-H generator family, same per-strike fit
    convention)."""
    cfg = engine.StreamConfig(n_paths=1 << 13, n_steps=32,
                              chunk_paths=1 << 11, pilot_paths=1 << 10)
    kwargs = dict(s0=100.0, xi=0.04, h=0.2, eta=1.0, rho=-0.4, r=0.04,
                  maturity=32 / 252.0, is_call=False)
    strikes = [97.0, 103.0]
    plain = engine.StreamingChainPricer(**kwargs, strikes=strikes,
                                        config=cfg)
    g_plain = plain.price_and_greeks(jax.random.key(11))

    serving = engine.StreamingChainPricer(**kwargs, strikes=strikes,
                                          config=cfg, bucketed=True,
                                          traced_market=True)
    g_serve, se = serving.price_and_greeks(
        jax.random.key(11), with_stderr=True, n_steps_live=32,
        maturity=kwargs["maturity"],
        market=dict(s0=100.0, xi=0.04, r=0.04, eta=1.0), hurst=0.2)
    assert g_serve.shape == (6, 2) and np.all(np.isfinite(g_serve))
    # Same estimator family, same keys; small numeric drift from the
    # bucketed program's padded-column plumbing is allowed.
    scale = np.maximum(np.abs(g_plain), 1e-2 * np.max(np.abs(g_plain)))
    assert np.all(np.abs(g_serve - g_plain) / scale < 2e-2), (
        g_serve, g_plain)

    # A changed market reprices through the SAME compiled programs and
    # moves the greeks the right way (higher xi -> higher put vega value).
    g2 = serving.price_and_greeks(
        jax.random.key(11), n_steps_live=32, maturity=kwargs["maturity"],
        market=dict(s0=100.0, xi=0.09, r=0.04, eta=1.0), hurst=0.2)
    assert g2[0, 0] > g_serve[0, 0]          # more vol, dearer put


def test_fused_greeks_antithetic_matches_pair(rng):
    """antithetic=True on injected noise (chunk/2 rows per plane) equals
    the plain Greeks kernel on +noise plus on -noise, for ALL six
    outputs — per-member tangent arithmetic is the plain body's (only
    the two noise matmuls are shared per pair, and they are linear)."""
    pilot = engine.make_chunk_pathgen(**MKT, n_steps=N_STEPS, dt=DT,
                                      chunk_paths=1 << 11)(jax.random.key(0))
    _, fits = lsm_fit(pilot, MKT["r"], STRIKE, MATURITY, DT, IS_CALL, 2)
    rows = pathgen_pallas.log_boundary_rows(
        pathgen_pallas.boundary_rows(fits, MKT["r"], STRIKE, MATURITY,
                                     DT, N_STEPS, IS_CALL))
    half = CHUNK // 2

    kw = dict(**MKT, strike=STRIKE, maturity=MATURITY, dt=DT,
              n_steps=N_STEPS, is_call=IS_CALL, interpret=True,
              noise_input=True)
    anti, s_pad = pathgen_pallas.make_pallas_greeks_chunk(
        chunk_paths=CHUNK, block_paths=64, antithetic=True, **kw)
    plain, _ = pathgen_pallas.make_pallas_greeks_chunk(
        chunk_paths=half, block_paths=32, **kw)

    noise = jnp.asarray(rng.standard_normal((2, half, s_pad)), jnp.float32)
    got = np.asarray(anti(noise, rows))
    want = np.asarray(plain(noise, rows)) + np.asarray(plain(-noise, rows))
    scale = np.maximum(np.abs(want), 1e-3 * np.max(np.abs(want)))
    assert np.all(np.abs(got - want) / scale < 1e-5), (got, want)


def test_fused_chain_greeks_antithetic_matches_pair(rng):
    """Chain-Greeks antithetic == plain(+N) + plain(-N), per strike and
    per output (6 x K)."""
    strikes = [94.0, 100.0, 106.0]
    pilot = engine.make_chunk_pathgen(**MKT, n_steps=N_STEPS, dt=DT,
                                      chunk_paths=1 << 11)(jax.random.key(0))

    def one_fit(strike):
        _, fits = lsm_fit(pilot, MKT["r"], strike, MATURITY, DT,
                          IS_CALL, 2)
        return fits

    fits = jax.vmap(one_fit)(jnp.asarray(strikes))
    tables = jax.vmap(
        lambda fit, k: pathgen_pallas.log_boundary_rows(
            pathgen_pallas.boundary_rows(fit, MKT["r"], k, MATURITY, DT,
                                         N_STEPS, IS_CALL))
    )(fits, jnp.asarray(strikes))
    half = CHUNK // 2

    kw = dict(**MKT, strikes=strikes, maturity=MATURITY, dt=DT,
              n_steps=N_STEPS, is_call=IS_CALL, interpret=True,
              noise_input=True)
    anti, s_pad = pathgen_pallas.make_pallas_chain_greeks_chunk(
        chunk_paths=CHUNK, block_paths=64, antithetic=True, **kw)
    plain, _ = pathgen_pallas.make_pallas_chain_greeks_chunk(
        chunk_paths=half, block_paths=32, **kw)

    noise = jnp.asarray(rng.standard_normal((2, half, s_pad)), jnp.float32)
    got = np.asarray(anti(noise, tables))
    want = np.asarray(plain(noise, tables)) + np.asarray(
        plain(-noise, tables))
    scale = np.maximum(np.abs(want), 1e-3 * np.max(np.abs(want)))
    assert np.all(np.abs(got - want) / scale < 1e-5), (got, want)
