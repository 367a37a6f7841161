"""Streaming large-scale LSM engine tests (models/engine.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from montecarlooptionspricer_tpu.models import engine, lsm
from montecarlooptionspricer_tpu.models.closed_form import (
    binomial_american, black_scholes)


def test_chunk_pathgen_matches_reference_generator_statistics():
    # The matmul-fGN chunk generator must produce the same distribution as
    # rough_volatility.generate_paths: compare mean/std of terminal prices.
    from montecarlooptionspricer_tpu.models import rough_volatility

    kwargs = dict(s0=100.0, xi=0.05, h=0.15, eta=1.4, rho=-0.5, r=0.04)
    n_steps, n = 64, 1 << 14
    gen = engine.make_chunk_pathgen(**kwargs, n_steps=n_steps,
                                    dt=1 / 252, chunk_paths=n)
    a = gen(jax.random.key(0))
    b = rough_volatility.generate_paths(jax.random.key(1), **kwargs,
                                        n_steps=n_steps, n_paths=n,
                                        dt=1 / 252)
    assert a.shape == b.shape == (n, n_steps + 1)
    ma, mb = float(a[:, -1].mean()), float(b[:, -1].mean())
    sa, sb = float(a[:, -1].std()), float(b[:, -1].std())
    se = sb / np.sqrt(n)
    assert abs(ma - mb) < 5 * se, (ma, mb, se)
    assert abs(sa - sb) / sb < 0.1


def test_policy_value_consistent_with_lsm_fit():
    # On GBM (eta ~ 0), the streamed policy estimate must agree with the
    # in-memory LSM price within MC error (policy estimator is a lower
    # bound of a slightly upward-biased estimator -> allow one-sided slack).
    s0, strike, r, sigma, t = 100.0, 105.0, 0.04, 0.25, 0.25
    n_steps = 63
    dt = t / n_steps
    cfg = engine.StreamConfig(n_paths=1 << 15, n_steps=n_steps,
                              chunk_paths=1 << 13, pilot_paths=1 << 13,
                              dt=dt)
    price = engine.price_rbergomi_lsm_streaming(
        jax.random.key(0), s0, xi=sigma * sigma, h=0.5, eta=1e-6, rho=-0.3,
        r=r, strike=strike, maturity=t, is_call=False, config=cfg)

    from montecarlooptionspricer_tpu.models import gbm
    paths = gbm.generate_paths(jax.random.key(5), s0, sigma, r, n_steps,
                               1 << 15, dt)
    ref = float(lsm.lsm_price(paths, r, strike, t, dt, False, 2))
    amer = binomial_american(s0, strike, r, sigma, t, False, steps=1000)
    euro = black_scholes(s0, strike, r, sigma, t, False)
    # Sanity triangle: policy price near the binomial American value.
    assert euro - 0.2 < price < amer * 1.05, (price, euro, amer)
    assert abs(price - amer) / amer < 0.05, (price, amer)
    assert abs(price - ref) / ref < 0.08, (price, ref)


def test_streaming_deterministic_and_chunk_invariant():
    cfg1 = engine.StreamConfig(n_paths=1 << 13, n_steps=32,
                               chunk_paths=1 << 12, pilot_paths=1 << 11)
    kwargs = dict(s0=100.0, xi=0.04, h=0.2, eta=1.0, rho=-0.4, r=0.04,
                  strike=102.0, maturity=32 / 252.0, is_call=False)
    a = engine.price_rbergomi_lsm_streaming(jax.random.key(3), **kwargs,
                                            config=cfg1)
    b = engine.price_rbergomi_lsm_streaming(jax.random.key(3), **kwargs,
                                            config=cfg1)
    assert a == b


def test_streaming_rejects_indivisible():
    cfg = engine.StreamConfig(n_paths=1000, n_steps=16, chunk_paths=512)
    with pytest.raises(ValueError):
        engine.price_rbergomi_lsm_streaming(
            jax.random.key(0), 100.0, 0.04, 0.2, 1.0, -0.3, 0.04, 100.0,
            16 / 252.0, False, cfg)


def test_config_rejects_enum_typos_at_construction():
    """A misspelled form would otherwise be silently accepted on XLA code
    paths (only the Pallas builders resolve it) — benchmarking nothing."""
    for kw in ({"fgn_form": "cholesky"}, {"tiled_impl": "slabs"},
               {"chain_policy_form": "intervals"}):
        with pytest.raises(ValueError):
            engine.StreamConfig(n_paths=1 << 10, n_steps=16, **kw)


def test_config_rejects_nonpositive_interleave():
    """interleave < 1 would run the fused kernel's sub-block loop ZERO
    times — every partial sum 0.0, a silent price of 0.0 — and 0 is a
    trace-time ZeroDivisionError; the kernel builders only check > 1."""
    for bad in (0, -1, 2.0):
        with pytest.raises(ValueError, match="pallas_interleave"):
            engine.StreamConfig(n_paths=1 << 10, n_steps=16,
                                pallas_interleave=bad)


def test_explicit_chol_on_factored_kernel_errors():
    """An EXPLICIT fgn_form='chol' must not silently benchmark the
    spectral-only factored-DFT kernel (A/B integrity)."""
    with pytest.raises(ValueError, match="factored-DFT"):
        engine._resolve_tiled_module(
            engine.StreamConfig(n_paths=1 << 10, n_steps=600,
                                fgn_form="chol", tiled_impl="factored"),
            600, jnp.float32)
    # auto keeps the silent spectral fallback: no error, factored chosen.
    mod = engine._resolve_tiled_module(
        engine.StreamConfig(n_paths=1 << 10, n_steps=600,
                            tiled_impl="factored"),
        600, jnp.float32)
    assert mod is not None


def test_explicit_tiled_impl_beyond_budget_errors():
    """An EXPLICITLY requested long-horizon kernel whose budget can't
    cover the horizon must error, not silently benchmark the XLA
    generator (A/B integrity, same contract as chol-on-factored);
    tiled_impl='auto' keeps the silent XLA fallback."""
    huge = 100_000  # past both kernels' budgets at block 256
    for impl in ("factored", "slab"):
        with pytest.raises(ValueError, match="VMEM budget"):
            engine._resolve_tiled_module(
                engine.StreamConfig(n_paths=1 << 10, n_steps=huge,
                                    tiled_impl=impl), huge, jnp.float32)
    mod = engine._resolve_tiled_module(
        engine.StreamConfig(n_paths=1 << 10, n_steps=huge), huge,
        jnp.float32)
    assert mod is None  # auto -> XLA generator takes over


def test_chain_pricer_rejects_silent_misconfiguration():
    """StreamingChainPricer must reject what StreamingPricer rejects: a
    typo'd pathgen_impl used to fall through to the XLA path, and
    control_variate was silently dropped (no control sums in the chain
    kernel) while StreamConfig's docstring promised CV everywhere."""
    kw = dict(s0=100.0, xi=0.04, h=0.2, eta=1.0, rho=-0.4, r=0.04,
              strikes=[95.0, 105.0], maturity=16 / 252.0, is_call=False)
    with pytest.raises(ValueError, match="pathgen_impl"):
        engine.StreamingChainPricer(**kw, config=engine.StreamConfig(
            n_paths=1 << 10, n_steps=16, chunk_paths=1 << 9,
            pilot_paths=1 << 9, pathgen_impl="Pallas"))
    with pytest.raises(ValueError, match="control_variate"):
        engine.StreamingChainPricer(**kw, config=engine.StreamConfig(
            n_paths=1 << 10, n_steps=16, chunk_paths=1 << 9,
            pilot_paths=1 << 9, control_variate=True))


def test_lsm_fit_shapes():
    from montecarlooptionspricer_tpu.models import gbm
    paths = gbm.generate_paths(jax.random.key(0), 100.0, 0.2, 0.04, 20,
                               256, 1 / 252)
    price, fits = lsm.lsm_fit(paths, 0.04, 110.0, 21 / 252, 1 / 252, False, 2)
    assert fits.coeffs.shape == (20, 3)
    assert fits.mu.shape == (20,) and fits.sd.shape == (20,)
    assert np.isfinite(float(price))
    # Forward-time ordering: at step 0 every path is ITM (strike 110 put,
    # S0 = 100), so the regressor center is exactly S0.
    assert abs(float(fits.mu[0]) - 100.0) < 1e-3


def test_matmul_cumsum_matches_cumsum():
    """The MXU triangular-matmul log-price accumulation is the same math as
    jnp.cumsum (different summation order only)."""
    kwargs = dict(s0=100.0, xi=0.04, h=0.15, eta=1.2, rho=-0.5, r=0.04,
                  n_steps=48, dt=1 / 252.0, chunk_paths=512)
    gen_scan = engine.make_chunk_pathgen(**kwargs, cumsum_impl="cumsum")
    gen_mm = engine.make_chunk_pathgen(**kwargs, cumsum_impl="matmul")
    key = jax.random.key(11)
    a = np.asarray(gen_scan(key))
    b = np.asarray(gen_mm(key))
    # TPU runs the triangular matmul at the backend's default precision
    # (bf16 inputs, ~4e-3 relative noise on the accumulated log-price —
    # far below MC noise); CPU matmuls are full f32.
    if jax.devices()[0].platform == "tpu":
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=0.5)
    else:
        np.testing.assert_allclose(a, b, rtol=5e-5, atol=5e-4)


def test_bf16_fgn_price_within_mc_stderr():
    """bf16 fGN matmul inputs shift the price by far less than MC noise."""
    base = dict(n_paths=1 << 14, n_steps=32, chunk_paths=1 << 12,
                pilot_paths=1 << 11)
    kwargs = dict(s0=100.0, xi=0.04, h=0.2, eta=1.0, rho=-0.4, r=0.04,
                  strike=102.0, maturity=32 / 252.0, is_call=False)
    p32 = engine.price_rbergomi_lsm_streaming(
        jax.random.key(5), **kwargs,
        config=engine.StreamConfig(**base))
    p16 = engine.price_rbergomi_lsm_streaming(
        jax.random.key(5), **kwargs,
        config=engine.StreamConfig(**base, fgn_matmul_dtype="bfloat16",
                                   cumsum_impl="matmul"))
    # Same threefry draws, so the only differences are rounding; bound by
    # a fraction of the MC stderr at this path count (~0.03).
    assert abs(p32 - p16) < 0.05


def test_pallas_streaming_price_matches_xla():
    """Full fit-then-stream with the fused Pallas generator agrees with the
    XLA generator within MC error (real TPU only: the CPU interpreter stubs
    the in-kernel PRNG)."""
    if jax.devices()[0].platform != "tpu":
        pytest.skip("requires a real TPU for in-kernel PRNG")
    base = dict(n_paths=1 << 15, n_steps=32, chunk_paths=1 << 13,
                pilot_paths=1 << 12)
    kwargs = dict(s0=100.0, xi=0.04, h=0.2, eta=1.0, rho=-0.4, r=0.04,
                  strike=102.0, maturity=32 / 252.0, is_call=False)
    p_xla = engine.price_rbergomi_lsm_streaming(
        jax.random.key(5), **kwargs, config=engine.StreamConfig(**base))
    p_pal = engine.price_rbergomi_lsm_streaming(
        jax.random.key(5), **kwargs,
        config=engine.StreamConfig(**base, pathgen_impl="pallas"))
    assert abs(p_xla - p_pal) < 0.15  # ~3 MC stderr at 32k paths


def test_pallas_chol_form_price_matches_spectral():
    """The Cholesky fGN form (one noise plane, one matmul — identical
    Gaussian law, see engine._chol_matrix_host) prices within MC error of
    the spectral form through the fused streaming path (real TPU only)."""
    if jax.devices()[0].platform != "tpu":
        pytest.skip("requires a real TPU for in-kernel PRNG")
    base = dict(n_paths=1 << 15, n_steps=32, chunk_paths=1 << 13,
                pilot_paths=1 << 12, pathgen_impl="pallas")
    kwargs = dict(s0=100.0, xi=0.04, h=0.2, eta=1.0, rho=-0.4, r=0.04,
                  strike=102.0, maturity=32 / 252.0, is_call=False)
    p_spec = engine.price_rbergomi_lsm_streaming(
        jax.random.key(5), **kwargs,
        config=engine.StreamConfig(**base, fgn_form="spectral"))
    p_chol = engine.price_rbergomi_lsm_streaming(
        jax.random.key(5), **kwargs,
        config=engine.StreamConfig(**base, fgn_form="chol"))
    assert abs(p_spec - p_chol) < 0.15  # ~3 MC stderr at 32k paths

needs_mesh = pytest.mark.skipif(
    jax.device_count() < 8,
    reason="needs the 8-device virtual CPU mesh (hardware runs see 1 chip)")


@needs_mesh
def test_streaming_pricer_sharded_matches_single_chip():
    """Mesh-sharded fit-then-stream (8 virtual devices): every device
    generates/prices its own chunks, pilot moments psum across shards.
    Statistically equivalent to the single-chip run."""
    from montecarlooptionspricer_tpu.parallel import make_mesh

    mesh = make_mesh(8)
    cfg = engine.StreamConfig(n_paths=1 << 15, n_steps=32,
                              chunk_paths=1 << 10, pilot_paths=1 << 9)
    kwargs = dict(s0=100.0, xi=0.04, h=0.2, eta=1.0, rho=-0.4, r=0.04,
                  strike=102.0, maturity=32 / 252.0, is_call=False)
    sharded = engine.StreamingPricer(**kwargs, config=cfg, mesh=mesh)
    p_mesh = sharded.price(jax.random.key(5))
    single = engine.StreamingPricer(**kwargs, config=cfg)
    p_one = single.price(jax.random.key(5))
    assert np.isfinite(p_mesh) and p_mesh > 0
    assert abs(p_mesh - p_one) < 0.2     # ~3 MC stderr at 32k paths
    # sharded runs are deterministic per seed too
    assert sharded.price(jax.random.key(5)) == p_mesh
    with pytest.raises(ValueError):
        sharded.price(jax.random.key(0), n_paths=(1 << 10) * 8 + 8)


def test_pallas_falls_back_for_long_horizons():
    """Past the single-tile kernel's form-aware VMEM cap (512 padded steps
    spectral, 1024 chol) the engine selects the step-tiled kernel (the
    reference's 1825-step horizon); past even the tiled kernel's
    noise-scratch budget it silently uses the XLA generator — same API,
    any horizon."""
    base = dict(n_paths=1 << 11, chunk_paths=1 << 10, pilot_paths=1 << 9,
                pathgen_impl="pallas")
    mkt = (100.0, 0.04, 0.2, 1.0, -0.4, 0.04, 102.0)
    # 600 steps: single-tile for chol (the auto default, raised cap),
    # step-tiled for spectral (cap 512).
    p = engine.StreamingPricer(*mkt, 600 / 252.0, False,
                               engine.StreamConfig(**base, n_steps=600))
    assert p._pathgen_impl == "pallas" and not p._pathgen_tiled
    p_spec = engine.StreamingPricer(
        *mkt, 600 / 252.0, False,
        engine.StreamConfig(**base, n_steps=600, fgn_form="spectral"))
    assert p_spec._pathgen_impl == "pallas" and p_spec._pathgen_tiled
    # 1825 steps: step-tiled for both forms.
    p = engine.StreamingPricer(*mkt, 1825 / 252.0, False,
                               engine.StreamConfig(**base, n_steps=1825))
    assert p._pathgen_impl == "pallas" and p._pathgen_tiled
    if jax.devices()[0].platform == "tpu":
        price = p.price(jax.random.key(0))
        assert np.isfinite(price) and price > 0

    # Past even the tiled budget the engine's selection logic lands on the
    # XLA generator (checked on the predicate — constructing a pricer at
    # 40k steps would build a [40k, 40k] host spectral matrix).
    from montecarlooptionspricer_tpu.models import pathgen_pallas_tiled
    assert not pathgen_pallas_tiled.supports(40_000, 256, jnp.float32)


def test_tiled_streaming_price_matches_xla():
    """Fit-then-stream with the step-tiled fused generator agrees with the
    XLA generator within MC error at a multi-tile horizon (real TPU only:
    in-kernel PRNG)."""
    if jax.devices()[0].platform != "tpu":
        pytest.skip("requires a real TPU for in-kernel PRNG")
    base = dict(n_paths=1 << 14, n_steps=200, chunk_paths=1 << 12,
                pilot_paths=1 << 12)
    kwargs = dict(s0=100.0, xi=0.04, h=0.2, eta=1.0, rho=-0.4, r=0.04,
                  strike=102.0, maturity=200 / 252.0, is_call=False)
    p_xla = engine.price_rbergomi_lsm_streaming(
        jax.random.key(5), **kwargs, config=engine.StreamConfig(**base))
    # Pin the factored DFT algorithm (auto prefers the chol slab, which has
    # its own hardware test below) so both long-horizon kernels stay
    # covered on the chip.
    cfg = engine.StreamConfig(**base, pathgen_impl="pallas",
                              tiled_impl="factored")
    pricer = engine.StreamingPricer(**kwargs, config=cfg)
    assert pricer._pathgen_tiled is False  # 200 steps still single-tile
    import montecarlooptionspricer_tpu.models.pathgen_pallas as pp
    orig = pp.MAX_KERNEL_STEPS, pp.MAX_KERNEL_STEPS_CHOL
    try:
        # Force the tiled kernel at 200 steps (both form caps).
        pp.MAX_KERNEL_STEPS = pp.MAX_KERNEL_STEPS_CHOL = 128
        tiled_pricer = engine.StreamingPricer(**kwargs, config=cfg)
        assert tiled_pricer._pathgen_tiled
        p_tiled = tiled_pricer.price(jax.random.key(5))
    finally:
        pp.MAX_KERNEL_STEPS, pp.MAX_KERNEL_STEPS_CHOL = orig
    assert abs(p_xla - p_tiled) < 0.3  # ~3 MC stderr at 16k paths


def test_slab_chol_streaming_price_matches_xla():
    """Fit-then-stream with the chol-form slab-tiled generator (one noise
    plane, one triangular matrix streamed as slabs) agrees with the XLA
    generator within MC error at a multi-tile horizon (real TPU only)."""
    if jax.devices()[0].platform != "tpu":
        pytest.skip("requires a real TPU for in-kernel PRNG")
    base = dict(n_paths=1 << 14, n_steps=200, chunk_paths=1 << 12,
                pilot_paths=1 << 12)
    kwargs = dict(s0=100.0, xi=0.04, h=0.2, eta=1.0, rho=-0.4, r=0.04,
                  strike=102.0, maturity=200 / 252.0, is_call=False)
    p_xla = engine.price_rbergomi_lsm_streaming(
        jax.random.key(5), **kwargs, config=engine.StreamConfig(**base))
    cfg = engine.StreamConfig(**base, pathgen_impl="pallas",
                              tiled_impl="slab", fgn_form="chol")
    import montecarlooptionspricer_tpu.models.pathgen_pallas as pp
    orig = pp.MAX_KERNEL_STEPS, pp.MAX_KERNEL_STEPS_CHOL
    try:
        # Force the tiled kernel at 200 steps (both form caps).
        pp.MAX_KERNEL_STEPS = pp.MAX_KERNEL_STEPS_CHOL = 128
        pricer = engine.StreamingPricer(**kwargs, config=cfg)
        assert pricer._pathgen_tiled
        p_tiled = pricer.price(jax.random.key(5))
    finally:
        pp.MAX_KERNEL_STEPS, pp.MAX_KERNEL_STEPS_CHOL = orig
    assert abs(p_xla - p_tiled) < 0.3  # ~3 MC stderr at 16k paths


def test_fused_log_boundary_policy_matches_quadratic_on_chip():
    """StreamingPricer with the log-space boundary policy (the default,
    VERIFY_r03 §12) prices within the root-band tolerance of the
    quadratic form on the SAME seed — the in-kernel RNG is keyed on
    (seed, block id) only, so both forms sweep bitwise-identical paths
    (real TPU only)."""
    if jax.devices()[0].platform != "tpu":
        pytest.skip("requires a real TPU for in-kernel PRNG")
    base = dict(n_paths=1 << 15, n_steps=48, chunk_paths=1 << 13,
                pilot_paths=1 << 12, pathgen_impl="pallas")
    kwargs = dict(s0=100.0, xi=0.04, h=0.2, eta=1.0, rho=-0.4, r=0.04,
                  strike=102.0, maturity=48 / 252.0, is_call=False)
    prices = {}
    for form in ("boundary", "quadratic"):
        for cv in (False, True):
            cfg = engine.StreamConfig(**base, policy_form=form,
                                      control_variate=cv)
            prices[form, cv] = engine.StreamingPricer(
                **kwargs, config=cfg).price(jax.random.key(7))
    # Same paths, near-identical decisions: differences are confined to
    # the f32 root band (documented in boundary_rows), far below MC
    # stderr (~0.05 at 32k paths).
    assert abs(prices["boundary", False] - prices["quadratic", False]) < 0.02
    assert abs(prices["boundary", True] - prices["quadratic", True]) < 0.02


def test_fused_chol_raised_cap_matches_slab_on_chip():
    """513-1024-step chol horizons now run the single-tile fused kernel
    (form-aware cap, VERIFY_r03 §11: 1.09-1.19x the slab); its price at a
    768-pad horizon agrees with the slab kernel within MC error, with the
    engine auto-clamping the path block to the VMEM budget (real TPU
    only)."""
    if jax.devices()[0].platform != "tpu":
        pytest.skip("requires a real TPU for in-kernel PRNG")
    base = dict(n_paths=1 << 14, n_steps=700, chunk_paths=1 << 12,
                pilot_paths=1 << 12, pathgen_impl="pallas", fgn_form="chol")
    kwargs = dict(s0=100.0, xi=0.04, h=0.2, eta=1.0, rho=-0.4, r=0.04,
                  strike=102.0, maturity=700 / 252.0, is_call=False)
    fused = engine.StreamingPricer(**kwargs,
                                   config=engine.StreamConfig(**base))
    assert fused._pathgen_tiled is False  # 700 steps single-tile for chol
    p_fused = fused.price(jax.random.key(5))
    slab = engine.StreamingPricer(
        **kwargs, config=engine.StreamConfig(**base, tiled_impl="slab"))
    assert slab._pathgen_tiled is False  # supports() wins over tiled_impl
    import montecarlooptionspricer_tpu.models.pathgen_pallas as pp
    orig = pp.MAX_KERNEL_STEPS_CHOL
    try:
        pp.MAX_KERNEL_STEPS_CHOL = 512
        slab = engine.StreamingPricer(
            **kwargs, config=engine.StreamConfig(**base, tiled_impl="slab"))
        assert slab._pathgen_tiled
        p_slab = slab.price(jax.random.key(5))
    finally:
        pp.MAX_KERNEL_STEPS_CHOL = orig
    assert abs(p_fused - p_slab) < 0.6  # ~3 MC stderr at 16k paths, T=2.8y


@pytest.mark.slow
def test_streaming_greeks_match_in_memory_ad():
    """Streaming forward-mode Greeks agree with the in-memory reverse-mode
    estimator (models/greeks.py) within MC error, and obey put bounds."""
    from montecarlooptionspricer_tpu.models import greeks as greeks_mod

    cfg = engine.StreamConfig(n_paths=1 << 14, n_steps=32,
                              chunk_paths=1 << 12, pilot_paths=1 << 11)
    kwargs = dict(s0=100.0, xi=0.04, h=0.2, eta=1.0, rho=-0.4, r=0.04,
                  strike=102.0, maturity=32 / 252.0, is_call=False)
    p = engine.StreamingPricer(**kwargs, config=cfg)
    (price, delta, vega_xi, vega_eta, rho_rate,
     vega_h) = p.price_and_greeks(jax.random.key(7))
    assert price > 0 and -1.0 <= delta <= 0.0 and vega_xi > 0.0
    assert np.isfinite(vega_h)
    g = greeks_mod.lsm_greeks(jax.random.key(7), s0=100.0, xi=0.04, h=0.2,
                              eta=1.0, rho=-0.4, r=0.04, strike=102.0,
                              maturity=32 / 252.0, n_steps=32,
                              n_paths=1 << 14, is_call=False)
    assert abs(price - g.price) < 0.15
    assert abs(delta - g.delta) < 0.1
    assert abs(vega_xi - g.vega_xi) < 0.2 * max(1.0, abs(g.vega_xi))
    assert np.isfinite(vega_eta)
    # deterministic per seed
    assert p.price_and_greeks(jax.random.key(7)) == (
        price, delta, vega_xi, vega_eta, rho_rate, vega_h)


def test_streaming_vega_eta_matches_finite_difference():
    """The pathwise vol-of-vol vega must match a central finite difference
    of the streamed price in eta (same keys => common random numbers, so
    the FD is low-noise at small h_eta).  The exercise policy is refit per
    eta in the FD, but at this bump size the envelope term is second-order
    (that's the point of envelope differentiation)."""
    def make(eta):
        cfg = engine.StreamConfig(n_paths=1 << 14, n_steps=32,
                                  chunk_paths=1 << 12, pilot_paths=1 << 12)
        return engine.StreamingPricer(100.0, 0.04, 0.2, eta, -0.4, 0.04,
                                      102.0, 32 / 252.0, False, cfg)

    key = jax.random.key(11)
    eta0, h_eta = 1.0, 0.05
    vega_eta = make(eta0).price_and_greeks(key)[3]
    p_up = make(eta0 + h_eta).price_and_greeks(key)[0]
    p_dn = make(eta0 - h_eta).price_and_greeks(key)[0]
    fd = (p_up - p_dn) / (2 * h_eta)
    assert vega_eta == pytest.approx(fd, abs=0.02 + 0.15 * abs(fd))


def test_streaming_vega_h_matches_finite_difference():
    """vega_h (roughness sensitivity, new in round 3) must match a
    central finite difference of the streamed price in the Hurst
    exponent — same keys => common random numbers, low-noise FD.  This is
    the Greek the baked-matrix generator could not provide (the spectral
    matrices now build in-graph from a traced H, make_chunk_pathgen
    traced_h)."""
    def make(h):
        cfg = engine.StreamConfig(n_paths=1 << 14, n_steps=32,
                                  chunk_paths=1 << 12, pilot_paths=1 << 12)
        return engine.StreamingPricer(100.0, 0.04, h, 1.0, -0.4, 0.04,
                                      102.0, 32 / 252.0, False, cfg)

    key = jax.random.key(12)
    h0, dh = 0.2, 0.02
    vega_h = make(h0).price_and_greeks(key)[5]
    p_up = make(h0 + dh).price_and_greeks(key)[0]
    p_dn = make(h0 - dh).price_and_greeks(key)[0]
    fd = (p_up - p_dn) / (2 * dh)
    assert np.isfinite(vega_h)
    assert vega_h == pytest.approx(fd, abs=0.03 + 0.15 * abs(fd))


def test_chain_pricer_matches_single_strike_runs():
    """The chain pricer's per-strike estimates equal the single-strike
    streaming estimator within MC error, and are monotone in strike for
    puts (same draws => smooth smile)."""
    cfg = engine.StreamConfig(n_paths=1 << 14, n_steps=32,
                              chunk_paths=1 << 12, pilot_paths=1 << 11)
    market = dict(s0=100.0, xi=0.04, h=0.2, eta=1.0, rho=-0.4, r=0.04)
    strikes = [92.0, 96.0, 100.0, 104.0, 108.0]
    chain = engine.StreamingChainPricer(**market, strikes=strikes,
                                        maturity=32 / 252.0, is_call=False,
                                        config=cfg)
    prices = chain.price(jax.random.key(9))
    assert prices.shape == (5,)
    # American put value increases with strike, strictly here.
    assert np.all(np.diff(prices) > 0)
    # middle strike agrees with the single-contract pricer within MC error
    single = engine.StreamingPricer(**market, strike=100.0,
                                    maturity=32 / 252.0, is_call=False,
                                    config=cfg)
    p_one = single.price(jax.random.key(9))
    assert abs(prices[2] - p_one) < 0.2
    # deterministic
    assert np.array_equal(chain.price(jax.random.key(9)), prices)


def test_control_variate_unbiased_and_lower_variance():
    """The martingale control (e^{-rT} S_T, mean exactly s0) must cut the
    estimator's seed-to-seed variance without moving its center."""
    base = dict(n_paths=1 << 12, n_steps=24, chunk_paths=1 << 11,
                pilot_paths=1 << 10)
    kwargs = dict(s0=100.0, xi=0.05, h=0.2, eta=1.0, rho=-0.4, r=0.04,
                  strike=100.0, maturity=24 / 252.0, is_call=False)
    plain = engine.StreamingPricer(**kwargs,
                                   config=engine.StreamConfig(**base))
    cv = engine.StreamingPricer(
        **kwargs, config=engine.StreamConfig(**base, control_variate=True))
    p_plain = [plain.price(jax.random.key(s)) for s in range(16)]
    p_cv = [cv.price(jax.random.key(s)) for s in range(16)]
    assert np.var(p_cv) < np.var(p_plain), (np.var(p_cv), np.var(p_plain))
    # centers agree within a couple of combined stderr
    se = np.sqrt((np.var(p_plain) + np.var(p_cv)) / 16)
    assert abs(np.mean(p_cv) - np.mean(p_plain)) < 3 * se + 1e-3
    # deterministic per seed
    assert cv.price(jax.random.key(3)) == p_cv[3]


def test_policy_never_exercises_at_dead_pilot_steps():
    """Steps whose pilot fit saw zero ITM samples must not exercise in the
    streamed policy (regression: an all-zero dead fit made cont=0, so any
    streamed path dipping ITM exercised on first touch — a downward bias)."""
    strike = 50.0  # deep OTM put: pilot never ITM anywhere
    pilot = jnp.full((64, 9), 100.0)
    _, fits = lsm.lsm_fit(pilot, 0.04, strike, 8 / 252, 1 / 252, False, 2)
    # a streamed path dips ITM at step 3 then recovers; terminal is OTM
    path = np.full((1, 9), 100.0)
    path[0, 3] = 40.0
    s, _ = engine.lsm_policy_value(jnp.asarray(path), fits, 0.04, strike,
                                   8 / 252, 1 / 252, False)
    # must take the (worthless) terminal payoff, not exercise at step 3
    assert float(s) == 0.0


def test_chain_pricer_honors_rng_impl():
    cfg = engine.StreamConfig(n_paths=1 << 12, n_steps=16,
                              chunk_paths=1 << 11, pilot_paths=1 << 10,
                              rng_impl="rbg")
    chain = engine.StreamingChainPricer(100.0, 0.04, 0.2, 1.0, -0.4, 0.04,
                                        [98.0, 102.0], 16 / 252.0, False,
                                        cfg)
    prices = chain.price(jax.random.key(0))
    assert np.all(np.isfinite(prices)) and prices[0] < prices[1]


def test_chain_boundary_form_matches_quadratic_on_chip():
    """Fused chain kernel, boundary vs quadratic policy form, SAME seed:
    the in-kernel RNG makes the path blocks bitwise identical, so the
    per-strike prices may differ only by near-root decision flips —
    value-neutral to first order (real TPU only)."""
    if jax.devices()[0].platform != "tpu":
        pytest.skip("requires a real TPU for in-kernel PRNG")
    base = dict(n_paths=1 << 16, n_steps=48, chunk_paths=1 << 14,
                pilot_paths=1 << 12, pathgen_impl="pallas")
    kw = dict(s0=100.0, xi=0.04, h=0.2, eta=1.0, rho=-0.4, r=0.04,
              strikes=[92.0, 100.0, 108.0], maturity=48 / 252.0,
              is_call=False)
    pb = engine.StreamingChainPricer(**kw, config=engine.StreamConfig(
        **base, chain_policy_form="boundary")).price(jax.random.key(7))
    pq = engine.StreamingChainPricer(**kw, config=engine.StreamConfig(
        **base, chain_policy_form="quadratic")).price(jax.random.key(7))
    assert np.all(np.isfinite(pb))
    np.testing.assert_allclose(pb, pq, atol=0.02)


def test_fgn_fft_impl_matches_matmul_paths():
    """fgn_impl="fft" (batched spectral form) and "matmul" (MXU form) draw
    the same noise from the same key and must produce identical paths to
    f32 roundoff — they are the same synthesis to accumulation order."""
    gm = engine.make_chunk_pathgen(100.0, 0.04, 0.1, 1.5, -0.4, 0.04,
                                   63, 1 / 252, 512, fgn_impl="matmul")
    gf = engine.make_chunk_pathgen(100.0, 0.04, 0.1, 1.5, -0.4, 0.04,
                                   63, 1 / 252, 512, fgn_impl="fft")
    k = jax.random.key(5)
    pm, pf = np.asarray(gm(k)), np.asarray(gf(k))
    # Same backend-default-precision caveat as the cumsum test: on TPU the
    # matmul form carries ~bf16 noise the exact FFT form doesn't.
    if jax.devices()[0].platform == "tpu":
        np.testing.assert_allclose(pm, pf, rtol=5e-3, atol=0.5)
    else:
        np.testing.assert_allclose(pm, pf, rtol=2e-5, atol=1e-4)


def test_streaming_price_fft_impl_agrees():
    """A streamed LSM price under fgn_impl="fft" agrees with the default
    within MC-trivial tolerance (same keys, same noise layout)."""
    kw = dict(n_paths=1 << 13, n_steps=32, chunk_paths=1 << 12,
              pilot_paths=1 << 11, dt=1 / 252, chunks_per_call=2,
              pathgen_impl="xla")
    pa = engine.StreamingPricer(100.0, 0.04, 0.1, 1.5, -0.4, 0.04, 105.0,
                                32 / 252, False,
                                engine.StreamConfig(fgn_impl="auto", **kw))
    pf = engine.StreamingPricer(100.0, 0.04, 0.1, 1.5, -0.4, 0.04, 105.0,
                                32 / 252, False,
                                engine.StreamConfig(fgn_impl="fft", **kw))
    a = pa.price(jax.random.key(1))
    b = pf.price(jax.random.key(1))
    assert abs(a - b) < 5e-3, (a, b)


def test_pallas_cv_streaming_matches_xla_cv():
    """Control variate riding the fused kernel agrees with the generic XLA
    CV stream within MC error (real TPU only)."""
    if jax.devices()[0].platform != "tpu":
        pytest.skip("requires a real TPU for in-kernel PRNG")
    base = dict(n_paths=1 << 15, n_steps=32, chunk_paths=1 << 13,
                pilot_paths=1 << 12, control_variate=True)
    kwargs = dict(s0=100.0, xi=0.04, h=0.2, eta=1.0, rho=-0.4, r=0.04,
                  strike=102.0, maturity=32 / 252.0, is_call=False)
    p_xla = engine.StreamingPricer(
        **kwargs, config=engine.StreamConfig(**base)).price(jax.random.key(5))
    p_pal = engine.StreamingPricer(
        **kwargs, config=engine.StreamConfig(**base, pathgen_impl="pallas")
    ).price(jax.random.key(5))
    assert abs(p_xla - p_pal) < 0.1  # CV-reduced stderr at 32k paths


def test_price_with_bounds_brackets_binomial_on_gbm():
    """The streamed duality bracket must contain the binomial American
    value on the GBM limit: the policy value is a valid lower bound and
    the delta-hedge dual a valid upper bound for ANY hedge quality."""
    s0, strike, r, sigma, t = 100.0, 105.0, 0.04, 0.25, 0.25
    n_steps = 63
    cfg = engine.StreamConfig(n_paths=1 << 15, n_steps=n_steps,
                              chunk_paths=1 << 13, pilot_paths=1 << 13,
                              dt=t / n_steps)
    p = engine.StreamingPricer(s0, sigma * sigma, 0.5, 1e-6, -0.3, r,
                               strike, t, False, cfg)
    lo, up = p.price_with_bounds(jax.random.key(0))
    amer = binomial_american(s0, strike, r, sigma, t, False, steps=1000)
    se = 0.05                      # ~3 MC stderr at 32k paths
    assert lo - se <= amer <= up + se, (lo, amer, up)
    assert up - lo < 0.08 * amer   # quartic hedge: ~4% gap measured
    # deterministic per seed
    assert p.price_with_bounds(jax.random.key(0)) == (lo, up)


@needs_mesh
def test_price_with_bounds_rbergomi_and_mesh():
    """Bounds under rough vol: upper >= lower, and the 8-device mesh run
    agrees with single-device statistically (fits/deltas/lam replicate via
    psum'd moments; partial sums reduce across shards)."""
    from montecarlooptionspricer_tpu.parallel import make_mesh

    kwargs = dict(s0=100.0, xi=0.04, h=0.2, eta=1.0, rho=-0.4, r=0.04,
                  strike=102.0, maturity=32 / 252.0, is_call=False)
    cfg = engine.StreamConfig(n_paths=1 << 14, n_steps=32,
                              chunk_paths=1 << 12, pilot_paths=1 << 12)
    lo, up = engine.StreamingPricer(**kwargs, config=cfg).price_with_bounds(
        jax.random.key(1))
    assert np.isfinite(lo) and np.isfinite(up) and lo < up
    assert up - lo < 0.15 * lo

    mesh = make_mesh(8)
    cfg8 = engine.StreamConfig(n_paths=1 << 14, n_steps=32,
                               chunk_paths=1 << 9, pilot_paths=1 << 9)
    lo8, up8 = engine.StreamingPricer(
        **kwargs, config=cfg8, mesh=mesh).price_with_bounds(jax.random.key(1))
    assert abs(lo8 - lo) < 0.15 and abs(up8 - up) < 0.2, (lo, lo8, up, up8)


def test_tiled_cv_streaming_matches_xla_cv():
    """Control variate on the step-tiled kernel (long horizons) agrees
    with the generic XLA CV stream within numeric tolerance (real TPU
    only; bf16 fGN slabs carry ~0.4% systematic noise)."""
    if jax.devices()[0].platform != "tpu":
        pytest.skip("requires a real TPU for in-kernel PRNG")
    base = dict(n_paths=1 << 15, n_steps=600, chunk_paths=1 << 13,
                pilot_paths=1 << 12, control_variate=True,
                fgn_matmul_dtype="bfloat16")
    kwargs = dict(s0=100.0, xi=0.04, h=0.2, eta=1.0, rho=-0.4, r=0.04,
                  strike=102.0, maturity=600 / 252.0, is_call=False)
    p_xla = engine.StreamingPricer(
        **kwargs, config=engine.StreamConfig(**base)).price(jax.random.key(5))
    p_til = engine.StreamingPricer(
        **kwargs, config=engine.StreamConfig(**base, pathgen_impl="pallas")
    ).price(jax.random.key(5))
    assert abs(p_xla - p_til) < 0.25, (p_xla, p_til)


@pytest.mark.slow
def test_streaming_price_stderr_calibrated():
    """StreamingPricer.price(with_stderr=True): the chunk-total stderr is
    the same order as the empirical spread across independent keys (the
    empirical spread also includes pilot-policy variation, so the bound is
    one-sided-ish); default return stays a bare float."""
    cfg = engine.StreamConfig(n_paths=1 << 15, n_steps=24,
                              chunk_paths=1 << 11, pilot_paths=1 << 12)
    kwargs = dict(s0=100.0, xi=0.04, h=0.2, eta=1.0, rho=-0.4, r=0.04,
                  strike=102.0, maturity=24 / 252.0, is_call=False)
    p = engine.StreamingPricer(**kwargs, config=cfg)
    price, se = p.price(jax.random.key(0), with_stderr=True)
    assert np.isfinite(price) and np.isfinite(se) and se > 0
    reps = np.array([p.price(jax.random.key(i)) for i in range(10)])
    emp = reps.std(ddof=1)
    assert emp / 6 < se < 3 * emp + 1e-4, (se, emp)
    assert p.price(jax.random.key(0)) == price    # back-compat bare float


def test_streaming_price_stderr_single_chunk_is_nan():
    cfg = engine.StreamConfig(n_paths=1 << 12, n_steps=16,
                              chunk_paths=1 << 12, pilot_paths=1 << 11)
    p = engine.StreamingPricer(100.0, 0.04, 0.2, 1.0, -0.4, 0.04, 102.0,
                               16 / 252.0, False, cfg)
    price, se = p.price(jax.random.key(0), with_stderr=True)
    assert np.isfinite(price) and np.isnan(se)


@pytest.mark.slow
def test_cv_price_stderr_reflects_variance_reduction():
    """The CV configuration's stderr comes from the CORRECTED chunk totals:
    it must be materially below the plain estimator's stderr for a
    near-the-money contract (that is the point of the control variate),
    and the CV price must still match plain within a few stderr."""
    kwargs = dict(s0=100.0, xi=0.04, h=0.2, eta=1.0, rho=-0.4, r=0.04,
                  strike=100.0, maturity=32 / 252.0, is_call=False)
    base = dict(n_paths=1 << 15, n_steps=32, chunk_paths=1 << 11,
                pilot_paths=1 << 12)
    _, se_plain = engine.StreamingPricer(
        **kwargs, config=engine.StreamConfig(**base)).price(
            jax.random.key(0), with_stderr=True)
    p_cv, se_cv = engine.StreamingPricer(
        **kwargs, config=engine.StreamConfig(**base, control_variate=True)
    ).price(jax.random.key(0), with_stderr=True)
    assert np.isfinite(se_cv) and 0 < se_cv < 0.8 * se_plain, (se_cv,
                                                               se_plain)
    assert np.isfinite(p_cv)


def test_price_with_bounds_stderr():
    """price_with_bounds(with_stderr=True) -> (lo, up, lo_se, up_se), the
    point estimates identical to the 2-tuple form, stderrs finite and
    positive for a multi-chunk run."""
    kwargs = dict(s0=100.0, xi=0.04, h=0.2, eta=1.0, rho=-0.4, r=0.04,
                  strike=102.0, maturity=32 / 252.0, is_call=False)
    cfg = engine.StreamConfig(n_paths=1 << 14, n_steps=32,
                              chunk_paths=1 << 11, pilot_paths=1 << 12)
    p = engine.StreamingPricer(**kwargs, config=cfg)
    lo, up = p.price_with_bounds(jax.random.key(1))
    lo2, up2, lo_se, up_se = p.price_with_bounds(jax.random.key(1),
                                                 with_stderr=True)
    assert (lo2, up2) == (lo, up)
    assert np.isfinite(lo_se) and np.isfinite(up_se)
    assert lo_se > 0 and up_se > 0
    # The duality gap must be resolvable against the MC noise at this
    # path count — otherwise the bracket is meaningless.
    assert up - lo > 2 * max(lo_se, up_se)


def test_greeks_stderr_calibrated():
    """price_and_greeks(with_stderr=True): per-output chunk-total stderrs,
    same point estimates as the plain call, price-stderr the same order as
    the empirical seed-to-seed spread."""
    cfg = engine.StreamConfig(n_paths=1 << 14, n_steps=24,
                              chunk_paths=1 << 11, pilot_paths=1 << 12)
    kwargs = dict(s0=100.0, xi=0.04, h=0.2, eta=1.0, rho=-0.4, r=0.04,
                  strike=102.0, maturity=24 / 252.0, is_call=False)
    p = engine.StreamingPricer(**kwargs, config=cfg)
    g, se = p.price_and_greeks(jax.random.key(3), with_stderr=True)
    assert len(g) == 6 and len(se) == 6
    assert all(np.isfinite(v) for v in g)
    assert all(np.isfinite(s) and s > 0 for s in se)
    assert p.price_and_greeks(jax.random.key(3)) == g   # back-compat
    reps = np.array([p.price_and_greeks(jax.random.key(i))[0]
                     for i in range(8)])
    emp = reps.std(ddof=1)
    assert emp / 6 < se[0] < 3 * emp + 1e-4, (se[0], emp)


def test_chunk_stderr_centered_beats_f32_floor():
    """_chunk_stderr's ``center``: CV-corrected chunk totals have
    relative spread ~1e-5 — below the raw f32 c^2 accumulation floor
    (~3e-4), where the uncentered second moment cancels to a false 0.
    Simulate both accumulations in f32 (exactly what the device loop
    does) and check the centered one recovers the true stderr while the
    raw one demonstrates the floor it was built to escape."""
    rng = np.random.default_rng(7)
    m, per_chunk = 76, 1 << 17
    mean_t, sd_t = 8.65e5, 30.0          # relative spread ~3.5e-5
    t = np.float32(mean_t + sd_t * rng.standard_normal(m))
    center = np.float32(mean_t * (1 + 2e-4))  # pilot ~6 chunk-sds off

    sq_raw = np.float32(0.0)
    sq_cen = np.float32(0.0)
    tot = np.float32(0.0)
    for v in t:
        tot = np.float32(tot + v)
        sq_raw = np.float32(sq_raw + np.float32(v * v))
        d = np.float32(v - center)
        sq_cen = np.float32(sq_cen + np.float32(d * d))

    want = t.astype(np.float64).std(ddof=1) / np.sqrt(m) / per_chunk
    got = engine._chunk_stderr(float(tot), float(sq_cen), m, per_chunk,
                               center=float(center))
    np.testing.assert_allclose(float(got), want, rtol=0.05)
    raw = engine._chunk_stderr(float(tot), float(sq_raw), m, per_chunk)
    # The raw path cannot resolve this spread: off by >25% (typically a
    # collapse toward 0 or noise-dominated), which is the failure mode
    # the centered accumulation removes.
    assert abs(float(raw) - want) > 0.25 * want


def test_cv_stderr_positive_and_consistent():
    """StreamConfig(control_variate=True).price(with_stderr=True) must
    report a finite POSITIVE stderr that is consistent with the plain
    estimator (the centered-accumulator fix; before it the CV bar
    systematically collapsed to 0 on hardware-scale workloads)."""
    kwargs = dict(s0=100.0, xi=0.04, h=0.2, eta=1.0, rho=-0.4, r=0.04,
                  strike=102.0, maturity=32 / 252.0, is_call=False)
    base = dict(n_paths=1 << 14, n_steps=32, chunk_paths=1 << 10,
                pilot_paths=1 << 11, chunks_per_call=16)
    plain = engine.StreamingPricer(
        **kwargs, config=engine.StreamConfig(**base))
    cv = engine.StreamingPricer(
        **kwargs, config=engine.StreamConfig(**base, control_variate=True))
    pp, sp = plain.price(jax.random.key(3), with_stderr=True)
    pc, sc = cv.price(jax.random.key(3), with_stderr=True)
    assert np.isfinite(sc) and sc > 0.0, sc
    assert abs(pc - pp) < 5.0 * float(np.hypot(sp, sc)), (pp, pc, sp, sc)
    # The CV bar must reflect SOME variance reduction vs plain on the
    # same key (loose: 2x slack covers the estimate's own noise).
    assert sc < 2.0 * sp, (sc, sp)


def test_xla_pathgen_antithetic_pairing():
    """make_chunk_pathgen(antithetic=True): rows [:half] are EXACTLY the
    plain half-size generator's paths on the same key (identical draw
    calls, identical math), and rows [half:] are the negated-noise
    partners — verified by replicating the generator's formula on the
    same draws with (Z, W) -> (-Z, -W)."""
    s0, xi, h, eta, rho, r = 100.0, 0.04, 0.12, 1.3, -0.4, 0.04
    n_steps, chunk, dt = 24, 64, 1 / 252.0
    half = chunk // 2
    mk = dict(cumsum_impl="matmul")

    anti = engine.make_chunk_pathgen(s0, xi, h, eta, rho, r, n_steps, dt,
                                     chunk, antithetic=True, **mk)
    plain = engine.make_chunk_pathgen(s0, xi, h, eta, rho, r, n_steps, dt,
                                      half, **mk)
    key = jax.random.key(11)
    got = np.asarray(anti(key))
    np.testing.assert_allclose(got[:half], np.asarray(plain(key)),
                               rtol=1e-6)

    # Member 1: replicate the generator's own arithmetic on the same
    # draws, negated (the spectral matrices come from the same host
    # builder the generator bakes in).
    kz, kw = jax.random.split(key)
    z = -jax.random.normal(kz, (2, half, n_steps), jnp.float32)
    dw = -jax.random.normal(kw, (half, n_steps), jnp.float32) * np.sqrt(dt)
    cr, ci = engine._fgn_matrices_host(n_steps, h, 1.0, dt, jnp.float32)
    x_hat = z[0] @ cr - z[1] @ ci
    t = np.arange(n_steps + 1, dtype=np.float32) * dt
    v = xi * jnp.exp(eta * x_hat - 0.5 * eta * eta * t[:n_steps] ** (2 * h))
    inc = (r - 0.5 * v) * dt + jnp.sqrt(jnp.maximum(0.0, v)) * dw
    want = s0 * np.exp(np.cumsum(np.asarray(inc, np.float64), axis=1))
    # The oracle cumsums in float64 on host; the generator's
    # cumsum_impl="matmul" runs on the MXU on TPU, whose f32 matmul
    # accumulation differs from host f64 by ~2e-4 relative after the
    # exp (measured max 2.1e-4 on v5e) — the pairing itself is exact
    # (the [:half] assertion above runs identical programs both sides).
    rtol = 5e-4 if jax.devices()[0].platform == "tpu" else 2e-5
    np.testing.assert_allclose(got[half:, 1:], want, rtol=rtol)
    np.testing.assert_allclose(got[half:, 0], s0)


def test_xla_antithetic_price_agreement_and_reduction():
    """XLA-generator antithetic: the price agrees with plain MC within
    combined stderr and the measured stderr is materially smaller (the
    put payoff is monotone in the terminal price).  64 iid chunks keep
    the se-ratio assertion far from flaky at the expected ~0.5-0.7."""
    kwargs = dict(s0=100.0, xi=0.04, h=0.2, eta=1.0, rho=-0.4, r=0.04,
                  strike=102.0, maturity=32 / 252.0, is_call=False)
    base = dict(n_paths=1 << 16, n_steps=32, chunk_paths=1 << 10,
                pilot_paths=1 << 12, chunks_per_call=64)
    plain = engine.StreamingPricer(
        **kwargs, config=engine.StreamConfig(**base))
    anti = engine.StreamingPricer(
        **kwargs, config=engine.StreamConfig(**base, antithetic=True))
    pp, sp = plain.price(jax.random.key(9), with_stderr=True)
    pa, sa = anti.price(jax.random.key(9), with_stderr=True)
    assert abs(pa - pp) < 4.0 * float(np.hypot(sa, sp)), (pa, pp, sa, sp)
    assert sa < 0.9 * sp, (sa, sp)


def test_bounds_stderrs_positive_and_finite():
    """price_with_bounds(with_stderr=True): both error bars finite and
    POSITIVE (the dual upper's chunk spread sits under the raw f32
    floor — the centered accumulators restored it; a hardware run had
    reported upper_stderr = 0.0 exactly before the fix)."""
    kwargs = dict(s0=100.0, xi=0.04, h=0.2, eta=1.0, rho=-0.4, r=0.04,
                  strike=102.0, maturity=32 / 252.0, is_call=False)
    p = engine.StreamingPricer(
        **kwargs, config=engine.StreamConfig(
            n_paths=1 << 14, n_steps=32, chunk_paths=1 << 10,
            pilot_paths=1 << 11, chunks_per_call=16))
    lo, up, lse, use = p.price_with_bounds(jax.random.key(5),
                                           with_stderr=True)
    assert lo <= up and np.isfinite(lo) and np.isfinite(up)
    assert np.isfinite(lse) and lse > 0, lse
    assert np.isfinite(use) and use > 0, use
