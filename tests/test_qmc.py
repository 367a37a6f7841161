"""Randomized QMC driver noise: unbiasedness + variance reduction on the
Black-Scholes control, determinism, and pipeline integration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from montecarlooptionspricer_tpu.models import rough_volatility
from montecarlooptionspricer_tpu.models.closed_form import black_scholes
from montecarlooptionspricer_tpu.ops import qmc


def test_sobol_base_shape_and_cache():
    a = qmc.sobol_base(250, 16)
    assert a.shape == (250, 16)
    assert a.dtype == jnp.uint32               # fixed-point digits
    assert a is qmc.sobol_base(250, 16)        # lru-cached device constant


def test_rotation_uniform_and_deterministic():
    base = qmc.sobol_base(128, 8)
    u1 = qmc.rotate(base, jax.random.key(1))
    u2 = qmc.rotate(base, jax.random.key(1))
    u3 = qmc.rotate(base, jax.random.key(2))
    assert np.array_equal(np.asarray(u1), np.asarray(u2))
    assert not np.array_equal(np.asarray(u1), np.asarray(u3))
    v = np.asarray(u1)
    assert (v > 0).all() and (v < 1).all()
    assert abs(v.mean() - 0.5) < 0.05


def test_qmc_normals_moments():
    base = qmc.sobol_base(512, 32)
    z = np.asarray(qmc.normals(base, jax.random.key(0)))
    assert abs(z.mean()) < 0.05
    assert abs(z.std() - 1.0) < 0.05


def test_rotate_extreme_bits_stay_interior():
    """Adversarial digital-shift outcomes: points whose shifted bits are
    ALL ONES (or all zeros) must still map strictly inside (0, 1) — a
    +0.5ulp offset on a 24-bit uniform rounds the all-ones case to
    exactly 1.0 (round-to-even), making ndtri +inf and poisoning ~1/128
    of dimensions per shift at 2^17-point nets."""
    key = jax.random.key(3)
    shift = jax.random.bits(key, (4,), jnp.uint32)
    ones_after = (shift ^ jnp.uint32(0xFFFFFFFF))[None, :]
    zeros_after = shift[None, :]
    for base in (ones_after, zeros_after):
        u = np.asarray(qmc.rotate(base, key))
        assert np.all(u > 0.0) and np.all(u < 1.0), u
        assert np.all(np.isfinite(np.asarray(qmc.normals(base, key))))


def _euro_call_price(paths, r, k, t):
    disc = float(np.exp(-r * t))
    return disc * float(jnp.mean(jnp.maximum(paths[:, -1] - k, 0.0)))


def test_qmc_beats_mc_on_black_scholes_control():
    """European call under the degenerate rBergomi (eta->0: deterministic
    variance = GBM): at 256 paths, the QMC estimator's RMSE over independent
    randomizations must be well below plain MC's."""
    s0, k_strike, r, t, n_steps = 100.0, 100.0, 0.04, 0.25, 16
    dt = t / n_steps
    sigma = 0.3
    xi = sigma * sigma
    kwargs = dict(s0=s0, xi=xi, h=0.5, eta=1e-12, rho=0.0, r=r,
                  n_steps=n_steps, n_paths=256, dt=dt)
    truth = black_scholes(s0, k_strike, r, sigma, t, True)

    mc_err, qmc_err = [], []
    for seed in range(12):
        pm = rough_volatility.generate_paths(jax.random.key(seed), **kwargs)
        pq = rough_volatility.generate_paths_qmc(jax.random.key(seed),
                                                 **kwargs)
        mc_err.append(_euro_call_price(pm, r, k_strike, t) - truth)
        qmc_err.append(_euro_call_price(pq, r, k_strike, t) - truth)
    rmse_mc = float(np.sqrt(np.mean(np.square(mc_err))))
    rmse_qmc = float(np.sqrt(np.mean(np.square(qmc_err))))
    # Observed ~12x with the digital shift + PCA construction; require a
    # conservative 4x.
    assert rmse_qmc < rmse_mc / 4.0, (rmse_mc, rmse_qmc)
    # and unbiased: mean error within ~2 stderr of its own spread
    assert abs(np.mean(qmc_err)) < 2.5 * np.std(qmc_err) / np.sqrt(12) + 1e-3


def test_pipeline_qmc_flag(tmp_path, rng, monkeypatch):
    from tests.test_pipeline import make_option_csv, make_spot_csv, opt_row
    from montecarlooptionspricer_tpu.config import (MarketDefaults,
                                                    PipelineConfig,
                                                    PricingConfig)
    from montecarlooptionspricer_tpu.pipeline.driver import run_pipeline

    monkeypatch.chdir(tmp_path)
    finals = make_spot_csv("nasdaq_stock_data.csv", rng)
    s = round(finals["aapl"], 4)
    make_option_csv("option_data.csv",
                    [opt_row(option_type=0, dte=30.0, s=s, sdp=-0.02)])
    rc = run_pipeline(PipelineConfig(),
                      PricingConfig(rows_per_batch=2, qmc=True),
                      MarketDefaults())
    assert rc == 0
    with open("option_data_augmented.csv") as f:
        rows = f.read().strip().splitlines()
    vals = [float(v) for v in rows[1].split(",")[-6:]]
    assert all(np.isfinite(vals)) and any(abs(v) > 0 for v in vals[:4])


def test_streaming_qmc_beats_prng_and_is_unbiased():
    """StreamConfig(qmc=True): randomized-Sobol price Brownian with a
    per-chunk digital shift (engine.make_chunk_pathgen).  Across independent
    keys, the streamed LSM price's spread must be well below the
    pseudo-random generator's at the same path count, with agreeing means
    (unbiasedness).  VERDICT r01 item 7."""
    from montecarlooptionspricer_tpu.models import engine

    kw = dict(n_paths=1 << 15, n_steps=32, chunk_paths=1 << 13,
              pilot_paths=1 << 12, dt=1 / 252, poly_order=2,
              chunks_per_call=4, pathgen_impl="xla")
    vals = {}
    for use_qmc in (False, True):
        cfg = engine.StreamConfig(qmc=use_qmc, **kw)
        pricer = engine.StreamingPricer(100.0, 0.04, 0.1, 1.5, -0.4, 0.04,
                                        105.0, 32 / 252, False, cfg)
        vals[use_qmc] = np.array(
            [pricer.price(jax.random.key(i)) for i in range(8)])
    std_prng, std_qmc = vals[False].std(), vals[True].std()
    # Observed ~4x at this shape; require a conservative 1.8x.
    assert std_qmc < std_prng / 1.8, (std_prng, std_qmc)
    se = np.sqrt(std_prng ** 2 + std_qmc ** 2) / np.sqrt(8)
    assert abs(vals[True].mean() - vals[False].mean()) < 4 * se + 1e-3

needs_mesh = pytest.mark.skipif(
    jax.device_count() < 8,
    reason="needs the 8-device virtual CPU mesh (hardware runs see 1 chip)")


@needs_mesh
def test_streaming_qmc_mesh_matches_single_device():
    """qmc=True under an 8-device mesh: every shard digitally shifts the
    shared Sobol base with its own folded key, so shards stay independent
    and the mesh estimate must agree with the single-device one
    statistically."""
    from montecarlooptionspricer_tpu.models import engine
    from montecarlooptionspricer_tpu.parallel.mesh import make_mesh

    kw = dict(n_steps=16, chunk_paths=1 << 11, pilot_paths=1 << 11,
              dt=1 / 252, poly_order=2, chunks_per_call=2,
              pathgen_impl="xla", qmc=True)
    single = engine.StreamingPricer(
        100.0, 0.04, 0.1, 1.5, -0.4, 0.04, 105.0, 16 / 252, False,
        engine.StreamConfig(n_paths=1 << 14, **kw))
    mesh = make_mesh(8)
    sharded = engine.StreamingPricer(
        100.0, 0.04, 0.1, 1.5, -0.4, 0.04, 105.0, 16 / 252, False,
        engine.StreamConfig(n_paths=1 << 14, **kw), mesh=mesh)
    ps = single.price(jax.random.key(3))
    pm = sharded.price(jax.random.key(3))
    assert np.isfinite(pm)
    assert abs(ps - pm) < 0.05  # both ~5.0; QMC stderr here is ~0.005


def test_chain_qmc_runs_and_is_monotone():
    """StreamingChainPricer with qmc=True: shared QMC paths across the
    strip; put prices must rise in strike."""
    from montecarlooptionspricer_tpu.models import engine

    cfg = engine.StreamConfig(n_paths=1 << 13, n_steps=16,
                              chunk_paths=1 << 12, pilot_paths=1 << 11,
                              dt=1 / 252, chunks_per_call=2,
                              pathgen_impl="xla", qmc=True)
    chain = engine.StreamingChainPricer(
        100.0, 0.04, 0.1, 1.5, -0.4, 0.04, [95.0, 100.0, 105.0],
        16 / 252, False, cfg)
    prices = chain.price(jax.random.key(0))
    assert np.all(np.isfinite(prices))
    assert prices[0] < prices[1] < prices[2]


def test_chain_stderr_shows_qmc_variance_reduction():
    """Composition check: the chain's chunk-based stderr (with_stderr=True)
    must directly expose QMC's variance reduction — no repeated runs
    needed, since each chunk is an independent randomization."""
    from montecarlooptionspricer_tpu.models import engine

    kw = dict(n_paths=1 << 15, n_steps=32, chunk_paths=1 << 11,
              pilot_paths=1 << 12, dt=1 / 252, chunks_per_call=8,
              pathgen_impl="xla")
    ses = {}
    for use_qmc in (False, True):
        ch = engine.StreamingChainPricer(
            100.0, 0.04, 0.1, 1.5, -0.4, 0.04, [100.0, 105.0],
            32 / 252, False, engine.StreamConfig(qmc=use_qmc, **kw))
        _, se = ch.price(jax.random.key(2), with_stderr=True)
        ses[use_qmc] = se
    # QMC cuts the near-the-money stderr well below pseudo-random's.
    assert np.all(ses[True] < ses[False] / 1.5), ses


def test_streaming_qmc_fgn_high_vol_of_vol():
    """qmc_fgn=True extends the Sobol set to the fGN planes: on a
    HIGH-vol-of-vol market (eta=1.5, 32 steps) where the payoff variance
    rides the fGN and the Brownian-only default is ~neutral
    (VERIFY_r03 §28), the full-dimension set must cut the cross-key
    price spread materially vs plain MC."""
    import numpy as np
    from montecarlooptionspricer_tpu.models import engine

    kwargs = dict(s0=100.0, xi=0.04, h=0.1, eta=1.5, rho=-0.4, r=0.04,
                  strike=102.0, maturity=32 / 252.0, is_call=False)
    base = dict(n_paths=1 << 14, n_steps=32, chunk_paths=1 << 12,
                pilot_paths=1 << 12, chunks_per_call=4)

    def spread(**kw):
        p = engine.StreamingPricer(
            **kwargs, config=engine.StreamConfig(**base, **kw))
        vals = [p.price(jax.random.key(50 + s)) for s in range(8)]
        return float(np.std(np.asarray(vals), ddof=1))

    mc = spread()
    qf = spread(qmc=True, qmc_fgn=True)
    # Expected multi-x; 1.4x keeps the gate far from flaky at 8 keys.
    assert qf < mc / 1.4, (mc, qf)


def test_qmc_fgn_requires_qmc():
    from montecarlooptionspricer_tpu.models import engine

    with pytest.raises(ValueError, match="qmc_fgn"):
        engine.StreamConfig(n_paths=1 << 12, n_steps=32,
                            chunk_paths=1 << 10, qmc_fgn=True)


# --- round 4: QMC through the FUSED kernel (noise_input entries) ---------


def test_fused_qmc_selection():
    """StreamConfig(qmc=True, pathgen_impl="pallas") routes the priced
    stream through the fused kernel's noise_input entry where the
    single-tile kernel is eligible, and falls back to the XLA QMC stream
    elsewhere (VERDICT r03 item 1)."""
    from montecarlooptionspricer_tpu.models import engine

    base = dict(n_paths=1 << 13, n_steps=24, chunk_paths=1 << 12,
                pilot_paths=1 << 11)
    mk = lambda cfg: engine.StreamingPricer(
        100.0, 0.04, 0.2, 1.0, -0.4, 0.04, 102.0, 24 / 252, False, cfg)

    p = mk(engine.StreamConfig(**base, qmc=True, pathgen_impl="pallas"))
    assert p._qmc_fused and p._pathgen_impl == "xla"
    # CV composes (the kernel's with_cv lane).
    p_cv = mk(engine.StreamConfig(**base, qmc=True, pathgen_impl="pallas",
                                  control_variate=True))
    assert p_cv._qmc_fused
    # Ineligible configurations keep the XLA QMC stream.
    p_xla = mk(engine.StreamConfig(**base, qmc=True))
    assert not p_xla._qmc_fused
    p_nofuse = mk(engine.StreamConfig(**base, qmc=True,
                                      pathgen_impl="pallas",
                                      fuse_policy=False))
    assert not p_nofuse._qmc_fused

    ch = engine.StreamingChainPricer(
        100.0, 0.04, 0.2, 1.0, -0.4, 0.04, [98.0, 102.0], 24 / 252, False,
        engine.StreamConfig(**base, qmc=True, pathgen_impl="pallas"))
    assert ch._qmc_fused and ch._pathgen_impl == "xla"
    # Bucketed/serving chains trace their step count; the fused kernels
    # bake it — they stay on the XLA QMC stream by construction.
    ch_b = engine.StreamingChainPricer(
        100.0, 0.04, 0.2, 1.0, -0.4, 0.04, [98.0, 102.0], 24 / 252, False,
        engine.StreamConfig(**base, qmc=True, pathgen_impl="pallas"),
        bucketed=True)
    assert not ch_b._qmc_fused


def test_fused_qmc_noise_builder_layout():
    """_make_fused_qmc_noise: plane count by fGN form, zero pad columns on
    Sobol-derived planes, W plane = PCA'd Brownian increments / sqrt(dt)
    (the kernel multiplies sqrt(dt) back), per-key determinism."""
    from montecarlooptionspricer_tpu.models import engine
    from montecarlooptionspricer_tpu.ops import qmc as qmc_mod

    n_steps, s_pad, chunk, dt = 24, 128, 1 << 10, 1 / 252
    base = dict(n_paths=chunk, n_steps=n_steps, chunk_paths=chunk, qmc=True)

    for form, planes in (("chol", 2), ("spectral", 3)):
        cfg = engine.StreamConfig(**base)
        fn = engine._make_fused_qmc_noise(cfg, n_steps, s_pad, form, dt)
        z = np.asarray(fn(jax.random.key(3)))
        assert z.shape == (planes, chunk, s_pad)
        w = z[-1]
        assert np.all(w[:, n_steps:] == 0)          # Sobol plane pad zero
        # Valid W columns: unit-variance normals (QMC-accurate moments).
        assert abs(w[:, :n_steps].mean()) < 0.02
        assert abs(w[:, :n_steps].var() - 1.0) < 0.05
        # fGN planes are pseudo-random over the FULL s_pad (annihilated by
        # the matrices' zero pad rows, like the in-kernel draws).
        assert abs(z[0].var() - 1.0) < 0.1
        # Determinism per key.
        z2 = np.asarray(fn(jax.random.key(3)))
        np.testing.assert_array_equal(z, z2)
        assert np.any(np.asarray(fn(jax.random.key(4))) != z)

    # W reconstructs the PCA map exactly: rebuild from the same uniforms.
    cfg = engine.StreamConfig(**base)
    fn = engine._make_fused_qmc_noise(cfg, n_steps, s_pad, "chol", dt)
    z = np.asarray(fn(jax.random.key(9)))
    kq, _ = jax.random.split(jax.random.key(9))
    zq = np.asarray(qmc_mod.normals(
        jnp.asarray(qmc_mod.sobol_base(chunk, n_steps)), kq))
    pca_t = np.asarray(qmc_mod.brownian_pca_matrix(n_steps, dt)).T
    want = (zq @ pca_t) / np.sqrt(dt)
    np.testing.assert_allclose(z[-1][:, :n_steps], want, rtol=3e-5,
                               atol=1e-6)

    # qmc_fgn: the fGN plane(s) come from the extended Sobol set too.
    cfg_f = engine.StreamConfig(**base, qmc_fgn=True)
    for form, planes in (("chol", 2), ("spectral", 3)):
        zf = np.asarray(engine._make_fused_qmc_noise(
            cfg_f, n_steps, s_pad, form, dt)(jax.random.key(5)))
        for p in range(planes):
            assert np.all(zf[p][:, n_steps:] == 0)


def test_fused_qmc_kernel_unbiased_and_beats_prng_interpret(rng):
    """The fused priced kernel fed QMC noise planes (the engine's
    qmc_fused stream, CPU interpreter): chunk estimates across digital
    shifts must agree in mean with pseudo-random noise through the SAME
    kernel (unbiasedness) at materially lower spread (the variance win
    composing with the fused path — VERDICT r03 item 1)."""
    from montecarlooptionspricer_tpu.models import engine, pathgen_pallas
    from montecarlooptionspricer_tpu.models.lsm import lsm_fit

    s0, xi, h, eta, rho, r = 100.0, 0.04, 0.1, 0.8, -0.4, 0.04
    n_steps, chunk, dt = 32, 1 << 10, 1 / 252.0
    strike, maturity, is_call = 102.0, 32 / 252.0, False

    pilot = engine.make_chunk_pathgen(s0, xi, h, eta, rho, r, n_steps, dt,
                                      1 << 11)(jax.random.key(0))
    _, fits = lsm_fit(pilot, r, strike, maturity, dt, is_call, 2)
    rows = pathgen_pallas.log_boundary_rows(pathgen_pallas.boundary_rows(
        fits, r, strike, maturity, dt, n_steps, is_call))

    priced, s_pad = pathgen_pallas.make_pallas_priced_chunk(
        s0, xi, h, eta, rho, r, strike, maturity, dt, n_steps, chunk,
        block_paths=256, is_call=is_call, interpret=True, noise_input=True,
        fgn_form="chol", policy_form="boundary")
    cfg = engine.StreamConfig(n_paths=chunk, n_steps=n_steps,
                              chunk_paths=chunk, qmc=True)
    noise_fn = engine._make_fused_qmc_noise(cfg, n_steps, s_pad, "chol", dt)

    qmc_vals, prng_vals = [], []
    for i in range(8):
        k = jax.random.key(100 + i)
        qmc_vals.append(float(priced(noise_fn(k), rows)) / chunk)
        zp = jax.random.normal(k, (2, chunk, s_pad), jnp.float32)
        prng_vals.append(float(priced(zp, rows)) / chunk)
    qmc_vals, prng_vals = np.asarray(qmc_vals), np.asarray(prng_vals)
    s_q, s_p = qmc_vals.std(ddof=1), prng_vals.std(ddof=1)
    assert s_q < s_p / 1.5, (s_p, s_q)
    se = np.sqrt(s_q ** 2 + s_p ** 2) / np.sqrt(8)
    assert abs(qmc_vals.mean() - prng_vals.mean()) < 4 * se + 1e-3


def test_fused_qmc_streaming_price_on_chip():
    """End-to-end StreamConfig(qmc=True, pathgen_impl='pallas') on the
    real TPU: agrees with the XLA QMC stream within MC error, and its
    chunk stderr shows the QMC reduction vs the plain fused kernel."""
    from montecarlooptionspricer_tpu.models import engine

    if jax.devices()[0].platform != "tpu":
        pytest.skip("requires a real TPU (fused kernels compile on-chip)")
    base = dict(n_paths=1 << 15, n_steps=32, chunk_paths=1 << 12,
                pilot_paths=1 << 12, chunks_per_call=4)
    kwargs = dict(s0=100.0, xi=0.04, h=0.1, eta=1.5, rho=-0.4, r=0.04,
                  strike=102.0, maturity=32 / 252.0, is_call=False)

    def run(**kw):
        p = engine.StreamingPricer(
            **kwargs, config=engine.StreamConfig(**base, **kw))
        return p, p.price(jax.random.key(7), with_stderr=True)

    pf, (v_fused, se_fused) = run(qmc=True, pathgen_impl="pallas")
    assert pf._qmc_fused
    px, (v_xla, se_xla) = run(qmc=True)
    pp, (v_plain, se_plain) = run(pathgen_impl="pallas")
    se = np.hypot(se_fused, se_xla)
    assert abs(v_fused - v_xla) < 4 * se + 1e-3
    assert abs(v_fused - v_plain) < 4 * np.hypot(se_fused, se_plain) + 5e-2
    # The variance win must ride the fused path.
    assert se_fused < se_plain / 1.3, (se_plain, se_fused)


def test_fused_qmc_selection_long_horizon():
    """Past the single-tile step cap, QMC keeps a fused noise-in kernel:
    the chol slab by default, the factored DFT for spectral configs; past
    every noise-in budget it falls back (loudly) to the XLA stream
    (VERDICT r04 item 4)."""
    from montecarlooptionspricer_tpu.models import (engine,
                                                    pathgen_pallas_factored,
                                                    pathgen_pallas_tiled)

    base = dict(n_paths=1 << 12, n_steps=1100, chunk_paths=1 << 11,
                pilot_paths=1 << 10)
    mk = lambda **kw: engine.StreamingPricer(
        100.0, 0.04, 0.2, 1.0, -0.4, 0.04, 102.0,
        kw.get("n_steps", 1100) / 252, False,
        engine.StreamConfig(**{**base, **kw}, qmc=True,
                            pathgen_impl="pallas"))

    p = mk()
    assert p._qmc_fused and p._qmc_tiled is pathgen_pallas_tiled
    p_sp = mk(fgn_form="spectral")
    assert p_sp._qmc_fused and p_sp._qmc_tiled is pathgen_pallas_factored
    # CV composes on the long-horizon noise-in kernels too.
    p_cv = mk(control_variate=True)
    assert p_cv._qmc_fused and p_cv._qmc_tiled is pathgen_pallas_tiled
    # Past every noise-in VMEM budget: XLA fallback, loudly not-fused.
    p_far = mk(n_steps=5000)
    assert not p_far._qmc_fused and p_far._qmc_tiled is None


@pytest.mark.slow
def test_fused_qmc_tiled_noise_planes_price_interpret(rng):
    """The engine's long-horizon QMC stream, on the CPU interpreter: the
    SAME _make_fused_qmc_noise planes produce, through the slab noise-in
    priced kernel, exactly the policy value the XLA generator assigns to
    those planes — so qmc=True past the single-tile cap prices the same
    estimator at fused throughput."""
    from montecarlooptionspricer_tpu.models import (engine, pathgen_pallas,
                                                    pathgen_pallas_tiled)
    from montecarlooptionspricer_tpu.models.lsm import lsm_fit
    from test_pallas import KW, xla_paths_from_noise

    # xla_paths_from_noise bakes the KW market — both sides must use it.
    s0, xi, h, eta, rho, r = (KW["s0"], KW["xi"], KW["h"], KW["eta"],
                              KW["rho"], KW["r"])
    n_steps, chunk, dt = 200, 128, 1 / 252.0
    strike, maturity, is_call = 97.0, 200 / 252.0, False

    pilot = engine.make_chunk_pathgen(s0, xi, h, eta, rho, r, n_steps, dt,
                                      1 << 11)(jax.random.key(0))
    _, fits = lsm_fit(pilot, r, strike, maturity, dt, is_call, 2)
    rows = pathgen_pallas.policy_rows(fits, r, strike, maturity, dt,
                                      n_steps, is_call)

    priced, s_pad = pathgen_pallas_tiled.make_tiled_priced_chunk(
        s0, xi, h, eta, rho, r, strike, maturity, dt, n_steps, chunk,
        block_paths=64, is_call=is_call, interpret=True, noise_input=True,
        fgn_form="spectral")
    cfg = engine.StreamConfig(n_paths=chunk, n_steps=n_steps,
                              chunk_paths=chunk, qmc=True)
    noise_fn = engine._make_fused_qmc_noise(cfg, n_steps, s_pad,
                                            "spectral", dt)
    noise = noise_fn(jax.random.key(7))
    got = float(priced(noise, rows))           # chunk SUM, like lsm_policy

    paths = xla_paths_from_noise(np.asarray(noise), n_steps)
    want, _ = engine.lsm_policy_value(jnp.asarray(paths), fits, r, strike,
                                      maturity, dt, is_call)
    np.testing.assert_allclose(got, float(want), rtol=2e-4)


@pytest.mark.slow
def test_fused_qmc_factored_noise_planes_price_interpret(rng):
    """Factored-DFT analogue: 'factored'-layout QMC planes (m2-wide
    frequency fGN draws + PCA Brownian) price identically through the
    factored noise-in priced kernel and the factored noise-in PATHGEN +
    XLA policy evaluation."""
    from montecarlooptionspricer_tpu.models import (engine, pathgen_pallas,
                                                    pathgen_pallas_factored)
    from montecarlooptionspricer_tpu.models.lsm import lsm_fit
    from montecarlooptionspricer_tpu.ops.fgn import next_pow2

    s0, xi, h, eta, rho, r = 100.0, 0.04, 0.2, 1.0, -0.4, 0.04
    n_steps, chunk, dt = 200, 128, 1 / 252.0
    strike, maturity, is_call = 97.0, 200 / 252.0, False
    m2 = next_pow2(n_steps)

    pilot = engine.make_chunk_pathgen(s0, xi, h, eta, rho, r, n_steps, dt,
                                      1 << 11)(jax.random.key(0))
    _, fits = lsm_fit(pilot, r, strike, maturity, dt, is_call, 2)
    rows = pathgen_pallas.policy_rows(fits, r, strike, maturity, dt,
                                      n_steps, is_call)

    cfg = engine.StreamConfig(n_paths=chunk, n_steps=n_steps,
                              chunk_paths=chunk, qmc=True)
    noise_fn = engine._make_fused_qmc_noise(cfg, n_steps, m2,
                                            "factored", dt)
    noise = noise_fn(jax.random.key(11))
    assert noise.shape == (3, chunk, m2)

    priced, _ = pathgen_pallas_factored.make_factored_priced_chunk(
        s0, xi, h, eta, rho, r, strike, maturity, dt, n_steps, chunk,
        block_paths=64, is_call=is_call, interpret=True, noise_input=True)
    got = float(priced(noise, rows))           # chunk SUM, like lsm_policy

    gen, _ = pathgen_pallas_factored.make_factored_pathgen(
        s0, xi, h, eta, rho, r, n_steps, dt, chunk, block_paths=64,
        interpret=True, noise_input=True)
    paths = gen(noise)
    want, _ = engine.lsm_policy_value(paths, fits, r, strike, maturity,
                                      dt, is_call)
    np.testing.assert_allclose(got, float(want), rtol=2e-4)


def test_truncated_qmc_dim_still_beats_prng():
    """Past the qmc_dim truncation point (n_steps > qmc_dim) the Sobol
    set covers only the LEADING eigen-ordered PCA components and the
    tail is PRNG-filled — the variance win must survive, because the
    truncated components carry almost none of the exploitable variance.
    Also pins the truncation plumbing: n_steps <= qmc_dim is bit-for-bit
    the untruncated set (same sobol_base shape)."""
    from montecarlooptionspricer_tpu.models import engine

    kw = dict(n_paths=1 << 13, n_steps=96, chunk_paths=1 << 12,
              pilot_paths=1 << 11, dt=1 / 252, poly_order=2,
              chunks_per_call=2, pathgen_impl="xla")
    vals = {}
    for name, cfg_kw in (("prng", dict()),
                         ("qmc_trunc", dict(qmc=True, qmc_dim=16))):
        cfg = engine.StreamConfig(**kw, **cfg_kw)
        pricer = engine.StreamingPricer(100.0, 0.04, 0.1, 1.5, -0.4, 0.04,
                                        105.0, 96 / 252, False, cfg)
        vals[name] = np.array(
            [pricer.price(jax.random.key(i)) for i in range(8)])
    std_prng, std_q = vals["prng"].std(), vals["qmc_trunc"].std()
    # 16 of 96 PCA components Sobol'd: observed ~2.5-4x spread reduction;
    # require a conservative 1.5x.
    assert std_q < std_prng / 1.5, (std_prng, std_q)
    se = np.sqrt(std_prng ** 2 + std_q ** 2) / np.sqrt(8)
    assert abs(vals["qmc_trunc"].mean()
               - vals["prng"].mean()) < 4 * se + 1e-3

    # Untruncated when n_steps <= qmc_dim: the Sobol base is full-width.
    from montecarlooptionspricer_tpu.ops import qmc as qmc_mod
    assert qmc_mod.sobol_base(1 << 12, 96).shape == (1 << 12, 96)


def test_fused_qmc_explicit_impl_rejections():
    """A/B integrity on the QMC noise-in path (review finding, r05): an
    EXPLICITLY requested long-horizon impl that cannot hold the injected
    noise resident must raise, never silently measure the XLA
    generator; and interleave/staggered configs that resolve off the
    single-tile kernel reject at construction."""
    from montecarlooptionspricer_tpu.models import engine

    base = dict(n_paths=1 << 12, chunk_paths=1 << 11, pilot_paths=1 << 10,
                qmc=True, pathgen_impl="pallas")
    with pytest.raises(ValueError, match="factored"):
        engine.StreamingPricer(
            100.0, 0.04, 0.2, 1.0, -0.4, 0.04, 102.0, 5000 / 252, False,
            engine.StreamConfig(n_steps=5000, tiled_impl="factored",
                                **base))
    with pytest.raises(ValueError, match="single-tile"):
        engine.StreamingPricer(
            100.0, 0.04, 0.2, 1.0, -0.4, 0.04, 102.0, 1100 / 252, False,
            engine.StreamConfig(n_steps=1100, pallas_interleave=2,
                                **base))
