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
