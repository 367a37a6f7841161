"""Compile-shape quantization: padded path generation + traced-horizon
pricers must reproduce the exact-shape program's semantics.

The pipeline buckets rows by (n_pad, m1) = (next_pow2(steps),
next_pow2(steps+1)); n_pad IS the reference's circular-convolution length
M2, so padding is exact, not approximate.  These tests pin that claim:

  * padded path generation == exact generation on matched injected noise;
  * each pricer on a padded (flat-tail) block with the traced horizon ==
    the same pricer on the exact-shape block;
  * the pipeline driver compiles one program per bucket, not per dte.
"""

import numpy as np
import jax
import pytest
import jax.numpy as jnp

from montecarlooptionspricer_tpu.models import rough_volatility as rv
from montecarlooptionspricer_tpu.models import asymptotic, branching, lsm, martingale
from montecarlooptionspricer_tpu.ops import rng as rng_ops
from montecarlooptionspricer_tpu.pipeline.driver import bucket_key

KW = dict(s0=100.0, xi=0.05, h=0.17, eta=1.3, rho=-0.5, r=0.04)


def _pad_flat(paths, n_pad):
    """Pad [N, n+1] paths to [N, n_pad+1] by repeating the last column —
    the flat tail generate_paths_bucketed produces."""
    n = paths.shape[1] - 1
    tail = jnp.repeat(paths[:, -1:], n_pad - n, axis=1)
    return jnp.concatenate([paths, tail], axis=1)


def test_bucket_key_values():
    assert bucket_key(37) == (64, 64)
    assert bucket_key(64) == (64, 128)   # pow2 edge: own m1 bucket
    assert bucket_key(65) == (128, 128)
    assert bucket_key(1825) == (2048, 2048)


def test_bucketed_pathgen_pow2_bitwise():
    # When n_steps is exactly a power of two the padded program IS the
    # exact program (same shapes, same FFT lengths, same draw structure).
    n = 64
    a = rv.generate_paths(jax.random.key(3), **KW, n_steps=n, n_paths=32)
    b = rv.generate_paths_bucketed(jax.random.key(3), **KW, n_steps=n,
                                   n_pad=64, m1=128, n_paths=32)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bucketed_pathgen_matches_exact_via_seam(rng):
    # Non-pow2 horizon: inject the same noise through both programs; the
    # padded columns of the bucketed output must be flat and the live
    # columns must match the exact program.
    n, n_pad, m1, n_paths = 50, 64, 64, 24
    zc = rng.normal(size=(2, n_paths, n_pad)).astype(np.float32)
    w = rng.normal(size=(n_paths, n_pad)).astype(np.float32)

    orig_cn, orig_n = rng_ops.complex_normal, rng_ops.normal
    try:
        rng_ops.complex_normal = lambda key, shape, dtype=jnp.float32: (
            jax.lax.complex(jnp.asarray(zc[0][:, :shape[1]]),
                            jnp.asarray(zc[1][:, :shape[1]])))
        rng_ops.normal = lambda key, shape, dtype=jnp.float32: (
            jnp.asarray(w[:, :shape[1]]))
        exact = rv.generate_paths(jax.random.key(0), **KW, n_steps=n,
                                  n_paths=n_paths)
        padded = rv.generate_paths_bucketed(
            jax.random.key(0), **KW, n_steps=n, n_pad=n_pad, m1=m1,
            n_paths=n_paths)
    finally:
        rng_ops.complex_normal, rng_ops.normal = orig_cn, orig_n

    np.testing.assert_allclose(np.asarray(padded[:, : n + 1]),
                               np.asarray(exact), rtol=3e-5, atol=1e-4)
    # flat tail past the true horizon
    np.testing.assert_array_equal(
        np.asarray(padded[:, n + 1:]),
        np.asarray(jnp.repeat(padded[:, n:n + 1], n_pad - n, axis=1)))


@pytest.mark.slow
def test_pricers_pad_exact(rng):
    """Each estimator on a flat-padded block with the traced horizon ==
    the estimator on the exact block (same values, not just statistics)."""
    n, n_pad = 50, 64
    kw = dict(r=0.04, strike=102.0, maturity=n / 252.0, dt=1 / 252.0)
    paths = rv.generate_paths(jax.random.key(7), **KW, n_steps=n,
                              n_paths=512)
    padded = _pad_flat(paths, n_pad)

    for is_call in (False, True):
        a = lsm.lsm_price(paths, is_call=is_call, **kw)
        b = lsm.lsm_price(padded, is_call=is_call, **kw, n_steps=n)
        np.testing.assert_allclose(float(a), float(b), rtol=1e-6)

        a = martingale.martingale_price(paths, is_call=is_call, **kw)
        b = martingale.martingale_price(padded, is_call=is_call, **kw,
                                        n_steps=n)
        np.testing.assert_allclose(float(a), float(b), rtol=1e-6)

        a = asymptotic.asymptotic_price(paths, is_call=is_call, sigma=0.25,
                                        dividend=0.08, **kw)
        b = asymptotic.asymptotic_price(padded, is_call=is_call, sigma=0.25,
                                        dividend=0.08, **kw)
        np.testing.assert_allclose(float(a), float(b), rtol=1e-6)

        a = branching.lower_bound(paths, is_call=is_call,
                                  exercise_times=jnp.arange(n), **kw)
        b = branching.lower_bound(padded, is_call=is_call,
                                  exercise_times=jnp.arange(n_pad),
                                  n_steps=n, **kw)
        np.testing.assert_allclose(float(a), float(b), rtol=1e-6)

        # Upper bound: inject identical branch indices for the shared times.
        rp = rng.integers(0, 512, size=(512, n_pad, 10))
        a = branching.upper_bound(paths, is_call=is_call, num_branches=10,
                                  exercise_times=jnp.arange(n), key=None,
                                  rp=jnp.asarray(rp[:, :n]), **kw)
        b = branching.upper_bound(padded, is_call=is_call, num_branches=10,
                                  exercise_times=jnp.arange(n_pad), key=None,
                                  rp=jnp.asarray(rp), n_steps=n, **kw)
        np.testing.assert_allclose(float(a), float(b), rtol=1e-6)


@pytest.mark.slow
def test_batched_pricer_compiles_per_bucket_not_per_dte():
    """50 distinct dte values -> a handful of programs (the VERDICT r01
    item 3 'done' criterion), with mixed step counts priced in one batch."""
    from montecarlooptionspricer_tpu.config import MarketDefaults, PricingConfig
    from montecarlooptionspricer_tpu.pipeline.driver import BatchedPricer, RowTask

    market = MarketDefaults()
    pricing = PricingConfig(num_paths=64, rows_per_batch=16)
    pricer = BatchedPricer(pricing, market)

    # 50 distinct horizons spanning 9..345 steps, none an exact pow2.
    steps = sorted({int(9 + i * 6.85) for i in range(50)} - {16, 32, 64, 128, 256})
    assert len(steps) >= 48
    tasks = [RowTask(index=i, line="", n_steps=s, is_call=bool(i % 2),
                     s0=100.0, xi=0.05, h=0.15, eta=1.2, rho=-0.4,
                     strike=100.0 + (i % 7), maturity=s / 252.0, sigma=0.22,
                     dividend=0.08, twenty_day_vol=0.2,
                     twenty_day_momentum=0.01)
             for i, s in enumerate(steps)]

    by_bucket = {}
    for t in tasks:
        by_bucket.setdefault(bucket_key(t.n_steps), []).append(t)
    assert len(by_bucket) <= 7, sorted(by_bucket)

    out = []
    for _, group in sorted(by_bucket.items()):
        for i in range(0, len(group), pricing.rows_per_batch):
            vals = pricer.price(group[i:i + pricing.rows_per_batch], seed())
            out.append(vals)
    out = np.concatenate(out)
    assert out.shape == (len(tasks), 4)
    assert np.all(np.isfinite(out))
    assert len(pricer._cache) <= 7


def seed() -> int:
    return 1234


def test_tail_batch_size_quantization():
    """Partial tails compile at pow2 sizes with a floor of 8 (VERDICT r02
    weak #6: a 1-row long-dte bucket must not burn rows_per_batch rows of
    device work), full chunks at rows_per_batch."""
    from montecarlooptionspricer_tpu.config import MarketDefaults, PricingConfig
    from montecarlooptionspricer_tpu.pipeline.driver import BatchedPricer

    p = BatchedPricer(PricingConfig(rows_per_batch=64), MarketDefaults())
    assert p._batch_size(64) == 64
    assert p._batch_size(70) == 64   # caller chunks at 64; defensive cap
    assert p._batch_size(33) == 64
    assert p._batch_size(17) == 32
    assert p._batch_size(9) == 16
    assert p._batch_size(8) == 8
    assert p._batch_size(1) == 8     # floor: tail programs stay >= 8 rows
    tiny = BatchedPricer(PricingConfig(rows_per_batch=4), MarketDefaults())
    assert tiny._batch_size(1) == 4  # floor never exceeds rows_per_batch

    class _FakeMesh:  # _batch_size consults only .size
        size = 8

    # EVERY batch rounds to a device-count multiple under a mesh —
    # including full chunks (rows_per_batch is a CLI flag and need not
    # divide the mesh) and mesh-rounded tails.
    pm = BatchedPricer(PricingConfig(rows_per_batch=100), MarketDefaults(),
                       mesh=_FakeMesh())
    assert pm._batch_size(100) == 104
    assert pm._batch_size(9) == 16
    assert pm._batch_size(3) == 8


@pytest.mark.slow
def test_partial_tail_small_program_matches_full():
    """A 3-row tail prices through an 8-row program (not rows_per_batch)
    and agrees row-for-row with the full-batch program (per-row keys are
    index-derived, so batch size must not change any row's price)."""
    from montecarlooptionspricer_tpu.config import MarketDefaults, PricingConfig
    from montecarlooptionspricer_tpu.pipeline.driver import BatchedPricer, RowTask

    pricing = PricingConfig(num_paths=64, rows_per_batch=16)
    pricer = BatchedPricer(pricing, MarketDefaults())
    tasks = [RowTask(index=i, line="", n_steps=40 + i, is_call=bool(i % 2),
                     s0=100.0, xi=0.05, h=0.15, eta=1.2, rho=-0.4,
                     strike=100.0 + i, maturity=(40 + i) / 252.0, sigma=0.22,
                     dividend=0.08, twenty_day_vol=0.2,
                     twenty_day_momentum=0.01)
             for i in range(16)]
    full = pricer.price(tasks, seed())
    tail = pricer.price(tasks[:3], seed())
    # One cached closure per (n_pad, m1) bucket; the 3-row tail still
    # prices through an 8-row PROGRAM (jit specializes per padded shape).
    assert len(pricer._cache) == 1
    assert pricer._batch_size(3) == 8
    np.testing.assert_allclose(tail, full[:3], rtol=2e-5, atol=1e-5)


@pytest.mark.slow
def test_bucketed_price_statistically_matches_exact():
    """One mid-bucket row priced with the quantized program agrees with the
    exact-shape program within MC error at a moderate path count."""
    from montecarlooptionspricer_tpu.models.pricing import PricerSpec, price_all

    n, n_pad, m1, n_paths = 50, 64, 64, 4096
    spec = PricerSpec(r=0.04, strike=103.0, maturity=n / 252.0,
                      dt=1 / 252.0, is_call=False, sigma=0.22, dividend=0.08)

    def run(gen, n_steps_arg):
        paths = gen(jax.random.key(11))
        out = price_all(paths, spec, jax.random.key(12),
                        n_steps=n_steps_arg)
        return np.asarray([float(out[k]) for k in
                           ("asymptotic", "branching", "lsm", "martingale")])

    exact = run(lambda k: rv.generate_paths(k, **KW, n_steps=n,
                                            n_paths=n_paths), None)
    padded = run(lambda k: rv.generate_paths_bucketed(
        k, **KW, n_steps=n, n_pad=n_pad, m1=m1, n_paths=n_paths), n)
    # Same estimator, same distribution, different draws: agreement within
    # a generous MC band at 4096 paths.
    np.testing.assert_allclose(padded, exact, rtol=0.12, atol=0.25)
