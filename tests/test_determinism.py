"""The rebuild's "race sanitizer" (SURVEY.md section 5.2): the reference
contains a real data race (shared mt19937 mutated across the OpenMP team,
BranchingProcessPricer.cpp:84-108) and irreproducible seeding
(RoughVolatility.cpp:239-254).  Here every layer must be bitwise
deterministic per seed — any nondeterminism (a race, an unseeded source, a
nondeterministic reduction) fails these tests."""

import numpy as np

import jax

from montecarlooptionspricer_tpu.models import rough_volatility
from montecarlooptionspricer_tpu.models.pricing import PricerSpec, price_all


def _prices(seed):
    key = jax.random.key(seed)
    kp, kr = jax.random.split(key)
    paths = rough_volatility.generate_paths(kp, 100.0, 0.04, 0.15, 1.2,
                                            -0.35, 0.04, 32, 512)
    spec = PricerSpec(strike=101.0, maturity=32 / 252.0, is_call=False,
                      sigma=0.25)
    out = price_all(paths, spec, kr)
    return np.asarray([float(out[k]) for k in
                       ("asymptotic", "branching", "lsm", "martingale")])


def test_all_pricers_bitwise_deterministic():
    a, b = _prices(7), _prices(7)
    assert np.array_equal(a, b), (a, b)
    assert np.all(np.isfinite(a))


def test_different_seeds_differ():
    assert not np.array_equal(_prices(7), _prices(8))


def test_qmc_pathgen_deterministic():
    p1 = rough_volatility.generate_paths_qmc(jax.random.key(3), 100.0, 0.04,
                                             0.2, 1.0, -0.4, 0.04, 16, 128)
    p2 = rough_volatility.generate_paths_qmc(jax.random.key(3), 100.0, 0.04,
                                             0.2, 1.0, -0.4, 0.04, 16, 128)
    assert np.array_equal(np.asarray(p1), np.asarray(p2))
