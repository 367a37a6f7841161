"""montecarlooptionspricer_tpu — a TPU-native (JAX/XLA/Pallas/pjit) rebuild of
the hybrid Monte Carlo American-option pricing framework
bcosm/MonteCarloOptionsPricer.

Layer map (mirrors SURVEY.md section 1, rebuilt TPU-first):
  ops/       L0 numerics: payoff, counter-based RNG, spectral fGN, masked
             polynomial regression, parameter estimators, mesh reductions.
  models/    L1 path generation (rBergomi, GBM — batched, scan/cumsum, Pallas
             fast path) and L2 pricing estimators (asymptotic, branching,
             LSM, martingale) as pure functions over [paths, steps+1] arrays.
  parallel/  mesh construction + shard_map wrappers putting `paths`/rows on
             the data axis with psum reductions.
  nn/        Flax Bayesian meta-model (MC-dropout + RealNVP + MDN +
             attention), optax trainer, orbax checkpointing.
  pipeline/  L3 CSV ingest, feature engineering, batched pricing driver,
             ordered writer, watchdog/heartbeat/signals.
  cli/       PredictionGen / TrainNN / EvaluateNN equivalents.
"""

__version__ = "0.1.0"

import jax as _jax

# Supported jax window. The shard_map vma API (pvary/pcast) and the Mosaic
# Pallas lowerings this package relies on shift across minor releases; fail
# loudly on an untested bump instead of deep inside a trace.
_JAX_MIN = (0, 7)
_JAX_MAX_EXCL = (0, 10)
_v = tuple(int(p) for p in _jax.__version__.split(".")[:2])
if not (_JAX_MIN <= _v < _JAX_MAX_EXCL):  # pragma: no cover
    raise ImportError(
        f"montecarlooptionspricer_tpu supports jax >={_JAX_MIN} <{_JAX_MAX_EXCL}; "
        f"found {_jax.__version__}. Re-run the numerical test suite before "
        "widening this window.")

from . import config  # noqa: F401
