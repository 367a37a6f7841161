"""Configuration layer for the TPU Monte Carlo options pricing framework.

The reference implementation (bcosm/MonteCarloOptionsPricer) has no config
system: every knob is a hard-coded constant scattered over the C++ sources
(src/core/PredictionGen.cpp:700-719, 788-791; src/core/TrainNN.cpp:57-63;
src/models/RoughVolatility.cpp:321-326).  This module collects those constants
into dataclasses, preserving the reference values as defaults (the "parity
configuration") while making everything overridable from the CLIs.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class MarketDefaults:
    """Hard-coded market constants of the reference pipeline.

    r: risk-free rate (PredictionGen.cpp:700, RoughVolatility.cpp:326).
    dt: time step in years (PredictionGen.cpp:702).
    dividend: default dividend yield when the CSV cell fails to parse
        (PredictionGen.cpp:706-715).
    trading_days: 252 steps/year implied by dt and the step count formula
        ``floor(maturity * 252)`` (PredictionGen.cpp:718).
    calendar_days: 365, used to convert DTE to maturity
        (PredictionGen.cpp:701).
    """

    r: float = 0.04
    dt: float = 1.0 / 252.0
    dividend: float = 0.08
    trading_days: float = 252.0
    calendar_days: float = 365.0


@dataclasses.dataclass(frozen=True)
class PricingConfig:
    """Per-row Monte Carlo pricing configuration.

    num_paths: paths per option row (PredictionGen.cpp:719).
    num_branches: sub-simulation branches of the branching-process upper
        bound (PredictionGen.cpp:789).
    poly_order: polynomial basis order for LSM and martingale regression
        (PredictionGen.cpp:790-791).
    max_iterations: martingale primal/dual iterations
        (MartingaleOptimizationPricer.h:18).
    max_history_days: cap on the spot-history window (PredictionGen.cpp:256).
    """

    num_paths: int = 250
    num_branches: int = 10
    poly_order: int = 2
    max_iterations: int = 5
    max_history_days: int = 1825
    seed: int = 0
    # TPU execution knobs (no reference equivalent; the reference is
    # single-process OpenMP).
    rows_per_batch: int = 64
    dtype: str = "float32"
    # Randomized quasi-Monte Carlo driver noise (ops.qmc): several-fold
    # lower price RMSE at the 250-path budget.  Off by default — the parity
    # configuration is plain pseudo-random MC like the reference.
    qmc: bool = False
    # Antithetic pairing: half the draws per row, pairs (Z, W) / (-Z, -W)
    # with one shared fGN transform (rough_volatility.
    # generate_paths_bucketed) — the classic variance reduction at the
    # 250-path row budget.  Off by default (parity estimator is plain
    # MC); incompatible with qmc.
    antithetic: bool = False

    def __post_init__(self):
        if self.qmc and self.antithetic:
            raise ValueError("antithetic is incompatible with qmc (the "
                             "Sobol set has its own stratification)")
        if self.antithetic and self.num_paths % 2:
            raise ValueError("antithetic needs an even num_paths")


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """BNN training configuration (TrainNN.cpp:57-63, BayesianNN.cpp:227-231).

    The two-phase loss schedule (MSE for epochs <= warmup_epochs, MDN NLL
    after) mirrors BayesianNN.cpp:449-478; grad clipping and L2 mirror
    BayesianNN.cpp:481-499.
    """

    input_dim: int = 17
    hidden_dim: int = 64  # accepted for API parity; the funnel widths are fixed
    num_epochs: int = 100
    batch_size: int = 256
    learning_rate: float = 3e-4
    warmup_epochs: int = 5
    l2_lambda: float = 1e-7
    grad_clip_norm: float = 1.0
    num_mixtures: int = 5
    seed: int = 0
    checkpoint_path: str = "checkpoint"
    model_path: str = "bayesian_model"


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    """BNN evaluation configuration (EvaluateNN.cpp:36-37)."""

    n_samples: int = 100
    stds: float = 3.0


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """File names and failure-containment knobs of the PredictionGen pipeline
    (PredictionGen.cpp:398-440, 506-528)."""

    option_csv: str = "option_data.csv"
    spot_csv: str = "nasdaq_stock_data.csv"
    output_csv: str = "option_data_augmented.csv"
    error_log: str = "error_log.txt"
    diagnostic_csv: str = "spot_data_diagnostic.csv"
    backup_suffix: str = ".backup.csv"
    # Health-check thresholds (PredictionGen.cpp:56-61): 8 GiB RSS, 1e8 errors.
    max_memory_bytes: int = 8 * 1024**3
    max_errors: int = 100_000_000
    health_check_interval_s: float = 5.0
    keep_alive_interval_s: float = 30.0


# Input feature schema of the NN stage (TrainNN.cpp:30-37, EvaluateNN.cpp:15-21).
INPUT_COLUMNS = (
    "underlying_last", "dte", "strike_distance_pct", "delta", "gamma",
    "vega", "theta", "rho", "iv", "volume", "dividend",
    "asymptotic_prediction", "branching_prediction", "lsm_prediction",
    "martingale_prediction", "twenty_day_vol", "twenty_day_momentum",
)
TARGET_COLUMN = "last"

# Columns appended to the option CSV by the pricing pipeline
# (PredictionGen.cpp:471-477).
AUGMENTED_COLUMNS = (
    "asymptotic_prediction", "branching_prediction", "lsm_prediction",
    "martingale_prediction", "twenty_day_vol", "twenty_day_momentum",
)
