from .bnn import BayesianMetaModelNN, RealNVPFlow, split_mdn  # noqa: F401
from .trainer import BayesianTrainer, mdn_nll, warmup_mse  # noqa: F401
from . import checkpoint  # noqa: F401
