from .payoff import payoff  # noqa: F401
from .regression import PolyFit, eval_poly, fit_poly_masked, poly_basis  # noqa: F401
from .reductions import global_mean, masked_mean, psum_if  # noqa: F401
