from .asymptotic import asymptotic_price  # noqa: F401
from .branching import branching_price, lower_bound, upper_bound  # noqa: F401
from .closed_form import binomial_american, black_scholes, implied_vol  # noqa: F401
from .greeks import european_greeks, lsm_greeks  # noqa: F401
from .lsm import lsm_price  # noqa: F401
from .martingale import martingale_price  # noqa: F401
from . import gbm, rough_volatility  # noqa: F401
