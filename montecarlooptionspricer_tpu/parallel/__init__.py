from .mesh import (DATA_AXIS, data_sharding, init_distributed, make_mesh,  # noqa: F401
                   replicated)
from .sharded import sharded_mean_payoff, sharded_price_rbergomi  # noqa: F401
