"""Option payoff — TPU-native equivalent of include/core/common.h:8-14.

The reference branches on ``isCall`` at runtime; under jit the option type is
a static Python bool (one compiled program per type), so the payoff lowers to
a single branch-free ``max`` on the VPU.
"""

from __future__ import annotations

import jax.numpy as jnp


def payoff(is_call: bool, s, strike):
    """Intrinsic option value.

    Args:
      is_call: static option type (call if True, put otherwise).
      s: stock price array, any shape.
      strike: strike price (scalar or broadcastable).

    Returns:
      ``max(0, s - k)`` for calls, ``max(0, k - s)`` for puts.
    """
    if is_call:
        return jnp.maximum(0.0, s - strike)
    return jnp.maximum(0.0, strike - s)
