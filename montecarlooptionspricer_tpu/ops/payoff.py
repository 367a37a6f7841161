"""Option payoff — TPU-native equivalent of include/core/common.h:8-14.

The reference branches on ``isCall`` at runtime; here the branch is a
branch-free sign select on the VPU, so ``is_call`` may be either a static
Python bool (XLA folds the select) or a traced boolean — the latter lets
the pipeline batch calls and puts into ONE compiled program per step-count
bucket instead of two.
"""

from __future__ import annotations

import jax.numpy as jnp


def payoff(is_call, s, strike):
    """Intrinsic option value.

    Args:
      is_call: option type (call if True, put otherwise) — static bool or
        traced boolean scalar/array.
      s: stock price array, any shape.
      strike: strike price (scalar or broadcastable).

    Returns:
      ``max(0, s - k)`` for calls, ``max(0, k - s)`` for puts.
    """
    diff = s - strike
    return jnp.maximum(0.0, jnp.where(is_call, diff, -diff))
