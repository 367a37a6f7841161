"""Mesh-aware reductions.

The reference reduces payoff sums with OpenMP ``reduction(+:...)`` clauses
(src/models/BranchingProcessPricer.cpp:53, 91); across a TPU mesh the same
reduction is a ``psum`` over the sharded ``paths`` axis (SURVEY.md
section 5.8).  Every pricer funnels its final mean through these helpers so
the unsharded and shard_map'd paths produce identical math.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def psum_if(x, axis_name: Optional[str]):
    return jax.lax.psum(x, axis_name) if axis_name is not None else x


def masked_mean(values, mask, axis_name: Optional[str] = None):
    """sum(values * mask) / sum(mask), globally across shards when
    ``axis_name`` is set; 0 when the mask is empty (matching the reference's
    validPaths guard, AsymptoticAnalysisPricer.cpp:99-108)."""
    num = psum_if(jnp.sum(values * mask), axis_name)
    den = psum_if(jnp.sum(mask), axis_name)
    # Divide by den itself (guarded only to keep the untaken branch
    # finite): maximum(den, 1) would silently HALVE the mean for
    # fractional weights summing to 0.5.
    return jnp.where(den > 0, num / jnp.where(den > 0, den, 1.0), 0.0)


def global_mean(values, axis_name: Optional[str] = None):
    """Plain mean over the (possibly sharded) leading paths axis."""
    num = psum_if(jnp.sum(values), axis_name)
    den = psum_if(jnp.asarray(values.size, values.dtype), axis_name)
    return num / den
