"""Counter-based RNG utilities.

The reference seeds a fresh ``std::mt19937`` from ``std::random_device`` on
every call (src/models/RoughVolatility.cpp:239-240, 253-254) — results are
irreproducible by construction, and the branching pricer even shares one
generator across an OpenMP team without a lock
(src/models/BranchingProcessPricer.cpp:84-108), a data race.

The TPU rebuild designs both problems out: all randomness flows from a single
``jax.random`` threefry key, split functionally.  Same seed => bitwise-same
prices on the same topology (see tests/test_determinism.py — the rebuild's
"race sanitizer").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def key_for_row(base_key: jax.Array, row_index) -> jax.Array:
    """Derive a per-row key. Rows are priced independently; folding the row
    index in keeps results invariant to batching/sharding layout."""
    return jax.random.fold_in(base_key, row_index)


def normal(key: jax.Array, shape, dtype=jnp.float32) -> jax.Array:
    """One standard-normal array of ``shape`` (test seam for injecting
    noise through the generators)."""
    return jax.random.normal(key, shape, dtype)


def normal_pairs(key: jax.Array, shape, dtype=jnp.float32):
    """Draw two independent standard-normal arrays of ``shape``."""
    k1, k2 = jax.random.split(key)
    return (jax.random.normal(k1, shape, dtype),
            jax.random.normal(k2, shape, dtype))


def complex_normal(key: jax.Array, shape, dtype=jnp.float32) -> jax.Array:
    """Complex gaussians with independent N(0,1) real/imag parts — the
    distributional equivalent of RoughVolatility.cpp:238-250."""
    re, im = normal_pairs(key, shape, dtype)
    return jax.lax.complex(re, im)
