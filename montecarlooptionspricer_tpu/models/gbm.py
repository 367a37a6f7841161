"""Geometric Brownian motion path generation — the degenerate (H = 1/2,
eta = 0) limit of the rBergomi engine, used for the CPU-runnable baseline
config ("European call under GBM", BASELINE.json configs[0]) and for
validating the American pricers against binomial-tree references.

With eta = 0 the fGN stage vanishes (X = 0, v = xi = sigma^2 constant), so
this is pure RNG + cumsum + exp.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import rng as rng_ops


def generate_paths(key: jax.Array, s0, sigma, r, n_steps: int, n_paths: int,
                   dt: float = 1.0 / 252.0, dtype=jnp.float32) -> jax.Array:
    """GBM price paths [n_paths, n_steps + 1] with paths[:, 0] == s0 under
    the risk-neutral measure: S_j = S_{j-1} exp((r - sigma^2/2) dt
    + sigma sqrt(dt) W_j)."""
    w = jax.random.normal(key, (n_paths, n_steps), dtype)
    drift = (r - 0.5 * sigma * sigma) * dt
    diff = sigma * jnp.sqrt(jnp.asarray(dt, dtype)) * w
    log_s = jnp.log(jnp.asarray(s0, dtype)) + jnp.cumsum(drift + diff, axis=-1)
    s = jnp.exp(log_s)
    s0_col = jnp.full((n_paths, 1), s0, dtype)
    return jnp.concatenate([s0_col, s], axis=-1)
