"""shard_map wrappers: Monte Carlo paths sharded across the TPU mesh.

The OpenMP `parallel for reduction(+:...)` loops of the reference
(BranchingProcessPricer.cpp:52-54, 90-92) map to: each chip generates its
slice of the path matrix from a per-shard counter-based key, prices it
locally, and the means / regression moments reduce over ICI with psum
(SURVEY.md sections 2, 5.8).  Nothing inside models/ changes — every pricer
already takes ``axis_name``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..models import rough_volatility
from ..models.pricing import PricerSpec, price_all
from .mesh import DATA_AXIS


def sharded_price_rbergomi(mesh: Mesh, spec: PricerSpec, s0, xi, h, eta, rho,
                           n_steps: int, n_paths: int,
                           axis_name: str = DATA_AXIS):
    """Build a jitted function key -> {4 prices} that generates ``n_paths``
    rBergomi paths sharded over ``mesh`` and prices them globally.

    ``n_paths`` must divide by the mesh size; each shard folds its axis index
    into the key so the global path set is independent of the mesh shape in
    distribution (and bitwise deterministic for a fixed mesh).
    """
    n_dev = mesh.shape[axis_name]
    if n_paths % n_dev:
        raise ValueError(f"n_paths={n_paths} not divisible by mesh size {n_dev}")
    local_paths = n_paths // n_dev

    def per_shard(key):
        idx = jax.lax.axis_index(axis_name)
        shard_key = jax.random.fold_in(key, idx)
        k_paths, k_price = jax.random.split(shard_key)
        paths = rough_volatility.generate_paths(
            k_paths, s0, xi, h, eta, rho, spec.r, n_steps, local_paths,
            spec.dt)
        prices = price_all(paths, spec, k_price, axis_name=axis_name)
        # Prices are already globally reduced (psum'd) inside price_all;
        # every shard holds the same scalars.
        return {k: v[None] for k, v in prices.items()}

    fn = shard_map(per_shard, mesh=mesh, in_specs=P(),
                   out_specs={k: P(axis_name) for k in
                              ("asymptotic", "branching", "lsm", "martingale")})

    @jax.jit
    def run(key):
        out = fn(key)
        return {k: v[0] for k, v in out.items()}

    return run


def sharded_mean_payoff(mesh: Mesh, payoff_fn, generate_fn,
                        n_paths: int, axis_name: str = DATA_AXIS):
    """Generic sharded E[payoff(paths)] — the minimum end-to-end slice
    (BASELINE.json config #1) over a mesh: generate locally, pmean globally."""
    n_dev = mesh.shape[axis_name]
    if n_paths % n_dev:
        raise ValueError(f"n_paths={n_paths} not divisible by mesh size {n_dev}")
    local = n_paths // n_dev

    def per_shard(key):
        idx = jax.lax.axis_index(axis_name)
        paths = generate_fn(jax.random.fold_in(key, idx), local)
        val = jnp.mean(payoff_fn(paths))
        return jax.lax.pmean(val, axis_name)[None]

    fn = shard_map(per_shard, mesh=mesh, in_specs=P(),
                   out_specs=P(axis_name))

    @jax.jit
    def run(key):
        return fn(key)[0]

    return run
