"""Unified pricing entry: run all four estimators on one path matrix.

Equivalent of the four pricer calls in PredictionGen.cpp:788-791, packaged so
the pipeline, the sharded runner, and the benchmarks share one code path.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from .asymptotic import asymptotic_price
from .branching import branching_price
from .lsm import lsm_price
from .martingale import martingale_price


@dataclasses.dataclass(frozen=True)
class PricerSpec:
    """Static + dynamic arguments of the four estimators.

    ``num_branches``, ``poly_order``, ``max_iterations`` are static (they
    shape the compiled program); the floats may be traced scalars so rows
    can be vmapped, and ``is_call`` may be a static bool OR a traced
    boolean (the payoff/boundary selects are branch-free) — the pipeline
    traces it so calls and puts share one compiled program.
    """

    r: float = 0.04
    strike: float = 100.0
    maturity: float = 1.0
    dt: float = 1.0 / 252.0
    is_call: bool = False
    sigma: float = 0.2          # asymptotic boundary vol (20-day realized)
    dividend: float = 0.08
    num_branches: int = 10
    poly_order: int = 2
    max_iterations: int = 5


def price_all(paths: jax.Array, spec: PricerSpec, key: jax.Array,
              axis_name: Optional[str] = None, n_steps=None) -> dict:
    """All four prices for one [n_paths, n_steps+1] path matrix
    (PredictionGen.cpp:780-791: exercise times are every step 0..steps-1).

    ``n_steps`` (optionally traced) prices a PADDED path block — flat past
    the row's true horizon, rough_volatility.generate_paths_bucketed — with
    the row's exact semantics: the asymptotic pricer is pad-exact already
    (every padded column is past maturity, so its step mask kills it), and
    the other three take the traced horizon explicitly."""
    pad_steps = paths.shape[-1] - 1
    exercise_times = jnp.arange(pad_steps)
    if n_steps is None:
        kw = {}
    else:
        kw = {"n_steps": n_steps}
    return {
        "asymptotic": asymptotic_price(
            paths, spec.r, spec.strike, spec.maturity, spec.dt, spec.is_call,
            spec.sigma, spec.dividend, axis_name),
        "branching": branching_price(
            paths, spec.r, spec.strike, spec.maturity, spec.dt, spec.is_call,
            spec.num_branches, exercise_times, key, axis_name, **kw),
        "lsm": lsm_price(
            paths, spec.r, spec.strike, spec.maturity, spec.dt, spec.is_call,
            spec.poly_order, axis_name, **kw),
        "martingale": martingale_price(
            paths, spec.r, spec.strike, spec.maturity, spec.dt, spec.is_call,
            spec.poly_order, spec.max_iterations, axis_name, **kw),
    }
