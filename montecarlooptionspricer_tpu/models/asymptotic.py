"""Asymptotic-analysis American option pricer.

TPU-native equivalent of src/models/AsymptoticAnalysisPricer.cpp.  The
reference scans paths x steps with scalar boundary evaluations
(AsymptoticAnalysisPricer.cpp:67-95); here the boundary is a [steps] curve
and the per-path max over exercise opportunities is one masked reduction.

Behavioral parity notes (quirks preserved, see SURVEY.md section 7):
  * For eps = T - t > 1, the reference computes sqrt(eps * ln(1/eps)) of a
    negative number -> NaN boundary -> comparisons false -> never in the
    exercise region.  We mask that case explicitly instead of relying on
    NaN propagation (AsymptoticAnalysisPricer.cpp:13, 28).
  * Non-finite prices are skipped, not fatal (:74, :89).
  * The near-expiry (r - D) correction applies only for eps < 0.01
    (:16-19, :31-34).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..ops.payoff import payoff
from ..ops.reductions import global_mean
from ..ops.timegrid import step_mask


def exercise_boundary(t, maturity, strike, r, dividend, sigma, is_call):
    """Early-exercise boundary curve B(t)
    (AsymptoticAnalysisPricer.cpp:8-36).  Where the reference would produce
    NaN (negative sqrt argument), returns +inf (call) / -inf (put) so the
    exercise region is empty (calls exercise ABOVE the boundary, puts
    below), matching the C++ NaN-comparison behavior.
    ``is_call`` may be a static bool or a traced boolean."""
    eps = maturity - t
    arg = eps * jnp.log(1.0 / jnp.maximum(eps, 1e-300))
    c0 = 0.5 * sigma * jnp.sqrt(jnp.maximum(arg, 0.0))
    near = eps < 0.01
    correction = jnp.where(near, 0.5 * (dividend - r) * eps, 0.0)
    boundary = jnp.where(is_call, strike - c0 + correction,
                         strike + c0 + correction)
    invalid_fill = jnp.where(is_call, jnp.inf, -jnp.inf)  # empty region
    at_expiry = eps < 1e-10
    boundary = jnp.where(at_expiry, strike, boundary)
    bad = jnp.logical_and(arg < 0.0, jnp.logical_not(at_expiry))
    return jnp.where(bad, invalid_fill, boundary)


def asymptotic_price(paths, r, strike, maturity, dt, is_call: bool,
                     sigma, dividend, axis_name: Optional[str] = None):
    """Mean over paths of the best discounted payoff among steps where the
    path crosses the asymptotic boundary
    (AsymptoticAnalysisPricer.cpp:38-113).

    Args:
      paths: [n_paths, n_steps + 1] price paths.
      axis_name: mesh axis to pmean over when paths are sharded.
    """
    n_steps_p1 = paths.shape[-1]
    t = jnp.arange(n_steps_p1, dtype=paths.dtype) * dt
    valid_t = step_mask(n_steps_p1, dt, maturity)  # loop break at :71
    boundary = exercise_boundary(t, maturity, strike, r, dividend, sigma,
                                 is_call)

    finite = jnp.isfinite(paths)                 # NaN/Inf price skip at :74
    in_region = jnp.where(is_call, paths > boundary[None, :],
                          paths < boundary[None, :])
    pay = payoff(is_call, paths, strike)
    disc = jnp.exp(-r * t)[None, :] * pay
    mask = finite & in_region & valid_t[None, :]
    best = jnp.max(jnp.where(mask, disc, 0.0), axis=-1)  # pathBest init 0 (:68)
    return global_mean(best, axis_name)                  # mean over all paths
