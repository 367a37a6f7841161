"""Martingale-duality American option pricer.

TPU-native equivalent of src/models/MartingaleOptimizationPricer.cpp: a
fixed-count primal/dual iteration (default 5, MartingaleOptimizationPricer.h:18)
carrying a polynomial martingale surrogate (coefficients + offset) as
`lax.fori_loop` state.  Each iteration:

  primal (.cpp:72-94):  per-path max of discounted payoff + its argmax stop
                        index (strict-improvement over 0, so all-nonpositive
                        paths stop at index 0 with value 0);
  dual   (.cpp:96-117): per-path max of (disc payoff - (M(S) - offset)),
                        floored at 0;
  update (.cpp:122-178): regress the ad-hoc targets 0.5 * discPayoff at the
                        stop index and 0.2 * discPayoff at
                        (stop + M/2) mod M on the polynomial basis, then
                        offset = mean M(S0).

Price = 0.5 * (primal + dual of the *last* iteration) (.cpp:56-63).  The
primal is iteration-invariant (it never reads the martingale), so it is
computed once.  The discount factor clamps t at maturity
(PathDiscountFactor, MartingaleOptimizationPricer.h:44-49), and the update
step intentionally ignores the maturity mask at the (stop + M/2) sample,
as the reference does (.cpp:142-147).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.payoff import payoff
from ..ops.reductions import global_mean
from ..ops.regression import PolyFit, eval_poly, fit_poly_masked
from ..ops.timegrid import step_mask

NEG_INF = -jnp.inf


def martingale_price(paths, r, strike, maturity, dt, is_call: bool,
                     poly_order: int = 2, max_iterations: int = 5,
                     axis_name: Optional[str] = None, n_steps=None):
    """American price by martingale-duality optimization
    (MartingaleOptimizationPricer.cpp:21-64).

    ``n_steps`` (optionally traced) supports padded path blocks: the primal
    and dual maxima are already exact under padding (the maturity mask
    kills every padded column), but the update step's (stop + M/2) mod M
    wrap (.cpp:142) uses M = true steps + 1, which must follow the row, not
    the padded width."""
    n, m = paths.shape
    m_act = m if n_steps is None else jnp.asarray(n_steps, jnp.int32) + 1
    t = jnp.arange(m, dtype=paths.dtype) * dt
    df = jnp.exp(-r * jnp.minimum(t, maturity))         # PathDiscountFactor
    pay = payoff(is_call, paths, strike)
    dp = pay * df[None, :]                              # [N, M]
    valid = step_mask(m, dt, maturity)[None, :]         # loop break at :78
    dpv = jnp.where(valid, dp, NEG_INF)

    # Primal pass (:72-94): loop-invariant across iterations.
    best = jnp.max(dpv, axis=-1)
    stop_idx = jnp.where(best > 0.0, jnp.argmax(dpv, axis=-1), 0)
    primal_path = jnp.maximum(best, 0.0)
    primal = global_mean(primal_path, axis_name)

    s0 = paths[:, 0]
    rows = jnp.arange(n)

    def iteration(_, carry):
        fit, offset, _dual = carry

        # Dual pass (:96-117) with the martingale entering the iteration.
        mval = eval_poly(fit, paths)                    # EvaluateMartingale
        cand = dpv - (mval - offset)
        cand = jnp.where(valid, cand, NEG_INF)
        dual_path = jnp.maximum(jnp.max(cand, axis=-1), 0.0)
        dual = global_mean(dual_path, axis_name)

        # Martingale update (:122-178).
        s_stop = paths[rows, stop_idx]
        y_stop = 0.5 * dp[rows, stop_idx]               # :138
        j_other = (stop_idx + m_act // 2) % m_act       # :142
        s_other = paths[rows, j_other]
        y_other = 0.2 * dp[rows, j_other]               # :146
        xs = jnp.concatenate([s_stop, s_other])
        ys = jnp.concatenate([y_stop, y_other])
        new_fit = fit_poly_masked(xs, ys, jnp.ones_like(xs), poly_order,
                                  axis_name)
        new_offset = global_mean(eval_poly(new_fit, s0), axis_name)  # :172-177
        return new_fit, new_offset, dual

    zero_fit = PolyFit(jnp.zeros(poly_order + 1, paths.dtype),
                       jnp.zeros((), paths.dtype),
                       jnp.ones((), paths.dtype))
    init = (zero_fit, jnp.zeros((), paths.dtype), jnp.zeros((), paths.dtype))
    _, _, dual_last = jax.lax.fori_loop(0, max_iterations, iteration, init)

    return 0.5 * (primal + dual_last)                   # :63
