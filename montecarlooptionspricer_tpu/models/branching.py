"""Branching-process American option pricer (lower + upper bound).

TPU-native equivalent of src/models/BranchingProcessPricer.cpp.

Lower bound (BranchingProcessPricer.cpp:41-72): per path, the *first*
exercise time whose discounted payoff is strictly positive (the reference
breaks out of the loop on the first improvement over 0 — a first-positive
stopping rule, not a max).  Vectorized as an argmax over a boolean mask.

Upper bound (:74-134): the reference nests a sub-simulation — for each
(path, exercise time) it samples `num_branches` random other paths and scans
each of their futures for the best discounted payoff, an O(N * T * B * M)
quadruple loop (and it mutates a shared mt19937 across the OpenMP team — a
data race).  The rebuild restructures algebraically: the inner "best future
payoff from time t on path p" is a *reverse cummax* of the discounted payoff
matrix, computed once in O(N * M); the e^{-r t} / e^{+r t} discount factors
cancel between the branch value and the continuation discount
(:110-123), so the continuation is just a gather-mean of the reverse cummax
at column t+1.  Counter-based RNG for the branch indices fixes the race by
construction.

Sharding note: with paths sharded over a mesh axis, branch indices sample
within the local shard (statistically equivalent for the uniform sampling
the reference uses; avoids all-gathering the path matrix).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.payoff import payoff
from ..ops.reductions import global_mean
from ..ops.timegrid import step_mask

NEG_INF = -jnp.inf


def _discounted_payoffs(paths, r, strike, dt, is_call):
    m = paths.shape[-1]
    t = jnp.arange(m, dtype=paths.dtype) * dt
    return jnp.exp(-r * t)[None, :] * payoff(is_call, paths, strike), t


def lower_bound(paths, r, strike, maturity, dt, is_call: bool,
                exercise_times, axis_name: Optional[str] = None,
                n_steps=None):
    """First-positive stopping rule (BranchingProcessPricer.cpp:41-72).

    ``n_steps`` (optionally traced) restricts exercise to times
    < n_steps when the path block is padded past the row's true horizon
    (the reference's exercise set is 0..steps-1, PredictionGen.cpp:780-786);
    None = every listed time is eligible."""
    dp_all, t = _discounted_payoffs(paths, r, strike, dt, is_call)
    dp = dp_all[:, exercise_times]                      # [N, T]
    valid = step_mask(paths.shape[-1], dt, maturity)[exercise_times][None, :]  # break at :59-61
    if n_steps is not None:
        valid = valid & (jnp.asarray(exercise_times)
                         < jnp.asarray(n_steps, jnp.int32))[None, :]
    pos = valid & (dp > 0.0)                            # strict > at :64
    first = jnp.argmax(pos, axis=-1)
    val = jnp.take_along_axis(dp, first[:, None], axis=-1)[:, 0]
    val = jnp.where(jnp.any(pos, axis=-1), val, 0.0)
    return global_mean(val, axis_name)


def upper_bound(paths, r, strike, maturity, dt, is_call: bool,
                num_branches: int, exercise_times, key,
                axis_name: Optional[str] = None, rp=None, n_steps=None):
    """Sub-simulation upper bound (BranchingProcessPricer.cpp:74-134) via
    reverse-cummax precomputation.

    ``rp`` optionally supplies the [N, T, B] branch path indices directly
    (used by the parity tests to match an oracle draw-for-draw); otherwise
    they are drawn uniformly from ``key``.  ``n_steps`` as in lower_bound:
    padded-block support (times >= n_steps excluded, "final exercise time"
    becomes n_steps - 1).
    """
    n = paths.shape[0]
    dp_all, t = _discounted_payoffs(paths, r, strike, dt, is_call)

    # bestFut from column k on path p, with the discount-factor cancellation:
    # revmax0[p, k] = max(0, max_{k' >= k, t_{k'} <= maturity} dp_all[p, k']).
    g = jnp.where(step_mask(paths.shape[-1], dt, maturity)[None, :], dp_all,
                  NEG_INF)
    revmax = jnp.flip(jax.lax.cummax(jnp.flip(g, axis=-1), axis=g.ndim - 1),
                      axis=-1)
    revmax0 = jnp.maximum(0.0, revmax)                  # bestFut init 0 (:109)

    ex = jnp.asarray(exercise_times)
    n_ex = ex.shape[0]
    dp = dp_all[:, ex]                                  # discNow, :101-102
    valid = step_mask(paths.shape[-1], dt, maturity)[ex][None, :]  # break at :96-99
    if n_steps is not None:
        valid = valid & (ex < jnp.asarray(n_steps, jnp.int32))[None, :]

    # Continuation = mean over branches of revmax0[random path, e+1]
    # (:104-123); zero at the final exercise time (:105).
    next_col = jnp.minimum(ex + 1, paths.shape[-1] - 1)
    rev_next = revmax0[:, next_col]                     # [N, T]
    if rp is None:
        # Accumulate the B branch draws one [N, T] plane at a time.  The
        # one-shot [N, T, B] gather's s32 index tensor tile-pads its
        # trailing (B, 1) dims to (8, 128) on TPU — 1.22 GiB unpadded
        # became a 15.62 GiB HBM buffer at the pipeline's 2048-step
        # bucket (batch 64 x 250 paths), OOMing the chip in the r04
        # 10k-row soak.  A fori_loop over the (static, small) branch
        # count keeps the peak at one [N, T] plane and draws the same
        # uniform law, one fold_in sub-key per branch.
        def body(b, acc):
            rp_b = jax.random.randint(jax.random.fold_in(key, b),
                                      (n, n_ex), 0, n)
            return acc + jnp.take_along_axis(rev_next, rp_b, axis=0)
        cont = jax.lax.fori_loop(0, num_branches, body,
                                 jnp.zeros_like(rev_next)) / num_branches
    else:
        gathered = rev_next[rp, jnp.arange(n_ex)[None, :, None]]  # [N, T, B]
        cont = jnp.mean(gathered, axis=-1)
    if n_steps is None:
        has_future = (jnp.arange(n_ex) < n_ex - 1)[None, :]
    else:
        # Padded block: the "final exercise time" (:105) is n_steps - 1.
        has_future = (ex < jnp.asarray(n_steps, jnp.int32) - 1)[None, :]
    cont = jnp.where(has_future, cont, 0.0)

    better = jnp.maximum(dp, cont)                      # :126
    best = jnp.max(jnp.where(valid, better, 0.0), axis=-1)  # bestValue init 0
    best = jnp.maximum(best, 0.0)
    return global_mean(best, axis_name)


def branching_price(paths, r, strike, maturity, dt, is_call: bool,
                    num_branches: int, exercise_times, key,
                    axis_name: Optional[str] = None, n_steps=None):
    """0.5 * (lower + upper)  (BranchingProcessPricer.cpp:34-38)."""
    lo = lower_bound(paths, r, strike, maturity, dt, is_call, exercise_times,
                     axis_name, n_steps=n_steps)
    up = upper_bound(paths, r, strike, maturity, dt, is_call, num_branches,
                     exercise_times, key, axis_name, n_steps=n_steps)
    return 0.5 * (lo + up)
