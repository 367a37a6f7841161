"""Longstaff-Schwartz (LSM) American option pricer.

TPU-native equivalent of src/models/LSMPricer.cpp.  The reference's backward
induction gathers in-the-money rows into a dense Eigen matrix and runs a
bdcSvd per step (LSMPricer.cpp:51-76); under jit the ITM set must stay
shape-static, so the rebuild runs a `lax.scan` backward over steps with a
*masked* weighted regression (ops.regression) — zero-weight OTM rows leave
the least-squares solution unchanged, and the tiny Gram/moment block psums
across a sharded paths axis.

Behavioral parity notes (SURVEY.md section 7 "Exact-parity semantics"):
  * The reference regresses *realized carried values* (the Values matrix
    propagates max(immediate, continuation) backward, LSMPricer.cpp:69-85),
    not pure cashflows — a known LSM variant with upward bias.  We match it.
  * Steps with t > maturity only discount (:44-49).
  * ITM threshold is payoff > 1e-14 (:55); with an empty ITM set the
    regression is skipped and everything discounts (:60, :89-94).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.payoff import payoff
from ..ops.reductions import global_mean, psum_if
from ..ops.regression import eval_poly, fit_poly_masked
from ..ops.timegrid import step_mask

ITM_EPS = 1e-14


def _lsm_backward(paths, r, strike, maturity, dt, is_call: bool,
                  poly_order: int = 2, axis_name: Optional[str] = None,
                  n_steps=None):
    """Backward induction core: returns (price, per-step fits in reverse
    time order).

    ``n_steps`` (optionally traced) marks columns past the row's true
    horizon as *padding*: pad steps are identities (no discount, no
    regression effect), so a [*, n_pad + 1] padded path block — flat past
    n_steps, see rough_volatility.generate_paths_bucketed — prices exactly
    as the [*, n_steps + 1] exact-shape program.  Distinct from the
    past-maturity quirk (:44-49), which DOES discount and is reference
    behavior for real steps."""
    n_paths, m = paths.shape
    disc = jnp.exp(-r * dt)

    v_init = payoff(is_call, paths[:, m - 1], strike)  # :37-40

    # Scan backward j = M-2 .. 0 over (price column, time).
    s_cols = paths[:, : m - 1][:, ::-1].T              # [m-1, n_paths]
    live = step_mask(m - 1, dt, maturity)[::-1]        # j*dt <= maturity
    if n_steps is None:
        real = jnp.ones(m - 1, bool)
    else:
        real = (jnp.arange(m - 1) < jnp.asarray(n_steps, jnp.int32))[::-1]

    def step(v, xs):
        s, is_live, is_real = xs
        vd = v * disc                                   # :46, :69, :92
        p = payoff(is_call, s, strike)
        itm = (p > ITM_EPS).astype(paths.dtype)         # :51-58
        fit = fit_poly_masked(s, vd, itm, poly_order, axis_name)
        cont = eval_poly(fit, s)
        v_exercised = jnp.where(itm > 0, jnp.maximum(p, cont), vd)  # :78-94
        any_itm = psum_if(jnp.sum(itm), axis_name) > 0
        v_reg = jnp.where(any_itm, v_exercised, vd)     # :60 empty-ITM skip
        v_new = jnp.where(is_live, v_reg, vd)           # :44-49
        v_new = jnp.where(is_real, v_new, v)            # padding: identity
        return v_new, fit

    # unroll: the body is many small fused kernels; unrolling amortizes the
    # per-step launch overhead that dominates the latency-bound per-row
    # pipeline batches (250-path rows).
    v_final, fits_rev = jax.lax.scan(step, v_init, (s_cols, live, real),
                                     unroll=8)
    price = global_mean(v_final, axis_name)             # :97-101
    return price, fits_rev


def lsm_price(paths, r, strike, maturity, dt, is_call: bool,
              poly_order: int = 2, axis_name: Optional[str] = None,
              n_steps=None):
    """American option price by Longstaff-Schwartz regression
    (LSMPricer.cpp:19-102).

    Args:
      paths: [n_paths, n_pad + 1] price paths.
      poly_order: monomial basis order (PredictionGen.cpp:790 passes 2).
      axis_name: mesh axis name when paths are sharded; the per-step
        regression then pools moments across shards via psum.
      n_steps: optional (traced) true horizon when the path block is padded
        past it (see _lsm_backward); None = every column is a real step.
    """
    price, _ = _lsm_backward(paths, r, strike, maturity, dt, is_call,
                             poly_order, axis_name, n_steps)
    return price


def lsm_fit(paths, r, strike, maturity, dt, is_call: bool,
            poly_order: int = 2, axis_name: Optional[str] = None,
            n_steps=None):
    """LSM price plus the per-step regression fits, for use as an exercise
    *policy* on an independent (and arbitrarily large) path set — the
    scale path of this framework (see models/engine.py).

    Returns (price, fits) where fits is a PolyFit pytree with leading axis
    of length paths.shape[1] - 1 (the PADDED width for bucketed blocks,
    NOT the live n_steps) in *forward* time order (index j covers step j).
    ``n_steps`` (optionally traced) marks columns past the true horizon as
    padding, exactly as in ``lsm_price`` — for step-bucketed path blocks
    that are flat past n_steps.  Entries at padded / past-maturity indices
    are garbage fits (intercept-only regressions of the flat carry):
    CONSUMERS MUST MASK to the live window themselves, as
    engine.lsm_policy_path_values does with its col < n_steps_live guard."""
    price, fits_rev = _lsm_backward(paths, r, strike, maturity, dt, is_call,
                                    poly_order, axis_name, n_steps=n_steps)
    fits = jax.tree.map(lambda a: jnp.flip(a, axis=0), fits_rev)
    return price, fits
