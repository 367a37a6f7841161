"""Time-grid helpers.

Every reference pricer breaks its step loop on ``j * dt > maturity``
(computed in C++ double).  In float32 on device, ``j * dt`` can land on the
wrong side of ``maturity`` when the maturity sits exactly on the grid — so
the mask is computed with integer logic instead: ``j <= floor(maturity / dt
+ slack)``, which is exact for on-grid maturities and indistinguishable
off-grid.
"""

from __future__ import annotations

import jax.numpy as jnp


def last_valid_step(dt, maturity):
    """Largest j with j * dt <= maturity (in exact arithmetic)."""
    return jnp.floor(maturity / dt + 1e-4)


def step_mask(n: int, dt, maturity):
    """Boolean [n] mask of steps j = 0..n-1 with j * dt <= maturity."""
    j = jnp.arange(n)
    return j <= last_valid_step(dt, maturity)
