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
    """Largest j with j * dt <= maturity (in exact arithmetic).

    The slack scales with the ratio: maturity often arrives as
    float32(n * dt) (serve mode traces it), whose rounding error in
    maturity / dt is ~ratio * 1.2e-7 — a FIXED 1e-4 slack loses the
    final live step for on-grid maturities past ~2000 steps (silently
    disabling exercise on the contract's last day).  1e-6 relative is
    ~8x the f32 error bound yet stays far below one step out to ~1e5
    steps, so off-grid maturities are still classified identically."""
    ratio = maturity / dt
    return jnp.floor(ratio + 1e-4 + ratio * 1e-6)


def step_mask(n: int, dt, maturity):
    """Boolean [n] mask of steps j = 0..n-1 with j * dt <= maturity."""
    j = jnp.arange(n)
    return j <= last_valid_step(dt, maturity)
