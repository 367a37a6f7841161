"""Pathwise Greeks by automatic differentiation — a TPU-native capability
with no reference equivalent (the C++ pricers return only prices,
LSMPricer.h:8-14 etc.; Greeks there would need finite-difference re-runs).

Because every estimator here is a pure jit-compiled function of its market
inputs, one ``jax.grad`` gives smooth pathwise sensitivities from the SAME
Monte Carlo draws as the price — no finite-difference bias, no extra
variance from re-simulation, and one compiled program for (price, greeks).

Semantics: the derivative flows through path generation (s0, xi, eta, rho,
r enter the Euler recursion and variance curve) and through the pricer's
smooth operations; kinks (payoff max, exercise indicator) are almost-surely
differentiable, so the estimator is the standard pathwise-derivative method
(unbiased for Lipschitz payoffs; for LSM it is the value-function envelope
derivative with the regression policy fixed at the optimum).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from . import rough_volatility
from .lsm import lsm_price


@dataclasses.dataclass(frozen=True)
class Greeks:
    """First-order sensitivities of one Monte Carlo price.

    ``vega_xi`` is the MODEL-VOL-LEVEL sensitivity and its meaning follows
    the producer: d price / d xi (forward-variance level) from the
    rBergomi pricers (lsm_greeks), d price / d sigma from the GBM
    european_greeks control.  Converting between them (xi = sigma^2 ->
    divide by 2 sigma) must only be applied to the rBergomi flavor."""

    price: float
    delta: float      # d price / d s0
    vega_xi: float    # d price / d model vol level (see class docstring)
    rho_rate: float   # d price / d r  (interest-rate rho)


@partial(jax.jit, static_argnames=("n_steps", "n_paths", "is_call",
                                   "poly_order"))
def _lsm_value_and_grads(key, s0, xi, h, eta, rho, r, strike, maturity, dt,
                         *, n_steps: int, n_paths: int, is_call: bool,
                         poly_order: int):
    def value(s0_, xi_, r_):
        paths = rough_volatility.generate_paths(
            key, s0_, xi_, h, eta, rho, r_, n_steps, n_paths, dt)
        return lsm_price(paths, r_, strike, maturity, dt, is_call, poly_order)

    price, grads = jax.value_and_grad(value, argnums=(0, 1, 2))(s0, xi, r)
    return price, grads


def lsm_greeks(key, s0, xi, h, eta, rho, r, strike, maturity,
               n_steps: int, n_paths: int, dt: float = 1.0 / 252.0,
               is_call: bool = False, poly_order: int = 2) -> Greeks:
    """Price + pathwise (delta, vega_xi, rho) for an American option priced
    with LSM on rBergomi paths, all from one reverse-mode pass.

    ``is_call`` defaults to False — a PUT, the package-wide reference
    convention (note european_greeks defaults to True, the classic
    Black-Scholes call validation case: pass it explicitly when moving
    between the two)."""
    price, (d_s0, d_xi, d_r) = _lsm_value_and_grads(
        key, s0, xi, h, eta, rho, r, strike, maturity, dt,
        n_steps=n_steps, n_paths=n_paths, is_call=is_call,
        poly_order=poly_order)
    return Greeks(price=float(price), delta=float(d_s0),
                  vega_xi=float(d_xi), rho_rate=float(d_r))


@partial(jax.jit, static_argnames=("n_steps", "n_paths", "is_call"))
def _euro_value_and_grads(key, s0, sigma, r, strike, maturity, dt, *,
                          n_steps: int, n_paths: int, is_call: bool):
    def run(s0_, sigma_, r_):
        z = jax.random.normal(key, (n_paths, n_steps), jnp.float32)
        inc = (r_ - 0.5 * sigma_**2) * dt + sigma_ * jnp.sqrt(dt) * z
        st = s0_ * jnp.exp(jnp.sum(inc, axis=-1))
        pay = jnp.maximum(st - strike, 0.0) if is_call else jnp.maximum(
            strike - st, 0.0)
        return jnp.exp(-r_ * maturity) * jnp.mean(pay)

    return jax.value_and_grad(run, argnums=(0, 1, 2))(s0, sigma, r)


def european_greeks(key, s0, sigma, r, strike, maturity, n_steps: int,
                    n_paths: int, dt: Optional[float] = None,
                    is_call: bool = True) -> Greeks:
    """European GBM control case (validatable against Black-Scholes):
    pathwise delta/vega/rho of the discounted terminal payoff.

    ``vega_xi`` here holds d price / d SIGMA (the BS vega — see the Greeks
    docstring); ``is_call`` defaults to True, the classic call validation
    case.  The paths diffuse exactly to maturity, so an explicit ``dt``
    must satisfy n_steps * dt == maturity — a codebase-conventional
    dt=1/252 with mismatched (n_steps, maturity) used to return a price
    for the wrong horizon discounted over the right one, silently."""
    if dt is None:
        dt = maturity / n_steps
    elif abs(n_steps * dt - maturity) > 1e-9 * max(1.0, abs(maturity)):
        raise ValueError(
            f"n_steps * dt = {n_steps * dt} != maturity = {maturity}: the "
            "GBM control diffuses exactly to maturity (omit dt to derive "
            "it as maturity / n_steps)")
    price, (d_s0, d_sig, d_r) = _euro_value_and_grads(
        key, jnp.float32(s0), jnp.float32(sigma), jnp.float32(r),
        jnp.float32(strike), jnp.float32(maturity), jnp.float32(dt),
        n_steps=n_steps, n_paths=n_paths, is_call=is_call)
    return Greeks(price=float(price), delta=float(d_s0),
                  vega_xi=float(d_sig), rho_rate=float(d_r))
