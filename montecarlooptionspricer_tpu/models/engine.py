"""Large-scale pricing engine: fit-then-stream LSM at 1e7-1e8+ paths.

The reference holds its whole [250 x steps] path matrix in memory per row
(PredictionGen.cpp:736-737); at the rebuild's target scale (1e8 paths x 365
steps, BASELINE.md north star) the path matrix would be ~150 GB — far past
HBM.  The TPU-native design never materializes it:

  phase 1 (pilot):  generate a pilot block that fits comfortably in HBM,
                    run the in-memory LSM backward induction, keep the
                    per-step regression fits (models/lsm.lsm_fit);
  phase 2 (stream): re-generate paths chunk by chunk from counter-based
                    keys and apply the fitted exercise *policy* forward —
                    stop at the first in-the-money step whose immediate
                    payoff beats the fitted continuation — accumulating
                    only the discounted-payoff sum.  O(chunk) memory at any
                    path count, and chunks shard trivially across a mesh.

The streamed estimate is the standard fit-on-pilot LSM lower-bound
estimator (policy fixed before evaluation, no foresight bias); the
reference-parity estimator (value-carrying backward induction,
LSMPricer.cpp:69-85) remains available at matched path counts via
models/lsm.lsm_price.

The hot path generator uses the MXU form of the fGN synthesis
(ops.fgn.fgn_matrices): two [chunk, steps] x [steps, steps] matmuls replace
the reference's 3 FFTs per path (RoughVolatility.cpp:346-348), keeping the
FLOPs on the systolic array.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..ops import fgn as fgn_ops
from ..ops.payoff import payoff
from ..ops.regression import PolyFit
from .lsm import ITM_EPS, lsm_fit


@dataclasses.dataclass(frozen=True)
class StreamConfig:
    n_paths: int
    n_steps: int
    chunk_paths: int = 1 << 16
    pilot_paths: int = 1 << 14
    dt: float = 1.0 / 252.0
    poly_order: int = 2
    dtype: str = "float32"     # path dtype; fGN matmul inputs may be bf16
    fgn_matmul_dtype: str = "float32"
    # RNG: "threefry" is the cross-platform counter-based default;
    # "rbg" uses XLA's rng_bit_generator (hardware-accelerated on TPU,
    # several x faster, still deterministic per backend).
    rng_impl: str = "threefry"
    # Chunks per device program: the chunk loop runs as an on-device
    # fori_loop, so host<->device round-trips happen once per
    # `chunks_per_call` chunks, not per chunk (the axon-tunnel dispatch
    # latency makes per-chunk host loops pathological).
    chunks_per_call: int = 16


def _fgn_matrices_host(n_steps: int, h: float, eta: float, dt: float,
                       dtype) -> tuple:
    """Spectral matrices in float64 on host (NumPy), cast for the MXU."""
    t = np.arange(n_steps + 1, dtype=np.float64) * dt
    lam = 0.5 * t ** (2.0 * h)
    m1 = 1
    while m1 < lam.size:
        m1 <<= 1
    phi = np.conj(np.fft.fft(lam, n=m1))
    m2 = 1
    while m2 < n_steps:
        m2 <<= 1
    k = np.arange(n_steps)[:, None].astype(np.float64)
    m = np.arange(n_steps)[None, :].astype(np.float64)
    c = phi[:n_steps, None] * np.exp(-2j * np.pi * k * m / m2)
    scale = np.sqrt(2.0 * h) * eta / m2
    cr = np.asarray(np.real(c) * scale)
    ci = np.asarray(np.imag(c) * scale)
    return jnp.asarray(cr, dtype), jnp.asarray(ci, dtype)


def make_chunk_pathgen(s0, xi, h, eta, rho, r, n_steps: int, dt: float,
                       chunk_paths: int, dtype=jnp.float32,
                       fgn_dtype=jnp.float32):
    """Build chunk_paths-sized rBergomi generator key -> [chunk, steps+1]
    using the MXU fGN matmul.  Statistically identical to
    rough_volatility.generate_paths (different RNG stream layout)."""
    cr, ci = _fgn_matrices_host(n_steps, h, eta, dt, fgn_dtype)
    t = jnp.arange(n_steps + 1, dtype=dtype) * dt
    var_drift = -0.5 * (eta * eta) * jnp.power(t[:n_steps], 2.0 * h)
    sqrt_dt = float(np.sqrt(dt))
    rho_c = float(np.sqrt(max(0.0, 1.0 - rho * rho)))
    log_s0 = float(np.log(s0))

    def gen(key):
        kz, kw = jax.random.split(key)
        z = jax.random.normal(kz, (2, chunk_paths, n_steps), fgn_dtype)
        w = jax.random.normal(kw, (2, chunk_paths, n_steps), dtype)
        x = (jnp.matmul(z[0], cr, preferred_element_type=jnp.float32)
             - jnp.matmul(z[1], ci, preferred_element_type=jnp.float32))
        v = xi * jnp.exp(x + var_drift)
        dw = (rho * w[0] + rho_c * w[1]) * sqrt_dt
        inc = (r - 0.5 * v) * dt + jnp.sqrt(jnp.maximum(0.0, v)) * dw
        log_s = log_s0 + jnp.cumsum(inc, axis=-1)
        s = jnp.exp(log_s).astype(dtype)
        s0_col = jnp.full((chunk_paths, 1), s0, dtype)
        return jnp.concatenate([s0_col, s], axis=-1)

    return gen


def lsm_policy_value(paths, fits: PolyFit, r, strike, maturity, dt,
                     is_call: bool):
    """Per-chunk sum of discounted payoffs under the fitted exercise policy.

    Exercise at the first step j < n_steps that is in the money and whose
    immediate payoff is >= the fitted continuation value; otherwise exercise
    the terminal payoff.  Returns (sum, count).
    """
    n, m = paths.shape
    t = jnp.arange(m, dtype=paths.dtype) * dt
    p = payoff(is_call, paths, strike)

    # Continuation from the per-step fits: coeffs[j] in z_j = (S - mu_j)/sd_j.
    s_steps = paths[:, : m - 1]                           # [n, m-1]
    z = (s_steps - fits.mu[None, :]) / fits.sd[None, :]
    order = fits.coeffs.shape[-1] - 1
    cont = fits.coeffs[None, :, order]
    for k_idx in range(order - 1, -1, -1):
        cont = cont * z + fits.coeffs[None, :, k_idx]

    live = (t[: m - 1] <= maturity)[None, :]
    exercise = (p[:, : m - 1] > ITM_EPS) & (p[:, : m - 1] >= cont) & live
    # Terminal step always "exercises" whatever payoff remains.
    exercise = jnp.concatenate(
        [exercise, jnp.ones((n, 1), bool)], axis=-1)
    stop = jnp.argmax(exercise, axis=-1)
    disc = jnp.exp(-r * jnp.minimum(t, maturity))
    value = jnp.take_along_axis(p * disc[None, :], stop[:, None], axis=-1)[:, 0]
    return jnp.sum(value), n


class StreamingPricer:
    """Reusable fit-then-stream pricer: builds its two jitted programs ONCE
    per (market params, contract, config) and reuses them across ``price``
    calls.

    Two compile units total, regardless of path count or call pattern:
      * ``_fit``   — pilot path block + LSM backward induction -> PolyFit;
      * ``_stream``— on-device ``lax.fori_loop`` over chunks with the chunk
        *count as a traced argument* (a dynamic while-loop bound), so the
        final partial call reuses the same executable instead of triggering
        a recompile.  One host dispatch covers ``chunks_per_call`` chunks;
        no path data ever crosses the host boundary, only the accumulated
        payoff sum.
    """

    def __init__(self, s0, xi, h, eta, rho, r, strike, maturity,
                 is_call: bool, config: StreamConfig):
        dtype = jnp.dtype(config.dtype)
        fgn_dtype = jnp.dtype(config.fgn_matmul_dtype)
        n_steps, dt = config.n_steps, config.dt
        self.config = config

        pilot_gen = make_chunk_pathgen(s0, xi, h, eta, rho, r, n_steps, dt,
                                       config.pilot_paths, dtype, fgn_dtype)
        chunk_gen = make_chunk_pathgen(s0, xi, h, eta, rho, r, n_steps, dt,
                                       config.chunk_paths, dtype, fgn_dtype)

        def fit_fn(k):
            pilot = pilot_gen(k)
            _, fits = lsm_fit(pilot, r, strike, maturity, dt, is_call,
                              config.poly_order)
            return fits

        def stream_fn(k, fits, start, count):
            def body(i, total):
                paths = chunk_gen(jax.random.fold_in(k, start + i))
                s, _ = lsm_policy_value(paths, fits, r, strike, maturity,
                                        dt, is_call)
                return total + s.astype(jnp.float32)

            return jax.lax.fori_loop(0, count, body,
                                     jnp.zeros((), jnp.float32))

        self._fit = jax.jit(fit_fn)
        self._stream = jax.jit(stream_fn)

    def _keys(self, key):
        if self.config.rng_impl != "threefry":
            # Re-seed into the requested PRNG family (e.g. "rbg", which maps
            # to XLA's hardware-accelerated rng_bit_generator on TPU).
            seed = int(jax.random.randint(key, (), 0, 2**31 - 1))
            key = jax.random.key(seed, impl=self.config.rng_impl)
        return jax.random.split(key)

    def price(self, key, progress=None, n_paths: Optional[int] = None) -> float:
        """Price on ``n_paths`` (default ``config.n_paths``) fresh paths
        derived from ``key``.  Any multiple of ``chunk_paths`` reuses the
        same compiled programs."""
        config = self.config
        if n_paths is None:
            n_paths = config.n_paths
        n_chunks, rem = divmod(n_paths, config.chunk_paths)
        if rem:
            raise ValueError(
                f"n_paths={n_paths} not divisible by chunk_paths="
                f"{config.chunk_paths}")
        k_pilot, k_stream = self._keys(key)
        fits = self._fit(k_pilot)

        # Host accumulation in float64: each on-device call sums at most
        # chunks_per_call chunks in float32 (bounded magnitude); the
        # cross-call reduction happens here at full precision.
        total = 0.0
        done = 0
        while done < n_chunks:
            count = min(config.chunks_per_call, n_chunks - done)
            total += float(self._stream(k_stream, fits, done, count))
            done += count
            if progress is not None:
                progress(done, n_chunks)
        return total / n_paths


@functools.lru_cache(maxsize=16)
def _cached_pricer(s0, xi, h, eta, rho, r, strike, maturity, is_call,
                   config) -> StreamingPricer:
    return StreamingPricer(s0, xi, h, eta, rho, r, strike, maturity,
                           is_call, config)


def price_rbergomi_lsm_streaming(key, s0, xi, h, eta, rho, r, strike,
                                 maturity, is_call: bool,
                                 config: StreamConfig,
                                 progress=None) -> float:
    """North-star workload: price one American option on ``config.n_paths``
    rBergomi paths with LSM, never holding more than one chunk in memory.

    Thin wrapper over :class:`StreamingPricer`; pricers are memoized on the
    full (market, contract, config) signature so repeated calls — including
    calls at different ``n_paths`` with the same chunk size — reuse the same
    two compiled programs."""
    base = dataclasses.replace(config, n_paths=config.chunk_paths)
    pricer = _cached_pricer(float(s0), float(xi), float(h), float(eta),
                            float(rho), float(r), float(strike),
                            float(maturity), bool(is_call), base)
    return pricer.price(key, progress=progress, n_paths=config.n_paths)
