"""Spectral fractional-Gaussian-noise synthesis for the rBergomi model.

TPU-native equivalent of src/models/RoughVolatility.cpp:171-292.  The
reference runs a hand-rolled radix-2 FFT *per path* inside a serial loop
(RoughVolatility.cpp:346-348); here the whole path batch goes through one
XLA-batched FFT — or, faster on TPU, through an MXU matmul against a
precomputed spectral matrix (`fgn_matrices` / `fractional_gaussian_matmul`),
since for the step counts involved (<= 1825) the DFT-as-matmul form keeps the
FLOPs on the 128x128 systolic array instead of the VPU.

FFT-convention note: the reference's forward FFT (RoughVolatility.cpp:183-196,
inv=+1) uses e^{+i...} — the *conjugate* of the NumPy/XLA forward convention —
and its inverse (inv=-1) is e^{-i...}/n.  The helpers below reproduce the
reference's transforms exactly (tests/test_fgn.py checks bit-level agreement
with a NumPy oracle of the C++ loop structure at matched inputs):

  phi        = conj(fft(pad(lambda, M1)))          # == C++ rbergomiPhi
  X[m]       = Re( fft(pad(phi[:N] * Z, M2))/M2 )  # == C++ fractionalGaussian
               * sqrt(2H) * eta

This scheme is the reference's own (non-standard) spectral synthesis, *not* a
textbook circulant embedding; parity is to this behavior (SURVEY.md section 7).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def next_pow2(n: int) -> int:
    """Smallest power of two >= n (RoughVolatility.cpp:204-210)."""
    p = 1
    while p < n:
        p <<= 1
    return p


def rbergomi_lambda(time_grid, h):
    """lambda_i = 0.5 * t_i^{2H}  (RoughVolatility.cpp:227-236)."""
    return 0.5 * jnp.power(time_grid, 2.0 * h)


def rbergomi_phi(lam):
    """Forward spectrum of the padded lambda sequence
    (RoughVolatility.cpp:212-225).  Returns a complex array of length
    next_pow2(len(lam))."""
    m1 = next_pow2(lam.shape[-1])
    # C++ forward fft uses e^{+i}; numpy fft uses e^{-i}; for a real input
    # these differ by conjugation.
    return jnp.conj(jnp.fft.fft(lam, n=m1, axis=-1))


def fractional_gaussian(phi, z, h, eta):
    """Batched fGN synthesis (RoughVolatility.cpp:264-292).

    Args:
      phi: [M1] complex spectrum from `rbergomi_phi` (only the first N
        entries are used, matching the reference).
      z: [..., N] complex standard gaussians.
      h: Hurst exponent.  eta: vol-of-vol.

    Returns:
      [..., N] real fGN increments X.
    """
    n = z.shape[-1]
    m2 = next_pow2(n)
    a = phi[:n] * z
    # C++ inverse fft is e^{-i}/n == numpy *forward* fft / n.
    res = jnp.real(jnp.fft.fft(a, n=m2, axis=-1)) / m2
    scale = jnp.sqrt(2.0 * h) * eta
    return scale * res[..., :n]


def fgn_matrices(phi, n, h, eta, dtype=jnp.float32):
    """Precompute the real matrices (Cr, Ci) of the DFT-as-matmul form.

    X = Zr @ Cr - Zi @ Ci  reproduces `fractional_gaussian` exactly (up to
    matmul accumulation order).  C[k, m] = phi_k * e^{-2 pi i k m / M2} / M2
    for k, m < N, scaled by sqrt(2H)*eta.  On TPU the two [paths, N] @ [N, N]
    products run on the MXU, which beats the VPU-bound batched FFT for the
    step counts this framework targets.
    """
    m2 = next_pow2(n)
    # Reduce (k*m) mod m2 in exact integer arithmetic BEFORE forming the
    # angle: unreduced, k*m reaches ~1.7e7 at n=4096 and the f32 product
    # 2*pi*k*m carries ~1 rad of rounding error (a systematic ~1e-3 phase
    # perturbation of the matrices, invisible to MC stderr).  Reduced, the
    # angle lives in (-2*pi, 0] where f32 cos/sin are accurate.  The
    # reduction is h-independent, so it stays a host constant even when
    # this function is traced with a traced Hurst (engine traced_h).
    idx = np.arange(n, dtype=np.int64)
    km = (idx[:, None] * idx[None, :]) % m2
    dt_k = jnp.float64 if phi.dtype == jnp.complex128 else jnp.float32
    ang = jnp.asarray((-2.0 * np.pi / m2) * km, dt_k)
    scale = jnp.sqrt(2.0 * h) * eta / m2
    pk = phi[:n][:, None]
    c = pk * jax_exp_i(ang)
    cr = (jnp.real(c) * scale).astype(dtype)
    ci = (jnp.imag(c) * scale).astype(dtype)
    return cr, ci


def jax_exp_i(ang):
    return jnp.cos(ang) + 1j * jnp.sin(ang)


def fractional_gaussian_matmul(cr, ci, zr, zi, precision=None):
    """MXU form of `fractional_gaussian`: X = Zr @ Cr - Zi @ Ci.

    Args:
      cr, ci: [N, N] from `fgn_matrices` (scale folded in).
      zr, zi: [..., N] real/imag gaussian draws.
      precision: jax.lax.Precision override.  The default (backend default:
        bf16 inputs on TPU, ~1e-3 abs noise on the fGN — immaterial next to
        MC error) is the production setting; tests pass HIGHEST to check
        algorithmic equivalence with the FFT form tightly.
    """
    return (jnp.matmul(zr, cr, preferred_element_type=jnp.float32,
                       precision=precision)
            - jnp.matmul(zi, ci, preferred_element_type=jnp.float32,
                         precision=precision))


def forward_variance(x, time_grid, xi, h, eta):
    """v_t = xi * exp(X_t - 0.5 eta^2 t^{2H})  (RoughVolatility.cpp:294-309).

    The reference iterates over N = len(X) entries of a longer time grid, so
    only the first N grid points are used.
    """
    n = x.shape[-1]
    t = time_grid[:n]
    ma = -0.5 * (eta * eta) * jnp.power(t, 2.0 * h)
    return xi * jnp.exp(x + ma)
