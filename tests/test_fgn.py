"""Parity tests of the spectral fGN synthesis against an O(n^2) DFT oracle
that mirrors the C++ FFT conventions (RoughVolatility.cpp:171-292)."""

import numpy as np
import jax.lax
import jax.numpy as jnp

from montecarlooptionspricer_tpu.ops import fgn

import oracles


def _setup(n_steps, h=0.1, dt=1.0 / 252.0):
    t = np.arange(n_steps + 1) * dt
    lam = oracles.rbergomi_lambda(t, h)
    phi = oracles.rbergomi_phi(lam)
    return t, lam, phi


def _to_complex_device(z):
    """Host complex -> device complex64 via two real transfers.  The axon
    TPU tunnel cannot transfer complex arrays host<->device (UNIMPLEMENTED,
    and a failed transfer wedges the backend for the rest of the process);
    real planes + on-device lax.complex keeps these tests runnable in the
    MCOP_TPU_TESTS=1 cross-platform sweep."""
    return jax.lax.complex(jnp.asarray(np.real(z), jnp.float32),
                           jnp.asarray(np.imag(z), jnp.float32))


def _fetch_complex(x):
    """Device complex -> host complex via two real fetches (see above)."""
    return (np.asarray(jnp.real(x), np.float64)
            + 1j * np.asarray(jnp.imag(x), np.float64))


def test_phi_matches_cpp_forward_fft():
    for n_steps in [5, 37, 63, 252, 255]:
        t, lam, phi_ref = _setup(n_steps)
        phi = fgn.rbergomi_phi(jnp.asarray(lam, jnp.float32))
        assert phi.shape[0] == oracles.next_pow2(n_steps + 1)
        np.testing.assert_allclose(_fetch_complex(phi), phi_ref, rtol=1e-5,
                                   atol=1e-5)


def test_fractional_gaussian_matches_oracle(rng):
    h, eta = 0.12, 1.7
    for n_steps in [37, 64, 200]:
        t, lam, phi = _setup(n_steps, h)
        z = rng.normal(size=(4, n_steps)) + 1j * rng.normal(size=(4, n_steps))
        ours = fgn.fractional_gaussian(_to_complex_device(phi),
                                       _to_complex_device(z), h, eta)
        for i in range(4):
            ref = oracles.fractional_gaussian(phi, z[i], h, eta)
            np.testing.assert_allclose(np.asarray(ours[i]), ref, rtol=1e-3,
                                       atol=1e-4)


def test_fgn_matmul_matches_fft(rng):
    h, eta = 0.2, 1.1
    n_steps = 100
    t, lam, phi = _setup(n_steps, h)
    z = rng.normal(size=(8, n_steps)) + 1j * rng.normal(size=(8, n_steps))
    phi_j = _to_complex_device(phi)
    ref = fgn.fractional_gaussian(phi_j, _to_complex_device(z), h, eta)
    # jit: eager complex arithmetic is UNIMPLEMENTED on the axon TPU
    # backend; compiled complex graphs work fine.
    cr, ci = jax.jit(fgn.fgn_matrices,
                     static_argnums=(1, 2, 3))(phi_j, n_steps, h, eta)
    out = fgn.fractional_gaussian_matmul(
        cr, ci, jnp.asarray(z.real, jnp.float32),
        jnp.asarray(z.imag, jnp.float32), precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-3,
                               atol=1e-4)


def test_fgn_matrices_large_bucket_angle_accuracy():
    """The f32 DFT matrices at a large step bucket must track an exact-f64
    build: the DFT angle is reduced (k*m) mod m2 in integer arithmetic
    before cos/sin.  Unreduced, the f32 product 2*pi*k*m at m2=2048
    carries O(1) rad of rounding error — a systematic (not MC) ~1e-3
    perturbation of every matrix entry, which this test catches."""
    h, eta, n = 0.1, 1.5, 2000
    t, lam, phi = _setup(n, h)              # f64 oracle phi
    cr, ci = jax.jit(fgn.fgn_matrices, static_argnums=(1, 2, 3))(
        _to_complex_device(phi), n, h, eta)

    m2 = oracles.next_pow2(n)
    idx = np.arange(n, dtype=np.int64)
    ang = (-2.0 * np.pi / m2) * ((idx[:, None] * idx[None, :]) % m2)
    c = phi[:n, None] * np.exp(1j * ang) * (np.sqrt(2.0 * h) * eta / m2)
    scale = np.max(np.abs(c))
    np.testing.assert_allclose(np.asarray(cr), np.real(c), atol=3e-6 * scale)
    np.testing.assert_allclose(np.asarray(ci), np.imag(c), atol=3e-6 * scale)


def test_forward_variance_matches_oracle(rng):
    h, eta, xi = 0.1, 1.5, 0.04
    n_steps = 50
    t = np.arange(n_steps + 1) / 252.0
    x = rng.normal(0, 0.1, n_steps)
    ref = oracles.forward_variance(x, t, xi, h, eta)
    ours = fgn.forward_variance(jnp.asarray(x, jnp.float32),
                                jnp.asarray(t, jnp.float32), xi, h, eta)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5)
