"""Cholesky-factored fGN form of the fused Pallas kernels.

The spectral map X = Zr @ Cr - Zi @ Ci is a linear map of iid normals,
hence Gaussian with covariance Cr^T Cr + Ci^T Ci; the "chol" form draws
X = N @ Lt from the Cholesky factor of that SAME covariance
(engine._chol_matrix_host) — identical law from one noise plane and one
matmul.  Tests: the factor identity (f32), the kernel math path
elementwise on the CPU interpreter, fused-policy equivalence against the
XLA policy evaluator on injected noise, and a moment-level distribution
check of chol-form paths against spectral-form paths.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from montecarlooptionspricer_tpu.models import engine, pathgen_pallas

from test_pallas import KW


def test_chol_factor_reproduces_spectral_covariance():
    n, dt = 96, 1 / 252
    lt = np.asarray(engine._chol_matrix_host(n, KW["h"], KW["eta"], dt,
                                             jnp.float32), np.float64)
    cr, ci = engine._fgn_matrices_np(n, KW["h"], KW["eta"], dt)
    cov = cr.T @ cr + ci.T @ ci
    # Upper-triangular (it is L^T), and Lt^T Lt == Cov up to the f32 cast.
    assert np.allclose(lt, np.triu(lt))
    np.testing.assert_allclose(lt.T @ lt, cov,
                               atol=3e-6 * float(np.max(np.abs(cov))))


def test_chol_math_path_matches_xla_elementwise(rng):
    n_steps, chunk, dt = 96, 512, 1 / 252
    gen, s_pad = pathgen_pallas.make_pallas_pathgen_from_noise(
        **KW, n_steps=n_steps, dt=dt, chunk_paths=chunk,
        block_paths=256, interpret=True, fgn_form="chol")
    noise = np.zeros((2, chunk, s_pad), np.float32)
    noise[:, :, :n_steps] = rng.normal(size=(2, chunk, n_steps))
    ours = np.asarray(gen(jnp.asarray(noise)))

    lt = np.asarray(engine._chol_matrix_host(n_steps, KW["h"], KW["eta"],
                                             dt, jnp.float32), np.float64)
    x = noise[0, :, :n_steps].astype(np.float64) @ lt
    t = np.arange(n_steps + 1) * dt
    v = KW["xi"] * np.exp(x - 0.5 * KW["eta"] ** 2
                          * t[:n_steps] ** (2 * KW["h"]))
    inc = ((KW["r"] - 0.5 * v) * dt
           + np.sqrt(np.maximum(v, 0)) * noise[1, :, :n_steps] * np.sqrt(dt))
    ref = KW["s0"] * np.exp(np.cumsum(inc, axis=1))
    ref = np.concatenate([np.full((chunk, 1), KW["s0"]), ref], axis=1)
    assert ours.shape == (chunk, n_steps + 1)
    np.testing.assert_allclose(ours, ref, rtol=2e-4)


def test_chol_paths_match_spectral_distribution(rng):
    """Moment check: chol-form and spectral-form paths from independent iid
    noise agree in terminal log-price mean/std well within sampling error
    (they are draws from the SAME law)."""
    n_steps, chunk, dt = 64, 2048, 1 / 252
    gen_c, s_pad = pathgen_pallas.make_pallas_pathgen_from_noise(
        **KW, n_steps=n_steps, dt=dt, chunk_paths=chunk,
        block_paths=256, interpret=True, fgn_form="chol")
    gen_s, _ = pathgen_pallas.make_pallas_pathgen_from_noise(
        **KW, n_steps=n_steps, dt=dt, chunk_paths=chunk,
        block_paths=256, interpret=True, fgn_form="spectral")
    nc = np.zeros((2, chunk, s_pad), np.float32)
    nc[:, :, :n_steps] = rng.normal(size=(2, chunk, n_steps))
    ns = np.zeros((3, chunk, s_pad), np.float32)
    ns[:, :, :n_steps] = rng.normal(size=(3, chunk, n_steps))
    log_c = np.log(np.asarray(gen_c(jnp.asarray(nc)))[:, -1])
    log_s = np.log(np.asarray(gen_s(jnp.asarray(ns)))[:, -1])
    # Terminal log-price stderr ~ std/sqrt(chunk); gate at 4 combined sigma.
    se = np.hypot(log_c.std() / np.sqrt(chunk), log_s.std() / np.sqrt(chunk))
    assert abs(log_c.mean() - log_s.mean()) < 4 * se
    assert abs(log_c.std() - log_s.std()) / log_s.std() < 0.15


def test_chol_fused_priced_kernel_matches_xla_policy(rng):
    """Fused (paths + LSM policy) chol kernel == XLA policy evaluation on
    the SAME chol-generated paths (CPU interpreter)."""
    from montecarlooptionspricer_tpu.models.lsm import lsm_fit

    n_steps, chunk, dt = 96, 512, 1 / 252
    strike, maturity, is_call = 102.0, n_steps * dt, False

    gen, s_pad = pathgen_pallas.make_pallas_pathgen_from_noise(
        **KW, n_steps=n_steps, dt=dt, chunk_paths=chunk,
        block_paths=256, interpret=True, fgn_form="chol")
    noise = np.zeros((2, chunk, s_pad), np.float32)
    noise[:, :, :n_steps] = rng.normal(size=(2, chunk, n_steps))
    paths = gen(jnp.asarray(noise))
    _, fits = lsm_fit(paths, KW["r"], strike, maturity, dt, is_call, 2)

    chunk_sum, _ = pathgen_pallas.make_pallas_priced_chunk(
        **KW, strike=strike, maturity=maturity, dt=dt, n_steps=n_steps,
        chunk_paths=chunk, block_paths=256, is_call=is_call,
        interpret=True, noise_input=True, fgn_form="chol")
    rows = pathgen_pallas.policy_rows(fits, KW["r"], strike, maturity, dt,
                                      n_steps, is_call)
    got = float(chunk_sum(jnp.asarray(noise), rows))

    want, _ = engine.lsm_policy_value(paths, fits, KW["r"], strike,
                                      maturity, dt, is_call)
    # Column 0 is handled outside the kernel; no time-0 exercise here.
    ex0, _ = pathgen_pallas.time0_value(fits, KW["s0"], strike, is_call)
    assert not bool(ex0)
    np.testing.assert_allclose(got, float(want), rtol=1e-5)


def test_tiled_chol_matches_single_tile_chol(rng):
    """Step-tiled chol kernel == single-tile chol kernel on identical
    injected noise across a multi-tile horizon (the same computation
    re-blocked, so agreement is to f32 reassociation)."""
    from montecarlooptionspricer_tpu.models import pathgen_pallas_tiled

    n_steps, chunk, dt = 200, 64, 1 / 252
    tiled, s_pad = pathgen_pallas_tiled.make_tiled_pathgen(
        **KW, n_steps=n_steps, dt=dt, chunk_paths=chunk, block_paths=32,
        interpret=True, noise_input=True, fgn_form="chol")
    assert s_pad == 256
    noise = np.zeros((2, chunk, s_pad), np.float32)
    noise[:, :, :n_steps] = rng.normal(size=(2, chunk, n_steps))
    noise[:, :, n_steps:] = 99.0  # padded tail must be ignored
    b = np.asarray(tiled(jnp.asarray(noise)))

    lt = np.asarray(engine._chol_matrix_host(n_steps, KW["h"], KW["eta"],
                                             dt, jnp.float32), np.float64)
    x = noise[0, :, :n_steps].astype(np.float64) @ lt
    t = np.arange(n_steps + 1) * dt
    v = KW["xi"] * np.exp(x - 0.5 * KW["eta"] ** 2
                          * t[:n_steps] ** (2 * KW["h"]))
    inc = ((KW["r"] - 0.5 * v) * dt + np.sqrt(np.maximum(v, 0))
           * noise[1, :, :n_steps] * np.sqrt(dt))
    ref = KW["s0"] * np.exp(np.cumsum(inc, axis=1))
    ref = np.concatenate([np.full((chunk, 1), KW["s0"]), ref], axis=1)
    np.testing.assert_allclose(b, ref, rtol=2e-4)
    assert np.all(np.isfinite(b))


def test_tiled_chol_priced_matches_xla_policy(rng):
    """Tiled fused chol (paths + LSM policy) == XLA policy evaluation on
    the same chol-generated paths, across tiles."""
    import jax

    from montecarlooptionspricer_tpu.models import pathgen_pallas_tiled
    from montecarlooptionspricer_tpu.models.lsm import lsm_fit

    s0, xi, h, eta, rho, r = 100.0, 0.04, 0.2, 1.0, -0.4, 0.04
    n_steps, chunk, dt = 200, 64, 1 / 252.0
    strike, maturity, is_call = 97.0, 200 / 252.0, False

    pilot = engine.make_chunk_pathgen(s0, xi, h, eta, rho, r, n_steps, dt,
                                      1 << 11)(jax.random.key(0))
    _, fits = lsm_fit(pilot, r, strike, maturity, dt, is_call, 2)

    gen, s_pad = pathgen_pallas_tiled.make_tiled_pathgen(
        s0, xi, h, eta, rho, r, n_steps, dt, chunk, block_paths=32,
        interpret=True, noise_input=True, fgn_form="chol")
    noise = jnp.asarray(rng.standard_normal((2, chunk, s_pad)), jnp.float32)
    paths = gen(noise)
    want, _ = engine.lsm_policy_value(paths, fits, r, strike, maturity, dt,
                                      is_call)
    priced, _ = pathgen_pallas_tiled.make_tiled_priced_chunk(
        s0, xi, h, eta, rho, r, strike, maturity, dt, n_steps, chunk,
        block_paths=32, is_call=is_call, interpret=True, noise_input=True,
        fgn_form="chol")
    rows = pathgen_pallas.policy_rows(fits, r, strike, maturity, dt,
                                      n_steps, is_call)
    got = priced(noise, rows)
    ex0, _ = pathgen_pallas.time0_value(fits, s0, strike, is_call)
    assert not bool(ex0)
    np.testing.assert_allclose(float(got), float(want), rtol=2e-4)


def test_tiled_chol_raises_step_budget():
    """One noise plane + one matrix slab: the chol slab kernel's VMEM step
    budget is ~2x the spectral one at every block size/dtype."""
    from montecarlooptionspricer_tpu.models import pathgen_pallas_tiled as m

    for block, dt_ in ((256, jnp.float32), (512, jnp.bfloat16)):
        spec = m.max_tiled_steps(block, dt_)
        chol = m.max_tiled_steps(block, dt_, "chol")
        assert chol >= 1.8 * spec


def test_streaming_pricer_accepts_fgn_form(rng):
    """fgn_form typos are rejected at CONSTRUCTION (they would otherwise
    be silently accepted on XLA code paths); valid literals construct and
    resolve to a concrete form."""
    with pytest.raises(ValueError):
        engine.StreamConfig(n_paths=1 << 12, n_steps=16,
                            chunk_paths=1 << 10, pilot_paths=1 << 10,
                            fgn_form="nonsense")
    for form in ("auto", "spectral", "chol"):
        cfg = engine.StreamConfig(n_paths=1 << 12, n_steps=16,
                                  chunk_paths=1 << 10, pilot_paths=1 << 10,
                                  fgn_form=form)
        assert engine._resolve_fgn_form(cfg) in ("spectral", "chol")

def test_single_tile_cap_is_form_aware():
    """The fused single-tile cap differentiates by form (VERIFY_r03 §11):
    chol keeps one [s_pad, s_pad] matrix resident instead of two, raising
    the hardware-measured cap to 1024 padded steps; the VMEM byte model
    reproduces the measured block limits exactly (parity/single_tile_cap:
    block 256 fits at 768 pad, overruns by 60 KiB at 1024 pad, 128 fits)."""
    assert pathgen_pallas.supports(512)
    assert not pathgen_pallas.supports(513)           # spectral cap: 512
    assert pathgen_pallas.supports(513, "chol")
    assert pathgen_pallas.supports(1024, "chol")      # chol cap: 1024
    assert not pathgen_pallas.supports(1025, "chol")

    assert pathgen_pallas.max_block_paths(365, "chol") == 512
    assert pathgen_pallas.max_block_paths(700, "chol") == 256
    assert pathgen_pallas.max_block_paths(1000, "chol") == 128
    assert pathgen_pallas.max_block_paths(512, "spectral") >= 256


def test_fused_block_budget_rejects_loudly():
    """A direct caller passing a block past the VMEM budget gets a named
    error instead of an opaque Mosaic scoped-vmem compile crash; the
    engine clamps the configured block automatically."""
    with pytest.raises(ValueError, match="max is 128"):
        pathgen_pallas.make_pallas_pathgen(
            **KW, n_steps=1000, dt=1 / 252, chunk_paths=1 << 10,
            block_paths=256, interpret=True, fgn_form="chol")
    cfg = engine.StreamConfig(n_paths=1 << 12, n_steps=1000,
                              chunk_paths=1 << 10, pilot_paths=1 << 10,
                              pathgen_impl="pallas", fgn_form="chol")
    assert engine._fused_block(cfg, 1000) == 128


def test_chol_math_path_matches_xla_at_raised_cap(rng):
    """Elementwise math-path check (CPU interpreter) at a horizon past the
    old 512-lane cap: the single-tile chol kernel at s_pad = 768 computes
    the same map as the f64 NumPy oracle."""
    n_steps, chunk, dt = 700, 256, 1 / 252
    gen, s_pad = pathgen_pallas.make_pallas_pathgen_from_noise(
        **KW, n_steps=n_steps, dt=dt, chunk_paths=chunk,
        block_paths=128, interpret=True, fgn_form="chol")
    assert s_pad == 768
    noise = np.zeros((2, chunk, s_pad), np.float32)
    noise[:, :, :n_steps] = rng.normal(size=(2, chunk, n_steps))
    ours = np.asarray(gen(jnp.asarray(noise)))

    lt = np.asarray(engine._chol_matrix_host(n_steps, KW["h"], KW["eta"],
                                             dt, jnp.float32), np.float64)
    x = noise[0, :, :n_steps].astype(np.float64) @ lt
    t = np.arange(n_steps + 1) * dt
    v = KW["xi"] * np.exp(x - 0.5 * KW["eta"] ** 2
                          * t[:n_steps] ** (2 * KW["h"]))
    inc = ((KW["r"] - 0.5 * v) * dt
           + np.sqrt(np.maximum(v, 0)) * noise[1, :, :n_steps] * np.sqrt(dt))
    ref = KW["s0"] * np.exp(np.cumsum(inc, axis=1))
    ref = np.concatenate([np.full((chunk, 1), KW["s0"]), ref], axis=1)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=1e-5)
