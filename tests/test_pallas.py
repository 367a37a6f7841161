"""Pallas fused path-generation kernel tests.

The math path (fGN matmul + variance + Euler cumsum) is validated
elementwise against the XLA generator using the noise-injection variant —
runnable on CPU via the TPU interpreter.  The in-kernel RNG variant needs a
real TPU (the interpreter stubs prng_random_bits to zeros in this JAX
version); its distribution is exercised by scripts/verify_tpu.py and
bench.py on hardware.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from montecarlooptionspricer_tpu.models import engine, pathgen_pallas

KW = dict(s0=100.0, xi=0.05, h=0.15, eta=1.4, rho=-0.5, r=0.04)


def xla_paths_from_noise(noise, n_steps, dt=1 / 252):
    """The engine generator's math, fed with explicit noise planes
    (Zr, Zi, W — the reference's w1/w2 pair is one normal in distribution,
    rough_volatility.euler_log_paths)."""
    zr, zi, w = noise[:, :, :n_steps]
    cr, ci = engine._fgn_matrices_host(n_steps, KW["h"], KW["eta"], dt,
                                       jnp.float32)
    x = zr @ cr - zi @ ci
    t = np.arange(n_steps + 1) * dt
    v = KW["xi"] * np.exp(np.asarray(x)
                          - 0.5 * KW["eta"] ** 2 * t[:n_steps] ** (2 * KW["h"]))
    inc = (KW["r"] - 0.5 * v) * dt + np.sqrt(np.maximum(v, 0)) * (
        w * np.sqrt(dt))
    s = KW["s0"] * np.exp(np.cumsum(np.asarray(inc), axis=1))
    return np.concatenate([np.full((noise.shape[1], 1), KW["s0"]), s], axis=1)


def test_pallas_math_path_matches_xla_elementwise(rng):
    n_steps, chunk = 96, 512
    gen, s_pad = pathgen_pallas.make_pallas_pathgen_from_noise(
        **KW, n_steps=n_steps, dt=1 / 252, chunk_paths=chunk,
        block_paths=256, interpret=True)
    noise = np.zeros((3, chunk, s_pad), np.float32)
    noise[:, :, :n_steps] = rng.normal(size=(3, chunk, n_steps))
    ours = np.asarray(gen(jnp.asarray(noise)))
    ref = xla_paths_from_noise(noise, n_steps)
    assert ours.shape == (chunk, n_steps + 1)
    np.testing.assert_allclose(ours, ref, rtol=2e-4)


def test_pallas_math_path_nonaligned_steps(rng):
    # 37 steps pads to 128 lanes; the padded tail must not leak into output.
    n_steps, chunk = 37, 256
    gen, s_pad = pathgen_pallas.make_pallas_pathgen_from_noise(
        **KW, n_steps=n_steps, dt=1 / 252, chunk_paths=chunk,
        block_paths=256, interpret=True)
    noise = np.zeros((3, chunk, s_pad), np.float32)
    noise[:, :, :n_steps] = rng.normal(size=(3, chunk, n_steps))
    # garbage in the padded tail should be ignored (C matrices zero there,
    # increments masked)
    noise[:, :, n_steps:] = 99.0
    ours = np.asarray(gen(jnp.asarray(noise)))
    ref = xla_paths_from_noise(noise, n_steps)
    np.testing.assert_allclose(ours, ref, rtol=2e-4)
    assert np.all(np.isfinite(ours))


def test_pallas_rejects_bad_block():
    with pytest.raises(ValueError):
        pathgen_pallas.make_pallas_pathgen(
            **KW, n_steps=32, dt=1 / 252, chunk_paths=1000, block_paths=256)


def test_fused_priced_kernel_matches_xla_policy(rng):
    """Fused (paths + LSM policy) kernel == XLA generator + lsm_policy_value
    on identical injected noise (CPU interpreter)."""
    import jax
    import jax.numpy as jnp
    from montecarlooptionspricer_tpu.models import engine
    from montecarlooptionspricer_tpu.models.lsm import lsm_fit

    s0, xi, h, eta, rho, r = 100.0, 0.04, 0.2, 1.0, -0.4, 0.04
    n_steps, chunk, dt = 48, 256, 1 / 252.0
    strike, maturity, is_call = 97.0, 48 / 252.0, False   # OTM put at t=0

    # a pilot fit from the XLA generator
    pilot = engine.make_chunk_pathgen(s0, xi, h, eta, rho, r, n_steps, dt,
                                      1 << 11)(jax.random.key(0))
    _, fits = lsm_fit(pilot, r, strike, maturity, dt, is_call, 2)

    gen, s_pad = pathgen_pallas.make_pallas_pathgen_from_noise(
        s0, xi, h, eta, rho, r, n_steps, dt, chunk, block_paths=64,
        interpret=True)
    noise = jnp.asarray(rng.standard_normal((3, chunk, s_pad)), jnp.float32)
    paths = gen(noise)
    want, _ = engine.lsm_policy_value(paths, fits, r, strike, maturity, dt,
                                      is_call)

    priced, s_pad2 = pathgen_pallas.make_pallas_priced_chunk(
        s0, xi, h, eta, rho, r, strike, maturity, dt, n_steps, chunk,
        block_paths=64, is_call=is_call, interpret=True, noise_input=True)
    assert s_pad2 == s_pad
    rows = pathgen_pallas.policy_rows(fits, r, strike, maturity, dt,
                                      n_steps, is_call)
    got = priced(noise, rows)
    ex0, p0 = pathgen_pallas.time0_value(fits, s0, strike, is_call)
    assert not bool(ex0)
    np.testing.assert_allclose(float(got), float(want), rtol=2e-4)


def test_fused_kernel_time0_exercise_path():
    """Deep-ITM put at t=0: the time-0 scalar decision takes over."""
    import jax
    from montecarlooptionspricer_tpu.models import engine
    from montecarlooptionspricer_tpu.models.lsm import lsm_fit

    s0, strike = 100.0, 160.0
    pilot = engine.make_chunk_pathgen(s0, 0.04, 0.2, 1.0, -0.4, 0.04, 16,
                                      1 / 252.0, 1 << 10)(jax.random.key(0))
    _, fits = lsm_fit(pilot, 0.04, strike, 16 / 252.0, 1 / 252.0, False, 2)
    ex0, p0 = pathgen_pallas.time0_value(fits, s0, strike, False)
    assert bool(ex0) and p0 == 60.0


def test_pathgen_lane_multiple_steps(rng):
    """n_steps that is an exact lane multiple (128): the output block has
    one more padded lane-group than the step block — regression test for a
    shape mismatch in the store."""
    import jax.numpy as jnp

    gen, s_pad = pathgen_pallas.make_pallas_pathgen_from_noise(
        100.0, 0.04, 0.2, 1.0, -0.4, 0.04, 128, 1 / 252.0, 64,
        block_paths=8, interpret=True)
    assert s_pad == 128
    noise = jnp.asarray(rng.standard_normal((3, 64, 128)), jnp.float32)
    paths = gen(noise)
    assert paths.shape == (64, 129)
    assert np.all(np.asarray(paths[:, 0]) == 100.0)
    assert np.all(np.isfinite(np.asarray(paths)))


def test_fused_kernel_cv_output_matches_path_block(rng):
    """with_cv=True: the kernel's second output lane must equal the
    martingale control e^{-rT} sum(S_T) computed from the same paths, and
    lane 0 must be unchanged from the CV-less kernel (CPU interpreter)."""
    import jax
    import jax.numpy as jnp
    from montecarlooptionspricer_tpu.models import engine
    from montecarlooptionspricer_tpu.models.lsm import lsm_fit

    s0, xi, h, eta, rho, r = 100.0, 0.04, 0.2, 1.0, -0.4, 0.04
    n_steps, chunk, dt = 48, 256, 1 / 252.0
    strike, maturity, is_call = 97.0, 48 / 252.0, False

    pilot = engine.make_chunk_pathgen(s0, xi, h, eta, rho, r, n_steps, dt,
                                      1 << 11)(jax.random.key(0))
    _, fits = lsm_fit(pilot, r, strike, maturity, dt, is_call, 2)
    rows = pathgen_pallas.policy_rows(fits, r, strike, maturity, dt,
                                      n_steps, is_call)

    gen, s_pad = pathgen_pallas.make_pallas_pathgen_from_noise(
        s0, xi, h, eta, rho, r, n_steps, dt, chunk, block_paths=64,
        interpret=True)
    noise = jnp.asarray(rng.standard_normal((3, chunk, s_pad)), jnp.float32)
    paths = gen(noise)
    want_cv = float(jnp.sum(engine.martingale_control(
        paths[:, :n_steps + 1], r, dt)))

    kw = dict(strike=strike, maturity=maturity, dt=dt, n_steps=n_steps,
              chunk_paths=chunk, block_paths=64, is_call=is_call,
              interpret=True, noise_input=True)
    plain, _ = pathgen_pallas.make_pallas_priced_chunk(
        s0, xi, h, eta, rho, r, **kw)
    cv, _ = pathgen_pallas.make_pallas_priced_chunk(
        s0, xi, h, eta, rho, r, **kw, with_cv=True)
    got_plain = float(plain(noise, rows))
    got_a, got_c = cv(noise, rows)
    np.testing.assert_allclose(float(got_a), got_plain, rtol=1e-6)
    np.testing.assert_allclose(float(got_c), want_cv, rtol=2e-5)

def test_fused_priced_log_boundary_matches_comparator(rng):
    """Fused priced kernel with policy_form="boundary" (LOG-space interval
    test, one exp per path — VERIFY_r03 §12) == the XLA boundary-form
    comparator on identical injected noise (CPU interpreter).  Tolerance
    covers the one-ulp root-band decision class shared with the chain
    kernel's boundary form."""
    from montecarlooptionspricer_tpu.models.lsm import lsm_fit

    s0, xi, h, eta, rho, r = 100.0, 0.04, 0.2, 1.0, -0.4, 0.04
    n_steps, chunk, dt = 48, 256, 1 / 252.0
    strike, maturity, is_call = 97.0, 48 / 252.0, False

    pilot = engine.make_chunk_pathgen(s0, xi, h, eta, rho, r, n_steps, dt,
                                      1 << 11)(jax.random.key(0))
    _, fits = lsm_fit(pilot, r, strike, maturity, dt, is_call, 2)

    gen, s_pad = pathgen_pallas.make_pallas_pathgen_from_noise(
        s0, xi, h, eta, rho, r, n_steps, dt, chunk, block_paths=64,
        interpret=True)
    noise = jnp.asarray(rng.standard_normal((3, chunk, s_pad)), jnp.float32)
    paths = gen(noise)

    tab = pathgen_pallas.boundary_rows(fits, r, strike, maturity, dt,
                                       n_steps, is_call)
    want = pathgen_pallas.boundary_policy_value(paths, tab, n_steps,
                                                is_call)

    priced, _ = pathgen_pallas.make_pallas_priced_chunk(
        s0, xi, h, eta, rho, r, strike, maturity, dt, n_steps, chunk,
        block_paths=64, is_call=is_call, interpret=True, noise_input=True,
        policy_form="boundary")
    got = priced(noise, pathgen_pallas.log_boundary_rows(tab))
    np.testing.assert_allclose(float(got), float(want), rtol=5e-4)

    # CV variant: the martingale-control lane (one exp per path at the
    # terminal step) matches the direct e^{-rT} sum(S_T).
    priced_cv, _ = pathgen_pallas.make_pallas_priced_chunk(
        s0, xi, h, eta, rho, r, strike, maturity, dt, n_steps, chunk,
        block_paths=64, is_call=is_call, interpret=True, noise_input=True,
        policy_form="boundary", with_cv=True)
    got2, cv = priced_cv(noise, pathgen_pallas.log_boundary_rows(tab))
    want_cv = float(np.exp(-r * n_steps * dt)
                    * np.sum(np.asarray(paths)[:, n_steps]))
    np.testing.assert_allclose(float(got2), float(got), rtol=1e-5)
    np.testing.assert_allclose(float(cv), want_cv, rtol=2e-4)


def test_fused_priced_log_boundary_no_exercise_is_zero(rng):
    """Paths that never enter the exercise interval contribute exactly 0
    (the masked reductions collapse to ls_stop = d_stop = 0)."""
    s0, xi, h, eta, rho, r = 100.0, 0.04, 0.2, 1.0, -0.4, 0.04
    n_steps, chunk, dt = 32, 128, 1 / 252.0
    priced, s_pad = pathgen_pallas.make_pallas_priced_chunk(
        s0, xi, h, eta, rho, r, 90.0, 32 / 252.0, dt, n_steps, chunk,
        block_paths=64, is_call=False, interpret=True, noise_input=True,
        policy_form="boundary")
    noise = jnp.asarray(rng.standard_normal((3, chunk, s_pad)) * 1e-3,
                        jnp.float32)
    big = 1e30
    # Empty intervals everywhere: lo = +big, hi = -big.
    rows = jnp.zeros((8, s_pad), jnp.float32)
    rows = rows.at[0].set(big).at[1].set(-big).at[2].set(1.0)
    assert float(priced(noise, rows)) == 0.0


def test_stream_config_validates_policy_form():
    with pytest.raises(ValueError, match="policy_form"):
        engine.StreamConfig(n_paths=1 << 10, n_steps=16,
                            chunk_paths=1 << 9, pilot_paths=1 << 9,
                            policy_form="nonsense")
    with pytest.raises(ValueError, match="policy_form"):
        pathgen_pallas.make_pallas_priced_chunk(
            100.0, 0.04, 0.2, 1.0, -0.4, 0.04, 97.0, 48 / 252.0, 1 / 252.0,
            48, 256, block_paths=64, interpret=True, noise_input=True,
            policy_form="nonsense")


def test_fused_priced_antithetic_matches_pair(rng):
    """antithetic=True on injected noise (chunk/2 rows per plane) equals
    the plain kernel run on +noise plus on -noise: per-member arithmetic
    is the plain body's — only the draw count halves — so the value (and
    CV) sums must agree to f32 summation-order noise.  Chol form, the
    production configuration."""
    from montecarlooptionspricer_tpu.models.lsm import lsm_fit

    s0, xi, h, eta, rho, r = 100.0, 0.04, 0.2, 1.0, -0.4, 0.04
    n_steps, chunk, dt = 48, 256, 1 / 252.0
    strike, maturity, is_call = 97.0, 48 / 252.0, False
    half = chunk // 2

    pilot = engine.make_chunk_pathgen(s0, xi, h, eta, rho, r, n_steps, dt,
                                      1 << 11)(jax.random.key(0))
    _, fits = lsm_fit(pilot, r, strike, maturity, dt, is_call, 2)
    rows = pathgen_pallas.log_boundary_rows(
        pathgen_pallas.boundary_rows(fits, r, strike, maturity, dt,
                                     n_steps, is_call))

    kw = dict(is_call=is_call, interpret=True, noise_input=True,
              policy_form="boundary", fgn_form="chol", with_cv=True)
    anti, s_pad = pathgen_pallas.make_pallas_priced_chunk(
        s0, xi, h, eta, rho, r, strike, maturity, dt, n_steps, chunk,
        block_paths=64, antithetic=True, **kw)
    plain, _ = pathgen_pallas.make_pallas_priced_chunk(
        s0, xi, h, eta, rho, r, strike, maturity, dt, n_steps, half,
        block_paths=32, **kw)

    noise = jnp.asarray(rng.standard_normal((2, half, s_pad)), jnp.float32)
    got_v, got_c = anti(noise, rows)
    vp, cp = plain(noise, rows)
    vm, cm = plain(-noise, rows)
    np.testing.assert_allclose(float(got_v), float(vp) + float(vm),
                               rtol=1e-6)
    np.testing.assert_allclose(float(got_c), float(cp) + float(cm),
                               rtol=1e-6)


@pytest.mark.parametrize("antithetic", [False, True])
def test_fused_priced_interleave_matches_subblocks(rng, antithetic):
    """interleave=2 on injected noise equals the plain kernel run on each
    disjoint half of the noise rows: per-sub-chain arithmetic is the
    plain body's at half the block size — only the scheduler's freedom
    changes — so the value (and CV) sums must agree to f32
    summation-order noise.  Chol form, the production configuration;
    composes with antithetic pairing."""
    from montecarlooptionspricer_tpu.models.lsm import lsm_fit

    s0, xi, h, eta, rho, r = 100.0, 0.04, 0.2, 1.0, -0.4, 0.04
    n_steps, chunk, dt = 48, 128, 1 / 252.0
    strike, maturity, is_call = 97.0, 48 / 252.0, False
    rows_n = chunk // 2 if antithetic else chunk

    pilot = engine.make_chunk_pathgen(s0, xi, h, eta, rho, r, n_steps, dt,
                                      1 << 11)(jax.random.key(0))
    _, fits = lsm_fit(pilot, r, strike, maturity, dt, is_call, 2)
    rows = pathgen_pallas.log_boundary_rows(
        pathgen_pallas.boundary_rows(fits, r, strike, maturity, dt,
                                     n_steps, is_call))

    kw = dict(is_call=is_call, interpret=True, noise_input=True,
              policy_form="boundary", fgn_form="chol", with_cv=True,
              antithetic=antithetic)
    inter, s_pad = pathgen_pallas.make_pallas_priced_chunk(
        s0, xi, h, eta, rho, r, strike, maturity, dt, n_steps, chunk,
        block_paths=chunk, interleave=2, **kw)
    plain, _ = pathgen_pallas.make_pallas_priced_chunk(
        s0, xi, h, eta, rho, r, strike, maturity, dt, n_steps,
        chunk // 2, block_paths=chunk // 2, **kw)

    noise = jnp.asarray(rng.standard_normal((2, rows_n, s_pad)),
                        jnp.float32)
    got_v, got_c = inter(noise, rows)
    half = rows_n // 2
    va, ca = plain(noise[:, :half], rows)
    vb, cb = plain(noise[:, half:], rows)
    np.testing.assert_allclose(float(got_v), float(va) + float(vb),
                               rtol=1e-6)
    np.testing.assert_allclose(float(got_c), float(ca) + float(cb),
                               rtol=1e-6)


def test_fused_priced_staggered_matches_chained(rng):
    """schedule='staggered' is a pure program-order rewrite of the
    chained interleave=2 body: same draws per half, same per-half
    arithmetic, same valA + valB reduction order — so on injected noise
    the two kernels' (value, CV) sums must be BITWISE equal.  This is
    the correctness half of the hand-staggered pipeline A/B (VERIFY_r04
    §4's named lever); the throughput half runs on hardware via
    BENCH_SCHEDULE=staggered."""
    from montecarlooptionspricer_tpu.models.lsm import lsm_fit

    s0, xi, h, eta, rho, r = 100.0, 0.04, 0.2, 1.0, -0.4, 0.04
    n_steps, chunk, dt = 48, 128, 1 / 252.0
    strike, maturity, is_call = 97.0, 48 / 252.0, False

    pilot = engine.make_chunk_pathgen(s0, xi, h, eta, rho, r, n_steps, dt,
                                      1 << 11)(jax.random.key(0))
    _, fits = lsm_fit(pilot, r, strike, maturity, dt, is_call, 2)
    rows = pathgen_pallas.log_boundary_rows(
        pathgen_pallas.boundary_rows(fits, r, strike, maturity, dt,
                                     n_steps, is_call))

    kw = dict(is_call=is_call, interpret=True, noise_input=True,
              policy_form="boundary", fgn_form="chol", with_cv=True)
    chained, s_pad = pathgen_pallas.make_pallas_priced_chunk(
        s0, xi, h, eta, rho, r, strike, maturity, dt, n_steps, chunk,
        block_paths=chunk, interleave=2, **kw)
    staggered, _ = pathgen_pallas.make_pallas_priced_chunk(
        s0, xi, h, eta, rho, r, strike, maturity, dt, n_steps, chunk,
        block_paths=chunk, interleave=2, schedule="staggered", **kw)

    noise = jnp.asarray(rng.standard_normal((2, chunk, s_pad)),
                        jnp.float32)
    vc, cc = chained(noise, rows)
    vs, cs = staggered(noise, rows)
    assert float(vc) == float(vs), (float(vc), float(vs))
    assert float(cc) == float(cs), (float(cc), float(cs))


def test_staggered_config_rejections():
    """The staggered schedule is exactly the two-half pipeline: anything
    else (chain counts, quadratic form, antithetic) rejects loudly, at
    the kernel maker and at StreamConfig construction."""
    args = (100.0, 0.04, 0.2, 1.0, -0.4, 0.04, 97.0, 48 / 252.0,
            1 / 252.0, 48, 128)
    with pytest.raises(ValueError, match="staggered"):
        pathgen_pallas.make_pallas_priced_chunk(
            *args, block_paths=64, interpret=True, noise_input=True,
            policy_form="boundary", interleave=4, schedule="staggered")
    with pytest.raises(ValueError, match="staggered"):
        pathgen_pallas.make_pallas_priced_chunk(
            *args, block_paths=64, interpret=True, noise_input=True,
            policy_form="boundary", interleave=2, antithetic=True,
            schedule="staggered")
    with pytest.raises(ValueError, match="schedule"):
        pathgen_pallas.make_pallas_priced_chunk(
            *args, block_paths=64, interpret=True, noise_input=True,
            policy_form="boundary", interleave=2, schedule="zigzag")
    with pytest.raises(ValueError, match="staggered"):
        engine.StreamConfig(n_paths=1 << 10, n_steps=48,
                            chunk_paths=1 << 10,
                            pallas_schedule="staggered")
    cfg = engine.StreamConfig(n_paths=1 << 10, n_steps=48,
                              chunk_paths=1 << 10, pallas_interleave=2,
                              pallas_schedule="staggered")
    assert cfg.pallas_schedule == "staggered"


def test_interleave_config_rejections():
    """interleave > 1 exists only in the log-boundary fused body; the
    quadratic form and non-splittable blocks reject loudly."""
    mk = dict(s0=100.0, xi=0.04, h=0.2, eta=1.0, rho=-0.4, r=0.04,
              strike=97.0, maturity=48 / 252.0, dt=1 / 252.0, n_steps=48,
              chunk_paths=128, block_paths=64, interpret=True,
              noise_input=True)
    with pytest.raises(ValueError, match="interleave"):
        pathgen_pallas.make_pallas_priced_chunk(
            *(mk[k] for k in ("s0", "xi", "h", "eta", "rho", "r",
                              "strike", "maturity", "dt", "n_steps",
                              "chunk_paths")),
            block_paths=64, interpret=True, noise_input=True,
            policy_form="quadratic", interleave=2)
    with pytest.raises(ValueError, match="interleave"):
        pathgen_pallas.make_pallas_priced_chunk(
            *(mk[k] for k in ("s0", "xi", "h", "eta", "rho", "r",
                              "strike", "maturity", "dt", "n_steps",
                              "chunk_paths")),
            block_paths=64, interpret=True, noise_input=True,
            policy_form="boundary", interleave=3)


def test_antithetic_config_rejections():
    """antithetic exists inside the fused boundary bodies (single-tile
    and slab) and the XLA generator; every other configuration (and
    every surface without the pairing) rejects loudly instead of
    silently streaming plain MC."""
    base = dict(n_paths=1 << 12, n_steps=32, chunk_paths=1 << 10,
                pilot_paths=1 << 9, antithetic=True)
    kwargs = dict(s0=100.0, xi=0.04, h=0.2, eta=1.0, rho=-0.4, r=0.04,
                  strike=102.0, maturity=32 / 252.0, is_call=False)
    for bad in (dict(pathgen_impl="pallas", policy_form="quadratic"),
                dict(qmc=True)):   # QMC forces XLA; no pairing either way
        with pytest.raises(ValueError, match="antithetic"):
            engine.StreamingPricer(
                **kwargs, config=engine.StreamConfig(**base, **bad))
    # The XLA generator pairs at the noise level: price, bounds, AND jvp
    # Greeks all construct and run (tiny CPU shapes).
    px = engine.StreamingPricer(
        **kwargs, config=engine.StreamConfig(**base))
    p, se = px.price(jax.random.key(0), with_stderr=True)
    assert np.isfinite(p) and np.isfinite(se) and se > 0
    lo, up = px.price_with_bounds(jax.random.key(1))
    assert np.isfinite(lo) and np.isfinite(up) and lo <= up
    g = px.price_and_greeks(jax.random.key(2))
    assert all(np.isfinite(v) for v in g), g
    # r04: the factored-DFT long-horizon kernel pairs too (both DFT
    # stages are linear in the noise) — a spectral horizon past the
    # single-tile cap resolves to it and CONSTRUCTS.
    engine.StreamingPricer(
        s0=100.0, xi=0.04, h=0.2, eta=1.0, rho=-0.4, r=0.04,
        strike=102.0, maturity=600 / 252.0, is_call=False,
        config=engine.StreamConfig(
            n_paths=1 << 12, n_steps=600, chunk_paths=1 << 10,
            pilot_paths=1 << 9, antithetic=True,
            pathgen_impl="pallas", fgn_form="spectral"))
    # The chol slab pairs: a horizon past the single-tile chol cap
    # (1024 padded steps) constructs.
    engine.StreamingPricer(
        s0=100.0, xi=0.04, h=0.2, eta=1.0, rho=-0.4, r=0.04,
        strike=102.0, maturity=1100 / 252.0, is_call=False,
        config=engine.StreamConfig(
            n_paths=1 << 12, n_steps=1100, chunk_paths=1 << 10,
            pilot_paths=1 << 9, antithetic=True, pathgen_impl="pallas"))
    # Eligible single-tile pallas config constructs with NO surface
    # rejections left (fused price/Greeks pair in-kernel, the whole-path
    # pallas generator pairs for bounds — all exercised on hardware).
    engine.StreamingPricer(
        **kwargs,
        config=engine.StreamConfig(**base, pathgen_impl="pallas"))
    # Chain pricer: the fused boundary chain PAIRS (constructs; its
    # Greeks pair in-kernel too — exercised in test_pallas_greeks);
    # non-fused chain configurations reject.
    chain_kw = dict(s0=100.0, xi=0.04, h=0.2, eta=1.0, rho=-0.4, r=0.04,
                    strikes=[100.0], maturity=32 / 252.0, is_call=False)
    chain_base = dict(n_paths=1 << 12, n_steps=32, chunk_paths=1 << 10,
                      pilot_paths=1 << 9, pathgen_impl="pallas",
                      antithetic=True)
    engine.StreamingChainPricer(
        **chain_kw, config=engine.StreamConfig(**chain_base))
    for bad in (dict(chain_policy_form="quadratic"), dict(qmc=True)):
        with pytest.raises(ValueError, match="antithetic"):
            engine.StreamingChainPricer(
                **chain_kw,
                config=engine.StreamConfig(**chain_base, **bad))
    # Bucketed chains force the XLA generator, which pairs: the serving
    # configuration constructs and prices under antithetic.
    bc = engine.StreamingChainPricer(
        **chain_kw, bucketed=True,
        config=engine.StreamConfig(**chain_base))
    pb = bc.price(jax.random.key(1), n_steps_live=24,
                  maturity=24 / 252.0)
    assert np.all(np.isfinite(pb)), pb


def test_antithetic_price_and_variance_on_chip():
    """Real TPU: the antithetic estimator agrees with plain MC within
    combined stderr, and its measured stderr is materially smaller (the
    put payoff is monotone in the terminal price, the classic
    negative-pairing case).  64 iid chunks make the stderr estimates
    tight enough that se_anti < 0.9 * se_plain is far from flaky at the
    expected ~0.5-0.7 ratio."""
    if jax.devices()[0].platform != "tpu":
        pytest.skip("requires a real TPU for in-kernel PRNG")
    kwargs = dict(s0=100.0, xi=0.04, h=0.2, eta=1.0, rho=-0.4, r=0.04,
                  strike=102.0, maturity=48 / 252.0, is_call=False)
    base = dict(n_paths=1 << 18, n_steps=48, chunk_paths=1 << 12,
                pilot_paths=1 << 13, pathgen_impl="pallas",
                chunks_per_call=64)
    plain = engine.StreamingPricer(
        **kwargs, config=engine.StreamConfig(**base))
    anti = engine.StreamingPricer(
        **kwargs, config=engine.StreamConfig(**base, antithetic=True))
    pp, sp = plain.price(jax.random.key(7), with_stderr=True)
    pa, sa = anti.price(jax.random.key(7), with_stderr=True)
    assert abs(pa - pp) < 4.0 * float(np.hypot(sa, sp)), (pa, pp, sa, sp)
    assert sa < 0.9 * sp, (sa, sp)


def test_pallas_pathgen_antithetic_matches_pair(rng):
    """Whole-path generator antithetic=True on injected noise (chunk/2
    rows per plane) == plain generator rows on +noise stacked on -noise:
    the pair shares one fGN matmul but each member's Euler arithmetic is
    the plain body's (chol form, the production configuration)."""
    s0, xi, h, eta, rho, r = 100.0, 0.04, 0.2, 1.0, -0.4, 0.04
    n_steps, chunk, dt = 48, 128, 1 / 252.0
    half = chunk // 2

    kw = dict(interpret=True, fgn_form="chol")
    anti, s_pad = pathgen_pallas.make_pallas_pathgen_from_noise(
        s0, xi, h, eta, rho, r, n_steps, dt, chunk, block_paths=64,
        antithetic=True, **kw)
    plain, _ = pathgen_pallas.make_pallas_pathgen_from_noise(
        s0, xi, h, eta, rho, r, n_steps, dt, half, block_paths=32, **kw)

    noise = jnp.asarray(rng.standard_normal((2, half, s_pad)), jnp.float32)
    got = np.asarray(anti(noise))
    # Pairing is per BLOCK (each grid block's halves are partners), so
    # the expected layout interleaves block-sized (+/-) slabs: block b of
    # the antithetic gen consumes noise rows [32b, 32b+32) and emits
    # [f(+n_b); f(-n_b)].
    p_plus = np.asarray(plain(noise))
    p_minus = np.asarray(plain(-noise))
    want = np.concatenate([p_plus[:32], p_minus[:32],
                           p_plus[32:], p_minus[32:]], axis=0)
    np.testing.assert_allclose(got, want, rtol=1e-6)
