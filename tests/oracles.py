"""NumPy float64 oracles re-implementing the *semantics* of the C++ reference
algorithms, loop-for-loop, for parity testing (SURVEY.md section 4:
"statistical parity tests vs the C++ algorithms ... re-run in numpy").

These are written from the algorithm descriptions (file:line cited per
function), deliberately in slow scalar style so they are independently
auditable against the C++ and structurally unlike the vectorized JAX
implementations they validate.
"""

from __future__ import annotations

import numpy as np


def payoff(is_call: bool, s: float, k: float) -> float:
    """include/core/common.h:8-14."""
    return max(0.0, s - k) if is_call else max(0.0, k - s)


def next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


def dft_forward_cpp(a: np.ndarray) -> np.ndarray:
    """The reference's forward FFT (RoughVolatility.cpp:171-196, inv=+1)
    computed as a direct O(n^2) DFT with the e^{+i} kernel."""
    n = a.size
    k = np.arange(n)
    kernel = np.exp(2j * np.pi * np.outer(k, k) / n)
    return kernel @ a.astype(np.complex128)


def dft_inverse_cpp(a: np.ndarray) -> np.ndarray:
    """The reference's inverse FFT (inv=-1): e^{-i} kernel, divided by n."""
    n = a.size
    k = np.arange(n)
    kernel = np.exp(-2j * np.pi * np.outer(k, k) / n)
    return (kernel @ a.astype(np.complex128)) / n


def rbergomi_lambda(time_grid: np.ndarray, h: float) -> np.ndarray:
    """RoughVolatility.cpp:227-236."""
    return 0.5 * np.power(time_grid, 2.0 * h)


def rbergomi_phi(lam: np.ndarray) -> np.ndarray:
    """RoughVolatility.cpp:212-225: zero-pad to next pow2, forward DFT."""
    m1 = next_pow2(lam.size)
    padded = np.zeros(m1, dtype=np.complex128)
    padded[: lam.size] = lam
    return dft_forward_cpp(padded)


def fractional_gaussian(phi: np.ndarray, z: np.ndarray, h: float,
                        eta: float) -> np.ndarray:
    """RoughVolatility.cpp:264-292 for a single path."""
    n = z.size
    m2 = next_pow2(n)
    a = np.zeros(m2, dtype=np.complex128)
    a[:n] = phi[:n] * z
    res = dft_inverse_cpp(a).real
    return (np.sqrt(2.0 * h) * eta * res)[:n]


def forward_variance(x: np.ndarray, t_grid: np.ndarray, xi: float, h: float,
                     eta: float) -> np.ndarray:
    """RoughVolatility.cpp:294-309."""
    n = x.size
    out = np.empty(n)
    for i in range(n):
        ma = -0.5 * eta * eta * t_grid[i] ** (2.0 * h)
        out[i] = xi * np.exp(x[i] + ma)
    return out


def euler_paths(s0: float, r: float, rho: float, v: np.ndarray,
                w1: np.ndarray, w2: np.ndarray, dt: float) -> np.ndarray:
    """RoughVolatility.cpp:351-365 for a [paths, steps] variance/noise block."""
    n_paths, n_steps = v.shape
    out = np.zeros((n_paths, n_steps + 1))
    out[:, 0] = s0
    for i in range(n_paths):
        for j in range(1, n_steps + 1):
            dw1 = np.sqrt(dt) * w1[i, j - 1]
            dw2 = np.sqrt(dt) * w2[i, j - 1]
            dw = rho * dw1 + np.sqrt(1.0 - rho * rho) * dw2
            vt = v[i, j - 1]
            drift = (r - 0.5 * vt) * dt
            diff = np.sqrt(max(0.0, vt)) * dw
            out[i, j] = out[i, j - 1] * np.exp(drift + diff)
    return out


def asymptotic_price(paths, r, strike, maturity, dt, is_call, sigma,
                     dividend) -> float:
    """AsymptoticAnalysisPricer.cpp:8-113, including its NaN-boundary
    behavior for eps*ln(1/eps) < 0."""
    n, m = paths.shape
    best = np.zeros(n)
    with np.errstate(invalid="ignore"):
        for i in range(n):
            path_best = 0.0
            for j in range(m):
                t = j * dt
                if t > maturity:
                    break
                s = paths[i, j]
                if not np.isfinite(s):
                    continue
                eps = maturity - t
                if eps < 1e-10:
                    boundary = strike
                else:
                    c0 = 0.5 * sigma * np.sqrt(eps * np.log(1.0 / eps))
                    if is_call:
                        boundary = strike - c0
                        if eps < 0.01:
                            boundary += 0.5 * (dividend - r) * eps
                    else:
                        boundary = strike + c0
                        if eps < 0.01:
                            boundary -= 0.5 * (r - dividend) * eps
                in_region = (s > boundary) if is_call else (s < boundary)
                if in_region:
                    disc = np.exp(-r * t) * payoff(is_call, s, strike)
                    if disc > path_best:
                        path_best = disc
            best[i] = path_best
    return float(np.mean(best))


def lsm_price(paths, r, strike, maturity, dt, is_call, poly_order) -> float:
    """LSMPricer.cpp:19-102: backward induction carrying realized values,
    raw-monomial SVD least squares on the ITM subset."""
    n, m = paths.shape
    values = np.zeros((n, m))
    for i in range(n):
        values[i, m - 1] = payoff(is_call, paths[i, m - 1], strike)
    disc = np.exp(-r * dt)
    for j in range(m - 2, -1, -1):
        if j * dt > maturity:
            values[:, j] = values[:, j + 1] * disc
            continue
        pay = np.array([payoff(is_call, paths[i, j], strike) for i in range(n)])
        itm = np.where(pay > 1e-14)[0]
        if itm.size > 0:
            a = np.vander(paths[itm, j], poly_order + 1, increasing=True)
            b = values[itm, j + 1] * disc
            c, *_ = np.linalg.lstsq(a, b, rcond=None)
            cont = a @ c
            values[itm, j] = np.maximum(pay[itm], cont)
        otm = np.where(pay <= 1e-14)[0]
        values[otm, j] = values[otm, j + 1] * disc
    return float(np.mean(values[:, 0]))


def branching_lower(paths, r, strike, maturity, dt, is_call,
                    exercise_times) -> float:
    """BranchingProcessPricer.cpp:41-72 (first-positive stopping rule)."""
    n = paths.shape[0]
    total = 0.0
    for i in range(n):
        best = 0.0
        for t_idx in exercise_times:
            t = t_idx * dt
            if t > maturity:
                break
            disc = np.exp(-r * t) * payoff(is_call, paths[i, t_idx], strike)
            if disc > best:
                best = disc
                break
        total += best
    return total / n


def branching_upper(paths, r, strike, maturity, dt, is_call, num_branches,
                    exercise_times, rp) -> float:
    """BranchingProcessPricer.cpp:74-134 with externally supplied branch
    indices rp[N, T, B] (replacing the reference's racy shared mt19937)."""
    n, m = paths.shape
    total = 0.0
    last_ex = exercise_times[-1]
    for i in range(n):
        best = 0.0
        for e, t_idx in enumerate(exercise_times):
            t = t_idx * dt
            if t > maturity:
                break
            disc_now = np.exp(-r * t) * payoff(is_call, paths[i, t_idx], strike)
            continuation = 0.0
            if t_idx < last_ex:
                sum_future = 0.0
                for b in range(num_branches):
                    path = rp[i, e, b]
                    best_fut = 0.0
                    for k in range(t_idx + 1, m):
                        tk = k * dt
                        if tk > maturity:
                            break
                        d = np.exp(-r * (tk - t)) * payoff(
                            is_call, paths[path, k], strike)
                        if d > best_fut:
                            best_fut = d
                    sum_future += best_fut
                continuation = (sum_future / num_branches) * np.exp(-r * t)
            better = max(disc_now, continuation)
            if better > best:
                best = better
        total += best
    return total / n


def martingale_price(paths, r, strike, maturity, dt, is_call, poly_order,
                     max_iterations=5) -> float:
    """MartingaleOptimizationPricer.cpp:21-189."""
    n, m = paths.shape

    def df(j):
        t = min(j * dt, maturity)
        return np.exp(-r * t)

    coeff = np.zeros(poly_order + 1)
    offset = 0.0

    def eval_mart(s):
        val, power = 0.0, 1.0
        for k in range(poly_order + 1):
            val += coeff[k] * power
            power *= s
        return val

    final_lower = final_upper = 0.0
    path_stop = np.zeros(n, dtype=int)
    for _ in range(max_iterations):
        # primal
        sum_primal = 0.0
        for i in range(n):
            best_val, best_idx = 0.0, 0
            for j in range(m):
                if j * dt > maturity:
                    break
                dp = payoff(is_call, paths[i, j], strike) * df(j)
                if dp > best_val:
                    best_val, best_idx = dp, j
            path_stop[i] = best_idx
            sum_primal += best_val
        primal = sum_primal / n
        # dual
        sum_dual = 0.0
        for i in range(n):
            best_val = 0.0
            for j in range(m):
                if j * dt > maturity:
                    break
                dp = payoff(is_call, paths[i, j], strike) * df(j)
                cand = dp - (eval_mart(paths[i, j]) - offset)
                if cand > best_val:
                    best_val = cand
            sum_dual += best_val
        dual = sum_dual / n
        # update
        xs, ys = [], []
        for i in range(n):
            j_stop = path_stop[i]
            s_stop = paths[i, j_stop]
            xs.append(s_stop)
            ys.append(0.5 * payoff(is_call, s_stop, strike) * df(j_stop))
            j_other = (j_stop + m // 2) % m
            s_other = paths[i, j_other]
            xs.append(s_other)
            ys.append(0.2 * payoff(is_call, s_other, strike) * df(j_other))
        if len(xs) >= poly_order + 1:
            a = np.vander(np.array(xs), poly_order + 1, increasing=True)
            c, *_ = np.linalg.lstsq(a, np.array(ys), rcond=None)
            coeff = c
            offset = float(np.mean([eval_mart(paths[i, 0]) for i in range(n)]))
        final_lower, final_upper = primal, dual
    return 0.5 * (final_lower + final_upper)


# ---------------------------------------------------------------------------
# Bayesian meta-model NN (BayesianNN.cpp) — forward pass and the reference's
# MC-dropout prediction-interval semantics, in scalar-style NumPy float64.
# ---------------------------------------------------------------------------

BNN_DROPOUT_RATES = (0.3, 0.3, 0.2, 0.2, 0.1)   # drop1..drop5 (:68-72)


def _bnn_dense(p: dict, x: np.ndarray) -> np.ndarray:
    return x @ np.asarray(p["kernel"], np.float64) + np.asarray(
        p["bias"], np.float64)


def _bnn_row_norm(x: np.ndarray) -> np.ndarray:
    """InstanceNorm1d given a 2-D (N, C) input: torch treats it as (C, L)
    and normalizes each ROW over the feature axis, biased variance,
    eps 1e-5, no affine (BayesianNN.cpp:62-66, quirk C15)."""
    mean = x.mean(axis=-1, keepdims=True)
    var = ((x - mean) ** 2).mean(axis=-1, keepdims=True)
    return (x - mean) / np.sqrt(var + 1e-5)


def bnn_forward_np(params: dict, x: np.ndarray,
                   masks: list | None = None,
                   num_mixtures: int = 5) -> np.ndarray:
    """Reference-semantics forward pass (BayesianNN.cpp:129-208) over a
    flax param tree (converted to NumPy), eval mode unless ``masks`` gives
    the five inverted-dropout KEEP masks (each the same shape as the layer
    output; train-mode scaling 1/(1-p) applied here).

    The across-batch attention block is computed-and-discarded in the
    reference (narrow(1, 0, 16) keeps only the gate's 16 columns,
    :174-180), so this oracle simply never computes it — numerically
    identical, and deliberately unlike bnn.py's full-topology path."""
    x = np.asarray(x, np.float64)

    def layer(name: str, inp: np.ndarray, i: int) -> np.ndarray:
        out = np.maximum(_bnn_row_norm(_bnn_dense(
            params[name]["Dense_0"], inp)), 0.0)
        if masks is not None:
            out = out * masks[i] / (1.0 - BNN_DROPOUT_RATES[i])
        return out

    out1 = layer("fc1", x, 0)
    out2 = layer("fc2", out1, 1)
    out3 = layer("fc3", out2, 2)
    out4 = layer("fc4", out3, 3)
    out5 = layer("fc5", out4, 4)
    out5 = (out5 + _bnn_dense(params["fcSkip3"]["Dense_0"], out3)
            + _bnn_dense(params["fcSkip4"]["Dense_0"], out4))   # :155-157
    out6 = np.maximum(_bnn_dense(params["fc6"]["Dense_0"], out5), 0.0)
    gate = 1.0 / (1.0 + np.exp(-_bnn_dense(params["fcGate"]["Dense_0"],
                                           out6)))
    out_final = out6 * gate                                      # :163
    out_final = out_final / (1.0 + np.exp(-out_final))           # swish :180
    s = _bnn_dense(params["flow0"]["sLayer"]["Dense_0"], out_final)
    t = _bnn_dense(params["flow0"]["tLayer"]["Dense_0"], out_final)
    z = out_final * np.exp(s) + t                                # flow :183
    raw = _bnn_dense(params["fcMDN"]["Dense_0"], z)
    means = raw[:, :num_mixtures]
    logvars = np.clip(raw[:, num_mixtures:2 * num_mixtures], -10.0, 2.0)
    logits = raw[:, 2 * num_mixtures:]
    e = np.exp(logits - logits.max(axis=-1, keepdims=True))
    mix = e / e.sum(axis=-1, keepdims=True)                      # :206
    return np.concatenate([means, logvars, mix], axis=-1)        # :208


def meta_model_prediction_np(vals: np.ndarray, stds: float = 3.0):
    """The reference's prediction-interval arithmetic
    (BayesianNN.cpp:582-630, MetaModelPrediction): given the MC-dropout
    draws of out[0][0] — the FIRST mixture component's mean only; the
    mixture weights, the other four components, and the MDN's aleatoric
    log-variances are all DISCARDED — the interval is mean +- stds * the
    biased std of those draws.  This is why coverage is far below the
    nominal 99.7%: the interval reflects dropout sampling noise of one
    head, not the model's predictive distribution."""
    vals = np.asarray(vals, np.float64)
    n = vals.size
    mean = vals.sum() / n
    var = (vals ** 2).sum() / n - mean * mean
    std = np.sqrt(var) if var > 0 else 0.0
    return mean, mean - stds * std, mean + stds * std
