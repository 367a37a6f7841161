"""Rough-volatility parameter estimation from historical prices.

Host-side NumPy equivalent of src/models/RoughVolatility.cpp:20-169 (the
statics mean/variance/covariance/detrend/DFA and the estimateXi/H/Eta/Rho
methods).  These run once per option row on a <=1825-point price history —
a few microseconds of scalar work — while the 250 x steps Monte Carlo runs
on the TPU; putting dynamic-length windowed DFA under jit would force
dynamic shapes for no gain, so the host/device boundary sits exactly here
(SURVEY.md C2).

All math is float64, matching the reference's ``double`` throughout.
"""

from __future__ import annotations

import dataclasses

import numpy as np

_native = None
try:  # pragma: no cover - exercised when the extension is built
    from montecarlooptionspricer_tpu import _features as _native  # type: ignore
except ImportError:
    try:
        import _features as _native  # type: ignore
    except ImportError:
        _native = None


def native_available() -> bool:
    return _native is not None


def log_returns(prices: np.ndarray) -> np.ndarray:
    """log(p_i / p_{i-1})  (RoughVolatility.cpp:126-133)."""
    prices = np.asarray(prices, dtype=np.float64)
    return np.log(prices[1:] / prices[:-1])


def _variance(v: np.ndarray) -> float:
    """Sample variance with n-1 denominator (RoughVolatility.cpp:25-33)."""
    if v.size < 2:
        return 0.0
    return float(np.var(v, ddof=1))


def _covariance(x: np.ndarray, y: np.ndarray) -> float:
    """Sample covariance with n-1 denominator (RoughVolatility.cpp:35-42)."""
    if x.size != y.size or x.size < 2:
        return 0.0
    return float(np.cov(x, y, ddof=1)[0, 1])


def estimate_r(logrets: np.ndarray, dt_yr: float = 1.0 / 252.0) -> float:
    """Annualized drift (RoughVolatility.cpp:135-139; unused by the pipeline,
    which hard-codes r=0.04 at RoughVolatility.cpp:326)."""
    return float(np.mean(logrets)) / dt_yr if logrets.size else 0.0


def estimate_xi(logrets: np.ndarray, dt_yr: float = 1.0 / 252.0) -> float:
    """Annualized variance = forward variance level xi
    (RoughVolatility.cpp:141-145)."""
    return _variance(logrets) / dt_yr


def _detrend_segment(segment: np.ndarray) -> np.ndarray:
    """Remove the least-squares linear trend fitted against t = 1..n
    (RoughVolatility.cpp:44-70)."""
    n = segment.size
    if n < 2:
        return segment
    t = np.arange(1, n + 1, dtype=np.float64)
    tm, ym = t.mean(), segment.mean()
    den = np.sum((t - tm) ** 2)
    if abs(den) < 1e-14:
        return segment
    slope = np.sum((t - tm) * (segment - ym)) / den
    intercept = ym - slope * tm
    return segment - (slope * t + intercept)


def hurst_exponent_dfa(data_in: np.ndarray) -> float:
    """Detrended-fluctuation-analysis Hurst estimator
    (RoughVolatility.cpp:72-122): demean, cumulate, window-detrend with
    dyadic windows 4, 8, ..., n/4, then the log-log slope of RMS fluctuation
    vs window size."""
    data = np.asarray(data_in, dtype=np.float64).copy()
    if data.size < 2:
        return 0.5
    data -= data.mean()
    data = np.cumsum(data)

    log_w, log_f = [], []
    w = 4
    max_w = data.size // 4
    while w <= max_w:
        flucts = []
        for start in range(0, data.size - w + 1, w):
            seg = _detrend_segment(data[start:start + w].copy())
            flucts.append(np.sqrt(np.mean(seg * seg)))
        mf = float(np.mean(flucts)) if flucts else 0.0
        if mf > 0.0:
            log_w.append(np.log(w))
            log_f.append(np.log(mf))
        w *= 2

    if len(log_w) < 2:
        return 0.5
    lw = np.asarray(log_w)
    lf = np.asarray(log_f)
    n = lw.size
    slope = ((n * np.sum(lw * lf) - lw.sum() * lf.sum())
             / (n * np.sum(lw * lw) - lw.sum() ** 2))
    return float(slope)


def estimate_h(logrets: np.ndarray) -> float:
    """Hurst exponent via DFA (RoughVolatility.cpp:147-149)."""
    return hurst_exponent_dfa(logrets)


def estimate_eta(logrets: np.ndarray, h: float = 0.0) -> float:
    """Vol-of-vol = 2 * stdev of log returns (RoughVolatility.cpp:151-155;
    the H argument is accepted and ignored, as in the reference)."""
    del h
    return 2.0 * float(np.sqrt(_variance(logrets)))


def estimate_rho(logrets: np.ndarray) -> float:
    """Spot/vol correlation = corr(r, r^2), clamped to -0.3 when positive
    (RoughVolatility.cpp:157-169)."""
    sq = logrets * logrets
    denom = np.sqrt(_variance(logrets) * _variance(sq))
    rho = _covariance(logrets, sq) / denom if denom > 0 else 0.0
    if rho > 0.0:
        rho = -0.3
    return float(rho)


@dataclasses.dataclass(frozen=True)
class RBergomiParams:
    """Estimated rough-Bergomi parameters plus market inputs — the argument
    block of GenerateStockPricePaths (RoughVolatility.cpp:312-335)."""

    s0: float
    xi: float
    h: float
    eta: float
    rho: float
    r: float = 0.04

    @property
    def rho_complement(self) -> float:
        return float(np.sqrt(max(0.0, 1.0 - self.rho * self.rho)))


def estimate_params(historical_prices: np.ndarray, r: float = 0.04,
                    dt_yr: float = 1.0 / 252.0) -> RBergomiParams:
    """Full parameter estimation from a price history
    (RoughVolatility.cpp:317-331).  Raises on a <2-point history like the
    reference.

    Uses the native C++ feature engine (native/features.cpp) when built —
    this is the pipeline's host-side hot loop, one call per option row —
    with this NumPy implementation as the bit-compatible fallback."""
    historical_prices = np.ascontiguousarray(historical_prices,
                                             dtype=np.float64)
    if _native is not None:
        s0, xi, h, eta, rho = _native.estimate_params(historical_prices,
                                                      dt_yr)
        return RBergomiParams(s0=s0, xi=xi, h=h, eta=eta, rho=rho, r=r)
    if historical_prices.size < 2:
        raise ValueError("Historical prices vector too small.")
    rets = log_returns(historical_prices)
    return RBergomiParams(
        s0=float(historical_prices[-1]),
        xi=estimate_xi(rets, dt_yr),
        h=estimate_h(rets),
        eta=estimate_eta(rets),
        rho=estimate_rho(rets),
        r=r,
    )
