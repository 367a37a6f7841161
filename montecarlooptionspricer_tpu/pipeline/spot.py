"""Spot-price history handling and per-row features.

Equivalent of the static helpers in src/core/PredictionGen.cpp:
  * date parsing M/D/YYYY (:141-165);
  * wide-format spot CSV loading Date,TICKER,... with lowercased tickers and
    unparsable cells skipped (:177-238);
  * history-window sizing 10x/6x/4x dte capped at 1825 days (:247-258);
  * calendar-day back-walk collecting only dates present in the data
    (:265-305);
  * 20-day realized vol (annualized, biased variance) + momentum (sum of
    log returns) (:313-347).

Host-side NumPy/stdlib: this is scalar per-row work feeding the batched
device pricing (SURVEY.md C10).
"""

from __future__ import annotations

import datetime
import logging
from typing import Dict, List, Optional, Tuple

import numpy as np

log = logging.getLogger(__name__)

SpotData = Dict[str, Dict[int, float]]


def parse_date_mmddyyyy(s: str) -> Optional[datetime.date]:
    """'M/D/YYYY' -> date; None on garbage (the reference leaves a zeroed
    tm, which downstream lookups simply fail to match)."""
    try:
        parts = s.strip().split("/")
        if len(parts) != 3:
            return None
        month, day, year = int(parts[0]), int(parts[1]), int(parts[2])
        return datetime.date(year, month, day)
    except (ValueError, TypeError):
        return None


def date_to_yyyymmdd(d: datetime.date) -> int:
    return d.year * 10000 + d.month * 100 + d.day


def load_spot_prices(path: str) -> SpotData:
    """Wide CSV (header: Date,TICK1,TICK2,...) -> {ticker: {yyyymmdd: px}}
    (PredictionGen.cpp:177-238)."""
    from .csv_io import read_table

    out: SpotData = {}
    try:
        header, rows = read_table(path)
    except (OSError, ValueError) as e:
        log.error("Cannot open %s: %s", path, e)
        return out
    tickers = header
    for tokens in rows:
        if len(tokens) < 2:
            continue
        d = parse_date_mmddyyyy(tokens[0])
        if d is None:
            continue
        ymd = date_to_yyyymmdd(d)
        for i in range(1, len(tokens)):
            if i >= len(tickers):
                break
            ticker = tickers[i]
            if ticker == "Date" or not ticker:
                continue
            try:
                px = float(tokens[i])
            except ValueError:
                continue
            out.setdefault(ticker.lower(), {})[ymd] = px
    log.info("Loaded spot data from %s (%d tickers)", path, len(out))
    return out


def compute_max_days(dte: int) -> int:
    """History window: 10x dte (<=60d), 6x (61-180d), 4x (>180d), capped at
    1825 calendar days (PredictionGen.cpp:247-258)."""
    factor = 10
    if 60 < dte <= 180:
        factor = 6
    elif dte > 180:
        factor = 4
    return min(factor * dte, 1825)


def fetch_spot_history(spot_data: SpotData, ticker: str,
                       quote_date: datetime.date, dte: int) -> List[float]:
    """Walk back max_days..0 calendar days from the quote date, collecting
    finite prices for dates present in the data, oldest first
    (PredictionGen.cpp:265-305)."""
    # Loader keys are lowercased (:76); normalize the option-row token the
    # same way so 'AAPL' rows match an 'AAPL' spot column.
    daily = spot_data.get(ticker.lower())
    if not daily:
        return []
    max_days = compute_max_days(dte)
    history: List[float] = []
    for back in range(max_days, -1, -1):
        d = quote_date - datetime.timedelta(days=back)
        if d.year < 1970:
            continue
        px = daily.get(date_to_yyyymmdd(d))
        if px is not None and np.isfinite(px):
            history.append(px)
    return history


def twenty_day_vol_and_momentum(hist: List[float]) -> Tuple[float, float]:
    """(annualized 20-day realized vol, 20-day momentum)
    (PredictionGen.cpp:313-347): needs >= 21 points, non-positive or
    non-finite returns zeroed, biased variance, sqrt(252) annualization.
    Native fast path: native/features.cpp (same math, tested equal)."""
    from ..ops.estimators import _native

    if _native is not None:
        return _native.vol_momentum(np.ascontiguousarray(hist,
                                                         dtype=np.float64))
    if len(hist) < 21:
        return 0.0, 0.0
    window = np.asarray(hist[-21:], dtype=np.float64)
    log_rets = np.zeros(20)
    for i in range(20):
        p0, p1 = window[i], window[i + 1]
        if p0 > 0.0 and p1 > 0.0:
            lr = np.log(p1 / p0)
            log_rets[i] = lr if np.isfinite(lr) else 0.0
    mean = log_rets.mean()
    var = max(0.0, float(np.mean(log_rets ** 2)) - mean * mean)
    stdev = float(np.sqrt(var) * np.sqrt(252.0))
    return stdev, float(log_rets.sum())
