"""PredictionGen pipeline driver — TPU-native equivalent of
src/core/PredictionGen.cpp:364-932.

The reference processes CSV rows on an OpenMP team, each row serially
generating 250 paths and running four pricers (PredictionGen.cpp:542-791).
Rebuilt TPU-first:

  host:   parse + validate rows, fetch spot history, 20-day vol/momentum,
          rough-vol parameter estimation (scalar work, float64);
  device: rows are *bucketed by quantized compile shape* — (n_pad, m1) =
          (next_pow2(steps), next_pow2(steps + 1)), with the true step
          count a traced per-row integer and the option type a traced
          boolean, so hundreds of distinct dte values share ~a dozen
          programs — and priced in vmapped batches under one jit:
          each row generates its own [num_paths, steps+1] rBergomi block and
          runs all four estimators, so a batch of B rows is a single
          [B x 250 x steps] program with no host round-trips.  Across a
          multi-chip mesh the batch axis is sharded (data parallelism over
          rows, the OpenMP-team equivalent; SURVEY.md section 2).

Failure containment mirrors the reference exactly (SURVEY.md section 5.3):
per-row sentinel ",0,0,0,0,0,0" lines on any validation/pricing failure
(PredictionGen.cpp:585-651, 825-847), error-count tracking, health watchdog
+ heartbeat, signal handlers, output backup, ordered incremental writes, and
the spot-data diagnostic dump.
"""

from __future__ import annotations

import dataclasses
import logging
import math
import os
import shutil
import time
from functools import partial
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..config import AUGMENTED_COLUMNS, MarketDefaults, PipelineConfig, PricingConfig
from ..ops import estimators
from . import csv_io, spot as spot_mod
from .watchdog import ProcessStats, Watchdog, install_signal_handlers
from .writer import OrderedResultWriter, SafeFileWriter

log = logging.getLogger(__name__)

SENTINEL = ",0,0,0,0,0,0"
RESUME_MARKER_SUFFIX = ".resume"


@dataclasses.dataclass
class RowTask:
    """A validated row ready for device pricing."""

    index: int
    line: str
    n_steps: int
    is_call: bool
    s0: float
    xi: float
    h: float
    eta: float
    rho: float
    strike: float
    maturity: float
    sigma: float
    dividend: float
    twenty_day_vol: float
    twenty_day_momentum: float


@dataclasses.dataclass
class RowResult:
    index: int
    line: str
    values: Tuple[float, float, float, float, float, float]

    def format(self) -> str:
        return self.line + "," + ",".join(_fmt(v) for v in self.values)


def _fmt(v: float) -> str:
    """Compact float formatting comparable to C++ operator<< defaults."""
    if v == 0.0:
        return "0"
    return f"{v:.6g}"


def _parse_row(index: int, line: str, tokens: List[str],
               spot_data: spot_mod.SpotData, market: MarketDefaults,
               error) -> Tuple[Optional[RowTask], Optional[str]]:
    """Validation chain of PredictionGen.cpp:572-777.  Returns
    (task, None) on success, (None, reason) for a sentinel row, and
    (None, "") for the no-history case (zeros appended, *not* an error)."""
    if len(tokens) < 15:
        return None, "Insufficient columns"
    try:
        underlying_last = float(tokens[3])
        dte_val = float(tokens[4])
        strike_dist_pct = float(tokens[5])
    except (ValueError, TypeError) as e:
        return None, f"Number parsing error: {e}"
    if (not np.isfinite(underlying_last) or not np.isfinite(dte_val)
            or not np.isfinite(strike_dist_pct) or underlying_last <= 0.0
            or dte_val <= 0.0 or not -1.0 <= strike_dist_pct <= 1.0):
        return None, "Invalid numeric input(s)."
    ticker = tokens[0]
    try:
        option_type = int(tokens[1])
    except (ValueError, TypeError):
        return None, "optionType parse error."
    quote_date = spot_mod.parse_date_mmddyyyy(tokens[2])

    idte = int(dte_val)
    hist = (spot_mod.fetch_spot_history(spot_data, ticker, quote_date, idte)
            if quote_date is not None else [])
    if not hist:
        # Reference: zeros appended without error count
        # (PredictionGen.cpp:667, 806-820 with the if-block skipped).
        return None, ""
    if len(hist) < 2:
        hist.append(underlying_last)                    # :669-671
    if not all(np.isfinite(h) for h in hist):
        return None, "Non-finite values in spotHist. Skipping."

    vol, momentum = spot_mod.twenty_day_vol_and_momentum(hist)

    maturity = dte_val / market.calendar_days           # :701
    is_call = option_type == 1
    strike = underlying_last * (1.0 - strike_dist_pct)  # :704
    sigma = vol
    dividend = market.dividend
    try:
        dividend = float(tokens[14])                    # :706-715
    except (ValueError, TypeError):
        error(f"Row {index}: 'dividend' parse error. Using default "
              f"{market.dividend}")

    n_steps = int(math.floor(maturity * market.trading_days))  # :718
    if n_steps < 1:
        return None, "No time steps => skipping pricer to avoid error."
    if sigma <= 0.0:
        # AsymptoticAnalysisPricer.cpp:51-53 throws; the catch in
        # PredictionGen.cpp:792-805 zeroes the whole row.
        return None, "Exception inside pricer calls: Volatility must be positive."

    try:
        # estimate_params dispatches to the native C++ feature engine when
        # built (~305x the NumPy fallback — this is the host-side hot loop,
        # one call per option row); the fallback is bit-identical.
        params = estimators.estimate_params(np.asarray(hist), r=market.r)
    except (ValueError, FloatingPointError) as e:
        return None, f"Exception inside pricer calls: {e}"

    return RowTask(index=index, line=line, n_steps=n_steps, is_call=is_call,
                   s0=params.s0, xi=params.xi, h=params.h, eta=params.eta,
                   rho=params.rho, strike=strike, maturity=maturity,
                   sigma=sigma, dividend=dividend, twenty_day_vol=vol,
                   twenty_day_momentum=momentum), None


def bucket_key(n_steps: int) -> Tuple[int, int]:
    """Compile-shape bucket of a row: (n_pad, m1).

    n_pad = next_pow2(n_steps) is the reference's circular-convolution
    length M2 (RoughVolatility.cpp:269) — constant across the bucket, so
    padding rows up to it is EXACT, not approximate (see
    rough_volatility.generate_paths_bucketed).  m1 = next_pow2(n_steps + 1)
    splits off the rows whose step count is itself a power of two.  A
    realistic option CSV has hundreds of distinct dte values; this maps
    them to <= ~2 log2(1825) ~ 13 programs (the reference's OpenMP dynamic
    scheduling handles arbitrary rows for free, PredictionGen.cpp:542-546;
    XLA needs static shapes, and each distinct executable costs seconds of
    per-process load through a remote tunnel)."""
    from ..ops.fgn import next_pow2

    return next_pow2(n_steps), next_pow2(n_steps + 1)


class BatchedPricer:
    """Compile-cached vmapped pricing: one jitted closure per (n_pad, m1)
    bucket (jax.jit itself specializes per batch shape — tail sizes reuse
    the same closure and QMC base points) with the row's true step count
    riding along as a traced integer; the option type is a traced per-row
    boolean (branch-free payoff/boundary selects), so calls and puts share
    one executable — halving the per-process program-load cost."""

    def __init__(self, pricing: PricingConfig, market: MarketDefaults,
                 mesh=None):
        self.pricing = pricing
        self.market = market
        self.mesh = mesh
        self._cache: Dict[Tuple[int, int], object] = {}

    def _build(self, n_pad: int, m1: int):
        import jax
        import jax.numpy as jnp
        from ..models import rough_volatility
        from ..models.pricing import PricerSpec, price_all

        p = self.pricing
        r, dt = self.market.r, self.market.dt

        if p.qmc:
            from ..ops import qmc
            base_u = qmc.sobol_base(p.num_paths, 3 * n_pad)

        def one(key, is_call, n_steps, s0, xi, h, eta, rho, strike, maturity,
                sigma, dividend):
            # is_call and n_steps ride along as traced per-row values
            # (branch-free selects / masks), so calls, puts, and every dte
            # in the bucket share this one program.
            kp, kr = jax.random.split(key)
            if p.qmc:
                paths = rough_volatility.generate_paths_qmc_bucketed(
                    kp, s0, xi, h, eta, rho, r, n_steps, n_pad, m1,
                    p.num_paths, dt, base_u=base_u)
            else:
                paths = rough_volatility.generate_paths_bucketed(
                    kp, s0, xi, h, eta, rho, r, n_steps, n_pad, m1,
                    p.num_paths, dt, antithetic=p.antithetic)
            spec = PricerSpec(r=r, strike=strike, maturity=maturity, dt=dt,
                              is_call=is_call, sigma=sigma, dividend=dividend,
                              num_branches=p.num_branches,
                              poly_order=p.poly_order,
                              max_iterations=p.max_iterations)
            out = price_all(paths, spec, kr, n_steps=n_steps)
            return jnp.stack([out["asymptotic"], out["branching"],
                              out["lsm"], out["martingale"]])

        fn = jax.jit(jax.vmap(one))
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            sharding = NamedSharding(self.mesh, P(self.mesh.axis_names[0]))

            def sharded(keys, *args):
                args = tuple(jax.device_put(a, sharding) for a in args)
                return fn(jax.device_put(keys, sharding), *args)

            return sharded
        return fn

    def _batch_size(self, n: int) -> int:
        """Compile batch for a call of n rows: the full rows_per_batch for
        full chunks, else the next pow2 with a floor of min(8,
        rows_per_batch).  A partial tail (common: sparse long-dte buckets)
        then pays at most ~2x its rows of device work instead of a full
        batch — a 1-row 1825-step bucket no longer burns 64 rows of path
        generation — while tail shapes stay pow2-bounded, so the program
        cache grows by at most log2(rows_per_batch / 8) extra entries per
        (n_pad, m1) bucket.  Under a mesh the tail is rounded up to a
        multiple of the device count so the batch axis stays shardable."""
        full = self.pricing.rows_per_batch
        if n >= full:
            batch = full
        else:
            from ..ops.fgn import next_pow2

            batch = min(full, max(next_pow2(n), min(8, full)))
        if self.mesh is not None:
            # EVERY batch (full chunks included — rows_per_batch is a CLI
            # flag and need not divide the mesh) rounds up to a multiple of
            # the device count so the batch axis stays shardable.
            d = self.mesh.size
            batch = (batch + d - 1) // d * d
        return batch

    def price(self, tasks: List[RowTask], base_seed: int) -> np.ndarray:
        """[len(tasks), 4] prices; rows padded internally to the call's
        pow2-quantized batch size (see _batch_size) so shapes stay
        compile-stable.  Tasks may mix step counts as long as they share a
        bucket_key."""
        import jax
        import jax.numpy as jnp

        assert tasks
        n_pad, m1 = bucket_key(tasks[0].n_steps)
        assert all(bucket_key(t.n_steps) == (n_pad, m1) for t in tasks)
        batch = self._batch_size(len(tasks))
        key_sig = (n_pad, m1)
        if key_sig not in self._cache:
            self._cache[key_sig] = self._build(n_pad, m1)
        fn = self._cache[key_sig]

        n = len(tasks)
        pad = batch - n
        padded = tasks + [tasks[0]] * pad

        # One device program for all row keys (a per-row fold_in loop would
        # pay one host->device dispatch per row through a remote tunnel).
        if not hasattr(self, "_fold_keys"):
            self._fold_keys = jax.jit(
                lambda base, idx: jax.vmap(jax.random.fold_in,
                                           (None, 0))(base, idx))
        keys = self._fold_keys(jax.random.key(base_seed),
                               jnp.asarray([t.index for t in padded]))
        cols = lambda name: jnp.asarray(
            [getattr(t, name) for t in padded], jnp.float32)
        is_call = jnp.asarray([t.is_call for t in padded], bool)
        n_steps = jnp.asarray([t.n_steps for t in padded], jnp.int32)
        out = fn(keys, is_call, n_steps, cols("s0"), cols("xi"), cols("h"),
                 cols("eta"), cols("rho"), cols("strike"), cols("maturity"),
                 cols("sigma"), cols("dividend"))
        return np.asarray(out)[:n]


def _resume_row_count(output_csv: str, expected_header: str) -> int:
    """Completed data rows in a previous run's output, or 0 when the file is
    absent/foreign (header mismatch).  The reference has no pipeline resume
    at all (SURVEY.md section 5.4) — this is a deliberate upgrade: re-running
    after an interruption appends from the first unwritten row.

    Two crash states are repaired (truncated) rather than counted, so the
    append-mode writer never merges onto a corrupt tail:

    * a PARTIAL trailing line (no newline) — SafeFileWriter flushes every
      100 rows, so a mid-write kill commonly leaves one;
    * a TRAILING RUN of sentinel rows — a signal-interrupted run
      sentinel-fills every unprocessed row (reference containment
      semantics, PredictionGen.cpp:825-847), which would otherwise make
      the file look complete and turn resume into a no-op.  Trailing
      sentinels are conservatively re-processed: they are either
      terminate-fill (must be redone) or deterministic validation
      failures (idempotent — repricing rewrites the same sentinel).
      A priced row can never equal the sentinel: sigma <= 0 rows are
      sentineled, so a priced row's vol column is always non-zero.

    The trailing-run heuristic alone is not enough for a GRACEFULLY
    terminated run (signal / health kill): buckets price out of row order,
    so the ordered writer may hold already-priced HIGH-index rows in its
    buffer when termination sentinel-fills the gaps — the final flush then
    interleaves terminate-fill sentinels BEFORE real rows, and the file
    looks complete.  A terminating run therefore records the first
    terminate-filled row index in a `<output>.resume` sidecar; when
    present, every row from that index on is re-processed (and the file
    truncated there).  A hard kill (SIGKILL / power loss) writes no
    sidecar, but also never flushes past the contiguous done-prefix, so
    the heuristic remains correct for that case.
    """
    if not os.path.exists(output_csv):
        return 0
    cap = None                  # first terminate-filled row, if recorded
    try:
        with open(output_csv + RESUME_MARKER_SUFFIX) as mf:
            cap = max(0, int(mf.read().strip()))
    except (OSError, ValueError):
        cap = None
    try:
        with open(output_csv, "r+") as f:
            header = f.readline()
            if header.rstrip("\n") != expected_header:
                return 0
            done = 0            # rows up to (incl.) the last non-sentinel
            offset = f.tell()   # byte offset just past that row
            run = 0             # current trailing sentinel run
            row = 0             # 0-based index of the line about to scan
            for line in iter(f.readline, ""):
                if not line.endswith("\n"):
                    break       # partial tail from a mid-write crash
                if cap is not None and row >= cap:
                    break       # terminate-fill region: redo from here
                row += 1
                if line.rstrip("\n").endswith(SENTINEL):
                    run += 1
                    continue
                done += run + 1
                run = 0
                offset = f.tell()
            end = f.seek(0, os.SEEK_END)
            if end != offset:
                f.truncate(offset)
            return done
    except OSError:
        return 0


def run_pipeline(config: Optional[PipelineConfig] = None,
                 pricing: Optional[PricingConfig] = None,
                 market: Optional[MarketDefaults] = None,
                 mesh=None, resume: bool = False) -> int:
    """main() of PredictionGen (PredictionGen.cpp:364-932).  Returns the
    process exit code."""
    config = config or PipelineConfig()
    pricing = pricing or PricingConfig()
    market = market or MarketDefaults()

    stats = ProcessStats(config)
    error_log = SafeFileWriter(config.error_log)
    install_signal_handlers(stats, error_log.write)

    spot_data = spot_mod.load_spot_prices(config.spot_csv)

    # Diagnostic dump (PredictionGen.cpp:420-437).
    try:
        with open(config.diagnostic_csv, "w") as diag:
            diag.write("Ticker,Date,Price\n")
            for ticker, daily in spot_data.items():
                for ymd, px in daily.items():
                    diag.write(f"{ticker},{ymd},{px:g}\n")
    except OSError as e:
        log.error("Failed to open %s: %s", config.diagnostic_csv, e)

    try:
        header, raw_rows = csv_io.read_table(config.option_csv)
    except (OSError, ValueError) as e:
        log.error("Failed to open %s: %s", config.option_csv, e)
        error_log.close()
        return 1
    if not raw_rows:
        log.error("No data lines found in %s.", config.option_csv)
        error_log.close()
        return 1
    total_rows = len(raw_rows)

    out_header = ",".join(header) + "," + ",".join(AUGMENTED_COLUMNS)
    done_rows = _resume_row_count(config.output_csv, out_header) if resume \
        else 0
    # The marker (if any) is consumed by _resume_row_count above; drop it so
    # it can't outlive this run and mislead a later one against fresh output.
    try:
        os.remove(config.output_csv + RESUME_MARKER_SUFFIX)
    except OSError:
        pass
    # Backup any previous output before truncating (PredictionGen.cpp:
    # 403-413): foo.csv -> foo.backup.csv.  Skipped only for a genuine
    # resume — a resume request against a foreign/mismatched file still
    # backs it up, since the 'w' open below would destroy it.
    if os.path.exists(config.output_csv) and done_rows == 0:
        try:
            base, _ = os.path.splitext(config.output_csv)
            shutil.copyfile(config.output_csv, base + config.backup_suffix)
        except OSError:
            pass
    if done_rows:
        log.info("Resuming: %d/%d rows already in %s", done_rows, total_rows,
                 config.output_csv)
        result_file = SafeFileWriter(config.output_csv, mode="a")
    else:
        result_file = SafeFileWriter(config.output_csv)
        result_file.write(out_header + "\n")
    writer = OrderedResultWriter(result_file, total_rows,
                                 start_index=done_rows)

    watchdog = Watchdog(stats, error_log.write,
                        progress=lambda: writer.next_row_to_write)
    watchdog.start()

    def log_row_error(index: int, msg: str) -> None:
        error_log.write_line(f"Row {index}: {msg}")

    # Host pass: validate + feature-engineer every row, bucket the priceable
    # ones by compile shape (quantized: (n_pad, m1), not exact step count).
    buckets: Dict[Tuple[int, int], List[RowTask]] = {}
    start_time = time.time()
    first_fill: Optional[int] = None  # lowest terminate-filled row index

    def fill(idx: int, line: str) -> None:
        nonlocal first_fill
        first_fill = idx if first_fill is None else min(first_fill, idx)
        writer.put(idx, line + SENTINEL)

    for idx, tokens in enumerate(raw_rows):
        line = ",".join(tokens)
        if idx < done_rows:
            continue  # already written by the interrupted run
        if stats.should_terminate.is_set() or stats.catastrophic_failure:
            fill(idx, line)
            continue
        error_log.write_line(f"Starting row {idx}")
        try:
            task, reason = _parse_row(idx, line, tokens, spot_data, market,
                                      lambda m: error_log.write_line(m))
        except Exception as e:  # noqa: BLE001 — :825-847 catch-all
            log_row_error(idx, f"Unexpected error: {e}")
            writer.put(idx, line + SENTINEL)
            stats.add_error()
            continue
        if task is None:
            if reason:  # validation failure -> sentinel + error count
                log_row_error(idx, reason)
                stats.add_error()
            writer.put(idx, line + SENTINEL)
            continue
        buckets.setdefault(bucket_key(task.n_steps), []).append(task)

    # Device pass: price buckets in batches.
    pricer = BatchedPricer(pricing, market, mesh)
    n_priceable = sum(len(v) for v in buckets.values())
    processed = 0
    for (n_pad, _m1), tasks in sorted(buckets.items()):
        b = pricing.rows_per_batch
        for i in range(0, len(tasks), b):
            chunk = tasks[i:i + b]
            if stats.should_terminate.is_set() or stats.catastrophic_failure:
                for t in chunk:
                    fill(t.index, t.line)
                continue
            try:
                from ..utils import annotate
                with annotate(f"price_batch[{n_pad}x{len(chunk)}]"):
                    values = pricer.price(chunk, pricing.seed)
            except Exception as e:  # noqa: BLE001 — thread-error path :867-881
                stats.fail(f"Thread error: {e}")
                error_log.write_line(f"Thread error: {e}")
                for t in chunk:
                    fill(t.index, t.line)
                continue
            for t, row_vals in zip(chunk, values):
                if not np.all(np.isfinite(row_vals)):
                    # Invalid paths / pricer blow-up (:753-777, :792-805).
                    log_row_error(t.index,
                                  "Invalid path dimension or inf/nan found.")
                    writer.put(t.index, t.line + SENTINEL)
                    stats.add_error()
                    continue
                writer.put(t.index, RowResult(
                    t.index, t.line,
                    (float(row_vals[0]), float(row_vals[1]),
                     float(row_vals[2]), float(row_vals[3]),
                     t.twenty_day_vol, t.twenty_day_momentum)).format())
            processed += len(chunk)
            elapsed = time.time() - start_time
            avg = elapsed / max(processed, 1)
            remain = avg * (n_priceable - processed)
            log.info("Progress: %d/%d priceable (%.2f%%), elapsed %.1fs, "
                     "remain %.1fs, avg/row %.3fs", processed, n_priceable,
                     100.0 * processed / max(n_priceable, 1), elapsed, remain,
                     avg)

    writer.flush_remaining()
    watchdog.stop()
    # Resume sidecar: a terminating run records where terminate-fill began
    # so a later --resume re-processes from there (see _resume_row_count).
    # A clean completion removes any stale marker.
    marker = config.output_csv + RESUME_MARKER_SUFFIX
    if stats.catastrophic_failure and first_fill is not None:
        try:
            with open(marker, "w") as mf:
                mf.write(f"{first_fill}\n")
        except OSError:
            pass
    if stats.error_count > 0:
        log.warning("Completed with %d errors. Check %s", stats.error_count,
                    config.error_log)
    result_file.close()
    error_log.close()
    if stats.catastrophic_failure:
        log.error("Process failed: %s", stats.failure_reason)
        return 1
    log.info("Done. Wrote %s with new columns.", config.output_csv)
    return 0
