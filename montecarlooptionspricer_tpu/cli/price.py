"""mcop-price — direct command-line access to the streaming pricing engine.

No reference equivalent (the reference only exposes the CSV pipeline); this
is the serving-style entry point: price one American option — or a strike
chain with implied vols — at any path count, optionally with pathwise
Greeks, on whatever accelerator JAX sees.

Examples:
  mcop-price --s0 100 --strike 105 --maturity 1.45 --paths 1e7
  mcop-price --strikes 90,100,110 --paths 1e6 --put
  mcop-price --s0 100 --strike 105 --greeks
"""

from __future__ import annotations

import argparse
import json
import logging
import math
import sys
import time

from ..config import MarketDefaults
from ..utils import enable_persistent_cache, setup_logging

log = logging.getLogger(__name__)


def build_parser() -> argparse.ArgumentParser:
    mkt = MarketDefaults()
    p = argparse.ArgumentParser(
        prog="mcop-price",
        description="Price American options on rough-Bergomi paths with "
                    "streaming LSM (TPU-native).")
    p.add_argument("--s0", type=float, default=100.0)
    p.add_argument("--xi", type=float, default=0.04,
                   help="forward variance level")
    p.add_argument("--hurst", type=float, default=0.1)
    p.add_argument("--eta", type=float, default=1.5, help="vol of vol")
    p.add_argument("--rho", type=float, default=-0.4)
    p.add_argument("--r", type=float, default=mkt.r)
    p.add_argument("--strike", type=float, default=100.0)
    p.add_argument("--strikes", default="",
                   help="comma-separated strike chain (overrides --strike; "
                        "prices share one path stream and report implied "
                        "vols)")
    p.add_argument("--maturity", type=float, default=1.0, help="years")
    p.add_argument("--steps", type=int, default=0,
                   help="time steps (default floor(maturity*252))")
    p.add_argument("--paths", type=float, default=1e6)
    p.add_argument("--put", dest="is_call", action="store_false")
    p.add_argument("--call", dest="is_call", action="store_true")
    p.set_defaults(is_call=False)
    p.add_argument("--greeks", action="store_true",
                   help="also report pathwise delta / vega_xi / vega_eta "
                        "/ rho / vega_h")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--chunk-paths", type=int, default=1 << 17)
    p.add_argument("--pilot-paths", type=int, default=0,
                   help="LSM pilot policy-fit path count (0 = auto: "
                        "min(65536, chunk)).  The reported stderr is "
                        "conditional on the fitted exercise policy; at "
                        "long horizons the pilot's policy-fit noise "
                        "dominates total price variation past ~1e6 "
                        "stream paths (measured ~0.016 sd at 1825 steps "
                        "on the default pilot, VERIFY_r05 §6.5) — scale "
                        "this before --paths when chasing tight "
                        "absolute prices")
    p.add_argument("--pathgen", choices=("pallas", "xla"), default="pallas",
                   help="fused TPU kernel or portable XLA generator")
    p.add_argument("--control-variate", action="store_true")
    p.add_argument("--antithetic", action="store_true",
                   help="antithetic pairing (half the draws, negatively "
                        "correlated pair members; ~2-5x effective speedup "
                        "at fixed stderr for near-the-money work).  Fused "
                        "TPU kernels pair prices AND --greeks; the XLA "
                        "generator (--pathgen xla, serve mode) pairs "
                        "every whole-path surface incl. --bounds.  "
                        "Incompatible with --qmc")
    p.add_argument("--qmc", action="store_true",
                   help="randomized quasi-Monte Carlo price Brownian "
                        "(scrambled Sobol + per-chunk digital shift; "
                        "1-4.5x lower stderr per path by workload; XLA "
                        "generator)")
    p.add_argument("--qmc-fgn", action="store_true",
                   help="extend the Sobol set to the fGN planes "
                        "(3x dims): the right choice on high-vol-of-vol "
                        "markets where the variance rides the fGN; "
                        "requires --qmc")
    p.add_argument("--bounds", action="store_true",
                   help="report a rigorous [lower, upper] price bracket "
                        "(LSM policy value + delta-hedge duality upper "
                        "bound) with the duality gap as an accuracy "
                        "certificate")
    p.add_argument("--serve", action="store_true",
                   help="serve mode: read JSON-lines pricing requests from "
                        "stdin, write JSON-lines responses to stdout; "
                        "compiled programs persist across requests (fresh "
                        "strike strips of the same length never recompile)")
    p.add_argument("--max-steps", type=int, default=4096,
                   help="serve mode: reject requests whose pow2 step "
                        "bucket exceeds this (guards the O(steps^2) host "
                        "fGN-matrix build and compile from a single huge "
                        "request)")
    p.add_argument("--max-paths", type=float, default=1 << 24,
                   help="serve mode: reject requests asking for more paths "
                        "than this per quote")
    p.add_argument("--max-strikes", type=int, default=256,
                   help="serve mode: reject strike strips longer than this")
    p.add_argument("--warm-buckets", default="",
                   help="serve mode: comma-separated STEPSxSTRIPS shape "
                        "classes (e.g. '32x4,64x8') to compile BEFORE "
                        "accepting requests, so the first real quote in "
                        "each class is already warm (the cache key is a "
                        "pure shape class — the whole market is traced)")
    p.add_argument("--lru-size", type=int, default=16,
                   help="serve mode: max cached compiled pricers.  Size "
                        "it to the working set: every big-program compile "
                        "permanently retains ~6-24 MiB of host RSS below "
                        "JAX (parity/compile_rss_probe.py), so LRU churn "
                        "(evict + recompile) grows the server for as long "
                        "as it churns")
    return p


def _j(v):
    """JSON-safe stderr: null for NaN (single-chunk runs carry no variance
    information — engine._chunk_stderr), rounded float otherwise."""
    return None if not math.isfinite(v) else round(float(v), 6)


def main(argv=None) -> int:
    setup_logging()
    enable_persistent_cache()
    args = build_parser().parse_args(argv)

    import jax

    from ..models import engine, implied_vol

    mkt = MarketDefaults()
    if args.antithetic and args.qmc:
        print("error: --antithetic is incompatible with --qmc (the Sobol "
              "set has its own stratification)", file=sys.stderr)
        return 2
    if args.serve:
        return serve(args, mkt)
    n_steps = args.steps or max(1, int(args.maturity * mkt.trading_days))
    if args.paths < 1:
        print("error: --paths must be >= 1", file=sys.stderr)
        return 2
    if args.strikes and (args.control_variate or args.bounds):
        print("error: --control-variate/--bounds apply to "
              "single-strike pricing, not --strikes chains",
              file=sys.stderr)
        return 2
    if args.bounds and (args.greeks or args.control_variate):
        print("error: --bounds cannot combine with --greeks/"
              "--control-variate", file=sys.stderr)
        return 2
    # --antithetic composes with --greeks (fused Greeks kernels pair)
    # and --bounds (single-tile pallas and XLA whole-path generators
    # pair); the engine rejects the remaining unpaired corners (QMC,
    # step-tiled bounds) with clean errors via _price_once.
    n_paths = int(args.paths)
    pathgen = args.pathgen
    if jax.devices()[0].platform != "tpu" and pathgen == "pallas":
        log.warning("no TPU available: using the portable XLA generator "
                    "(the fused kernel's in-kernel PRNG is TPU-only)")
        pathgen = "xla"
    # Chunk must divide the path count AND (for the Pallas kernels) the
    # grid block height; round both down, to at least one block.
    block = 256
    chunk = max(block, (min(args.chunk_paths, n_paths) // block) * block)
    n_paths = max(chunk, (n_paths // chunk) * chunk)

    try:
        cfg = engine.StreamConfig(
            n_paths=n_paths, n_steps=n_steps, chunk_paths=chunk,
            pilot_paths=(args.pilot_paths or min(1 << 16, chunk)),
            chunks_per_call=64,
            pathgen_impl=pathgen, cumsum_impl="matmul",
            control_variate=args.control_variate, qmc=args.qmc,
            qmc_fgn=args.qmc_fgn, antithetic=args.antithetic)
    except ValueError as e:
        # Config-level rejections (e.g. --qmc-fgn without --qmc) exit
        # like CLI validation errors, not tracebacks.
        print(f"error: {e}", file=sys.stderr)
        return 2
    key = jax.random.key(args.seed)
    market = dict(s0=args.s0, xi=args.xi, h=args.hurst, eta=args.eta,
                  rho=args.rho, r=args.r)

    t0 = time.time()
    try:
        return _price_once(args, cfg, key, market, n_paths, n_steps, t0,
                           engine, implied_vol)
    except ValueError as e:
        # Engine-level config rejections (e.g. --antithetic on a horizon
        # past the fused kernels' caps) exit like CLI validation errors,
        # not tracebacks.
        print(f"error: {e}", file=sys.stderr)
        return 2


def _price_once(args, cfg, key, market, n_paths, n_steps, t0,
                engine, implied_vol) -> int:
    if args.strikes:
        strikes = [float(s) for s in args.strikes.split(",")]
        chain = engine.StreamingChainPricer(
            **market, strikes=strikes, maturity=args.maturity,
            is_call=args.is_call, config=cfg)
        if args.greeks:
            # Whole-smile risk from one shared path stream: per-strike
            # price + full Greek set ([K] arrays per output).
            g, se = chain.price_and_greeks(key, with_stderr=True)
            names = ("prices",) + engine.GREEK_ORDER[1:]
            out = {"strikes": strikes}
            out.update({n: [_j(v) for v in row]
                        for n, row in zip(names, g)})
            out["stderrs"] = {n: [_j(v) for v in row]
                              for n, row in zip(names, se)}
            prices = g[0]
        else:
            prices, stderrs = chain.price(key, with_stderr=True)
            out = {
                "strikes": strikes,
                # _j throughout: EVERY numeric output field serializes
                # non-finite values as null, never the invalid bare-NaN
                # JSON token (a bad market, e.g. --hurst -1, must not
                # break `| jq` consumers).
                "prices": [_j(v) for v in prices],
                "stderrs": [_j(v) for v in stderrs],
            }
        ivs = [implied_vol(v, args.s0, k, args.r, args.maturity,
                           args.is_call) for v, k in zip(prices, strikes)]
        # null outside the European no-arbitrage bracket too,
        # e.g. deep-ITM American puts.
        out["implied_vols"] = [_j(v) for v in ivs]
    else:
        pricer = engine.StreamingPricer(
            **market, strike=args.strike, maturity=args.maturity,
            is_call=args.is_call, config=cfg)
        if args.greeks:
            g, se = pricer.price_and_greeks(key, with_stderr=True)
            names = engine.GREEK_ORDER
            out = {n: _j(v) for n, v in zip(names, g)}
            out["stderrs"] = {n: _j(s) for n, s in zip(names, se)}
        elif args.bounds:
            lower, upper, lo_se, up_se = pricer.price_with_bounds(
                key, with_stderr=True)
            out = {"price": _j(lower), "lower": _j(lower),
                   "upper": _j(upper), "duality_gap": _j(upper - lower),
                   "lower_stderr": _j(lo_se), "upper_stderr": _j(up_se)}
        else:
            price, se = pricer.price(key, with_stderr=True)
            out = {"price": _j(price), "stderr": _j(se)}
    out.update({"n_paths": n_paths, "n_steps": n_steps,
                "is_call": args.is_call,
                "elapsed_s": round(time.time() - t0, 3)})
    print(json.dumps(out))
    return 0


def serve(args, mkt) -> int:
    """JSON-lines pricing server on stdin/stdout.

    Request (one JSON object per line):
      {"id": any, "strikes": [..] | "strike": x, "put": bool | "call": bool,
       "maturity": yrs, "steps"?: int, "paths"?: n, "seed"?: int,
       "greeks"?: bool,
       "s0"/"xi"/"hurst"/"eta"/"rho"/"r"?: market overrides}
    Response: {"id", "strikes", "prices", "implied_vols", "elapsed_s",
               "compiled"} — with "greeks": true, also per-strike "delta"/
      "vega_xi"/"vega_eta"/"rho_rate"/"vega_h" arrays (stderrs per
      output; one extra compile per shape class on the first greeks
      quote) — or {"id", "error"} (the server keeps running).

    Compiled pricers are cached (bounded LRU, 16 entries) keyed by pure
    SHAPE class: (STEP BUCKET, STRIP-LENGTH BUCKET, call/put, chunk).
    EVERYTHING else is a traced per-request input of a
    StreamingChainPricer(bucketed=True, traced_market=True): fresh
    strikes (traced end to end; strip lengths quantize to pow2 buckets
    with dead lanes repeating the last strike), fresh maturities (pow2
    step buckets, true step count traced), fresh path budgets (per-call
    n_paths over a fixed server chunk), and the ENTIRE market — per-tick
    s0 updates, intraday xi/eta/r/H recalibration — all reprice against
    the same compiled programs.  Only rho is baked (distributionally
    inert, engine.make_chunk_pathgen).  A whole trading day costs one
    compile per (step, strip, side) shape class.  Requests past
    --max-steps/--max-paths/--max-strikes, or with invalid market values
    (H outside (0,1), non-positive s0/xi/strikes), are rejected before
    any host-side matrix build or compile, so a single bad quote cannot
    hang or OOM the server.  CLI flags provide the defaults a request
    may override.

    Bucketed pricers ride the XLA generator (the fused kernels bake their
    step count); at serving path budgets (1e3-1e6 paths/request) the
    response time is dominated by dispatch, not generation, so this costs
    ~nothing — bulk 1e7+ workloads wanting the fused kernel should use
    the one-shot CLI or the engine API with exact shapes.

    No reference equivalent; this is the production-serving surface the
    reference's one-shot CSV pipeline lacks."""
    import jax

    from ..models import engine, implied_vol

    import collections

    pricers: collections.OrderedDict = collections.OrderedDict()
    max_pricers = max(1, getattr(args, "lru_size", 16))
    made = 0
    churn = 0
    seen_keys: set = set()

    def respond(obj, warm=False):
        # `warm` is tracked OUT OF BAND (by which line source produced the
        # request), never inferred from the id: a legitimate client id that
        # happens to start with "__warm_" must still get its response.
        if warm:
            # Warmup self-requests compile a shape class before real
            # quotes arrive; their responses go to the log, never the
            # client stream.
            log.info("serve: warmed %s (%s s)", obj.get("id"),
                     obj.get("elapsed_s", obj.get("error", "?")))
            return
        sys.stdout.write(json.dumps(obj) + "\n")
        sys.stdout.flush()

    # Pre-warm requested shape classes through the ordinary request path
    # (same validation, same cache) by prepending synthetic quotes.
    warm_lines = []
    for spec in filter(None, args.warm_buckets.split(",")):
        steps_s, _, k_s = spec.partition("x")
        warm_lines.append(json.dumps({
            "id": f"__warm_{spec}",
            "steps": int(steps_s),
            "strikes": [args.s0] * max(1, int(k_s or 1)),
            "maturity": int(steps_s) / mkt.trading_days,
            "paths": 1,
        }))

    import itertools

    log.info("serve: ready (JSON lines on stdin)")
    for is_warm, line in itertools.chain(
            ((True, l) for l in warm_lines),
            ((False, l) for l in sys.stdin)):
        line = line.strip()
        if not line:
            continue
        t0 = time.time()
        rid = None
        try:
            req = json.loads(line)
            rid = req.get("id") if isinstance(req, dict) else None
            if not isinstance(req, dict):
                raise ValueError("request must be a JSON object")
            if "strikes" in req:
                strikes = [float(v) for v in req["strikes"]]
            else:
                strikes = [float(req.get("strike", args.strike))]
            if not strikes:
                raise ValueError("empty strike strip")
            if "call" in req:
                is_call = bool(req["call"])
            elif "put" in req:
                is_call = not bool(req["put"])
            else:
                is_call = args.is_call
            maturity = float(req.get("maturity", args.maturity))
            n_steps = int(req.get("steps", args.steps)
                          or max(1, int(maturity * mkt.trading_days)))
            if n_steps < 1 or not maturity > 0 or not math.isfinite(maturity):
                # Validate BEFORE touching the pricer cache: a stream of
                # malformed requests must not construct-and-cache junk
                # pricers that evict hot compiled ones from the LRU.
                # isfinite matters: json.loads accepts bare NaN/Infinity
                # tokens, and NaN passes every sign comparison.
                raise ValueError(
                    f"invalid steps={n_steps} / maturity={maturity}")
            from ..ops.fgn import next_pow2

            # Guard the POW2 BUCKET, not the raw step count: the bucket
            # is what the server actually builds matrices and compiles
            # at.  A huge request would otherwise trigger an O(steps^2)
            # host matrix build and a giant compile before any other
            # guard fires — reject it up front so one bad quote can
            # never hang the server.
            bucket = max(8, next_pow2(n_steps))
            if bucket > args.max_steps:
                raise ValueError(
                    f"steps={n_steps} (pow2 bucket {bucket}) exceeds "
                    f"--max-steps={args.max_steps}")
            if len(strikes) > args.max_strikes:
                raise ValueError(
                    f"{len(strikes)} strikes exceeds --max-strikes="
                    f"{args.max_strikes}")
            n_paths = int(req.get("paths", args.paths))
            if n_paths < 1:
                raise ValueError(f"invalid paths={n_paths}")
            if n_paths > args.max_paths:
                raise ValueError(
                    f"paths={n_paths} exceeds --max-paths="
                    f"{int(args.max_paths)}")
            seed = int(req.get("seed", args.seed))
            # Hurst is NOT part of the compiled market: the bucketed
            # pricer is built traced_h=True, so intraday H recalibration
            # reprices against the same compiled programs (no LRU churn,
            # no compile latency on the quote path).  It IS validated —
            # h outside (0, 1) makes sqrt(2h)/t^{2h} produce NaN prices.
            hurst = float(req.get("hurst", args.hurst))
            if not 0.0 < hurst < 1.0:
                raise ValueError(f"invalid hurst={hurst} (need 0 < H < 1)")
            market = tuple(
                float(req.get(name, getattr(args, attr)))
                for name, attr in (("s0", "s0"), ("xi", "xi"),
                                   ("eta", "eta"), ("rho", "rho"),
                                   ("r", "r")))
            s0, xi, eta, rho, r = market
            # Finiteness is explicit everywhere: NaN passes any >/>=
            # comparison and inf passes sign checks, and either would
            # otherwise flow into a success-shaped response.
            if not (s0 > 0 and xi > 0 and eta >= 0
                    and all(map(math.isfinite, market))
                    and all(k > 0 and math.isfinite(k) for k in strikes)):
                raise ValueError(
                    "invalid market: need finite s0 > 0, xi > 0, "
                    "eta >= 0, rho, r, and finite strikes > 0")

            pathgen = args.pathgen
            if jax.devices()[0].platform != "tpu" and pathgen == "pallas":
                pathgen = "xla"
            # The chunk is a SERVER configuration constant (--chunk-paths,
            # rounded to the Pallas block), never derived from the
            # request: deriving it from n_paths would sneak the path
            # budget back into the cache key through chunk and recompile
            # per accuracy tier.  Requests below one chunk are served at
            # one chunk (a better estimate than asked, cost bounded by
            # the operator's chunk sizing); larger budgets round to chunk
            # multiples and stream more chunks through the same program.
            block = 256
            chunk = max(block, (args.chunk_paths // block) * block)
            n_paths = max(chunk, (n_paths // chunk) * chunk)
            # Strip LENGTH quantizes to a pow2 bucket too: a client
            # alternating 3- and 5-strike boards reuses one compiled
            # 8-lane program (dead lanes repeat the last strike and are
            # sliced off the response) instead of churning the LRU with
            # one program per distinct K.
            n_k = len(strikes)
            k_bucket = max(1, next_pow2(n_k))
            padded = strikes + [strikes[-1]] * (k_bucket - n_k)
            # The cache key is a pure SHAPE class: the market (s0, xi,
            # r, eta, hurst) and the path budget are per-call traced
            # inputs of a traced_market pricer, so per-tick spot
            # updates, intraday recalibration, and accuracy-tier sweeps
            # all reprice against the same compiled programs.  Only rho
            # remains baked — it is distributionally inert
            # (engine.make_chunk_pathgen).
            cache_key = (bucket, k_bucket, is_call,
                         chunk, pathgen, args.qmc)
            # Cache entries are [pricer, greeks_warm]: the serve layer
            # owns the lifecycle state (LRU eviction drops the warm flag
            # with the pricer) instead of poking attributes onto the
            # engine object.
            entry = pricers.get(cache_key)
            compiled = entry is None
            if not compiled:
                pricers.move_to_end(cache_key)
                pricer = entry[0]
            else:
                cfg = engine.StreamConfig(
                    n_paths=chunk, n_steps=bucket, chunk_paths=chunk,
                    # Server-level knob, never per-request (a per-request
                    # pilot size would multiply the shape-class space).
                    pilot_paths=(args.pilot_paths
                                 or min(1 << 16, chunk)),
                    chunks_per_call=64,
                    pathgen_impl=pathgen, cumsum_impl="matmul",
                    qmc=args.qmc, qmc_fgn=args.qmc_fgn,
                    # Server-level estimator choice (never per-request —
                    # it would double the shape-class space): bucketed
                    # pricers ride the XLA generator, which pairs every
                    # surface incl. greeks quotes (noise-level pairing).
                    antithetic=args.antithetic)
                pricer = engine.StreamingChainPricer(
                    s0, xi, hurst, eta, rho, r, strikes=padded,
                    maturity=bucket / mkt.trading_days, is_call=is_call,
                    config=cfg, bucketed=True, traced_market=True)
                entry = pricers[cache_key] = [pricer, False]
                made += 1
                if cache_key in seen_keys:
                    # LRU churn: a previously-evicted class recompiling.
                    # Each big-program compile permanently retains ~6-24
                    # MiB of host RSS below JAX (PJRT/plugin-side; not
                    # released by gc, jax.clear_caches(), or
                    # malloc_trim — measured in
                    # parity/compile_rss_probe.py loops D-F), so
                    # sustained churn grows the server unboundedly.
                    # The pow2 bucketing keeps the class space finite;
                    # an --lru-size covering it makes retention a
                    # one-time cost.  Warn so operators see it.
                    churn += 1
                    log.warning(
                        "serve: shape class %s recompiled after "
                        "eviction (%d churn recompiles so far) — "
                        "consider --lru-size > %d to bound host-RSS "
                        "growth (~6-24 MiB retained per recompile)",
                        cache_key, churn, max_pricers)
                seen_keys.add(cache_key)
                if len(pricers) > max_pricers:
                    pricers.popitem(last=False)   # evict LRU
            per_call = dict(strikes=padded, n_paths=n_paths,
                            n_steps_live=n_steps, maturity=maturity,
                            hurst=hurst,
                            market=dict(s0=s0, xi=xi, r=r, eta=eta))
            if req.get("greeks"):
                # Per-quote smile risk: jvp over the pricer's already-
                # traced market — ONE extra compiled program per shape
                # class, lazily on the first greeks quote (reported
                # honestly in `compiled`).
                compiled = compiled or not entry[1]
                g, se = pricer.price_and_greeks(
                    jax.random.key(seed), with_stderr=True, **per_call)
                entry[1] = True
                names = ("prices",) + engine.GREEK_ORDER[1:]
                extra = {n: [_j(v) for v in row[:n_k]]
                         for n, row in zip(names, g)}
                extra["stderrs"] = {n: [_j(v) for v in row[:n_k]]
                                    for n, row in zip(names, se)}
                prices = g[0][:n_k]
            else:
                prices, stderrs = pricer.price(
                    jax.random.key(seed), with_stderr=True, **per_call)
                prices, stderrs = prices[:n_k], stderrs[:n_k]
                # _j throughout: a NaN must become null, never the
                # invalid bare-NaN JSON token that breaks strict
                # JSON-lines clients mid-stream.
                extra = {"prices": [_j(v) for v in prices],
                         "stderrs": [_j(v) for v in stderrs]}
            ivs = [implied_vol(float(v), s0, k, r, maturity, is_call)
                   for v, k in zip(prices, strikes)]
            respond({
                "id": rid,
                "strikes": strikes,
                **extra,
                "implied_vols": [None if math.isnan(v) else round(v, 6)
                                 for v in ivs],
                "n_paths": n_paths, "n_steps": n_steps, "is_call": is_call,
                "compiled": compiled,
                "elapsed_s": round(time.time() - t0, 3),
            }, warm=is_warm)
        except Exception as e:  # noqa: BLE001 — a bad request must not
            # take the server down; containment mirrors the pipeline's
            # per-row sentinel philosophy (PredictionGen.cpp:825-847).
            # rid comes from THIS line's parse (None if parsing itself
            # failed) — never from a previous request.
            log.warning("serve: request failed: %s", e)
            respond({"id": rid, "error": str(e)}, warm=is_warm)
    log.info("serve: stdin closed after %d compiled pricer(s); exiting",
             made)
    return 0


if __name__ == "__main__":
    sys.exit(main())
