"""Serve-mode latency measurement: a mixed 100-request sweep against
`mcop-price --serve`, reporting per-class p50/p95 and compile counts.

The sweep deliberately alternates board sizes (3/5 strikes -> one pow2
strip bucket), maturities within one step bucket, path budgets, Hurst
values, and strike levels — every axis that round 3 made a traced
per-call input — so the steady-state latency reflects ZERO recompiles
after the warmup quotes.

Run (real TPU or CPU):  python parity/serve_latency.py [--requests 100]
Writes a markdown table to stdout (paste into VERIFY_r03.md).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time


def build_requests(n: int):
    reqs = []
    for i in range(n):
        k = [3, 5, 3, 5, 4][i % 5]
        strikes = [90.0 + 4 * j + (i % 7) for j in range(k)]
        reqs.append({
            "id": i,
            "strikes": strikes,
            "put": True,
            "maturity": 0.08 + 0.002 * (i % 10),      # 20-25 steps -> one bucket
            "paths": [1024, 2048, 4096][i % 3],
            "hurst": [0.1, 0.2, 0.3][i % 3],
            # Per-tick market moves: every quote sees a different spot,
            # forward variance, and rate — traced inputs, zero compiles.
            "s0": 100.0 + 0.25 * (i % 11) - 1.25,
            "xi": 0.04 + 0.002 * (i % 5),
            "r": 0.04 + 0.001 * (i % 3),
            "seed": i,
            # Every 4th quote asks for the full per-strike risk block
            # (the jvp program per shape class compiles on its first
            # greeks quote and is reported as cold).
            "greeks": i % 4 == 3,
        })
    return reqs


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=100)
    ap.add_argument("--chunk-paths", type=int, default=1024)
    ap.add_argument("--antithetic", action="store_true",
                    help="measure the paired server (--serve --antithetic)")
    args = ap.parse_args()

    reqs = build_requests(args.requests)
    payload = "\n".join(json.dumps(r) for r in reqs) + "\n"

    t0 = time.time()
    out = subprocess.run(
        [sys.executable, "-m", "montecarlooptionspricer_tpu.cli.price",
         "--serve", "--chunk-paths", str(args.chunk_paths)]
        + (["--antithetic"] if args.antithetic else []),
        input=payload, capture_output=True, text=True, timeout=3600,
        env=os.environ)
    wall = time.time() - t0
    if out.returncode != 0:
        print(out.stderr[-4000:], file=sys.stderr)
        return 1
    rows = [json.loads(line) for line in out.stdout.strip().splitlines()]
    assert len(rows) == len(reqs), (len(rows), len(reqs))
    errors = [r for r in rows if "error" in r]
    assert not errors, errors[:3]

    compiled = [r for r in rows if r["compiled"]]
    print(f"| requests | {len(rows)} |")
    print(f"| compiles (cold quotes) | {len(compiled)} |")
    for label, cls in (("price", [r for r in rows if "delta" not in r]),
                       ("greeks", [r for r in rows if "delta" in r])):
        lat = sorted(r["elapsed_s"] for r in cls if not r["compiled"])
        if lat:
            def pct(p, lat=lat):
                return lat[min(len(lat) - 1, int(p * len(lat)))]
            print(f"| {label} warm p50 | {pct(0.50) * 1e3:.1f} ms |")
            print(f"| {label} warm p95 | {pct(0.95) * 1e3:.1f} ms |")
            print(f"| {label} warm max | {lat[-1] * 1e3:.1f} ms |")
        else:
            print(f"| {label} warm quotes | 0 (all cold) |")
    # Quote noise: mean reported per-strike stderr across price quotes
    # (the antithetic server shows its variance reduction here).
    ses = [s for r in rows if "delta" not in r
           for s in r["stderrs"] if s is not None]
    if ses:
        print(f"| mean quote stderr | {sum(ses) / len(ses):.5f} |")
    print(f"| total wall (incl. compiles) | {wall:.1f} s |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
