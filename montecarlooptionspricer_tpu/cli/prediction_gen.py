"""PredictionGen CLI — equivalent of the PredictionGen executable
(src/core/PredictionGen.cpp main).

The reference takes zero arguments and hard-codes every knob
(SURVEY.md section 5.6); here the reference constants are argparse
defaults, so `mcop-prediction-gen` with no flags is the parity
configuration.
"""

from __future__ import annotations

import argparse
import sys

from ..config import MarketDefaults, PipelineConfig, PricingConfig
from ..utils import enable_persistent_cache, setup_logging


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="mcop-prediction-gen",
        description="Augment an options CSV with four Monte Carlo price "
                    "estimates + realized vol/momentum features.")
    d_pipe, d_price, d_mkt = PipelineConfig(), PricingConfig(), MarketDefaults()
    p.add_argument("--option-csv", default=d_pipe.option_csv)
    p.add_argument("--spot-csv", default=d_pipe.spot_csv)
    p.add_argument("--output-csv", default=d_pipe.output_csv)
    p.add_argument("--error-log", default=d_pipe.error_log)
    p.add_argument("--num-paths", type=int, default=d_price.num_paths,
                   help="MC paths per row (reference: 250)")
    p.add_argument("--num-branches", type=int, default=d_price.num_branches)
    p.add_argument("--poly-order", type=int, default=d_price.poly_order)
    p.add_argument("--max-iterations", type=int, default=d_price.max_iterations)
    p.add_argument("--rows-per-batch", type=int, default=d_price.rows_per_batch,
                   help="rows vmapped into one device program")
    p.add_argument("--seed", type=int, default=d_price.seed)
    p.add_argument("--r", type=float, default=d_mkt.r)
    p.add_argument("--dividend", type=float, default=d_mkt.dividend)
    p.add_argument("--mesh-devices", type=int, default=0,
                   help="shard row batches over this many devices (0 = no mesh)")
    p.add_argument("--qmc", action="store_true",
                   help="drive path generation with randomized quasi-Monte "
                        "Carlo (scrambled Sobol): several-fold lower price "
                        "RMSE at the 250-path default budget")
    p.add_argument("--antithetic", action="store_true",
                   help="antithetic path pairing per row: half the draws, "
                        "negatively correlated pair members — lower row "
                        "noise at the same path budget (incompatible with "
                        "--qmc)")
    p.add_argument("--resume", action="store_true",
                   help="append to an existing output CSV, continuing from "
                        "the first unwritten row (the reference restarts "
                        "from scratch)")
    p.add_argument("--trace-dir", default="",
                   help="capture a jax.profiler trace of the run here")
    p.add_argument("--max-memory-gb", type=float,
                   default=d_pipe.max_memory_bytes / 1024**3,
                   help="health-check kill threshold on peak RSS "
                        "(reference hard-codes 8 GiB, "
                        "PredictionGen.cpp:506-516; raise for CPU runs "
                        "where XLA host buffers dominate)")
    return p


def main(argv=None) -> int:
    setup_logging()
    enable_persistent_cache()
    args = build_parser().parse_args(argv)
    config = PipelineConfig(option_csv=args.option_csv, spot_csv=args.spot_csv,
                            output_csv=args.output_csv,
                            error_log=args.error_log,
                            max_memory_bytes=int(args.max_memory_gb
                                                 * 1024**3))
    try:
        pricing = PricingConfig(num_paths=args.num_paths,
                                num_branches=args.num_branches,
                                poly_order=args.poly_order,
                                max_iterations=args.max_iterations,
                                rows_per_batch=args.rows_per_batch,
                                seed=args.seed, qmc=args.qmc,
                                antithetic=args.antithetic)
    except ValueError as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    market = MarketDefaults(r=args.r, dividend=args.dividend)

    mesh = None
    if args.mesh_devices:
        from ..parallel import make_mesh
        mesh = make_mesh(args.mesh_devices)

    from ..pipeline.driver import run_pipeline
    from ..utils import device_trace
    with device_trace(args.trace_dir):
        return run_pipeline(config, pricing, market, mesh,
                            resume=args.resume)


if __name__ == "__main__":
    sys.exit(main())
