"""Console logging setup — the rebuild's version of the reference's raw
std::cout progress/telemetry lines (SURVEY.md section 5.1/5.5)."""

from __future__ import annotations

import logging
import sys


def setup_logging(level: int = logging.INFO) -> None:
    # stderr, not stdout: CLIs that emit machine-readable results (e.g.
    # mcop-price's JSON line) own stdout; interleaved log records would
    # break `| jq`-style consumers.
    logging.basicConfig(
        level=level,
        stream=sys.stderr,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
        datefmt="%H:%M:%S",
        force=True,
    )
