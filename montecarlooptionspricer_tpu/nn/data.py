"""CSV feature loading — equivalent of src/core/CSVUtils.cpp:9-64 (ReadCSV):
header-indexed column selection, error on missing columns, float32 output.

Uses the native C++ fast parser (native/fastcsv) when built, with a pure
NumPy fallback; both produce identical arrays (tests/test_native.py).
"""

from __future__ import annotations

import logging
from typing import Sequence, Tuple

import numpy as np

from ..pipeline import csv_io

log = logging.getLogger(__name__)


def read_csv(filename: str, input_columns: Sequence[str],
             target_column: str,
             skip_bad_rows: bool = False) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (X [n, len(input_columns)] float32, Y [n] float32).

    Raises on a missing input or target column, matching
    CSVUtils.cpp:32-46.

    ``skip_bad_rows=False`` (the default) also raises on a ragged row or a
    non-numeric field — the reference's ``std::stof`` behavior.  Real
    PredictionGen outputs contain such rows (malformed inputs are
    sentinel-filled verbatim, PredictionGen.cpp:825-847), so the NN CLIs
    expose ``--skip-bad-rows`` to drop them with a logged count instead of
    crashing the training run.
    """
    header, rows = csv_io.read_table(filename)
    col_index = {name: i for i, name in enumerate(header)}
    for col in list(input_columns) + [target_column]:
        if col not in col_index:
            raise ValueError(f"Input column {col} not found in {filename}")
    in_idx = [col_index[c] for c in input_columns]
    t_idx = col_index[target_column]

    need = max(in_idx + [t_idx]) + 1
    if skip_bad_rows:
        kept = []
        for row in rows:
            if len(row) < need:
                continue
            try:
                kept.append([float(row[i]) for i in in_idx + [t_idx]])
            except ValueError:
                continue
        if len(kept) != len(rows):
            log.info("Skipped %d bad row(s) of %d in %s",
                     len(rows) - len(kept), len(rows), filename)
        table = np.asarray(kept, dtype=np.float32)
        if table.size == 0:
            table = table.reshape(0, len(in_idx) + 1)
        return np.ascontiguousarray(table[:, :-1]), table[:, -1].copy()
    for r, row in enumerate(rows):
        if len(row) < need:
            raise ValueError(
                f"Row {r + 1} of {filename} has {len(row)} fields; "
                f"need {need} (ragged or truncated row)")
    # One vectorized conversion instead of rows*cols Python float() calls —
    # the native tokenizer's speedup would otherwise drown in this loop.
    table = np.asarray([[row[i] for i in in_idx + [t_idx]] for row in rows],
                       dtype=np.float32)
    if table.size == 0:
        table = table.reshape(0, len(in_idx) + 1)
    return np.ascontiguousarray(table[:, :-1]), table[:, -1].copy()
