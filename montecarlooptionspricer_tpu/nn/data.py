"""CSV feature loading — equivalent of src/core/CSVUtils.cpp:9-64 (ReadCSV):
header-indexed column selection, error on missing columns, float32 output.

Uses the native C++ fast parser (native/fastcsv) when built, with a pure
NumPy fallback; both produce identical arrays (tests/test_native.py).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

from ..pipeline import csv_io


def read_csv(filename: str, input_columns: Sequence[str],
             target_column: str) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (X [n, len(input_columns)] float32, Y [n] float32).

    Raises on a missing input or target column, matching
    CSVUtils.cpp:32-46.
    """
    header, rows = csv_io.read_table(filename)
    col_index = {name: i for i, name in enumerate(header)}
    for col in list(input_columns) + [target_column]:
        if col not in col_index:
            raise ValueError(f"Input column {col} not found in {filename}")
    in_idx = [col_index[c] for c in input_columns]
    t_idx = col_index[target_column]

    x = np.empty((len(rows), len(in_idx)), np.float32)
    y = np.empty((len(rows),), np.float32)
    for r, row in enumerate(rows):
        for c, i in enumerate(in_idx):
            x[r, c] = float(row[i])
        y[r] = float(row[t_idx])
    return x, y
