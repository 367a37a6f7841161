"""CSV table IO with an optional native C++ fast path.

The reference's runtime is native C++ (CSV parsing in CSVUtils.cpp:9-64 and
PredictionGen.cpp:440-462, mutex-guarded writing in PredictionGen.cpp:87-123);
the rebuild keeps the hot IO native too: `native/fastcsv.cpp` is a CPython
C extension parsing large CSVs without the Python tokenizer.  When the
extension is absent (not yet built), a pure-Python fallback with identical
output takes over — tests assert equality of the two.

The split semantics deliberately mirror std::getline(ss, tok, ','): no
quoting, no escaping, a trailing delimiter yields no empty trailing field.
"""

from __future__ import annotations

import os
from typing import List, Sequence, Tuple

_native = None
try:  # pragma: no cover - exercised when the extension is built
    from montecarlooptionspricer_tpu import _fastcsv as _native  # type: ignore
except ImportError:
    try:
        import _fastcsv as _native  # type: ignore
    except ImportError:
        _native = None


def split_line(line: str) -> List[str]:
    """Comma-split with C++ getline semantics: 'a,b,' -> ['a','b'] (the
    final getline hits EOF), 'a,,b' -> ['a','','b']."""
    if line.endswith("\n"):
        line = line[:-1]
    if line.endswith("\r"):
        line = line[:-1]
    if not line:
        return []
    parts = line.split(",")
    if parts and parts[-1] == "" and line.endswith(","):
        parts.pop()
    return parts


def read_table(path: str) -> Tuple[List[str], List[List[str]]]:
    """(header, rows) of a CSV file; empty lines skipped
    (PredictionGen.cpp:455-460)."""
    if _native is not None:
        return _native.read_table(os.fspath(path))
    header: List[str] = []
    rows: List[List[str]] = []
    # Match the native parser byte-for-byte: utf-8 with replacement (not
    # strict locale decoding) and '\n'-only line breaks (no universal
    # newlines — a lone '\r' is field content, not a row break).
    with open(path, "r", encoding="utf-8", errors="replace",
              newline="\n") as f:
        first = f.readline()
        if not first:
            raise ValueError(f"Empty CSV: {path}")
        header = split_line(first)
        for line in f:
            if line.strip() == "":
                continue
            rows.append(split_line(line))
    return header, rows


def native_available() -> bool:
    return _native is not None


def write_csv(path: str, header: Sequence[str],
              rows: Sequence[Sequence[str]]) -> None:
    with open(path, "w") as f:
        f.write(",".join(header) + "\n")
        for row in rows:
            f.write(",".join(str(c) for c in row) + "\n")
