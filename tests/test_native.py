"""Native fast-CSV extension: build (when a compiler is present), and assert
byte-identical output vs the Python fallback (SURVEY.md C19/C22: the
reference's data loading is native C++; ours is too, with a pure-Python
fallback)."""

import importlib
import shutil
import subprocess
import sys

import pytest

from montecarlooptionspricer_tpu.pipeline import csv_io

NATIVE_DIR = __file__.rsplit("/tests/", 1)[0] + "/native"


@pytest.fixture(scope="module")
def native_module():
    if not csv_io.native_available():
        if shutil.which("g++") is None and shutil.which("c++") is None:
            pytest.skip("no C++ compiler")
        subprocess.run(["make", "-C", NATIVE_DIR, f"PY={sys.executable}"],
                       check=True, capture_output=True)
        importlib.reload(csv_io)
    if not csv_io.native_available():
        pytest.skip("native extension unavailable after build")
    return csv_io._native


def test_native_matches_python_fallback(native_module, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text(
        "a,b,c\n"
        "1,2,3\n"
        "\n"                    # empty line skipped
        "4,,6\n"               # embedded empty field kept
        "7,8,\n"               # trailing comma: no trailing empty field
        "x y,z w,  q\r\n"      # CRLF + spaces preserved inside fields
        ",\n"                   # single delimiter -> ['']
    )
    native = native_module.read_table(str(p))

    # Force the Python path for comparison.
    header_py = []
    rows_py = []
    with open(p) as f:
        header_py = csv_io.split_line(f.readline())
        for line in f:
            if line.strip() == "":
                continue
            rows_py.append(csv_io.split_line(line))

    assert list(native[0]) == header_py
    assert [list(r) for r in native[1]] == rows_py
    assert rows_py[2] == ["7", "8"]
    assert rows_py[4] == [""]


def test_native_errors(native_module, tmp_path):
    with pytest.raises(OSError):
        native_module.read_table(str(tmp_path / "missing.csv"))
    empty = tmp_path / "empty.csv"
    empty.write_text("")
    with pytest.raises(ValueError):
        native_module.read_table(str(empty))


def test_native_large_roundtrip(native_module, tmp_path, rng):
    p = tmp_path / "big.csv"
    n = 20_000
    with open(p, "w") as f:
        f.write("c0,c1,c2,c3\n")
        for i in range(n):
            f.write(f"{i},{rng.uniform():.8f},tick{i % 97},{-i}\n")
    header, rows = native_module.read_table(str(p))
    assert len(rows) == n
    assert rows[12345][0] == "12345"
    assert rows[-1][3] == f"-{n - 1}"
