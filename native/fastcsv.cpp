// _fastcsv — native CSV table reader for montecarlooptionspricer_tpu.
//
// The reference's runtime is pure C++ and parses its option/spot CSVs with
// std::getline token loops (src/core/CSVUtils.cpp:9-64,
// src/core/PredictionGen.cpp:440-462, 572-579).  The rebuild keeps the data
// loader native: this CPython extension reads the whole file once and
// tokenizes without the Python-level string machinery, preserving the exact
// std::getline(ss, tok, ',') field semantics (trailing delimiter yields no
// trailing empty field; empty lines are skipped).
//
// Python fallback with identical output: pipeline/csv_io.py (tests assert
// byte-equality of the two paths).

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

// Split one line (no trailing newline) into a Python list of str, with
// std::getline(stream, tok, ',') semantics.
PyObject* split_fields(const char* s, Py_ssize_t len) {
  PyObject* list = PyList_New(0);
  if (!list) return nullptr;
  if (len == 0) return list;  // "" -> []

  Py_ssize_t start = 0;
  for (Py_ssize_t i = 0; i <= len; ++i) {
    const bool at_end = (i == len);
    if (at_end || s[i] == ',') {
      if (at_end && i == start && i > 0 && s[i - 1] == ',') {
        // trailing delimiter: getline hits EOF -> no empty trailing field
        break;
      }
      PyObject* field = PyUnicode_DecodeUTF8(s + start, i - start, "replace");
      if (!field || PyList_Append(list, field) < 0) {
        Py_XDECREF(field);
        Py_DECREF(list);
        return nullptr;
      }
      Py_DECREF(field);
      start = i + 1;
    }
  }
  return list;
}

// read_table(path) -> (header: list[str], rows: list[list[str]])
PyObject* read_table(PyObject* /*self*/, PyObject* args) {
  const char* path = nullptr;
  if (!PyArg_ParseTuple(args, "s", &path)) return nullptr;

  FILE* f = std::fopen(path, "rb");
  if (!f) {
    PyErr_SetFromErrnoWithFilename(PyExc_OSError, path);
    return nullptr;
  }
  std::string data;
  {
    // Chunked read loop (no fseek/ftell): works for regular files, pipes,
    // and special files alike, and cannot misreport an unseekable stream
    // as empty.
    char buf[1 << 16];
    size_t got;
    while ((got = std::fread(buf, 1, sizeof(buf), f)) > 0) {
      data.append(buf, got);
    }
    bool had_error = std::ferror(f) != 0;
    std::fclose(f);
    if (had_error) {
      PyErr_Format(PyExc_OSError, "read error on %s", path);
      return nullptr;
    }
  }

  PyObject* header = nullptr;
  PyObject* rows = PyList_New(0);
  if (!rows) return nullptr;

  const char* base = data.data();
  size_t n = data.size();
  size_t pos = 0;
  bool saw_header = false;
  while (pos <= n) {
    if (pos == n && saw_header) break;
    const char* nl = static_cast<const char*>(
        memchr(base + pos, '\n', n - pos));
    size_t line_end = nl ? static_cast<size_t>(nl - base) : n;
    size_t len = line_end - pos;
    // strip trailing \r
    if (len > 0 && base[pos + len - 1] == '\r') --len;

    if (!saw_header) {
      if (len == 0 && line_end >= n) {  // empty file
        Py_DECREF(rows);
        PyErr_Format(PyExc_ValueError, "Empty CSV: %s", path);
        return nullptr;
      }
      header = split_fields(base + pos, static_cast<Py_ssize_t>(len));
      if (!header) {
        Py_DECREF(rows);
        return nullptr;
      }
      saw_header = true;
    } else if (len > 0) {
      // skip whitespace-only lines like the Python fallback's strip()
      bool only_ws = true;
      for (size_t i = 0; i < len; ++i) {
        if (!isspace(static_cast<unsigned char>(base[pos + i]))) {
          only_ws = false;
          break;
        }
      }
      if (!only_ws) {
        PyObject* row = split_fields(base + pos,
                                     static_cast<Py_ssize_t>(len));
        if (!row || PyList_Append(rows, row) < 0) {
          Py_XDECREF(row);
          Py_XDECREF(header);
          Py_DECREF(rows);
          return nullptr;
        }
        Py_DECREF(row);
      }
    }
    if (!nl) break;
    pos = line_end + 1;
  }

  if (!header) {
    Py_DECREF(rows);
    PyErr_Format(PyExc_ValueError, "Empty CSV: %s", path);
    return nullptr;
  }
  PyObject* out = PyTuple_Pack(2, header, rows);
  Py_DECREF(header);
  Py_DECREF(rows);
  return out;
}

PyMethodDef methods[] = {
    {"read_table", read_table, METH_VARARGS,
     "read_table(path) -> (header, rows): parse a CSV with C++ getline "
     "field semantics."},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_fastcsv",
    "Native CSV reader (runtime data loader of montecarlooptionspricer_tpu).",
    -1, methods,
};

}  // namespace

PyMODINIT_FUNC PyInit__fastcsv(void) { return PyModule_Create(&moduledef); }
