// _features — native per-row feature engine for montecarlooptionspricer_tpu.
//
// The reference computes its per-row host features in C++: rough-vol
// parameter estimation with a windowed DFA Hurst estimator
// (src/models/RoughVolatility.cpp:20-169) and the 20-day realized
// vol/momentum (src/core/PredictionGen.cpp:313-347).  In the rebuild this is
// the only host-side hot loop (it runs once per option row while the Monte
// Carlo runs on the TPU), so it stays native too.  Exact same math as the
// NumPy fallbacks in ops/estimators.py and pipeline/spot.py — float64
// throughout, n-1 sample variances, dyadic DFA windows with per-segment
// linear detrending; tests assert agreement to ~1e-12.
//
// Exposed functions:
//   estimate_params(prices, dt_yr=1/252) -> (s0, xi, h, eta, rho)
//   hurst_dfa(values) -> float
//   vol_momentum(history) -> (vol, momentum)

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cmath>
#include <cstring>
#include <vector>

namespace {

// ---- input conversion -----------------------------------------------------

bool to_doubles(PyObject* obj, std::vector<double>* out) {
  // Fast path: C-contiguous float64 buffer (NumPy arrays).
  Py_buffer view;
  if (PyObject_GetBuffer(obj, &view, PyBUF_CONTIG_RO | PyBUF_FORMAT) == 0) {
    bool ok = view.itemsize == sizeof(double) && view.format &&
              std::strcmp(view.format, "d") == 0;
    if (ok) {
      const double* p = static_cast<const double*>(view.buf);
      out->assign(p, p + view.len / sizeof(double));
      PyBuffer_Release(&view);
      return true;
    }
    PyBuffer_Release(&view);
  } else {
    PyErr_Clear();
  }
  PyObject* fast = PySequence_Fast(obj, "expected a sequence of floats");
  if (!fast) return false;
  Py_ssize_t n = PySequence_Fast_GET_SIZE(fast);
  out->resize(static_cast<size_t>(n));
  for (Py_ssize_t i = 0; i < n; ++i) {
    double v = PyFloat_AsDouble(PySequence_Fast_GET_ITEM(fast, i));
    if (v == -1.0 && PyErr_Occurred()) {
      Py_DECREF(fast);
      return false;
    }
    (*out)[i] = v;
  }
  Py_DECREF(fast);
  return true;
}

// ---- statistics (RoughVolatility.cpp:20-42) --------------------------------

double mean(const std::vector<double>& v) {
  if (v.empty()) return 0.0;
  double s = 0.0;
  for (double x : v) s += x;
  return s / static_cast<double>(v.size());
}

double variance(const std::vector<double>& v) {  // n-1 denominator
  size_t n = v.size();
  if (n < 2) return 0.0;
  double m = mean(v), s = 0.0;
  for (double x : v) s += (x - m) * (x - m);
  return s / static_cast<double>(n - 1);
}

double covariance(const std::vector<double>& x,
                  const std::vector<double>& y) {  // n-1 denominator
  size_t n = x.size();
  if (n != y.size() || n < 2) return 0.0;
  double mx = mean(x), my = mean(y), s = 0.0;
  for (size_t i = 0; i < n; ++i) s += (x[i] - mx) * (y[i] - my);
  return s / static_cast<double>(n - 1);
}

// ---- DFA Hurst (RoughVolatility.cpp:44-122) --------------------------------

void detrend_segment(double* seg, size_t n) {
  if (n < 2) return;
  double tm = (static_cast<double>(n) + 1.0) / 2.0;  // mean of 1..n
  double ym = 0.0;
  for (size_t i = 0; i < n; ++i) ym += seg[i];
  ym /= static_cast<double>(n);
  double num = 0.0, den = 0.0;
  for (size_t i = 0; i < n; ++i) {
    double t = static_cast<double>(i + 1);
    num += (t - tm) * (seg[i] - ym);
    den += (t - tm) * (t - tm);
  }
  if (std::fabs(den) < 1e-14) return;
  double slope = num / den;
  double intercept = ym - slope * tm;
  for (size_t i = 0; i < n; ++i)
    seg[i] -= slope * static_cast<double>(i + 1) + intercept;
}

double hurst_dfa(const std::vector<double>& data_in) {
  size_t n = data_in.size();
  if (n < 2) return 0.5;
  std::vector<double> data(data_in);
  double m = mean(data);
  double cum = 0.0;
  for (size_t i = 0; i < n; ++i) {
    cum += data[i] - m;
    data[i] = cum;
  }

  std::vector<double> log_w, log_f, seg;
  for (size_t w = 4; w <= n / 4; w *= 2) {
    double fluct_sum = 0.0;
    size_t count = 0;
    for (size_t start = 0; start + w <= n; start += w) {
      seg.assign(data.begin() + start, data.begin() + start + w);
      detrend_segment(seg.data(), w);
      double ss = 0.0;
      for (double x : seg) ss += x * x;
      fluct_sum += std::sqrt(ss / static_cast<double>(w));
      ++count;
    }
    double mf = count ? fluct_sum / static_cast<double>(count) : 0.0;
    if (mf > 0.0) {
      log_w.push_back(std::log(static_cast<double>(w)));
      log_f.push_back(std::log(mf));
    }
  }
  size_t k = log_w.size();
  if (k < 2) return 0.5;
  double sw = 0.0, sf = 0.0, swf = 0.0, sww = 0.0;
  for (size_t i = 0; i < k; ++i) {
    sw += log_w[i];
    sf += log_f[i];
    swf += log_w[i] * log_f[i];
    sww += log_w[i] * log_w[i];
  }
  double dk = static_cast<double>(k);
  return (dk * swf - sw * sf) / (dk * sww - sw * sw);
}

// ---- python bindings -------------------------------------------------------

// estimate_params(prices, dt_yr=1/252) -> (s0, xi, h, eta, rho)
PyObject* estimate_params(PyObject* /*self*/, PyObject* args) {
  PyObject* obj = nullptr;
  double dt_yr = 1.0 / 252.0;
  if (!PyArg_ParseTuple(args, "O|d", &obj, &dt_yr)) return nullptr;
  std::vector<double> prices;
  if (!to_doubles(obj, &prices)) return nullptr;
  if (prices.size() < 2) {
    PyErr_SetString(PyExc_ValueError, "Historical prices vector too small.");
    return nullptr;
  }
  size_t nr = prices.size() - 1;
  std::vector<double> rets(nr), sq(nr);
  for (size_t i = 0; i < nr; ++i) {
    rets[i] = std::log(prices[i + 1] / prices[i]);
    sq[i] = rets[i] * rets[i];
  }
  double var = variance(rets);
  double xi = var / dt_yr;                           // :141-145
  double h = hurst_dfa(rets);                        // :147-149
  double eta = 2.0 * std::sqrt(var);                 // :151-155
  double denom = std::sqrt(var * variance(sq));      // :157-169
  double rho = denom > 0.0 ? covariance(rets, sq) / denom : 0.0;
  if (rho > 0.0) rho = -0.3;
  return Py_BuildValue("(ddddd)", prices.back(), xi, h, eta, rho);
}

PyObject* hurst_dfa_py(PyObject* /*self*/, PyObject* args) {
  PyObject* obj = nullptr;
  if (!PyArg_ParseTuple(args, "O", &obj)) return nullptr;
  std::vector<double> data;
  if (!to_doubles(obj, &data)) return nullptr;
  return PyFloat_FromDouble(hurst_dfa(data));
}

// vol_momentum(history) -> (annualized 20d vol, 20d momentum)
// (PredictionGen.cpp:313-347): biased variance, sqrt(252) annualization.
PyObject* vol_momentum(PyObject* /*self*/, PyObject* args) {
  PyObject* obj = nullptr;
  if (!PyArg_ParseTuple(args, "O", &obj)) return nullptr;
  std::vector<double> hist;
  if (!to_doubles(obj, &hist)) return nullptr;
  if (hist.size() < 21) return Py_BuildValue("(dd)", 0.0, 0.0);
  const double* w = hist.data() + hist.size() - 21;
  double lr[20];
  double sum = 0.0;
  for (int i = 0; i < 20; ++i) {
    lr[i] = 0.0;
    if (w[i] > 0.0 && w[i + 1] > 0.0) {
      double v = std::log(w[i + 1] / w[i]);
      if (std::isfinite(v)) lr[i] = v;
    }
    sum += lr[i];
  }
  double m = sum / 20.0, ss = 0.0;
  for (int i = 0; i < 20; ++i) ss += lr[i] * lr[i];
  double var = ss / 20.0 - m * m;
  if (var < 0.0) var = 0.0;
  return Py_BuildValue("(dd)", std::sqrt(var) * std::sqrt(252.0), sum);
}

PyMethodDef methods[] = {
    {"estimate_params", estimate_params, METH_VARARGS,
     "estimate_params(prices, dt_yr=1/252) -> (s0, xi, h, eta, rho)"},
    {"hurst_dfa", hurst_dfa_py, METH_VARARGS,
     "hurst_dfa(values) -> DFA Hurst exponent"},
    {"vol_momentum", vol_momentum, METH_VARARGS,
     "vol_momentum(history) -> (annualized 20d vol, 20d momentum)"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_features",
    "Native per-row feature engine (DFA Hurst, rBergomi parameter "
    "estimation, realized vol/momentum).",
    -1, methods,
};

}  // namespace

PyMODINIT_FUNC PyInit__features(void) { return PyModule_Create(&moduledef); }
