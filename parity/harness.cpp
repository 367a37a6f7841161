// Parity/benchmark harness around the UNMODIFIED reference sources
// (/root/reference/src/models/*.cpp, compiled in place by parity/Makefile
// with the local Eigen shim).  Two modes:
//
//   harness parity <hist.csv> <steps> <paths> <reps> <strike_dist_pct>
//     reads a historical price series (one float per line), then `reps`
//     times: generate paths with RoughVolatility::GenerateStockPricePaths
//     (fresh random_device entropy each call — the reference's RNG is
//     irreproducible by construction, RoughVolatility.cpp:239) and run the
//     four pricers exactly as PredictionGen.cpp:780-791 does.  Emits one
//     JSON line per rep; the Python driver compares the rep distribution
//     against the TPU rebuild at matched path counts (BASELINE.md's
//     "within 2 MC-stderr of the C++ reference" criterion, literally).
//
//   harness bench <hist.csv> <rows> <threads>
//     times `rows` full pipeline rows (250-path generation + all four
//     pricers, steps from a cycling dte set) under OpenMP dynamic
//     scheduling — the reference's per-row hot loop
//     (PredictionGen.cpp:542-791) — and prints rows/s.
#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <fstream>
#include <string>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

#include "models/RoughVolatility.h"
#include "models/AsymptoticAnalysisPricer.h"
#include "models/BranchingProcessPricer.h"
#include "models/LSMPricer.h"
#include "models/MartingaleOptimizationPricer.h"

namespace {

std::vector<double> read_history(const std::string& path) {
  std::ifstream f(path);
  if (!f) { std::fprintf(stderr, "cannot open %s\n", path.c_str()); std::exit(2); }
  std::vector<double> h;
  double v;
  while (f >> v) h.push_back(v);
  return h;
}

struct Prices { double asym, branch, lsm, mart; };

// The per-row pricing block of PredictionGen.cpp:718-791 (constants from
// there: r=0.04, dt=1/252, numBranches=10, polyOrder=2, sigma = 20-day
// realized vol stand-in, dividend default).
Prices price_row(const std::vector<double>& hist, int steps, int paths,
                 double strike, bool isCall, double sigma, double dividend) {
  RoughVolatility rv;
  auto pricePaths = rv.GenerateStockPricePaths(hist, steps, paths);
  const double r = 0.04, dt = 1.0 / 252.0;
  const double maturity = steps * dt;
  std::vector<int> exerciseTimes(steps);
  for (int i = 0; i < steps; ++i) exerciseTimes[i] = i;
  AsymptoticAnalysis aa;
  BranchingProcesses bp;
  LSM lsm;
  MartingaleOptimization mo;
  Prices p;
  p.asym = aa.PredictOptionPrice(pricePaths, r, strike, maturity, dt, isCall, sigma, dividend);
  p.branch = bp.PredictOptionPrice(pricePaths, r, strike, maturity, dt, isCall, 10, exerciseTimes);
  p.lsm = lsm.PredictOptionPrice(pricePaths, r, strike, maturity, dt, isCall, 2);
  p.mart = mo.PredictOptionPrice(pricePaths, r, strike, maturity, dt, isCall, 2);
  return p;
}

double realized_sigma(const std::vector<double>& hist) {
  // 20-day annualized realized vol exactly as compute20DayVolAndMomentum
  // (PredictionGen.cpp:313-347) feeds the asymptotic pricer: population
  // variance over the last 20 log returns, scaled by sqrt(252).
  int n = static_cast<int>(hist.size());
  if (n < 21) return 0.0;
  double sum = 0.0, sum2 = 0.0;
  for (int i = 0; i < 20; ++i) {
    double lr = std::log(hist[n - 20 + i] / hist[n - 21 + i]);
    sum += lr;
    sum2 += lr * lr;
  }
  double mean = sum / 20.0;
  double var = sum2 / 20.0 - mean * mean;
  if (var < 0.0) var = 0.0;
  return std::sqrt(var * 252.0);
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 3) { std::fprintf(stderr, "usage: harness parity|bench ...\n"); return 2; }
  const std::string mode = argv[1];
  auto hist = read_history(argv[2]);
  const double s0 = hist.back();
  const double sigma = realized_sigma(hist);
  const double dividend = 0.08;

  if (mode == "parity") {
    const int steps = std::atoi(argv[3]);
    const int paths = std::atoi(argv[4]);
    const int reps = std::atoi(argv[5]);
    const double sdp = std::atof(argv[6]);       // strike_distance_pct
    const double strike = s0 * (1.0 - sdp);      // PredictionGen.cpp:704
    for (int isCall = 0; isCall < 2; ++isCall) {
      for (int rep = 0; rep < reps; ++rep) {
        Prices p = price_row(hist, steps, paths, strike, isCall != 0, sigma,
                             dividend);
        std::printf(
            "{\"is_call\": %d, \"rep\": %d, \"strike\": %.10g, "
            "\"asymptotic\": %.10g, \"branching\": %.10g, \"lsm\": %.10g, "
            "\"martingale\": %.10g}\n",
            isCall, rep, strike, p.asym, p.branch, p.lsm, p.mart);
      }
    }
    return 0;
  }

  if (mode == "bench") {
    const int rows = std::atoi(argv[3]);
#ifdef _OPENMP
    if (argc > 4) omp_set_num_threads(std::atoi(argv[4]));
#endif
    const int dtes[] = {30, 61, 91, 122, 182, 365};  // steps ~ dte/365*252
    volatile double sink = 0.0;
    auto t0 = std::chrono::steady_clock::now();
#pragma omp parallel for schedule(dynamic) reduction(+ : sink)
    for (int i = 0; i < rows; ++i) {
      int steps = static_cast<int>(dtes[i % 6] / 365.0 * 252.0);
      Prices p = price_row(hist, steps, 250, s0 * (1.0 - 0.02),
                           i % 2 == 1, sigma, dividend);
      sink += p.asym + p.branch + p.lsm + p.mart;
    }
    auto dt = std::chrono::duration<double>(
        std::chrono::steady_clock::now() - t0).count();
    std::printf("{\"rows\": %d, \"seconds\": %.6g, \"rows_per_sec\": %.6g, "
                "\"checksum\": %.6g}\n", rows, dt, rows / dt, (double)sink);
    return 0;
  }
  std::fprintf(stderr, "unknown mode %s\n", mode.c_str());
  return 2;
}
