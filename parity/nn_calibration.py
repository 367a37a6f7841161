"""NN uncertainty-calibration adjudication (r04 verdict item 3).

The reference's evaluation (EvaluateNN.cpp:36-96) reports 3-sigma
"coverage" of intervals built by MetaModelPrediction
(BayesianNN.cpp:582-630): mean +- 3 * std over MC-dropout draws of
out[0][0] — the FIRST mixture component's mean only.  The MDN's
aleatoric variance (the fitted log-vars and mixture spread) is
discarded, so the interval measures dropout sampling noise of one head,
NOT the model's predictive distribution.  tests/test_bnn_torch_parity.py
proves the rebuild computes exactly this (forward pass == torch twin;
interval arithmetic == the oracle formula; dropout draw distributions
match).  This script quantifies WHY that semantics yields 9.7-54%
coverage, and why it rises with data scale:

  * per-row decomposition: epistemic sigma_epi = std of MC-dropout draws
    of means[0], vs aleatoric sigma_alea = the MDN's own variance about
    means[0] (mixture variance + (mixture mean - means[0])^2, weights =
    softmax of the already-softmaxed block — the double-softmax the loss
    trained with);
  * coverage under reference semantics (3 sigma_epi) vs full-variance
    intervals (3 sqrt(sigma_epi^2 + sigma_alea^2));
  * the data-scale experiment: the same generative process at n=1k and
    n=8k training rows.  More data fits the conditional mean better
    (residuals shrink toward the irreducible noise) while sigma_epi
    stays on the same order, so REFERENCE-semantics coverage RISES with
    data scale even though the interval never models the noise — the
    predictable mechanism behind the observed 9.7% (4.2k rows) -> 54.1%
    (10k rows) jump.

Run:  python parity/nn_calibration.py [--quick]
CPU-friendly (minutes); paste the tables into VERIFY_r05.md.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def synth(rng: np.random.Generator, n: int, noise: float = 2.0):
    """Feature/target process with IRREDUCIBLE noise: 17 features, the
    target a smooth nonlinear map plus Gaussian noise of known scale —
    so 'aleatoric' has a ground truth the intervals should cover."""
    x = rng.standard_normal((n, 17)).astype(np.float32)
    f = (10.0 + 4.0 * x[:, 0] - 3.0 * x[:, 1] + 2.0 * np.sin(x[:, 2])
         + x[:, 3] * x[:, 4])
    y = f + noise * rng.standard_normal(n)
    return x, y.astype(np.float32)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="smaller scales for a fast smoke run")
    ap.add_argument("--noise", type=float, default=2.0)
    ap.add_argument("--mc-samples", type=int, default=100)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from montecarlooptionspricer_tpu.config import TrainConfig
    from montecarlooptionspricer_tpu.nn.bnn import split_mdn
    from montecarlooptionspricer_tpu.nn.trainer import BayesianTrainer

    rng = np.random.default_rng(42)
    n_test = 256 if args.quick else 512
    x_test, y_test = synth(rng, n_test, args.noise)
    scales = [500, 2000] if args.quick else [1000, 8000]
    epochs = 30 if args.quick else 60

    print(f"irreducible noise sigma = {args.noise}  (intervals SHOULD be "
          f">= ~3x this wide to cover 99.7%)")
    print("\n| train rows | test RMSE | med sigma_epi | med sigma_alea | "
          "cov 3*sigma_epi (reference semantics) | cov 3*sigma_total |")
    print("|---|---|---|---|---|---|")

    results = []
    for n_train in scales:
        x_tr, y_tr = synth(rng, n_train, args.noise)
        cfg = TrainConfig(input_dim=17, hidden_dim=64, num_epochs=epochs,
                          batch_size=256, checkpoint_path="")
        tr = BayesianTrainer(17, 64, config=cfg)
        t0 = time.time()
        tr.train_model(x_tr, y_tr, num_epochs=epochs, batch_size=256,
                       checkpoint_path="/tmp/nn_calib_ckpt_%d.npz"
                       % n_train)
        t_train = time.time() - t0

        # Reference-semantics MC-dropout draws of means[0], batched.
        draws = np.asarray(tr.predict_mc(x_test, args.mc_samples,
                                         key=jax.random.key(7)),
                           np.float64)            # [S, N]
        mean_epi = draws.mean(axis=0)
        sig_epi = draws.std(axis=0)

        # The MDN's own (aleatoric) variance about means[0], eval mode.
        out = np.asarray(tr._forward(tr.params, jnp.asarray(x_test)),
                         np.float64)
        means, logvars, mix_sm = (np.asarray(a) for a in
                                  split_mdn(jnp.asarray(out)))
        e = np.exp(mix_sm - mix_sm.max(axis=-1, keepdims=True))
        w = e / e.sum(axis=-1, keepdims=True)     # double softmax (:461)
        var_comp = np.exp(np.clip(logvars, -10, 2))
        mu_mix = (w * means).sum(axis=-1)
        var_mix = (w * (var_comp + means ** 2)).sum(axis=-1) - mu_mix ** 2
        # Predictive variance about the reference's point estimate
        # means[0]: mixture variance + offset of means[0] from the
        # mixture mean.
        sig_alea = np.sqrt(np.maximum(var_mix + (mu_mix - means[:, 0]) ** 2,
                                      0.0))

        resid = y_test.astype(np.float64) - mean_epi
        rmse = float(np.sqrt(np.mean(resid ** 2)))
        cov_ref = float(np.mean(np.abs(resid) <= 3 * sig_epi)) * 100
        sig_tot = np.sqrt(sig_epi ** 2 + sig_alea ** 2)
        cov_full = float(np.mean(np.abs(resid) <= 3 * sig_tot)) * 100
        print(f"| {n_train} | {rmse:.3f} | {np.median(sig_epi):.4f} | "
              f"{np.median(sig_alea):.3f} | {cov_ref:.1f}% | "
              f"{cov_full:.1f}% | ({t_train:.0f}s train)")
        results.append((n_train, rmse, float(np.median(sig_epi)),
                        cov_ref, cov_full))

    (n1, rmse1, se1, c1, f1), (n2, rmse2, se2, c2, f2) = results
    print(f"""
FINDING:
  * sigma_epi (what the reference's interval uses) is ~{se1:.3f}-{se2:.3f}
    — an order of magnitude below the irreducible noise {args.noise}: the
    3-sigma band is structurally too narrow to cover, by design of
    MetaModelPrediction (aleatoric variance discarded).
  * Reference-semantics coverage ROSE {c1:.0f}% -> {c2:.0f}% as training
    rows went {n1} -> {n2}, purely because residuals shrank toward the
    noise floor (RMSE {rmse1:.2f} -> {rmse2:.2f}) while the interval
    width stayed put — the same mechanism as the observed 9.7% (4.2k
    rows) -> 54.1% (10k rows) jump on pipeline data.
  * Adding the model's own aleatoric variance (3 sigma_total) yields
    {f1:.0f}% / {f2:.0f}% at both scales — near-nominal and SCALE-STABLE
    — confirming the narrowness is the reference's discard-aleatoric
    quirk, not a rebuild training/inference bug.""")

    ok = c2 > c1 and f1 > 90 and f2 > 90 and se2 < args.noise
    print("CALIBRATION ADJUDICATION:", "consistent" if ok else
          "INCONSISTENT — investigate")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
