"""NN behavioral parity: the JAX rebuild vs (a) a scalar NumPy oracle of
the reference forward pass and (b) a real-torch twin of the reference's
LibTorch model (r04 verdict item 3).

The pricers got a compiled-C++ head-to-head (tests/test_cpp_parity.py);
these tests give the NN the same standard, at three levels:

  1. the deterministic forward pass matches, weight-for-weight, both the
     NumPy oracle and the torch twin (so what LibTorch computes, the
     rebuild computes);
  2. the prediction-INTERVAL arithmetic is the reference's exactly
     (mean +- stds * biased-std of MC-dropout draws of out[0][0] — the
     first mixture mean only, aleatoric variance discarded,
     BayesianNN.cpp:582-630);
  3. the MC-dropout draw distributions agree statistically between
     flax dropout and torch dropout on identical weights — the two
     frameworks sample different masks, so parity is distributional.

Together these adjudicate the r04 coverage question: the rebuild's
intervals ARE what LibTorch would produce; the 9.7-54% 3-sigma coverage
is the reference's own semantics (the interval ignores the MDN's
aleatoric variance), not a rebuild bug.  parity/nn_calibration.py
quantifies that decomposition on a trained model.
"""

import os
import sys

import numpy as np
import pytest

import jax

from montecarlooptionspricer_tpu.nn.trainer import BayesianTrainer
from oracles import bnn_forward_np, meta_model_prediction_np

HERE = os.path.dirname(os.path.abspath(__file__))
PARITY = os.path.join(os.path.dirname(HERE), "parity")


@pytest.fixture(scope="module")
def trainer():
    return BayesianTrainer(input_dim=17, hidden_dim=64)


@pytest.fixture(scope="module")
def twin(trainer):
    sys.path.insert(0, PARITY)
    from nn_torch_twin import TorchTwin, transplant

    tw = TorchTwin(input_dim=17)
    transplant(jax.tree.map(np.asarray, trainer.params), tw)
    return tw


def _x(n=8, seed=3):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, 17)).astype(np.float32)


def test_forward_matches_numpy_oracle(trainer):
    x = _x()
    got = np.asarray(trainer._forward(trainer.params, x))
    want = bnn_forward_np(jax.tree.map(np.asarray, trainer.params), x)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_forward_matches_torch_twin(trainer, twin):
    import torch

    x = _x(n=16, seed=7)
    got = np.asarray(trainer._forward(trainer.params, x))
    twin.eval()
    with torch.no_grad():
        want = twin(torch.from_numpy(x)).numpy()
    # f32 in both frameworks; tolerance covers accumulation-order noise
    # through the 512-wide funnel.
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_interval_arithmetic_is_reference_exact(trainer):
    """meta_model_prediction == the oracle formula applied to the SAME
    MC draws (reproduced by replaying the dropout-key split)."""
    feats = _x(n=1, seed=11)[0]
    saved = trainer.dropout_key
    mean, lo, hi = trainer.meta_model_prediction(feats, n_samples=64)
    # Reproduce the draws: meta_model_prediction -> predict_mc split the
    # saved key exactly once.
    _, key = jax.random.split(saved)
    trainer.dropout_key = saved  # restore for other tests
    vals = np.asarray(trainer.predict_mc(feats.reshape(1, -1), 64,
                                         key=key)[:, 0], np.float64)
    omean, olo, ohi = meta_model_prediction_np(vals, stds=3.0)
    assert mean == pytest.approx(omean, rel=1e-6)
    assert lo == pytest.approx(olo, rel=1e-5, abs=1e-7)
    assert hi == pytest.approx(ohi, rel=1e-5, abs=1e-7)


def test_single_sample_prediction_degenerate_interval(trainer, twin):
    """n_samples <= 1: the reference returns (val, val, val) from one
    eval-mode forward (:624-629); both implementations must agree on the
    deterministic value itself."""
    from nn_torch_twin import meta_model_prediction_torch

    feats = _x(n=1, seed=13)[0]
    m_jax, lo_jax, hi_jax = trainer.meta_model_prediction(feats,
                                                          n_samples=1)
    m_t, lo_t, hi_t, _ = meta_model_prediction_torch(twin, feats, 1)
    assert m_jax == lo_jax == hi_jax
    assert m_t == lo_t == hi_t
    assert m_jax == pytest.approx(m_t, rel=2e-4, abs=2e-5)


def test_mc_dropout_interval_statistical_parity_with_torch(trainer, twin):
    """Identical weights, each framework's own dropout masks: the draw
    distributions of out[0][0] must agree in mean (within combined
    stderr) and spread (std ratio bounded).  This is the interval-parity
    evidence: with matching forward passes AND matching draw
    distributions, mean +- 3*std intervals match distributionally."""
    from nn_torch_twin import meta_model_prediction_torch

    feats = _x(n=1, seed=17)[0]
    n = 512
    key = jax.random.key(123)
    vals_jax = np.asarray(
        trainer.predict_mc(feats.reshape(1, -1), n, key=key)[:, 0],
        np.float64)
    _, _, _, vals_t = meta_model_prediction_torch(twin, feats, n, seed=5)
    m_j, s_j = vals_jax.mean(), vals_jax.std()
    m_t, s_t = vals_t.mean(), vals_t.std()
    se = np.hypot(s_j, s_t) / np.sqrt(n)
    assert abs(m_j - m_t) < 5 * se, (m_j, m_t, se)
    assert 0.75 < s_j / s_t < 1.33, (s_j, s_t)
