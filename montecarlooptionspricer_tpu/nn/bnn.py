"""Bayesian meta-model network — Flax equivalent of the LibTorch model in
src/core/BayesianNN.cpp:36-223 / include/core/BayesianNN.h:22-86.

Topology (BayesianNN.cpp:129-195): a funnel MLP 512-256-128-64-32-16 with
InstanceNorm + dropout per layer, two live skip projections (128->32 and
64->32) into the fifth layer, a sigmoid gate on the 16-d head, a RealNVP
affine flow, and a 15-unit mixture-density head (5 means / 5 clamped
log-variances / 5 softmax weights).

Reference quirks preserved deliberately (cited; see also SURVEY.md C15):
  * torch InstanceNorm1d on a 2-D (N, C) input treats it as (C, L) — i.e.
    it normalizes each *row* over the feature axis, no affine (BayesianNN.cpp
    :62-66, :133-151).  Implemented as `row_norm`.
  * The 4-head MultiheadAttention runs over the *batch* axis (the (N, 1, E)
    tensor at :168-171 makes samples attend to each other), and its output
    is then entirely discarded by ``narrow(1, 0, 16)`` — the concatenated
    [gate(16) | attn(128)] is sliced back to the first 16 columns (:174-180).
    `full_topology=True` computes it anyway (cost parity + gradient-graph
    parity: it gets no gradient either way); False skips the dead work.
  * fcOut (16->1), fcSkip1 (512->64) and fcSkip2 (256->64) are constructed
    and/or computed but never contribute to the output (:53, :56-57,
    :135, :140) — dead parameters.  They receive no gradient in the
    reference (its L2 term only covers params with grads defined,
    :483-487), so we simply do not instantiate them.
  * The model output's mixture-weight block is already softmaxed
    (:198-208); the training loss softmaxes it *again* (:461) — the
    effective mixture weights are softmax(softmax(logits)).  The loss in
    nn/trainer.py reproduces that.

Weight init matches torch kaiming_normal_(a=sqrt(5), fan_in, leaky_relu):
std = sqrt(2 / (1 + 5)) / sqrt(fan_in) = sqrt(1/(3 fan_in)); bias uniform
(-1/sqrt(fan_in), 1/sqrt(fan_in))  (BayesianNN.cpp:93-120).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

NORM_EPS = 1e-5
LOGVAR_MIN, LOGVAR_MAX = -10.0, 2.0


def kaiming_a5_kernel_init():
    # gain^2 = 2 / (1 + a^2) with a = sqrt(5)  ->  1/3.
    return nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "normal")


def torch_bias_init(fan_in: int):
    bound = 1.0 / jnp.sqrt(float(fan_in))

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class TorchLinear(nn.Module):
    """Dense layer with the reference's init scheme."""

    features: int
    fan_in: int

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.features,
                        kernel_init=kaiming_a5_kernel_init(),
                        bias_init=torch_bias_init(self.fan_in))(x)


def row_norm(x):
    """InstanceNorm1d-on-2D semantics: per-row normalization over features,
    biased variance, eps 1e-5, no affine (BayesianNN.cpp:62-66)."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + NORM_EPS)


def swish(x):
    """x * sigmoid(x)  (BayesianNN.cpp:123-127)."""
    return x * jax.nn.sigmoid(x)


class RealNVPFlow(nn.Module):
    """Affine flow z = x * exp(s(x)) + t(x)  (BayesianNN.h:22-41).  The
    log-det-Jacobian is computed but discarded by the reference's caller
    (BayesianNN.cpp:212-223), so it is not returned."""

    dim: int

    @nn.compact
    def __call__(self, x):
        s = TorchLinear(self.dim, self.dim, name="sLayer")(x)
        t = TorchLinear(self.dim, self.dim, name="tLayer")(x)
        return x * jnp.exp(s) + t


class BatchMultiheadAttention(nn.Module):
    """The reference's across-batch self-attention (BayesianNN.cpp:79,
    168-171): embed 128, 4 heads, sequence axis == batch axis.  Output is
    discarded downstream; implemented for topology/compute parity."""

    embed_dim: int = 128
    num_heads: int = 4

    @nn.compact
    def __call__(self, x):  # x: [batch, embed]
        d = self.embed_dim // self.num_heads
        qkv = nn.Dense(3 * self.embed_dim, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(a):  # [batch, embed] -> [heads, batch, d]
            return a.reshape(-1, self.num_heads, d).transpose(1, 0, 2)

        q, k, v = heads(q), heads(k), heads(v)
        scores = jnp.einsum("hqd,hkd->hqk", q, k) / jnp.sqrt(float(d))
        attn = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("hqk,hkd->hqd", attn, v)
        out = out.transpose(1, 0, 2).reshape(-1, self.embed_dim)
        return nn.Dense(self.embed_dim, name="out_proj")(out)


class BayesianMetaModelNN(nn.Module):
    """The meta-model (BayesianNN.cpp:36-195).  ``hidden_dim`` is accepted
    for constructor parity (BayesianNN.h:48) but, as in the reference, the
    funnel widths are fixed constants."""

    input_dim: int = 17
    hidden_dim: int = 64
    num_mixtures: int = 5
    full_topology: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        h1, h2, h3, h4, h5, h6 = 512, 256, 128, 64, 32, 16
        drop = lambda rate, y: nn.Dropout(rate, deterministic=not train)(y)

        out1 = drop(0.3, nn.relu(row_norm(
            TorchLinear(h1, self.input_dim, name="fc1")(x))))
        out2 = drop(0.3, nn.relu(row_norm(
            TorchLinear(h2, h1, name="fc2")(out1))))
        out3 = drop(0.2, nn.relu(row_norm(
            TorchLinear(h3, h2, name="fc3")(out2))))
        out4 = drop(0.2, nn.relu(row_norm(
            TorchLinear(h4, h3, name="fc4")(out3))))
        out5 = drop(0.1, nn.relu(row_norm(
            TorchLinear(h5, h4, name="fc5")(out4))))

        skip3 = TorchLinear(h5, h3, name="fcSkip3")(out3)
        skip4 = TorchLinear(h5, h4, name="fcSkip4")(out4)
        out5 = out5 + skip3 + skip4                      # :155-157

        out6 = nn.relu(TorchLinear(h6, h5, name="fc6")(out5))
        gated = out6 * jax.nn.sigmoid(
            TorchLinear(h6, h6, name="fcGate")(out6))    # :163

        if self.full_topology:
            attn_out = BatchMultiheadAttention(h3, 4, name="attn")(out3)
            combined = jnp.concatenate([gated, attn_out], axis=-1)
            out_final = combined[:, :h6]                 # narrow -> attn dead
        else:
            out_final = gated
        out_final = swish(out_final)                     # :180

        z = RealNVPFlow(h6, name="flow0")(out_final)     # :183, :212-223

        raw = TorchLinear(3 * self.num_mixtures, h6, name="fcMDN")(z)
        means, logvars, logits = jnp.split(raw, 3, axis=-1)
        logvars = jnp.clip(logvars, LOGVAR_MIN, LOGVAR_MAX)   # :204
        mix = jax.nn.softmax(logits, axis=-1)                 # :206
        return jnp.concatenate([means, logvars, mix], axis=-1)  # :208


def split_mdn(outputs, num_mixtures: int = 5):
    """Split the 15-column output into (means, logvars, mix-block).  NB the
    mix block is already softmaxed — consumers that mirror the reference's
    loss must softmax it again (BayesianNN.cpp:458-461)."""
    means = outputs[..., :num_mixtures]
    logvars = outputs[..., num_mixtures:2 * num_mixtures]
    mix = outputs[..., 2 * num_mixtures:]
    return means, logvars, mix
