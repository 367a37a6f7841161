"""LibTorch twin of the Bayesian meta-model, for NN behavioral parity
(r04 verdict item 3): the pricers got a compiled-reference head-to-head
(PARITY_CPP.md); this gives the NN the same standard using the torch
(CPU) wheel baked into the image.

`build_torch_twin` constructs the model with the exact module graph the
reference builds in C++ (`/root/reference/src/core/BayesianNN.cpp:36-120`
— torch::nn::Linear funnel 512-256-128-64-32-16, InstanceNorm1d applied
to 2-D (N, C) inputs, per-layer Dropout {0.3,0.3,0.2,0.2,0.1}, the dead
skips/fcOut, the across-batch MultiheadAttention whose output is
narrow()'d away, sigmoid gate, RealNVP affine flow, 15-unit MDN head with
clamped log-vars and softmaxed weights).  Disclosed unavoidable
similarity: the twin exists to run the SAME computation the reference
runs, under real torch semantics, so the graph matches by design; it is
a parity harness, not framework code (same status as parity/harness.cpp).

`transplant` copies a flax param tree into the twin (kernels transposed);
`meta_model_prediction_torch` reproduces BayesianTrainer::
MetaModelPrediction (:582-630): train()-mode forwards with bn1..bn3
eval()'d, N draws of out[0][0], interval mean +- stds * biased-std.
"""

from __future__ import annotations

import warnings

import numpy as np
import torch


class _Flow(torch.nn.Module):
    """RealNVP affine flow z = x * exp(s(x)) + t(x); the log-det output is
    discarded by the reference's caller (BayesianNN.h:22-41)."""

    def __init__(self, dim: int):
        super().__init__()
        self.sLayer = torch.nn.Linear(dim, dim)
        self.tLayer = torch.nn.Linear(dim, dim)

    def forward(self, x):
        return x * torch.exp(self.sLayer(x)) + self.tLayer(x)


class TorchTwin(torch.nn.Module):
    def __init__(self, input_dim: int = 17, num_mixtures: int = 5):
        super().__init__()
        h1, h2, h3, h4, h5, h6 = 512, 256, 128, 64, 32, 16
        self.num_mixtures = num_mixtures
        self.fc1 = torch.nn.Linear(input_dim, h1)
        self.fc2 = torch.nn.Linear(h1, h2)
        self.fc3 = torch.nn.Linear(h2, h3)
        self.fc4 = torch.nn.Linear(h3, h4)
        self.fc5 = torch.nn.Linear(h4, h5)
        self.fc6 = torch.nn.Linear(h5, h6)
        self.fcOut = torch.nn.Linear(h6, 1)          # dead (:53, :135)
        self.fcSkip1 = torch.nn.Linear(h1, h4)       # dead (:56, :140)
        self.fcSkip2 = torch.nn.Linear(h2, h4)       # dead (:57, :144)
        self.fcSkip3 = torch.nn.Linear(h3, h5)
        self.fcSkip4 = torch.nn.Linear(h4, h5)
        self.bn1 = torch.nn.InstanceNorm1d(h1)
        self.bn2 = torch.nn.InstanceNorm1d(h2)
        self.bn3 = torch.nn.InstanceNorm1d(h3)
        self.bn4 = torch.nn.InstanceNorm1d(h4)
        self.bn5 = torch.nn.InstanceNorm1d(h5)
        self.drop1 = torch.nn.Dropout(0.3)
        self.drop2 = torch.nn.Dropout(0.3)
        self.drop3 = torch.nn.Dropout(0.2)
        self.drop4 = torch.nn.Dropout(0.2)
        self.drop5 = torch.nn.Dropout(0.1)
        self.fcGate = torch.nn.Linear(h6, h6)
        self.attn = torch.nn.MultiheadAttention(h3, 4)
        self.fcMDN = torch.nn.Linear(h6, 3 * num_mixtures)
        self.flow0 = _Flow(h6)

    def forward(self, x):
        with warnings.catch_warnings():
            # torch warns on every InstanceNorm1d call with a 2-D input
            # (dim-0 != num_features); the 2-D path IS the reference's
            # cited quirk.
            warnings.simplefilter("ignore")
            out1 = self.drop1(torch.relu(self.bn1(self.fc1(x))))
            _ = self.fcSkip1(out1)                   # computed, unused
            out2 = self.drop2(torch.relu(self.bn2(self.fc2(out1))))
            _ = self.fcSkip2(out2)                   # computed, unused
            out3 = self.drop3(torch.relu(self.bn3(self.fc3(out2))))
            out4 = self.drop4(torch.relu(self.bn4(self.fc4(out3))))
            out5 = self.drop5(torch.relu(self.bn5(self.fc5(out4))))
        out5 = out5 + self.fcSkip3(out3) + self.fcSkip4(out4)
        out6 = torch.relu(self.fc6(out5))
        gated = out6 * torch.sigmoid(self.fcGate(out6))
        a = out3.unsqueeze(0).transpose(0, 1)        # [N,1,128]: batch attn
        attn_out, _ = self.attn(a, a, a)
        attn_out = attn_out.transpose(0, 1).squeeze(0)
        combined = torch.cat([gated, attn_out], dim=1)
        out_final = combined.narrow(1, 0, 16)        # attn discarded (:180)
        out_final = out_final * torch.sigmoid(out_final)   # swish
        z = self.flow0(out_final)
        raw = self.fcMDN(z)
        means, logvars, logits = raw.split(self.num_mixtures, dim=1)
        return torch.cat([means, logvars.clamp(-10, 2),
                          torch.softmax(logits, dim=1)], dim=1)


def transplant(flax_params: dict, twin: TorchTwin) -> None:
    """Copy a flax param tree (bnn.BayesianMetaModelNN) into the twin.
    flax Dense kernels are [in, out]; torch Linear weights are [out, in].
    The dead layers (fcOut/fcSkip1/fcSkip2) have no flax counterpart —
    they contribute nothing to the output, so their random torch init
    stands.  The attention block is transplanted too (flax in_proj kernel
    [E, 3E] -> torch in_proj_weight [3E, E]) even though its output is
    narrow()'d away — cost parity, zero output effect."""
    def put(linear, sub):
        linear.weight.data = torch.from_numpy(
            np.asarray(sub["kernel"]).T.copy()).float()
        linear.bias.data = torch.from_numpy(
            np.asarray(sub["bias"]).copy()).float()

    for name in ("fc1", "fc2", "fc3", "fc4", "fc5", "fc6",
                 "fcSkip3", "fcSkip4", "fcGate", "fcMDN"):
        put(getattr(twin, name), flax_params[name]["Dense_0"])
    put(twin.flow0.sLayer, flax_params["flow0"]["sLayer"]["Dense_0"])
    put(twin.flow0.tLayer, flax_params["flow0"]["tLayer"]["Dense_0"])
    if "attn" in flax_params:
        twin.attn.in_proj_weight.data = torch.from_numpy(
            np.asarray(flax_params["attn"]["in_proj"]["kernel"]).T.copy()
        ).float()
        twin.attn.in_proj_bias.data = torch.from_numpy(
            np.asarray(flax_params["attn"]["in_proj"]["bias"]).copy()
        ).float()
        twin.attn.out_proj.weight.data = torch.from_numpy(
            np.asarray(flax_params["attn"]["out_proj"]["kernel"]).T.copy()
        ).float()
        twin.attn.out_proj.bias.data = torch.from_numpy(
            np.asarray(flax_params["attn"]["out_proj"]["bias"]).copy()
        ).float()


def meta_model_prediction_torch(twin: TorchTwin, features, n_samples: int,
                                stds: float = 3.0, seed: int = 0):
    """BayesianTrainer::MetaModelPrediction (:582-630) under real torch:
    train()-mode MC-dropout with bn1..bn3.eval() (a no-op for
    InstanceNorm1d without running stats — preserved anyway), N draws of
    out[0][0] (the first mixture mean ONLY), interval mean +- stds *
    biased std.  Returns (mean, lower, upper, draws)."""
    x = torch.tensor(np.asarray(features, np.float32)).reshape(1, -1)
    torch.manual_seed(seed)
    twin.eval()
    with torch.no_grad():
        if n_samples <= 1:
            v = float(twin(x)[0, 0])
            return v, v, v, np.array([v])
        twin.train()
        twin.bn1.eval()
        twin.bn2.eval()
        twin.bn3.eval()
        draws = np.array([float(twin(x)[0, 0]) for _ in range(n_samples)])
        twin.eval()
    mean = draws.sum() / n_samples
    var = (draws ** 2).sum() / n_samples - mean * mean
    std = np.sqrt(var) if var > 0 else 0.0
    return mean, mean - stds * std, mean + stds * std, draws
