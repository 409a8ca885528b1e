"""Parity of converted checkpoints: JAX forward == torch forward.

These tests define independent torch oracles for each architecture (from the
documented layer specs) and check our functional JAX implementations produce
identical outputs after checkpoint conversion — the strongest guard that the
committed reference artifacts keep their meaning in the new framework.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from ppde_tpu.models import cnn, layers, mnist_nets, torch_convert
from tests.conftest import REFERENCE, requires_reference

PABP = os.path.join(REFERENCE, "weights/PABP_YEAST_Fields2013")
MNISTW = os.path.join(REFERENCE, "weights/mnist_models")


class TorchOnehotCNN(nn.Module):
    """Independent torch oracle: Conv1d(V->L,k) -> ReLU -> Linear -> ReLU ->
    max over length -> Linear (spec: reference nets.py:350-376)."""

    def __init__(self, n_tokens, kernel_size, input_size):
        super().__init__()
        self.encoder = nn.Conv1d(n_tokens, input_size, kernel_size)
        self.embedding = nn.Sequential(nn.Linear(input_size, input_size * 2),
                                       nn.ReLU(True))
        self.decoder = nn.Linear(input_size * 2, 1)

    def forward(self, x):
        h = F.relu(self.encoder(x.transpose(1, 2)).transpose(1, 2))
        h = self.embedding(h)
        h = torch.max(h, dim=1)[0]
        return self.decoder(h)


@requires_reference
def test_onehot_cnn_checkpoint_parity(rng):
    path = os.path.join(PABP, "onehot_cnn_seed=0.pt")
    tmodel = TorchOnehotCNN(20, 5, 96)
    tmodel.load_state_dict(torch.load(path, map_location="cpu")["model"])
    tmodel.eval()

    x = rng.random((4, 96, 20)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()[:, 0]

    params = torch_convert.onehot_cnn(path)
    ours = np.asarray(cnn.apply(jax.tree.map(jnp.asarray, params), jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=1e-5)


@requires_reference
def test_onehot_cnn_ensemble_parity(rng):
    paths = [os.path.join(PABP, f"onehot_cnn_seed={i}.pt") for i in range(3)]
    x = rng.random((3, 96, 20)).astype(np.float32)
    refs = []
    for p in paths:
        t = TorchOnehotCNN(20, 5, 96)
        t.load_state_dict(torch.load(p, map_location="cpu")["model"])
        t.eval()
        with torch.no_grad():
            refs.append(t(torch.from_numpy(x)).numpy()[:, 0])
    ref_mean = np.mean(refs, axis=0)

    stacked = jax.tree.map(jnp.asarray, torch_convert.onehot_cnn_ensemble(paths))
    ours = np.asarray(cnn.ensemble_apply(stacked, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref_mean, rtol=2e-4, atol=1e-5)


class TorchSwish(nn.Module):
    def forward(self, x):
        return x * torch.sigmoid(x)


class TorchRegressionNet(nn.Module):
    """Independent torch oracle for the Siamese sum regressor
    (spec: reference nets.py:14-37)."""

    def __init__(self, nc=16):
        super().__init__()
        self.net = nn.Sequential(
            nn.Conv2d(1, nc, 4, 2, 1), TorchSwish(),
            nn.Conv2d(nc, nc, 4, 2, 1), TorchSwish(),
            nn.Conv2d(nc, nc, 4, 2, 1), TorchSwish(),
            nn.Conv2d(nc, nc, 3, 1, 0), TorchSwish(),
        )
        self.out = nn.Linear(nc, 1)

    def forward(self, x1, x2):
        h1 = self.net(x1.view(-1, 1, 28, 28))
        h2 = self.net(x2.view(-1, 1, 28, 28))
        return self.out((h1 + h2).squeeze()).squeeze()


@requires_reference
@pytest.mark.parametrize("ckpt,nc", [("ensemble_0_ckpt_25000.pt", 16),
                                     ("one-hot_GT_ckpt_60000.pt", 64)])
def test_mnist_regression_checkpoint_parity(ckpt, nc, rng):
    path = os.path.join(MNISTW, ckpt)
    t = TorchRegressionNet(nc)
    t.load_state_dict(torch.load(path, map_location="cpu")["model"])
    t.eval()
    x1 = (rng.random((5, 784)) > 0.5).astype(np.float32)
    x2 = (rng.random((5, 784)) > 0.5).astype(np.float32)
    with torch.no_grad():
        ref = t(torch.from_numpy(x1), torch.from_numpy(x2)).numpy()

    params = jax.tree.map(jnp.asarray, torch_convert.mnist_regression(path))
    ours = np.asarray(mnist_nets.regression_apply(
        params, jnp.asarray(x1), jnp.asarray(x2)))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=1e-5)


def test_conv_transpose_matches_torch(rng):
    """Transposed-conv semantics (k3 s2 p1 op1 and k1 s2 p0 op1) vs torch."""
    x = rng.random((2, 7, 7, 8)).astype(np.float32)
    tx = torch.from_numpy(x.transpose(0, 3, 1, 2))

    for (k, pad) in [(3, 1), (1, 0)]:
        tconv = nn.ConvTranspose2d(8, 8, k, stride=2, padding=pad,
                                   output_padding=1)
        with torch.no_grad():
            ref = tconv(tx).numpy().transpose(0, 2, 3, 1)
        p = {
            "w": tconv.weight.detach().numpy().transpose(2, 3, 1, 0),
            "b": tconv.bias.detach().numpy(),
        }
        ours = np.asarray(layers.conv_transpose2d(
            jax.tree.map(jnp.asarray, p), jnp.asarray(x),
            stride=2, padding=pad, output_padding=1))
        assert ours.shape == ref.shape == (2, 14, 14, 8)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_batchnorm_matches_torch(rng):
    x = rng.random((2, 4, 4, 8)).astype(np.float32)
    bn = nn.BatchNorm2d(8).eval()
    with torch.no_grad():
        bn.running_mean.copy_(torch.from_numpy(rng.random(8).astype(np.float32)))
        bn.running_var.copy_(torch.from_numpy(0.5 + rng.random(8).astype(np.float32)))
        bn.weight.copy_(torch.from_numpy(rng.random(8).astype(np.float32)))
        bn.bias.copy_(torch.from_numpy(rng.random(8).astype(np.float32)))
        ref = bn(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    p = {"gamma": bn.weight.detach().numpy(), "beta": bn.bias.detach().numpy(),
         "mean": bn.running_mean.numpy(), "var": bn.running_var.numpy()}
    ours = np.asarray(layers.batchnorm2d(jax.tree.map(jnp.asarray, p), jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)
