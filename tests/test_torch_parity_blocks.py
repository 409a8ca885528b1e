"""EBM / DAE full-forward parity against independent torch oracles.

The reference's EBM and DAE weight blobs are missing from the repo
(.MISSING_LARGE_BLOBS), so parity is checked with randomly-initialized torch
modules round-tripped through a saved state_dict and our converter.
"""
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from ppde_tpu.models import mnist_nets, torch_convert


class TorchSwish(nn.Module):
    def forward(self, x):
        return x * torch.sigmoid(x)


def conv3x3(cin, cout, stride=1):
    if stride < 0:
        return nn.ConvTranspose2d(cin, cout, 3, stride=-stride, padding=1,
                                  output_padding=1, bias=True)
    return nn.Conv2d(cin, cout, 3, stride=stride, padding=1, bias=True)


class TorchBasicBlock(nn.Module):
    """Independent oracle for the residual block (spec: grathwohl/mlp.py:52-98)."""

    def __init__(self, cin, cout, stride=1, norm=False):
        super().__init__()
        self.norm = norm
        self.stride = stride
        self.nonlin1, self.nonlin2 = TorchSwish(), TorchSwish()
        if norm:
            self.norm1 = nn.BatchNorm2d(cout)
            self.norm2 = nn.BatchNorm2d(cout)
        self.conv1 = conv3x3(cin, cout, stride)
        self.conv2 = conv3x3(cout, cout)
        self.shortcut_conv = None
        if stride != 1 or cin != cout:
            if stride < 0:
                self.shortcut_conv = nn.ConvTranspose2d(
                    cin, cout, 1, stride=-stride, output_padding=1, bias=True)
            else:
                self.shortcut_conv = nn.Conv2d(cin, cout, 1, stride=stride, bias=True)

    def forward(self, x):
        h = self.conv1(x)
        if self.norm:
            h = self.norm1(h)
        out = self.nonlin1(h)
        out = self.conv2(out)
        out = out + (self.shortcut_conv(x) if self.shortcut_conv is not None else x)
        if self.norm:
            out = self.norm2(out)
        return self.nonlin2(out)


class TorchResNetEBM(nn.Module):
    def __init__(self, nc=8):
        super().__init__()
        self.proj = nn.Conv2d(1, nc, 3, 1, 1)
        blocks = [TorchBasicBlock(nc, nc, 2), TorchBasicBlock(nc, nc, 2)]
        blocks += [TorchBasicBlock(nc, nc, 1) for _ in range(6)]
        self.net = nn.Sequential(*blocks)
        self.energy_linear = nn.Linear(nc, 1)

    def forward(self, x):
        h = self.proj(x.view(-1, 1, 28, 28))
        h = self.net(h)
        h = h.view(h.size(0), h.size(1), -1).mean(-1)
        return self.energy_linear(h).squeeze()


class TorchEBM(nn.Module):
    def __init__(self, net, mean):
        super().__init__()
        self.net = net
        self.mean = nn.Parameter(mean, requires_grad=False)

    def forward(self, x):
        bd = torch.distributions.Bernoulli(probs=self.mean).log_prob(x).sum(-1)
        return self.net(x).squeeze() + bd


class TorchDAE(nn.Module):
    """Independent oracle for the DAE (spec: reference nets.py:59-168)."""

    def __init__(self, latent_dim=8, nc=8):
        super().__init__()
        self.encoder = nn.Sequential(
            nn.Conv2d(1, nc, 3, 1, 1),
            TorchBasicBlock(nc, nc, 2, norm=True),
            TorchBasicBlock(nc, nc, 2, norm=True),
            TorchBasicBlock(nc, nc, 1, norm=True),
        )
        self.fc = nn.Linear(nc * 49, latent_dim)
        self.decoder = nn.Sequential(
            nn.Linear(latent_dim, nc * 49),
            nn.Unflatten(-1, (nc, 7, 7)),
            TorchBasicBlock(nc, nc, -2, norm=True),
            TorchBasicBlock(nc, nc, -2, norm=True),
            TorchBasicBlock(nc, nc, 1, norm=True),
        )
        self.final_layer = nn.Conv2d(nc, 1, 1, padding=0)

    def log_prob(self, x):
        h = self.encoder(x.view(-1, 1, 28, 28))
        z = self.fc(h.view(h.size(0), -1))
        y = self.final_layer(self.decoder(z))
        bce = F.binary_cross_entropy_with_logits(
            y.view(x.size(0), 784), x.view(x.size(0), 784), reduction="none")
        return -bce.sum(-1)


def _randomize_bn(module, rng):
    for m in module.modules():
        if isinstance(m, nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.copy_(torch.from_numpy(
                    rng.normal(0, 0.3, m.num_features).astype(np.float32)))
                m.running_var.copy_(torch.from_numpy(
                    0.5 + rng.random(m.num_features).astype(np.float32)))


def test_ebm_log_prob_parity(rng, tmp_path):
    torch.manual_seed(0)
    mean = torch.rand(784) * 0.9 + 0.05
    tmodel = TorchEBM(TorchResNetEBM(nc=8), mean).eval()
    path = tmp_path / "ebm.pt"
    torch.save({"model": tmodel.state_dict()}, path)

    x = (rng.random((3, 784)) > 0.5).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()

    params = jax.tree.map(jnp.asarray, torch_convert.resnet_ebm(str(path)))
    ours = np.asarray(mnist_nets.ebm_log_prob(params, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)


def test_dae_log_prob_parity(rng, tmp_path):
    torch.manual_seed(1)
    tmodel = TorchDAE(latent_dim=8, nc=8).eval()
    _randomize_bn(tmodel, rng)
    path = tmp_path / "dae.pt"
    torch.save({"model": tmodel.state_dict()}, path)

    x = (rng.random((3, 784)) > 0.5).astype(np.float32)
    with torch.no_grad():
        ref = tmodel.log_prob(torch.from_numpy(x)).numpy()

    params = jax.tree.map(jnp.asarray, torch_convert.dae(str(path)))
    ours = np.asarray(mnist_nets.dae_log_prob(params, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-2)
