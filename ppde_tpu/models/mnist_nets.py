"""MNIST-domain experts: Siamese sum regressor, DAE, ResNet EBM.

Architecture parity with the reference (ppde/nets.py:14-37, 59-168 and
third_party/grathwohl/mlp.py:52-196), re-expressed as pure functions over
parameter pytrees in TPU-native NHWC layout. Flatten/unflatten points
transpose through NCHW so converted torch checkpoints score identically.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ppde_tpu.models import layers
from ppde_tpu.models.layers import swish


def _to_image(x):
    """[B, 784] (or [B,1,28,28]-ish) -> NHWC [B,28,28,1]."""
    return x.reshape(x.shape[0], 28, 28, 1)


# ---------------------------------------------------------------------------
# Siamese regression net (reference MNISTRegressionNet, nets.py:14-37)
# ---------------------------------------------------------------------------

def regression_init(key, nc: int = 16, dtype=jnp.float32):
    ks = jax.random.split(key, 5)
    return {
        "conv": [
            layers.init_conv2d(ks[0], 4, 4, 1, nc, dtype),
            layers.init_conv2d(ks[1], 4, 4, nc, nc, dtype),
            layers.init_conv2d(ks[2], 4, 4, nc, nc, dtype),
            layers.init_conv2d(ks[3], 3, 3, nc, nc, dtype),
        ],
        "out": layers.init_linear(ks[4], nc, 1, dtype),
    }


def _regression_trunk(params, x):
    h = _to_image(x)
    h = swish(layers.conv2d(params["conv"][0], h, stride=2, padding=1))  # 14
    h = swish(layers.conv2d(params["conv"][1], h, stride=2, padding=1))  # 7
    h = swish(layers.conv2d(params["conv"][2], h, stride=2, padding=1))  # 3
    h = swish(layers.conv2d(params["conv"][3], h, stride=1, padding=0))  # 1
    return h.reshape(h.shape[0], -1)  # [B, nc]


def regression_apply(params, x1, x2):
    """Predict the sum of two digits; x1, x2 are [B, 784]."""
    h = _regression_trunk(params, x1) + _regression_trunk(params, x2)
    return layers.linear(params["out"], h)[:, 0]


def regression_ensemble_apply(stacked, x1, x2):
    preds = jax.vmap(regression_apply, in_axes=(0, None, None))(stacked, x1, x2)
    return jnp.mean(preds, axis=0)


def regression_init_ensemble(key, n_members: int = 3, nc: int = 16):
    keys = jax.random.split(key, n_members)
    return layers.stack_params([regression_init(k, nc) for k in keys])


# ---------------------------------------------------------------------------
# BasicBlock (reference grathwohl/mlp.py:52-98)
# ---------------------------------------------------------------------------

def basic_block_init(key, c_in, c_out, stride=1, norm=False, dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    up = stride < 0
    block = {
        "conv1": (layers.init_conv_transpose2d if up else layers.init_conv2d)(
            ks[0], 3, 3, c_in, c_out, dtype),
        "conv2": layers.init_conv2d(ks[1], 3, 3, c_out, c_out, dtype),
    }
    if norm:
        block["norm1"] = layers.init_batchnorm2d(c_out, dtype)
        block["norm2"] = layers.init_batchnorm2d(c_out, dtype)
    if stride != 1 or c_in != c_out:
        block["shortcut"] = (
            layers.init_conv_transpose2d(ks[2], 1, 1, c_in, c_out, dtype)
            if up else layers.init_conv2d(ks[2], 1, 1, c_in, c_out, dtype))
    return block


def basic_block_apply(p, x, stride=1, out_nonlin=True):
    """Residual block; stride<0 denotes the transposed-conv (upsampling) form."""
    norm = "norm1" in p
    if stride < 0:
        h = layers.conv_transpose2d(p["conv1"], x, stride=-stride,
                                    padding=1, output_padding=1)
    else:
        h = layers.conv2d(p["conv1"], x, stride=stride, padding=1)
    if norm:
        h = layers.batchnorm2d(p["norm1"], h)
    h = swish(h)
    out = layers.conv2d(p["conv2"], h, stride=1, padding=1)
    if "shortcut" in p:
        if stride < 0:
            sc = layers.conv_transpose2d(p["shortcut"], x, stride=-stride,
                                         padding=0, output_padding=1)
        else:
            sc = layers.conv2d(p["shortcut"], x, stride=stride, padding=0)
        out = out + sc
    else:
        out = out + x
    if out_nonlin:
        if norm:
            out = layers.batchnorm2d(p["norm2"], out)
        out = swish(out)
    return out


# ---------------------------------------------------------------------------
# ResNet EBM (reference mlp.ResNetEBM/EBM, mlp.py:100-196)
# ---------------------------------------------------------------------------

def ebm_init(key, n_channels: int = 64, mean=None, dtype=jnp.float32):
    ks = jax.random.split(key, 10)
    blocks = [basic_block_init(ks[1], n_channels, n_channels, 2, dtype=dtype),
              basic_block_init(ks[2], n_channels, n_channels, 2, dtype=dtype)]
    blocks += [basic_block_init(ks[3 + i], n_channels, n_channels, 1, dtype=dtype)
               for i in range(6)]
    p = {
        "proj": layers.init_conv2d(ks[0], 3, 3, 1, n_channels, dtype),
        "blocks": blocks,
        "energy_linear": layers.init_linear(ks[9], n_channels, 1, dtype),
    }
    if mean is not None:
        p["mean"] = jnp.asarray(mean, dtype).reshape(-1)
    return p


_EBM_STRIDES = (2, 2, 1, 1, 1, 1, 1, 1)


def ebm_net_apply(params, x):
    """ResNetEBM body: x [B,784] -> scalar energy head [B]."""
    h = layers.conv2d(params["proj"], _to_image(x), stride=1, padding=1)
    for p, s in zip(params["blocks"], _EBM_STRIDES):
        h = basic_block_apply(p, h, stride=s)
    h = jnp.mean(h, axis=(1, 2))  # NHWC spatial mean == torch per-channel mean
    return layers.linear(params["energy_linear"], h)[:, 0]


def ebm_log_prob(params, x):
    """logp(x) = net(x) + Bernoulli(mean).log_prob(x).sum(-1) (mlp.py:175-196)."""
    logp = ebm_net_apply(params, x)
    if "mean" in params:
        m = params["mean"][None, :]
        bd = x * jnp.log(m) + (1.0 - x) * jnp.log1p(-m)
        logp = logp + jnp.sum(bd, axis=-1)
    return logp


# ---------------------------------------------------------------------------
# DAE (reference nets.py:59-168)
# ---------------------------------------------------------------------------

def dae_init(key, latent_dim: int = 16, n_channels: int = 64, dtype=jnp.float32):
    ks = jax.random.split(key, 10)
    nc = n_channels
    return {
        "enc_proj": layers.init_conv2d(ks[0], 3, 3, 1, nc, dtype),
        "enc_blocks": [
            basic_block_init(ks[1], nc, nc, 2, norm=True, dtype=dtype),
            basic_block_init(ks[2], nc, nc, 2, norm=True, dtype=dtype),
            basic_block_init(ks[3], nc, nc, 1, norm=True, dtype=dtype),
        ],
        "fc": layers.init_linear(ks[4], nc * 49, latent_dim, dtype),
        "dec_proj": layers.init_linear(ks[5], latent_dim, nc * 49, dtype),
        "dec_blocks": [
            basic_block_init(ks[6], nc, nc, -2, norm=True, dtype=dtype),
            basic_block_init(ks[7], nc, nc, -2, norm=True, dtype=dtype),
            basic_block_init(ks[8], nc, nc, 1, norm=True, dtype=dtype),
        ],
        "final": layers.init_conv2d(ks[9], 1, 1, nc, 1, dtype),
    }


def dae_encode(params, x):
    h = layers.conv2d(params["enc_proj"], _to_image(x), stride=1, padding=1)
    for p, s in zip(params["enc_blocks"], (2, 2, 1)):
        h = basic_block_apply(p, h, stride=s)
    # torch flattens NCHW: transpose before reshape for checkpoint parity
    h = jnp.transpose(h, (0, 3, 1, 2)).reshape(h.shape[0], -1)
    return layers.linear(params["fc"], h)


def dae_decode(params, z):
    h = layers.linear(params["dec_proj"], z)
    nc = params["final"]["w"].shape[2]
    h = h.reshape(h.shape[0], nc, 7, 7).transpose(0, 2, 3, 1)  # NCHW -> NHWC
    for p, s in zip(params["dec_blocks"], (-2, -2, 1)):
        h = basic_block_apply(p, h, stride=s)
    return layers.conv2d(params["final"], h, stride=1, padding=0)  # logits NHWC


def dae_logits(params, x):
    """Decoded reconstruction logits flattened to [B, 784] in torch order."""
    y = dae_decode(params, dae_encode(params, x))
    return jnp.transpose(y, (0, 3, 1, 2)).reshape(y.shape[0], -1)


def dae_log_prob(params, x):
    """-BCEWithLogits(decode(encode(x)), x) summed over pixels (nets.py:162-168)."""
    logits = dae_logits(params, x)
    x = x.reshape(x.shape[0], -1)
    # bce_with_logits = max(l,0) - l*x + log(1+exp(-|l|))
    bce = jnp.maximum(logits, 0) - logits * x + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return -jnp.sum(bce, axis=-1)


def dae_corrupt(key, x, max_p: int = 15):
    """Flip a random <=max_p% of pixels (training-time noising, nets.py:123-131)."""
    k1, k2 = jax.random.split(key)
    p = jax.random.randint(k1, (), 0, max_p + 1).astype(jnp.float32) / 100.0
    flip = jax.random.bernoulli(k2, p, x.shape).astype(x.dtype)
    return (1 - x) * flip + x * (1 - flip)
