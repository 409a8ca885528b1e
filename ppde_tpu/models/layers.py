"""Functional NN layers with PyTorch-compatible semantics.

The reference's experts are small torch CNNs (reference: ppde/nets.py,
third_party/grathwohl/mlp.py). We implement them as pure functions over
parameter pytrees so that ensembles become stacked-parameter ``vmap`` calls
and everything fuses under one jit. Parameter layouts are chosen so that
converted torch checkpoints (see ``torch_convert``) drop in directly.

Conventions:
  * images are NHWC, conv kernels HWIO (TPU-native layouts);
  * conv1d inputs are NLC, kernels LIO;
  * linear weights are [in, out] (transposed from torch's [out, in]).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def swish(x):
    return x * jax.nn.sigmoid(x)


def linear(p, x):
    return x @ p["w"] + p["b"]


def conv2d(p, x, stride=1, padding=0):
    """Torch-Conv2d-compatible conv. x [N,H,W,C], kernel [kh,kw,in,out]."""
    pad = ((padding, padding), (padding, padding))
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(stride, stride), padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["b"]


def conv_transpose2d(p, x, stride=2, padding=1, output_padding=1):
    """Torch-ConvTranspose2d-compatible transposed conv.

    Torch: out = (in-1)*stride - 2*padding + k + output_padding.
    Implemented as an input-dilated convolution with a spatially-flipped
    kernel; kernel layout [kh,kw,out,in] converted to HWIO at call time.
    """
    k = p["w"].shape[0]
    lo = k - 1 - padding
    hi = k - 1 - padding + output_padding
    # stored [kh,kw,out,in]: flip spatially and swap channel axes to HWIO
    w = jnp.flip(p["w"], axis=(0, 1)).transpose(0, 1, 3, 2)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((lo, hi), (lo, hi)),
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["b"]


def conv1d(p, x, stride=1, padding=0):
    """Torch-Conv1d-compatible conv. x [N,L,C], kernel [k,in,out]."""
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(stride,), padding=((padding, padding),),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return y + p["b"]


def batchnorm2d(p, x, eps=1e-5):
    """Inference-mode BatchNorm2d over channel dim of NHWC input."""
    inv = jax.lax.rsqrt(p["var"] + eps)
    return (x - p["mean"]) * inv * p["gamma"] + p["beta"]


def stack_params(param_list):
    """Stack N structurally-identical pytrees along a new leading axis.

    Ensembles evaluate as ``vmap(apply, in_axes=(0, None))(stacked, x)`` —
    one fused program instead of the reference's Python loop over members
    (nets.py:403-409, 434-442).
    """
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *param_list)


def init_linear(key, n_in, n_out, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    bound = 1.0 / np.sqrt(n_in)
    return {
        "w": jax.random.uniform(k1, (n_in, n_out), dtype, -bound, bound),
        "b": jax.random.uniform(k2, (n_out,), dtype, -bound, bound),
    }


def init_conv2d(key, kh, kw, c_in, c_out, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    bound = 1.0 / np.sqrt(c_in * kh * kw)
    return {
        "w": jax.random.uniform(k1, (kh, kw, c_in, c_out), dtype, -bound, bound),
        "b": jax.random.uniform(k2, (c_out,), dtype, -bound, bound),
    }


def init_conv_transpose2d(key, kh, kw, c_in, c_out, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    bound = 1.0 / np.sqrt(c_in * kh * kw)
    return {
        # layout [kh,kw,out,in] is flipped to HWIO inside conv_transpose2d
        "w": jax.random.uniform(k1, (kh, kw, c_out, c_in), dtype, -bound, bound),
        "b": jax.random.uniform(k2, (c_out,), dtype, -bound, bound),
    }


def init_conv1d(key, k, c_in, c_out, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    bound = 1.0 / np.sqrt(c_in * k)
    return {
        "w": jax.random.uniform(k1, (k, c_in, c_out), dtype, -bound, bound),
        "b": jax.random.uniform(k2, (c_out,), dtype, -bound, bound),
    }


def init_batchnorm2d(c, dtype=jnp.float32):
    return {
        "gamma": jnp.ones((c,), dtype), "beta": jnp.zeros((c,), dtype),
        "mean": jnp.zeros((c,), dtype), "var": jnp.ones((c,), dtype),
    }
