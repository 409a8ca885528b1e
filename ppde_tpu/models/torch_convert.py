"""Convert reference PyTorch checkpoints (.pt) / pickles (.pkl) to pytrees.

The reference ships trained artifacts (weights/: onehot_cnn_seed=*.pt,
mnist ensemble/oracle ckpts, linear oracle pkls — see SURVEY.md §2) whose
state-dict layouts are defined by torch modules in ppde/nets.py and
third_party/grathwohl/mlp.py. This module maps those layouts onto our
functional parameter pytrees (layers.py conventions). torch is imported
lazily — it is only needed at conversion time, never in the compute path.
"""
from __future__ import annotations

import numpy as np


def _torch_load(path):
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["model"] if isinstance(ckpt, dict) and "model" in ckpt else ckpt
    return {k: v.detach().numpy() for k, v in sd.items()}


def _lin(sd, prefix):
    return {"w": np.ascontiguousarray(sd[f"{prefix}.weight"].T),
            "b": sd[f"{prefix}.bias"]}


def _conv2d(sd, prefix):
    # torch [out,in,kh,kw] -> HWIO [kh,kw,in,out]
    return {"w": np.ascontiguousarray(sd[f"{prefix}.weight"].transpose(2, 3, 1, 0)),
            "b": sd[f"{prefix}.bias"]}


def _conv_t2d(sd, prefix):
    # torch ConvTranspose2d [in,out,kh,kw] -> our [kh,kw,out,in]
    return {"w": np.ascontiguousarray(sd[f"{prefix}.weight"].transpose(2, 3, 1, 0)),
            "b": sd[f"{prefix}.bias"]}


def _conv1d(sd, prefix):
    # torch [out,in,k] -> WIO [k,in,out]
    return {"w": np.ascontiguousarray(sd[f"{prefix}.weight"].transpose(2, 1, 0)),
            "b": sd[f"{prefix}.bias"]}


def _bn(sd, prefix):
    return {"gamma": sd[f"{prefix}.weight"], "beta": sd[f"{prefix}.bias"],
            "mean": sd[f"{prefix}.running_mean"], "var": sd[f"{prefix}.running_var"]}


# ---------------------------------------------------------------------------
# protein supervised CNN (reference OnehotCNN, nets.py:350-376)
# ---------------------------------------------------------------------------

def onehot_cnn(path: str) -> dict:
    sd = _torch_load(path)
    return {
        "encoder": _conv1d(sd, "encoder"),
        "embed": _lin(sd, "embedding.0"),
        "decoder": _lin(sd, "decoder"),
    }


def onehot_cnn_ensemble(paths: list[str]) -> dict:
    from ppde_tpu.models.layers import stack_params

    return stack_params([onehot_cnn(p) for p in paths])


# ---------------------------------------------------------------------------
# MNIST regression net (reference MNISTRegressionNet, nets.py:14-37)
# ---------------------------------------------------------------------------

def mnist_regression(path: str) -> dict:
    sd = _torch_load(path)
    return {
        "conv": [_conv2d(sd, f"net.{i}") for i in (0, 2, 4, 6)],
        "out": _lin(sd, "out"),
    }


def mnist_regression_ensemble(paths: list[str]) -> dict:
    from ppde_tpu.models.layers import stack_params

    return stack_params([mnist_regression(p) for p in paths])


# ---------------------------------------------------------------------------
# MNIST ResNet EBM (reference mlp.EBM/ResNetEBM, grathwohl/mlp.py:100-196)
# ---------------------------------------------------------------------------

def _basic_block(sd, prefix, norm: bool, transpose_shortcut: bool):
    block = {
        "conv1": (_conv_t2d if transpose_shortcut == "up" else _conv2d)(sd, f"{prefix}.conv1"),
        "conv2": _conv2d(sd, f"{prefix}.conv2"),
    }
    if norm:
        block["norm1"] = _bn(sd, f"{prefix}.norm1")
        block["norm2"] = _bn(sd, f"{prefix}.norm2")
    if f"{prefix}.shortcut_conv.weight" in sd:
        block["shortcut"] = (
            _conv_t2d(sd, f"{prefix}.shortcut_conv")
            if transpose_shortcut == "up" else _conv2d(sd, f"{prefix}.shortcut_conv")
        )
    return block


def resnet_ebm(path: str) -> dict:
    """EBM checkpoint: {'model': state_dict} with net.* (ResNetEBM) + mean."""
    sd = _torch_load(path)
    params = {
        "proj": _conv2d(sd, "net.proj"),
        "blocks": [
            _basic_block(sd, f"net.net.{i}", norm=False, transpose_shortcut="down")
            for i in range(8)
        ],
        "energy_linear": _lin(sd, "net.energy_linear"),
    }
    if "mean" in sd:
        params["mean"] = sd["mean"]
    return params


# ---------------------------------------------------------------------------
# MNIST DAE (reference DAE, nets.py:59-168)
# ---------------------------------------------------------------------------

def dae(path: str) -> dict:
    sd = _torch_load(path)
    enc_blocks = [
        _basic_block(sd, f"encoder.{i}", norm=True, transpose_shortcut="down")
        for i in (1, 2, 3)
    ]
    dec_blocks = [
        _basic_block(sd, f"decoder.{i}", norm=True,
                     transpose_shortcut="up" if i in (2, 3) else "down")
        for i in (2, 3, 4)
    ]
    return {
        "enc_proj": _conv2d(sd, "encoder.0"),
        "enc_blocks": enc_blocks,
        "fc": _lin(sd, "fc"),
        "dec_proj": _lin(sd, "decoder.0"),
        "dec_blocks": dec_blocks,
        "final": _conv2d(sd, "final_layer"),
    }


# ---------------------------------------------------------------------------
# augmented linear-regression oracle pkls (reference nets.py:315-329)
# ---------------------------------------------------------------------------

def linear_oracle(paths: list[str]) -> dict:
    import pickle

    coefs, intercepts, regs = [], [], []
    for p in paths:
        with open(p, "rb") as f:
            d = pickle.load(f)
        coefs.append(np.asarray(d["coef_"], np.float32))
        intercepts.append(np.float32(d["intercept_"]))
        regs.append(np.float32(d["reg_coef"]))
    return {
        "coef": np.stack(coefs),          # [S, 1 + L*V]
        "intercept": np.asarray(intercepts),  # [S]
        "reg_coef": np.asarray(regs),     # [S]
    }
