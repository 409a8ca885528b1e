"""Protein ground-truth oracle: "Augmented EVmutation" linear ensemble.

Parity with the reference AugmentedLinearRegression (ppde/nets.py:315-347):
an ensemble of 20 ridge regressions over the feature vector
[sqrt(1/potts_reg) * delta_hamiltonian, sqrt(1/reg_s) * flat_onehot].
The reference loops over the 20 heads in Python; here the whole ensemble is
two matmuls (the one-hot features hit all heads at once).
"""
from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np
from flax import struct

from ppde_tpu.models import potts as potts_mod


@struct.dataclass
class LinearOracleParams:
    coef: jnp.ndarray        # [S, 1 + L*V]
    intercept: jnp.ndarray   # [S]
    inv_sqrt_reg: jnp.ndarray  # [S] = sqrt(1/reg_coef_s)
    potts: potts_mod.PottsParams


def load(protein_dir: str, n_seeds: int = 20,
         potts_params: potts_mod.PottsParams | None = None) -> LinearOracleParams:
    """Load the 20 linear pkls (+ potts) for a reference protein directory."""
    from ppde_tpu.models import torch_convert

    paths = [
        os.path.join(
            protein_dir,
            f"results-predictor=ev+onehot-train=-1-seed={s}-linear.pkl")
        for s in range(n_seeds)
    ]
    raw = torch_convert.linear_oracle(paths)
    if potts_params is None:
        potts_params = potts_mod.load_pickle(protein_dir)
    return LinearOracleParams(
        coef=jnp.asarray(raw["coef"]),
        intercept=jnp.asarray(raw["intercept"]),
        inv_sqrt_reg=jnp.asarray(np.sqrt(1.0 / raw["reg_coef"])),
        potts=potts_params,
    )


def synthetic(potts_params: potts_mod.PottsParams, full_len: int,
              n_seeds: int = 20, seed: int = 0) -> LinearOracleParams:
    """Deterministic random oracle with the real feature contract (for tests
    and for proteins whose pkl artifacts are absent)."""
    rng = np.random.default_rng(seed)
    d = 1 + full_len * potts_mod.VOCAB
    coef = rng.normal(0, 0.01, (n_seeds, d)).astype(np.float32)
    coef[:, 0] += 0.5  # weight the evolutionary feature
    return LinearOracleParams(
        coef=jnp.asarray(coef),
        intercept=jnp.asarray(rng.normal(0, 0.1, n_seeds).astype(np.float32)),
        inv_sqrt_reg=jnp.ones((n_seeds,)),
        potts=potts_params,
    )


def apply(params: LinearOracleParams, x: jnp.ndarray) -> jnp.ndarray:
    """Oracle fitness of one-hot proteins x [B, L_full, V] -> [B].

    y_s = c_s0 * sqrt(1/potts_reg) * dH(x) + sqrt(1/r_s) * (x . c_s[1:]) + b_s,
    averaged over heads s (nets.py:332-347).
    """
    dH = potts_mod.score(params.potts, x, delta=True)  # [B]
    xf = x.reshape(x.shape[0], -1)
    ev = dH * np.sqrt(1.0 / params.potts.reg_coef)  # [B]
    onehot_term = xf @ params.coef[:, 1:].T  # [B, S]
    y = (ev[:, None] * params.coef[None, :, 0]
         + onehot_term * params.inv_sqrt_reg[None, :]
         + params.intercept[None, :])
    return jnp.mean(y, axis=-1)
