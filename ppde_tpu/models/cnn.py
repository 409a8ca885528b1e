"""Supervised protein fitness predictor: one-hot CNN regressor + ensembles.

Architecture parity with the reference OnehotCNN (ppde/nets.py:350-376):
Conv1d(V -> L, k=5, valid) -> ReLU -> Linear(L -> 2L) -> ReLU -> max over
length -> Linear(2L -> 1). The three-seed ensemble is evaluated as one
stacked-parameter ``vmap`` (the TPU-native form of the reference's Python
loop over surrogates, nets.py:434-442).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ppde_tpu.models import layers


def init(key, n_tokens: int = 20, kernel_size: int = 5, input_size: int = 96,
         dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "encoder": layers.init_conv1d(k1, kernel_size, n_tokens, input_size, dtype),
        "embed": layers.init_linear(k2, input_size, input_size * 2, dtype),
        "decoder": layers.init_linear(k3, input_size * 2, 1, dtype),
    }


@jax.custom_vjp
def max_pool_first(h: jnp.ndarray) -> jnp.ndarray:
    """max over axis 1 whose backward routes ALL gradient to the FIRST
    argmax row — the semantics of torch.max(x, dim=1) (its backward writes
    to the single returned index; reference nets.py:372). JAX's jnp.max VJP
    splits equally across ties instead; the two differ only on exact ties.
    """
    return jnp.max(h, axis=1)


def _mpf_fwd(h):
    return jnp.max(h, axis=1), (jnp.argmax(h, axis=1), h.shape[1])


def _mpf_bwd(res, g):
    idx, T = res
    sel = jax.nn.one_hot(idx, T, axis=1, dtype=g.dtype)  # iota compare
    return (sel * g[:, None, :],)


max_pool_first.defvjp(_mpf_fwd, _mpf_bwd)


def apply(params, x: jnp.ndarray, pool_bwd: str = "split") -> jnp.ndarray:
    """x [B, L, V] one-hot (or relaxed) -> fitness [B]."""
    h = jax.nn.relu(layers.conv1d(params["encoder"], x))
    h = jax.nn.relu(layers.linear(params["embed"], h))
    h = max_pool_first(h) if pool_bwd == "first" else jnp.max(h, axis=1)
    return layers.linear(params["decoder"], h)[:, 0]


def ensemble_apply(stacked_params, x: jnp.ndarray,
                   compute_dtype=None, pool_bwd: str = "split") -> jnp.ndarray:
    """Mean prediction of a stacked ensemble; x [B, L, V] -> [B].

    compute_dtype: optional lower-precision cast (e.g. bf16) for the conv and
    matmul inputs — the TPU-native analog of the reference's AMP autocast;
    the mean is accumulated in float32 either way.
    """
    if compute_dtype is not None:
        stacked_params = jax.tree.map(lambda a: a.astype(compute_dtype),
                                      stacked_params)
        x = x.astype(compute_dtype)
    preds = jax.vmap(lambda p: apply(p, x, pool_bwd))(stacked_params)
    return jnp.mean(preds.astype(jnp.float32), axis=0)


def init_ensemble(key, n_members: int = 3, **kw):
    keys = jax.random.split(key, n_members)
    return layers.stack_params([init(k, **kw) for k in keys])
