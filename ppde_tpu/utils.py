"""Device-side sequence utilities (pure jnp; safe inside jit/scan).

Reimplements the mutation bookkeeping of the reference
(ppde/utils.py:5-28, ppde/metrics.py:78-85) as vectorized JAX ops.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30  # finite stand-in for -inf: keeps softmax/log_softmax NaN-free


def mut_distance(x: jnp.ndarray, wt: jnp.ndarray) -> jnp.ndarray:
    """Hamming distance in positions between x [N,L,V] and wt [L,V] or [1,L,V].

    Parity with reference mut_distance (utils.py:5-14).
    """
    wt = wt.reshape((1,) + wt.shape[-2:])
    diff = jnp.any(x != wt, axis=-1)
    return jnp.sum(diff.astype(x.dtype), axis=-1)


def revert_only_mask(x: jnp.ndarray, wt: jnp.ndarray) -> jnp.ndarray:
    """Boolean [N,L,V] mask, True where a proposal entry is ALLOWED for a chain
    at its mutation budget: exactly the WT entries of currently-mutated
    positions (substituting there reduces the distance to WT).

    This is the complement of the reference's ``mutation_mask``
    (utils.py:17-28), which marks blocked entries with True.
    """
    wt = wt.reshape((1,) + wt.shape[-2:])
    return (x != wt) & (wt == 1)


def position_window_mask(seq_len: int, vocab_size: int, min_pos: int,
                         max_pos: int) -> jnp.ndarray:
    """Boolean [L,V] mask, True where mutations are allowed
    (positions min_pos..max_pos inclusive). Static; computed once per run.
    """
    pos = jnp.arange(seq_len)
    ok = (pos >= min_pos) & (pos <= max_pos)
    return jnp.broadcast_to(ok[:, None], (seq_len, vocab_size))


def apply_proposal_masks(logits: jnp.ndarray, x: jnp.ndarray,
                         wt: jnp.ndarray, window_ok: jnp.ndarray,
                         nmut_threshold) -> jnp.ndarray:
    """Mask PPDE proposal logits [N, L*V]:
      * entries outside the mutation window get NEG_INF always;
      * chains whose distance to WT >= nmut_threshold may only revert
        (reference protein_samplers/ppde.py:86-104).
    """
    n = logits.shape[0]
    over = (mut_distance(x, wt) >= nmut_threshold).reshape(n, 1)
    revert_ok = revert_only_mask(x, wt).reshape(n, -1)
    ok = jnp.where(over, revert_ok, True) & window_ok.reshape(1, -1)
    return jnp.where(ok, logits, NEG_INF)


def categorical_onehot(key: jax.Array, logits: jnp.ndarray):
    """Sample per-row categorical indices from logits [N, K].

    Returns (idx [N] int32, log_prob [N]) where log_prob is the log-softmax
    value at the sampled index (equivalent to the reference's
    OneHotCategorical(probs=safe_logits_to_probs(logits)).log_prob for any
    index with non-negligible probability; utils.py:106-111).
    """
    idx = jax.random.categorical(key, logits, axis=-1)
    logp = categorical_log_prob(logits, idx)
    return idx, logp


def categorical_log_prob(logits: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """log softmax(logits)[idx] per row; logits [N,K], idx [N]."""
    logz = jax.nn.logsumexp(logits, axis=-1)
    picked = jnp.take_along_axis(logits, idx[:, None], axis=-1)[:, 0]
    return picked - logz


def substitute(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Apply a one-hot substitution: for each chain, set position p=idx//V to
    the one-hot of v=idx%V. x is [N,L,V]; idx is [N] flat indices into L*V.

    Equivalent to the reference's row_select/substitute update
    (protein_samplers/ppde.py:109-113) without materializing one-hot samples.
    """
    n, L, V = x.shape
    p = idx // V
    v = idx % V
    row = jax.nn.one_hot(v, V, dtype=x.dtype)  # [N,V]
    pos_onehot = jax.nn.one_hot(p, L, dtype=x.dtype)  # [N,L]
    return x * (1.0 - pos_onehot[:, :, None]) + pos_onehot[:, :, None] * row[:, None, :]


def flip_bits(x: jnp.ndarray, changes: jnp.ndarray) -> jnp.ndarray:
    """Binary-domain flip: x, changes in {0,1} [N,D]; flips where changes==1."""
    return (1.0 - x) * changes + x * (1.0 - changes)


def n_hops(population: jnp.ndarray, wt: jnp.ndarray):
    """Mean/std of one-sided hops ((x - wt) > 0 summed) across a population.

    Parity with reference n_hops (metrics.py:78-85).
    """
    diff = ((population - wt.reshape((1,) + wt.shape[-2:])) > 0)
    hops = jnp.sum(diff.astype(jnp.float32), axis=(-2, -1))
    return jnp.mean(hops), jnp.std(hops, ddof=1)


def quantiles(v, qs=(0.5, 0.9)):
    """Host-side convenience for log lines."""
    import numpy as np
    return np.quantile(np.asarray(v), list(qs))
