"""Potts model fitting: pseudolikelihood maximization (plmDCA) in JAX.

The reference ships pre-fit potts.pkl artifacts (all three are missing
git-LFS blobs, .MISSING_LARGE_BLOBS) and contains no fitter. This module
closes that gap natively: given an .a2m MSA it fits couplings J and fields h
by L2-regularized pseudolikelihood, with standard 80%-identity sequence
reweighting — the whole objective is two MXU matmuls per step.

Conventions match the runtime PottsModel (potts.py): couplings live as a
symmetric [L*V, L*V] matrix with zero diagonal blocks; gap characters
contribute nothing (zero one-hot row) and their positions are masked out of
the loss, keeping the 20-letter vocabulary of the committed artifacts.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ppde_tpu import codec, io as pio

VOCAB = codec.VOCAB_SIZE


def msa_to_onehot(msa: list[tuple[str, str]]) -> np.ndarray:
    """Focus-column MSA rows -> one-hot [M, L, V]; gaps become zero rows."""
    L = len(msa[0][1])
    out = np.zeros((len(msa), L, VOCAB), np.float32)
    for m, (_, seq) in enumerate(msa):
        for j, c in enumerate(seq):
            if c != "-":
                out[m, j, codec.AA_TO_INT[c]] = 1.0
    return out


def sequence_weights(onehot: np.ndarray, identity: float = 0.8,
                     batch: int = 1024) -> np.ndarray:
    """1 / neighborhood-size reweighting at the given identity threshold."""
    M, L, V = onehot.shape
    flat = jnp.asarray(onehot.reshape(M, L * V))
    lengths = jnp.asarray(onehot.sum((1, 2)))  # non-gap counts

    @jax.jit
    def counts_for(chunk):
        sim = chunk @ flat.T  # [b, M] shared-identical-position counts
        denom = jnp.minimum(lengths[None, :], chunk.sum(-1, keepdims=True))
        return jnp.sum(sim / jnp.maximum(denom, 1.0) >= identity, axis=-1)

    out = []
    for s in range(0, M, batch):
        out.append(np.asarray(counts_for(flat[s:s + batch])))
    neighbors = np.concatenate(out)
    return (1.0 / np.maximum(neighbors, 1.0)).astype(np.float32)


def _diag_block_mask(L: int) -> np.ndarray:
    """[L*V, L*V] mask, 0 on the L diagonal VxV blocks, 1 elsewhere."""
    m = np.ones((L, L), np.float32) - np.eye(L, dtype=np.float32)
    return np.kron(m, np.ones((V_ := VOCAB, V_), np.float32))


def fit(msa_onehot: np.ndarray, weights: np.ndarray | None = None,
        lambda_J: float = 0.01, lambda_h: float = 0.01,
        steps: int = 500, lr: float = 0.05, seed: int = 0,
        verbose: bool = False):
    """Fit (J [L,L,V,V], h [L,V]) by weighted pseudolikelihood.

    Returns (J, h, history) with J symmetric (J_ij == J_ji^T), zero diagonal.
    """
    M, L, V = msa_onehot.shape
    msa_onehot_j = jnp.asarray(msa_onehot)
    X = jnp.asarray(msa_onehot.reshape(M, L * V))
    present = jnp.asarray(msa_onehot.sum(-1))  # [M, L] non-gap mask
    w = jnp.asarray(weights if weights is not None else np.ones(M, np.float32))
    w = w / w.sum()
    mask = jnp.asarray(_diag_block_mask(L))

    def sym(W):
        return 0.5 * (W + W.T) * mask

    def loss_fn(params):
        W = sym(params["W"])
        logits = (X @ W).reshape(M, L, V) + params["h"][None]
        logp = jax.nn.log_softmax(logits, axis=-1)
        ll = jnp.sum(logp * msa_onehot_j, axis=-1)  # [M, L]
        pll = jnp.sum(ll * present, axis=-1)  # [M]
        nll = -jnp.sum(w * pll)
        reg = lambda_J * jnp.sum(W ** 2) + lambda_h * jnp.sum(params["h"] ** 2)
        return nll + reg

    params = {"W": jnp.zeros((L * V, L * V)), "h": jnp.zeros((L, V))}
    schedule = optax.cosine_decay_schedule(lr, decay_steps=steps,
                                           alpha=0.02)
    opt = optax.adam(schedule)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state):
        loss, g = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    history = []
    for i in range(steps):
        params, opt_state, loss = train_step(params, opt_state)
        if verbose and (i % 50 == 0 or i == steps - 1):
            print(f"[plm] step {i} loss {float(loss):.4f}", flush=True)
        history.append(float(loss))

    W = np.asarray(sym(params["W"]), np.float64)
    # [L*V, L*V] W[(j,l),(i,k)] -> J[i,j,k,l] (inverse of potts flattening)
    J = W.reshape(L, VOCAB, L, VOCAB).transpose(2, 0, 3, 1)
    h = np.asarray(params["h"], np.float64)
    return J, h, history


def fit_from_a2m(a2m_path: str, steps: int = 500, lr: float = 0.05,
                 lambda_J: float = 0.01, lambda_h: float = 0.01,
                 max_seqs: int | None = None, reweight: bool = True,
                 seed: int = 0, verbose: bool = False):
    """End-to-end: a2m -> (J, h, index_list, offset) ready for save_npz.

    index_list holds absolute residue numbers of the focus columns
    (region start + column offset), matching the reference artifact contract
    (nets.py:250,255-261).
    """
    msa = pio.load_msa(a2m_path)
    if max_seqs is not None and len(msa) > max_seqs:
        rng = np.random.default_rng(seed)
        keep = rng.choice(len(msa) - 1, size=max_seqs - 1, replace=False) + 1
        msa = [msa[0]] + [msa[i] for i in keep]
    onehot = msa_to_onehot(msa)
    w = sequence_weights(onehot) if reweight else None
    J, h, hist = fit(onehot, w, lambda_J, lambda_h, steps, lr, seed, verbose)

    name, start, _ = pio.msa_region(a2m_path)
    cols = pio.focus_columns(a2m_path)
    index_list = np.asarray([start + c for c in cols])
    return J, h, index_list, start, hist
