"""Potts model (dense pairwise Hamiltonian) — TPU-first formulation.

The reference computes the Hamiltonian with a pair of einsums over a
[L,L,V,V] coupling tensor (reference: ppde/nets.py:282-299). On TPU we
flatten the couplings once, at load time, into a symmetric [L*V, L*V]
matrix ``W`` so that each energy evaluation is ONE MXU matmul:

    Jx  = x_flat @ W                     # [B, L*V]
    H   = 0.5 * sum(x * Jx) + x @ h      # [B]
    dH/dx = Jx + h                       # free: reuses the same matmul

The analytic gradient makes the fused energy+grad evaluation (the
reference's ``get_energy_and_grads``, ppde/energy.py:103-108, which pays a
full autograd backward) a zero-cost epilogue: we register a custom VJP that
saves ``Jx`` as residual. A Pallas kernel version of the same contraction
lives in ``ppde_tpu.ops.potts_pallas``.

Parameters come from (a) the reference's ``potts.pkl`` artifacts, (b) our
own pseudolikelihood fitter (``ppde_tpu.models.potts_fit``), or (c) a
deterministic synthetic initializer for benchmarks/tests.
"""
from __future__ import annotations

import os
import pickle
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ppde_tpu import codec, io as pio

VOCAB = codec.VOCAB_SIZE


LANE = 128  # TPU lane width; W/h are zero-padded to multiples of LANE


def _pad_up(n: int, m: int = LANE) -> int:
    return ((n + m - 1) // m) * m


@struct.dataclass
class PottsParams:
    """Pytree of Potts parameters in MXU-friendly layout.

    W: [P, P] symmetric flattened couplings, W[(j,l),(i,k)] = J[i,j,k,l],
       with zero diagonal blocks, zero-padded from L*V up to P (a multiple
       of the 128 TPU lane width so both the XLA and Pallas paths run on
       aligned tiles; zero padding is exact — padded lanes contribute 0).
    h: [P] flattened fields (zero-padded).
    wt_H: scalar Hamiltonian of the wild type (for delta scoring).
    """

    W: jnp.ndarray
    h: jnp.ndarray
    wt_H: jnp.ndarray
    # static metadata (not traced)
    seq_len: int = struct.field(pytree_node=False, default=0)
    min_pos: int = struct.field(pytree_node=False, default=0)
    max_pos: int = struct.field(pytree_node=False, default=0)
    reg_coef: float = struct.field(pytree_node=False, default=1.0)

    @property
    def data_dim(self) -> int:
        return self.seq_len * VOCAB

    @property
    def padded_dim(self) -> int:
        return self.W.shape[-1]


def _flatten_couplings(J: np.ndarray) -> np.ndarray:
    """[L,L,V,V] J[i,j,k,l] -> [L*V, L*V] W[(j,l),(i,k)] = J[i,j,k,l]."""
    L, _, V, _ = J.shape
    # W[j,l,i,k] = J[i,j,k,l]
    W = np.transpose(J, (1, 3, 0, 2)).reshape(L * V, L * V)
    return np.ascontiguousarray(W)


def _unflatten_couplings(W: np.ndarray, L: int) -> np.ndarray:
    """Inverse of _flatten_couplings: [L*V,L*V] -> [L,L,V,V]."""
    J = W.reshape(L, VOCAB, L, VOCAB)  # [j,l,i,k]
    return np.transpose(J, (2, 0, 3, 1))


@partial(jax.custom_vjp, nondiff_argnums=())
def _hamiltonian_flat(W: jnp.ndarray, h: jnp.ndarray, xf: jnp.ndarray):
    """H(x) for flattened one-hots xf [B, L*V]; W symmetric, zero-diag-block."""
    Jx = jnp.dot(xf, W, preferred_element_type=jnp.float32)
    return 0.5 * jnp.sum(xf * Jx, axis=-1) + xf @ h


def _hamiltonian_bwd_impl(res, g):
    Jx, xf, W, h = res
    gx = g[:, None] * (Jx + h[None, :])
    # gradient w.r.t. W: 0.5 * (xf^T g xf + ...) — needed only when fitting
    # through this op; the fitter uses its own pseudolikelihood objective, so
    # we return symmetrized outer products for correctness.
    gxf = g[:, None] * xf
    gW = 0.5 * (xf.T @ gxf + gxf.T @ xf)
    gh = jnp.sum(gxf, axis=0)
    return gW, gh, gx


def _hamiltonian_fwd_full(W, h, xf):
    Jx = jnp.dot(xf, W, preferred_element_type=jnp.float32)
    H = 0.5 * jnp.sum(xf * Jx, axis=-1) + xf @ h
    return H, (Jx, xf, W, h)


_hamiltonian_flat.defvjp(_hamiltonian_fwd_full, _hamiltonian_bwd_impl)


def _pad_flat(params: PottsParams, x: jnp.ndarray) -> jnp.ndarray:
    """[B, L, V] -> zero-padded flat [B, P]."""
    xf = x.reshape(x.shape[0], -1)
    pad = params.padded_dim - xf.shape[-1]
    if pad:
        xf = jnp.pad(xf, ((0, 0), (0, pad)))
    return xf


def hamiltonian(params: PottsParams, x: jnp.ndarray) -> jnp.ndarray:
    """Hamiltonian of one-hot (or relaxed) x [B, L, V] over the Potts window.

    Parity with reference PottsModel.hamiltonian (nets.py:282-290).
    """
    return _hamiltonian_flat(params.W, params.h, _pad_flat(params, x))


def hamiltonian_and_grad(params: PottsParams, x: jnp.ndarray,
                         use_pallas: bool | None = None):
    """Fused (H, dH/dx) in one matmul pass. x is [B, L, V] (window coords).

    use_pallas: force the Pallas TPU kernel on/off (default: on when running
    on TPU; the XLA einsum path otherwise).
    """
    xf = _pad_flat(params, x)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from ppde_tpu.ops import potts_pallas

        H, grad_flat = potts_pallas.energy_and_grad(params.W, params.h, xf)
    else:
        Jx = jnp.dot(xf, params.W, preferred_element_type=jnp.float32)
        H = 0.5 * jnp.sum(xf * Jx, axis=-1) + xf @ params.h
        grad_flat = Jx + params.h[None, :]
    grad = grad_flat[:, : params.data_dim].reshape(x.shape)
    return H, grad


def window_slice(params: PottsParams, x_full: jnp.ndarray) -> jnp.ndarray:
    """Restrict a full-sequence batch [B, L_full, V] to the alignment window.

    Parity with PottsModel.preprocess_onehot (nets.py:273-280).
    """
    return x_full[:, params.min_pos : params.max_pos + 1]


def score(params: PottsParams, x_full: jnp.ndarray, delta: bool = True):
    """Potts score of full-coordinate one-hots (window-sliced internally)."""
    H = hamiltonian(params, window_slice(params, x_full))
    return H - params.wt_H if delta else H


def score_and_grad(params: PottsParams, x_full: jnp.ndarray, delta: bool = True,
                   use_pallas: bool | None = None):
    """Fused (score, d score / d x_full) — grad zero outside the window."""
    xw = window_slice(params, x_full)
    H, gw = hamiltonian_and_grad(params, xw, use_pallas=use_pallas)
    grad = jnp.zeros_like(x_full)
    grad = jax.lax.dynamic_update_slice(grad, gw, (0, params.min_pos, 0))
    return (H - params.wt_H if delta else H), grad


# ---------------------------------------------------------------------------
# Gibbs sampling from the Potts Boltzmann distribution p(x) ∝ exp(β·H(x))
# ---------------------------------------------------------------------------
#
# Standard DCA tooling the reference lacks entirely: draw sequences from the
# fitted model itself — for fit quality control (sampled single/pair
# statistics vs. the training alignment) and for generating synthetic
# families where the upstream MSAs are missing blobs (PABP/GFP,
# .MISSING_LARGE_BLOBS). Sign convention matches the samplers: H is
# MAXIMIZED, so the stationary law is p ∝ exp(β·H).

def _field(params: PottsParams, x: jnp.ndarray) -> jnp.ndarray:
    """F = x_flat @ W [B, P]: per-(position,letter) coupling field."""
    return jnp.dot(_pad_flat(params, x), params.W,
                   preferred_element_type=jnp.float32)


def gibbs_sweep(params: PottsParams, x: jnp.ndarray, F: jnp.ndarray,
                key, beta: float = 1.0):
    """One systematic-scan Gibbs sweep over all window positions.

    Exact single-site conditionals: with W's diagonal blocks zero and W
    symmetric, the conditional logits at position i are
    ``β·(h_i + F[:, iV:(i+1)V])`` — both (i,j) and (j,i) half-couplings of
    the 0.5·x·W·x Hamiltonian contribute, summing to the full J_ij.

    TPU-first: the field F is maintained INCREMENTALLY — resampling
    position i updates it with one [B,V]×[V,P] matmul (delta one-hot times
    V rows of W) instead of recomputing the [B,P]×[P,P] product; the state
    update is a one-hot position mask multiply (no scatter — XLA
    serializes scatters on TPU, CLAUDE.md).

    x: [B, L, V] one-hot; F: matching field from _field(params, x).
    Returns (x, F) after resampling every position once.
    """
    L, V = params.seq_len, VOCAB

    def one_pos(carry, inp):
        x, F = carry
        i, k = inp
        logits = beta * (
            jax.lax.dynamic_slice(params.h, (i * V,), (V,))[None]
            + jax.lax.dynamic_slice(F, (0, i * V), (x.shape[0], V)))
        new = jax.nn.one_hot(jax.random.categorical(k, logits), V,
                             dtype=x.dtype)                       # [B, V]
        old = jax.lax.dynamic_slice(
            x, (0, i, 0), (x.shape[0], 1, V))[:, 0]               # [B, V]
        W_i = jax.lax.dynamic_slice(
            params.W, (i * V, 0), (V, params.padded_dim))          # [V, P]
        F = F + jnp.dot(new - old, W_i,
                        preferred_element_type=jnp.float32)
        pos = (jnp.arange(L) == i).astype(x.dtype)                 # [L]
        x = x * (1.0 - pos)[None, :, None] + pos[None, :, None] * new[:, None]
        return (x, F), 0.0

    keys = jax.random.split(key, L)
    (x, F), _ = jax.lax.scan(one_pos, (x, F),
                             (jnp.arange(L, dtype=jnp.int32), keys))
    return x, F


def gibbs_sample(params: PottsParams, key, n_chains: int,
                 n_sweeps: int, x0: jnp.ndarray | None = None,
                 beta: float = 1.0) -> jnp.ndarray:
    """Sample [n_chains, L, V] window one-hots from p(x) ∝ exp(β·H(x)).

    ``x0``: initial window one-hots [n_chains, L, V]; None = independent
    per-position draws from the field-only distribution softmax(β·h) (a
    good overdispersed start). One jitted lax.scan runs all sweeps.
    """
    L, V = params.seq_len, VOCAB
    k_init, k_run = jax.random.split(key)
    if x0 is None:
        h = params.h[: L * V].reshape(L, V)
        x0 = jax.nn.one_hot(
            jax.random.categorical(k_init, beta * h[None],
                                   shape=(n_chains, L)),
            V, dtype=jnp.float32)

    @jax.jit
    def run(W_params, x0, keys):
        F0 = _field(W_params, x0)

        def body(carry, k):
            x, F = carry
            return gibbs_sweep(W_params, x, F, k, beta), 0.0

        (x, _), _ = jax.lax.scan(body, (x0, F0), keys)
        return x

    return run(params, x0, jax.random.split(k_run, n_sweeps))


# ---------------------------------------------------------------------------
# parameter construction / serialization
# ---------------------------------------------------------------------------

def _build(J: np.ndarray, h: np.ndarray, index_list: np.ndarray,
           reg_coef: float, offset: int, wt_seq: str,
           dtype=jnp.float32) -> PottsParams:
    L = h.shape[0]
    W = _flatten_couplings(np.asarray(J, np.float64)).astype(np.float32)
    hf = np.asarray(h, np.float32).reshape(L * VOCAB)
    P = _pad_up(L * VOCAB)
    W = np.pad(W, ((0, P - W.shape[0]), (0, P - W.shape[1])))
    hf = np.pad(hf, (0, P - hf.shape[0]))
    idx = np.asarray(index_list) - offset
    min_pos, max_pos = int(idx[0]), int(idx[-1])
    params = PottsParams(
        W=jnp.asarray(W, dtype), h=jnp.asarray(hf, dtype),
        wt_H=jnp.zeros(()), seq_len=L, min_pos=min_pos, max_pos=max_pos,
        reg_coef=float(reg_coef),
    )
    wt_window = wt_seq[min_pos : max_pos + 1]
    wt_oh = jnp.asarray(codec.seqs_to_onehot([wt_window]))
    wt_H = hamiltonian(params, wt_oh)[0]
    return params.replace(wt_H=wt_H)


def load_pickle(protein_dir: str, dtype=jnp.float32) -> PottsParams:
    """Load the reference's potts.pkl + wt.fasta artifact pair.

    Artifact contract per reference PottsModel.__init__ (nets.py:244-262):
    pickle keys J_ij [L,L,V,V], h_i [L,V], index_list (absolute residue
    numbers), reg_coef; the FASTA id encodes the window offset
    ('>NAME/START-END' -> offset=START, else 1).
    """
    with open(os.path.join(protein_dir, "potts.pkl"), "rb") as f:
        p = pickle.load(f)
    wt_seqs, wt_ids = pio.read_fasta(
        os.path.join(protein_dir, "wt.fasta"), return_ids=True)
    offset = int(wt_ids[0].split("/")[-1].split("-")[0]) if "/" in wt_ids[0] else 1
    return _build(p["J_ij"], p["h_i"], p["index_list"], p["reg_coef"],
                  offset, wt_seqs[0], dtype)


def load_npz(path: str, wt_seq: str, dtype=jnp.float32) -> PottsParams:
    """Load parameters saved by save_npz (our native artifact format)."""
    z = np.load(path)
    return _build(z["J"], z["h"], z["index_list"], float(z["reg_coef"]),
                  int(z["offset"]), wt_seq, dtype)


def save_npz(path: str, J: np.ndarray, h: np.ndarray, index_list: np.ndarray,
             reg_coef: float, offset: int) -> None:
    np.savez_compressed(path, J=J, h=h, index_list=index_list,
                        reg_coef=reg_coef, offset=offset)


def synthetic(wt_seq: str, min_pos: int = 0, max_pos: int | None = None,
              seed: int = 0, coupling_scale: float = 0.05,
              field_scale: float = 0.5, dtype=jnp.float32) -> PottsParams:
    """Deterministic synthetic Potts parameters for benchmarks and tests.

    Shapes and invariants (symmetry, zero diagonal blocks) match a real fit;
    values are Gaussian. Used where the reference's potts.pkl blobs are
    missing from the repo (.MISSING_LARGE_BLOBS).
    """
    if max_pos is None:
        max_pos = len(wt_seq) - 1
    L = max_pos - min_pos + 1
    rng = np.random.default_rng(seed)
    # build directly in the flattened W layout, float32 (float64 J tensors
    # for GFP-sized models cost ~20s of host time for no benefit here)
    W = rng.standard_normal((L * VOCAB, L * VOCAB), np.float32)
    W *= np.float32(coupling_scale)
    W = 0.5 * (W + W.T)
    blocks = W.reshape(L, VOCAB, L, VOCAB)
    blocks[np.arange(L), :, np.arange(L), :] = 0.0
    h = rng.normal(0.0, field_scale, (L, VOCAB)).astype(np.float32)
    # favor the WT letters slightly so WT is near a local optimum
    wt_idx = codec.seqs_to_ints([wt_seq[min_pos : max_pos + 1]])[0]
    h[np.arange(L), wt_idx] += 2.0 * field_scale

    P = _pad_up(L * VOCAB)
    W = np.pad(W, ((0, P - W.shape[0]), (0, P - W.shape[1])))
    hf = np.pad(h.reshape(-1), (0, P - L * VOCAB))
    params = PottsParams(
        W=jnp.asarray(W, dtype), h=jnp.asarray(hf, dtype),
        wt_H=jnp.zeros(()), seq_len=L, min_pos=min_pos, max_pos=max_pos,
        reg_coef=1.0,
    )
    wt_oh = jnp.asarray(codec.seqs_to_onehot([wt_seq[min_pos : max_pos + 1]]))
    wt_H = hamiltonian(params, wt_oh)[0]
    return params.replace(wt_H=wt_H)


def as_dense_J(params: PottsParams) -> np.ndarray:
    """Recover the [L,L,V,V] coupling tensor (for export/inspection)."""
    lv = params.data_dim
    W = np.asarray(params.W, np.float64)[:lv, :lv]
    return _unflatten_couplings(W, params.seq_len)
