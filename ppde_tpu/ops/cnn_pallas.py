"""Fused OnehotCNN-ensemble fitness + input-gradient Pallas TPU kernel.

The supervised expert (reference OnehotCNN x3 ensemble, nets.py:350-376,
434-442) dominates the PPDE step after the Potts kernel: XLA runs its
forward + input-VJP as ~10 separate fusions with every activation
round-tripping HBM. This kernel computes, for one-hot inputs,

    fit  = mean_m dec(max_T relu(emb(relu(conv1d(x)))))      -> [B]
    grad = d sum(fit) / dx                                    -> [B, L, V]

in one pass per batch-tile with all member loops unrolled in-kernel and
every activation VMEM-resident. The conv is pre-lowered to an im2col
patch matmul outside the kernel (a pure layout transform); the patch/time
axis is zero-padded to a sublane-aligned Tp so the [bt, Tp, KV] <->
[bt*Tp, KV] reshapes are exact tile merges (no relayout copies), with the
padded rows masked out of the max-pool; max-pool backward uses JAX's
equal-split-on-ties convention.

Everything here matches the XLA path numerically (see test_cnn_pallas);
enable with ``cnn_pallas.ensemble_apply_and_grad``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 5  # conv kernel width (reference OnehotCNN default)
_NEG = -1e30  # -inf stand-in that survives bf16/f32 compare semantics


def im2col(x: jnp.ndarray) -> jnp.ndarray:
    """[B, L, V] -> [B, T, K*V] patches, T = L - K + 1."""
    B, L, V = x.shape
    T = L - K + 1
    return jnp.concatenate([x[:, i:T + i] for i in range(K)], axis=-1)


def col2im(dP: jnp.ndarray, L: int) -> jnp.ndarray:
    """Transpose of im2col: [B, T, K*V] -> [B, L, V] shifted-pad adds.

    jnp.pad + add (pure elementwise fusions) instead of .at[].add: the
    dynamic-update-slice RMW at unaligned sublane offsets relayouts the
    whole array on TPU and measured ~0.7 ms/step at GFP shapes vs ~0.1 ms
    for this form.
    """
    B, T, KV = dP.shape
    V = KV // K
    dx = None
    for i in range(K):
        piece = jnp.pad(dP[:, :, i * V:(i + 1) * V],
                        ((0, 0), (i, L - T - i), (0, 0)))
        dx = piece if dx is None else dx + piece
    return dx


def _pool_bwd_mask(Hm, mxf, cdt, pool_bwd: str):
    """0/1 routing mask [bt, Tp, C2] for the max-pool backward.

    'split': JAX's equal-split-on-ties convention (grad / tie count).
    'first': ALL gradient to the first max row — matches torch.max(x, dim)
    whose backward routes to the single returned argmax index
    (reference nets.py:372), so this is the reference-faithful mode. Saves
    the tie-count reduction + division; costs an iota min/compare instead.
    """
    f32 = jnp.float32
    ties = Hm.astype(f32) == mxf[:, None, :]
    if pool_bwd == "split":
        routing = ties.astype(cdt)
        counts = jnp.sum(ties.astype(f32), axis=1)           # [bt, C2]
        return routing, counts
    # first-argmax: smallest row index among the tied maxima
    Tp = Hm.shape[1]
    iota_t = jax.lax.broadcasted_iota(jnp.int32, Hm.shape, 1)
    idx = jnp.min(jnp.where(ties, iota_t, Tp), axis=1)       # [bt, C2]
    routing = (iota_t == idx[:, None, :]).astype(cdt)
    return routing, None


def _kernel(P_ref, encw_ref, encwT_ref, encb_ref, embw_ref, embwT_ref,
            embb_ref, decw_ref, decb_ref, fit_ref, dP_ref,
            *, n_members: int, t_real: int, pool_bwd: str = "split"):
    """grid = (B // bt,); members unrolled; activations VMEM-resident."""
    bt, Tp, KV = P_ref.shape
    C = encw_ref.shape[-1]
    C2 = embw_ref.shape[-1]
    cdt = P_ref.dtype

    P2 = P_ref[...].reshape(bt * Tp, KV)
    tmask = jax.lax.broadcasted_iota(jnp.int32, (bt, Tp, C2), 1) < t_real
    inv_m = 1.0 / n_members

    acc_fit = jnp.zeros((bt, 1), jnp.float32)
    acc_dP = jnp.zeros((bt * Tp, KV), jnp.float32)
    f32 = jnp.float32
    for m in range(n_members):  # static unroll: weights stay resident
        # activations live in the compute dtype (bf16 by default) to halve
        # VPU traffic; comparisons upcast to f32 inline (Mosaic has no
        # bf16 compare) — exact, since bf16 -> f32 is lossless.
        H1 = jnp.maximum(
            jnp.dot(P2, encw_ref[m], preferred_element_type=f32)
            + encb_ref[m], 0.0).astype(cdt)                   # [bt*Tp, C]
        H2 = jnp.maximum(
            jnp.dot(H1, embw_ref[m], preferred_element_type=f32)
            + embb_ref[m], 0.0).astype(cdt)                   # [bt*Tp, C2]

        Hm = jnp.where(tmask, H2.reshape(bt, Tp, C2),
                       jnp.asarray(_NEG, cdt))
        mxf = jnp.max(Hm, axis=1).astype(f32)                 # [bt, C2]
        dec_row = decw_ref[m].astype(f32)                     # [1, C2]
        fit = jnp.sum(mxf * dec_row, axis=-1, keepdims=True)  # [bt, 1]
        acc_fit += (fit + decb_ref[m]) * inv_m

        # backward (input gradient only): routing per _pool_bwd_mask.
        # relu' on H2 folds into the per-(sample,channel) scale: routed rows
        # have Hm == mx, so they pass relu' iff mx > 0.
        routing, counts = _pool_bwd_mask(Hm, mxf, cdt, pool_bwd)
        scale = jnp.where(mxf > 0.0,
                          dec_row / counts if counts is not None else dec_row,
                          0.0).astype(cdt)                    # [bt, C2]
        G2 = (routing * scale[:, None, :]).reshape(bt * Tp, C2)
        G1 = jnp.dot(G2, embwT_ref[m], preferred_element_type=f32)
        G1 = jnp.where(H1.astype(f32) > 0.0, G1,
                       0.0).astype(cdt)                       # relu'
        acc_dP += inv_m * jnp.dot(
            G1, encwT_ref[m],
            preferred_element_type=f32)                       # [bt*Tp, KV]

    fit_ref[...] = acc_fit
    dP_ref[...] = acc_dP.reshape(bt, Tp, KV)


@functools.partial(jax.jit, static_argnames=("t_real", "batch_tile",
                                              "interpret", "pool_bwd"))
def ensemble_fit_and_patch_grad(P, enc_w, enc_b, emb_w, emb_b, dec_w, dec_b,
                                t_real: int, batch_tile: int = 8,
                                interpret: bool = False,
                                pool_bwd: str = "split"):
    """(fit [B], dP [B, Tp, K*V]) for sublane-padded patches P [B, Tp, K*V]
    and stacked member weights (leading dim M; dec_w as rows [M, 1, C2]).
    Rows >= t_real are masked out of the pool; their dP rows are exact
    zeros (ties mask) and the caller slices them off before col2im.
    B must be a multiple of batch_tile (caller pads)."""
    B, Tp, KV = P.shape
    M, _, C = enc_w.shape
    C2 = emb_w.shape[-1]
    bt = min(batch_tile, B)

    kern = functools.partial(_kernel, n_members=M, t_real=t_real,
                             pool_bwd=pool_bwd)
    fit, dP = pl.pallas_call(
        kern,
        grid=(B // bt,),
        in_specs=[
            pl.BlockSpec((bt, Tp, KV), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, KV, C), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, C, KV), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, 1, C), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, C, C2), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, C2, C), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, 1, C2), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, 1, C2), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, 1, 1), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bt, 1), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, Tp, KV), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, Tp, KV), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 3 * B * t_real * (KV * C + C * C2) * M,
            bytes_accessed=2 * P.size * P.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(P, enc_w, jnp.swapaxes(enc_w, 1, 2), enc_b, emb_w,
      jnp.swapaxes(emb_w, 1, 2), emb_b, dec_w, dec_b)
    return fit[:, 0], dP


def _kernel_m(P_ref, encw_ref, encwT_ref, encb_ref, embw_ref, embwT_ref,
              embb_ref, decw_ref, decb_ref, fit_ref, dP_ref,
              *, n_members: int, t_real: int, pool_bwd: str = "split"):
    """Member-axis grid variant: grid = (B // bt, M), m innermost. Only ONE
    member's weights + activations are VMEM-resident per grid step (~1/M
    the scoped VMEM of the unrolled kernel, admitting larger batch tiles);
    the fit/dP output blocks ignore m, stay resident across the m-loop and
    accumulate (zeroed at m == 0)."""
    m = pl.program_id(1)
    bt, Tp, KV = P_ref.shape
    C2 = embw_ref.shape[-1]
    cdt = P_ref.dtype
    f32 = jnp.float32

    P2 = P_ref[...].reshape(bt * Tp, KV)
    tmask = jax.lax.broadcasted_iota(jnp.int32, (bt, Tp, C2), 1) < t_real
    inv_m = 1.0 / n_members

    H1 = jnp.maximum(
        jnp.dot(P2, encw_ref[0], preferred_element_type=f32)
        + encb_ref[0], 0.0).astype(cdt)
    H2 = jnp.maximum(
        jnp.dot(H1, embw_ref[0], preferred_element_type=f32)
        + embb_ref[0], 0.0).astype(cdt)
    Hm = jnp.where(tmask, H2.reshape(bt, Tp, C2), jnp.asarray(_NEG, cdt))
    mxf = jnp.max(Hm, axis=1).astype(f32)
    dec_row = decw_ref[0].astype(f32)
    fit = jnp.sum(mxf * dec_row, axis=-1, keepdims=True)

    routing, counts = _pool_bwd_mask(Hm, mxf, cdt, pool_bwd)
    scale = jnp.where(mxf > 0.0,
                      dec_row / counts if counts is not None else dec_row,
                      0.0).astype(cdt)
    G2 = (routing * scale[:, None, :]).reshape(bt * Tp, C2)
    G1 = jnp.dot(G2, embwT_ref[0], preferred_element_type=f32)
    G1 = jnp.where(H1.astype(f32) > 0.0, G1, 0.0).astype(cdt)
    dP = inv_m * jnp.dot(G1, encwT_ref[0], preferred_element_type=f32)

    @pl.when(m == 0)
    def _():
        fit_ref[...] = jnp.zeros_like(fit_ref)
        dP_ref[...] = jnp.zeros_like(dP_ref)

    fit_ref[...] += (fit + decb_ref[0]) * inv_m
    dP_ref[...] += dP.reshape(bt, Tp, KV)


@functools.partial(jax.jit, static_argnames=("t_real", "batch_tile",
                                              "interpret", "pool_bwd"))
def ensemble_fit_and_patch_grad_m(P, enc_w, enc_b, emb_w, emb_b, dec_w,
                                  dec_b, t_real: int, batch_tile: int = 16,
                                  interpret: bool = False,
                                  pool_bwd: str = "split"):
    """Member-grid twin of ensemble_fit_and_patch_grad (same contract)."""
    B, Tp, KV = P.shape
    M, _, C = enc_w.shape
    C2 = emb_w.shape[-1]
    bt = min(batch_tile, B)

    kern = functools.partial(_kernel_m, n_members=M, t_real=t_real,
                             pool_bwd=pool_bwd)
    fit, dP = pl.pallas_call(
        kern,
        grid=(B // bt, M),
        in_specs=[
            pl.BlockSpec((bt, Tp, KV), lambda b, m: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KV, C), lambda b, m: (m, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, KV), lambda b, m: (m, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b, m: (m, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, C2), lambda b, m: (m, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C2, C), lambda b, m: (m, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C2), lambda b, m: (m, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C2), lambda b, m: (m, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda b, m: (m, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bt, 1), lambda b, m: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, Tp, KV), lambda b, m: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, Tp, KV), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 3 * B * t_real * (KV * C + C * C2) * M,
            bytes_accessed=2 * P.size * P.dtype.itemsize * M,
            transcendentals=0,
        ),
        interpret=interpret,
    )(P, enc_w, jnp.swapaxes(enc_w, 1, 2), enc_b, emb_w,
      jnp.swapaxes(emb_w, 1, 2), emb_b, dec_w, dec_b)
    return fit[:, 0], dP


def _round_up(n: int, k: int) -> int:
    return (n + k - 1) // k * k


def ensemble_apply_and_grad(stacked_params, x: jnp.ndarray,
                            compute_dtype=jnp.bfloat16,
                            batch_tile: int = 8,
                            interpret: bool = False,
                            sublane: int = 16,
                            member_grid: bool = False,
                            pool_bwd: str = "split"):
    """(fitness [B], d mean-fitness / dx [B, L, V]) — fused Pallas path.

    stacked_params: the cnn.init_ensemble / torch_convert layout
    ({encoder: {w [M, K, V, C], b [M, C]}, ...}); weights are reshaped
    into matmul layout here (cheap, fused by XLA).
    """
    dt = compute_dtype
    enc = stacked_params["encoder"]
    M = enc["w"].shape[0]
    KV = enc["w"].shape[1] * enc["w"].shape[2]
    C = enc["w"].shape[3]
    enc_w = enc["w"].reshape(M, KV, C).astype(dt)
    emb_w = stacked_params["embed"]["w"].astype(dt)
    dec_w = stacked_params["decoder"]["w"].astype(dt)
    if dec_w.ndim == 2:
        dec_w = dec_w[..., None]

    B, L, V = x.shape
    T = L - K + 1
    # sublane-align the patch axis so the in-kernel [bt, Tp, KV] <->
    # [bt*Tp, KV] reshapes are exact tile merges. 16 covers bf16 (16,128)
    # and f32 (8,128) tiles and trims pad FLOPs vs 32 (~4% at GFP shapes,
    # measured); int8 compute (unused) would need 32.
    Tp = _round_up(T, sublane)
    P = im2col(x).astype(dt)
    Bp = _round_up(B, min(batch_tile, B))
    P = jnp.pad(P, ((0, Bp - B), (0, Tp - T), (0, 0)))

    call = (ensemble_fit_and_patch_grad_m if member_grid
            else ensemble_fit_and_patch_grad)
    fit, dP = call(
        P, enc_w,
        enc["b"].astype(jnp.float32).reshape(M, 1, C),
        emb_w,
        stacked_params["embed"]["b"].astype(jnp.float32).reshape(M, 1, -1),
        dec_w.reshape(M, 1, -1),
        stacked_params["decoder"]["b"].astype(jnp.float32).reshape(M, 1, 1),
        t_real=T, batch_tile=batch_tile, interpret=interpret,
        pool_bwd=pool_bwd)
    dx = col2im(dP[:B, :T], L)
    return fit[:B], dx
