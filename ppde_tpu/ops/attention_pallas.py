"""VMEM-resident (flash) attention for the ESM2 experts.

Why: the XLA attention path materializes the [Z, T, T] score tensor
(Z = batch*heads) in HBM three times per layer (scores write, f32 softmax
read/write, AV read) — ~900 MB of HBM traffic per 12-layer ESM2-S forward
at B=128, T=237, which round-2 profiling measured as 75% of forward time
for ~14% of the FLOPs (PERF.md). Protein sequences are short (T <= ~512),
so an entire [T, T] score block fits in VMEM: this kernel runs softmax(QK^T)V
per head-block with scores never leaving VMEM. No online-softmax tiling is
needed — this is the degenerate (and fastest) flash case.

Backward recomputes scores in-VMEM (custom_vjp saves only q, k, v) using the
standard flash identities:
    dv = w^T dout,  dw = dout v^T,  ds = w o (dw - rowsum(w o dw)),
    dq = ds k,      dk = ds^T q.
All products are expressed as plain A[M,K] @ B[K,N] matmuls by passing
pre-transposed operands from XLA (qT, vT, doutT) and emitting transposed
outputs (dvT, dkT) — in-kernel transposes of [T, T] tiles are a Mosaic
hazard on this toolchain (CLAUDE.md), transposes of the thin [Z, T, hd]
tensors in XLA are a few-MB pass.

Numerics: scores accumulate in f32 on the MXU, softmax is f32 with rowmax
subtraction, outputs cast back to the input dtype. This matches the XLA
path (compute-dtype scores, f32 softmax) — equivalence tested in
tests/test_attention_pallas.py, including gradients.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(q_ref, kT_ref, v_ref, o_ref, *, zb: int):
    f32 = jnp.float32
    for z in range(zb):  # static unroll; each iteration is MXU work
        s = jnp.dot(q_ref[z], kT_ref[z], preferred_element_type=f32)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        w = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q_ref.dtype)
        o_ref[z] = jnp.dot(w, v_ref[z],
                           preferred_element_type=f32).astype(o_ref.dtype)


def _bwd_kernel(q_ref, qT_ref, kT_ref, k_ref, vT_ref, dout_ref, doutT_ref,
                dq_ref, dkT_ref, dvT_ref, *, zb: int):
    f32 = jnp.float32
    for z in range(zb):
        s = jnp.dot(q_ref[z], kT_ref[z], preferred_element_type=f32)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        w32 = e / jnp.sum(e, axis=-1, keepdims=True)          # [T, T] f32
        w = w32.astype(q_ref.dtype)
        dw = jnp.dot(dout_ref[z], vT_ref[z],
                     preferred_element_type=f32)              # [T, T] f32
        delta = jnp.sum(w32 * dw, axis=-1, keepdims=True)     # [T, 1]
        ds = (w32 * (dw - delta)).astype(q_ref.dtype)         # [T, T]
        dq_ref[z] = jnp.dot(ds, k_ref[z],
                            preferred_element_type=f32).astype(dq_ref.dtype)
        # transposed outputs keep every product a plain A @ B:
        # dkT = q^T ds  (dk = ds^T q),  dvT = dout^T w  (dv = w^T dout)
        dkT_ref[z] = jnp.dot(qT_ref[z], ds,
                             preferred_element_type=f32).astype(dkT_ref.dtype)
        dvT_ref[z] = jnp.dot(doutT_ref[z], w,
                             preferred_element_type=f32).astype(dvT_ref.dtype)


def _block_z(Z: int, zb: int) -> int:
    while Z % zb:
        zb //= 2
    return max(zb, 1)


@functools.partial(jax.jit, static_argnames=("zb", "interpret"))
def _fwd_call(q, kT, v, zb, interpret):
    Z, T, hd = q.shape
    zb = _block_z(Z, zb)
    spec3 = lambda shp: pl.BlockSpec((zb,) + shp, lambda z: (z, 0, 0),
                                     memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, zb=zb),
        grid=(Z // zb,),
        in_specs=[spec3((T, hd)), spec3((hd, T)), spec3((T, hd))],
        out_specs=spec3((T, hd)),
        out_shape=jax.ShapeDtypeStruct((Z, T, hd), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * Z * T * T * hd,
            bytes_accessed=4 * Z * T * hd * q.dtype.itemsize,
            transcendentals=Z * T * T,
        ),
        interpret=interpret,
    )(q, kT, v)


@functools.partial(jax.jit, static_argnames=("zb", "interpret"))
def _bwd_call(q, k, v, dout, zb, interpret):
    Z, T, hd = q.shape
    zb = _block_z(Z, zb)
    spec = lambda shp: pl.BlockSpec((zb,) + shp, lambda z: (z, 0, 0),
                                    memory_space=pltpu.VMEM)
    qT = jnp.swapaxes(q, 1, 2)
    kT = jnp.swapaxes(k, 1, 2)
    vT = jnp.swapaxes(v, 1, 2)
    doutT = jnp.swapaxes(dout, 1, 2)
    dq, dkT, dvT = pl.pallas_call(
        functools.partial(_bwd_kernel, zb=zb),
        grid=(Z // zb,),
        in_specs=[spec((T, hd)), spec((hd, T)), spec((hd, T)), spec((T, hd)),
                  spec((hd, T)), spec((T, hd)), spec((hd, T))],
        out_specs=[spec((T, hd)), spec((hd, T)), spec((hd, T))],
        out_shape=[jax.ShapeDtypeStruct((Z, T, hd), q.dtype),
                   jax.ShapeDtypeStruct((Z, hd, T), q.dtype),
                   jax.ShapeDtypeStruct((Z, hd, T), q.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * 5 * Z * T * T * hd,
            bytes_accessed=8 * Z * T * hd * q.dtype.itemsize,
            transcendentals=Z * T * T,
        ),
        interpret=interpret,
    )(q, qT, kT, k, vT, dout, doutT)
    return dq, jnp.swapaxes(dkT, 1, 2), jnp.swapaxes(dvT, 1, 2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention(q, k, v, zb: int = 8, interpret: bool = False):
    """softmax(q @ k^T) @ v over [Z, T, hd] tensors, scores VMEM-resident.

    Scale q BEFORE calling (matches the ESM2 path which folds 1/sqrt(hd)
    into q). zb: heads per grid step (auto-halved until it divides Z).
    """
    return _fwd_call(q, jnp.swapaxes(k, 1, 2), v, zb, interpret)


def _flash_fwd(q, k, v, zb, interpret):
    return _fwd_call(q, jnp.swapaxes(k, 1, 2), v, zb, interpret), (q, k, v)


def _flash_bwd(zb, interpret, res, dout):
    q, k, v = res
    return _bwd_call(q, k, v, dout, zb, interpret)


flash_attention.defvjp(_flash_fwd, _flash_bwd)
