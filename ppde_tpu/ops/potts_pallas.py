"""Fused Potts energy + input-gradient Pallas TPU kernel.

Computes, for flattened one-hots xf [B, P] and symmetric couplings W [P, P]
with fields h [P] (P a multiple of 128):

    Jx   = xf @ W
    H    = 0.5 * sum(xf * Jx, -1) + xf @ h      -> [B]
    grad = Jx + h                                -> [B, P]

in ONE streaming pass over W: the grid walks 128-wide column tiles of W,
each tile's matmul result is immediately finished into the gradient tile and
folded into an on-chip energy accumulator — W is read from HBM exactly once
and Jx never round-trips through HBM (the XLA fallback in potts.py
materializes Jx and re-reads it for the reduction epilogue).

This is the prime hot op of the framework: the reference spends its inner
loop on this Hamiltonian + autograd backward (ppde/energy.py:103-108,
nets.py:287-290); here energy AND gradient cost one matmul pass.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128


def _kernel(xf_ref, W_ref, h_ref, grad_ref, H_ref, acc_ref):
    j = pl.program_id(0)
    nj = pl.num_programs(0)

    xf = xf_ref[:]  # [B, P] resident in VMEM across the whole grid
    Jx = jnp.dot(xf, W_ref[:], preferred_element_type=jnp.float32)  # [B,T]
    h = h_ref[:]  # [1, T]
    grad_ref[:] = Jx + h

    xf_tile = xf_ref[:, pl.ds(j * TILE, TILE)].astype(jnp.float32)  # [B, T]
    partial = jnp.sum(xf_tile * (0.5 * Jx + h), axis=-1, keepdims=True)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += partial

    @pl.when(j == nj - 1)
    def _():
        H_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def energy_and_grad(W: jnp.ndarray, h: jnp.ndarray, xf: jnp.ndarray,
                    interpret: bool = False):
    """(H [B], grad [B, P]) for xf [B, P], W [P, P], h [P]; P % 128 == 0."""
    B, P = xf.shape
    assert P % TILE == 0 and W.shape == (P, P) and h.shape == (P,)
    n_tiles = P // TILE

    grad, H = pl.pallas_call(
        _kernel,
        grid=(n_tiles,),
        in_specs=[
            # full xf stays in VMEM for all grid steps
            pl.BlockSpec((B, P), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            # stream one 128-wide column tile of W per grid step
            pl.BlockSpec((P, TILE), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B, TILE), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, P), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((B, 1), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * P * P + 4 * B * P,
            bytes_accessed=(P * P + B * P * 3) * W.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xf.astype(W.dtype), W, h.reshape(1, P))
    return H[:, 0], grad
