"""Device meshes and sharding policies for batched-chain sampling.

The reference is single-process/single-GPU; its only parallelism is chain
batching (SURVEY.md §2.3). The TPU-native scaling story:

  * **dp (chains)** — the population axis shards across devices; sampler
    steps are embarrassingly parallel per chain (no collectives needed).
  * **ep (experts)** — stacked ensemble members / PoE terms shard across
    devices; the ensemble mean becomes a psum-mean XLA inserts from the
    sharding annotations.
  * **tp (features)** — the dominant Potts matmul x@W shards the coupling
    matrix column-wise; XLA inserts the reduce over tp for the energy
    contraction.
  * **sp (sequence)** — the transformer residual stream [B, T, D] shards
    its T axis (``sp_constraint`` + esm2.forward_logits's ``constrain``
    hook): LN/FFN/rotary run sequence-sharded and GSPMD inserts the
    gathers attention needs. Activation memory per device drops by sp.
  * **pp (layers)** — the ESM2 layer stack splits into pipeline stages
    with a GPipe microbatch schedule over ``lax.ppermute``
    (parallel/pipeline.py) for experts that outgrow one chip's HBM.

Everything here follows the annotate-and-let-GSPMD-insert-collectives
recipe (pp, which needs an explicit schedule, uses shard_map): build a
Mesh, place inputs with NamedSharding, jit the same pure functions used
single-chip.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int | None = None, ep: int = 1, tp: int = 1,
              sp: int = 1, pp: int = 1, devices=None) -> Mesh:
    """Build a (dp, ep, tp, sp, pp) mesh; dp defaults to all remaining
    devices. Size-1 axes cost nothing — specs that never mention sp/pp
    behave exactly as on the old 3-axis mesh."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    rest = ep * tp * sp * pp
    if dp is None:
        assert n % rest == 0, (n, ep, tp, sp, pp)
        dp = n // rest
    assert dp * rest == n, (dp, ep, tp, sp, pp, n)
    arr = np.asarray(devices).reshape(dp, ep, tp, sp, pp)
    return Mesh(arr, axis_names=("dp", "ep", "tp", "sp", "pp"))


def shard_chains(x, mesh: Mesh):
    """Place a [n_chains, ...] array sharded over the dp axis."""
    spec = P("dp", *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def shard_ensemble(stacked_params, mesh: Mesh):
    """Place stacked ensemble params sharded over the ep axis (leading dim).

    Works when the member count divides the ep axis size; otherwise
    replicates (ensembles of 3 on ep=2 meshes stay replicated).
    """
    ep_size = mesh.shape["ep"]

    def place(leaf):
        if leaf.shape[0] % ep_size == 0:
            spec = P("ep", *([None] * (leaf.ndim - 1)))
        else:
            spec = P(*([None] * leaf.ndim))
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree.map(place, stacked_params)


def shard_potts(potts_params, mesh: Mesh):
    """Shard the [L*V, L*V] coupling matrix column-wise over tp (tensor
    parallelism on the dominant matmul); fields and wt_H follow."""
    W = jax.device_put(potts_params.W, NamedSharding(mesh, P(None, "tp")))
    h = jax.device_put(potts_params.h, NamedSharding(mesh, P("tp")))
    wt_H = jax.device_put(potts_params.wt_H, NamedSharding(mesh, P()))
    return potts_params.replace(W=W, h=h, wt_H=wt_H)


def replicated(x, mesh: Mesh):
    return jax.device_put(x, NamedSharding(mesh, P()))


def sp_constraint(mesh: Mesh, batch_axis: str | None = "dp",
                  seq_axis: str = "sp"):
    """Sequence-parallel activation constraint for transformer residual
    streams [B, T, D]: T shards over ``seq_axis`` (B over ``batch_axis``).
    Pass as esm2.forward_logits(..., constrain=sp_constraint(mesh)) —
    LN/FFN/rotary then compute on T/sp slices and activation memory per
    device drops by sp; GSPMD inserts the (all-)gathers attention needs.
    """
    sharding = NamedSharding(mesh, P(batch_axis, seq_axis, None))

    def constrain(h):
        return jax.lax.with_sharding_constraint(h, sharding)

    return constrain


def shard_esm(esm_params, mesh: Mesh):
    """Megatron-style tensor parallelism for the ESM2 expert over tp:
    attention q/k/v and ffn fc1 shard column-wise (heads / hidden units),
    the o / fc2 projections row-wise (XLA inserts the psum), embeddings,
    layer norms, and the LM head replicate. Reference parity target:
    nets.py:172-240 runs the 650M expert on one GPU with AMP; here the
    same expert scales over the mesh with no code change at the call site.
    """
    col = {"w": P(None, "tp"), "b": P("tp")}
    row = {"w": P("tp", None), "b": P()}

    def specs(layer):
        return {
            "attn_ln": {"g": P(), "b": P()},
            "q": col, "k": col, "v": col, "o": row,
            "ffn_ln": {"g": P(), "b": P()},
            "fc1": col, "fc2": row,
        }

    def place(leaf, spec):
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    out = {k: jax.tree.map(lambda a: place(a, P()), v)
           for k, v in esm_params.items() if k != "layers"}
    out["layers"] = [
        jax.tree.map(place, layer, specs(layer))
        for layer in esm_params["layers"]
    ]
    return out
