"""Pipeline parallelism (pp) for the ESM2 expert — GPipe over ppermute.

The reference runs its largest expert (esm2_t33_650M) on one GPU with AMP
and a minibatch-8 python loop (reference nets.py:174-181, energy.py:77).
The TPU-native scaling story for models that outgrow one chip's HBM is
pipeline parallelism: split the layer stack into ``pp`` stages (one per
mesh slice along the ``pp`` axis), stream microbatches through the stages,
and rotate activations stage-to-stage with ``lax.ppermute`` so every hop
rides ICI. This module implements the classic GPipe schedule as a
``shard_map`` + ``lax.scan`` program:

  * stage s holds layers [s*Np, (s+1)*Np) as a STACKED pytree (leading
    axis = layers-per-stage) sharded ``P('pp')`` — each device materializes
    only its own 1/pp of the transformer;
  * one scan over ``n_mb + pp - 1`` ticks: at tick t, stage 0 ingests
    microbatch t, every stage applies its local layers (a ``lax.scan`` over
    the stacked axis), the last stage records microbatch ``t - (pp-1)``,
    and a ``ppermute`` rotates activations one stage forward;
  * the pipeline composes with data parallelism: microbatches shard their
    batch axis over ``dp`` inside the same shard_map, so each device
    processes [mb/dp, T, D] activations.

Numerics match ``esm2.forward_logits`` exactly (same ops, same order,
per-example token-dropout) — pinned by tests/test_pipeline.py against the
single-device forward on the virtual mesh. Differentiable end-to-end:
``jax.grad`` transposes the ppermute rotation into the reverse schedule,
so dE/dx (the PPDE proposal signal) flows through the pipeline.

Bubble accounting: utilization = n_mb / (n_mb + pp - 1); pick
n_mb >= 4*pp to keep the bubble under ~20%.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ppde_tpu.models import esm2


def stack_layers(layers: list) -> dict:
    """Stack a list of per-layer pytrees into one pytree with a leading
    layer axis (the axis ``P('pp')`` shards). Requires identical shapes."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


def pipeline_params(params: dict, n_stages: int) -> dict:
    """Re-layout ESM2 params for an n_stages pipeline: ``layers`` (list)
    becomes ``layers_stacked`` [n_layers, ...]; everything else unchanged.
    n_stages must divide the layer count."""
    n_layers = len(params["layers"])
    if n_layers % n_stages:
        raise ValueError(
            f"{n_layers} layers not divisible by pp={n_stages} stages")
    out = {k: v for k, v in params.items() if k != "layers"}
    out["layers_stacked"] = stack_layers(params["layers"])
    return out


def _stage_apply(local_layers, h, heads: int, approx_gelu: bool,
                 remat: bool):
    """Apply this stage's stacked layers [Np, ...] to activations h."""
    def body(h, layer):
        return esm2.transformer_layer(layer, h, heads, approx_gelu), None

    body_fn = jax.checkpoint(body) if remat else body
    h, _ = jax.lax.scan(body_fn, h, local_layers)
    return h


def forward_logits_pp(params: dict, x_onehot, mesh, *, heads: int = 20,
                      n_microbatches: int | None = None,
                      remat: bool = False,
                      pp_axis: str = "pp", dp_axis: str | None = "dp"):
    """Pipelined ESM2 forward: one-hot [B, T, 33] -> logits [B, T, 33].

    ``params`` is a ``pipeline_params`` re-layout (layers_stacked). The
    embedding prologue and tied-embedding LM head are small and run outside
    the shard_map (replicated / dp-sharded as GSPMD chooses); only the layer
    stack — all the FLOPs — is pipelined.

    ``n_microbatches`` defaults to 2*pp (50% bubble floor for tiny dryruns;
    production should use >=4*pp). B must divide by it, and by the dp axis
    within each microbatch.
    """
    pp = mesh.shape[pp_axis]
    dp = mesh.shape[dp_axis] if dp_axis is not None else 1
    n_mb = n_microbatches if n_microbatches is not None else max(2 * pp, 1)
    B, T, V = x_onehot.shape
    if B % n_mb or (B // n_mb) % dp:
        raise ValueError(
            f"batch {B} must split into {n_mb} microbatches x dp={dp}")

    approx_gelu = esm2._use_approx_gelu(params)
    h = esm2.embed_tokens(params, x_onehot)
    D = h.shape[-1]
    h_mb = h.reshape(n_mb, B // n_mb, T, D)

    stacked = params["layers_stacked"]
    n_layers = jax.tree.leaves(stacked)[0].shape[0]
    if n_layers % pp:
        raise ValueError(f"{n_layers} layers not divisible by pp={pp}")

    mb_spec = P(None, dp_axis, None, None)  # [n_mb, mb/dp, T, D] per device

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(pp_axis), mb_spec), out_specs=mb_spec,
        check_vma=False)
    def run_pipeline(local_layers, h_mb):
        stage = jax.lax.axis_index(pp_axis)
        last = pp - 1
        act0 = jnp.zeros_like(h_mb[0])
        outs0 = jnp.zeros_like(h_mb)

        def tick(carry, t):
            act, outs = carry
            inp = jax.lax.dynamic_index_in_dim(
                h_mb, jnp.clip(t, 0, n_mb - 1), 0, keepdims=False)
            act = jnp.where(stage == 0, inp, act)
            act = _stage_apply(local_layers, act, heads, approx_gelu, remat)
            out_idx = jnp.clip(t - last, 0, n_mb - 1)
            cur = jax.lax.dynamic_index_in_dim(outs, out_idx, 0,
                                               keepdims=False)
            write = (stage == last) & (t >= last)
            new = jnp.where(write, act, cur)
            outs = jax.lax.dynamic_update_index_in_dim(outs, new, out_idx, 0)
            act = jax.lax.ppermute(
                act, pp_axis, [(i, (i + 1) % pp) for i in range(pp)])
            return (act, outs), None

        (act, outs), _ = jax.lax.scan(
            tick, (act0, outs0), jnp.arange(n_mb + pp - 1))
        # results live on the last stage only; all-reduce replicates them
        # across pp (zeros elsewhere) so the head runs without relayout
        return jax.lax.psum(jnp.where(stage == last, outs, 0.0), pp_axis)

    h_out = run_pipeline(stacked, h_mb).reshape(B, T, D)
    return esm2.lm_head(params, h_out, approx_gelu)


def pseudo_log_likelihood_pp(params: dict, x_onehot, mesh, **kw):
    """Pipelined PLL score [B] — the pp analog of
    esm2.pseudo_log_likelihood (reference nets.py:221-233)."""
    logits = forward_logits_pp(params, x_onehot, mesh, **kw)
    lp = jax.nn.log_softmax(logits, -1)
    return jnp.sum(x_onehot.astype(jnp.float32) * lp, axis=(1, 2))
