"""MALA-approx: Langevin dynamics on a Gumbel-softmax relaxation.

Parity with the reference MALAApprox (protein_samplers/mala_approx.py:7-123):
the evolving window [min_pos, max_pos] is relaxed to RelaxedOneHotCategorical
logits initialized from (1-tau)*uniform + tau*onehot; each step draws a
Gumbel-softmax sample, discretizes straight-through, evaluates the energy of
the full sequence, and updates logits <- Normal(logits + (eta/2) dE/dlogits,
scale=eta^2). No MH correction (as in the reference).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ppde_tpu.energy import Energy
from ppde_tpu.samplers import base


@dataclasses.dataclass(frozen=True)
class MALAConfig:
    step_size: float = 0.1
    relaxation_tau: float = 0.99


def _gumbel_softmax_st(key, logits, tau):
    """Straight-through Gumbel-softmax sample of one-hot rows.

    Matches RelaxedOneHotCategorical.rsample + argmax straight-through
    (reference :18-23,37-40).
    """
    g = jax.random.gumbel(key, logits.shape)
    soft = jax.nn.softmax((logits + g) / tau, axis=-1)
    hard = jax.nn.one_hot(jnp.argmax(soft, -1), logits.shape[-1],
                          dtype=soft.dtype)
    return soft + jax.lax.stop_gradient(hard - soft)


def run(energy: Energy, initial_population: jnp.ndarray, num_steps: int,
        min_pos: int, max_pos: int, oracle=None, cfg: MALAConfig | None = None,
        key: jax.Array | None = None, log_every: int = 50,
        quiet: bool = False,
        checkpoint_dir: str | None = None) -> base.SamplerResult:
    cfg = cfg or MALAConfig()
    key = key if key is not None else jax.random.PRNGKey(0)
    x0 = jnp.asarray(initial_population)
    n, L, V = x0.shape
    center = x0[:, min_pos:max_pos + 1]

    # initial relaxed logits (reference :36-39)
    soft = (1 - cfg.relaxation_tau) * (jnp.ones_like(center) / V) \
        + cfg.relaxation_tau * center
    logits0 = jnp.log(soft)

    def assemble(ctx, center_hard):
        return jnp.concatenate([ctx["left"], center_hard, ctx["right"]],
                               axis=1)

    def step(ctx, state, key):
        logits, best = state
        k_gs, k_noise = jax.random.split(key)

        def e_of_logits(lg):
            x_hard = _gumbel_softmax_st(k_gs, lg, cfg.relaxation_tau)
            full = assemble(ctx, x_hard)
            e, fit = energy.energy(ctx["energy"], full)
            return jnp.sum(e), (e, fit, full)

        (_, (e, fit, full)), g = jax.value_and_grad(
            e_of_logits, has_aux=True)(logits)
        noise = jax.random.normal(k_noise, logits.shape) * cfg.step_size ** 2
        new_logits = logits + (cfg.step_size / 2.0) * g + noise

        best = base.update_best(best, e, fit, full)
        ys = {"energy": e, "fitness": fit, "traj": jnp.argmax(full[0], -1).astype(jnp.int8)}
        return (new_logits, best), ys

    ctx = {"energy": energy.params, "left": x0[:, :min_pos],
           "right": x0[:, max_pos + 1:]}
    oracle_fn = None
    if oracle is not None:
        ctx["oracle"] = oracle[0]

        def oracle_fn(c, s):
            logits, _ = s
            hard = jax.nn.one_hot(jnp.argmax(logits, -1), V)
            return oracle[1](c["oracle"], assemble(c, hard))

    e0, fit0 = jax.jit(energy.energy)(ctx["energy"], x0)
    best0 = (e0, fit0, x0)

    (final_logits, best), rec = base.run_segmented(
        step_fn=step, ctx=ctx, init_state=(logits0, best0), key=key,
        num_steps=num_steps, log_every=log_every, oracle_fn=oracle_fn,
        log_fn=base.default_log("MALA-approx"), quiet=quiet,
        checkpoint_dir=checkpoint_dir)

    final_hard = jax.nn.one_hot(jnp.argmax(final_logits, -1), V)
    final_x = assemble(ctx, final_hard)
    return base.package_result(e0=e0, fit0=fit0, x0_traj_head=x0[0],
                               traj_tokens=True,
                               best=best, final_x=final_x, rec=rec)
