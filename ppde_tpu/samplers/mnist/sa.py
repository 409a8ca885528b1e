"""Simulated annealing for binary MNIST.

Parity with the reference (mnist_samplers/sa.py:8-120): per chain
Poisson(mu_i - 1)+1 random pixel flips at distinct positions, Metropolis
acceptance with T = T_max * decay^step, and — as in the reference, whose
rejection fallback ``x2`` is never reassigned (:91) — rejected chains reset
to the INITIAL image.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ppde_tpu import utils
from ppde_tpu.energy import Energy
from ppde_tpu.samplers import base


@dataclasses.dataclass(frozen=True)
class MNISTSAConfig:
    temp: float = 10.0
    muts_per_seq_param: float = 5.0
    decay_rate: float = 0.999
    max_edits: int = 24


def propose_flips(key, x, mu, max_edits):
    """Poisson(mu-1)+1 distinct pixel flips per chain (reference :20-45)."""
    n, D = x.shape
    k_pois, k_pos = jax.random.split(key)
    n_edits = jnp.clip(jax.random.poisson(k_pois, mu - 1.0) + 1,
                       1, max_edits).astype(jnp.int32)
    gumbel = jax.random.gumbel(k_pos, (n, D))
    _, pos = jax.lax.top_k(gumbel, max_edits)
    slots = jnp.arange(max_edits)[None, :] < n_edits[:, None]  # [n, max_edits]
    flip = jnp.zeros_like(x)
    onehots = jax.nn.one_hot(pos, D, dtype=x.dtype)  # [n, max_edits, D]
    flip = jnp.einsum("ns,nsd->nd", slots.astype(x.dtype), onehots)
    return utils.flip_bits(x, jnp.clip(flip, 0, 1))


def run(energy: Energy, initial_population: jnp.ndarray, num_steps: int,
        min_pos: int = 0, max_pos: int = 784, oracle=None,
        cfg: MNISTSAConfig | None = None, key: jax.Array | None = None,
        log_every: int = 50, quiet: bool = False,
        checkpoint_dir: str | None = None) -> base.SamplerResult:
    cfg = cfg or MNISTSAConfig()
    key = key if key is not None else jax.random.PRNGKey(0)
    pop = jnp.asarray(initial_population)
    D = pop.shape[1] // 2
    x1, x2_init = pop[:, :D], pop[:, D:]
    n = pop.shape[0]

    key, k_mu = jax.random.split(key)
    mu = cfg.muts_per_seq_param * jax.random.uniform(k_mu, (n,)) + 1.0

    ctx = {"energy": energy.params, "x1": x1, "init_x2": x2_init, "mu": mu}
    oracle_fn = None
    if oracle is not None:
        ctx["oracle"] = oracle[0]
        oracle_fn = lambda c, s: oracle[1](c["oracle"], s[0], c["x1"])

    e0, fit0 = jax.jit(energy.energy)(ctx["energy"], x2_init, x1)
    best0 = (e0, fit0, x2_init)

    def step(ctx, state, key):
        x, cur_e, cur_fit, step_i, best = state
        k_prop, k_acc = jax.random.split(key)
        y = propose_flips(k_prop, x, ctx["mu"], cfg.max_edits)
        e_p, fit_p = energy.energy(ctx["energy"], y, ctx["x1"])
        T = cfg.temp * cfg.decay_rate ** step_i
        ap = jnp.minimum(jnp.exp((e_p - cur_e) / T), 1.0)
        accepted = ap > jax.random.uniform(k_acc, (n,))
        acc2 = accepted.reshape(n, 1)
        new_x = jnp.where(acc2, y, ctx["init_x2"])  # rejection -> initial image
        new_e = jnp.where(accepted, e_p, cur_e)
        new_fit = jnp.where(accepted, fit_p, cur_fit)
        best = base.update_best(best, new_e, new_fit, new_x)
        ys = {"energy": new_e, "fitness": new_fit, "accepted": accepted,
              "traj": new_x[0].astype(jnp.uint8)}
        return (new_x, new_e, new_fit, step_i + 1, best), ys

    state0 = (x2_init, e0, fit0, jnp.zeros((), jnp.float32), best0)
    (final_x2, _, _, _, best), rec = base.run_segmented(
        step_fn=step, ctx=ctx, init_state=state0, key=key,
        num_steps=num_steps, log_every=log_every, oracle_fn=oracle_fn,
        log_fn=base.default_log("SA"), quiet=quiet,
        checkpoint_dir=checkpoint_dir)

    return base.package_result(e0=e0, fit0=fit0, x0_traj_head=x2_init[0],
                               best=best, final_x=final_x2, rec=rec)
