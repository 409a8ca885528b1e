"""Random-search baseline: repeated random edits of the initial population.

Parity with the reference RandomSampler (protein_samplers/random.py:8-137):
uses the SA proposal machinery but "accepts" every proposal while proposing
always FROM THE INITIAL population (the reference never reassigns ``x``, so
each step's proposal is a fresh Poisson-edit of the start state, :82-89).
No nmut constraint applies. Best-per-chain is the argmax-energy proposal
seen across the run.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ppde_tpu.energy import Energy
from ppde_tpu.samplers import base
from ppde_tpu.samplers.protein.sa import propose


@dataclasses.dataclass(frozen=True)
class RandomConfig:
    muts_per_seq_param: float = 1.5
    max_edits: int = 12


def run(energy: Energy, initial_population: jnp.ndarray, num_steps: int,
        min_pos: int, max_pos: int, oracle=None,
        cfg: RandomConfig | None = None, key: jax.Array | None = None,
        log_every: int = 50, quiet: bool = False,
        checkpoint_dir: str | None = None) -> base.SamplerResult:
    cfg = cfg or RandomConfig()
    key = key if key is not None else jax.random.PRNGKey(0)
    x0 = jnp.asarray(initial_population)
    n = x0.shape[0]

    key, k_mu = jax.random.split(key)
    mu = cfg.muts_per_seq_param * jax.random.uniform(k_mu, (n,)) + 1.0

    ctx = {"energy": energy.params, "init_x": x0, "mu": mu}
    oracle_fn = None
    if oracle is not None:
        ctx["oracle"] = oracle[0]
        oracle_fn = lambda c, s: oracle[1](c["oracle"], s[0])

    e0, fit0 = jax.jit(energy.energy)(ctx["energy"], x0)
    best0 = (e0, fit0, x0)

    def step(ctx, state, key):
        _, best = state
        y = propose(key, ctx["init_x"], ctx["mu"], min_pos, max_pos,
                    cfg.max_edits)
        e_p, fit_p = energy.energy(ctx["energy"], y)
        best = base.update_best(best, e_p, fit_p, y)
        ys = {"energy": e_p, "fitness": fit_p, "traj": jnp.argmax(y[0], -1).astype(jnp.int8)}
        return (y, best), ys

    (final_x, best), rec = base.run_segmented(
        step_fn=step, ctx=ctx, init_state=(x0, best0), key=key,
        num_steps=num_steps, log_every=log_every, oracle_fn=oracle_fn,
        log_fn=base.default_log("Random"), quiet=quiet,
        checkpoint_dir=checkpoint_dir)

    return base.package_result(e0=e0, fit0=fit0, x0_traj_head=x0[0],
                               traj_tokens=True,
                               best=best, final_x=final_x, rec=rec)
