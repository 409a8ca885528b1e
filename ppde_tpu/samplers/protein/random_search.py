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
        min_pos: int, max_pos: int, oracle_fn,
        cfg: RandomConfig | None = None, key: jax.Array | None = None,
        log_every: int = 50, quiet: bool = False) -> base.SamplerResult:
    cfg = cfg or RandomConfig()
    key = key if key is not None else jax.random.PRNGKey(0)
    x0 = jnp.asarray(initial_population)
    n = x0.shape[0]

    key, k_mu = jax.random.split(key)
    mu = cfg.muts_per_seq_param * jax.random.uniform(k_mu, (n,)) + 1.0

    e0, fit0 = jax.jit(energy.energy)(x0)
    best0 = (e0, fit0, x0)

    def step(state, key):
        x_new_prev, best = state
        y = propose(key, x0, mu, min_pos, max_pos, cfg.max_edits)
        e_p, fit_p = energy.energy(y)
        best = base.update_best(best, e_p, fit_p, y)
        ys = {"energy": e_p, "fitness": fit_p, "traj": y[0]}
        return (y, best), ys

    oracle_state_fn = (lambda s: oracle_fn(s[0])) if oracle_fn else None
    (final_x, best), rec = base.run_segmented(
        step_fn=step, init_state=(x0, best0), key=key, num_steps=num_steps,
        log_every=log_every, oracle_fn=oracle_state_fn,
        log_fn=base.default_log("Random"), quiet=quiet)

    best_e, best_fit, best_x = jax.device_get(best)
    return base.SamplerResult(
        best_x=np.asarray(best_x), best_energy=np.asarray(best_e),
        best_fitness=np.asarray(best_fit),
        energy_history=np.concatenate([np.asarray(e0)[None], rec["energy"]], 0),
        fitness_history=np.concatenate([np.asarray(fit0)[None], rec["fitness"]], 0),
        random_traj=np.concatenate([np.asarray(x0[0])[None], rec["traj"]], 0),
        final_x=np.asarray(jax.device_get(final_x)),
        oracle_history=rec["oracle"],
        steps_per_sec=rec["steps_per_sec"],
    )
