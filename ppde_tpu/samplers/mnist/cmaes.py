"""CMA-ES for binary MNIST over a [784, 2] categorical relaxation.

Parity with the reference (mnist_samplers/cmaes.py:8-126): candidates are
[784*2] continuous vectors argmax-discretized per pixel; the starting point
one-hot encodes the initial image; the returned population is the last
n_chains//popsize generations of candidates. Fixes the reference's stale
``model.get_fitness`` call (:105) via the supervised expert.
"""
from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from ppde_tpu.energy import Energy
from ppde_tpu.samplers import base
from ppde_tpu.samplers.cma_core import CMAES


@dataclasses.dataclass(frozen=True)
class MNISTCMAESConfig:
    population_size: int = 16
    initial_variance: float = 0.1


def run(energy: Energy, initial_population: jnp.ndarray, num_steps: int,
        min_pos: int = 0, max_pos: int = 784, oracle=None,
        cfg: MNISTCMAESConfig | None = None, key: jax.Array | None = None,
        log_every: int = 50, quiet: bool = False,
        seed: int = 0) -> base.SamplerResult:
    cfg = cfg or MNISTCMAESConfig()
    pop = np.asarray(initial_population)
    n_chains = pop.shape[0]
    D = pop.shape[1] // 2
    x1 = jnp.asarray(pop[:, :D])
    x2 = jnp.asarray(pop[:, D:])
    x1_single = x1[:1]

    eparams = energy.params

    @jax.jit
    def batch_energy(eparams, soln):
        """[P, D*2] -> (energy, fitness, binary images [P, D])."""
        imgs = jnp.argmax(soln.reshape(-1, D, 2), -1).astype(jnp.float32)
        x1b = jnp.broadcast_to(x1_single, (imgs.shape[0], D))
        e, fit = energy.energy(eparams, imgs, x1b)
        return e, fit, imgs

    fitness_jit = jax.jit(energy.fitness)

    x0 = np.zeros((D, 2), np.float64)
    x0[np.arange(D), np.asarray(x2[0]).astype(int)] = 1.0
    es = CMAES(x0.ravel(), np.sqrt(cfg.initial_variance),
               popsize=cfg.population_size, seed=seed)

    e0, fit0 = jax.jit(energy.energy)(eparams, x2, x1)
    energy_history = [np.asarray(e0)]
    fitness_history = [np.asarray(fit0)]
    oracle_history = []
    gens: list[np.ndarray] = []   # per-generation candidate images
    gen_es: list[np.ndarray] = []
    t = max(1, n_chains // cfg.population_size)

    t0 = time.perf_counter()
    for step in range(num_steps):
        X = es.ask()
        e, fit, imgs = batch_energy(eparams, jnp.asarray(X, jnp.float32))
        es.tell(X, -np.asarray(e))
        gens.append(np.asarray(imgs))
        gen_es.append(np.asarray(e))

        if step > 0 and (step + 1) % log_every == 0:
            new_pop = np.concatenate(gens[-t:], 0)[:n_chains]
            new_pop_j = jnp.asarray(new_pop)
            x1b = jnp.broadcast_to(x1_single, new_pop_j.shape)
            fitness_history.append(
                np.resize(np.asarray(fitness_jit(eparams, new_pop_j, x1b)),
                          n_chains))
            energy_history.append(
                np.resize(np.concatenate(gen_es[-t:], 0), n_chains))
            if oracle is not None:
                oracle_history.append(
                    np.asarray(oracle[1](oracle[0], new_pop_j, x1b)))
            if not quiet:
                print(f"[CMAES iter {step}] energy mean "
                      f"{energy_history[-1].mean():.3f}", flush=True)
    elapsed = time.perf_counter() - t0

    final = np.concatenate(gens[-t:], 0)[:n_chains] if gens else np.asarray(x2)
    final = np.resize(final, (n_chains, D))
    e_final = np.resize(np.concatenate(gen_es[-t:], 0), n_chains) if gen_es \
        else np.asarray(e0)
    x1b = jnp.broadcast_to(x1_single, (n_chains, D))
    fit_final = np.asarray(fitness_jit(eparams, jnp.asarray(final), x1b))

    order = np.argsort(-e_final)
    return base.SamplerResult(
        best_x=final[order], best_energy=e_final[order],
        best_fitness=fit_final[order],
        energy_history=np.stack(energy_history, 0),
        fitness_history=np.stack(fitness_history, 0),
        random_traj=None, final_x=final,
        oracle_history=(np.stack(oracle_history, 0) if oracle_history
                        else np.zeros((0,))),
        steps_per_sec=num_steps / max(elapsed, 1e-9),
    )
