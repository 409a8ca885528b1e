"""CMA-ES for binary MNIST over a [784, 2] categorical relaxation.

Parity with the reference (mnist_samplers/cmaes.py:8-126): candidates are
[784*2] continuous vectors argmax-discretized per pixel; the starting point
one-hot encodes the initial image; the returned population is the last
n_chains//popsize generations of candidates. Fixes the reference's stale
``model.get_fitness`` call (:105) via the supervised expert.
"""
from __future__ import annotations

import dataclasses
import os
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
        seed: int = 0, checkpoint_dir: str | None = None) -> base.SamplerResult:
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
    # only the trailing t generations ever feed the population — keeping
    # just those bounds host memory (20k iters of [16, 784] floats would
    # otherwise accumulate ~1 GB) and keeps checkpoints small
    gens: list[np.ndarray] = []   # per-generation candidate images
    gen_es: list[np.ndarray] = []
    t = max(1, n_chains // cfg.population_size)
    start_step = 0

    # -- host-side checkpoint/resume, matching samplers/protein/cmaes.py
    # (framework contract: every sampler in both domains honors
    # checkpoint_dir; bit-exact resume is tested) --
    ck_path = (os.path.join(checkpoint_dir, "cmaes_state.npz")
               if checkpoint_dir else None)
    if ck_path and os.path.exists(ck_path):
        z = np.load(ck_path, allow_pickle=False)
        es.set_state({k[3:]: z[k] for k in z.files if k.startswith("es_")})
        start_step = int(z["step"])
        gens = list(z["gens"]) if z["gens"].size else []
        gen_es = list(z["gen_es"]) if z["gen_es"].size else []
        energy_history = list(z["energy_history"])
        fitness_history = list(z["fitness_history"])
        oracle_history = list(z["oracle_history"]) if z["oracle_history"].size \
            else []
        if not quiet:
            print(f"[resume] CMA-ES at generation {start_step} from "
                  f"{ck_path}", flush=True)

    def save_ckpt(step):
        if not ck_path:
            return
        os.makedirs(checkpoint_dir, exist_ok=True)
        tmp = ck_path + ".tmp.npz"
        np.savez(tmp, step=np.int64(step),
                 gens=(np.stack(gens, 0) if gens else np.zeros((0,))),
                 gen_es=(np.stack(gen_es, 0) if gen_es else np.zeros((0,))),
                 energy_history=np.stack(energy_history, 0),
                 fitness_history=np.stack(fitness_history, 0),
                 oracle_history=(np.stack(oracle_history, 0)
                                 if oracle_history else np.zeros((0,))),
                 **{"es_" + k: v for k, v in es.get_state().items()})
        os.replace(tmp, ck_path)

    t0 = time.perf_counter()
    for step in range(start_step, num_steps):
        X = es.ask()
        e, fit, imgs = batch_energy(eparams, jnp.asarray(X, jnp.float32))
        es.tell(X, -np.asarray(e))
        gens = gens[-(t - 1):] + [np.asarray(imgs)] if t > 1 \
            else [np.asarray(imgs)]
        gen_es = gen_es[-(t - 1):] + [np.asarray(e)] if t > 1 \
            else [np.asarray(e)]

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
            save_ckpt(step + 1)
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
        steps_per_sec=(num_steps - start_step) / max(elapsed, 1e-9),  # generations actually run this process (resume-aware)
    )
