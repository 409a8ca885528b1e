"""CMA-ES baseline: evolution strategy over a relaxed one-hot window.

Parity with the reference CMAES sampler (protein_samplers/cmaes.py:9-132):
optimizes the flattened [window_len * V] continuous relaxation starting from
chain 0's one-hot, objective = -energy of the argmax-discretized candidate,
keeps a running top-K (K = n_chains) archive re-seeded at every log step, and
returns the top-K population. Fixes the reference's stale
``energy_function.get_fitness`` call (:106,:124 — an AttributeError in the
reference) by evaluating the supervised expert.

TPU-first: each generation's popsize candidates are discretized and scored
in ONE batched device call (the reference evaluates candidates one at a
time, batch size 1, :60-72).
"""
from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from ppde_tpu.energy import Energy
from ppde_tpu.samplers import base
from ppde_tpu.samplers.cma_core import CMAES


@dataclasses.dataclass(frozen=True)
class CMAESConfig:
    population_size: int = 16
    initial_variance: float = 0.05
    # None = auto: sep-CMA (diagonal covariance, no eigendecomposition) above
    # cma_core.AUTO_DIAG_DIM — required for GFP-sized windows (d = 4760,
    # where a full eigh costs minutes per refresh on one CPU core)
    diag: bool | None = None


def run(energy: Energy, initial_population: jnp.ndarray, num_steps: int,
        min_pos: int, max_pos: int, oracle=None,
        cfg: CMAESConfig | None = None, key: jax.Array | None = None,
        log_every: int = 50, quiet: bool = False,
        seed: int = 0, checkpoint_dir: str | None = None) -> base.SamplerResult:
    cfg = cfg or CMAESConfig()
    x0 = np.asarray(initial_population)
    n_chains, L, V = x0.shape
    wlen = max_pos + 1 - min_pos
    eparams = energy.params
    left = jnp.asarray(x0[0, :min_pos])
    right = jnp.asarray(x0[0, max_pos + 1:])

    @jax.jit
    def batch_energy(eparams, left, right, window_soft):
        """[P, wlen*V] continuous candidates -> (energy, fitness, onehots)."""
        w = window_soft.reshape(-1, wlen, V)
        hard = jax.nn.one_hot(jnp.argmax(w, -1), V)
        full = jnp.concatenate([
            jnp.broadcast_to(left, (w.shape[0],) + left.shape),
            hard,
            jnp.broadcast_to(right, (w.shape[0],) + right.shape)], axis=1)
        e, fit = energy.energy(eparams, full)
        return e, fit, full

    fitness_jit = jax.jit(energy.fitness)

    es = CMAES(x0[0, min_pos:max_pos + 1].reshape(-1),
               np.sqrt(cfg.initial_variance),
               popsize=cfg.population_size, seed=seed, diag=cfg.diag)

    seq_arch: list[np.ndarray] = []   # [L,V] candidates
    e_arch: list[float] = []
    fitness_history, energy_history, oracle_history = [], [], []
    start_step = 0

    e0, fit0 = jax.jit(energy.energy)(eparams, jnp.asarray(x0))
    energy_history.append(np.asarray(e0))
    fitness_history.append(np.asarray(fit0))

    # -- host-side checkpoint/resume (the MCMC samplers get this from
    # base.run_segmented; CMA-ES state lives on the host) --
    ck_path = (os.path.join(checkpoint_dir, "cmaes_state.npz")
               if checkpoint_dir else None)
    if ck_path and os.path.exists(ck_path):
        z = np.load(ck_path, allow_pickle=False)
        es.set_state({k[3:]: z[k] for k in z.files if k.startswith("es_")})
        start_step = int(z["step"])
        seq_arch = list(z["seq_arch"])
        e_arch = list(z["e_arch"])
        fitness_history = list(z["fitness_history"])
        energy_history = list(z["energy_history"])
        oracle_history = list(z["oracle_history"])
        if not quiet:
            print(f"[resume] CMA-ES at generation {start_step} from "
                  f"{ck_path}", flush=True)

    def save_ckpt(step):
        if not ck_path:
            return
        os.makedirs(checkpoint_dir, exist_ok=True)
        tmp = ck_path + ".tmp.npz"
        np.savez(tmp, step=np.int64(step),
                 seq_arch=np.stack(seq_arch, 0),
                 e_arch=np.asarray(e_arch),
                 fitness_history=np.stack(fitness_history, 0),
                 energy_history=np.stack(energy_history, 0),
                 oracle_history=(np.stack(oracle_history, 0)
                                 if oracle_history else np.zeros((0,))),
                 **{"es_" + k: v for k, v in es.get_state().items()})
        os.replace(tmp, ck_path)

    def top_k():
        e = np.asarray(e_arch)
        idx = np.argsort(-e)[:n_chains]
        if len(idx) < n_chains:  # pad by repeating the best
            idx = np.concatenate([idx, np.repeat(idx[:1],
                                                 n_chains - len(idx))])
        seqs = np.stack([seq_arch[i] for i in idx], 0)
        return seqs, e[idx]

    import time
    t0 = time.perf_counter()
    for step in range(start_step, num_steps):
        X = es.ask()
        e, fit, full = batch_energy(eparams, left, right,
                                    jnp.asarray(X, jnp.float32))
        e_np = np.asarray(e)
        es.tell(X, -e_np)
        full_np = np.asarray(full)
        for i in range(len(e_np)):
            seq_arch.append(full_np[i])
            e_arch.append(float(e_np[i]))

        if step > 0 and (step + 1) % log_every == 0:
            seqs, es_top = top_k()
            seqs_j = jnp.asarray(seqs)
            fit_top = np.asarray(fitness_jit(eparams, seqs_j))
            fitness_history.append(fit_top)
            energy_history.append(es_top)
            if oracle is not None:
                oracle_history.append(np.asarray(oracle[1](oracle[0], seqs_j)))
            # re-seed archive with the current top-K (reference :108-110)
            seq_arch = [s for s in seqs]
            e_arch = list(es_top)
            save_ckpt(step + 1)
            if not quiet:
                eq = np.quantile(es_top, [0.5, 0.9])
                fq = np.quantile(fit_top, [0.5, 0.9])
                print(f"[CMAES iter {step}] energy 50% {eq[0]:.3f} 90% "
                      f"{eq[1]:.3f}; pred fit 50% {fq[0]:.3f} 90% {fq[1]:.3f}",
                      flush=True)
    elapsed = time.perf_counter() - t0

    seqs, es_top = top_k()
    seqs_j = jnp.asarray(seqs)
    best_fit = np.asarray(fitness_jit(eparams, seqs_j))
    if oracle is not None:
        oracle_history.append(np.asarray(oracle[1](oracle[0], seqs_j)))

    return base.SamplerResult(
        best_x=seqs, best_energy=es_top, best_fitness=best_fit,
        energy_history=np.stack(
            [np.resize(e, n_chains) for e in energy_history], 0),
        fitness_history=np.stack(
            [np.resize(f, n_chains) for f in fitness_history], 0),
        random_traj=None, final_x=seqs,
        oracle_history=(np.stack(oracle_history, 0) if oracle_history
                        else np.zeros((0,))),
        steps_per_sec=(num_steps - start_step) / max(elapsed, 1e-9),  # generations actually run this process (resume-aware)
    )
