"""MALA-approx for binary MNIST: Langevin on a RelaxedBernoulli relaxation.

Parity with the reference (mnist_samplers/mala_approx.py:7-90): logits
initialized from (1-tau)*0.5 + tau*x2; per step a relaxed Bernoulli sample
(logistic reparameterization) discretized straight-through via rounding,
energy gradient w.r.t. logits, update logits <- Normal(logits + (eta/2) g,
scale=eta^2). No MH correction.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ppde_tpu.energy import Energy
from ppde_tpu.samplers import base


@dataclasses.dataclass(frozen=True)
class MNISTMALAConfig:
    step_size: float = 0.01
    relaxation_tau: float = 0.9


def _relaxed_bernoulli_st(key, logits, tau):
    """Straight-through RelaxedBernoulli sample (logistic reparam + round)."""
    u = jax.random.uniform(key, logits.shape, minval=1e-6, maxval=1 - 1e-6)
    logistic = jnp.log(u) - jnp.log1p(-u)
    soft = jax.nn.sigmoid((logits + logistic) / tau)
    hard = jnp.round(soft)
    return soft + jax.lax.stop_gradient(hard - soft)


def run(energy: Energy, initial_population: jnp.ndarray, num_steps: int,
        min_pos: int = 0, max_pos: int = 784, oracle_fn=None,
        cfg: MNISTMALAConfig | None = None, key: jax.Array | None = None,
        log_every: int = 50, quiet: bool = False) -> base.SamplerResult:
    cfg = cfg or MNISTMALAConfig()
    key = key if key is not None else jax.random.PRNGKey(0)
    pop = jnp.asarray(initial_population)
    D = pop.shape[1] // 2
    x1, x2 = pop[:, :D], pop[:, D:]

    p0 = (1 - cfg.relaxation_tau) * 0.5 + cfg.relaxation_tau * x2
    logits0 = jnp.log(p0) - jnp.log1p(-p0)

    e0, fit0 = jax.jit(lambda v: energy.energy(v, x1))(x2)
    best0 = (e0, fit0, x2)

    def step(state, key):
        logits, best = state
        k_s, k_noise = jax.random.split(key)

        def e_of_logits(lg):
            xh = _relaxed_bernoulli_st(k_s, lg, cfg.relaxation_tau)
            e, fit = energy.energy(xh, x1)
            return jnp.sum(e), (e, fit, xh)

        (_, (e, fit, xh)), g = jax.value_and_grad(e_of_logits, has_aux=True)(logits)
        noise = jax.random.normal(k_noise, logits.shape) * cfg.step_size ** 2
        new_logits = logits + (cfg.step_size / 2.0) * g + noise
        best = base.update_best(best, e, fit, xh)
        ys = {"energy": e, "fitness": fit, "traj": xh[0]}
        return (new_logits, best), ys

    oracle_state_fn = None
    if oracle_fn is not None:
        def oracle_state_fn(s):
            logits, _ = s
            hard = (logits > 0).astype(x2.dtype)
            return oracle_fn(hard, x1)

    (final_logits, best), rec = base.run_segmented(
        step_fn=step, init_state=(logits0, best0), key=key,
        num_steps=num_steps, log_every=log_every, oracle_fn=oracle_state_fn,
        log_fn=base.default_log("MALA-approx"), quiet=quiet)

    final_x2 = (jax.device_get(final_logits) > 0).astype(np.float32)
    best_e, best_fit, best_x = jax.device_get(best)
    return base.SamplerResult(
        best_x=np.asarray(best_x), best_energy=np.asarray(best_e),
        best_fitness=np.asarray(best_fit),
        energy_history=np.concatenate([np.asarray(e0)[None], rec["energy"]], 0),
        fitness_history=np.concatenate([np.asarray(fit0)[None], rec["fitness"]], 0),
        random_traj=np.concatenate([np.asarray(x2[0])[None], rec["traj"]], 0),
        final_x=final_x2,
        oracle_history=rec["oracle"],
        steps_per_sec=rec["steps_per_sec"],
    )
