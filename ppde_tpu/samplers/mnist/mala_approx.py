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
        min_pos: int = 0, max_pos: int = 784, oracle=None,
        cfg: MNISTMALAConfig | None = None, key: jax.Array | None = None,
        log_every: int = 50, quiet: bool = False,
        checkpoint_dir: str | None = None) -> base.SamplerResult:
    cfg = cfg or MNISTMALAConfig()
    key = key if key is not None else jax.random.PRNGKey(0)
    pop = jnp.asarray(initial_population)
    D = pop.shape[1] // 2
    x1, x2 = pop[:, :D], pop[:, D:]

    p0 = (1 - cfg.relaxation_tau) * 0.5 + cfg.relaxation_tau * x2
    logits0 = jnp.log(p0) - jnp.log1p(-p0)

    ctx = {"energy": energy.params, "x1": x1}
    e0, fit0 = jax.jit(energy.energy)(ctx["energy"], x2, x1)
    best0 = (e0, fit0, x2)

    def step(ctx, state, key):
        logits, best = state
        k_s, k_noise = jax.random.split(key)

        def e_of_logits(lg):
            xh = _relaxed_bernoulli_st(k_s, lg, cfg.relaxation_tau)
            e, fit = energy.energy(ctx["energy"], xh, ctx["x1"])
            return jnp.sum(e), (e, fit, xh)

        (_, (e, fit, xh)), g = jax.value_and_grad(e_of_logits, has_aux=True)(logits)
        noise = jax.random.normal(k_noise, logits.shape) * cfg.step_size ** 2
        new_logits = logits + (cfg.step_size / 2.0) * g + noise
        best = base.update_best(best, e, fit, xh)
        ys = {"energy": e, "fitness": fit, "traj": xh[0].astype(jnp.uint8)}
        return (new_logits, best), ys

    oracle_fn = None
    if oracle is not None:
        ctx["oracle"] = oracle[0]

        def oracle_fn(c, s):
            logits, _ = s
            hard = (logits > 0).astype(jnp.float32)
            return oracle[1](c["oracle"], hard, c["x1"])

    (final_logits, best), rec = base.run_segmented(
        step_fn=step, ctx=ctx, init_state=(logits0, best0), key=key,
        num_steps=num_steps, log_every=log_every, oracle_fn=oracle_fn,
        log_fn=base.default_log("MALA-approx"), quiet=quiet,
        checkpoint_dir=checkpoint_dir)

    final_x2 = (jax.device_get(final_logits) > 0).astype(np.float32)
    res = base.package_result(e0=e0, fit0=fit0, x0_traj_head=x2[0],
                              best=best, final_x=jnp.asarray(final_x2),
                              rec=rec)
    return res
