"""Parallel-tempering PPDE for binary MNIST — beyond-reference sampler.

MNIST-domain twin of samplers/protein/pt.py (the reference has no
tempering in either domain): the chain batch is n_levels temperature
levels x M replicas, every chain runs the PAS/GWG flip step against its
tempered target pi_l(x2) ~ exp(beta_l * E(x2; x1)), and adjacent levels
attempt state swaps via the shared exchange core (samplers/pt_core.py,
where the detailed-balance argument lives).

The MNIST energy is CONDITIONED on the fixed first digit x1 per chain, so
a swap is only meaningful between chains with the same x1 — ``run``
validates that each replica column shares one x1 across all levels (the
CLI's tiled wild-type population satisfies this trivially; a heterogeneous
x1 batch raises). Gold stationarity test:
tests/test_mnist_samplers.py::test_mnist_pt_levels_sample_tempered_boltzmann.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ppde_tpu.energy import Energy
from ppde_tpu.samplers import base, pt_core
from ppde_tpu.samplers.mnist import ppde


@dataclasses.dataclass(frozen=True)
class MNISTPTConfig(ppde.MNISTPPDEConfig):
    n_levels: int = 8        # temperature levels K (n_chains % K == 0)
    beta_min: float = 0.25   # hottest inverse temperature (geometric ladder)
    swap_every: int = 1      # attempt exchanges every this many steps


def make_pt_step(energy: Energy, cfg: MNISTPTConfig, n: int, D: int):
    """(ctx, state, key) -> (state, ys); state = (core, count). ctx holds
    'beta' [n] in addition to the plain MNIST step's 'energy'/'x1'."""
    make = (ppde._make_step_pas if cfg.pas_length > 0
            else ppde._make_step_gwg)
    inner = make(energy, cfg, n, D, tempered=True)
    exchange = pt_core.make_exchange(n, cfg.n_levels, cfg.swap_every)

    def step(ctx, state, key):
        core, count = state
        k_move, k_swap = jax.random.split(key)
        core, ys = inner(ctx, core, k_move)
        x2, (e, fit, grad), best = core

        (x2, e, fit, grad), n_swapped = exchange(
            ctx["beta"], e, count, k_swap, [x2, e, fit, grad])

        best = base.update_best(best, e, fit, x2)
        ys = dict(ys, energy=e, fitness=fit,
                  traj=x2[0].astype(jnp.uint8), n_swapped=n_swapped)
        return ((x2, (e, fit, grad), best), count + 1), ys

    return step


def run(energy: Energy, initial_population: jnp.ndarray, num_steps: int,
        min_pos: int = 0, max_pos: int = 784, oracle=None,
        cfg: MNISTPTConfig | None = None, key: jax.Array | None = None,
        log_every: int = 50, quiet: bool = False,
        checkpoint_dir: str | None = None) -> base.SamplerResult:
    """Same contract as mnist.ppde.run; chains [c*M:(c+1)*M] run at ladder
    level c (level 0 = cold, beta = 1 — those chains sample the actual
    target)."""
    cfg = cfg or MNISTPTConfig()
    key = key if key is not None else jax.random.PRNGKey(0)
    pop = jnp.asarray(initial_population)
    n, D = pop.shape[0], pop.shape[1] // 2
    x1, x2 = pop[:, :D], pop[:, D:]

    beta = pt_core.ladder(n, cfg.n_levels, cfg.beta_min)
    # swaps move x2 between levels of one replica column; the conditioning
    # x1 must therefore be level-invariant per column or the swapped state
    # would be scored against a different energy than it equilibrated on
    x1_cols = np.asarray(x1).reshape(cfg.n_levels, n // cfg.n_levels, D)
    if not (x1_cols == x1_cols[:1]).all():
        raise ValueError(
            "PT requires each replica column to share one x1 across all "
            "temperature levels (tile the wild-type pair, as the CLI does)")

    ctx = {"energy": energy.params, "x1": x1, "beta": jnp.asarray(beta)}
    oracle_fn = None
    if oracle is not None:
        ctx["oracle"] = oracle[0]
        oracle_fn = lambda c, s: oracle[1](c["oracle"], s[0][0], c["x1"])

    e0, fit0, grad0 = jax.jit(energy.energy_and_grad)(ctx["energy"], x2, x1)
    best0 = (e0, fit0, x2)
    step = make_pt_step(energy, cfg, n, D)

    init_state = ((x2, (e0, fit0, grad0), best0), jnp.asarray(0, jnp.int32))
    ((final_x2, _, best), _), rec = base.run_segmented(
        step_fn=step, ctx=ctx, init_state=init_state, key=key,
        num_steps=num_steps, log_every=log_every, oracle_fn=oracle_fn,
        log_fn=base.default_log("PT-PPDE"), quiet=quiet,
        checkpoint_dir=checkpoint_dir)

    return base.package_result(e0=e0, fit0=fit0, x0_traj_head=x2[0],
                               best=best, final_x=final_x2, rec=rec)
