"""Parallel-tempering PPDE (PT-PAS) for proteins — beyond-reference sampler.

The reference framework has no tempering (its PPDE runs every chain at the
same implicit temperature, protein_samplers/ppde.py). Multimodal fitness
landscapes with hard mutation budgets are exactly where single-temperature
MCMC stalls, so the TPU rebuild adds replica exchange as a first-class
sampler: the chain batch is organized as ``n_levels`` temperature levels x
``M`` independent replicas, every chain runs the (corrected) PAS step
against its tempered target pi_l(x) ~ exp(beta_l * E(x)), and after each
step adjacent levels attempt state swaps with the standard exchange rule
    P(swap) = min(1, exp((beta_i - beta_j) * (E_j - E_i))).

TPU-first structure (everything is batch-dim algebra — no host loops, no
scatters/gathers, one lax.scan per segment exactly like the base sampler):
per-chain beta is a ctx array, the tempered PAS step reuses
ppde.make_step(tempered=True) unchanged (the carried grad stays raw dE/dx,
so swapping states between levels needs no rescaling), and the exchange
phase is the shared domain-agnostic core (samplers/pt_core.py — also used
by the MNIST PT sampler; detailed-balance argument documented there). The
gold stationarity test (tests/test_pt.py) verifies EVERY level samples its
exact tempered Boltzmann distribution with the full PT machinery running.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ppde_tpu import utils
from ppde_tpu.energy import Energy
from ppde_tpu.samplers import base, pt_core
from ppde_tpu.samplers.protein import ppde


@dataclasses.dataclass(frozen=True)
class PTConfig(ppde.PPDEConfig):
    n_levels: int = 8        # temperature levels K (n_chains % K == 0)
    beta_min: float = 0.25   # hottest inverse temperature; ladder is
    #                          geometric: beta_l = beta_min ** (l / (K-1))
    swap_every: int = 1      # attempt exchanges every this many steps


def ladder(n_chains: int, cfg: PTConfig) -> np.ndarray:
    """Per-chain inverse temperatures [n_chains] (see pt_core.ladder)."""
    return pt_core.ladder(n_chains, cfg.n_levels, cfg.beta_min)


def make_pt_step(energy: Energy, cfg: PTConfig, window_ok: jnp.ndarray,
                 n: int, L: int, V: int):
    """(ctx, state, key) -> (state, ys) with state = (core, count); core is
    the ppde step state, count the outer step index (drives swap parity).

    ctx additionally holds 'beta' [n]."""
    inner = ppde.make_step(energy, cfg, window_ok, n, L, V, tempered=True)
    exchange = pt_core.make_exchange(n, cfg.n_levels, cfg.swap_every)

    def step(ctx, state, key):
        core, count = state
        k_move, k_swap = jax.random.split(key)
        core, ys = inner(ctx, core, k_move)
        cur_x, (e, fit, grad), best = core

        (cur_x, e, fit, grad), n_swapped = exchange(
            ctx["beta"], e, count, k_swap, [cur_x, e, fit, grad])

        # post-swap bookkeeping: records/best/traj reflect the state a chain
        # actually holds after the full PT step
        best = base.update_best(best, e, fit, cur_x)
        ys = dict(ys, energy=e, fitness=fit,
                  traj=jnp.argmax(cur_x[0], axis=-1).astype(jnp.int8),
                  n_swapped=n_swapped)
        return ((cur_x, (e, fit, grad), best), count + 1), ys

    return step


def run(energy: Energy, initial_population: jnp.ndarray, num_steps: int,
        min_pos: int, max_pos: int, oracle=None, cfg: PTConfig | None = None,
        key: jax.Array | None = None, log_every: int = 50,
        quiet: bool = False,
        checkpoint_dir: str | None = None) -> base.SamplerResult:
    """Same contract as ppde.run; chains [c*M:(c+1)*M] run at ladder level c
    (level 0 = cold, beta = 1 — those chains sample the actual target)."""
    cfg = cfg or PTConfig()
    if cfg.paper_results:
        raise ValueError("paper_results (reset-to-WT on rejection) is a "
                         "legacy reference mode; combining it with replica "
                         "exchange has no reference semantics to preserve")
    key = key if key is not None else jax.random.PRNGKey(0)
    x0 = jnp.asarray(initial_population)
    n, L, V = x0.shape
    window_ok = utils.position_window_mask(L, V, min_pos, max_pos)

    ctx = {"energy": energy.params, "wt": x0[0], "init_x": x0,
           "beta": jnp.asarray(ladder(n, cfg))}
    oracle_fn = None
    if oracle is not None:
        ctx["oracle"] = oracle[0]
        oracle_fn = lambda c, s: oracle[1](c["oracle"], s[0][0])

    e0, fit0, grad0 = jax.jit(energy.energy_and_grad)(ctx["energy"], x0)
    ctx["wt_e"], ctx["wt_fit"], ctx["wt_grad"] = e0[0], fit0[0], grad0[0]
    best0 = (e0, fit0, x0)
    step = make_pt_step(energy, cfg, window_ok, n, L, V)

    init_state = ((x0, (e0, fit0, grad0), best0), jnp.asarray(0, jnp.int32))
    ((final_x, _, best), _), rec = base.run_segmented(
        step_fn=step, ctx=ctx, init_state=init_state,
        key=key, num_steps=num_steps, log_every=log_every,
        oracle_fn=oracle_fn, log_fn=base.default_log("PT-PPDE"), quiet=quiet,
        checkpoint_dir=checkpoint_dir)

    return base.package_result(e0=e0, fit0=fit0, x0_traj_head=x0[0],
                               traj_tokens=True,
                               best=best, final_x=final_x, rec=rec)
