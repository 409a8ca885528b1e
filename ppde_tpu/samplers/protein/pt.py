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
  * per-chain beta is a ctx array; the tempered PAS step reuses
    ppde.make_step(tempered=True) unchanged (the carried grad stays raw
    dE/dx, so swapping states between levels needs no rescaling);
  * the even/odd pairing alternates by a step counter carried in the scan
    state; partner selection is a [K, K] one-hot permutation matrix
    contracted against the level axis (a matmul — XLA lowers it to fast
    select/reduce code, unlike dynamic gathers which serialize on TPU);
  * both ends of a pair share one uniform draw (the lower level's), so the
    accept decision is symmetric and the swap is a valid involution.

Detailed balance: the exchange move is its own involution with symmetric
proposal probability (parity is deterministic, partner choice is
deterministic given parity), so the acceptance above satisfies detailed
balance for the product measure prod_l pi_l — the gold stationarity test
(tests/test_pt.py) verifies the COLD level samples the exact Boltzmann
distribution with the full PT machinery running.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ppde_tpu import utils
from ppde_tpu.energy import Energy
from ppde_tpu.samplers import base
from ppde_tpu.samplers.protein import ppde


@dataclasses.dataclass(frozen=True)
class PTConfig(ppde.PPDEConfig):
    n_levels: int = 8        # temperature levels K (n_chains % K == 0)
    beta_min: float = 0.25   # hottest inverse temperature; ladder is
    #                          geometric: beta_l = beta_min ** (l / (K-1))
    swap_every: int = 1      # attempt exchanges every this many steps


def ladder(n_chains: int, cfg: PTConfig) -> np.ndarray:
    """Per-chain inverse temperatures [n_chains]; level = chain // M with
    M = n_chains // n_levels. Level 0 is the cold (beta=1) chain block."""
    if n_chains % cfg.n_levels:
        raise ValueError(
            f"n_chains={n_chains} must be divisible by n_levels={cfg.n_levels}")
    if not (0.0 < cfg.beta_min <= 1.0):
        raise ValueError(f"beta_min must be in (0, 1], got {cfg.beta_min}")
    k = np.arange(cfg.n_levels, dtype=np.float64)
    denom = max(cfg.n_levels - 1, 1)
    betas = cfg.beta_min ** (k / denom)
    return np.repeat(betas, n_chains // cfg.n_levels).astype(np.float32)


def make_pt_step(energy: Energy, cfg: PTConfig, window_ok: jnp.ndarray,
                 n: int, L: int, V: int):
    """(ctx, state, key) -> (state, ys) with state = (core, count); core is
    the ppde step state, count the outer step index (drives swap parity).

    ctx additionally holds 'beta' [n]."""
    K = cfg.n_levels
    M = n // K
    inner = ppde.make_step(energy, cfg, window_ok, n, L, V, tempered=True)
    iota_k = jnp.arange(K, dtype=jnp.int32)

    def step(ctx, state, key):
        core, count = state
        k_move, k_swap = jax.random.split(key)
        core, ys = inner(ctx, core, k_move)
        cur_x, (e, fit, grad), best = core

        # ---- replica-exchange phase (alternating even/odd pairing) ----
        parity = (count // cfg.swap_every) % 2
        gate = (count % cfg.swap_every) == 0
        sgn = 1 - 2 * ((iota_k - parity) % 2)            # +1 pairs up, -1 down
        partner = iota_k + sgn
        valid = (partner >= 0) & (partner < K)
        partner = jnp.where(valid, partner, iota_k)      # edges self-pair
        P = (iota_k[None, :] == partner[:, None]).astype(jnp.float32)  # [K,K]

        betas_lvl = ctx["beta"].reshape(K, M)[:, 0]
        e_lvl = e.reshape(K, M)
        e_part = P @ e_lvl                               # [K, M]
        beta_part = P @ betas_lvl
        # symmetric under l <-> partner: both ends compute the same value
        log_acc = (betas_lvl - beta_part)[:, None] * (e_part - e_lvl)

        u = jax.random.uniform(k_swap, (K, M))
        u_shared = jnp.where((iota_k < partner)[:, None], u, P @ u)
        swap = ((jnp.log(u_shared) < log_acc)
                & valid[:, None] & gate)                 # [K, M]

        def exchange(v):
            flat = v.reshape(K, -1)
            part = P @ flat.astype(jnp.float32)
            s = jnp.broadcast_to(swap[..., None],
                                 (K, M, flat.shape[1] // M)).reshape(K, -1)
            return jnp.where(s, part, flat.astype(jnp.float32)) \
                      .astype(v.dtype).reshape(v.shape)

        cur_x = exchange(cur_x)
        e = exchange(e)
        fit = exchange(fit)
        grad = exchange(grad)

        # post-swap bookkeeping: records/best/traj reflect the state a chain
        # actually holds after the full PT step
        best = base.update_best(best, e, fit, cur_x)
        ys = dict(ys, energy=e, fitness=fit,
                  traj=jnp.argmax(cur_x[0], axis=-1).astype(jnp.int8),
                  n_swapped=jnp.sum(swap & (sgn > 0)[:, None]))
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
