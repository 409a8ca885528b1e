"""Simulated annealing over one-hot proteins — vectorized proposals.

Behavioral parity with the reference SimulatedAnnealing
(protein_samplers/sa.py:9-149): per chain a Poisson(mu_i - 1)+1 number of
random AA substitutions at distinct positions inside [min_pos, max_pos]
(mu_i drawn once per run, :66), Metropolis acceptance with temperature
T = T_max * decay^step, proposals beyond the nmut threshold rejected
(energy forced to -inf, :95-98), and — faithfully to the reference (:104,
where the rejection fallback `x` is never reassigned from the initial
population) — rejected chains reset to the INITIAL population, not to their
previous state. Recorded energies for rejected chains carry the previous
value (:112), also as in the reference.

TPU-first: the reference's per-sequence Python loop over edits (:40-55)
becomes a Gumbel-top-k draw of distinct positions plus a static unrolled
substitution loop, all inside one scanned step with explicit ctx params.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ppde_tpu import utils
from ppde_tpu.energy import Energy
from ppde_tpu.samplers import base


@dataclasses.dataclass(frozen=True)
class SAConfig:
    temp: float = 0.01
    muts_per_seq_param: float = 1.5
    decay_rate: float = 0.999
    nmut_threshold: int = 0
    max_edits: int = 12  # static cap on simultaneous edits per proposal


def propose(key, x, mu, min_pos, max_pos, max_edits):
    """Batched random-edit proposal.

    For each chain: n ~ Poisson(mu-1)+1 (clamped to [1, max_edits]) distinct
    positions in [min_pos, max_pos], each substituted to a uniformly random
    different AA. Parity with make_n_random_edits/propose_seqs
    (protein_samplers/sa.py:26-56).
    """
    n, L, V = x.shape
    k_pois, k_pos, k_aa = jax.random.split(key, 3)
    n_edits = jax.random.poisson(k_pois, mu - 1.0) + 1
    n_edits = jnp.clip(n_edits, 1, max_edits).astype(jnp.int32)

    # distinct positions via Gumbel top-k inside the window
    window = (jnp.arange(L) >= min_pos) & (jnp.arange(L) <= max_pos)
    gumbel = jax.random.gumbel(k_pos, (n, L))
    gumbel = jnp.where(window[None, :], gumbel, -jnp.inf)
    _, pos = jax.lax.top_k(gumbel, max_edits)  # [n, max_edits]

    # random different AA: draw in [0, V-1) and skip over the current value
    cur = jnp.argmax(jnp.take_along_axis(x, pos[:, :, None], axis=1), -1)
    draw = jax.random.randint(k_aa, (n, max_edits), 0, V - 1)
    new_aa = draw + (draw >= cur).astype(draw.dtype)

    y = x
    for slot in range(max_edits):
        live = (slot < n_edits).astype(x.dtype).reshape(n, 1, 1)
        y_sub = utils.substitute(y, pos[:, slot] * V + new_aa[:, slot])
        y = live * y_sub + (1 - live) * y
    return y


def make_step(energy: Energy, cfg: SAConfig, min_pos: int, max_pos: int,
              n: int):
    nmut = cfg.nmut_threshold if cfg.nmut_threshold > 0 else np.iinfo(np.int32).max

    def step(ctx, state, key):
        x, cur_e, cur_fit, step_i, best = state
        k_prop, k_acc = jax.random.split(key)

        y = propose(k_prop, x, ctx["mu"], min_pos, max_pos, cfg.max_edits)
        e_p, fit_p = energy.energy(ctx["energy"], y)
        over = utils.mut_distance(y, ctx["wt"]) > nmut
        e_p = jnp.where(over, utils.NEG_INF, e_p)
        fit_p = jnp.where(over, utils.NEG_INF, fit_p)

        T = cfg.temp * cfg.decay_rate ** step_i
        ap = jnp.minimum(jnp.exp((e_p - cur_e) / T), 1.0)
        accepted = ap > jax.random.uniform(k_acc, (n,))
        acc3 = accepted.reshape(n, 1, 1)

        # fallback to the INITIAL population on rejection (reference :104)
        new_x = jnp.where(acc3, y, ctx["init_x"])
        # -inf proposals are rejected; recorded values sanitize -inf to 0
        # before blending (reference :109-112)
        e_p0 = jnp.where(e_p <= utils.NEG_INF, 0.0, e_p)
        fit_p0 = jnp.where(fit_p <= utils.NEG_INF, 0.0, fit_p)
        new_e = jnp.where(accepted, e_p0, cur_e)
        new_fit = jnp.where(accepted, fit_p0, cur_fit)

        best = base.update_best(best, new_e, new_fit, new_x)
        ys = {"energy": new_e, "fitness": new_fit, "accepted": accepted,
              "traj": jnp.argmax(new_x[0], -1).astype(jnp.int8)}
        return (new_x, new_e, new_fit, step_i + 1, best), ys

    return step


def run(energy: Energy, initial_population: jnp.ndarray, num_steps: int,
        min_pos: int, max_pos: int, oracle=None, cfg: SAConfig | None = None,
        key: jax.Array | None = None, log_every: int = 50,
        quiet: bool = False,
        checkpoint_dir: str | None = None) -> base.SamplerResult:
    cfg = cfg or SAConfig()
    key = key if key is not None else jax.random.PRNGKey(0)
    x0 = jnp.asarray(initial_population)
    n = x0.shape[0]

    key, k_mu = jax.random.split(key)
    mu = cfg.muts_per_seq_param * jax.random.uniform(k_mu, (n,)) + 1.0

    ctx = {"energy": energy.params, "wt": x0[0], "init_x": x0, "mu": mu}
    oracle_fn = None
    if oracle is not None:
        ctx["oracle"] = oracle[0]
        oracle_fn = lambda c, s: oracle[1](c["oracle"], s[0])

    e0, fit0 = jax.jit(energy.energy)(ctx["energy"], x0)
    best0 = (e0, fit0, x0)
    step = make_step(energy, cfg, min_pos, max_pos, n)

    state0 = (x0, e0, fit0, jnp.zeros((), jnp.float32), best0)
    (final_x, _, _, _, best), rec = base.run_segmented(
        step_fn=step, ctx=ctx, init_state=state0, key=key,
        num_steps=num_steps, log_every=log_every, oracle_fn=oracle_fn,
        log_fn=base.default_log("SA"), quiet=quiet,
        checkpoint_dir=checkpoint_dir)

    return base.package_result(e0=e0, fit0=fit0, x0_traj_head=x0[0],
                               traj_tokens=True,
                               best=best, final_x=final_x, rec=rec)
