"""PPDE sampler (gradient-informed Path-Auxiliary Sampler) for proteins.

Algorithmic parity with the reference PPDE_PAS (protein_samplers/ppde.py:8-192):
per outer step, one fused energy+grad at the current state, U ~ U[1, 2*pas_len)
intermediate single-substitution moves drawn from the first-order Taylor
proposal softmax((grad - (grad*x).sum(-1)) / 2) with mutation-window and
hard-nmut masking, one fused energy+grad at the proposal endpoint, a reverse
path log-ratio over the stored trajectory, and a per-chain MH accept.

TPU-first differences:
  * the whole outer step is a pure (ctx, state, key) -> (state, stats)
    function; ``log_every`` steps run as ONE lax.scan program
    (base.run_segmented), with parameters passed through jit as ``ctx``;
  * the variable path length U becomes a static max_u = 2*pas_len - 1 inner
    scan with per-chain masking (the reference already masks, :67-70 — here
    max_u is static so nothing ever recompiles);
  * proposals are sampled as flat indices and applied with masked
    substitution — no [N, L*V] one-hot materialization;
  * the reverse log-ratio is one vectorized gather over the stored inner
    trajectory instead of a Python loop over categoricals (:129-132);
  * per-chain best tracking is a running carry, not a host-side history;
  * ONE fused energy+grad per step instead of the reference's two
    (:79,:119): the current state's (e, fit, grad) is carried — it equals
    the accepted endpoint's values, the previous carry on rejection, or the
    precomputed wild-type constants after an nmut reset. Energies are
    deterministic, so this is EXACT, not an approximation.
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
class PPDEConfig:
    pas_length: int = 2
    nmut_threshold: int = 0      # 0 disables the hard constraint
    paper_results: bool = False  # reset rejected chains to WT (legacy mode)
    temp: float = 2.0            # locally-balanced g(t)=sqrt(t) temperature


def make_step(energy: Energy, cfg: PPDEConfig, window_ok: jnp.ndarray,
              n: int, L: int, V: int):
    """Build the jittable outer-step function (ctx, state, key) -> ...

    ctx must hold: 'energy' (params pytree), 'wt' [L,V], 'init_x' [N,L,V].
    """
    max_u = max(2 * cfg.pas_length - 1, 1)
    nmut = cfg.nmut_threshold if cfg.nmut_threshold > 0 else np.iinfo(np.int32).max

    def masked_forward_logits(x, grad_x, wt):
        score = grad_x - jnp.sum(grad_x * x, axis=-1, keepdims=True)
        logits = score.reshape(n, L * V) / cfg.temp
        return utils.apply_proposal_masks(logits, x, wt, window_ok, nmut)

    def step(ctx, state, key):
        cur_x, (e_cur, fit_cur, grad_x), best = state
        wt = ctx["wt"]
        k_u, k_inner, k_acc = jax.random.split(key, 3)

        # per-chain path length, static scan bound (reference :67-70)
        U = jax.random.randint(k_u, (n,), 1, 2 * cfg.pas_length)
        u_mask = (jnp.arange(max_u)[None, :] < U[:, None]).astype(jnp.float32)

        def inner(carry, key_and_t):
            x, t = carry
            k, t_idx = key_and_t
            logits = masked_forward_logits(x, grad_x, wt)
            idx, fwd_logp = utils.categorical_onehot(k, logits)
            x_new = utils.substitute(x, idx)
            live = (t_idx < U).reshape(n, 1, 1).astype(x.dtype)
            x_next = live * x_new + (1 - live) * x
            return (x_next, t + 1), (idx, fwd_logp, x_next)

        inner_keys = jax.random.split(k_inner, max_u)
        (y, _), (idxs, fwd_logps, traj) = jax.lax.scan(
            inner, (cur_x, 0), (inner_keys, jnp.arange(max_u)))
        # traj[t] is the state AFTER inner step t (x_1..x_max_u), matching
        # the reference's traj_list[1:] + [y] (:124-125)

        e_prop, fit_prop, grad_y = energy.energy_and_grad(ctx["energy"], y)

        # reverse path: unmasked Taylor logits at grad_y for every stored
        # intermediate state, gathered at the sampled indices (:126-132)
        rev_score = grad_y[None] - jnp.sum(grad_y[None] * traj, axis=-1,
                                           keepdims=True)
        rev_logits = rev_score.reshape(max_u, n, L * V) / 2.0
        rev_logps = jax.vmap(utils.categorical_log_prob)(rev_logits, idxs)
        log_ratio = jnp.sum(u_mask.T * (rev_logps - fwd_logps), axis=0)

        log_acc = (e_prop - e_cur) + log_ratio
        accepted = (jnp.exp(log_acc) >= jax.random.uniform(k_acc, (n,)))
        fallback = ctx["init_x"] if cfg.paper_results else cur_x
        acc3 = accepted.reshape(n, 1, 1)
        new_x = jnp.where(acc3, y, fallback)
        new_e = jnp.where(accepted, e_prop, e_cur)
        new_fit = jnp.where(accepted, fit_prop, fit_cur)
        new_grad = jnp.where(acc3, grad_y, grad_x)
        if cfg.paper_results:
            # rejection resets to WT in legacy mode: carry WT constants
            new_grad = jnp.where(acc3, grad_y, ctx["wt_grad"][None])
            new_e = jnp.where(accepted, e_prop, ctx["wt_e"])
            new_fit = jnp.where(accepted, fit_prop, ctx["wt_fit"])
            # NB: recorded history keeps reference semantics (pre-reset
            # energies carry, :141) — done below via rec_e/rec_fit
            rec_e = jnp.where(accepted, e_prop, e_cur)
            rec_fit = jnp.where(accepted, fit_prop, fit_cur)
        else:
            rec_e, rec_fit = new_e, new_fit

        best = base.update_best(best, rec_e, rec_fit, new_x)
        traj_row = new_x[0]

        if not cfg.paper_results:
            # hard constraint: chains that hit the budget restart from WT
            # (recorded energy/x stay pre-reset; reference :148-153); the
            # carried energy/fit/grad switch to the precomputed WT values
            over = (utils.mut_distance(new_x, wt) >= nmut)
            over3 = over.reshape(n, 1, 1)
            new_x = jnp.where(over3, wt[None], new_x)
            new_e = jnp.where(over, ctx["wt_e"], new_e)
            new_fit = jnp.where(over, ctx["wt_fit"], new_fit)
            new_grad = jnp.where(over3, ctx["wt_grad"][None], new_grad)

        ys = {"energy": rec_e, "fitness": rec_fit,
              "accepted": accepted, "traj": traj_row}
        return (new_x, (new_e, new_fit, new_grad), best), ys

    return step


def run(energy: Energy, initial_population: jnp.ndarray, num_steps: int,
        min_pos: int, max_pos: int, oracle=None, cfg: PPDEConfig | None = None,
        key: jax.Array | None = None, log_every: int = 50,
        quiet: bool = False,
        checkpoint_dir: str | None = None) -> base.SamplerResult:
    """Sampler contract parity with BaseSampler.run (base_sampler.py:7-15).

    oracle: optional (params, apply_fn) pair; apply_fn(params, x) -> [N].
    """
    cfg = cfg or PPDEConfig()
    key = key if key is not None else jax.random.PRNGKey(0)
    x0 = jnp.asarray(initial_population)
    n, L, V = x0.shape
    window_ok = utils.position_window_mask(L, V, min_pos, max_pos)

    ctx = {"energy": energy.params, "wt": x0[0], "init_x": x0}
    oracle_fn = None
    if oracle is not None:
        ctx["oracle"] = oracle[0]
        oracle_fn = lambda c, s: oracle[1](c["oracle"], s[0])

    e0, fit0, grad0 = jax.jit(energy.energy_and_grad)(ctx["energy"], x0)
    # precomputed wild-type constants for the carried-state resets
    ctx["wt_e"], ctx["wt_fit"], ctx["wt_grad"] = e0[0], fit0[0], grad0[0]
    best0 = (e0, fit0, x0)
    step = make_step(energy, cfg, window_ok, n, L, V)

    (final_x, _, best), rec = base.run_segmented(
        step_fn=step, ctx=ctx, init_state=(x0, (e0, fit0, grad0), best0),
        key=key, num_steps=num_steps, log_every=log_every,
        oracle_fn=oracle_fn, log_fn=base.default_log("PPDE"), quiet=quiet,
        checkpoint_dir=checkpoint_dir)

    return base.package_result(e0=e0, fit0=fit0, x0_traj_head=x0[0],
                               best=best, final_x=final_x, rec=rec)
