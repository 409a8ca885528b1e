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
  * per-chain best tracking is a running carry, not a host-side history;
  * ONE fused energy+grad per step instead of the reference's two
    (:79,:119): the current state's (e, fit, grad) is carried — it equals
    the accepted endpoint's values, the previous carry on rejection, or the
    precomputed wild-type constants after an nmut reset. Energies are
    deterministic, so this is EXACT, not an approximation.

FACTORED PROPOSALS (the HBM win). Because states are one-hot, the Taylor
proposal logits have rank-1 structure over the path:
    score_t[l, v] = (grad[l, v] - grad[l, tok_t[l]]) / temp,
where tok_t is the token sequence at inner step t. The joint softmax over
[L, V] therefore factorizes into a position marginal with log-weights
    lw_t[l] = logsumexp_v(masked grad[l, :] / temp) - grad[l, tok_t[l]] / temp
and a value conditional softmax(grad[l, :] / temp) that is CONSTANT along
the path. The reference (and our previous implementation) materializes the
full [N, L*V] logits + Gumbel noise per inner step and a
[max_u, N, L*V] reverse-logits tensor (protein ppde.py:79-132); here each
inner step touches only [N, L]/[N, V] tensors plus O(N) gathers, and the
reverse path reduces to logZ updates with ONE changed position per step:
the gathered reverse logit is identically 0 (proposing idx_t from x_{t+1}
re-sets the position to the value it already has), so
    rev_logp_t = -logsumexp_l( lsY[l] - grad_y[l, tok_{t+1}[l]] / 2 ),
with lsY[l] = logsumexp_v(grad_y[l, :] / 2) computed once. Per outer step
the [N, L, V] tensors are touched a constant number of times (energy+grad,
two per-position logsumexps, one one-hot scatter) instead of
O(max_u) times. Distribution-exact: tests/test_ppde_protein.py checks the
factored log-probs/logZ against the dense masked-softmax spec.
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
    # The reference evaluates the reverse-path log-probs at the FORWARD
    # indices (p_t, new_v_t) — whose gathered logit from x_{t+1} is
    # identically 0 — instead of the true reverse moves (p_t, old_v_t)
    # (protein_samplers/ppde.py:126-132). That index pairing is not a valid
    # MH involution and biases the chain toward high energies (measured:
    # mean energy off by ~0.45 exact-std on an enumerable 256-state
    # Boltzmann target; tests/test_ppde_protein.py gold test). Default
    # False = correct reverse; True reproduces the reference's estimator.
    # NB: matching the reference, the reverse kernel stays UNMASKED and at
    # temp 2.0 — exact detailed balance additionally requires masks inert
    # along the path (no nmut crossing, full window) and temp == 2.0,
    # which is what the gold test verifies; with the hard nmut budget
    # active, even the corrected reverse remains approximate at the budget
    # boundary (as in the reference).
    reference_reverse: bool = False


def make_step(energy: Energy, cfg: PPDEConfig, window_ok: jnp.ndarray,
              n: int, L: int, V: int, tempered: bool = False):
    """Build the jittable outer-step function (ctx, state, key) -> ...

    ctx must hold: 'energy' (params pytree), 'wt' [L,V], 'init_x' [N,L,V].
    tempered: ctx additionally holds per-chain inverse temperatures
    'beta' [N]; the chain then targets the tempered density
    pi_i(x) ~ exp(beta_i * E(x)) — the proposal uses grad(beta*E)
    = beta*grad and the MH ratio uses beta*dE. beta == 1 reduces exactly
    to the untempered step. Used by the parallel-tempering wrapper
    (samplers/protein/pt.py); the carried grad stays the RAW dE/dx so
    states can swap between temperature levels without rescaling.
    """
    max_u = max(2 * cfg.pas_length - 1, 1)
    nmut = cfg.nmut_threshold if cfg.nmut_threshold > 0 else np.iinfo(np.int32).max

    def step(ctx, state, key):
        cur_x, (e_cur, fit_cur, grad_x), best = state
        wt = ctx["wt"]
        beta3 = ctx["beta"][:, None, None] if tempered else None
        # TPU note: NO scatters and NO per-row gathers anywhere below —
        # every indexed read/write is a one-hot compare + select/reduce
        # (XLA lowers scatter/gather on TPU to serialized loops; a first
        # cut using .at[].set / take_along_axis ran 2x SLOWER than the
        # dense [N, L*V] formulation it replaced)
        wt_tok = jnp.argmax(wt, axis=-1).astype(jnp.int32)          # [L]
        wt_in_win = jnp.sum(window_ok * wt, axis=-1) > 0            # [L]
        k_u, k_inner, k_acc = jax.random.split(key, 3)

        # per-chain path length, static scan bound (reference :67-70)
        U = jax.random.randint(k_u, (n,), 1, 2 * cfg.pas_length)
        u_mask = (jnp.arange(max_u)[:, None] < U[None, :])          # [max_u,N]

        # ---- forward path over token sequences (factored proposals) ----
        gx = grad_x.astype(jnp.float32)
        if tempered:
            gx = gx * beta3
        gx = gx / cfg.temp                                          # [N,L,V]
        v_logits = jnp.where(window_ok[None], gx, utils.NEG_INF)
        lA = jax.nn.logsumexp(v_logits, axis=-1)                    # [N,L]
        g_wt = jnp.sum(gx * wt[None], axis=-1)                      # [N,L]
        tok0 = jnp.argmax(cur_x, axis=-1).astype(jnp.int32)         # [N,L]
        g_tok0 = jnp.sum(gx * cur_x, axis=-1)                       # [N,L]
        dist0 = jnp.sum((tok0 != wt_tok[None]).astype(jnp.int32), axis=-1)
        iota_l = jnp.arange(L, dtype=jnp.int32)
        iota_v = jnp.arange(V, dtype=jnp.int32)

        def inner(carry, key_and_t):
            tok, g_tok, dist = carry
            k, t_idx = key_and_t
            k1, k2 = jax.random.split(k)
            live = t_idx < U                                        # [N]
            over = dist >= nmut
            # position log-weights; over-budget chains may only revert
            # in-window mutated positions to WT (reference :86-104 masks)
            mut = tok != wt_tok[None]
            lw = jnp.where(
                over[:, None],
                jnp.where(mut & wt_in_win[None], g_wt - g_tok,
                          utils.NEG_INF),
                lA - g_tok)                                         # [N,L]
            l_idx = jax.random.categorical(k1, lw)                  # [N]
            pos_oh = iota_l[None] == l_idx[:, None]                 # [N,L]
            vl = jnp.sum(jnp.where(pos_oh[:, :, None], v_logits, 0.0),
                         axis=1)                                    # [N,V]
            v_free = jax.random.categorical(k2, vl).astype(jnp.int32)
            wt_at_l = jnp.sum(jnp.where(pos_oh, wt_tok[None], 0), axis=-1)
            v_idx = jnp.where(over, wt_at_l, v_free)
            v_oh = iota_v[None] == v_idx[:, None]                   # [N,V]
            lp_pos = (jnp.sum(jnp.where(pos_oh, lw, 0.0), axis=-1)
                      - jax.nn.logsumexp(lw, axis=-1))
            lp_val = jnp.where(
                over, 0.0,
                jnp.sum(jnp.where(v_oh, vl, 0.0), axis=-1)
                - jax.nn.logsumexp(vl, axis=-1))
            fwd_logp = lp_pos + lp_val

            # v_logits == gx at every reachable (l, v): sampled v is always
            # in-window, and over-budget reverts are window-checked above
            g_new = jnp.sum(jnp.where(v_oh, vl, 0.0), axis=-1)      # [N]
            old_v = jnp.sum(jnp.where(pos_oh, tok, 0), axis=-1)
            o_oh = iota_v[None] == old_v[:, None]                   # [N,V]
            upd = pos_oh & live[:, None]
            tok = jnp.where(upd, v_idx[:, None], tok)
            g_tok = jnp.where(upd, g_new[:, None], g_tok)
            dist = dist + jnp.where(
                live,
                (v_idx != wt_at_l).astype(jnp.int32)
                - (old_v != wt_at_l).astype(jnp.int32), 0)
            return (tok, g_tok, dist), (pos_oh, v_oh, o_oh, fwd_logp)

        inner_keys = jax.random.split(k_inner, max_u)
        (tok_y, _, dist_y), (pos_ohs, v_ohs, o_ohs, fwd_logps) = jax.lax.scan(
            inner, (tok0, g_tok0, dist0),
            (inner_keys, jnp.arange(max_u)))

        y = jax.nn.one_hot(tok_y, V, dtype=cur_x.dtype)
        e_prop, fit_prop, grad_y = energy.energy_and_grad(ctx["energy"], y)

        # ---- reverse path: log q(reverse move | x_{t+1}) under the
        # grad_y-anchored temp-2 proposal (reference :126-132). The true
        # reverse move from x_{t+1} re-sets position p_t to the OLD value
        # o_t, so its logit is gy[p_t, o_t] - gy[p_t, v_t]; the reference
        # instead gathers the FORWARD index (p_t, v_t), whose logit is
        # identically 0 (cfg.reference_reverse — biased, see PPDEConfig).
        # logZ(x_{t+1}) updates one position per step either way.
        gy = grad_y.astype(jnp.float32)
        if tempered:
            gy = gy * beta3
        gy = gy / 2.0
        lsY = jax.nn.logsumexp(gy, axis=-1)                         # [N,L]
        gy_tok0 = jnp.sum(gy * cur_x, axis=-1)                      # [N,L]
        # gy rows at each step's position: contract the position one-hots
        # with gy (batched matvec — no [max_u, N, L, V] broadcast
        # materializes), then select the value columns
        rows_uv = jnp.einsum("unl,nlv->unv", pos_ohs.astype(gy.dtype), gy)
        gy_steps = jnp.sum(rows_uv * v_ohs, axis=-1)                # [max_u,N]
        if cfg.reference_reverse:
            rev_picked = jnp.zeros_like(gy_steps)
        else:
            rev_picked = jnp.sum(rows_uv * o_ohs, axis=-1) - gy_steps

        def rev_body(gy_tok, inp):
            pos_oh, gy_new, live = inp
            gy_tok = jnp.where(pos_oh & live[:, None], gy_new[:, None],
                               gy_tok)
            return gy_tok, -jax.nn.logsumexp(lsY - gy_tok, axis=-1)

        _, neg_logZ = jax.lax.scan(rev_body, gy_tok0,
                                   (pos_ohs, gy_steps, u_mask))
        rev_logps = rev_picked + neg_logZ
        log_ratio = jnp.sum(u_mask * (rev_logps - fwd_logps), axis=0)

        d_e = e_prop - e_cur
        if tempered:
            d_e = d_e * ctx["beta"]
        log_acc = d_e + log_ratio
        accepted = (jnp.exp(log_acc) >= jax.random.uniform(k_acc, (n,)))
        fallback = ctx["init_x"] if cfg.paper_results else cur_x
        acc3 = accepted.reshape(n, 1, 1)
        new_x = jnp.where(acc3, y, fallback)
        new_e = jnp.where(accepted, e_prop, e_cur)
        new_fit = jnp.where(accepted, fit_prop, fit_cur)
        new_grad = jnp.where(acc3, grad_y, grad_x)
        if cfg.paper_results:
            # rejection resets to the PER-CHAIN initial state in legacy mode
            # (reference :148-153 resets to initial_population); carry the
            # matching per-chain init constants so the carried (e, fit, grad)
            # always agrees with the actual chain state even when the initial
            # population is heterogeneous
            new_grad = jnp.where(acc3, grad_y, ctx["init_grad"])
            new_e = jnp.where(accepted, e_prop, ctx["init_e"])
            new_fit = jnp.where(accepted, fit_prop, ctx["init_fit"])
            # NB: recorded history keeps reference semantics (pre-reset
            # energies carry, :141) — done below via rec_e/rec_fit
            rec_e = jnp.where(accepted, e_prop, e_cur)
            rec_fit = jnp.where(accepted, fit_prop, fit_cur)
        else:
            rec_e, rec_fit = new_e, new_fit

        best = base.update_best(best, rec_e, rec_fit, new_x)
        # chain-0 trajectory as int8 tokens: 20x thinner per-segment host
        # transfer (package_result reconstructs the one-hot)
        traj_row = jnp.argmax(new_x[0], axis=-1).astype(jnp.int8)

        if not cfg.paper_results:
            # hard constraint: chains that hit the budget restart from WT
            # (recorded energy/x stay pre-reset; reference :148-153); the
            # carried energy/fit/grad switch to the precomputed WT values.
            # distances are carried token counts — no [N,L,V] pass needed
            over = (jnp.where(accepted, dist_y, dist0) >= nmut)
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
    # precomputed wild-type constants for the carried-state nmut resets
    ctx["wt_e"], ctx["wt_fit"], ctx["wt_grad"] = e0[0], fit0[0], grad0[0]
    if cfg.paper_results:
        # per-chain init constants for the legacy rejection fallback
        ctx["init_e"], ctx["init_fit"], ctx["init_grad"] = e0, fit0, grad0
    best0 = (e0, fit0, x0)
    step = make_step(energy, cfg, window_ok, n, L, V)

    (final_x, _, best), rec = base.run_segmented(
        step_fn=step, ctx=ctx, init_state=(x0, (e0, fit0, grad0), best0),
        key=key, num_steps=num_steps, log_every=log_every,
        oracle_fn=oracle_fn, log_fn=base.default_log("PPDE"), quiet=quiet,
        checkpoint_dir=checkpoint_dir)

    return base.package_result(e0=e0, fit0=fit0, x0_traj_head=x0[0],
                               traj_tokens=True,
                               best=best, final_x=final_x, rec=rec)
