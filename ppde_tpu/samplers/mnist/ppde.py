"""PPDE sampler for binary MNIST: Gibbs-With-Gradients / Path-Auxiliary.

Parity with the reference PPDE (mnist_samplers/ppde.py:10-173): Taylor
first-order flip-score proposal grad * (-(2x-1)) / 2, pixel-flip
OneHotCategorical over 784 positions; two modes —
  * pas_length > 0: PAS path of U ~ U[1, 2*pas_len) gated intermediate flips
    (first flip always applied, :84-88) with reverse-path log-ratio;
  * pas_length == 0: multi-sample GWG with n_samples ~ U[1, 2*gwg_samples)
    flips applied as a union (:79-88,125-137).
MH accept per chain with strict '>' (:141, vs protein's '>=').

TPU-first: the per-step variable n_samples / path length become static
maxima with masking; the whole step is scanned (no host syncs).

NB: unlike the protein domain, evaluating the reverse path at the FORWARD
indices is CORRECT here — a bit-flip is its own inverse, so the reverse
move from x_{t+1} back to x_t is the same index idx_t. (The protein
substitution move "write value v at position p" is not self-inverse, which
is where the reference's reverse-path bias comes from — see
protein/ppde.PPDEConfig.reference_reverse.)
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
class MNISTPPDEConfig:
    pas_length: int = 10
    gwg_samples: int = 1
    temp: float = 2.0


def _flip_scores(x, grad):
    """Flip score (approximate energy change) per pixel: grad * -(2x-1)."""
    return grad * -(2.0 * x - 1.0)


def _make_step_pas(energy: Energy, cfg: MNISTPPDEConfig, n: int, D: int,
                   tempered: bool = False):
    """tempered: ctx additionally holds per-chain inverse temperatures
    'beta' [n]; the chain targets pi_i(x) ~ exp(beta_i * E(x)) — proposals
    use beta*grad (flip scores are linear in grad, so pre-scaling the grad
    fed to the path scan is exact) and the MH ratio uses beta*dE. beta == 1
    reduces exactly to the untempered step; the carried grad stays RAW
    dE/dx so states swap between temperature levels without rescaling
    (samplers/mnist/pt.py)."""
    max_u = max(2 * cfg.pas_length - 1, 1)

    def inner(carry, key_and_t):
        x, grad, U = carry
        key, t = key_and_t
        logits = _flip_scores(x, grad) / cfg.temp
        idx, logp = utils.categorical_onehot(key, logits)
        flip = jax.nn.one_hot(idx, D, dtype=x.dtype)
        x_new = utils.flip_bits(x, flip)
        # first flip (t==0) is always applied; later flips gated by t < U
        live = ((t == 0) | (t < U)).reshape(n, 1).astype(x.dtype)
        x_next = live * x_new + (1 - live) * x
        return (x_next, grad, U), (idx, logp, x_next)

    def step(ctx, state, key):
        x2, (e_cur, fit_cur, grad), best = state
        x1 = ctx["x1"]
        beta2 = ctx["beta"][:, None] if tempered else None
        k_u, k_inner, k_acc = jax.random.split(key, 3)
        U = jax.random.randint(k_u, (n,), 1, 2 * cfg.pas_length)
        u_mask = (jnp.arange(max_u)[None, :] < U[:, None]).astype(jnp.float32)
        u_mask = u_mask.at[:, 0].set(1.0)  # first flip ungated

        keys = jax.random.split(k_inner, max_u)
        g_fwd = grad * beta2 if tempered else grad
        (y, _, _), (idxs, fwd_logps, traj) = jax.lax.scan(
            inner, (x2, g_fwd, U), (keys, jnp.arange(max_u)))

        e_prop, fit_prop, grad_y = energy.energy_and_grad(ctx["energy"], y, x1)
        g_rev = grad_y * beta2 if tempered else grad_y
        rev_logits = _flip_scores(traj, g_rev[None]) / cfg.temp
        rev_logps = jax.vmap(utils.categorical_log_prob)(rev_logits, idxs)
        log_ratio = jnp.sum(u_mask.T * (rev_logps - fwd_logps), axis=0)

        d_e = e_prop - e_cur
        if tempered:
            d_e = d_e * ctx["beta"]
        la = d_e + log_ratio
        accepted = jnp.exp(la) > jax.random.uniform(k_acc, (n,))
        acc2 = accepted.reshape(n, 1)
        new_x2 = jnp.where(acc2, y, x2)
        new_e = jnp.where(accepted, e_prop, e_cur)
        new_fit = jnp.where(accepted, fit_prop, fit_cur)
        new_grad = jnp.where(acc2, grad_y, grad)

        best = base.update_best(best, new_e, new_fit, new_x2)
        ys = {"energy": new_e, "fitness": new_fit, "accepted": accepted,
              "traj": new_x2[0].astype(jnp.uint8)}
        return (new_x2, (new_e, new_fit, new_grad), best), ys

    return step


def _make_step_gwg(energy: Energy, cfg: MNISTPPDEConfig, n: int, D: int,
                   tempered: bool = False):
    """tempered: see _make_step_pas — same beta semantics."""
    max_s = max(2 * cfg.gwg_samples - 1, 1)

    def step(ctx, state, key):
        x2, (e_cur, fit_cur, grad), best = state
        x1 = ctx["x1"]
        beta2 = ctx["beta"][:, None] if tempered else None
        k_n, k_s, k_acc = jax.random.split(key, 3)
        n_samples = jax.random.randint(k_n, (), 1, 2 * cfg.gwg_samples)

        g_fwd = grad * beta2 if tempered else grad
        fwd_logits = _flip_scores(x2, g_fwd) / cfg.temp
        idxs = jax.random.categorical(k_s, fwd_logits, axis=-1,
                                      shape=(max_s, n))
        live = (jnp.arange(max_s) < n_samples).astype(x2.dtype)  # [max_s]
        onehots = jax.nn.one_hot(idxs, D, dtype=x2.dtype)  # [max_s, n, D]
        changes = (jnp.einsum("s,snd->nd", live, onehots) > 0).astype(x2.dtype)
        y = utils.flip_bits(x2, changes)

        e_prop, fit_prop, grad_y = energy.energy_and_grad(ctx["energy"], y, x1)
        g_rev = grad_y * beta2 if tempered else grad_y
        rev_logits = _flip_scores(y, g_rev) / cfg.temp
        fwd_lp = jax.vmap(utils.categorical_log_prob, in_axes=(None, 0))(
            fwd_logits, idxs)  # [max_s, n]
        rev_lp = jax.vmap(utils.categorical_log_prob, in_axes=(None, 0))(
            rev_logits, idxs)
        log_ratio = jnp.sum(live[:, None] * (rev_lp - fwd_lp), axis=0)

        d_e = e_prop - e_cur
        if tempered:
            d_e = d_e * ctx["beta"]
        la = d_e + log_ratio
        accepted = jnp.exp(la) > jax.random.uniform(k_acc, (n,))
        acc2 = accepted.reshape(n, 1)
        new_x2 = jnp.where(acc2, y, x2)
        new_e = jnp.where(accepted, e_prop, e_cur)
        new_fit = jnp.where(accepted, fit_prop, fit_cur)
        new_grad = jnp.where(acc2, grad_y, grad)

        best = base.update_best(best, new_e, new_fit, new_x2)
        ys = {"energy": new_e, "fitness": new_fit, "accepted": accepted,
              "traj": new_x2[0].astype(jnp.uint8)}
        return (new_x2, (new_e, new_fit, new_grad), best), ys

    return step


def run(energy: Energy, initial_population: jnp.ndarray, num_steps: int,
        min_pos: int = 0, max_pos: int = 784, oracle=None,
        cfg: MNISTPPDEConfig | None = None, key: jax.Array | None = None,
        log_every: int = 50, quiet: bool = False,
        checkpoint_dir: str | None = None) -> base.SamplerResult:
    cfg = cfg or MNISTPPDEConfig()
    key = key if key is not None else jax.random.PRNGKey(0)
    pop = jnp.asarray(initial_population)
    n, D = pop.shape[0], pop.shape[1] // 2
    x1, x2 = pop[:, :D], pop[:, D:]

    ctx = {"energy": energy.params, "x1": x1}
    oracle_fn = None
    if oracle is not None:
        ctx["oracle"] = oracle[0]
        oracle_fn = lambda c, s: oracle[1](c["oracle"], s[0], c["x1"])

    e0, fit0, grad0 = jax.jit(energy.energy_and_grad)(ctx["energy"], x2, x1)
    best0 = (e0, fit0, x2)
    make = _make_step_pas if cfg.pas_length > 0 else _make_step_gwg
    step = make(energy, cfg, n, D)

    (final_x2, _, best), rec = base.run_segmented(
        step_fn=step, ctx=ctx, init_state=(x2, (e0, fit0, grad0), best0),
        key=key,
        num_steps=num_steps, log_every=log_every, oracle_fn=oracle_fn,
        log_fn=base.default_log("PPDE"), quiet=quiet,
        checkpoint_dir=checkpoint_dir)

    return base.package_result(e0=e0, fit0=fit0, x0_traj_head=x2[0],
                               best=best, final_x=final_x2, rec=rec)
