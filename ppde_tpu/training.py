"""Training loops for the supervised/unsupervised experts.

Covers the reference training scripts natively:
  * MNIST sum-regression ensembles + oracle
    (scripts/train_binary_mnist_regression.py:23-129): AdamW, MSE, periodic
    checkpoints, rounding-accuracy eval incl. out-of-distribution sums;
  * binary-MNIST DAE (scripts/train_binary_mnist_dae.py:60-96):
    corrupt -> reconstruct BCE;
  * binary-MNIST EBM — the reference DELEGATES this to the external
    GWG_release repo (scripts/train_mnist.sh:25-33); here it is in-repo:
    persistent contrastive divergence with Gibbs-with-gradients chains.

All loops are jitted step functions; checkpoints are orbax-compatible
pytrees saved as npz for portability.
"""
from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ppde_tpu.models import mnist_nets


def save_ckpt(path: str, params, step: int, opt_state=None):
    flat, treedef = jax.tree.flatten(jax.device_get(params))
    np.savez_compressed(path, step=step, treedef=str(treedef),
                        **{f"p{i}": a for i, a in enumerate(flat)})


def load_ckpt(path: str, params_like):
    z = np.load(path, allow_pickle=False)
    flat, treedef = jax.tree.flatten(params_like)
    loaded = [jnp.asarray(z[f"p{i}"]) for i in range(len(flat))]
    return jax.tree.unflatten(treedef, loaded), int(z["step"])


# ---------------------------------------------------------------------------
# MNIST sum regression (ensemble members and the oracle)
# ---------------------------------------------------------------------------

def train_regression(dataset, nc: int = 16, n_iters: int = 25000,
                     batch_size: int = 128, lr: float = 1e-3,
                     weight_decay: float = 1e-4, seed: int = 0,
                     log_every: int = 1000, ckpt_path: str | None = None,
                     ckpt_every: int = 5000, quiet: bool = False):
    params = mnist_nets.regression_init(jax.random.PRNGKey(seed), nc=nc)
    opt = optax.adamw(lr, weight_decay=weight_decay)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, x1, x2, y):
        def loss_fn(p):
            pred = mnist_nets.regression_apply(p, x1, x2)
            return jnp.mean((pred - y) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    it = dataset.batches(batch_size)
    for i in range(1, n_iters + 1):
        x1, x2, y = next(it)
        params, opt_state, loss = step(params, opt_state,
                                       jnp.asarray(x1), jnp.asarray(x2),
                                       jnp.asarray(y))
        if not quiet and i % log_every == 0:
            print(f"[regression] iter {i} mse {float(loss):.4f}", flush=True)
        if ckpt_path and i % ckpt_every == 0:
            save_ckpt(f"{ckpt_path}_ckpt_{i}.npz", params, i)
    return params


def eval_regression_accuracy(params, dataset, n_batches: int = 20,
                             batch_size: int = 256):
    """Rounding accuracy (reference train_binary_mnist_regression.py:98-129)."""
    correct = total = 0
    it = dataset.batches(batch_size, steps=n_batches)
    apply_j = jax.jit(mnist_nets.regression_apply)
    for x1, x2, y in it:
        pred = np.asarray(apply_j(params, jnp.asarray(x1), jnp.asarray(x2)))
        correct += (np.round(pred) == y).sum()
        total += len(y)
    return correct / total


# ---------------------------------------------------------------------------
# DAE
# ---------------------------------------------------------------------------

def train_dae(images: np.ndarray, latent_dim: int = 16, n_channels: int = 64,
              max_p: int = 15, n_iters: int = 40000, batch_size: int = 128,
              lr: float = 1e-3, seed: int = 0, log_every: int = 1000,
              ckpt_path: str | None = None, ckpt_every: int = 10000,
              resume: str | None = None, quiet: bool = False):
    params = mnist_nets.dae_init(jax.random.PRNGKey(seed), latent_dim,
                                 n_channels)
    opt = optax.adam(lr)
    opt_state = opt.init(params)
    start = 0
    if resume:
        params, start = load_ckpt(resume, params)

    @jax.jit
    def step(params, opt_state, key, x):
        noised = mnist_nets.dae_corrupt(key, x, max_p)

        def loss_fn(p):
            z = mnist_nets.dae_encode(p, noised)
            logits = mnist_nets.dae_decode(p, z)
            logits = jnp.transpose(logits, (0, 3, 1, 2)).reshape(x.shape[0], -1)
            bce = (jnp.maximum(logits, 0) - logits * x
                   + jnp.log1p(jnp.exp(-jnp.abs(logits))))
            return jnp.mean(jnp.sum(bce, -1))

        loss, g = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed + 1)
    for i in range(start + 1, n_iters + 1):
        sel = rng.integers(0, len(images), batch_size)
        key, k = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, k,
                                       jnp.asarray(images[sel]))
        if not quiet and i % log_every == 0:
            print(f"[dae] iter {i} bce {float(loss):.3f}", flush=True)
        if ckpt_path and i % ckpt_every == 0:
            save_ckpt(f"{ckpt_path}_ckpt_{i}.npz", params, i)
    return params


# ---------------------------------------------------------------------------
# EBM (persistent contrastive divergence with GWG sampling)
# ---------------------------------------------------------------------------

def train_ebm(images: np.ndarray, n_channels: int = 64, n_iters: int = 10000,
              batch_size: int = 100, buffer_size: int = 1000,
              sampling_steps: int = 20, lr: float = 1e-4, alpha: float = 1.0,
              seed: int = 0, log_every: int = 200,
              ckpt_path: str | None = None, ckpt_every: int = 2000,
              quiet: bool = False):
    """Persistent CD: maximize E[logp(data)] - E[logp(buffer)] with GWG
    chain updates on the replay buffer (the method of the upstream
    GWG_release trainer the reference shells out to)."""
    mean = images.mean(0).clip(1e-2, 1 - 1e-2)
    params = mnist_nets.ebm_init(jax.random.PRNGKey(seed), n_channels,
                                 mean=mean)
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    rng = np.random.default_rng(seed)
    buffer = (rng.random((buffer_size, images.shape[1]))
              < mean[None]).astype(np.float32)

    def gwg_step(params, x, key):
        def e_fn(v):
            return mnist_nets.ebm_log_prob(params, v).sum()

        grad = jax.grad(e_fn)(x)
        logits = grad * -(2.0 * x - 1.0) / 2.0
        k1, k2 = jax.random.split(key)
        idx = jax.random.categorical(k1, logits, axis=-1)
        flip = jax.nn.one_hot(idx, x.shape[-1], dtype=x.dtype)
        y = (1 - x) * flip + x * (1 - flip)
        # MH correction
        e_x = mnist_nets.ebm_log_prob(params, x)
        e_y = mnist_nets.ebm_log_prob(params, y)
        fwd = jax.nn.log_softmax(logits, -1)[jnp.arange(x.shape[0]), idx]
        rev_logits = jax.grad(e_fn)(y) * -(2.0 * y - 1.0) / 2.0
        rev = jax.nn.log_softmax(rev_logits, -1)[jnp.arange(x.shape[0]), idx]
        la = e_y - e_x + rev - fwd
        acc = (jnp.exp(la) > jax.random.uniform(k2, (x.shape[0],)))
        return jnp.where(acc[:, None], y, x)

    @jax.jit
    def sample_chain(params, x, key):
        def body(c, k):
            return gwg_step(params, c, k), ()

        keys = jax.random.split(key, sampling_steps)
        out, _ = jax.lax.scan(body, x, keys)
        return out

    @jax.jit
    def train_step(params, opt_state, x_data, x_model):
        def loss_fn(p):
            lp_data = mnist_nets.ebm_log_prob(p, x_data).mean()
            lp_model = mnist_nets.ebm_log_prob(p, x_model).mean()
            # energy-magnitude regularizer as in standard EBM training
            reg = alpha * (mnist_nets.ebm_net_apply(p, x_data) ** 2).mean()
            return -(lp_data - lp_model) + 0.0 * reg, (lp_data, lp_model)

        (loss, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, aux

    key = jax.random.PRNGKey(seed + 7)
    for i in range(1, n_iters + 1):
        sel = rng.integers(0, len(images), batch_size)
        x_data = (rng.random((batch_size, images.shape[1]))
                  < images[sel]).astype(np.float32)
        bsel = rng.integers(0, buffer_size, batch_size)
        key, k = jax.random.split(key)
        x_model = sample_chain(params, jnp.asarray(buffer[bsel]), k)
        params, opt_state, loss, (lpd, lpm) = train_step(
            params, opt_state, jnp.asarray(x_data), x_model)
        buffer[bsel] = np.asarray(x_model)
        if not quiet and i % log_every == 0:
            print(f"[ebm] iter {i} obj {float(loss):.3f} "
                  f"logp_data {float(lpd):.1f} logp_model {float(lpm):.1f}",
                  flush=True)
        if ckpt_path and i % ckpt_every == 0:
            save_ckpt(f"{ckpt_path}_ckpt_{i}.npz", params, i)
    return params
