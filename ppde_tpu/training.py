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

TPU-first structure: datasets live ON DEVICE; batches are drawn with
jax.random indices inside a jitted lax.scan of ``chunk`` steps, so the host
touches the device only once per chunk (the reference's per-step DataLoader
round-trips would be ~0.3s/step through this environment's device tunnel).
Checkpoints are flattened-pytree npz files.
"""
from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ppde_tpu.models import mnist_nets


def save_ckpt(path: str, params, step: int):
    flat, treedef = jax.tree.flatten(jax.device_get(params))
    np.savez_compressed(path, step=step, treedef=str(treedef),
                        **{f"p{i}": a for i, a in enumerate(flat)})


def load_ckpt(path: str, params_like):
    z = np.load(path, allow_pickle=False)
    flat, treedef = jax.tree.flatten(params_like)
    loaded = [jnp.asarray(z[f"p{i}"]) for i in range(len(flat))]
    return jax.tree.unflatten(treedef, loaded), int(z["step"])


def _chunked(n_iters: int, chunk: int, *cadences: int):
    """Yield (done, size) chunks, clamped so every log/checkpoint cadence
    boundary lands exactly on a chunk boundary."""
    for c in cadences:
        if c > 0:
            chunk = min(chunk, c)
    done = 0
    while done < n_iters:
        size = min(chunk, n_iters - done)
        yield done, size
        done += size


# ---------------------------------------------------------------------------
# MNIST sum regression (ensemble members and the oracle)
# ---------------------------------------------------------------------------

def train_regression(dataset, nc: int = 16, n_iters: int = 25000,
                     batch_size: int = 128, lr: float = 1e-3,
                     weight_decay: float = 1e-4, seed: int = 0,
                     log_every: int = 1000, ckpt_path: str | None = None,
                     ckpt_every: int = 5000, quiet: bool = False,
                     chunk: int = 250):
    """dataset: MNISTSumPairs — its images/labels/pairs go on device; the
    dynamic binarization, pixel-flip noise and label noise (reference
    data/mnist.py:56-83) are re-drawn per step with jax.random."""
    params = mnist_nets.regression_init(jax.random.PRNGKey(seed), nc=nc)
    opt = optax.adamw(lr, weight_decay=weight_decay)
    opt_state = opt.init(params)

    images = jnp.asarray(dataset.images)          # [M, 784] intensities
    labels = jnp.asarray(dataset.labels, jnp.float32)
    pairs = jnp.asarray(dataset.pairs)            # [P, 2]
    train_noise = dataset.train_noise

    def one_step(carry, key):
        params, opt_state = carry
        k_sel, k_b1, k_b2, k_noise, k_flip, k_lab, k_sign = \
            jax.random.split(key, 7)
        sel = jax.random.randint(k_sel, (batch_size,), 0, pairs.shape[0])
        a, b = pairs[sel, 0], pairs[sel, 1]
        x1 = (jax.random.uniform(k_b1, (batch_size, images.shape[1]))
              < images[a]).astype(jnp.float32)
        x2 = (jax.random.uniform(k_b2, (batch_size, images.shape[1]))
              < images[b]).astype(jnp.float32)
        y = labels[a] + labels[b]
        if train_noise:
            p = jax.random.uniform(k_noise) * 0.05
            flip = jax.random.bernoulli(k_flip, p, x1.shape)
            x1 = jnp.where(flip, 1.0 - x1, x1)
            x2 = jnp.where(flip, 1.0 - x2, x2)
            noisy = jax.random.bernoulli(k_lab, 0.2, y.shape)
            sign = jnp.where(jax.random.bernoulli(k_sign, 0.5, y.shape),
                             1.0, -1.0)
            y = y + noisy * sign

        def loss_fn(p_):
            pred = mnist_nets.regression_apply(p_, x1, x2)
            return jnp.mean((pred - y) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(g, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state), loss

    @jax.jit
    def run_chunk(params, opt_state, key, length_keys):
        (params, opt_state), losses = jax.lax.scan(
            one_step, (params, opt_state), length_keys)
        return params, opt_state, losses.mean()

    key = jax.random.PRNGKey(seed + 1)
    for done, size in _chunked(n_iters, chunk, log_every, ckpt_every):
        key, k = jax.random.split(key)
        params, opt_state, loss = run_chunk(params, opt_state, k,
                                            jax.random.split(k, size))
        step = done + size
        if not quiet and (step % log_every == 0 or step == n_iters):
            print(f"[regression] iter {step} mse {float(loss):.4f}",
                  flush=True)
        if ckpt_path and step % ckpt_every == 0:
            save_ckpt(f"{ckpt_path}_ckpt_{step}.npz", params, step)
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
              resume: str | None = None, quiet: bool = False,
              chunk: int = 250):
    params = mnist_nets.dae_init(jax.random.PRNGKey(seed), latent_dim,
                                 n_channels)
    opt = optax.adam(lr)
    opt_state = opt.init(params)
    start = 0
    if resume:
        params, start = load_ckpt(resume, params)

    data = jnp.asarray(images)

    def one_step(carry, key):
        params, opt_state = carry
        k_sel, k_corrupt = jax.random.split(key)
        sel = jax.random.randint(k_sel, (batch_size,), 0, data.shape[0])
        x = data[sel]
        noised = mnist_nets.dae_corrupt(k_corrupt, x, max_p)

        def loss_fn(p_):
            z = mnist_nets.dae_encode(p_, noised)
            logits = mnist_nets.dae_decode(p_, z)
            logits = jnp.transpose(logits, (0, 3, 1, 2)).reshape(
                x.shape[0], -1)
            bce = (jnp.maximum(logits, 0) - logits * x
                   + jnp.log1p(jnp.exp(-jnp.abs(logits))))
            return jnp.mean(jnp.sum(bce, -1))

        loss, g = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(g, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state), loss

    @jax.jit
    def run_chunk(params, opt_state, keys):
        (params, opt_state), losses = jax.lax.scan(
            one_step, (params, opt_state), keys)
        return params, opt_state, losses.mean()

    key = jax.random.PRNGKey(seed + 1)
    for done, size in _chunked(n_iters - start, chunk, log_every,
                               ckpt_every):
        key, k = jax.random.split(key)
        params, opt_state, loss = run_chunk(params, opt_state,
                                            jax.random.split(k, size))
        step = start + done + size
        if not quiet and (step % log_every == 0 or step == n_iters):
            print(f"[dae] iter {step} bce {float(loss):.3f}", flush=True)
        if ckpt_path and step % ckpt_every == 0:
            save_ckpt(f"{ckpt_path}_ckpt_{step}.npz", params, step)
    return params


# ---------------------------------------------------------------------------
# EBM (persistent contrastive divergence with GWG sampling)
# ---------------------------------------------------------------------------

def gwg_flip_step(params, x, key, log_prob_fn=None):
    """One Gibbs-with-gradients bit-flip MH step on binary states [B, D]
    (Grathwohl et al.; the move kernel of the trainer the reference shells
    out to, scripts/train_mnist.sh:25-33)."""
    if log_prob_fn is None:
        log_prob_fn = mnist_nets.ebm_log_prob

    def e_fn(v):
        return log_prob_fn(params, v).sum()

    grad = jax.grad(e_fn)(x)
    logits = grad * -(2.0 * x - 1.0) / 2.0
    k1, k2 = jax.random.split(key)
    idx = jax.random.categorical(k1, logits, axis=-1)
    flip = jax.nn.one_hot(idx, x.shape[-1], dtype=x.dtype)
    y = (1 - x) * flip + x * (1 - flip)
    e_x = log_prob_fn(params, x)
    e_y = log_prob_fn(params, y)
    fwd = jax.nn.log_softmax(logits, -1)[jnp.arange(x.shape[0]), idx]
    rev_logits = jax.grad(e_fn)(y) * -(2.0 * y - 1.0) / 2.0
    rev = jax.nn.log_softmax(rev_logits, -1)[jnp.arange(x.shape[0]), idx]
    la = e_y - e_x + rev - fwd
    acc = (jnp.exp(la) > jax.random.uniform(k2, (x.shape[0],)))
    return jnp.where(acc[:, None], y, x)


def train_ebm(images: np.ndarray, n_channels: int = 64, n_iters: int = 10000,
              batch_size: int = 100, buffer_size: int = 1000,
              sampling_steps: int = 20, lr: float = 1e-4,
              p_control: float = 1e-2, seed: int = 0, log_every: int = 200,
              ckpt_path: str | None = None, ckpt_every: int = 2000,
              quiet: bool = False, chunk: int = 50,
              reinit_p: float = 0.05, data_noise_p: float = 0.01):
    """Persistent CD: maximize E[logp(data)] - E[logp(buffer)] with GWG
    chain updates on an on-device replay buffer (the method of the upstream
    GWG_release trainer the reference shells out to). ``p_control``
    penalizes the squared energy-net outputs — without it the CD objective
    drives the energies unboundedly apart. ``reinit_p`` restarts that
    fraction of each iteration's buffer chains from the Bernoulli base —
    without it, persistent chains fall behind a sharpening landscape (the
    stale model term then diverges: observed on the low-diversity augmented
    real-MNIST corpus, NaN by iter ~600). ``data_noise_p`` flips that
    fraction of data pixels per batch (the reference's own MNIST training
    noise, data/mnist.py:56-83) — it lower-bounds the entropy of the target
    distribution, so the CD gap cannot sharpen without bound on a
    low-diversity corpus."""
    mean = images.mean(0).clip(1e-2, 1 - 1e-2)
    params = mnist_nets.ebm_init(jax.random.PRNGKey(seed), n_channels,
                                 mean=mean)
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(lr))
    opt_state = opt.init(params)

    data = jnp.asarray(images)
    rng = np.random.default_rng(seed)
    buffer0 = jnp.asarray(
        (rng.random((buffer_size, images.shape[1]))
         < np.asarray(mean)[None]).astype(np.float32))

    mean_j = jnp.asarray(np.asarray(mean), jnp.float32)

    def one_step(carry, key):
        params, opt_state, buffer = carry
        (k_data, k_bin, k_buf, k_chain,
         k_re, k_re_bin, k_noise) = jax.random.split(key, 7)
        sel = jax.random.randint(k_data, (batch_size,), 0, data.shape[0])
        x_data = (jax.random.uniform(k_bin, (batch_size, data.shape[1]))
                  < data[sel]).astype(jnp.float32)
        if data_noise_p > 0:
            flip = (jax.random.uniform(k_noise, x_data.shape)
                    < data_noise_p).astype(jnp.float32)
            x_data = x_data * (1 - flip) + (1 - x_data) * flip
        bsel = jax.random.randint(k_buf, (batch_size,), 0, buffer.shape[0])
        x0 = buffer[bsel]
        # restart a fraction of chains from the Bernoulli base each step
        re = jax.random.uniform(k_re, (batch_size, 1)) < reinit_p
        fresh = (jax.random.uniform(k_re_bin, x0.shape)
                 < mean_j[None]).astype(jnp.float32)
        x0 = jnp.where(re, fresh, x0)

        def chain_body(x, k):
            return gwg_flip_step(params, x, k), ()

        x_model, _ = jax.lax.scan(chain_body, x0,
                                  jax.random.split(k_chain, sampling_steps))

        def loss_fn(p_):
            lp_data = mnist_nets.ebm_log_prob(p_, x_data).mean()
            lp_model = mnist_nets.ebm_log_prob(p_, x_model).mean()
            reg = p_control * (
                (mnist_nets.ebm_net_apply(p_, x_data) ** 2).mean()
                + (mnist_nets.ebm_net_apply(p_, x_model) ** 2).mean())
            return -(lp_data - lp_model) + reg, (lp_data, lp_model)

        (loss, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(g, opt_state, params)
        params = optax.apply_updates(params, updates)
        buffer = buffer.at[bsel].set(x_model)
        return (params, opt_state, buffer), (loss, aux[0], aux[1])

    @jax.jit
    def run_chunk(params, opt_state, buffer, keys):
        (params, opt_state, buffer), (losses, lpd, lpm) = jax.lax.scan(
            one_step, (params, opt_state, buffer), keys)
        return params, opt_state, buffer, losses.mean(), lpd.mean(), lpm.mean()

    key = jax.random.PRNGKey(seed + 7)
    buffer = buffer0
    for done, size in _chunked(n_iters, chunk, log_every, ckpt_every):
        key, k = jax.random.split(key)
        params, opt_state, buffer, loss, lpd, lpm = run_chunk(
            params, opt_state, buffer, jax.random.split(k, size))
        step = done + size
        if not quiet and (step % log_every == 0 or step == n_iters):
            print(f"[ebm] iter {step} obj {float(loss):.3f} "
                  f"logp_data {float(lpd):.1f} logp_model {float(lpm):.1f}",
                  flush=True)
        if ckpt_path and step % ckpt_every == 0:
            save_ckpt(f"{ckpt_path}_ckpt_{step}.npz", params, step)
    return params
