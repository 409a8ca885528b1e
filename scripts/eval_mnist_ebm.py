"""Calibration check for the retrained binary-MNIST EBM expert.

The reference ships no EBM weights (missing blobs) and full MNIST does not
exist offline, so our EBM is trained on affine augmentations of the
committed real digits (data/mnist/*.npy). This script verifies the result
is a meaningful density model, reporting:

  * energy (unnormalized log-prob) margins: held-out REAL digits
    (validation_*.npy — never seen in training) vs Bernoulli(mean) noise,
    uniform noise, and pixel-shuffled digits (same ink statistics, no
    stroke structure);
  * a GWG sample grid from the model (results/mnist/ebm_samples.png).

Usage: tools/tpu_run.sh scripts/eval_mnist_ebm.py
"""
from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(args):
    import jax
    import jax.numpy as jnp

    from ppde_tpu import training
    from ppde_tpu.data import mnist as dmnist
    from ppde_tpu.models import mnist_nets

    npzs = sorted(glob.glob(os.path.join(args.weights_dir,
                                         "mnist_ebm_ckpt_*.npz")),
                  key=lambda p: int(p.rsplit("_", 1)[1].split(".")[0]))
    if not npzs:
        raise FileNotFoundError(f"no mnist_ebm_ckpt_*.npz in {args.weights_dir}")
    mean = np.load(os.path.join(args.data_dir, "mnist_mean.npy")).reshape(-1)
    mean = mean.clip(1e-2, 1 - 1e-2)
    init_like = mnist_nets.ebm_init(jax.random.PRNGKey(0), args.n_channels,
                                    mean=mean)
    params, step = training.load_ckpt(npzs[-1], init_like)
    print(f"loaded {npzs[-1]} (step {step})")
    logp = jax.jit(lambda x: mnist_nets.ebm_log_prob(params, x))

    rng = np.random.default_rng(0)

    def binarize(im):
        return (rng.random(im.shape) < im).astype(np.float32)

    # held-out REAL digits (never in the training pool)
    real = dmnist.load_real_seed_images(args.data_dir, heldout=True)
    real = binarize(np.tile(real.reshape(-1, 784), (32, 1)))
    # augmentations of the held-out digits (fresh affine draws)
    aug = binarize(dmnist.augmented_real_mnist(args.data_dir, 64, seed=99,
                                               heldout=True))
    # controls
    bern = (rng.random((64, 784)) < mean[None]).astype(np.float32)
    unif = (rng.random((64, 784)) < 0.5).astype(np.float32)
    shuf = real.copy()
    for r in shuf:
        rng.shuffle(r)  # identical ink fraction, destroyed structure

    rows = {}
    for name, x in [("real_heldout", real), ("aug_heldout", aug),
                    ("bernoulli_mean", bern), ("uniform", unif),
                    ("pixel_shuffled", shuf)]:
        v = np.asarray(logp(jnp.asarray(x)))
        rows[name] = (float(v.mean()), float(v.std()))
        print(f"logp {name:15s} mean {v.mean():9.1f} +- {v.std():6.1f}")

    margin_bern = rows["real_heldout"][0] - rows["bernoulli_mean"][0]
    margin_shuf = rows["real_heldout"][0] - rows["pixel_shuffled"][0]
    print(f"margin real-vs-bernoulli {margin_bern:.1f}  "
          f"real-vs-shuffled {margin_shuf:.1f}")

    # GWG sample grid from the model
    key = jax.random.PRNGKey(1)
    x = jnp.asarray((rng.random((64, 784)) < mean[None]).astype(np.float32))

    @jax.jit
    def chain(x, key):
        def body(x, k):
            return training.gwg_flip_step(params, x, k,
                                          mnist_nets.ebm_log_prob), ()
        return jax.lax.scan(body, x,
                            jax.random.split(key, args.sample_steps))[0]

    x = np.asarray(chain(x, key))
    os.makedirs(args.out_dir, exist_ok=True)
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(8, 8, figsize=(8, 8))
        for i, ax in enumerate(axes.ravel()):
            ax.imshow(x[i].reshape(28, 28), cmap="gray_r")
            ax.axis("off")
        fig.suptitle(f"EBM GWG samples ({args.sample_steps} steps)")
        fig.tight_layout()
        out = os.path.join(args.out_dir, "ebm_samples.png")
        fig.savefig(out, dpi=120)
        print(f"sample grid -> {out}")
    except Exception as e:  # matplotlib optional
        print(f"[skip] sample grid: {e}")
    v = np.asarray(logp(jnp.asarray(x)))
    print(f"logp gwg_samples     mean {v.mean():9.1f} +- {v.std():6.1f}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--weights_dir", type=str, default="weights/mnist_models")
    p.add_argument("--data_dir", type=str, default="data/mnist")
    p.add_argument("--out_dir", type=str, default="results/mnist")
    p.add_argument("--n_channels", type=int, default=64)
    p.add_argument("--sample_steps", type=int, default=3000)
    main(p.parse_args())
