"""Train the binary-MNIST denoising autoencoder expert.

Parity with the reference trainer (scripts/train_binary_mnist_dae.py:60-96):
corrupt -> reconstruct BCE with periodic {model, step} checkpoints and
--ckpt_path resume.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(args):
    from ppde_tpu import training
    from ppde_tpu.data.mnist import load_static_binary_mnist

    images = load_static_binary_mnist(args.mnist_source, "train")
    training.train_dae(
        images, latent_dim=args.latent_dim, n_channels=args.n_channels,
        max_p=args.max_p, n_iters=args.n_iters, batch_size=args.batch_size,
        lr=args.lr, seed=args.seed, resume=args.ckpt_path,
        ckpt_path=os.path.join(args.output_dir, "mnist_binary_dae"),
        ckpt_every=args.ckpt_every)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--mnist_source", type=str,
                   default="augmented:data/mnist",
                   help="'augmented[:dir]' = affine-augmented real committed "
                        "MNIST digits (best real data offline); a raw-MNIST "
                        "directory; or 'synthetic' (pipeline tests)")
    p.add_argument("--output_dir", type=str, default="weights/mnist_models")
    p.add_argument("--latent_dim", type=int, default=16)
    p.add_argument("--n_channels", type=int, default=64)
    p.add_argument("--max_p", type=int, default=15)
    p.add_argument("--n_iters", type=int, default=40000)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--ckpt_every", type=int, default=10000)
    p.add_argument("--ckpt_path", type=str, default=None, help="resume from")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()
    os.makedirs(args.output_dir, exist_ok=True)
    main(args)
