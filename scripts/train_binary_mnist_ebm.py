"""Train the binary-MNIST ResNet EBM expert (in-repo).

The reference outsources EBM training to the external GWG_release repo
(scripts/train_mnist.sh:25-33); this native trainer uses persistent
contrastive divergence with Gibbs-with-gradients buffer updates
(ppde_tpu.training.train_ebm).
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
    training.train_ebm(
        images, n_channels=args.n_channels, n_iters=args.n_iters,
        batch_size=args.batch_size, buffer_size=args.buffer_size,
        sampling_steps=args.sampling_steps, lr=args.lr, seed=args.seed,
        p_control=args.p_control, reinit_p=args.reinit_p,
        data_noise_p=args.data_noise_p,
        ckpt_path=os.path.join(args.output_dir, "mnist_ebm"),
        ckpt_every=args.ckpt_every)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--mnist_source", type=str,
                   default="augmented:data/mnist",
                   help="'augmented[:dir]' = affine-augmented real committed "
                        "MNIST digits (best real data offline); a raw-MNIST "
                        "directory; or 'synthetic' (pipeline tests)")
    p.add_argument("--output_dir", type=str, default="weights/mnist_models")
    p.add_argument("--n_channels", type=int, default=64)
    p.add_argument("--n_iters", type=int, default=10000)
    p.add_argument("--batch_size", type=int, default=100)
    p.add_argument("--buffer_size", type=int, default=1000)
    p.add_argument("--sampling_steps", type=int, default=20)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--p_control", type=float, default=5e-2)
    p.add_argument("--reinit_p", type=float, default=0.05)
    p.add_argument("--data_noise_p", type=float, default=0.03)
    p.add_argument("--ckpt_every", type=int, default=2000)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()
    os.makedirs(args.output_dir, exist_ok=True)
    main(args)
