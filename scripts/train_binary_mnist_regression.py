"""Train MNIST sum-regression ensembles / oracle.

Functional parity with the reference trainer
(scripts/train_binary_mnist_regression.py:23-129): AdamW MSE regression on
MNISTsum pairs (sumTo=10 for ensemble members, sumTo=18 for the oracle),
periodic checkpoints, rounding-accuracy eval on val + OOD test.

Raw MNIST cannot be downloaded in this environment — point --mnist_source at
idx/npy files, or use 'synthetic' for a smoke run.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(args):
    from ppde_tpu import training
    from ppde_tpu.data.mnist import MNISTSumPairs

    pair_file = (os.path.join(args.data_dir,
                              f"MNISTsum{args.sum_to}_train.txt")
                 if args.data_dir else None)
    train = MNISTSumPairs(args.mnist_source, pair_file, "train",
                          seed=args.seed)
    params = training.train_regression(
        train, nc=args.n_channels, n_iters=args.n_iters,
        batch_size=args.batch_size, lr=args.lr, seed=args.seed,
        ckpt_path=os.path.join(args.output_dir, args.name),
        ckpt_every=args.ckpt_every)

    val_pairs = (os.path.join(args.data_dir,
                              f"MNISTsum{args.sum_to}_val.txt")
                 if args.data_dir else None)
    val = MNISTSumPairs(args.mnist_source, val_pairs, "val", seed=1,
                        train_noise=False)
    acc = training.eval_regression_accuracy(params, val)
    print(f"val rounding accuracy: {acc:.3f}")
    training.save_ckpt(os.path.join(args.output_dir,
                                    f"{args.name}_ckpt_{args.n_iters}.npz"),
                       params, args.n_iters)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--mnist_source", type=str, default="synthetic")
    p.add_argument("--data_dir", type=str, default=None,
                   help="directory with MNISTsum*.txt pair files")
    p.add_argument("--output_dir", type=str, default="weights/mnist_models")
    p.add_argument("--name", type=str, default="ensemble_0")
    p.add_argument("--sum_to", type=int, default=10, choices=[10, 18])
    p.add_argument("--n_channels", type=int, default=16,
                   help="16 for ensemble members, 64 for the oracle")
    p.add_argument("--n_iters", type=int, default=25000)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--ckpt_every", type=int, default=5000)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()
    os.makedirs(args.output_dir, exist_ok=True)
    main(args)
