"""Fit Potts model parameters from an .a2m MSA (plmDCA pseudolikelihood).

Produces potts.npz under the protein's weights directory — the native
replacement for the reference's missing potts.pkl artifacts
(.MISSING_LARGE_BLOBS). Usage:

  python scripts/fit_potts.py --msa data/proteins/UBE4B_MOUSE.a2m \
      --out weights/UBE4B_MOUSE_Klevit2013-nscor_log2_ratio/potts.npz
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(args):
    from ppde_tpu.models import potts, potts_fit

    J, h, index_list, offset, hist = potts_fit.fit_from_a2m(
        args.msa, steps=args.steps, lr=args.lr, lambda_J=args.lambda_J,
        lambda_h=args.lambda_h, max_seqs=args.max_seqs,
        reweight=not args.no_reweight, seed=args.seed, verbose=True)
    potts.save_npz(args.out, J, h, index_list, args.reg_coef, offset)
    print(f"saved {args.out}: L={h.shape[0]}, window "
          f"{index_list[0]}..{index_list[-1]}, final loss {hist[-1]:.4f}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--msa", type=str, required=True)
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--lr", type=float, default=0.05)
    p.add_argument("--lambda_J", type=float, default=0.01)
    p.add_argument("--lambda_h", type=float, default=0.01)
    p.add_argument("--max_seqs", type=int, default=8192)
    p.add_argument("--no_reweight", action="store_true")
    p.add_argument("--reg_coef", type=float, default=1.0,
                   help="stored scale used by the augmented oracle feature")
    p.add_argument("--seed", type=int, default=0)
    main(p.parse_args())
