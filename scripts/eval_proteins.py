"""Re-score saved populations with the MSA Transformer.

Parity with the reference eval script (scripts/eval_proteins.py:27-45):
loads population.npy from run directories and writes transformer_scores.npy.
"""
from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(args):
    from ppde_tpu import metrics

    run_dirs = sorted(glob.glob(args.runs_glob))
    if not run_dirs:
        print(f"no runs match {args.runs_glob}")
        return
    protein_dir = os.path.join(args.protein_weights, args.protein)
    for rd in run_dirs:
        pop_path = os.path.join(rd, "population.npy")
        if not os.path.exists(pop_path):
            continue
        pop = np.load(pop_path)
        scores = metrics.proteins_transformer_score(
            pop, protein_dir, args.msa_path, args.msa_size,
            weights_path=args.msa_transformer_weights,
            allow_random=args.allow_random_esm,
            msa_model=args.msa_transformer_model)
        np.save(os.path.join(rd, "transformer_scores.npy"), scores)
        print(f"{rd}: median {np.median(scores):.3f} "
              f"max {scores.max():.3f}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--runs_glob", type=str,
                   default="results/proteins/*/*")
    p.add_argument("--protein_weights", type=str, default="weights")
    p.add_argument("--protein", type=str, default="PABP_YEAST_Fields2013")
    p.add_argument("--msa_path", type=str,
                   default="data/proteins/PABP_YEAST.a2m")
    p.add_argument("--msa_size", type=int, default=500)
    p.add_argument("--msa_transformer_weights", type=str, default=None)
    p.add_argument("--msa_transformer_model", type=str, default="msa-1b")
    p.add_argument("--allow_random_esm", action="store_true")
    main(p.parse_args())
