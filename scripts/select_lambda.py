"""Calibrate the product-of-experts weight lambda per (protein, expert).

Working replacement for the reference's stale script
(scripts/select_lambda.py — its ProteinJointEnergy import no longer exists
in the reference, select_lambda.py:7,26). Method per the paper: pick lambda
so the scale (stddev over random single mutants) of the supervised term
matches the unsupervised expert's.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(args):
    import jax
    import jax.numpy as jnp

    from ppde_tpu import codec, io as pio, runtime
    from ppde_tpu.models import cnn, potts as potts_mod

    protein_dir = os.path.join(args.protein_weights, args.protein)
    wt = pio.read_fasta(os.path.join(protein_dir, "wt.fasta"))[0]
    if args.potts_npz:
        # calibrate against an alternative fit (e.g. the lambda_J
        # regularization sweep, scripts/run_r4_qc_pt.sh) without touching
        # the protein dir's canonical artifact
        pp = potts_mod.load_npz(args.potts_npz, wt)
    else:
        pp = runtime.load_potts(protein_dir)
    sup = runtime.load_supervised_ensemble(protein_dir)

    rng = np.random.default_rng(args.seed)
    wt_idx = codec.seqs_to_ints([wt])[0]
    muts = []
    for _ in range(args.n_mutants):
        x = wt_idx.copy()
        pos = rng.integers(pp.min_pos, pp.max_pos + 1)
        x[pos] = rng.integers(0, 20)
        muts.append(x)
    x = jnp.asarray(codec.ints_to_onehot(np.stack(muts)).astype(np.float32))

    unsup = np.asarray(potts_mod.score(pp, x, delta=True))
    fit = np.asarray(cnn.ensemble_apply(sup, x))
    lam = float(unsup.std() / max(fit.std(), 1e-9))
    print(f"{args.protein}: std(unsup)={unsup.std():.4f} "
          f"std(fit)={fit.std():.4f} -> lambda ~= {lam:.2f}")
    if args.out_json:
        import json

        os.makedirs(os.path.dirname(os.path.abspath(args.out_json)),
                    exist_ok=True)
        with open(args.out_json, "a") as f:
            f.write(json.dumps(
                {"protein": args.protein, "potts_npz": args.potts_npz or
                 None, "n_mutants": args.n_mutants, "seed": args.seed,
                 "std_unsup": round(float(unsup.std()), 4),
                 "std_fit": round(float(fit.std()), 4),
                 "lambda": round(lam, 3)}) + "\n")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--protein_weights", type=str, default="weights")
    p.add_argument("--protein", type=str, default="PABP_YEAST_Fields2013")
    p.add_argument("--n_mutants", type=int, default=512)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--potts_npz", type=str, default="",
                   help="calibrate against this Potts fit instead of the "
                        "protein dir's artifact")
    p.add_argument("--out_json", type=str, default="",
                   help="append the calibration record as one JSON line")
    main(p.parse_args())
