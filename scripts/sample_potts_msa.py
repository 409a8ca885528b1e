"""Sample sequences from a fitted Potts model (Gibbs) — fit QC + synthetic
families.

The reference can only SCORE with its Potts model; it has no way to draw
from it. This tool samples p(x) ∝ exp(β·H(x)) with the exact single-site
Gibbs sweep (potts.gibbs_sample) and serves two purposes:

  * --qc_msa: standard DCA fit quality control — compare single-site
    frequencies and pairwise covariances of the model's own samples against
    the training alignment (a good fit reproduces the two-point statistics
    the pseudolikelihood never directly optimized);
  * --out: write the samples as an alignment (uppercase FASTA = all-focus
    .a2m) — a provenance-marked synthetic family for proteins whose real
    MSAs are missing upstream blobs (PABP/GFP, .MISSING_LARGE_BLOBS), so
    the family pipelines (finetune_esm/finetune_msa) run on all proteins.

Example:
  python scripts/sample_potts_msa.py \
      --protein UBE4B_MOUSE_Klevit2013-nscor_log2_ratio \
      --n_seqs 500 --n_sweeps 200 \
      --qc_msa data/proteins/UBE4B_MOUSE.a2m --out /tmp/ube4b_model.a2m
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--protein_weights", type=str, default="weights")
    p.add_argument("--protein", type=str, required=True)
    p.add_argument("--n_seqs", type=int, default=500)
    p.add_argument("--n_sweeps", type=int, default=200,
                   help="systematic Gibbs sweeps (each resamples every "
                        "window position once)")
    p.add_argument("--beta", type=float, default=1.0,
                   help="inverse temperature; 1.0 = the model's own law")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", type=str, default=None,
                   help="write samples as uppercase FASTA (valid all-focus "
                        ".a2m; WT window is the first/focus record)")
    p.add_argument("--qc_msa", type=str, default=None,
                   help="real .a2m to compare sampled statistics against "
                        "(Pearson r of single-site frequencies and of "
                        "pairwise covariances)")
    p.add_argument("--potts_npz", type=str, default=None,
                   help="sample from this Potts fit instead of the protein "
                        "dir's artifact (regularization-sweep QC)")
    p.add_argument("--out_json", type=str, default=None,
                   help="append run stats (config, uniqueness, H quantiles, "
                        "QC correlations) as one JSON object per line — the "
                        "committed-evidence form of the printed QC numbers")
    return p


def pair_covariances(onehot):
    """Flattened C[(i,a),(j,b)] = f_ij(a,b) − f_i(a)·f_j(b), i<j entries."""
    import numpy as np

    M, L, V = onehot.shape
    flat = onehot.reshape(M, L * V)
    f = flat.mean(0)
    C = flat.T @ flat / M - np.outer(f, f)
    iu = np.triu_indices(L, k=1)
    blocks = C.reshape(L, V, L, V)[iu[0], :, iu[1], :]
    return blocks.ravel()


def _round_or_none(v, digits: int = 4):
    """round() that maps None/nan/inf to None so json.dumps stays valid."""
    import math

    return round(v, digits) if v is not None and math.isfinite(v) else None


def main(args):
    import jax
    import numpy as np

    from ppde_tpu import codec, io as pio, runtime
    from ppde_tpu.models import potts

    protein_dir = os.path.join(args.protein_weights, args.protein)
    wt = pio.read_fasta(os.path.join(protein_dir, "wt.fasta"))[0]
    if args.potts_npz:
        pp = potts.load_npz(args.potts_npz, wt)
    else:
        pp = runtime.load_potts(protein_dir)
    wt_window = wt[pp.min_pos : pp.max_pos + 1]
    print(f"[sample_potts] {args.protein}: window L={pp.seq_len}, "
          f"{args.n_seqs} chains x {args.n_sweeps} sweeps, "
          f"beta={args.beta}", flush=True)

    x = potts.gibbs_sample(pp, jax.random.PRNGKey(args.seed),
                           n_chains=args.n_seqs, n_sweeps=args.n_sweeps,
                           beta=args.beta)
    x = np.asarray(jax.device_get(x))
    seqs = codec.onehot_to_seqs(x)
    uniq = 100.0 * len(set(seqs)) / len(seqs)
    H = np.asarray(potts.hamiltonian(pp, x))
    print(f"[sample_potts] unique {uniq:.1f}%  H quantiles "
          f"{np.quantile(H, [0.1, 0.5, 0.9])} (wt_H "
          f"{float(pp.wt_H):.2f})", flush=True)

    r1 = r2 = None
    if args.qc_msa:
        from ppde_tpu.models import potts_fit

        msa = pio.load_msa(args.qc_msa)
        data = potts_fit.msa_to_onehot(msa)
        fi_model = x.reshape(len(seqs), -1).mean(0)
        fi_data = data.reshape(len(msa), -1).mean(0)
        r1 = float(np.corrcoef(fi_model, fi_data)[0, 1])
        r2 = float(np.corrcoef(pair_covariances(x),
                               pair_covariances(data))[0, 1])
        print(f"[sample_potts] QC vs {args.qc_msa}: "
              f"single-site freq r={r1:+.4f}, pair covariance r={r2:+.4f}",
              flush=True)

    if args.out_json:
        import json

        os.makedirs(os.path.dirname(os.path.abspath(args.out_json)),
                    exist_ok=True)
        rec = {"protein": args.protein, "potts_npz": args.potts_npz,
               "n_seqs": args.n_seqs, "n_sweeps": args.n_sweeps,
               "beta": args.beta, "seed": args.seed,
               "unique_pct": round(uniq, 2),
               "H_q10_q50_q90": [round(float(q), 3) for q in
                                 np.quantile(H, [0.1, 0.5, 0.9])],
               "wt_H": round(float(pp.wt_H), 3),
               "coupling_l2": round(float(np.sqrt((np.asarray(pp.W) ** 2)
                                                  .sum())), 3),
               "qc_msa": args.qc_msa,
               # None (valid JSON null) when QC was skipped OR a
               # correlation is undefined (fully-conserved population
               # makes corrcoef return nan, and NaN is not legal JSON)
               "single_site_freq_r": _round_or_none(r1),
               "pair_covariance_r": _round_or_none(r2)}
        with open(args.out_json, "a") as f:
            f.write(json.dumps(rec) + "\n")

    if args.out:
        os.makedirs(os.path.dirname(os.path.abspath(args.out)),
                    exist_ok=True)
        with open(args.out, "w") as f:
            f.write(f">{args.protein}_WT/"
                    f"{pp.min_pos + 1}-{pp.max_pos + 1}\n{wt_window}\n")
            for i, s in enumerate(seqs):
                f.write(f">potts_sample_{i} beta={args.beta} "
                        f"sweeps={args.n_sweeps} seed={args.seed}\n{s}\n")
        print(f"[sample_potts] wrote {len(seqs) + 1} records to {args.out}",
              flush=True)
    return seqs


if __name__ == "__main__":
    main(build_parser().parse_args())
