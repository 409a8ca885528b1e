"""Scale-match a refit Potts to the reference's (missing) original fit.

The reference's UBE4B potts.pkl is a missing upstream blob
(/root/reference/.MISSING_LARGE_BLOBS), so round 2 refit one with plmDCA
(scripts/fit_potts.py). That refit ranks mutants like the original (paper-
consistent sampler signatures everywhere, PARITY.md) but its Hamiltonian is
~4.4x hotter — the lambda_J sweep (results/qc/ube4b_reg_sweep.jsonl)
measures std(dH over random single mutants) = 2.0-2.9 across two decades of
coupling-l2, while the PUBLISHED lambda=0.5 together with the paper's own
calibration method (match the supervised term's stddev — see
scripts/select_lambda.py) implies the original had std(dH) ~= 0.54. The
scale enters twice:

  * the PoE expert energy: at the published lambda the refit dominates the
    supervised term ~4.4x harder than the reference intended, pinning
    chains near the wild type;
  * the oracle's evolutionary feature (reference nets.py:336-347):
    y_s = coef_s0 * sqrt(1/potts_reg) * dH + onehot terms. The ridge heads
    (real committed pkls) were TRAINED on the original feature; feeding
    them a 4.4x-hotter dH shifts absolute oracle log-fitness — the one
    remaining quality caveat on the real-Potts protein (PPDE p50 0.13 vs
    paper Table 2's 1.32).

lambda_J cannot close this: single-mutant dH is field-dominated, so std
plateaus ~2.0 while pair-covariance QC collapses (0.64 -> 0.32) — measured
in the sweep and extended here (--sweep_std appends std rows for new
lambda_J fits). This tool therefore scale-matches OUTSIDE the fitter:

  1. EXPERT side: scale (J, h) by s so std(s * dH) over random single
     mutants equals the reference-implied target (lambda_published *
     std(supervised fitness) — computed live with select_lambda's exact
     protocol, same default seed).
  2. ORACLE side: the original feature was sqrt(1/reg_orig) * dH_orig with
     reg_orig unknown (it lived in the missing pkl). But the committed CNN
     ensemble was trained on the SAME assay the ridge heads were, so the
     effective feature scale alpha is recoverable empirically: solve the
     one-parameter least squares
        min_alpha  sum_x ( mean_s(coef_s0) * alpha * dH(x) + c(x) - f(x) )^2
     over a mixed-radius mutant cloud, where c(x) is the oracle's fixed
     onehot+intercept part and f(x) the CNN ensemble prediction. Store
     reg_coef = (s / alpha)^2 in the artifact so the oracle's
     sqrt(1/reg_coef) * dH_scaled reproduces alpha * dH exactly.

The output artifact (potts.save_npz format) drops into any sweep via
`scripts/directed_evolution.py --potts_npz <out>`; expert energy and
oracle stay coherent because both read the same params. Writes one JSON
record (results/qc/) with the calibration numbers and fit-quality
diagnostics (R^2 of oracle-vs-CNN at alpha*, at alpha=1, and with the ev
feature zeroed; Spearman(dH, fitness) per mutation count — the expert-
quality statistic used to pick the fitter's default lambda_J).
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def sample_mutants(rng, wt_idx, min_pos, max_pos, n, max_muts):
    """Mixed-radius mutant cloud: k ~ U[1, max_muts] substitutions at
    distinct positions, values forced != wt (so k is the true radius)."""
    muts, ks = [], []
    for _ in range(n):
        k = int(rng.integers(1, max_muts + 1))
        x = wt_idx.copy()
        pos = rng.choice(np.arange(min_pos, max_pos + 1), size=k,
                         replace=False)
        for p in pos:
            v = int(rng.integers(0, 19))
            x[p] = v if v < wt_idx[p] else v + 1  # uniform over != wt
        muts.append(x)
        ks.append(k)
    return np.stack(muts), np.asarray(ks)


def single_mutant_std(pp, sup, wt, n_mutants=512, seed=0):
    """std(dH) and std(fitness) over random single mutants — EXACTLY
    select_lambda's protocol (same default seed) so the target matches the
    committed sweep rows in results/qc/ube4b_reg_sweep.jsonl."""
    import jax.numpy as jnp

    from ppde_tpu import codec
    from ppde_tpu.models import cnn, potts as potts_mod

    rng = np.random.default_rng(seed)
    wt_idx = codec.seqs_to_ints([wt])[0]
    muts = []
    for _ in range(n_mutants):
        x = wt_idx.copy()
        x[rng.integers(pp.min_pos, pp.max_pos + 1)] = rng.integers(0, 20)
        muts.append(x)
    x = jnp.asarray(codec.ints_to_onehot(np.stack(muts)).astype(np.float32))
    dh = np.asarray(potts_mod.score(pp, x, delta=True))
    fit = np.asarray(cnn.ensemble_apply(sup, x))
    return float(dh.std()), float(fit.std())


def main(args):
    import jax.numpy as jnp

    from ppde_tpu import codec, io as pio, runtime
    from ppde_tpu.models import cnn, oracle as oracle_mod
    from ppde_tpu.models import potts as potts_mod

    protein_dir = os.path.join(args.protein_weights, args.protein)
    wt = pio.read_fasta(os.path.join(protein_dir, "wt.fasta"))[0]
    src = args.potts_npz or os.path.join(protein_dir, "potts.npz")
    pp = potts_mod.load_npz(src, wt)
    sup = runtime.load_supervised_ensemble(protein_dir)
    orc = oracle_mod.load(protein_dir, potts_params=pp)

    # --- expert-side target: reference-implied single-mutant dH scale
    std_dh, std_fit = single_mutant_std(pp, sup, wt)
    target = args.lambda_published * std_fit
    s = target / std_dh

    # --- oracle-side: recover the effective feature scale alpha
    rng = np.random.default_rng(args.seed)
    wt_idx = codec.seqs_to_ints([wt])[0]
    ints, ks = sample_mutants(rng, wt_idx, pp.min_pos, pp.max_pos,
                              args.n_mutants, args.max_muts)
    x = jnp.asarray(codec.ints_to_onehot(ints).astype(np.float32))
    dh = np.asarray(potts_mod.score(pp, x, delta=True))          # [N]
    f = np.asarray(cnn.ensemble_apply(sup, x))                   # [N]
    xf = np.asarray(x).reshape(x.shape[0], -1)
    coef = np.asarray(orc.coef)                                  # [S, 1+LV]
    onehot = (xf @ coef[:, 1:].T) * np.asarray(orc.inv_sqrt_reg)[None]
    c = (onehot + np.asarray(orc.intercept)[None]).mean(1)       # [N]
    k0 = float(coef[:, 0].mean())
    A = k0 * dh                                                  # [N]
    r = f - c
    alpha = float((A @ r) / (A @ A))

    def r2(pred):
        ss = float(((f - pred) ** 2).sum())
        return 1.0 - ss / float(((f - f.mean()) ** 2).sum())

    from scipy import stats as _stats  # scipy ships with the jax stack

    by_k = {int(k): round(float(_stats.spearmanr(
        dh[ks == k], f[ks == k]).statistic), 4)
        for k in sorted(set(ks.tolist())) if (ks == k).sum() >= 16}

    rec = {
        "protein": args.protein, "potts_npz": src,
        "n_mutants": args.n_mutants, "max_muts": args.max_muts,
        "seed": args.seed,
        "std_dH_single": round(std_dh, 4), "std_fit_single": round(std_fit, 4),
        "lambda_published": args.lambda_published,
        "target_std": round(target, 4), "scale_s": round(s, 6),
        "alpha": round(alpha, 6),
        "reg_coef_out": round((s / alpha) ** 2, 6),
        "oracle_vs_cnn_r2": {"alpha_star": round(r2(A * alpha + c), 4),
                             "alpha_1": round(r2(A + c), 4),
                             "no_ev": round(r2(c), 4)},
        "spearman_dH_vs_fitness_by_k": by_k,
    }
    print(json.dumps(rec, indent=2))

    if args.out_npz:
        z = np.load(src)
        reg_out = (s / alpha) ** 2
        potts_mod.save_npz(args.out_npz, np.asarray(z["J"]) * s,
                           np.asarray(z["h"]) * s, z["index_list"],
                           reg_out, int(z["offset"]))
        # verify the artifact round-trips: expert std hits the target and
        # the oracle feature reproduces alpha * dH
        pp2 = potts_mod.load_npz(args.out_npz, wt)
        std2, _ = single_mutant_std(pp2, sup, wt)
        feat_ratio = float(np.sqrt(1.0 / pp2.reg_coef) * s / alpha)
        assert abs(std2 - target) < 0.02 * target, (std2, target)
        assert abs(feat_ratio - 1.0) < 1e-4, feat_ratio
        rec["out_npz"] = args.out_npz
        rec["verified_std_dH_single"] = round(std2, 4)
        print(f"wrote {args.out_npz}: expert std(dH)={std2:.4f} "
              f"(target {target:.4f}), oracle feature == alpha*dH")

    if args.out_json:
        os.makedirs(os.path.dirname(os.path.abspath(args.out_json)),
                    exist_ok=True)
        with open(args.out_json, "a") as fjson:
            fjson.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    p = argparse.ArgumentParser(
        description=__doc__.split("\n")[0])
    p.add_argument("--protein_weights", type=str, default="weights")
    p.add_argument("--protein", type=str,
                   default="UBE4B_MOUSE_Klevit2013-nscor_log2_ratio")
    p.add_argument("--potts_npz", type=str, default=None,
                   help="source fit (default: the protein dir's potts.npz)")
    p.add_argument("--lambda_published", type=float, default=0.5,
                   help="the reference's published PoE lambda for this "
                        "protein (README.md:65-72) — implies the original "
                        "fit's dH scale via the paper's calibration method")
    p.add_argument("--n_mutants", type=int, default=4096)
    p.add_argument("--max_muts", type=int, default=10,
                   help="mutant-cloud radius (the sweep's nmut_threshold)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out_npz", type=str, default=None,
                   help="write the scale-matched artifact here")
    p.add_argument("--out_json", type=str, default=None,
                   help="append the calibration record as one JSON line")
    main(p.parse_args())
