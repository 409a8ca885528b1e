"""Aggregate run artifacts into the paper's tables and figures.

Parity with the reference figure script (scripts/make_figures.py): diversity
% (unique variants, :38-49), exploration / n_hops (:29-36), score quantile
tables (:81-103), and per-chain running-max lineplots (:192-236).
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def summarize_run(rd: str, wt_onehot):
    from ppde_tpu import metrics

    out = {"run": rd}
    pop = np.load(os.path.join(rd, "population.npy"))
    out["diversity_pct"] = metrics.diversity_pct(pop)
    mean_m, std_m = metrics.exploration(pop, wt_onehot)
    out["exploration_mean"] = mean_m
    out["exploration_std"] = std_m
    for name, key in [("oracle_fitness_scores.npy", "log_fitness"),
                      ("transformer_scores.npy", "evolutionary_density"),
                      ("energy_scores.npy", "energy")]:
        path = os.path.join(rd, name)
        if os.path.exists(path):
            v = np.load(path)
            out[f"{key}_p50"] = float(np.quantile(v, 0.5))
            out[f"{key}_p100"] = float(v.max())
    return out


def main(args):
    from ppde_tpu import codec, io as pio

    protein_dir = os.path.join(args.protein_weights, args.protein)
    wt = pio.read_fasta(os.path.join(protein_dir, "wt.fasta"))[0]
    wt_onehot = codec.seqs_to_onehot([wt])[0]

    rows = []
    for rd in sorted(glob.glob(args.runs_glob)):
        if os.path.exists(os.path.join(rd, "population.npy")):
            rows.append(summarize_run(rd, wt_onehot))
    if not rows:
        print(f"no runs match {args.runs_glob}")
        return

    print(json.dumps(rows, indent=2))
    with open(args.out_json, "w") as f:
        json.dump(rows, f, indent=2)

    if args.plots:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        for rd in sorted(glob.glob(args.runs_glob)):
            hist = os.path.join(rd, "energy_history.npy")
            if not os.path.exists(hist):
                continue
            e = np.load(hist)  # [steps, chains]
            running_max = np.maximum.accumulate(e, axis=0)
            plt.figure()
            plt.plot(running_max[:, : args.max_chains_plotted], alpha=0.5,
                     linewidth=0.8)
            plt.xlabel("step")
            plt.ylabel("running max energy")
            plt.title(os.path.basename(rd))
            plt.tight_layout()
            plt.savefig(os.path.join(rd, "chain_running_max.png"))
            plt.close()


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--runs_glob", type=str, default="results/proteins/*/*")
    p.add_argument("--protein_weights", type=str, default="weights")
    p.add_argument("--protein", type=str, default="PABP_YEAST_Fields2013")
    p.add_argument("--out_json", type=str, default="results/summary.json")
    p.add_argument("--plots", action="store_true")
    p.add_argument("--max_chains_plotted", type=int, default=32)
    args = p.parse_args()
    os.makedirs(os.path.dirname(args.out_json) or ".", exist_ok=True)
    main(args)
