"""Evaluation metrics and artifact writers.

Parity targets (reference ppde/metrics.py):
  * proteins_potts_score — delta Hamiltonian of a population (:14-19)
  * proteins_transformer_score — MSA-Transformer masked-marginal
    evolutionary density (:22-76), re-designed to score all (variant,
    mutation) pairs as BATCHED device calls instead of the reference's
    per-variant-per-mutation Python loop of full forwards
  * n_hops (:78-85) — in ppde_tpu.utils
  * mnist_scores_to_csv / mnist_performance_plots (:103-134)
  * population diversity / exploration (reference make_figures.py:29-49)
"""
from __future__ import annotations

import os

import numpy as np

from ppde_tpu import codec, io as pio, utils


def proteins_potts_score(population: np.ndarray, protein_dir: str):
    """Delta-Hamiltonian of a one-hot population under the run's Potts."""
    import jax.numpy as jnp

    from ppde_tpu import runtime
    from ppde_tpu.models import potts as potts_mod

    pp = runtime.load_potts(protein_dir)
    return np.asarray(potts_mod.score(pp, jnp.asarray(population), delta=True))


def diversity_pct(population: np.ndarray) -> float:
    """% unique variants (reference make_figures.py:38-49)."""
    seqs = codec.onehot_to_seqs(population)
    return 100.0 * len(set(seqs)) / len(seqs)


def exploration(population: np.ndarray, wt_onehot: np.ndarray):
    """mean ± std number of mutations from WT (make_figures.py:29-36)."""
    import jax.numpy as jnp

    d = np.asarray(utils.mut_distance(jnp.asarray(population),
                                      jnp.asarray(wt_onehot)))
    return float(d.mean()), float(d.std())


def proteins_transformer_score(population: np.ndarray, protein_dir: str,
                               msa_location: str, msa_size: int,
                               weights_path: str | None = None,
                               allow_random: bool = False,
                               seed: int = 0,
                               msa_model: str = "msa-1b") -> np.ndarray:
    """Evolutionary density via MSA-Transformer masked marginals.

    For each variant, for each of its mutations inside the alignment window:
    mask that column in the WT row of a [msa_size, window] alignment, run the
    MSA transformer, accumulate log p(mut) - log p(wt). Mutation effects are
    assumed additive (reference metrics.py:40-76).

    TPU-first: all unique masked positions across the population are scored
    in one batched pass (each unique column costs ONE forward regardless of
    how many variants mutate it), instead of O(population x mutations) full
    forwards.

    ``msa_model``: msa_transformer.CONFIGS key — "msa-1b" for a converted
    fair-esm checkpoint (the reference's scorer), or a smaller config whose
    .npz was trained on this family with scripts/finetune_msa.py.
    """
    from ppde_tpu import runtime
    from ppde_tpu.models import msa_transformer as msat

    pp = runtime.load_potts(protein_dir)
    wt_seqs = pio.read_fasta(os.path.join(protein_dir, "wt.fasta"))
    wt = wt_seqs[0]
    lo, hi = pp.min_pos, pp.max_pos

    msa = pio.load_msa(msa_location)
    rng = np.random.default_rng(seed)
    idxs = rng.choice(len(msa), size=min(msa_size - 1, len(msa)),
                      replace=False)
    msa_rows = [msa[i][1] for i in idxs]

    params = msat.load(weights_path, allow_random=allow_random,
                       name=msa_model)

    seqs = codec.onehot_to_seqs(population)
    # collect per-variant mutations inside the window + unique masked columns
    muts_per_variant = []
    needed_cols = set()
    for s in seqs:
        muts = [(i, wt[i], s[i]) for i in range(len(wt))
                if s[i] != wt[i] and lo <= i <= hi]
        muts_per_variant.append(muts)
        needed_cols.update(i for i, _, _ in muts)

    if not needed_cols:
        return np.zeros(len(seqs))

    cols = sorted(needed_cols)
    wt_window = wt[lo:hi + 1]
    # batched masked-marginal log-probs: [n_cols, vocab]
    logp = msat.masked_marginals(params, wt_window, msa_rows,
                                 [c - lo for c in cols],
                                 heads=msat.heads_of(msa_model))
    col_to_row = {c: k for k, c in enumerate(cols)}

    scores = np.zeros(len(seqs))
    for v, muts in enumerate(muts_per_variant):
        total = 0.0
        for (i, wt_aa, mut_aa) in muts:
            row = logp[col_to_row[i]]
            total += float(row[msat.ESM_TOK_TO_IDX[mut_aa]]
                           - row[msat.ESM_TOK_TO_IDX[wt_aa]])
        scores[v] = total
    return scores


# ---------------------------------------------------------------------------
# MNIST run artifacts (reference metrics.py:103-134, mnist_sum.py:36-58)
# ---------------------------------------------------------------------------

QUANTS = [0.5, 0.6, 0.7, 0.8, 0.9]


def mnist_scores_to_csv(pred_scores, oracle_scores, method: str, args):
    import pandas as pd

    # clamp the tail: the last record sits at n_iters when the final scan
    # segment is ragged (n_iters % log_every != 0)
    xs = np.minimum(np.arange(pred_scores.shape[0]) * args.log_every,
                    args.n_iters)
    for name, scores in [("pred_sums", pred_scores),
                         ("oracle_sums", oracle_scores)]:
        q = np.quantile(scores, QUANTS, axis=1)
        df = pd.DataFrame(q.T, columns=[str(c) for c in QUANTS], index=xs)
        df.to_csv(os.path.join(args.results_path, f"{method}_{name}.csv"))


def mnist_performance_plots(pred_scores, oracle_scores, method: str, args):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    xs = np.minimum(np.arange(pred_scores.shape[0]) * args.log_every,
                    args.n_iters)
    pq = np.quantile(pred_scores, QUANTS, axis=1)
    oq = np.quantile(oracle_scores, QUANTS, axis=1)
    plt.figure()
    plt.plot(xs, pq[2], label="pred.", linestyle="--")
    plt.fill_between(xs, pq[0], pq[-1], alpha=0.1, linewidth=1)
    plt.plot(xs, oq[2], label="oracle")
    plt.fill_between(xs, oq[0], oq[-1], alpha=0.1, linewidth=1)
    plt.legend(loc="center left", bbox_to_anchor=(1.0, 0.5))
    plt.xlabel("step")
    plt.ylabel("sum")
    plt.tight_layout()
    for ext in ("pdf", "png"):
        plt.savefig(os.path.join(args.results_path, f"{method}_scores.{ext}"))
    plt.close()


def make_gif(traj, method: str, args):
    """Evolution GIF of one chain (reference mnist_sum.py:36-45)."""
    from PIL import Image

    frames = [Image.fromarray((255 * t.reshape(28, 28)).astype(np.uint8))
              .convert("P") for t in traj]
    frames[0].save(os.path.join(args.results_path, f"{method}.gif"),
                   save_all=True, append_images=frames[1:], duration=100,
                   loop=0)


def visualize_population(population, method: str, args):
    """Final-population grid image (reference mnist_sum.py:47-58)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    imgs = population.reshape(-1, 28, 28)
    n = imgs.shape[0]
    cols = 8
    rows = (n + cols - 1) // cols
    grid = np.ones((rows * 30 + 2, cols * 30 + 2))
    for i, im in enumerate(imgs):
        r, c = divmod(i, cols)
        grid[r * 30 + 2: r * 30 + 30, c * 30 + 2: c * 30 + 30] = im
    plt.figure(figsize=(6, 10))
    plt.imshow(grid, cmap="gray")
    plt.axis("off")
    for ext in ("pdf", "png"):
        plt.savefig(os.path.join(args.results_path,
                                 f"{method}_final_population.{ext}"))
    plt.close()
    np.save(os.path.join(args.results_path, f"{method}_final_population.npy"),
            imgs)
