"""Correlate each energy expert's scores with the oracle over random mutants.

The reference never measures its experts' agreement with the ground-truth
oracle it optimizes against (its Tables 1-2 cite published model/assay
correlations; reference README.md tables); this script measures it directly
in-framework: sample mutants inside the Potts window, score them with every
available expert — Potts delta-hamiltonian (potts.score), transformer
delta-PLL (esm2.load_expert), supervised CNN ensemble mean
(cnn.ensemble_apply) — and report Spearman rank correlation against the
Augmented-EVmutation oracle (models/oracle.py) that drives every sweep.

Primary use: quantifying what family fine-tuning buys the transformer
expert (scripts/finetune_esm.py) —

  python scripts/eval_expert_correlation.py \
      --protein UBE4B_MOUSE_Klevit2013-nscor_log2_ratio \
      --esm_model transformer-S --esm_weights results/esm_ube4b_ckpt_5000.npz

prints rho for potts / cnn / transformer on the same mutant set, so
random-init vs fine-tuned checkpoints are directly comparable.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--protein_weights", type=str, default="weights")
    p.add_argument("--protein", type=str, required=True)
    p.add_argument("--n_mutants", type=int, default=512)
    p.add_argument("--max_mutations", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--esm_model", type=str, default=None,
                   help="esm2.CONFIGS key; enables the transformer column")
    p.add_argument("--esm_weights", type=str, default=None,
                   help=".npz (finetune_esm output) or fair-esm .pt; "
                        "omit with --esm_model for random init (the "
                        "baseline the fine-tune should beat)")
    p.add_argument("--esm_chunk", type=int, default=64,
                   help="transformer scoring batch (memory bound)")
    p.add_argument("--msat_model", type=str, default=None,
                   help="msa_transformer.CONFIGS key; enables the "
                        "evolutionary-density column "
                        "(metrics.proteins_transformer_score)")
    p.add_argument("--msat_weights", type=str, default=None,
                   help="family-trained .npz (finetune_msa output) or "
                        "fair-esm msa1b .pt; omit with --msat_model for "
                        "random init (the baseline training should beat)")
    p.add_argument("--msa_path", type=str, default=None,
                   help="family alignment for the MSA-T context rows")
    p.add_argument("--msa_size", type=int, default=500)
    p.add_argument("--out_json", type=str, default=None)
    return p


def spearman(a, b) -> float:
    import numpy as np

    ra = np.argsort(np.argsort(a)).astype(np.float64)
    rb = np.argsort(np.argsort(b)).astype(np.float64)
    ra -= ra.mean()
    rb -= rb.mean()
    d = float(np.sqrt((ra * ra).sum() * (rb * rb).sum()))
    return float((ra * rb).sum() / d) if d else 0.0


def sample_mutants(wt_int, min_pos, max_pos, n, max_mut, seed):
    """[n, L] int mutants: 1..max_mut distinct in-window substitutions."""
    import numpy as np

    rng = np.random.default_rng(seed)
    out = np.tile(wt_int, (n, 1))
    window = np.arange(min_pos, max_pos + 1)
    for i in range(n):
        k = int(rng.integers(1, max_mut + 1))
        pos = rng.choice(window, size=min(k, len(window)), replace=False)
        for j in pos:
            out[i, j] = (wt_int[j] + int(rng.integers(1, 20))) % 20
    return out


def main(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ppde_tpu import codec, io as pio, runtime
    from ppde_tpu.models import cnn, oracle as oracle_mod, potts as potts_mod

    protein_dir = os.path.join(args.protein_weights, args.protein)
    wt = pio.read_fasta(os.path.join(protein_dir, "wt.fasta"))[0]
    wt_int = np.asarray([codec.AA_TO_INT[c] for c in wt], np.int32)

    pp = runtime.load_potts(protein_dir)
    muts = sample_mutants(wt_int, pp.min_pos, pp.max_pos,
                          args.n_mutants, args.max_mutations, args.seed)
    x = jnp.asarray(jax.nn.one_hot(muts, codec.VOCAB_SIZE,
                                   dtype=jnp.float32))
    n_mut = (muts != wt_int[None]).sum(-1)
    print(f"[eval_expert] {args.n_mutants} mutants, "
          f"{np.bincount(n_mut)[1:]} by mutation count", flush=True)

    orc = oracle_mod.load(protein_dir, potts_params=pp)
    y = np.asarray(jax.jit(oracle_mod.apply)(orc, x))

    scores = {"potts": np.asarray(potts_mod.score(pp, x, delta=True))}

    sup = runtime.load_supervised_ensemble(protein_dir)
    scores["cnn_ensemble"] = np.asarray(jax.jit(cnn.ensemble_apply)(sup, x))

    if args.esm_model:
        from ppde_tpu.models import esm2

        params, apply_fn = esm2.load_expert(
            args.esm_model, wt, weights_path=args.esm_weights,
            allow_random=args.esm_weights is None)
        fn = jax.jit(apply_fn)
        # pad the ragged tail chunk to esm_chunk: a second program SHAPE
        # costs ~3-4 min through the remote-compile tunnel (CLAUDE.md)
        cs = []
        for s in range(0, args.n_mutants, args.esm_chunk):
            xc = x[s:s + args.esm_chunk]
            short = args.esm_chunk - xc.shape[0]
            if short:
                xc = jnp.concatenate([xc, jnp.repeat(xc[:1], short, 0)])
            cs.append(np.asarray(fn(params, xc))[:args.esm_chunk - short])
        tag = ("transformer_finetuned" if args.esm_weights
               else "transformer_random")
        scores[tag] = np.concatenate(cs)

    if args.msat_model:
        from ppde_tpu import metrics

        if not args.msa_path:
            raise SystemExit("--msat_model needs --msa_path (the family "
                             "alignment provides the MSA-T context rows)")
        tag = ("msat_trained" if args.msat_weights else "msat_random")
        scores[tag] = metrics.proteins_transformer_score(
            np.asarray(x), protein_dir, args.msa_path, args.msa_size,
            weights_path=args.msat_weights,
            allow_random=args.msat_weights is None,
            msa_model=args.msat_model, seed=args.seed)

    result = {"protein": args.protein, "n_mutants": args.n_mutants,
              "max_mutations": args.max_mutations, "seed": args.seed,
              "esm_weights": args.esm_weights,
              "spearman_vs_oracle": {}, "spearman_by_n_mut": {}}
    for k, v in scores.items():
        rho = spearman(v, y)
        result["spearman_vs_oracle"][k] = rho
        by_k = {}
        for m in range(1, args.max_mutations + 1):
            idx = n_mut == m
            if idx.sum() >= 8:
                by_k[m] = spearman(v[idx], y[idx])
        result["spearman_by_n_mut"][k] = by_k
        detail = " ".join(f"k={m}:{r:+.3f}" for m, r in by_k.items())
        print(f"[eval_expert] spearman(oracle, {k}) = {rho:+.4f}  "
              f"[{detail}]", flush=True)
    # experts' mutual agreement (the PoE terms should not be redundant)
    keys = list(scores)
    for i, a in enumerate(keys):
        for b in keys[i + 1:]:
            result["spearman_vs_oracle"][f"{a}~{b}"] = spearman(
                scores[a], scores[b])

    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump(result, f, indent=1)
        print(f"[eval_expert] wrote {args.out_json}", flush=True)
    return result


if __name__ == "__main__":
    main(build_parser().parse_args())
