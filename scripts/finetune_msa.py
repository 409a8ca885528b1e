"""Train a family-specific MSA-Transformer evolutionary-density scorer.

The reference scores populations with the FROZEN pre-trained esm_msa1b
model (reference metrics.py:22-76) — unavailable offline. This script is
the native replacement: masked-LM training (training.train_msa_mlm) of a
small axial-attention MSA-Transformer (msa_transformer.CONFIGS) on the
protein's own .a2m, producing a .npz that the scoring path loads:

  python scripts/finetune_msa.py --msa data/proteins/UBE4B_MOUSE.a2m \
      --msa_model msa-S --out results/msat_ube4b --n_iters 3000
  python scripts/directed_evolution.py ... \
      --msa_transformer_weights results/msat_ube4b_ckpt_3000.npz \
      --msa_transformer_model msa-S

Training view = scoring view: raw focus-column alignment rows (gaps are
the ESM '-' token), exactly what masked_marginals tokenizes at eval time.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--msa", type=str, required=True,
                   help=".a2m alignment; trains on focus-column rows")
    p.add_argument("--msa_model", type=str, default="msa-S",
                   help="an msa_transformer.CONFIGS key (msa-S, msa-1b, or "
                        "a registered custom config)")
    p.add_argument("--msa_transformer_weights", type=str, default=None,
                   help="base checkpoint to fine-tune: fair-esm msa1b .pt "
                        "(msa-1b only) or a native .npz; omit to train "
                        "from random init")
    p.add_argument("--out", type=str, required=True,
                   help="checkpoint prefix; writes <out>_ckpt_<step>.npz")
    p.add_argument("--n_iters", type=int, default=3000)
    p.add_argument("--block_rows", type=int, default=16,
                   help="alignment rows per training block (the R axis of "
                        "the axial attention)")
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--warmup", type=int, default=100)
    p.add_argument("--weight_decay", type=float, default=0.01)
    p.add_argument("--mask_prob", type=float, default=0.15)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log_every", type=int, default=100)
    p.add_argument("--ckpt_every", type=int, default=1000)
    p.add_argument("--resume", type=str, default=None)
    p.add_argument("--max_seqs", type=int, default=0,
                   help="subsample the family to this many rows (0 = all)")
    p.add_argument("--reweight", default=True,
                   action=argparse.BooleanOptionalAction,
                   help="draw training rows with 1/neighborhood-size "
                        "phylogenetic weights (potts_fit.sequence_weights)")
    p.add_argument("--reweight_identity", type=float, default=0.8)
    p.add_argument("--val_frac", type=float, default=0.0,
                   help="hold out this fraction of rows and report masked "
                        "CE before/after (training.msa_mlm_heldout_ce)")
    return p


def main(args):
    import numpy as np

    from ppde_tpu import io, training
    from ppde_tpu.models import msa_transformer as msat

    pairs = io.load_msa(args.msa)  # parse the alignment once
    rows = [s for _, s in pairs]
    weights = None
    if args.reweight:
        from ppde_tpu.models import potts_fit

        weights = potts_fit.sequence_weights(
            potts_fit.msa_to_onehot(pairs),
            identity=args.reweight_identity)
        print(f"[finetune_msa] phylogenetic reweighting: effective sample "
              f"size {weights.sum():.1f} of {len(rows)}", flush=True)
    if args.max_seqs and len(rows) > args.max_seqs:
        rng = np.random.default_rng(args.seed)
        keep = rng.choice(len(rows), args.max_seqs, replace=False)
        rows = [rows[i] for i in keep]
        if weights is not None:
            weights = weights[keep]

    val = None
    if args.val_frac > 0:
        rng = np.random.default_rng(args.seed + 1)
        n_val = max(1, int(round(args.val_frac * len(rows))))
        vidx = set(rng.choice(len(rows), n_val, replace=False).tolist())
        val = [rows[i] for i in sorted(vidx)]
        rows = [r for i, r in enumerate(rows) if i not in vidx]
        if weights is not None:
            weights = np.asarray(
                [w for i, w in enumerate(weights) if i not in vidx])
    print(f"[finetune_msa] {len(rows)} rows of width {len(rows[0])}"
          + (f" (+{len(val)} held out)" if val else ""), flush=True)

    params = None
    if args.msa_transformer_weights:
        import jax.numpy as jnp

        params = msat.load(args.msa_transformer_weights,
                           dtype=jnp.float32, name=args.msa_model)

    def report_val(p, tag):
        if val is None or p is None:
            return
        ce = training.msa_mlm_heldout_ce(
            p, val, name=args.msa_model, block_rows=args.block_rows,
            seed=args.seed)
        print(f"[finetune_msa] held-out masked CE {tag}: {ce:.4f} "
              f"(ppl {np.exp(ce):.2f})", flush=True)

    if val is not None:
        import jax
        import jax.numpy as jnp

        report_val(params if params is not None else
                   msat.init(jax.random.PRNGKey(args.seed), jnp.float32,
                             name=args.msa_model), "before")

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    params = training.train_msa_mlm(
        rows, name=args.msa_model, params=params, n_iters=args.n_iters,
        block_rows=args.block_rows, lr=args.lr, warmup=args.warmup,
        weight_decay=args.weight_decay, mask_prob=args.mask_prob,
        seed=args.seed, log_every=args.log_every, ckpt_path=args.out,
        ckpt_every=args.ckpt_every, resume=args.resume,
        seq_weights=weights)
    report_val(params, "after")
    final = f"{args.out}_ckpt_{args.n_iters}.npz"
    print(f"[finetune_msa] done; score with --msa_transformer_weights "
          f"{final} --msa_transformer_model {args.msa_model}", flush=True)
    return params


if __name__ == "__main__":
    main(build_parser().parse_args())
