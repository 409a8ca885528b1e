"""Fine-tune an ESM2 transformer expert on a protein family MSA.

The reference consumes a frozen external ESM2 fork (reference
nets.py:172-240, environment.yml:22) — its transformer expert cannot be
made family-specific. This script closes that gap natively: masked-LM
fine-tuning (training.train_esm_mlm) on the .a2m alignment the Potts
expert is already fit from, producing a .npz checkpoint that
`directed_evolution.py --unsupervised_expert transformer-S --esm_weights out.npz`
loads directly (esm2.load_npz_checkpoint, per-leaf validated).

Examples:
  # family-specific from scratch (offline; no fair-esm weights needed)
  python scripts/finetune_esm.py --msa data/proteins/UBE4B_MOUSE.a2m \
      --esm_model transformer-S --out results/esm_ube4b --n_iters 5000
  # fine-tune the published 35M model when a fair-esm .pt is available
  python scripts/finetune_esm.py --msa ... --esm_weights esm2_t12_35M.pt \
      --esm_model transformer-S --out results/esm_ube4b_ft
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--msa", type=str, default=None,
                     help=".a2m MSA; trains on focus columns (gaps map to "
                          "the ESM '-' token), the same view the Potts fit "
                          "uses")
    src.add_argument("--fasta", type=str, default=None,
                     help="FASTA of equal-length unaligned sequences")
    p.add_argument("--wt_fasta", type=str, default=None,
                   help="with --msa: embed each family row's focus-column "
                        "residues into this full wild-type sequence (gaps "
                        "impute the WT residue), so training sequences are "
                        "full-length and gap-free — the exact input format "
                        "the expert scores at sampling time "
                        "(runtime.build_protein_energy passes the full WT "
                        "to esm2.load_expert)")
    p.add_argument("--esm_model", type=str, default="transformer-S",
                   help="an esm2.CONFIGS key (transformer-S/M/L, or a "
                        "registered custom config)")
    p.add_argument("--esm_weights", type=str, default=None,
                   help="base checkpoint to fine-tune: fair-esm .pt or a "
                        "native .npz; omit to train from random init")
    p.add_argument("--out", type=str, required=True,
                   help="checkpoint prefix; writes <out>_ckpt_<step>.npz")
    p.add_argument("--n_iters", type=int, default=5000)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--warmup", type=int, default=100)
    p.add_argument("--weight_decay", type=float, default=0.01)
    p.add_argument("--mask_prob", type=float, default=0.15)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log_every", type=int, default=100)
    p.add_argument("--ckpt_every", type=int, default=1000)
    p.add_argument("--resume", type=str, default=None,
                   help="resume from a <out>_ckpt_<step>.npz")
    p.add_argument("--max_seqs", type=int, default=0,
                   help="subsample the family to this many sequences "
                        "(0 = all)")
    p.add_argument("--reweight", default=True,
                   action=argparse.BooleanOptionalAction,
                   help="with --msa: draw training batches with "
                        "1/neighborhood-size phylogenetic weights at "
                        "--reweight_identity (potts_fit.sequence_weights "
                        "— the same debiasing the Potts fit uses); "
                        "--no-reweight samples rows uniformly")
    p.add_argument("--reweight_identity", type=float, default=0.8)
    p.add_argument("--lora_rank", type=int, default=0,
                   help="train rank-N LoRA adapters over a frozen base "
                        "instead of full fine-tuning (~1%% trainable at "
                        "rank 8 on transformer-L — fits 650M + optimizer "
                        "on one chip); the final <out>_ckpt_<n>.npz is "
                        "the MERGED full model either way")
    p.add_argument("--lora_alpha", type=float, default=16.0)
    p.add_argument("--val_frac", type=float, default=0.0,
                   help="hold out this fraction of the family (after "
                        "--max_seqs) and report masked-LM cross-entropy "
                        "on it before and after training "
                        "(training.esm_mlm_heldout_ce)")
    p.add_argument("--mesh_dp", type=int, default=0,
                   help="data-parallel training over a dp mesh of this "
                        "size (0 = single device)")
    return p


def family_in_wt_context(rows, msa_path: str, wt_seq: str) -> list[str]:
    """Embed each MSA row's focus-column residues into the full wild type.

    The expert scores FULL-length gap-free sequences (the sampler's state),
    while the MSA's focus columns cover only the aligned window — training
    directly on focus columns would teach a different sequence length and
    token distribution than scoring sees. This splices each family row into
    WT coordinates: focus column j of the alignment sits at full-sequence
    position focus_columns()[j]; alignment gaps impute the WT residue.
    ``rows``: the already-loaded io.load_msa(msa_path) pairs (the alignment
    is parsed once by the caller; focus_columns reads only the first
    record's header block).
    """
    from ppde_tpu import io

    fc = io.focus_columns(msa_path)
    if fc and fc[-1] >= len(wt_seq):
        raise SystemExit(
            f"--wt_fasta sequence (len {len(wt_seq)}) does not span the "
            f"MSA focus columns (max index {fc[-1]}) — wrong wild type "
            "for this alignment?")
    wt_focus = "".join(wt_seq[j] for j in fc)
    if rows[0][1].replace("-", "") != wt_focus.replace("-", "") and \
            rows[0][1] != wt_focus:
        print("[finetune_esm] warning: MSA focus sequence != WT at focus "
              "columns; proceeding (check --wt_fasta)", flush=True)
    out = []
    for _, row in rows:
        s = list(wt_seq)
        for j, c in zip(fc, row):
            if c != "-":
                s[j] = c
        out.append("".join(s))
    return out


def load_family(args):
    """-> (seqs, weights-or-None). Weights come from the FOCUS-COLUMN
    identity view (potts_fit.sequence_weights on the alignment itself) so
    they measure family redundancy, not shared WT context."""
    from ppde_tpu import io

    weights = None
    if args.msa:
        rows = io.load_msa(args.msa)
        if getattr(args, "reweight", False):
            from ppde_tpu.models import potts_fit

            weights = potts_fit.sequence_weights(
                potts_fit.msa_to_onehot(rows),
                identity=args.reweight_identity)
            print(f"[finetune_esm] phylogenetic reweighting: effective "
                  f"sample size {weights.sum():.1f} of {len(rows)}",
                  flush=True)
        if args.wt_fasta:
            wt = io.read_fasta(args.wt_fasta)[0]
            seqs = family_in_wt_context(rows, args.msa, wt)
        else:
            seqs = [s for _, s in rows]
    else:
        seqs = io.read_fasta(args.fasta)
        if len({len(s) for s in seqs}) != 1:
            raise SystemExit("--fasta sequences must be equal length "
                             "(use --msa for alignments)")
    if args.max_seqs and len(seqs) > args.max_seqs:
        import numpy as np

        rng = np.random.default_rng(args.seed)
        keep = rng.choice(len(seqs), args.max_seqs, replace=False)
        seqs = [seqs[i] for i in keep]
        if weights is not None:
            weights = weights[keep]
    return seqs, weights


def main(args):
    import jax.numpy as jnp

    from ppde_tpu import training
    from ppde_tpu.models import esm2

    import numpy as np

    seqs, weights = load_family(args)
    val = None
    if args.val_frac > 0:
        rng = np.random.default_rng(args.seed + 1)
        n_val = max(1, int(round(args.val_frac * len(seqs))))
        vidx = set(rng.choice(len(seqs), n_val, replace=False).tolist())
        val = [seqs[i] for i in sorted(vidx)]
        seqs = [s for i, s in enumerate(seqs) if i not in vidx]
        if weights is not None:
            weights = np.asarray(
                [w for i, w in enumerate(weights) if i not in vidx])
    print(f"[finetune_esm] {len(seqs)} sequences of length {len(seqs[0])}"
          + (f" (+{len(val)} held out)" if val else ""), flush=True)

    params = None
    if args.esm_weights:
        if args.esm_weights.endswith(".npz"):
            params = esm2.load_npz_checkpoint(args.esm_weights,
                                              args.esm_model, jnp.float32)
        else:
            params = esm2.load_torch_checkpoint(args.esm_weights,
                                                args.esm_model, jnp.float32)

    mesh = None
    if args.mesh_dp > 1:
        from ppde_tpu.parallel import mesh as pmesh

        mesh = pmesh.make_mesh(dp=args.mesh_dp)

    def report_val(p, tag):
        if val is None or p is None:
            return
        ce = training.esm_mlm_heldout_ce(
            p, val, name=args.esm_model, seed=args.seed)
        print(f"[finetune_esm] held-out masked CE {tag}: {ce:.4f} "
              f"(ppl {np.exp(ce):.2f})", flush=True)

    if val is not None:
        import jax

        from ppde_tpu.models import esm2 as _e

        report_val(params if params is not None else
                   _e.init(jax.random.PRNGKey(args.seed), args.esm_model,
                           jnp.float32), "before")

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    params = training.train_esm_mlm(
        seqs, name=args.esm_model, params=params, n_iters=args.n_iters,
        batch_size=args.batch_size, lr=args.lr, warmup=args.warmup,
        weight_decay=args.weight_decay, mask_prob=args.mask_prob,
        seed=args.seed, log_every=args.log_every, ckpt_path=args.out,
        ckpt_every=args.ckpt_every, resume=args.resume, mesh=mesh,
        seq_weights=weights, lora_rank=args.lora_rank,
        lora_alpha=args.lora_alpha)
    final = f"{args.out}_ckpt_{args.n_iters}.npz"
    if args.lora_rank:
        # cadence checkpoints hold adapters (_lora_<step>.npz, for
        # --resume); emit the merged full model under the uniform contract
        esm2.save_npz_checkpoint(final, params, args.n_iters)
    report_val(params, "after")
    print(f"[finetune_esm] done; load with --esm_weights {final}",
          flush=True)
    return params


if __name__ == "__main__":
    main(build_parser().parse_args())
