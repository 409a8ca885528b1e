"""Held-out masked-LM cross-entropy for an ESM2 checkpoint vs random init.

Reproduces the exact validation split scripts/finetune_esm.py carves with
--val_frac/--seed (rng seed+1 over the WT-context family), then reports
training.esm_mlm_heldout_ce for the random-init config and for each given
.npz checkpoint — the before/after record when a training log was lost or
when comparing checkpoints across runs.

  tools/tpu_run.sh tools/eval_esm_heldout_ce.py \
      --msa data/proteins/UBE4B_MOUSE.a2m \
      --wt_fasta weights/UBE4B_.../wt.fasta \
      --ckpt results/esm_family/..._ckpt_4000.npz
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--msa", required=True)
    p.add_argument("--wt_fasta", required=True)
    p.add_argument("--esm_model", default="transformer-S")
    p.add_argument("--val_frac", type=float, default=0.05)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ckpt", nargs="*", default=[])
    args = p.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from ppde_tpu import io, training
    from ppde_tpu.models import esm2
    from scripts.finetune_esm import family_in_wt_context

    wt = io.read_fasta(args.wt_fasta)[0]
    seqs = family_in_wt_context(args.msa, wt)
    rng = np.random.default_rng(args.seed + 1)
    n_val = max(1, int(round(args.val_frac * len(seqs))))
    vidx = set(rng.choice(len(seqs), n_val, replace=False).tolist())
    val = [seqs[i] for i in sorted(vidx)]
    print(f"{len(val)} held-out sequences of length {len(val[0])}",
          flush=True)

    rand = esm2.init(jax.random.PRNGKey(args.seed), args.esm_model,
                     jnp.float32)
    ce = training.esm_mlm_heldout_ce(rand, val, args.esm_model)
    print(f"random-init {args.esm_model}: heldout CE {ce:.4f} "
          f"(ppl {np.exp(ce):.1f})", flush=True)
    for path in args.ckpt:
        params = esm2.load_npz_checkpoint(path, args.esm_model, jnp.float32)
        ce = training.esm_mlm_heldout_ce(params, val, args.esm_model)
        print(f"{os.path.basename(path)}: heldout CE {ce:.4f} "
              f"(ppl {np.exp(ce):.1f})", flush=True)


if __name__ == "__main__":
    main()
