"""MSA-Transformer masked-LM training (training.train_msa_mlm).

The reference's evolutionary-density scorer is the FROZEN pre-trained
esm_msa1b model (reference metrics.py:22-76) — unavailable offline. These
tests pin the native replacement: train a small axial-attention MSA-T on
the family alignment itself, checkpoint it, and score populations through
metrics.proteins_transformer_score with the trained weights.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppde_tpu import codec, training
from ppde_tpu.models import esm2, msa_transformer as msat

AAS = "ACDEFGHIKLMNPQRSTVWY"
WT = "ACDEFGHIKL"


def family_msa(n=48, seed=0):
    """Synthetic alignment with strong column consensus: column i is WT[i]
    with p=0.85, a random AA otherwise; a few gap columns in later rows."""
    rng = np.random.default_rng(seed)
    rows = [WT]
    for _ in range(n - 1):
        s = [c if rng.random() < 0.85 else AAS[rng.integers(20)]
             for c in WT]
        if rng.random() < 0.2:
            s[rng.integers(len(WT))] = "-"
        rows.append("".join(s))
    return rows


def test_cast_params_mixed_layout():
    p = msat.init(jax.random.PRNGKey(0), jnp.float32, name="msa-tiny")
    c = msat.cast_params(p, jnp.bfloat16)
    assert c["embed"].dtype == jnp.bfloat16
    assert c["layers"][0]["row"]["q"]["w"].dtype == jnp.bfloat16
    assert c["layers"][1]["fc1"]["b"].dtype == jnp.bfloat16
    assert c["lm_dense"]["w"].dtype == jnp.bfloat16
    # LayerNorm affines + lm_bias stay fp32
    assert c["layers"][0]["row_ln"]["g"].dtype == jnp.float32
    assert c["layers"][0]["col_ln"]["b"].dtype == jnp.float32
    assert c["ln_before"]["g"].dtype == jnp.float32
    assert c["ln_after"]["b"].dtype == jnp.float32
    assert c["lm_ln"]["g"].dtype == jnp.float32
    assert c["lm_bias"].dtype == jnp.float32


def test_train_reduces_heldout_ce_and_learns_consensus():
    rows = family_msa()
    train, val = rows[:40], rows[40:]

    p0 = msat.init(jax.random.PRNGKey(1), jnp.float32, name="msa-tiny")
    ce0 = training.msa_mlm_heldout_ce(p0, val, name="msa-tiny",
                                      block_rows=8, seed=0,
                                      compute_dtype=jnp.float32)
    params = training.train_msa_mlm(
        train, name="msa-tiny", params=p0, n_iters=200, block_rows=8,
        lr=3e-3, warmup=10, seed=1, quiet=True,
        compute_dtype=jnp.float32)
    ce1 = training.msa_mlm_heldout_ce(params, val, name="msa-tiny",
                                      block_rows=8, seed=0,
                                      compute_dtype=jnp.float32)
    # held-out masked CE must drop well below the random-init level
    assert ce1 < ce0 - 0.5, (ce0, ce1)

    # masked marginals at a conserved column put the consensus AA on top
    # among canonical AAs (specials can soak probability in a tiny model)
    lp = msat.masked_marginals(params, WT, train[1:9], [3],
                               heads=msat.heads_of("msa-tiny"))
    aa_idx = [esm2.ESM_TOK_TO_IDX[a] for a in AAS]
    best_aa = AAS[int(np.argmax(lp[0][aa_idx]))]
    assert best_aa == WT[3], (best_aa, WT[3])


def test_npz_checkpoint_roundtrip_and_shape_validation(tmp_path):
    rows = family_msa(12)
    pre = os.path.join(tmp_path, "msat")
    params = training.train_msa_mlm(
        rows, name="msa-tiny", n_iters=4, block_rows=4, warmup=1, seed=0,
        quiet=True, compute_dtype=jnp.float32, ckpt_path=pre, ckpt_every=4)
    ck = f"{pre}_ckpt_4.npz"
    assert os.path.exists(ck)

    loaded = msat.load_npz_checkpoint(ck, "msa-tiny", jnp.float32)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=0)
    # the generic loader routes .npz to the native path
    loaded2 = msat.load(ck, name="msa-tiny", dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(loaded2["embed"]),
                               np.asarray(loaded["embed"]))

    # wrong architecture: leaf-count mismatch is named
    msat.CONFIGS["msa-tiny3"] = dict(msat.CONFIGS["msa-tiny"], layers=3)
    with pytest.raises(ValueError, match="leaves|architecture"):
        msat.load_npz_checkpoint(ck, "msa-tiny3", jnp.float32)
    # same tree, wrong widths: per-leaf shape is named
    msat.CONFIGS["msa-tiny-wide"] = dict(msat.CONFIGS["msa-tiny"],
                                         dim=64, ffn=128)
    with pytest.raises(ValueError, match="shape"):
        msat.load_npz_checkpoint(ck, "msa-tiny-wide", jnp.float32)


def test_resume_continues_from_checkpoint(tmp_path):
    rows = family_msa(12)
    pre = os.path.join(tmp_path, "msat")
    training.train_msa_mlm(
        rows, name="msa-tiny", n_iters=4, block_rows=4, warmup=1, seed=0,
        quiet=True, compute_dtype=jnp.float32, ckpt_path=pre, ckpt_every=2)
    p_resumed = training.train_msa_mlm(
        rows, name="msa-tiny", n_iters=4, block_rows=4, warmup=1, seed=0,
        quiet=True, compute_dtype=jnp.float32,
        resume=f"{pre}_ckpt_2.npz")
    assert p_resumed is not None  # runs the remaining 2 iters from step 2


def test_seq_weights_bias_training():
    """Row weights concentrated on one sub-family should fit it better."""
    a_rows = [WT] * 8
    b = "WYWYWYWYWY"
    rows = a_rows + [b] * 8
    w = np.array([1.0] * 8 + [0.0] * 8, np.float32)  # b never drawn
    params = training.train_msa_mlm(
        rows, name="msa-tiny", n_iters=150, block_rows=8, lr=3e-3,
        warmup=10, seed=5, quiet=True, compute_dtype=jnp.float32,
        seq_weights=w)
    # mean unmasked log-prob of each row type under the trained model
    toks = jnp.asarray(msat.tokenize_msa([WT, b]))
    lp = jax.nn.log_softmax(
        msat.forward_logits(params, toks[None],
                            msat.heads_of("msa-tiny"))[0], -1)
    tgt = jax.nn.one_hot(toks, esm2.ESM_VOCAB)
    row_lp = jnp.sum(tgt * lp, (-1, -2))  # [2] per-row total log-prob
    assert float(row_lp[0]) > float(row_lp[1]) + 5.0, np.asarray(row_lp)

    with pytest.raises(ValueError, match="seq_weights"):
        training.train_msa_mlm(rows, name="msa-tiny", n_iters=1,
                               quiet=True, seq_weights=np.ones(3))


def test_metric_accepts_trained_npz(tmp_path):
    """End to end: train -> npz -> proteins_transformer_score, and the
    family-trained scorer ranks a consensus-matching mutant above an
    anti-consensus one."""
    from ppde_tpu import metrics

    rows = family_msa(32, seed=3)
    pre = os.path.join(tmp_path, "msat")
    training.train_msa_mlm(
        rows, name="msa-tiny", n_iters=200, block_rows=8, lr=3e-3,
        warmup=10, seed=2, quiet=True, compute_dtype=jnp.float32,
        ckpt_path=pre, ckpt_every=200)
    ck = f"{pre}_ckpt_200.npz"

    protein_dir = tmp_path / "prot"
    protein_dir.mkdir()
    (protein_dir / "wt.fasta").write_text(f">wt/1-{len(WT)}\n{WT}\n")
    msa_path = tmp_path / "m.a2m"
    msa_path.write_text(
        "".join(f">r{i}\n{r}\n" for i, r in enumerate(rows)))

    pop = codec.seqs_to_onehot([WT, "WCDEFGHIKL"])
    scores = metrics.proteins_transformer_score(
        np.asarray(pop), str(protein_dir), str(msa_path), msa_size=9,
        weights_path=ck, msa_model="msa-tiny")
    assert scores.shape == (2,)
    assert scores[0] == 0.0          # WT: no mutations
    assert scores[1] < 0.0, scores   # anti-consensus mutant is penalized


def test_cli_finetune_msa(tmp_path, capsys):
    """scripts/finetune_msa.py end to end: reweighting, val holdout,
    checkpoint emission."""
    import importlib
    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts"))
    fm = importlib.import_module("finetune_msa")

    rows = family_msa(20, seed=7)
    a2m = tmp_path / "fam.a2m"
    a2m.write_text("".join(f">r{i}/1-{len(WT)}\n{r}\n"
                           for i, r in enumerate(rows)))
    out = tmp_path / "msat"
    args = fm.build_parser().parse_args([
        "--msa", str(a2m), "--msa_model", "msa-tiny", "--out", str(out),
        "--n_iters", "8", "--block_rows", "4", "--warmup", "2",
        "--log_every", "4", "--ckpt_every", "8", "--val_frac", "0.1"])
    fm.main(args)
    assert os.path.exists(f"{out}_ckpt_8.npz")
    text = capsys.readouterr().out
    assert "phylogenetic reweighting" in text
    assert "held-out masked CE before" in text
    assert "held-out masked CE after" in text
