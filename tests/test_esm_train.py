"""ESM2 masked-LM fine-tuning (training.train_esm_mlm) + native ckpts.

The reference has NO transformer training path (its expert is the frozen
external esm_one_hot fork, reference nets.py:172-240); these pin the
beyond-parity capability: family fine-tuning, mixed-precision cast layout,
validated npz checkpoints, dp-mesh training equality, and the
--esm_weights .npz load path into the sampler stack.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppde_tpu import codec, training
from ppde_tpu.models import esm2

TINY = dict(layers=2, dim=32, heads=4, ffn=64)
esm2.CONFIGS["mlm-tiny"] = TINY

WT = "ACDEFGHIKLMNPQRS"


def family(n=24, seed=0):
    """Synthetic family: WT plus 1-2 point mutations, fixed length."""
    rng = np.random.default_rng(seed)
    seqs = [WT]
    aas = "ACDEFGHIKLMNPQRSTVWY"
    for _ in range(n - 1):
        s = list(WT)
        for _ in range(rng.integers(1, 3)):
            s[rng.integers(len(WT))] = aas[rng.integers(20)]
        seqs.append("".join(s))
    return seqs


def test_cast_params_mixed_layout():
    p = esm2.init(jax.random.PRNGKey(0), "mlm-tiny", dtype=jnp.float32)
    c = esm2.cast_params(p, jnp.bfloat16)
    assert c["embed"].dtype == jnp.bfloat16
    assert c["layers"][0]["q"]["w"].dtype == jnp.bfloat16
    assert c["layers"][1]["fc1"]["b"].dtype == jnp.bfloat16
    assert c["lm_dense"]["w"].dtype == jnp.bfloat16
    # LayerNorm affines + lm_bias stay fp32 (numerics)
    assert c["layers"][0]["attn_ln"]["g"].dtype == jnp.float32
    assert c["final_ln"]["b"].dtype == jnp.float32
    assert c["lm_ln"]["g"].dtype == jnp.float32
    assert c["lm_bias"].dtype == jnp.float32


def test_mlm_loss_decreases_and_improves_family_pll():
    seqs = family()
    x = jnp.stack([jnp.asarray(esm2.seq_to_esm_onehot(s)) for s in seqs])

    p0 = esm2.init(jax.random.PRNGKey(1), "mlm-tiny", jnp.float32)
    pll0 = esm2.pseudo_log_likelihood(p0, x, heads=4).mean()

    params = training.train_esm_mlm(
        seqs, name="mlm-tiny", params=p0, n_iters=150, batch_size=16,
        lr=3e-3, warmup=10, seed=1, quiet=True,
        compute_dtype=jnp.float32)
    pll1 = esm2.pseudo_log_likelihood(params, x, heads=4).mean()
    # family pseudo-log-likelihood must improve substantially from random
    assert float(pll1) > float(pll0) + 5.0, (float(pll0), float(pll1))


def test_npz_checkpoint_roundtrip_and_shape_validation(tmp_path):
    seqs = family(8)
    pre = os.path.join(tmp_path, "esm")
    params = training.train_esm_mlm(
        seqs, name="mlm-tiny", n_iters=4, batch_size=4, lr=1e-3,
        warmup=1, seed=0, quiet=True, compute_dtype=jnp.float32,
        ckpt_path=pre, ckpt_every=4)
    ck = f"{pre}_ckpt_4.npz"
    assert os.path.exists(ck)

    loaded = esm2.load_npz_checkpoint(ck, "mlm-tiny", jnp.float32)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=0)

    # wrong architecture: leaf-count mismatch is named
    esm2.CONFIGS["mlm-tiny3"] = dict(TINY, layers=3)
    with pytest.raises(ValueError, match="leaves|architecture"):
        esm2.load_npz_checkpoint(ck, "mlm-tiny3", jnp.float32)
    # same tree, wrong widths: per-leaf shape is named
    esm2.CONFIGS["mlm-tiny-wide"] = dict(TINY, dim=64, ffn=128)
    with pytest.raises(ValueError, match="shape"):
        esm2.load_npz_checkpoint(ck, "mlm-tiny-wide", jnp.float32)


def test_resume_continues_from_checkpoint(tmp_path):
    seqs = family(8)
    pre = os.path.join(tmp_path, "esm")
    training.train_esm_mlm(
        seqs, name="mlm-tiny", n_iters=4, batch_size=4, warmup=1, seed=0,
        quiet=True, compute_dtype=jnp.float32, ckpt_path=pre, ckpt_every=2)
    p_resumed = training.train_esm_mlm(
        seqs, name="mlm-tiny", n_iters=4, batch_size=4, warmup=1, seed=0,
        quiet=True, compute_dtype=jnp.float32,
        resume=f"{pre}_ckpt_2.npz")
    assert p_resumed is not None  # runs the remaining 2 iters from step 2


@pytest.mark.parametrize("lora_rank", [0, 2])
def test_dp_mesh_training_matches_single_device(lora_rank):
    from ppde_tpu.parallel import mesh as pmesh

    seqs = family(16)
    kwargs = dict(name="mlm-tiny", n_iters=6, batch_size=8, lr=1e-3,
                  warmup=2, seed=3, quiet=True,
                  compute_dtype=jnp.float32, lora_rank=lora_rank)
    p_single = training.train_esm_mlm(seqs, **kwargs)
    p_mesh = training.train_esm_mlm(seqs, mesh=pmesh.make_mesh(dp=8),
                                    **kwargs)
    for a, b in zip(jax.tree.leaves(p_single), jax.tree.leaves(p_mesh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


def test_load_expert_accepts_native_npz(tmp_path):
    seqs = family(8)
    pre = os.path.join(tmp_path, "esm")
    training.train_esm_mlm(
        seqs, name="mlm-tiny", n_iters=2, batch_size=4, warmup=1, seed=0,
        quiet=True, compute_dtype=jnp.float32, ckpt_path=pre, ckpt_every=2)
    params, apply_fn = esm2.load_expert(
        "mlm-tiny", WT, weights_path=f"{pre}_ckpt_2.npz", dtype=jnp.float32)
    x = jnp.asarray(codec.seqs_to_onehot([WT, WT.replace("A", "W", 1)]))
    d = apply_fn(params, x)
    assert d.shape == (2,)
    np.testing.assert_allclose(float(d[0]), 0.0, atol=1e-4)  # WT delta = 0
    assert abs(float(d[1])) > 1e-6


def test_family_in_wt_context(tmp_path):
    """MSA rows splice into full-WT coordinates; gaps impute WT residues;
    lowercase (non-focus) columns are excluded."""
    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts"))
    import importlib

    fe = importlib.import_module("finetune_esm")
    a2m = tmp_path / "fam.a2m"
    # focus columns of the first record: 0,1,3,4 ('k' is lowercase)
    a2m.write_text(">WT/10-14\nACkDE\n>fam1\nAGz-E\n")
    wt = "ACKDE"  # full WT: focus positions carry A,C,D,E; pos 2 is WT's K
    from ppde_tpu import io as pio

    seqs = fe.family_in_wt_context(pio.load_msa(str(a2m)), str(a2m), wt)
    assert seqs[0] == wt
    # fam1 focus chars (A,G,-,E) land at full positions (0,1,3,4): G
    # substitutes at 1, the gap at focus position 3 imputes WT's 'D', and
    # non-focus position 2 keeps WT's 'K'
    assert seqs[1] == "AGKDE"


def test_seq_weights_bias_training():
    """Training with weights concentrated on one sequence should fit THAT
    sequence better than an equally-present but downweighted one."""
    a = WT
    b = "WYWYWYWYWYWYWYWY"  # same length, very different
    seqs = [a, b]
    w = np.array([1.0, 0.0], np.float32)  # b is never drawn
    params = training.train_esm_mlm(
        seqs, name="mlm-tiny", n_iters=150, batch_size=16, lr=3e-3,
        warmup=10, seed=5, quiet=True, compute_dtype=jnp.float32,
        seq_weights=w)
    x = jnp.stack([jnp.asarray(esm2.seq_to_esm_onehot(s)) for s in seqs])
    pll = esm2.pseudo_log_likelihood(params, x, heads=4)
    assert float(pll[0]) > float(pll[1]) + 5.0, np.asarray(pll)

    with pytest.raises(ValueError, match="seq_weights"):
        training.train_esm_mlm(seqs, name="mlm-tiny", n_iters=1,
                               quiet=True, seq_weights=np.ones(3))


def test_cli_reweight_on_msa(tmp_path, capsys):
    """--msa + --reweight computes phylogenetic weights (duplicated rows
    share neighborhood mass) and --max_seqs slices them consistently."""
    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts"))
    import importlib

    fe = importlib.import_module("finetune_esm")
    a2m = tmp_path / "fam.a2m"
    # 4 identical rows + 1 distinct: neighborhood sizes 4,4,4,4,1
    a2m.write_text(">f/1-5\nACDEF\n>a\nACDEF\n>b\nACDEF\n>c\nACDEF\n"
                   ">d\nWYWYW\n")
    args = fe.build_parser().parse_args(
        ["--msa", str(a2m), "--out", str(tmp_path / "x")])
    seqs, w = fe.load_family(args)
    assert len(seqs) == 5 and w.shape == (5,)
    np.testing.assert_allclose(w, [0.25] * 4 + [1.0])
    # effective sample size = 2 families
    assert abs(float(w.sum()) - 2.0) < 1e-6

    args2 = fe.build_parser().parse_args(
        ["--msa", str(a2m), "--out", str(tmp_path / "x"),
         "--max_seqs", "3", "--seed", "0"])
    seqs2, w2 = fe.load_family(args2)
    assert len(seqs2) == 3 and w2.shape == (3,)
    for s, wi in zip(seqs2, w2):
        assert abs(wi - (1.0 if s == "WYWYW" else 0.25)) < 1e-6

    args3 = fe.build_parser().parse_args(
        ["--msa", str(a2m), "--out", str(tmp_path / "x"), "--no-reweight"])
    _, w3 = fe.load_family(args3)
    assert w3 is None


def test_lora_zero_init_is_identity():
    p = esm2.init(jax.random.PRNGKey(0), "mlm-tiny", jnp.float32)
    lora = esm2.lora_init(jax.random.PRNGKey(1), "mlm-tiny", rank=4)
    merged = esm2.lora_merge(p, lora, alpha=16.0)
    for a, b in zip(jax.tree.leaves(p), jax.tree.leaves(merged)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # adapter is a small fraction of the base parameter count
    n_base = sum(a.size for a in jax.tree.leaves(p))
    n_lora = sum(a.size for a in jax.tree.leaves(lora))
    assert n_lora < 0.35 * n_base  # tiny dims; ratio shrinks with width

    esm2.CONFIGS.setdefault("mlm-tiny3", dict(TINY, layers=3))
    wrong = esm2.lora_init(jax.random.PRNGKey(1), "mlm-tiny3", rank=4)
    with pytest.raises(ValueError, match="layers"):
        esm2.lora_merge(p, wrong, 16.0)


def test_lora_adapts_pretrained_base_to_new_family(tmp_path):
    """The LoRA use case: a base trained on family A adapts to family B
    through rank-4 adapters alone (frozen base), recovering most of the
    distribution shift; adapter checkpoints are small and resumable."""
    rng = np.random.default_rng(9)
    wt_b = "WYWHKRDEQNSTGPVI"
    aas = "ACDEFGHIKLMNPQRSTVWY"
    fam_b = [wt_b] + ["".join(aas[rng.integers(20)] if rng.random() < 0.12
                              else c for c in wt_b) for _ in range(23)]
    x_b = jnp.stack([jnp.asarray(esm2.seq_to_esm_onehot(s)) for s in fam_b])

    p0 = esm2.init(jax.random.PRNGKey(1), "mlm-tiny", jnp.float32)
    base = training.train_esm_mlm(
        family(), name="mlm-tiny", params=p0, n_iters=150, batch_size=16,
        lr=3e-3, warmup=10, seed=1, quiet=True, compute_dtype=jnp.float32)
    pll_b0 = esm2.pseudo_log_likelihood(base, x_b, heads=4).mean()

    pre = os.path.join(tmp_path, "lora")
    merged = training.train_esm_mlm(
        fam_b, name="mlm-tiny", params=base, n_iters=200, batch_size=16,
        lr=1e-2, warmup=10, seed=2, quiet=True, compute_dtype=jnp.float32,
        lora_rank=4, ckpt_path=pre, ckpt_every=200)
    pll_b1 = esm2.pseudo_log_likelihood(merged, x_b, heads=4).mean()
    assert float(pll_b1) > float(pll_b0) + 8.0, (float(pll_b0),
                                                 float(pll_b1))

    # frozen-base invariant: LoRA never touches embed (delta lives only in
    # the layer matmuls), so it is bit-identical through the merge
    np.testing.assert_array_equal(np.asarray(merged["embed"]),
                                  np.asarray(base["embed"]))

    # cadence checkpoint holds the small ADAPTER tree and resumes
    ck = f"{pre}_lora_200.npz"
    assert os.path.exists(ck)
    z = np.load(ck)
    n_stored = sum(z[k].size for k in z.files if k.startswith("p"))
    n_base = sum(a.size for a in jax.tree.leaves(p0))
    assert n_stored < 0.35 * n_base
    merged2 = training.train_esm_mlm(
        fam_b, name="mlm-tiny", params=base, n_iters=210, batch_size=16,
        lr=1e-2, warmup=10, seed=2, quiet=True, compute_dtype=jnp.float32,
        lora_rank=4, resume=ck)
    pll_b2 = esm2.pseudo_log_likelihood(merged2, x_b, heads=4).mean()
    assert float(pll_b2) > float(pll_b0) + 8.0


def test_finetune_cli_lora_end_to_end(tmp_path):
    import sys

    fasta = tmp_path / "fam.fasta"
    fasta.write_text("".join(f">s{i}\n{s}\n"
                             for i, s in enumerate(family(8))))
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts"))
    import importlib

    fe = importlib.import_module("finetune_esm")
    args = fe.build_parser().parse_args([
        "--fasta", str(fasta), "--esm_model", "mlm-tiny",
        "--out", str(tmp_path / "ck"), "--n_iters", "2",
        "--batch_size", "4", "--warmup", "1", "--log_every", "2",
        "--ckpt_every", "2", "--lora_rank", "2"])
    fe.main(args)
    # merged full model emitted under the uniform --esm_weights contract
    merged = tmp_path / "ck_ckpt_2.npz"
    assert merged.exists()
    params, apply_fn = esm2.load_expert(
        "mlm-tiny", WT, weights_path=str(merged), dtype=jnp.float32)
    d = apply_fn(params, jnp.asarray(codec.seqs_to_onehot([WT])))
    np.testing.assert_allclose(float(d[0]), 0.0, atol=1e-4)
    assert (tmp_path / "ck_lora_2.npz").exists()


def test_finetune_cli_end_to_end(tmp_path, capsys):
    """scripts/finetune_esm.py on a tiny FASTA -> loadable checkpoint,
    with --val_frac holding out rows and reporting masked CE around
    training (training.esm_mlm_heldout_ce)."""
    import sys

    fasta = tmp_path / "fam.fasta"
    fasta.write_text("".join(f">s{i}\n{s}\n"
                             for i, s in enumerate(family(8))))
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts"))
    import importlib

    fe = importlib.import_module("finetune_esm")
    args = fe.build_parser().parse_args([
        "--fasta", str(fasta), "--esm_model", "mlm-tiny",
        "--out", str(tmp_path / "ck"), "--n_iters", "2",
        "--batch_size", "4", "--warmup", "1", "--log_every", "2",
        "--ckpt_every", "2", "--val_frac", "0.25"])
    fe.main(args)
    assert (tmp_path / "ck_ckpt_2.npz").exists()
    out = capsys.readouterr().out
    assert "(+2 held out)" in out
    assert "held-out masked CE before:" in out
    assert "held-out masked CE after:" in out


def test_heldout_ce_is_deterministic_and_improves_with_training():
    seqs = family(16)
    p0 = esm2.init(jax.random.PRNGKey(1), "mlm-tiny", jnp.float32)
    ce0a = training.esm_mlm_heldout_ce(p0, seqs, name="mlm-tiny",
                                       compute_dtype=jnp.float32)
    ce0b = training.esm_mlm_heldout_ce(p0, seqs, name="mlm-tiny",
                                       compute_dtype=jnp.float32)
    assert ce0a == ce0b  # fixed seed -> identical masks
    trained = training.train_esm_mlm(
        seqs, name="mlm-tiny", params=p0, n_iters=120, batch_size=16,
        lr=3e-3, warmup=10, seed=1, quiet=True,
        compute_dtype=jnp.float32)
    ce1 = training.esm_mlm_heldout_ce(trained, seqs, name="mlm-tiny",
                                      compute_dtype=jnp.float32)
    assert ce1 < ce0a - 0.5, (ce0a, ce1)
