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


def test_dp_mesh_training_matches_single_device():
    from ppde_tpu.parallel import mesh as pmesh

    seqs = family(16)
    kwargs = dict(name="mlm-tiny", n_iters=6, batch_size=8, lr=1e-3,
                  warmup=2, seed=3, quiet=True,
                  compute_dtype=jnp.float32)
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
    seqs = fe.family_in_wt_context(str(a2m), wt)
    assert seqs[0] == wt
    # fam1 focus chars (A,G,-,E) land at full positions (0,1,3,4): G
    # substitutes at 1, the gap at focus position 3 imputes WT's 'D', and
    # non-focus position 2 keeps WT's 'K'
    assert seqs[1] == "AGKDE"


def test_finetune_cli_end_to_end(tmp_path):
    """scripts/finetune_esm.py on a tiny FASTA -> loadable checkpoint."""
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
        "--ckpt_every", "2"])
    fe.main(args)
    assert (tmp_path / "ck_ckpt_2.npz").exists()
