"""Expert-vs-oracle correlation script (scripts/eval_expert_correlation.py).

Runs on the real UBE4B artifacts (wt.fasta, 20 linear pkls, refit
potts.npz, 3 OnehotCNN checkpoints) — the same files the sweeps use.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))
import importlib

eec = importlib.import_module("eval_expert_correlation")

UBE4B = "UBE4B_MOUSE_Klevit2013-nscor_log2_ratio"


def test_spearman_matches_definition():
    rng = np.random.default_rng(0)
    a = rng.normal(size=100)
    assert abs(eec.spearman(a, a) - 1.0) < 1e-12
    assert abs(eec.spearman(a, -a) + 1.0) < 1e-12
    b = rng.normal(size=100)
    # agreement with the rank-Pearson definition
    ra = np.argsort(np.argsort(a))
    rb = np.argsort(np.argsort(b))
    ref = np.corrcoef(ra, rb)[0, 1]
    assert abs(eec.spearman(a, b) - ref) < 1e-12


def test_sample_mutants_respects_window_and_counts():
    wt = np.arange(30, dtype=np.int32) % 20
    muts = eec.sample_mutants(wt, 5, 14, n=64, max_mut=3, seed=1)
    diff = muts != wt[None]
    assert diff.any(1).all()                      # every row mutated
    assert (diff.sum(1) <= 3).all()
    changed_cols = np.where(diff.any(0))[0]
    assert changed_cols.min() >= 5 and changed_cols.max() <= 14
    assert (muts >= 0).all() and (muts < 20).all()


def test_end_to_end_on_ube4b(tmp_path):
    from ppde_tpu.models import esm2

    esm2.CONFIGS["corr-tiny"] = dict(layers=1, dim=32, heads=4, ffn=64)
    out = tmp_path / "corr.json"
    args = eec.build_parser().parse_args([
        "--protein", UBE4B, "--n_mutants", "96", "--max_mutations", "2",
        "--esm_model", "corr-tiny", "--esm_chunk", "48",
        "--out_json", str(out)])
    res = eec.main(args)
    sp = res["spearman_vs_oracle"]
    assert set(sp) >= {"potts", "cnn_ensemble", "transformer_random",
                       "potts~cnn_ensemble"}
    assert all(-1.0 <= v <= 1.0 for v in sp.values())
    # the supervised ensemble was trained against this oracle's targets:
    # positive rank correlation on near-WT mutants is a real invariant
    assert sp["cnn_ensemble"] > 0.3
    assert res["spearman_by_n_mut"]["potts"][1] is not None
    assert out.exists()


def test_msat_column_on_ube4b(tmp_path):
    """--msat_model adds the evolutionary-density column (random init here;
    the TPU pipeline passes a family-trained .npz for the real number)."""
    out = tmp_path / "corr_msat.json"
    args = eec.build_parser().parse_args([
        "--protein", UBE4B, "--n_mutants", "32", "--max_mutations", "2",
        "--msat_model", "msa-tiny",
        "--msa_path", "data/proteins/UBE4B_MOUSE.a2m", "--msa_size", "8",
        "--out_json", str(out)])
    res = eec.main(args)
    sp = res["spearman_vs_oracle"]
    assert "msat_random" in sp and -1.0 <= sp["msat_random"] <= 1.0
    assert "potts~msat_random" in sp

    # --msat_model without an alignment is a usage error, not a crash later
    import pytest

    args2 = eec.build_parser().parse_args([
        "--protein", UBE4B, "--n_mutants", "8", "--msat_model", "msa-tiny"])
    with pytest.raises(SystemExit, match="msa_path"):
        eec.main(args2)
