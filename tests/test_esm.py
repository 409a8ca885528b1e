import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ppde_tpu import codec
from ppde_tpu.models import esm2, msa_transformer as msat

# shrink the architectures for CPU tests
TINY = dict(layers=2, dim=32, heads=4, ffn=64)


@pytest.fixture(scope="module")
def tiny_esm(monkeypatch=None):
    esm2.CONFIGS["tiny"] = TINY
    return esm2.init(jax.random.PRNGKey(0), "tiny", dtype=jnp.float32)


def test_vocab_table():
    assert esm2.ESM_VOCAB == 33
    assert esm2.ESM_TOKS[0] == "<cls>"
    assert esm2.ESM_TOKS[32] == "<mask>"
    assert esm2.ESM_TOK_TO_IDX["A"] == 5
    assert esm2.ESM_TOK_TO_IDX["L"] == 4


def test_potts_to_esm_perm_maps_every_aa():
    perm = esm2.potts_to_esm_perm()
    assert perm.shape == (20, 33)
    np.testing.assert_array_equal(perm.sum(-1), 1.0)
    # 'A' (potts 0) -> esm index 5
    assert perm[0, 5] == 1.0
    assert perm[codec.AA_TO_INT["W"], esm2.ESM_TOK_TO_IDX["W"]] == 1.0


def test_forward_shapes_and_grad(tiny_esm):
    x = jnp.asarray(esm2.seq_to_esm_onehot("ACDEFGH"))[None]
    logits = esm2.forward_logits(tiny_esm, x, heads=4)
    assert logits.shape == (1, 7, 33)
    assert logits.dtype == jnp.float32

    # differentiable w.r.t. the one-hot input (the whole point of the fork)
    g = jax.grad(lambda v: esm2.pseudo_log_likelihood(tiny_esm, v, 4).sum())(x)
    assert g.shape == x.shape
    assert bool(jnp.any(g != 0))
    assert np.all(np.isfinite(np.asarray(g)))


def test_pll_position_dependence(tiny_esm):
    """Rotary positions: permuting the sequence must change the PLL."""
    x1 = jnp.asarray(esm2.seq_to_esm_onehot("ACDEFGHI"))[None]
    x2 = jnp.asarray(esm2.seq_to_esm_onehot("IHGFEDCA"))[None]
    s1 = float(esm2.pseudo_log_likelihood(tiny_esm, x1, 4)[0])
    s2 = float(esm2.pseudo_log_likelihood(tiny_esm, x2, 4)[0])
    assert s1 != pytest.approx(s2, abs=1e-6)


def test_expert_delta_zero_at_wt(tiny_esm):
    wt = "ACDEFGHIKL"
    perm = jnp.asarray(esm2.potts_to_esm_perm())
    wt_oh = jnp.asarray(codec.seqs_to_onehot([wt]))
    wt_score = esm2.pseudo_log_likelihood(tiny_esm, wt_oh @ perm, 4)

    def apply_fn(x):
        return esm2.pseudo_log_likelihood(tiny_esm, x @ perm, 4) - wt_score

    np.testing.assert_allclose(np.asarray(apply_fn(wt_oh)), 0.0, atol=1e-4)


def test_esm2_state_dict_conversion_roundtrip(rng):
    """Torch-layout state dict -> pytree -> forward runs and depends on
    the converted weights."""
    esm2.CONFIGS["tiny"] = TINY
    D, F = TINY["dim"], TINY["ffn"]

    class T:  # minimal tensor stand-in with .T handled by numpy
        pass

    sd = {}

    def add_lin(prefix, i, o):
        sd[f"{prefix}.weight"] = rng.normal(0, 0.02, (o, i)).astype(np.float32)
        sd[f"{prefix}.bias"] = np.zeros(o, np.float32)

    def add_ln(prefix, d):
        sd[f"{prefix}.weight"] = np.ones(d, np.float32)
        sd[f"{prefix}.bias"] = np.zeros(d, np.float32)

    sd["embed_tokens.weight"] = rng.normal(0, 0.02, (33, D)).astype(np.float32)
    for i in range(TINY["layers"]):
        p = f"layers.{i}"
        for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
            add_lin(f"{p}.self_attn.{name}", D, D)
        add_ln(f"{p}.self_attn_layer_norm", D)
        add_lin(f"{p}.fc1", D, F)
        add_lin(f"{p}.fc2", F, D)
        add_ln(f"{p}.final_layer_norm", D)
    add_ln("emb_layer_norm_after", D)
    add_lin("lm_head.dense", D, D)
    add_ln("lm_head.layer_norm", D)
    sd["lm_head.bias"] = np.zeros(33, np.float32)

    params = esm2.from_state_dict(sd, "tiny", dtype=jnp.float32)
    x = jnp.asarray(esm2.seq_to_esm_onehot("ACDE"))[None]
    logits = esm2.forward_logits(params, x, heads=4)
    assert logits.shape == (1, 4, 33)
    assert np.all(np.isfinite(np.asarray(logits)))
    # converted q weight actually lands transposed in the pytree
    np.testing.assert_allclose(
        np.asarray(params["layers"][0]["q"]["w"]),
        sd["layers.0.self_attn.q_proj.weight"].T)


def test_msa_transformer_tiny_pipeline():
    params = msat.init(jax.random.PRNGKey(0), dtype=jnp.float32,
                       name="msa-tiny")
    heads = msat.heads_of("msa-tiny")

    rows = ["ACDE", "AC-E", "WCDE"]
    toks = msat.tokenize_msa(rows)
    assert toks.shape == (3, 5)
    assert toks[0, 0] == msat.CLS_IDX

    logits = msat.forward_logits(params, jnp.asarray(toks)[None], heads)
    assert logits.shape == (1, 3, 5, 33)

    lp = msat.masked_marginals(params, "ACDE", rows[1:], [0, 2],
                               batch_cols=2, heads=heads)
    assert lp.shape == (2, 33)
    np.testing.assert_allclose(np.exp(lp).sum(-1), 1.0, rtol=1e-4)


def test_masked_marginal_metric_additivity(tmp_path):
    """metrics.proteins_transformer_score must equal the sum over mutations
    of per-column log-prob ratios."""
    from ppde_tpu import metrics

    wt = "ACDEFGHIKL"
    protein_dir = tmp_path / "prot"
    protein_dir.mkdir()
    (protein_dir / "wt.fasta").write_text(f">wt/1-{len(wt)}\n{wt}\n")
    msa_path = tmp_path / "m.a2m"
    msa_path.write_text(f">wt/1-{len(wt)}\n{wt}\n>o1\nACDEFGHIKV\n"
                        ">o2\nACDEFGWIKL\n")

    # population: WT + a double mutant
    seqs = [wt, "YCDEFGHIKV"]
    pop = codec.seqs_to_onehot(seqs)
    scores = metrics.proteins_transformer_score(
        pop, str(protein_dir), str(msa_path), msa_size=3, allow_random=True,
        msa_model="msa-tiny")
    assert scores.shape == (2,)
    assert scores[0] == 0.0  # WT has no mutations
    assert scores[1] != 0.0


def test_composite_expert_name_builds_poe_energy():
    """--unsupervised_expert potts+transformer-<cfg> resolves the esm2
    config from the composite name (reference energy.py:83-89 composes
    both experts; the config key is the transformer part alone)."""
    import importlib
    import os
    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts"))
    de = importlib.import_module("directed_evolution")
    from ppde_tpu import runtime

    esm2.CONFIGS.setdefault(
        "transformer-tiny", dict(layers=1, dim=32, heads=4, ffn=64))
    common = ["--protein", "UBE4B_MOUSE_Klevit2013-nscor_log2_ratio",
              "--protein_weights", "weights", "--n_chains", "2",
              "--allow_random_esm"]
    args = de.build_parser().parse_args(
        common + ["--unsupervised_expert", "potts+transformer-tiny"])
    en, oracle, pp, orc = runtime.build_protein_energy(args)
    assert "potts" in en.params and "tr" in en.params

    x = runtime.make_initial_protein_population(
        os.path.join("weights", args.protein), 2)
    e_both = np.asarray(en.energy(en.params, x))
    e, fit, g = en.energy_and_grad(en.params, x)
    assert np.isfinite(np.asarray(e)).all()
    assert np.isfinite(np.asarray(g)).all()

    args_p = de.build_parser().parse_args(
        common + ["--unsupervised_expert", "potts"])
    en_p, *_ = runtime.build_protein_energy(args_p)
    assert "tr" not in en_p.params

    # transformer-only composite: potts term excluded
    args_t = de.build_parser().parse_args(
        common + ["--unsupervised_expert", "transformer-tiny"])
    en_t, *_ = runtime.build_protein_energy(args_t)
    assert "potts" not in en_t.params and "tr" in en_t.params
