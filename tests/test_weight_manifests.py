"""Golden conversion tests against the EXACT fair-esm checkpoint manifests.

The real esm2_t12_35M_UR50D / esm_msa1b_t12_100M_UR50S weights cannot be
downloaded in this environment, so these tests construct synthetic
state_dicts with the exact key sets, shapes, wrapper layout ({"cfg"/"args",
"model"}), fairseq key prefixes, and non-parameter extras (rotary inv_freq
buffers, contact head, tied lm_head.weight) of the genuine files — so the
--esm_weights / --msa_transformer_weights paths work first try when real
weights exist. Manifests transcribed from facebookresearch/esm model
definitions (esm/model/esm2.py, esm/model/msa_transformer.py,
esm/modules.py); reference usage: /root/reference/ppde/nets.py:172-240,
/root/reference/ppde/metrics.py:22-76.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from ppde_tpu.models import esm2, msa_transformer


def _t(*shape, seed):
    rng = np.random.default_rng(seed)
    return torch.tensor(rng.normal(0, 0.02, shape).astype(np.float32))


def make_esm2_35m_state_dict(prefix="encoder.sentence_encoder."):
    """Exact key manifest of esm2_t12_35M_UR50D: 12 layers, D=480, 20 heads,
    ffn 1920, vocab 33, rotary head_dim 24 (inv_freq buffers of size 12)."""
    D, L, H, F, V = 480, 12, 20, 1920, 33
    sd = {}
    s = 0

    def add(key, *shape):
        nonlocal s
        s += 1
        sd[key] = _t(*shape, seed=s)

    add("embed_tokens.weight", V, D)
    for i in range(L):
        p = f"layers.{i}"
        for proj in ("k_proj", "v_proj", "q_proj", "out_proj"):
            add(f"{p}.self_attn.{proj}.weight", D, D)
            add(f"{p}.self_attn.{proj}.bias", D)
        # rotary inv_freq is a registered buffer present in real files
        sd[f"{p}.self_attn.rot_emb.inv_freq"] = torch.tensor(
            1.0 / (10000 ** (np.arange(0, D // H, 2) / (D // H))),
            dtype=torch.float32)
        add(f"{p}.self_attn_layer_norm.weight", D)
        add(f"{p}.self_attn_layer_norm.bias", D)
        add(f"{p}.fc1.weight", F, D)
        add(f"{p}.fc1.bias", F)
        add(f"{p}.fc2.weight", D, F)
        add(f"{p}.fc2.bias", D)
        add(f"{p}.final_layer_norm.weight", D)
        add(f"{p}.final_layer_norm.bias", D)
    add("emb_layer_norm_after.weight", D)
    add("emb_layer_norm_after.bias", D)
    add("lm_head.dense.weight", D, D)
    add("lm_head.dense.bias", D)
    add("lm_head.layer_norm.weight", D)
    add("lm_head.layer_norm.bias", D)
    sd["lm_head.weight"] = sd["embed_tokens.weight"]  # tied
    add("lm_head.bias", V)
    # contact head ships in the companion -contact-regression.pt, but some
    # merged checkpoints carry it inline; converters must tolerate it
    add("contact_head.regression.weight", 1, L * H)
    add("contact_head.regression.bias", 1)
    return {(prefix + k if not k.startswith(("lm_head", "contact_head"))
             else "encoder." + k): v for k, v in sd.items()}


def make_msa1b_state_dict(prefix=""):
    """Exact key manifest of esm_msa1b_t12_100M_UR50S: 12 layers, D=768,
    12 heads, ffn 3072, vocab 33, learned positions (1026 rows incl. pad),
    msa_position_embedding [1, 1024, 1, 768]."""
    D, L, F, V = 768, 12, 3072, 33
    sd = {}
    s = 100

    def add(key, *shape):
        nonlocal s
        s += 1
        sd[key] = _t(*shape, seed=s)

    add("embed_tokens.weight", V, D)
    add("msa_position_embedding", 1, 1024, 1, D)
    add("embed_positions.weight", 1026, D)
    for i in range(L):
        p = f"layers.{i}"
        for blk in ("row_self_attention", "column_self_attention"):
            for proj in ("k_proj", "v_proj", "q_proj", "out_proj"):
                add(f"{p}.{blk}.layer.{proj}.weight", D, D)
                add(f"{p}.{blk}.layer.{proj}.bias", D)
            add(f"{p}.{blk}.layer_norm.weight", D)
            add(f"{p}.{blk}.layer_norm.bias", D)
        add(f"{p}.feed_forward_layer.layer.fc1.weight", F, D)
        add(f"{p}.feed_forward_layer.layer.fc1.bias", F)
        add(f"{p}.feed_forward_layer.layer.fc2.weight", D, F)
        add(f"{p}.feed_forward_layer.layer.fc2.bias", D)
        add(f"{p}.feed_forward_layer.layer_norm.weight", D)
        add(f"{p}.feed_forward_layer.layer_norm.bias", D)
    add("emb_layer_norm_before.weight", D)
    add("emb_layer_norm_before.bias", D)
    add("emb_layer_norm_after.weight", D)
    add("emb_layer_norm_after.bias", D)
    add("lm_head.dense.weight", D, D)
    add("lm_head.dense.bias", D)
    add("lm_head.layer_norm.weight", D)
    add("lm_head.layer_norm.bias", D)
    sd["lm_head.weight"] = sd["embed_tokens.weight"]
    add("lm_head.bias", V)
    add("contact_head.regression.weight", 1, L * 12)
    add("contact_head.regression.bias", 1)
    return {prefix + k: v for k, v in sd.items()}


def test_esm2_35m_manifest_converts_and_runs(tmp_path):
    sd = make_esm2_35m_state_dict()
    path = tmp_path / "esm2_t12_35M_UR50D.pt"
    torch.save({"cfg": {"model": {"arch": "esm2"}}, "model": sd}, path)

    params = esm2.load_torch_checkpoint(str(path), "transformer-S",
                                        dtype=jnp.float32)
    assert len(params["layers"]) == 12
    assert params["embed"].shape == (33, 480)
    # value mapping: q weight transposed, embed rows verbatim
    q0 = sd["encoder.sentence_encoder.layers.0.self_attn.q_proj.weight"]
    np.testing.assert_allclose(np.asarray(params["layers"][0]["q"]["w"]),
                               q0.numpy().T, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(params["embed"]),
        sd["encoder.sentence_encoder.embed_tokens.weight"].numpy(),
        rtol=1e-6)
    # a forward pass through the full converted stack runs and is finite
    seq = "MKTAYIAKQR"
    x = jnp.asarray(esm2.seq_to_esm_onehot(seq))[None]
    pll = esm2.pseudo_log_likelihood(params, x)
    assert np.isfinite(float(pll[0]))


def test_esm2_manifest_bare_and_wrapped_prefixes(tmp_path):
    """Also accept unprefixed/bare state_dicts (local re-saves)."""
    sd = make_esm2_35m_state_dict(prefix="")
    sd = {k.removeprefix("encoder."): v for k, v in sd.items()}
    path = tmp_path / "bare.pt"
    torch.save(sd, path)
    params = esm2.load_torch_checkpoint(str(path), "transformer-S",
                                        dtype=jnp.float32)
    assert params["lm_bias"].shape == (33,)


def test_msa1b_manifest_converts_and_runs(tmp_path):
    for prefix in ("", "encoder.sentence_encoder."):
        sd = make_msa1b_state_dict(prefix=prefix)
        path = tmp_path / f"msa1b_{len(prefix)}.pt"
        torch.save({"args": {"arch": "msa_transformer"}, "model": sd}, path)

        params = msa_transformer.load_torch_checkpoint(str(path),
                                                       dtype=jnp.float32)
        assert len(params["layers"]) == 12
        assert params["embed"].shape == (33, 768)
        assert params["msa_pos_embed"].shape[-1] == 768
        k0 = sd[prefix + "layers.0.row_self_attention.layer.k_proj.weight"]
        np.testing.assert_allclose(
            np.asarray(params["layers"][0]["row"]["k"]["w"]),
            k0.numpy().T, rtol=1e-6)

    # forward over a tiny MSA runs and is finite
    toks = msa_transformer.tokenize_msa(["MKTAYI", "MKTAYI", "MRTAYI"])
    logits = msa_transformer.forward_logits(params, jnp.asarray(toks)[None])
    assert np.all(np.isfinite(np.asarray(logits, np.float32)))
