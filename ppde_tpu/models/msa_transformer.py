"""MSA Transformer (axial attention over alignments) in JAX.

The reference scores evolutionary density with fair-esm's
``esm_msa1b_t12_100M_UR50S`` via masked marginals (reference
metrics.py:22-76). This is a native implementation of that architecture:
12 axial layers of tied row attention (attention over columns with logits
summed across alignment rows) + column attention (across rows) + FFN, all
pre-LN, learned column positions, per-row MSA position embedding, tied
Roberta LM head.

Weights: convert a fair-esm msa1b checkpoint with --msa_transformer_weights
(not downloadable in this environment); ``allow_random`` gives a
deterministic random model for pipeline tests; or TRAIN a family-specific
scorer on the protein's own alignment with training.train_msa_mlm /
scripts/finetune_msa.py (smaller CONFIGS entries) and load its .npz — the
native capability that makes the evolutionary-density metric runnable
offline.

TPU-first scoring: ``masked_marginals`` scores ALL unique masked columns of
the wild type in batched device passes — one forward per unique column
instead of the reference's one forward per (variant, mutation) pair
(metrics.py:45-74).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ppde_tpu.models.esm2 import (CLS_IDX, ESM_TOK_TO_IDX, ESM_VOCAB,
                                  MASK_IDX, PAD_IDX)

# "msa-1b" is the fair-esm esm_msa1b_t12_100M architecture (the reference's
# scorer); the smaller entries exist to TRAIN family-specific scorers
# offline (training.train_msa_mlm) — weights for msa-1b cannot be
# downloaded in this environment.
CONFIGS = {
    "msa-1b": dict(layers=12, dim=768, heads=12, ffn=3072, max_pos=1024),
    "msa-S": dict(layers=4, dim=256, heads=8, ffn=1024, max_pos=1024),
    "msa-tiny": dict(layers=2, dim=32, heads=2, ffn=64, max_pos=256),
}
CFG = CONFIGS["msa-1b"]


def heads_of(name: str) -> int:
    return CONFIGS[name]["heads"]


def init(key, dtype=jnp.bfloat16, scale: float = 0.02,
         name: str = "msa-1b") -> dict:
    cfg = CONFIGS[name]
    D, F, N = cfg["dim"], cfg["ffn"], cfg["layers"]
    keys = jax.random.split(key, 3 + N)

    def lin(k, i, o):
        k1, _ = jax.random.split(k)
        return {"w": (jax.random.normal(k1, (i, o)) * scale).astype(dtype),
                "b": jnp.zeros((o,), dtype)}

    def ln(d):
        return {"g": jnp.ones((d,), jnp.float32),
                "b": jnp.zeros((d,), jnp.float32)}

    def layer(k):
        ks = jax.random.split(k, 10)
        return {
            "row_ln": ln(D),
            "row": {"q": lin(ks[0], D, D), "k": lin(ks[1], D, D),
                    "v": lin(ks[2], D, D), "o": lin(ks[3], D, D)},
            "col_ln": ln(D),
            "col": {"q": lin(ks[4], D, D), "k": lin(ks[5], D, D),
                    "v": lin(ks[6], D, D), "o": lin(ks[7], D, D)},
            "ffn_ln": ln(D),
            "fc1": lin(ks[8], D, F), "fc2": lin(ks[9], F, D),
        }

    k_lm, _ = jax.random.split(keys[0])
    return {
        "embed": (jax.random.normal(keys[0], (ESM_VOCAB, D)) * scale).astype(dtype),
        "pos_embed": (jax.random.normal(keys[1], (cfg["max_pos"], D))
                      * scale).astype(dtype),
        "msa_pos_embed": (jax.random.normal(keys[2], (cfg["max_pos"], D))
                          * 0.01).astype(dtype),
        "layers": [layer(k) for k in keys[3:]],
        "ln_before": _ln_init(D),
        "ln_after": _ln_init(D),
        "lm_dense": lin(k_lm, D, D),
        "lm_ln": _ln_init(D),
        "lm_bias": jnp.zeros((ESM_VOCAB,), jnp.float32),
    }


def _ln_init(d):
    return {"g": jnp.ones((d,), jnp.float32), "b": jnp.zeros((d,), jnp.float32)}


def _layer_norm(p, x, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, -1, keepdims=True)
    var = jnp.var(x32, -1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]
    return y.astype(x.dtype)


def _heads(t, H):
    *lead, D = t.shape
    return t.reshape(*lead, H, D // H)


def _tied_row_attention(p, x, H):
    """Tied row attention: logits over column pairs summed across rows.

    x: [B, R, C, D]. Scaling 1/(sqrt(hd) * sqrt(R)) as in fair-esm.
    """
    B, R, C, D = x.shape
    hd = D // H
    q = _heads(x @ p["q"]["w"] + p["q"]["b"], H)  # [B,R,C,H,hd]
    k = _heads(x @ p["k"]["w"] + p["k"]["b"], H)
    v = _heads(x @ p["v"]["w"] + p["v"]["b"], H)
    scaling = 1.0 / (math.sqrt(hd) * math.sqrt(max(R, 1)))
    # scores in the compute dtype, f32 softmax (same treatment as the
    # ESM2 expert — the f32 score materialization dominated attention time;
    # f32 params still get exact f32 scores)
    logits = jnp.einsum("brchd,brehd->bhce", q * scaling, k)  # [B,H,C,C]
    w = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(x.dtype)
    out = jnp.einsum("bhce,brehd->brchd", w, v)
    out = out.reshape(B, R, C, D)
    return out @ p["o"]["w"] + p["o"]["b"]


def _column_attention(p, x, H):
    """Column attention: standard attention across rows per column."""
    B, R, C, D = x.shape
    hd = D // H
    q = _heads(x @ p["q"]["w"] + p["q"]["b"], H)
    k = _heads(x @ p["k"]["w"] + p["k"]["b"], H)
    v = _heads(x @ p["v"]["w"] + p["v"]["b"], H)
    logits = jnp.einsum("brchd,bschd->bhcrs", q / math.sqrt(hd),
                        k)  # [B,H,C,R,R]; compute-dtype scores (see above)
    w = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(x.dtype)
    out = jnp.einsum("bhcrs,bschd->brchd", w, v)
    out = out.reshape(B, R, C, D)
    return out @ p["o"]["w"] + p["o"]["b"]


def forward_logits(params, tokens: jnp.ndarray,
                   heads: int = 12) -> jnp.ndarray:
    """tokens [B, R, C] int32 -> logits [B, R, C, V] (fp32).

    ``heads`` is static config (CONFIGS[name]["heads"]) — kept OUT of the
    params pytree, same convention as esm2.forward_logits.
    """
    B, R, C = tokens.shape
    x = params["embed"][tokens]  # [B,R,C,D]
    x = x + params["pos_embed"][None, None, :C]
    x = x + params["msa_pos_embed"][None, :R, None]
    x = _layer_norm(params["ln_before"], x)

    for layer in params["layers"]:
        x = x + _tied_row_attention(layer["row"],
                                    _layer_norm(layer["row_ln"], x), heads)
        x = x + _column_attention(layer["col"],
                                  _layer_norm(layer["col_ln"], x), heads)
        y = _layer_norm(layer["ffn_ln"], x)
        y = jax.nn.gelu(y @ layer["fc1"]["w"] + layer["fc1"]["b"],
                        approximate=False)
        x = x + (y @ layer["fc2"]["w"] + layer["fc2"]["b"])

    x = _layer_norm(params["ln_after"], x)
    y = jax.nn.gelu(x @ params["lm_dense"]["w"] + params["lm_dense"]["b"],
                    approximate=False)
    y = _layer_norm(params["lm_ln"], y)
    logits = jnp.einsum("brcd,vd->brcv", y.astype(jnp.float32),
                        params["embed"].astype(jnp.float32))
    return logits + params["lm_bias"]


def tokenize_msa(rows: list[str]) -> np.ndarray:
    """Alignment rows -> [R, C+1] int tokens with a prepended <cls>."""
    C = len(rows[0])
    out = np.full((len(rows), C + 1), PAD_IDX, np.int32)
    out[:, 0] = CLS_IDX
    for r, row in enumerate(rows):
        for c, ch in enumerate(row):
            out[r, c + 1] = ESM_TOK_TO_IDX.get(ch, ESM_TOK_TO_IDX["<unk>"])
    return out


def masked_marginals(params, wt_window: str, msa_rows: list[str],
                     cols: list[int], batch_cols: int = 4,
                     heads: int = 12) -> np.ndarray:
    """log-softmax token probabilities at masked WT columns.

    Builds the [1 + len(msa_rows), C+1] alignment with the WT window as the
    first row, masks one window column of the WT row per batch item, and
    returns [len(cols), V] log-probs at those positions.
    """
    base = tokenize_msa([wt_window] + msa_rows)  # [R, C+1]
    base_j = jnp.asarray(base)

    @jax.jit
    def score(cols_batch):
        def one(col):
            toks = base_j.at[0, col + 1].set(MASK_IDX)
            logits = forward_logits(params, toks[None], heads)[0]
            return jax.nn.log_softmax(logits[0, col + 1], -1)  # [V]

        return jax.lax.map(one, cols_batch)

    out = []
    for s in range(0, len(cols), batch_cols):
        chunk = cols[s:s + batch_cols]
        pad = batch_cols - len(chunk)
        cb = jnp.asarray(chunk + [chunk[-1]] * pad, jnp.int32)
        res = np.asarray(score(cb))
        out.append(res[: len(chunk)])
    return np.concatenate(out, 0)


def load(weights_path: str | None, allow_random: bool = False,
         dtype=jnp.bfloat16, name: str = "msa-1b") -> dict:
    """Weights resolution: a native .npz (train_msa_mlm checkpoint for the
    ``name`` architecture, per-leaf validated), a fair-esm msa1b torch
    checkpoint, or (tests only) a deterministic random init."""
    if weights_path is not None:
        if weights_path.endswith(".npz"):
            return load_npz_checkpoint(weights_path, name, dtype)
        return load_torch_checkpoint(weights_path, dtype)
    if allow_random:
        return init(jax.random.PRNGKey(0), dtype, name=name)
    raise FileNotFoundError(
        "No MSA-Transformer weights: pass a fair-esm esm_msa1b_t12_100M "
        "checkpoint path (not downloadable here), a family-trained .npz "
        "(scripts/finetune_msa.py), or allow_random for pipeline tests.")


def cast_params(params: dict, dtype=jnp.bfloat16) -> dict:
    """Matmul weights -> ``dtype``; LayerNorm affines + lm_bias stay fp32
    (the layout init() produces). Same mixed-precision recipe as
    esm2.cast_params, keyed on pytree path because LN and linear leaves
    share the key 'b'."""
    def leaf(path, a):
        names = [getattr(k, "key", None) for k in path]
        if "lm_bias" in names or any(
                isinstance(n, str) and n.endswith("ln") for n in names) \
                or any(n in ("ln_before", "ln_after") for n in names):
            return a.astype(jnp.float32)
        return a.astype(dtype)

    return jax.tree_util.tree_map_with_path(leaf, params)


def load_npz_checkpoint(path: str, name: str, dtype=jnp.bfloat16) -> dict:
    """Load a native checkpoint (training.save_ckpt npz layout) with
    per-leaf shape validation against the ``name`` architecture."""
    z = np.load(path, allow_pickle=False)
    like = jax.eval_shape(
        lambda: init(jax.random.PRNGKey(0), jnp.float32, name=name))
    flat, treedef = jax.tree.flatten(like)
    n_stored = len([k for k in z.files if k.startswith("p")])
    if n_stored != len(flat):
        raise ValueError(
            f"{path}: {n_stored} leaves but MSA-T config '{name}' has "
            f"{len(flat)} — wrong architecture for this checkpoint")
    leaves = []
    for i, ref in enumerate(flat):
        a = z[f"p{i}"]
        if tuple(a.shape) != tuple(ref.shape):
            raise ValueError(
                f"{path}: leaf p{i} has shape {tuple(a.shape)}, MSA-T "
                f"config '{name}' expects {tuple(ref.shape)}")
        leaves.append(jnp.asarray(a, jnp.float32))
    return cast_params(jax.tree.unflatten(treedef, leaves), dtype)


def load_torch_checkpoint(path: str, dtype=jnp.bfloat16) -> dict:
    """Convert a fair-esm msa1b state_dict to our pytree layout."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt)
    sd = {k.removeprefix("encoder.").removeprefix("sentence_encoder."): v
          for k, v in sd.items()}
    sd = {k: v.float().numpy() for k, v in sd.items() if hasattr(v, "numpy")}

    def lin(prefix):
        return {"w": jnp.asarray(sd[f"{prefix}.weight"].T, dtype),
                "b": jnp.asarray(sd[f"{prefix}.bias"], dtype)}

    def ln(prefix):
        return {"g": jnp.asarray(sd[f"{prefix}.weight"], jnp.float32),
                "b": jnp.asarray(sd[f"{prefix}.bias"], jnp.float32)}

    layers = []
    for i in range(CFG["layers"]):
        p = f"layers.{i}"
        layers.append({
            "row_ln": ln(f"{p}.row_self_attention.layer_norm"),
            "row": {x: lin(f"{p}.row_self_attention.layer.{x}_proj")
                    for x in ("q", "k", "v")} |
                   {"o": lin(f"{p}.row_self_attention.layer.out_proj")},
            "col_ln": ln(f"{p}.column_self_attention.layer_norm"),
            "col": {x: lin(f"{p}.column_self_attention.layer.{x}_proj")
                    for x in ("q", "k", "v")} |
                   {"o": lin(f"{p}.column_self_attention.layer.out_proj")},
            "ffn_ln": ln(f"{p}.feed_forward_layer.layer_norm"),
            "fc1": lin(f"{p}.feed_forward_layer.layer.fc1"),
            "fc2": lin(f"{p}.feed_forward_layer.layer.fc2"),
        })
    return {
        "embed": jnp.asarray(sd["embed_tokens.weight"], dtype),
        "pos_embed": jnp.asarray(sd["embed_positions.weight"], dtype),
        "msa_pos_embed": jnp.asarray(
            sd["msa_position_embedding"].reshape(-1, CFG["dim"]), dtype),
        "layers": layers,
        "ln_before": ln("emb_layer_norm_before"),
        "ln_after": ln("emb_layer_norm_after"),
        "lm_dense": lin("lm_head.dense"),
        "lm_ln": ln("lm_head.layer_norm"),
        "lm_bias": jnp.asarray(sd["lm_head.bias"], jnp.float32),
    }
