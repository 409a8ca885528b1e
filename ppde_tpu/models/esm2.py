"""ESM2 protein language model — one-hot-input, differentiable, in JAX.

The reference's 'transformer' experts load the external ``esm_one_hot``
fork (a patched facebookresearch/esm accepting one-hot float inputs so
dE/dx exists; reference nets.py:11,172-240, environment.yml:22). This module
provides the same capability natively:

  * the ESM2 architecture (rotary attention, pre-LN, tied LM head, eval-mode
    token-dropout rescale) as pure functions over a parameter pytree;
  * inputs are FLOAT one-hot [B, T, 33] — token embedding is a matmul
    ``x @ E`` so the whole score is differentiable w.r.t. x;
  * a converter from fair-esm checkpoint state_dicts (weights are not
    downloadable in this environment — conversion is exercised with
    randomly-initialized torch-layout dicts in tests; point --esm_weights
    at a real checkpoint to get the published models);
  * the pseudo-log-likelihood scorer used as the unsupervised expert
    (sum_i x_i . log_softmax(logits_i), delta vs wild type;
    reference nets.py:221-240), with the fixed 20->33 vocabulary
    permutation (reference nets.py:194-213).

Compute is bf16 by default (the TPU-native analog of the reference's CUDA
AMP autocast, nets.py:230) with fp32 accumulation for the score.
"""
from __future__ import annotations

import math


import jax
import jax.numpy as jnp
import numpy as np

from ppde_tpu import codec
from ppde_tpu.ops import attention_pallas

# Attention backend: None = auto (currently the XLA einsum path — measured
# round 3: XLA's forward attention emitter is already flash-like at these
# shapes, and in the production chunked-16 energy the einsum path beats the
# pallas kernel 30.8 vs 38.9 ms/energy+grad because small-z kernel calls
# are latency-bound at hd=24). "flash" opts into ops/attention_pallas.py's
# VMEM-resident kernel — it wins ~7% for MONOLITHIC fwd+bwd at B=128
# (97.5 vs 105.8 ms) by never materializing [Z,T,T] in the backward.
# Full measurements in PERF.md.
ATTENTION_IMPL: str | None = None

# Sequence-parallel hook: when set (parallel/mesh.py sp_constraint via
# runtime.apply_mesh(sp=...)), every forward_logits call without an explicit
# ``constrain`` shards the residual stream's T axis over the mesh's sp axis.
# Module-level knob by the same pattern as ATTENTION_IMPL: experts bake
# their apply_fn closures into Energy at build time, so a contextual hook
# reaches them without rebuilding.
SP_CONSTRAIN = None

# Canonical ESM alphabet (fair-esm proteinseq_toks + specials), index order.
ESM_TOKS = [
    "<cls>", "<pad>", "<eos>", "<unk>",
    "L", "A", "G", "V", "S", "E", "R", "T", "I", "D", "P", "K", "Q", "N",
    "F", "Y", "M", "H", "W", "C", "X", "B", "U", "Z", "O", ".", "-",
    "<null_1>", "<mask>",
]
ESM_VOCAB = len(ESM_TOKS)  # 33
ESM_TOK_TO_IDX = {t: i for i, t in enumerate(ESM_TOKS)}
MASK_IDX = ESM_TOK_TO_IDX["<mask>"]
CLS_IDX = ESM_TOK_TO_IDX["<cls>"]
EOS_IDX = ESM_TOK_TO_IDX["<eos>"]
PAD_IDX = ESM_TOK_TO_IDX["<pad>"]

CONFIGS = {
    "transformer-S": dict(layers=12, dim=480, heads=20, ffn=1920),   # 35M
    "transformer-M": dict(layers=30, dim=640, heads=20, ffn=2560),   # 150M
    "transformer": dict(layers=30, dim=640, heads=20, ffn=2560),
    "transformer-L": dict(layers=33, dim=1280, heads=20, ffn=5120),  # 650M
}
# mask_ratio_train for eval-mode token-dropout rescale (0.15 * 0.8)
MASK_RATIO_TRAIN = 0.15 * 0.8


def potts_to_esm_perm() -> np.ndarray:
    """[20, 33] permutation mapping our AA one-hots to ESM one-hots
    (parity with reference get_potts_to_esm_perm, nets.py:194-206)."""
    perm = np.zeros((codec.VOCAB_SIZE, ESM_VOCAB), np.float32)
    for k in range(codec.VOCAB_SIZE):
        perm[k, ESM_TOK_TO_IDX[codec.INT_TO_AA[k]]] = 1.0
    return perm


def seq_to_esm_onehot(seq: str, dtype=np.float32) -> np.ndarray:
    """AA string -> [T, 33] one-hot (no cls/eos, matching the reference
    expert path which strips them, nets.py:189)."""
    out = np.zeros((len(seq), ESM_VOCAB), dtype)
    for i, c in enumerate(seq):
        out[i, ESM_TOK_TO_IDX.get(c, ESM_TOK_TO_IDX["<unk>"])] = 1.0
    return out


# ---------------------------------------------------------------------------
# parameters
# ---------------------------------------------------------------------------

def init(key, name: str = "transformer-S", dtype=jnp.bfloat16,
         scale: float = 0.02) -> dict:
    cfg = CONFIGS[name]
    D, F, H, N = cfg["dim"], cfg["ffn"], cfg["heads"], cfg["layers"]
    keys = jax.random.split(key, 2 + N)

    def lin(k, i, o):
        k1, k2 = jax.random.split(k)
        return {"w": (jax.random.normal(k1, (i, o)) * scale).astype(dtype),
                "b": jnp.zeros((o,), dtype)}

    def ln(d):
        return {"g": jnp.ones((d,), jnp.float32),
                "b": jnp.zeros((d,), jnp.float32)}

    def layer(k):
        ks = jax.random.split(k, 6)
        return {
            "attn_ln": ln(D),
            "q": lin(ks[0], D, D), "k": lin(ks[1], D, D),
            "v": lin(ks[2], D, D), "o": lin(ks[3], D, D),
            "ffn_ln": ln(D),
            "fc1": lin(ks[4], D, F), "fc2": lin(ks[5], F, D),
        }

    return {
        "embed": (jax.random.normal(keys[0], (ESM_VOCAB, D)) * scale).astype(dtype),
        "layers": [layer(k) for k in keys[2:]],
        "final_ln": ln(D),
        "lm_dense": lin(keys[1], D, D),
        "lm_ln": ln(D),
        "lm_bias": jnp.zeros((ESM_VOCAB,), jnp.float32),
    }


def _layer_norm(p, x, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, -1, keepdims=True)
    var = jnp.var(x32, -1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]
    return y.astype(x.dtype)


def _rotary(q, k):
    """Rotary position embedding on [B, H, T, hd] query/key tensors."""
    hd = q.shape[-1]
    T = q.shape[-2]
    inv = 1.0 / (10000.0 ** (jnp.arange(0, hd, 2, dtype=jnp.float32) / hd))
    t = jnp.arange(T, dtype=jnp.float32)
    freqs = jnp.outer(t, inv)                      # [T, hd/2]
    emb = jnp.concatenate([freqs, freqs], -1)      # [T, hd]
    cos = jnp.cos(emb)[None, None].astype(q.dtype)
    sin = jnp.sin(emb)[None, None].astype(q.dtype)

    def rot_half(x):
        x1, x2 = jnp.split(x, 2, axis=-1)
        return jnp.concatenate([-x2, x1], -1)

    return q * cos + rot_half(q) * sin, k * cos + rot_half(k) * sin


def _attention(p, x, heads):
    B, T, D = x.shape
    hd = D // heads

    def proj(pp, v):
        return (v @ pp["w"] + pp["b"]).reshape(B, T, heads, hd).transpose(0, 2, 1, 3)

    q = proj(p["q"], x) * (1.0 / math.sqrt(hd))
    k = proj(p["k"], x)
    v = proj(p["v"], x)
    q, k = _rotary(q, k)
    # (B, H) merged into one batch dim, and scores kept in the compute
    # dtype: at bf16 the f32-scores materialization dominated the whole
    # transformer (measured 70 -> 28 ms per 12-layer fwd stack at B=128,
    # T=240 — attention was 81% of forward time for 13% of its FLOPs).
    # f32 params (conversion-parity tests) still get exact f32 scores.
    q = q.reshape(B * heads, T, hd)
    k = k.reshape(B * heads, T, hd)
    v = v.reshape(B * heads, T, hd)
    impl = ATTENTION_IMPL or "xla"
    if impl == "flash":
        out = attention_pallas.flash_attention(q, k, v)
    else:
        scores = jnp.einsum("zqd,zkd->zqk", q, k)
        w = jax.nn.softmax(scores.astype(jnp.float32),
                           axis=-1).astype(x.dtype)
        out = jnp.einsum("zqk,zkd->zqd", w, v)
    out = out.reshape(B, heads, T, hd).transpose(0, 2, 1, 3).reshape(B, T, D)
    return out @ p["o"]["w"] + p["o"]["b"]


def embed_tokens(params, x_onehot: jnp.ndarray) -> jnp.ndarray:
    """One-hot [B, T, 33] -> embedded residual stream [B, T, D].

    Eval-mode semantics of the esm_one_hot fork: embedding is x @ E (so
    gradients flow to x); token-dropout rescale uses the soft mask weight
    x[..., MASK_IDX] (exact for one-hot inputs): zero masked embeddings,
    scale by (1 - mask_ratio_train) / (1 - observed mask ratio).
    """
    dtype = params["embed"].dtype
    x = x_onehot.astype(dtype)
    h = x @ params["embed"]
    mask_w = x_onehot[..., MASK_IDX].astype(jnp.float32)  # [B, T]
    h = h * (1.0 - mask_w[..., None]).astype(dtype)
    ratio = jnp.mean(mask_w, axis=-1, keepdims=True)      # [B, 1]
    scale = (1.0 - MASK_RATIO_TRAIN) / (1.0 - ratio)
    return h * scale[..., None].astype(dtype)


def transformer_layer(layer, h, heads: int, approx_gelu: bool):
    """One pre-LN rotary-attention transformer block on [B, T, D]."""
    h = h + _attention(layer, _layer_norm(layer["attn_ln"], h), heads)
    y = _layer_norm(layer["ffn_ln"], h)
    y = jax.nn.gelu(y @ layer["fc1"]["w"] + layer["fc1"]["b"],
                    approximate=approx_gelu)
    return h + (y @ layer["fc2"]["w"] + layer["fc2"]["b"])


def lm_head(params, h: jnp.ndarray, approx_gelu: bool) -> jnp.ndarray:
    """Residual stream [B, T, D] -> tied-embedding LM logits [B, T, 33]."""
    h = _layer_norm(params["final_ln"], h)
    y = jax.nn.gelu(h @ params["lm_dense"]["w"] + params["lm_dense"]["b"],
                    approximate=approx_gelu)
    y = _layer_norm(params["lm_ln"], y)
    logits = jnp.einsum("btd,vd->btv", y.astype(jnp.float32),
                        params["embed"].astype(jnp.float32))
    return logits + params["lm_bias"]


def _use_approx_gelu(params) -> bool:
    # exact erf-gelu for f32 params (fair-esm numeric parity); tanh-gelu at
    # bf16, where the approximation error (~1e-3) is below bf16 resolution
    # and the erf transcendental costs ~10 ms per forward (measured)
    return params["embed"].dtype == jnp.bfloat16


def forward_logits(params, x_onehot: jnp.ndarray,
                   heads: int = 20, remat: bool = False,
                   constrain=None) -> jnp.ndarray:
    """One-hot [B, T, 33] -> LM logits [B, T, 33] (fp32).

    ``heads`` is static — architecture config stays OUT of the params pytree
    so the pytree crosses jit boundaries as pure arrays.

    ``remat``: jax.checkpoint each transformer layer — input gradients then
    store only layer-boundary residuals (~78 MB/layer at 650M, B=128)
    instead of every intermediate, trading one recomputed forward. Off by
    default (measured net-negative for ESM2-S, round 2); REQUIRED to fit
    the 650M config's monolithic-batch vjp (the memory role the
    reference's minibatch-8 loop plays, energy.py:77 — but chunking costs
    4.5x on TPU, PERF.md round 3).

    ``constrain``: optional hook applied to the residual stream after the
    embedding and after every layer — used for sequence-parallel (sp)
    activation sharding (parallel/mesh.py sp_constraint): LN/FFN/rotary run
    T-sharded, and GSPMD inserts the gathers attention needs.
    """
    h = embed_tokens(params, x_onehot)
    approx_gelu = _use_approx_gelu(params)
    if constrain is None:
        constrain = SP_CONSTRAIN
    c = constrain if constrain is not None else (lambda h: h)
    h = c(h)

    def one_layer(layer, h):
        return transformer_layer(layer, h, heads, approx_gelu)

    step = jax.checkpoint(one_layer) if remat else one_layer
    for layer in params["layers"]:
        h = c(step(layer, h))

    return lm_head(params, h, approx_gelu)


def pseudo_log_likelihood(params, x_onehot: jnp.ndarray,
                          heads: int = 20, remat: bool = False,
                          constrain=None) -> jnp.ndarray:
    """sum_i x_i . log_softmax(logits_i) per sequence (nets.py:221-233)."""
    logits = forward_logits(params, x_onehot, heads, remat, constrain)
    lp = jax.nn.log_softmax(logits, -1)
    return jnp.sum(x_onehot.astype(jnp.float32) * lp, axis=(1, 2))


def load_expert(name: str, wt_seq: str, weights_path: str | None = None,
                allow_random: bool = False, dtype=jnp.bfloat16,
                remat: bool | None = None):
    """Build the unsupervised transformer expert: (params, apply_fn) where
    apply_fn(params, x_potts_onehot [N,L,20]) -> delta PLL vs wild type.

    remat: None = auto (per-layer jax.checkpoint for transformer-L only —
    required to fit the 650M monolithic-batch vjp; net-negative for S/M)."""
    if weights_path is not None:
        if weights_path.endswith(".npz"):
            # native ppde_tpu checkpoint (scripts/finetune_esm.py output)
            params = load_npz_checkpoint(weights_path, name, dtype)
        else:
            params = load_torch_checkpoint(weights_path, name, dtype)
    elif allow_random:
        params = init(jax.random.PRNGKey(0), name, dtype)
    else:
        raise FileNotFoundError(
            "No ESM2 weights available: pass --esm_weights pointing at a "
            "fair-esm esm2_t*.pt checkpoint (this environment cannot "
            "download them), or --allow_random_esm for smoke testing.")

    if remat is None:
        remat = name == "transformer-L"
    heads = CONFIGS[name]["heads"]
    perm = jnp.asarray(potts_to_esm_perm(), dtype)
    wt = jnp.asarray(seq_to_esm_onehot(wt_seq))[None]
    wt_score = pseudo_log_likelihood(params, wt, heads)
    params = dict(params, wt_score=wt_score, perm=perm)

    def apply_fn(params, x):
        x_esm = x.astype(params["perm"].dtype) @ params["perm"]
        return (pseudo_log_likelihood(params, x_esm, heads, remat)
                - params["wt_score"])

    return params, apply_fn


# ---------------------------------------------------------------------------
# mixed precision + native checkpoints (the fine-tuning path)
# ---------------------------------------------------------------------------

# Pytree keys whose leaves stay fp32 under cast_params: LayerNorm affines
# and the LM-head bias (the init()/from_state_dict layout keeps them fp32
# for numerics), plus expert-time extras.
_F32_KEYS = frozenset(
    {"attn_ln", "ffn_ln", "final_ln", "lm_ln", "lm_bias", "wt_score"})


def cast_params(params: dict, dtype=jnp.bfloat16) -> dict:
    """Cast the matmul weights (embed, q/k/v/o, fc1/fc2, lm_dense, perm) to
    ``dtype``, keeping LayerNorm affines and the LM-head bias fp32 — the
    same layout init()/from_state_dict produce directly. Used by the MLM
    fine-tuning loop (training.train_esm_mlm) for the standard
    mixed-precision recipe: fp32 master params + optimizer state, bf16
    compute params re-derived every step (the TPU-native analog of the
    reference's CUDA AMP autocast, nets.py:230)."""
    def leaf(path, a):
        names = {getattr(k, "key", None) for k in path}
        if names & _F32_KEYS:
            return a
        return a.astype(dtype)

    return jax.tree_util.tree_map_with_path(leaf, params)


def save_npz_checkpoint(path: str, params: dict, step: int = 0):
    """Save params as a flattened-pytree npz (training.save_ckpt layout:
    leaves p0..pN in init() tree order + step). Weights are upcast to fp32
    so a saved bf16 compute tree round-trips into an fp32 master."""
    flat, treedef = jax.tree.flatten(jax.device_get(params))
    np.savez_compressed(
        path, step=step, treedef=str(treedef),
        **{f"p{i}": np.asarray(a, np.float32) for i, a in enumerate(flat)})


def load_npz_checkpoint(path: str, name: str, dtype=jnp.bfloat16) -> dict:
    """Load a native ppde_tpu ESM2 checkpoint (save_npz_checkpoint /
    training.save_ckpt npz layout) with per-leaf shape validation against
    the ``name`` architecture, mapped to the usual mixed layout (weights in
    ``dtype``, LayerNorm/lm_bias fp32)."""
    z = np.load(path, allow_pickle=False)
    like = jax.eval_shape(
        lambda: init(jax.random.PRNGKey(0), name, jnp.float32))
    flat, treedef = jax.tree.flatten(like)
    n_stored = len([k for k in z.files if k.startswith("p")])
    if n_stored != len(flat):
        raise ValueError(
            f"{path}: {n_stored} leaves but config '{name}' has "
            f"{len(flat)} — wrong architecture for this checkpoint")
    leaves = []
    for i, ref in enumerate(flat):
        a = z[f"p{i}"]
        if tuple(a.shape) != tuple(ref.shape):
            raise ValueError(
                f"{path}: leaf p{i} has shape {tuple(a.shape)}, config "
                f"'{name}' expects {tuple(ref.shape)}")
        leaves.append(jnp.asarray(a, jnp.float32))
    return cast_params(jax.tree.unflatten(treedef, leaves), dtype)


# ---------------------------------------------------------------------------
# LoRA adapters (parameter-efficient family fine-tuning)
# ---------------------------------------------------------------------------

# every per-layer matmul is adaptable; embed/lm_dense stay frozen (the LM
# head is tied to embed — adapting it would drift the output vocabulary
# geometry the PoE scores depend on)
LORA_TARGETS = ("q", "k", "v", "o", "fc1", "fc2")


def lora_init(key, name: str, rank: int, dtype=jnp.float32) -> dict:
    """Zero-delta LoRA adapter tree for config ``name``: per layer and per
    target matrix W [i, o], a down-projection a [i, r] (scaled normal) and
    an up-projection b [r, o] (zeros) — so the initial merged model equals
    the base exactly. The trainable state is 2·r·(i+o) per matrix instead
    of i·o: at rank 8 on transformer-L that is ~0.6% of the 650M base,
    which is what makes family fine-tuning of the reference's largest
    expert (reference nets.py:174-181) fit one chip with optimizer state."""
    cfg = CONFIGS[name]
    D, F, N = cfg["dim"], cfg["ffn"], cfg["layers"]
    shapes = {"q": (D, D), "k": (D, D), "v": (D, D), "o": (D, D),
              "fc1": (D, F), "fc2": (F, D)}
    keys = jax.random.split(key, N)

    def one(k):
        ks = jax.random.split(k, len(LORA_TARGETS))
        out = {}
        for kk, t in zip(ks, LORA_TARGETS):
            i, o = shapes[t]
            out[t] = {
                "a": (jax.random.normal(kk, (i, rank)) /
                      math.sqrt(i)).astype(dtype),
                "b": jnp.zeros((rank, o), dtype),
            }
        return out

    return {"layers": [one(k) for k in keys]}


def lora_merge(params: dict, lora: dict, alpha: float = 16.0) -> dict:
    """Merge adapters into a copy of ``params``: W' = W + (alpha/r)·a@b,
    accumulated in fp32 and cast back to W's dtype. The merged tree has
    the exact init() layout, so the whole expert/energy/sampler stack (and
    save_npz_checkpoint) consumes it unchanged — zero inference-time cost."""
    merged = {k: v for k, v in params.items()}
    if len(lora["layers"]) != len(params["layers"]):
        raise ValueError(
            f"LoRA tree has {len(lora['layers'])} layers, params have "
            f"{len(params['layers'])}")
    out_layers = []
    for lp, la in zip(params["layers"], lora["layers"]):
        lnew = {k: v for k, v in lp.items()}
        for t in LORA_TARGETS:
            a, b = la[t]["a"], la[t]["b"]
            w = lp[t]["w"]
            if (a.shape[0], b.shape[1]) != w.shape:
                raise ValueError(
                    f"LoRA target '{t}': adapter {a.shape}x{b.shape} does "
                    f"not match weight {w.shape}")
            scale = alpha / a.shape[1]
            delta = (a.astype(jnp.float32) @ b.astype(jnp.float32)) * scale
            lnew[t] = {"w": (w.astype(jnp.float32) + delta).astype(w.dtype),
                       "b": lp[t]["b"]}
        out_layers.append(lnew)
    merged["layers"] = out_layers
    return merged


# ---------------------------------------------------------------------------
# fair-esm checkpoint conversion
# ---------------------------------------------------------------------------

def load_torch_checkpoint(path: str, name: str, dtype=jnp.bfloat16) -> dict:
    """Convert a fair-esm ESM2 state_dict (.pt) to our pytree layout."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt)
    sd = {k.removeprefix("encoder.").removeprefix("sentence_encoder."): v
          for k, v in sd.items()}
    sd = {k: v.float().numpy() for k, v in sd.items()
          if hasattr(v, "numpy")}
    return from_state_dict(sd, name, dtype)


def from_state_dict(sd: dict, name: str, dtype=jnp.bfloat16) -> dict:
    """Map fair-esm ESM2 module names onto our pytree."""
    cfg = CONFIGS[name]

    def lin(prefix):
        return {"w": jnp.asarray(sd[f"{prefix}.weight"].T, dtype),
                "b": jnp.asarray(sd[f"{prefix}.bias"], dtype)}

    def ln(prefix):
        return {"g": jnp.asarray(sd[f"{prefix}.weight"], jnp.float32),
                "b": jnp.asarray(sd[f"{prefix}.bias"], jnp.float32)}

    layers = []
    for i in range(cfg["layers"]):
        p = f"layers.{i}"
        layers.append({
            "attn_ln": ln(f"{p}.self_attn_layer_norm"),
            "q": lin(f"{p}.self_attn.q_proj"),
            "k": lin(f"{p}.self_attn.k_proj"),
            "v": lin(f"{p}.self_attn.v_proj"),
            "o": lin(f"{p}.self_attn.out_proj"),
            "ffn_ln": ln(f"{p}.final_layer_norm"),
            "fc1": lin(f"{p}.fc1"),
            "fc2": lin(f"{p}.fc2"),
        })
    return {
        "embed": jnp.asarray(sd["embed_tokens.weight"], dtype),
        "layers": layers,
        "final_ln": ln("emb_layer_norm_after"),
        "lm_dense": lin("lm_head.dense"),
        "lm_ln": ln("lm_head.layer_norm"),
        "lm_bias": jnp.asarray(sd["lm_head.bias"], jnp.float32),
    }
