"""Training loops for the supervised/unsupervised experts.

Covers the reference training scripts natively:
  * MNIST sum-regression ensembles + oracle
    (scripts/train_binary_mnist_regression.py:23-129): AdamW, MSE, periodic
    checkpoints, rounding-accuracy eval incl. out-of-distribution sums;
  * binary-MNIST DAE (scripts/train_binary_mnist_dae.py:60-96):
    corrupt -> reconstruct BCE;
  * binary-MNIST EBM — the reference DELEGATES this to the external
    GWG_release repo (scripts/train_mnist.sh:25-33); here it is in-repo:
    persistent contrastive divergence with Gibbs-with-gradients chains.

TPU-first structure: datasets live ON DEVICE; batches are drawn with
jax.random indices inside a jitted lax.scan of ``chunk`` steps, so the host
touches the device only once per chunk (the reference's per-step DataLoader
round-trips would be ~0.3s/step through this environment's device tunnel).
Checkpoints are flattened-pytree npz files.
"""
from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ppde_tpu.models import mnist_nets


def save_ckpt(path: str, params, step: int):
    flat, treedef = jax.tree.flatten(jax.device_get(params))
    np.savez_compressed(path, step=step, treedef=str(treedef),
                        **{f"p{i}": a for i, a in enumerate(flat)})


def load_ckpt(path: str, params_like):
    z = np.load(path, allow_pickle=False)
    flat, treedef = jax.tree.flatten(params_like)
    loaded = [jnp.asarray(z[f"p{i}"]) for i in range(len(flat))]
    return jax.tree.unflatten(treedef, loaded), int(z["step"])


def _chunked(n_iters: int, chunk: int, *cadences: int, start: int = 0):
    """Yield (done, size) chunks, sized so every log/checkpoint cadence
    boundary lands exactly on a chunk boundary — including cadences that do
    not divide ``chunk`` (a chunk is shortened to end at the next boundary).
    ``start``: absolute step offset of done=0 (resumed runs), so boundaries
    stay aligned to absolute steps."""
    done = 0
    while done < n_iters:
        size = min(chunk, n_iters - done)
        for c in cadences:
            if c > 0:
                size = min(size, c - (start + done) % c)
        yield done, size
        done += size


# ---------------------------------------------------------------------------
# MNIST sum regression (ensemble members and the oracle)
# ---------------------------------------------------------------------------

def train_regression(dataset, nc: int = 16, n_iters: int = 25000,
                     batch_size: int = 128, lr: float = 1e-3,
                     weight_decay: float = 1e-4, seed: int = 0,
                     log_every: int = 1000, ckpt_path: str | None = None,
                     ckpt_every: int = 5000, quiet: bool = False,
                     chunk: int = 250, flip_maxp: int = 0):
    """dataset: MNISTSumPairs — its images/labels/pairs go on device; the
    dynamic binarization, pixel-flip noise and label noise are re-drawn per
    step with jax.random, matching the reference's training semantics
    (data/mnist.py:56-83): per-image flip rates p1,p2 ~ U{0..flip_maxp}%
    with INDEPENDENT masks, and Gaussian label smoothing y ~ N(y, 0.1).
    ``flip_maxp`` defaults to 0 — the reference regression trainer forces
    flip_maxp=0 (train_binary_mnist_regression.py:234), i.e. no pixel
    flips, only binarization + label smoothing."""
    params = mnist_nets.regression_init(jax.random.PRNGKey(seed), nc=nc)
    opt = optax.adamw(lr, weight_decay=weight_decay)
    opt_state = opt.init(params)

    images = jnp.asarray(dataset.images)          # [M, 784] intensities
    labels = jnp.asarray(dataset.labels, jnp.float32)
    pairs = jnp.asarray(dataset.pairs)            # [P, 2]
    train_noise = dataset.train_noise

    # datasets enter the jitted chunk as ARGUMENTS, not closures — captured
    # arrays are baked into the HLO and re-streamed per execution (CLAUDE.md)
    @jax.jit
    def run_chunk(params, opt_state, images, labels, pairs, length_keys):
        def one_step(carry, key):
            params, opt_state = carry
            k_sel, k_b1, k_b2, k_p1, k_p2, k_f1, k_f2, k_lab = \
                jax.random.split(key, 8)
            sel = jax.random.randint(k_sel, (batch_size,), 0, pairs.shape[0])
            a, b = pairs[sel, 0], pairs[sel, 1]
            x1 = (jax.random.uniform(k_b1, (batch_size, images.shape[1]))
                  < images[a]).astype(jnp.float32)
            x2 = (jax.random.uniform(k_b2, (batch_size, images.shape[1]))
                  < images[b]).astype(jnp.float32)
            y = labels[a] + labels[b]
            if train_noise:
                if flip_maxp > 0:
                    # per-image integer flip percent, independent masks
                    p1 = jax.random.randint(
                        k_p1, (batch_size, 1), 0, flip_maxp + 1) / 100.0
                    p2 = jax.random.randint(
                        k_p2, (batch_size, 1), 0, flip_maxp + 1) / 100.0
                    f1 = jax.random.uniform(k_f1, x1.shape) < p1
                    f2 = jax.random.uniform(k_f2, x2.shape) < p2
                    x1 = jnp.where(f1, 1.0 - x1, x1)
                    x2 = jnp.where(f2, 1.0 - x2, x2)
                y = y + 0.1 * jax.random.normal(k_lab, y.shape)

            def loss_fn(p_):
                pred = mnist_nets.regression_apply(p_, x1, x2)
                return jnp.mean((pred - y) ** 2)

            loss, g = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(g, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            one_step, (params, opt_state), length_keys)
        return params, opt_state, losses.mean()

    key = jax.random.PRNGKey(seed + 1)
    for done, size in _chunked(n_iters, chunk, log_every, ckpt_every):
        key, k = jax.random.split(key)
        params, opt_state, loss = run_chunk(params, opt_state, images,
                                            labels, pairs,
                                            jax.random.split(k, size))
        step = done + size
        if not quiet and (step % log_every == 0 or step == n_iters):
            print(f"[regression] iter {step} mse {float(loss):.4f}",
                  flush=True)
        if ckpt_path and (step % ckpt_every == 0 or step == n_iters):
            save_ckpt(f"{ckpt_path}_ckpt_{step}.npz", params, step)
    return params


def eval_regression_accuracy(params, dataset, n_batches: int = 20,
                             batch_size: int = 256):
    """Rounding accuracy (reference train_binary_mnist_regression.py:98-129)."""
    correct = total = 0
    it = dataset.batches(batch_size, steps=n_batches)
    apply_j = jax.jit(mnist_nets.regression_apply)
    for x1, x2, y in it:
        pred = np.asarray(apply_j(params, jnp.asarray(x1), jnp.asarray(x2)))
        correct += (np.round(pred) == y).sum()
        total += len(y)
    return correct / total


# ---------------------------------------------------------------------------
# DAE
# ---------------------------------------------------------------------------

def train_dae(images: np.ndarray, latent_dim: int = 16, n_channels: int = 64,
              max_p: int = 15, n_iters: int = 40000, batch_size: int = 128,
              lr: float = 1e-3, seed: int = 0, log_every: int = 1000,
              ckpt_path: str | None = None, ckpt_every: int = 10000,
              resume: str | None = None, quiet: bool = False,
              chunk: int = 250):
    params = mnist_nets.dae_init(jax.random.PRNGKey(seed), latent_dim,
                                 n_channels)
    opt = optax.adam(lr)
    opt_state = opt.init(params)
    start = 0
    if resume:
        params, start = load_ckpt(resume, params)

    data = jnp.asarray(images)

    # the dataset enters the jitted chunk as an ARGUMENT, not a closure
    # (captured arrays are baked into the HLO + re-streamed per execution)
    @jax.jit
    def run_chunk(params, opt_state, data, keys):
        def one_step(carry, key):
            params, opt_state = carry
            k_sel, k_corrupt = jax.random.split(key)
            sel = jax.random.randint(k_sel, (batch_size,), 0, data.shape[0])
            x = data[sel]
            noised = mnist_nets.dae_corrupt(k_corrupt, x, max_p)

            def loss_fn(p_):
                z = mnist_nets.dae_encode(p_, noised)
                logits = mnist_nets.dae_decode(p_, z)
                logits = jnp.transpose(logits, (0, 3, 1, 2)).reshape(
                    x.shape[0], -1)
                bce = (jnp.maximum(logits, 0) - logits * x
                       + jnp.log1p(jnp.exp(-jnp.abs(logits))))
                return jnp.mean(jnp.sum(bce, -1))

            loss, g = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(g, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            one_step, (params, opt_state), keys)
        return params, opt_state, losses.mean()

    key = jax.random.PRNGKey(seed + 1)
    for done, size in _chunked(n_iters - start, chunk, log_every,
                               ckpt_every, start=start):
        key, k = jax.random.split(key)
        params, opt_state, loss = run_chunk(params, opt_state, data,
                                            jax.random.split(k, size))
        step = start + done + size
        if not quiet and (step % log_every == 0 or step == n_iters):
            print(f"[dae] iter {step} bce {float(loss):.3f}", flush=True)
        if ckpt_path and (step % ckpt_every == 0 or step == n_iters):
            save_ckpt(f"{ckpt_path}_ckpt_{step}.npz", params, step)
    return params


# ---------------------------------------------------------------------------
# ESM2 masked-LM fine-tuning (family-specific transformer experts)
# ---------------------------------------------------------------------------

def _esm_tokens(seqs) -> np.ndarray:
    """Equal-length AA strings (or a ready int array) -> tokens [M, T]."""
    from ppde_tpu.models import esm2

    if isinstance(seqs, np.ndarray):
        toks = np.asarray(seqs, np.int32)
    else:
        unk = esm2.ESM_TOK_TO_IDX["<unk>"]
        toks = np.asarray(
            [[esm2.ESM_TOK_TO_IDX.get(c, unk) for c in s] for s in seqs],
            np.int32)
    if toks.ndim != 2:
        raise ValueError("seqs must be equal-length (aligned) sequences")
    return toks


def _esm_corrupt(key, tok, mask_prob: float, aa_lo: int, aa_hi: int):
    """BERT/ESM 80/10/10 corruption. -> (corrupted tokens, selected mask)."""
    from ppde_tpu.models import esm2

    k_mask, k_r, k_rnd = jax.random.split(key, 3)
    is_sel = jax.random.uniform(k_mask, tok.shape) < mask_prob
    r = jax.random.uniform(k_r, tok.shape)
    rnd = jax.random.randint(k_rnd, tok.shape, aa_lo, aa_hi + 1)
    corrupt = jnp.where(
        is_sel & (r < 0.8), esm2.MASK_IDX,
        jnp.where(is_sel & (r >= 0.9), rnd, tok))
    return corrupt, is_sel


def esm_mlm_heldout_ce(params, seqs, name: str = "transformer-S",
                       mask_prob: float = 0.15, seed: int = 0,
                       n_repeats: int = 4,
                       compute_dtype=jnp.bfloat16,
                       remat: bool | None = None) -> float:
    """Mean masked-LM cross-entropy of ``params`` on held-out sequences:
    the validation metric for train_esm_mlm (same 80/10/10 corruption,
    deterministic masks from ``seed``, averaged over ``n_repeats`` mask
    draws so the estimate is comparable across checkpoints)."""
    from ppde_tpu.models import esm2

    toks = _esm_tokens(seqs)
    heads = esm2.CONFIGS[name]["heads"]
    if remat is None:
        remat = name == "transformer-L"
    aa_lo = esm2.ESM_TOK_TO_IDX["L"]
    aa_hi = esm2.ESM_TOK_TO_IDX["C"]
    cparams = esm2.cast_params(params, compute_dtype)

    @jax.jit
    def one(p_, tok, key):
        def body(carry, k):
            corrupt, is_sel = _esm_corrupt(k, tok, mask_prob, aa_lo, aa_hi)
            x = jax.nn.one_hot(corrupt, esm2.ESM_VOCAB, dtype=jnp.float32)
            tgt = jax.nn.one_hot(tok, esm2.ESM_VOCAB, dtype=jnp.float32)
            lp = jax.nn.log_softmax(
                esm2.forward_logits(p_, x, heads, remat), -1)
            ce = -jnp.sum(tgt * lp, -1)
            w = is_sel.astype(jnp.float32)
            num, den = carry
            return (num + jnp.sum(ce * w), den + jnp.sum(w)), 0.0

        (num, den), _ = jax.lax.scan(
            body, (0.0, 0.0), jax.random.split(key, n_repeats))
        return num / jnp.maximum(den, 1.0)

    return float(one(cparams, jnp.asarray(toks),
                     jax.random.PRNGKey(seed)))


def train_esm_mlm(seqs, name: str = "transformer-S", params=None,
                  n_iters: int = 2000, batch_size: int = 32,
                  lr: float = 1e-4, warmup: int = 100,
                  weight_decay: float = 0.01, mask_prob: float = 0.15,
                  seed: int = 0, log_every: int = 100,
                  ckpt_path: str | None = None, ckpt_every: int = 1000,
                  resume: str | None = None, quiet: bool = False,
                  chunk: int = 25, compute_dtype=jnp.bfloat16,
                  mesh=None, remat: bool | None = None,
                  seq_weights=None, lora_rank: int = 0,
                  lora_alpha: float = 16.0):
    """Fine-tune (or pretrain) an ESM2 expert on a sequence family with the
    BERT/ESM masked-LM objective.

    The reference consumes a FROZEN external fork (esm_one_hot, reference
    nets.py:172-240) and has no way to make the expert family-specific;
    this is the native capability: fine-tune on the protein's own MSA, save
    a .npz the expert loads via --esm_weights (esm2.load_npz_checkpoint).

    * ``seqs``: list of equal-length AA strings (e.g. io.load_msa focus
      columns — alignment gaps map to the ESM '-' token) or an int token
      array [M, T]. Sequences are in the EXPERT's format — no cls/eos,
      matching the scoring path (reference nets.py:189 strips them), so
      train and eval see identical inputs.
    * Masking: ``mask_prob`` of positions per step; of those 80% -> <mask>,
      10% -> a random canonical AA, 10% kept. embed_tokens' token-dropout
      rescale is exact train-mode ESM2 semantics under this corruption.
    * Mixed precision: fp32 master params + optimizer state; compute
      params re-cast to ``compute_dtype`` inside the loss each step
      (esm2.cast_params — LN/lm_bias stay fp32). Pass
      ``params=`` a converted fair-esm checkpoint to fine-tune the
      published models; None initializes from scratch.
    * ``mesh``: optional jax.sharding.Mesh with a 'dp' axis — the token
      dataset and params are replicated, each per-step batch is constrained
      to dp-sharded rows, and GSPMD inserts the gradient all-reduce
      (tested vs single-device).
    * ``remat``: None = auto (per-layer jax.checkpoint for transformer-L,
      same policy as inference — required to fit the 650M vjp).
    * ``seq_weights``: optional [M] per-sequence sampling weights
      (e.g. potts_fit.sequence_weights' 1/neighborhood-size phylogenetic
      reweighting — the same debiasing the Potts pseudolikelihood fit
      applies); batches are drawn ~ weights instead of uniformly. None =
      uniform.
    * ``lora_rank`` > 0 freezes the base and trains rank-``lora_rank``
      LoRA adapters on every layer matmul (esm2.lora_init/lora_merge,
      scale ``lora_alpha``/rank) — optimizer state shrinks from 2x the
      base to ~1% of it, which is how the 650M expert fine-tunes on one
      chip. Checkpoints then hold the ADAPTER tree
      (``<ckpt_path>_lora_<step>.npz``; ``resume`` expects the same), and
      the returned params are the merged full model.

    Returns fp32 master params; checkpoints are save_ckpt npz files that
    esm2.load_npz_checkpoint validates per-leaf.
    """
    from ppde_tpu.models import esm2

    toks = _esm_tokens(seqs)

    heads = esm2.CONFIGS[name]["heads"]
    if remat is None:
        remat = name == "transformer-L"
    if params is None:
        params = esm2.init(jax.random.PRNGKey(seed), name, jnp.float32)
    else:
        params = jax.tree.map(  # fp32 master copy of whatever came in
            lambda a: a.astype(jnp.float32)
            if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a,
            params)

    # the trainable tree: the params themselves, or LoRA adapters over a
    # frozen base (esm2.lora_merge re-applies the delta inside the loss)
    if lora_rank:
        train = esm2.lora_init(jax.random.PRNGKey(seed + 7), name,
                               lora_rank)
    else:
        train = params

    sched = optax.warmup_cosine_decay_schedule(
        0.0, lr, warmup, max(n_iters, warmup + 1), end_value=0.1 * lr)
    decay_mask = jax.tree.map(lambda a: jnp.ndim(a) >= 2, train)
    opt = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(sched, weight_decay=weight_decay, mask=decay_mask))
    opt_state = opt.init(train)
    start = 0
    if resume:
        train, start = load_ckpt(resume, train)
        opt_state = opt.init(train)

    data = jnp.asarray(toks)
    if seq_weights is not None:
        if len(seq_weights) != toks.shape[0]:
            raise ValueError(
                f"seq_weights has {len(seq_weights)} entries for "
                f"{toks.shape[0]} sequences")
        logw = jnp.log(jnp.maximum(
            jnp.asarray(seq_weights, jnp.float32), 1e-30))
    else:
        logw = jnp.zeros((toks.shape[0],), jnp.float32)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        data = jax.device_put(data, repl)
        logw = jax.device_put(logw, repl)
        params = jax.device_put(params, repl)
        train = params if not lora_rank else jax.device_put(train, repl)
        opt_state = jax.device_put(opt_state, repl)

    # canonical AA token range for the 10% random-replacement corruption
    aa_lo = esm2.ESM_TOK_TO_IDX["L"]
    aa_hi = esm2.ESM_TOK_TO_IDX["C"]

    # base params AND the token dataset enter the jitted chunk as
    # ARGUMENTS, not closures — closed-over trees are baked into the HLO as
    # constants (CLAUDE.md: ~300s compile for 90MB; fatal at 650M) and
    # re-streamed per execution
    @jax.jit
    def run_chunk(base, train, opt_state, data, logw, keys):
        def one_step(carry, key):
            train, opt_state = carry
            k_sel, k_corrupt = jax.random.split(key)
            sel = jax.random.categorical(k_sel, logw, shape=(batch_size,))
            tok = data[sel]                                   # [B, T]
            corrupt, is_sel = _esm_corrupt(k_corrupt, tok, mask_prob,
                                           aa_lo, aa_hi)
            x = jax.nn.one_hot(corrupt, esm2.ESM_VOCAB, dtype=jnp.float32)
            tgt = jax.nn.one_hot(tok, esm2.ESM_VOCAB, dtype=jnp.float32)
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                shard = NamedSharding(mesh, P("dp"))
                x = jax.lax.with_sharding_constraint(x, shard)
                tgt = jax.lax.with_sharding_constraint(tgt, shard)
            w = is_sel.astype(jnp.float32)

            def loss_fn(t_):
                full = (esm2.lora_merge(base, t_, lora_alpha)
                        if lora_rank else t_)
                logits = esm2.forward_logits(
                    esm2.cast_params(full, compute_dtype), x, heads, remat)
                lp = jax.nn.log_softmax(logits, -1)
                ce = -jnp.sum(tgt * lp, -1)                   # [B, T]
                return jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1.0)

            loss, g = jax.value_and_grad(loss_fn)(train)
            updates, opt_state = opt.update(g, opt_state, train)
            return (optax.apply_updates(train, updates), opt_state), loss

        (train, opt_state), losses = jax.lax.scan(
            one_step, (train, opt_state), keys)
        return train, opt_state, losses.mean()

    ck_tag = "_lora_" if lora_rank else "_ckpt_"
    key = jax.random.PRNGKey(seed + 3)
    for done, size in _chunked(n_iters - start, chunk, log_every,
                               ckpt_every, start=start):
        key, k = jax.random.split(key)
        train, opt_state, loss = run_chunk(params, train, opt_state,
                                           data, logw,
                                           jax.random.split(k, size))
        step = start + done + size
        if not quiet and (step % log_every == 0 or step == n_iters):
            print(f"[esm_mlm] iter {step} ce {float(loss):.4f} "
                  f"ppl {float(jnp.exp(loss)):.2f}", flush=True)
        if ckpt_path and (step % ckpt_every == 0 or step == n_iters):
            save_ckpt(f"{ckpt_path}{ck_tag}{step}.npz", train, step)
    return esm2.lora_merge(params, train, lora_alpha) if lora_rank \
        else train


# ---------------------------------------------------------------------------
# MSA-Transformer masked-LM training (family-specific evolutionary-density
# scorers)
# ---------------------------------------------------------------------------

def _msa_corrupt(key, tok, mask_prob: float):
    """BERT/ESM 80/10/10 corruption over an MSA block [.., R, C+1]; column 0
    (<cls>) is never selected. Returns (corrupted, selected mask)."""
    from ppde_tpu.models import esm2

    corrupt, is_sel = _esm_corrupt(key, tok, mask_prob,
                                   esm2.ESM_TOK_TO_IDX["L"],
                                   esm2.ESM_TOK_TO_IDX["C"])
    keep_cls = jnp.arange(tok.shape[-1]) == 0
    corrupt = jnp.where(keep_cls, tok, corrupt)
    return corrupt, is_sel & ~keep_cls


def msa_mlm_heldout_ce(params, msa_rows, name: str = "msa-S",
                       block_rows: int = 16, mask_prob: float = 0.15,
                       seed: int = 0, n_repeats: int = 4,
                       compute_dtype=jnp.bfloat16) -> float:
    """Masked-LM cross-entropy of an MSA-Transformer on held-out alignment
    rows: ``n_repeats`` random [block_rows, C+1] blocks with deterministic
    masks — the validation metric for train_msa_mlm."""
    from ppde_tpu.models import esm2
    from ppde_tpu.models import msa_transformer as msat

    toks = jnp.asarray(msat.tokenize_msa(list(msa_rows)))
    heads = msat.CONFIGS[name]["heads"]
    vocab = esm2.ESM_VOCAB
    cparams = msat.cast_params(params, compute_dtype)
    R = min(block_rows, toks.shape[0])

    @jax.jit
    def one(p_, toks, key):
        def body(carry, k):
            k_sel, k_corrupt = jax.random.split(k)
            sel = jax.random.randint(k_sel, (R,), 0, toks.shape[0])
            block = toks[sel]                                   # [R, C+1]
            corrupt, is_sel = _msa_corrupt(k_corrupt, block, mask_prob)
            lp = jax.nn.log_softmax(
                msat.forward_logits(p_, corrupt[None], heads)[0], -1)
            tgt = jax.nn.one_hot(block, vocab, dtype=jnp.float32)
            ce = -jnp.sum(tgt * lp, -1)
            w = is_sel.astype(jnp.float32)
            num, den = carry
            return (num + jnp.sum(ce * w), den + jnp.sum(w)), 0.0

        (num, den), _ = jax.lax.scan(
            body, (0.0, 0.0), jax.random.split(key, n_repeats))
        return num / jnp.maximum(den, 1.0)

    return float(one(cparams, toks, jax.random.PRNGKey(seed)))


def train_msa_mlm(msa_rows, name: str = "msa-S", params=None,
                  n_iters: int = 2000, block_rows: int = 16,
                  lr: float = 3e-4, warmup: int = 100,
                  weight_decay: float = 0.01, mask_prob: float = 0.15,
                  seed: int = 0, log_every: int = 100,
                  ckpt_path: str | None = None, ckpt_every: int = 1000,
                  resume: str | None = None, quiet: bool = False,
                  chunk: int = 25, compute_dtype=jnp.bfloat16,
                  seq_weights=None):
    """Train an MSA-Transformer (axial attention) on a protein family
    alignment with the masked-LM objective.

    The reference scores evolutionary density with the FROZEN pre-trained
    esm_msa1b model (reference metrics.py:22-76) whose weights cannot be
    downloaded here; this trainer is the native capability that fills that
    role offline: fit a small CONFIGS entry (msa-S) on the family's own
    .a2m, save a .npz that metrics.proteins_transformer_score loads via
    --msa_transformer_weights (msa_transformer.load_npz_checkpoint,
    per-leaf validated).

    * ``msa_rows``: aligned focus-column strings (io.load_msa row values) —
      the SAME view masked_marginals scores at eval time (WT window +
      family rows; gaps are the ESM '-' token).
    * Each step trains on one [block_rows, C+1] alignment block: rows drawn
      ~ ``seq_weights`` (e.g. potts_fit.sequence_weights phylogenetic
      debiasing) or uniformly, tokenized once on device, <cls> prepended by
      tokenize_msa. 80/10/10 corruption over all non-<cls> positions.
    * Mixed precision: fp32 master params + optimizer state; compute params
      re-cast to ``compute_dtype`` per step (msa_transformer.cast_params).

    Returns fp32 master params; checkpoints are save_ckpt npz files.
    """
    from ppde_tpu.models import esm2
    from ppde_tpu.models import msa_transformer as msat

    toks = np.asarray(msat.tokenize_msa(list(msa_rows)), np.int32)
    heads = msat.CONFIGS[name]["heads"]
    data_vocab = esm2.ESM_VOCAB
    if params is None:
        params = msat.init(jax.random.PRNGKey(seed), jnp.float32, name=name)
    else:
        params = jax.tree.map(
            lambda a: a.astype(jnp.float32)
            if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a,
            params)

    sched = optax.warmup_cosine_decay_schedule(
        0.0, lr, warmup, max(n_iters, warmup + 1), end_value=0.1 * lr)
    decay_mask = jax.tree.map(lambda a: jnp.ndim(a) >= 2, params)
    opt = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(sched, weight_decay=weight_decay, mask=decay_mask))
    opt_state = opt.init(params)
    start = 0
    if resume:
        params, start = load_ckpt(resume, params)
        opt_state = opt.init(params)

    data = jnp.asarray(toks)
    if seq_weights is not None:
        if len(seq_weights) != toks.shape[0]:
            raise ValueError(
                f"seq_weights has {len(seq_weights)} entries for "
                f"{toks.shape[0]} alignment rows")
        logw = jnp.log(jnp.maximum(
            jnp.asarray(seq_weights, jnp.float32), 1e-30))
    else:
        logw = jnp.zeros((toks.shape[0],), jnp.float32)
    R = min(block_rows, toks.shape[0])

    # the token dataset enters the jitted chunk as an ARGUMENT, not a
    # closure (captured arrays: HLO constants + per-execution re-streaming)
    @jax.jit
    def run_chunk(params, opt_state, data, logw, keys):
        def one_step(carry, key):
            params, opt_state = carry
            k_sel, k_corrupt = jax.random.split(key)
            sel = jax.random.categorical(k_sel, logw, shape=(R,))
            block = data[sel]                                   # [R, C+1]
            corrupt, is_sel = _msa_corrupt(k_corrupt, block, mask_prob)
            w = is_sel.astype(jnp.float32)

            tgt = jax.nn.one_hot(block, data_vocab, dtype=jnp.float32)

            def loss_fn(p_):
                lp = jax.nn.log_softmax(
                    msat.forward_logits(
                        msat.cast_params(p_, compute_dtype),
                        corrupt[None], heads)[0], -1)
                ce = -jnp.sum(tgt * lp, -1)                     # [R, C+1]
                return jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1.0)

            loss, g = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(g, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            one_step, (params, opt_state), keys)
        return params, opt_state, losses.mean()

    key = jax.random.PRNGKey(seed + 3)
    for done, size in _chunked(n_iters - start, chunk, log_every,
                               ckpt_every, start=start):
        key, k = jax.random.split(key)
        params, opt_state, loss = run_chunk(params, opt_state, data, logw,
                                            jax.random.split(k, size))
        step = start + done + size
        if not quiet and (step % log_every == 0 or step == n_iters):
            print(f"[msa_mlm] iter {step} ce {float(loss):.4f} "
                  f"ppl {float(jnp.exp(loss)):.2f}", flush=True)
        if ckpt_path and (step % ckpt_every == 0 or step == n_iters):
            save_ckpt(f"{ckpt_path}_ckpt_{step}.npz", params, step)
    return params


# ---------------------------------------------------------------------------
# EBM (persistent contrastive divergence with GWG sampling)
# ---------------------------------------------------------------------------

def gwg_flip_step(params, x, key, log_prob_fn=None):
    """One Gibbs-with-gradients bit-flip MH step on binary states [B, D]
    (Grathwohl et al.; the move kernel of the trainer the reference shells
    out to, scripts/train_mnist.sh:25-33)."""
    if log_prob_fn is None:
        log_prob_fn = mnist_nets.ebm_log_prob

    def e_fn(v):
        return log_prob_fn(params, v).sum()

    grad = jax.grad(e_fn)(x)
    logits = grad * -(2.0 * x - 1.0) / 2.0
    k1, k2 = jax.random.split(key)
    idx = jax.random.categorical(k1, logits, axis=-1)
    flip = jax.nn.one_hot(idx, x.shape[-1], dtype=x.dtype)
    y = (1 - x) * flip + x * (1 - flip)
    e_x = log_prob_fn(params, x)
    e_y = log_prob_fn(params, y)
    fwd = jax.nn.log_softmax(logits, -1)[jnp.arange(x.shape[0]), idx]
    rev_logits = jax.grad(e_fn)(y) * -(2.0 * y - 1.0) / 2.0
    rev = jax.nn.log_softmax(rev_logits, -1)[jnp.arange(x.shape[0]), idx]
    la = e_y - e_x + rev - fwd
    acc = (jnp.exp(la) > jax.random.uniform(k2, (x.shape[0],)))
    return jnp.where(acc[:, None], y, x)


def train_ebm(images: np.ndarray, n_channels: int = 64, n_iters: int = 10000,
              batch_size: int = 100, buffer_size: int = 1000,
              sampling_steps: int = 20, lr: float = 1e-4,
              p_control: float = 1e-2, seed: int = 0, log_every: int = 200,
              ckpt_path: str | None = None, ckpt_every: int = 2000,
              quiet: bool = False, chunk: int = 50,
              reinit_p: float = 0.05, data_noise_p: float = 0.01):
    """Persistent CD: maximize E[logp(data)] - E[logp(buffer)] with GWG
    chain updates on an on-device replay buffer (the method of the upstream
    GWG_release trainer the reference shells out to). ``p_control``
    penalizes the squared energy-net outputs — without it the CD objective
    drives the energies unboundedly apart. ``reinit_p`` restarts that
    fraction of each iteration's buffer chains from the Bernoulli base —
    without it, persistent chains fall behind a sharpening landscape (the
    stale model term then diverges: observed on the low-diversity augmented
    real-MNIST corpus, NaN by iter ~600). ``data_noise_p`` flips that
    fraction of data pixels per batch (the reference's own MNIST training
    noise, data/mnist.py:56-83) — it lower-bounds the entropy of the target
    distribution, so the CD gap cannot sharpen without bound on a
    low-diversity corpus."""
    mean = images.mean(0).clip(1e-2, 1 - 1e-2)
    params = mnist_nets.ebm_init(jax.random.PRNGKey(seed), n_channels,
                                 mean=mean)
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(lr))
    opt_state = opt.init(params)

    data = jnp.asarray(images)
    rng = np.random.default_rng(seed)
    buffer0 = jnp.asarray(
        (rng.random((buffer_size, images.shape[1]))
         < np.asarray(mean)[None]).astype(np.float32))

    mean_j = jnp.asarray(np.asarray(mean), jnp.float32)

    # the dataset + base mean enter the jitted chunk as ARGUMENTS, not
    # closures (captured arrays: HLO constants + per-execution re-streaming)
    @jax.jit
    def run_chunk(params, opt_state, buffer, data, mean_j, keys):
        def one_step(carry, key):
            params, opt_state, buffer = carry
            (k_data, k_bin, k_buf, k_chain,
             k_re, k_re_bin, k_noise) = jax.random.split(key, 7)
            sel = jax.random.randint(k_data, (batch_size,), 0,
                                     data.shape[0])
            x_data = (jax.random.uniform(k_bin, (batch_size, data.shape[1]))
                      < data[sel]).astype(jnp.float32)
            if data_noise_p > 0:
                flip = (jax.random.uniform(k_noise, x_data.shape)
                        < data_noise_p).astype(jnp.float32)
                x_data = x_data * (1 - flip) + (1 - x_data) * flip
            bsel = jax.random.randint(k_buf, (batch_size,), 0,
                                      buffer.shape[0])
            x0 = buffer[bsel]
            # restart a fraction of chains from the Bernoulli base each step
            re = jax.random.uniform(k_re, (batch_size, 1)) < reinit_p
            fresh = (jax.random.uniform(k_re_bin, x0.shape)
                     < mean_j[None]).astype(jnp.float32)
            x0 = jnp.where(re, fresh, x0)

            def chain_body(x, k):
                return gwg_flip_step(params, x, k), ()

            x_model, _ = jax.lax.scan(
                chain_body, x0, jax.random.split(k_chain, sampling_steps))

            def loss_fn(p_):
                lp_data = mnist_nets.ebm_log_prob(p_, x_data).mean()
                lp_model = mnist_nets.ebm_log_prob(p_, x_model).mean()
                reg = p_control * (
                    (mnist_nets.ebm_net_apply(p_, x_data) ** 2).mean()
                    + (mnist_nets.ebm_net_apply(p_, x_model) ** 2).mean())
                return -(lp_data - lp_model) + reg, (lp_data, lp_model)

            (loss, aux), g = jax.value_and_grad(loss_fn,
                                                has_aux=True)(params)
            updates, opt_state = opt.update(g, opt_state, params)
            params = optax.apply_updates(params, updates)
            buffer = buffer.at[bsel].set(x_model)
            return (params, opt_state, buffer), (loss, aux[0], aux[1])

        (params, opt_state, buffer), (losses, lpd, lpm) = jax.lax.scan(
            one_step, (params, opt_state, buffer), keys)
        return params, opt_state, buffer, losses.mean(), lpd.mean(), lpm.mean()

    key = jax.random.PRNGKey(seed + 7)
    buffer = buffer0
    for done, size in _chunked(n_iters, chunk, log_every, ckpt_every):
        key, k = jax.random.split(key)
        params, opt_state, buffer, loss, lpd, lpm = run_chunk(
            params, opt_state, buffer, data, mean_j,
            jax.random.split(k, size))
        step = done + size
        if not quiet and (step % log_every == 0 or step == n_iters):
            print(f"[ebm] iter {step} obj {float(loss):.3f} "
                  f"logp_data {float(lpd):.1f} logp_model {float(lpm):.1f}",
                  flush=True)
        if ckpt_path and (step % ckpt_every == 0 or step == n_iters):
            save_ckpt(f"{ckpt_path}_ckpt_{step}.npz", params, step)
    return params
