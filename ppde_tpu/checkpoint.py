"""Checkpoint/resume for sampler runs.

The reference has NO sampler checkpointing — chain state lives only in
process memory and histories are dumped post-hoc (SURVEY.md §5;
directed_evolution.py:92-107). Here every segment boundary can persist
(chain state, PRNG key, steps done, accumulated records) so long runs
survive preemption and restart bit-exactly.

Format: a directory with
  * state.npz — flattened sampler-state pytree (+ PRNG key, step counter)
  * records.npz — concatenated per-step records so far
The pytree structure is supplied by the caller on restore (it is a function
of the run configuration, which is reproducible from config.txt).
"""
from __future__ import annotations

import os
import tempfile

import jax
import numpy as np


def _atomic_savez(path: str, **arrays):
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp.npz")
    os.close(fd)
    try:
        np.savez(tmp, **arrays)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


def save(ckpt_dir: str, state, key, steps_done: int, records: dict | None):
    """Persist sampler state at a segment boundary (atomic)."""
    flat, _ = jax.tree.flatten(jax.device_get(state))
    _atomic_savez(os.path.join(ckpt_dir, "state.npz"),
                  key=np.asarray(jax.device_get(key)),
                  steps_done=np.asarray(steps_done),
                  n_leaves=np.asarray(len(flat)),
                  **{f"leaf{i}": a for i, a in enumerate(flat)})
    if records:
        _atomic_savez(os.path.join(ckpt_dir, "records.npz"),
                      **{k: np.asarray(v) for k, v in records.items()
                         if isinstance(v, np.ndarray)})


def exists(ckpt_dir: str) -> bool:
    return os.path.exists(os.path.join(ckpt_dir, "state.npz"))


def load(ckpt_dir: str, state_like):
    """Restore (state, key, steps_done, records). ``state_like`` provides the
    pytree structure (arrays are replaced by the checkpointed values).

    Every leaf is validated against ``state_like``'s shape AND dtype, naming
    the offending leaf by its pytree path — a changed run config with a
    coincidentally equal leaf count must fail HERE with a readable error,
    not later inside jit (or silently reshape in host code)."""
    z = np.load(os.path.join(ckpt_dir, "state.npz"))
    flat_paths, treedef = jax.tree_util.tree_flatten_with_path(state_like)
    if int(z["n_leaves"]) != len(flat_paths):
        raise ValueError(
            f"checkpoint has {int(z['n_leaves'])} leaves, run config "
            f"produces {len(flat_paths)} — configuration mismatch")
    import jax.numpy as jnp

    leaves = []
    for i, (path, like) in enumerate(flat_paths):
        arr = z[f"leaf{i}"]
        like = np.asarray(like)
        name = jax.tree_util.keystr(path) or f"leaf{i}"
        if tuple(arr.shape) != tuple(like.shape):
            raise ValueError(
                f"checkpoint leaf {name}: stored shape {tuple(arr.shape)} != "
                f"configured {tuple(like.shape)} — the run configuration "
                "changed since this checkpoint was written")
        if arr.dtype != like.dtype:
            raise ValueError(
                f"checkpoint leaf {name}: stored dtype {arr.dtype} != "
                f"configured {like.dtype} — the run configuration changed "
                "since this checkpoint was written")
        leaves.append(jnp.asarray(arr))
    state = jax.tree.unflatten(treedef, leaves)
    key = jnp.asarray(z["key"])
    steps_done = int(z["steps_done"])
    records = {}
    rp = os.path.join(ckpt_dir, "records.npz")
    if os.path.exists(rp):
        rz = np.load(rp)
        records = {k: rz[k] for k in rz.files}
    return state, key, steps_done, records
