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
    pytree structure (arrays are replaced by the checkpointed values)."""
    z = np.load(os.path.join(ckpt_dir, "state.npz"))
    flat, treedef = jax.tree.flatten(state_like)
    assert int(z["n_leaves"]) == len(flat), (
        f"checkpoint has {int(z['n_leaves'])} leaves, run config produces "
        f"{len(flat)} — configuration mismatch")
    import jax.numpy as jnp

    leaves = [jnp.asarray(z[f"leaf{i}"]) for i in range(len(flat))]
    state = jax.tree.unflatten(treedef, leaves)
    key = jnp.asarray(z["key"])
    steps_done = int(z["steps_done"])
    records = {}
    rp = os.path.join(ckpt_dir, "records.npz")
    if os.path.exists(rp):
        rz = np.load(rp)
        records = {k: rz[k] for k in rz.files}
    return state, key, steps_done, records
