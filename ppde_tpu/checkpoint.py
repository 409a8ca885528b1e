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
    """Persist sampler state at a segment boundary (atomic).

    Every record value is persisted: arrays as-is, scalars (python floats /
    ints, e.g. steps_per_sec) as 0-d arrays that ``load`` converts back.
    A value that cannot round-trip through ``np.asarray`` (object dtype)
    raises immediately, naming the key — silently dropping a record and
    discovering the asymmetry at resume time is the failure mode this
    guards against."""
    flat, _ = jax.tree.flatten(jax.device_get(state))
    _atomic_savez(os.path.join(ckpt_dir, "state.npz"),
                  key=np.asarray(jax.device_get(key)),
                  steps_done=np.asarray(steps_done),
                  n_leaves=np.asarray(len(flat)),
                  **{f"leaf{i}": a for i, a in enumerate(flat)})
    if records:
        out = {}
        for k, v in records.items():
            arr = np.asarray(jax.device_get(v))
            if arr.dtype == object:
                raise TypeError(
                    f"checkpoint record {k!r}: value of type "
                    f"{type(v).__name__} does not convert to a numeric "
                    "array — records must be arrays or scalars")
            out[k] = arr
        _atomic_savez(os.path.join(ckpt_dir, "records.npz"), **out)


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
        try:
            rz = np.load(rp)
            # 0-d arrays are persisted scalars (save's round-trip
            # contract). np.load of an .npz is LAZY — a corrupt member
            # only surfaces at rz[k], so extraction must sit inside the
            # same guard as the header open.
            records = {k: (rz[k].item() if rz[k].ndim == 0 else rz[k])
                       for k in rz.files}
        except Exception as e:
            raise ValueError(
                f"checkpoint records file {rp} is unreadable "
                f"({type(e).__name__}: {e}) — delete it (state.npz alone "
                "resumes without histories) or restore it") from e
    return state, key, steps_done, records


def validate_records(prior: dict, fresh: dict, *,
                     skip: tuple = ("oracle",)) -> None:
    """Check that resumed record histories are concatenable with the
    records a fresh segment produces, naming the offending key.

    ``prior`` arrays carry a leading step axis accumulated so far; ``fresh``
    values are one segment's records [seg_len, ...]. Scalars in ``prior``
    (persisted throughput numbers etc.) are ignored — they are recomputed
    every run. Keys in ``skip`` have their own cadence (oracle logs at
    segment boundaries, not per step)."""
    fresh_keys = {k for k, v in fresh.items() if np.ndim(v) >= 1}
    prior_keys = {k for k, v in prior.items()
                  if np.ndim(v) >= 1 and k not in skip}
    missing = prior_keys - fresh_keys
    extra = fresh_keys - prior_keys
    if missing:
        raise ValueError(
            f"checkpoint records carry keys {sorted(missing)} the resumed "
            "run no longer produces — the run configuration changed since "
            "this checkpoint was written")
    if extra:
        raise ValueError(
            f"resumed run produces record keys {sorted(extra)} absent from "
            "the checkpoint — the run configuration changed since this "
            "checkpoint was written")
    for k in sorted(prior_keys):
        ps, fs = np.shape(prior[k])[1:], np.shape(fresh[k])[1:]
        if ps != fs:
            raise ValueError(
                f"checkpoint record {k!r}: stored per-step shape {ps} != "
                f"resumed run's {fs} — the run configuration changed since "
                "this checkpoint was written")
