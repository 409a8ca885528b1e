"""Sampler harness: segment-scanned runs with on-device histories.

The framework contract mirrors the reference BaseSampler.run
(ppde/base_sampler.py:4-33): a sampler consumes an initial population
[n_chains, ...], steps ``num_steps`` times against an energy function with an
oracle scored every ``log_every`` steps, and returns per-chain bests plus
full energy/fitness histories and one chain's visualization trajectory.

TPU-first structure: ``num_steps`` is split into ``log_every``-sized
segments; each segment is ONE jitted ``lax.scan`` (zero host syncs inside).
Between segments the runner scores the oracle (also jitted) and emits a log
line — the reference's per-step Python loop with host round-trips
(e.g. protein ppde.py:65-170) becomes ~num_steps/log_every device programs.
Per-chain argmax-energy "best" tracking is folded into the scan carry
instead of materializing the [steps, chains, L, V] history the reference
keeps on host (protein ppde.py:38,146,175-183).
"""
from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class SamplerResult:
    """Unified result object (reference returns differ between domains —
    protein returns per-chain bests, MNIST returns the final population;
    both capabilities are kept)."""

    best_x: np.ndarray          # [n_chains, ...] per-chain argmax-energy state
    best_energy: np.ndarray     # [n_chains]
    best_fitness: np.ndarray    # [n_chains]
    energy_history: np.ndarray  # [n_records, n_chains]
    fitness_history: np.ndarray  # [n_records, n_chains]
    random_traj: np.ndarray | None  # [n_records_traj, ...] one chain's states
    final_x: np.ndarray         # [n_chains, ...] final population
    oracle_history: np.ndarray  # [n_logs, n_chains]
    n_accepted: np.ndarray | None = None  # [n_records] accepted count per step
    steps_per_sec: float = 0.0


def segment_lengths(num_steps: int, log_every: int) -> list[int]:
    """Split num_steps into log_every-sized scan segments (+ remainder)."""
    out = [log_every] * (num_steps // log_every)
    if num_steps % log_every:
        out.append(num_steps % log_every)
    return out


def run_segmented(
    *,
    step_fn: Callable,
    init_state: Any,
    key: jax.Array,
    num_steps: int,
    log_every: int,
    oracle_fn: Callable | None,
    log_fn: Callable | None = None,
    quiet: bool = False,
) -> tuple[Any, dict]:
    """Drive ``step_fn`` for ``num_steps`` in jitted scan segments.

    step_fn: (state, key) -> (state, ys) where ys is a dict of per-step
    records (at minimum 'energy' and 'fitness', each [n_chains]).
    oracle_fn: state -> [n_chains] ground-truth scores (jitted callable).

    Returns (final_state, records) where records stacks all per-step ys along
    axis 0 plus 'oracle' sampled at segment boundaries.
    """

    def segment(state, key, length):
        keys = jax.random.split(key, length)
        return jax.lax.scan(step_fn, state, keys)

    seg_jit = jax.jit(segment, static_argnums=2)
    oracle_jit = jax.jit(oracle_fn) if oracle_fn is not None else None

    state = init_state
    all_ys: list = []
    oracle_hist: list = []

    if oracle_jit is not None:
        oracle_hist.append(jax.device_get(oracle_jit(state)))
    if log_fn is not None and not quiet:
        log_fn(0, state, None, oracle_hist[-1] if oracle_hist else None)

    t0 = time.perf_counter()
    done = 0
    for length in segment_lengths(num_steps, log_every):
        key, seg_key = jax.random.split(key)
        state, ys = seg_jit(state, seg_key, length)
        done += length
        if oracle_jit is not None:
            oracle_hist.append(jax.device_get(oracle_jit(state)))
        all_ys.append(jax.device_get(ys))
        if log_fn is not None and not quiet:
            log_fn(done, state, all_ys[-1],
                   oracle_hist[-1] if oracle_hist else None)
    jax.block_until_ready(state)
    elapsed = time.perf_counter() - t0

    records = {}
    if all_ys:
        records = {k: np.concatenate([y[k] for y in all_ys], axis=0)
                   for k in all_ys[0]}
    records["oracle"] = (np.stack(oracle_hist, 0) if oracle_hist
                         else np.zeros((0,)))
    records["steps_per_sec"] = done / max(elapsed, 1e-9)
    return state, records


def default_log(tag: str):
    """Reference-style quantile log lines (protein ppde.py:54-56,164-170)."""

    def log_fn(step, state, ys, oracle_scores):
        import numpy as _np

        def q(v):
            v = _np.asarray(v, dtype=_np.float64)
            return _np.quantile(v, [0.5, 0.9])

        parts = [f"[{tag} iter {step}]"]
        if ys is not None:
            eq, fq = q(ys["energy"][-1]), q(ys["fitness"][-1])
            parts.append(f"energy 50% {eq[0]:.3f} 90% {eq[1]:.3f};")
            parts.append(f"pred fit 50% {fq[0]:.3f} 90% {fq[1]:.3f};")
            if "accepted" in ys:
                parts.append(f"#accepted {int(ys['accepted'][-1].sum())};")
        if oracle_scores is not None:
            oq = q(oracle_scores)
            parts.append(f"oracle 50% {oq[0]:.3f} 90% {oq[1]:.3f}")
        print(" ".join(parts), flush=True)

    return log_fn


def update_best(best, new_e, new_fit, new_x):
    """Running per-chain argmax-energy tracker (first max wins, matching the
    reference's torch.max over history)."""
    best_e, best_fit, best_x = best
    better = new_e > best_e
    bx = jnp.where(better.reshape((-1,) + (1,) * (new_x.ndim - 1)), new_x, best_x)
    return (jnp.where(better, new_e, best_e),
            jnp.where(better, new_fit, best_fit),
            bx)
