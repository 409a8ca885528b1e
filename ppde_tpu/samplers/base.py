"""Sampler harness: segment-scanned runs with on-device histories.

The framework contract mirrors the reference BaseSampler.run
(ppde/base_sampler.py:4-33): a sampler consumes an initial population
[n_chains, ...], steps ``num_steps`` times against an energy function with an
oracle scored every ``log_every`` steps, and returns per-chain bests plus
full energy/fitness histories and one chain's visualization trajectory.

TPU-first structure:
  * ``num_steps`` splits into ``log_every``-sized segments; each segment is
    ONE jitted ``lax.scan`` (zero host syncs inside) — the reference's
    per-step Python loop with host round-trips (protein ppde.py:65-170)
    becomes ~num_steps/log_every device programs;
  * per-chain argmax-energy "best" tracking is a running scan carry instead
    of a host-side [steps, chains, L, V] history (protein ppde.py:175-183);
  * ALL array state (energy/oracle parameters, wild type, initial
    population, per-chain hyperparameters) flows through the jit boundary
    as an explicit ``ctx`` pytree — capturing it in closures would bake
    multi-MB constants into the compiled HLO (measured ~300s compile for a
    GFP-sized Potts vs ~1s when passed as arguments).
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
    # pure sampler throughput: scan segments only, forced complete by a
    # scalar readback (excludes record device_get, oracle evals, logging
    # and checkpoint saves)
    steps_per_sec: float = 0.0
    # end-to-end throughput incl. per-segment host work (oracle, records,
    # checkpoints) — what a user actually experiences for a full run
    wall_steps_per_sec: float = 0.0


def segment_lengths(num_steps: int, log_every: int) -> list[int]:
    """Split num_steps into log_every-sized scan segments (+ remainder)."""
    out = [log_every] * (num_steps // log_every)
    if num_steps % log_every:
        out.append(num_steps % log_every)
    return out


def run_segmented(
    *,
    step_fn: Callable,
    ctx: Any,
    init_state: Any,
    key: jax.Array,
    num_steps: int,
    log_every: int,
    oracle_fn: Callable | None,
    log_fn: Callable | None = None,
    quiet: bool = False,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
) -> tuple[Any, dict]:
    """Drive ``step_fn`` for ``num_steps`` in jitted scan segments.

    step_fn: (ctx, state, key) -> (state, ys); ys is a dict of per-step
    records (at minimum 'energy' and 'fitness', each [n_chains]).
    ctx: pytree of device arrays (parameters etc.), passed through jit.
    oracle_fn: (ctx, state) -> [n_chains] ground-truth scores.
    checkpoint_dir: if set, (state, key, step, records) persist every
    ``checkpoint_every`` segments and the run resumes from an existing
    checkpoint automatically (capability absent from the reference,
    SURVEY.md §5).
    """
    from ppde_tpu import checkpoint as ckpt

    def segment(ctx, state, key, length):
        keys = jax.random.split(key, length)
        return jax.lax.scan(lambda s, k: step_fn(ctx, s, k), state, keys)

    seg_jit = jax.jit(segment, static_argnums=3)
    oracle_jit = jax.jit(oracle_fn) if oracle_fn is not None else None

    state = init_state
    all_ys: list = []
    oracle_hist: list = []
    start_steps = 0

    resumed_with_records = False
    if checkpoint_dir is not None and ckpt.exists(checkpoint_dir):
        state, key, start_steps, prior = ckpt.load(checkpoint_dir, init_state)
        if prior:
            oracle_hist = ([o for o in prior.pop("oracle")]
                           if "oracle" in prior else [])
            # persisted scalars (steps_per_sec etc.) are recomputed each
            # run; only array histories are carried into the concat path
            prior = {k: v for k, v in prior.items() if np.ndim(v) >= 1}
            if prior:
                all_ys.append(prior)
                resumed_with_records = True
        if not quiet:
            print(f"[resume] restored checkpoint at step {start_steps} from "
                  f"{checkpoint_dir}", flush=True)
    else:
        if oracle_jit is not None:
            oracle_hist.append(jax.device_get(oracle_jit(ctx, state)))
        if log_fn is not None and not quiet:
            log_fn(0, state, None, oracle_hist[-1] if oracle_hist else None)

    t0 = time.perf_counter()
    seg_times: list[tuple[int, float]] = []  # (length, seconds) per segment
    done = start_steps
    seg_idx = 0
    for length in segment_lengths(num_steps - start_steps, log_every):
        key, seg_key = jax.random.split(key)
        ts = time.perf_counter()
        state, ys = seg_jit(ctx, state, seg_key, length)
        # force completion with a scalar host readback INSIDE the scan-timed
        # window (block_until_ready can return before pure-XLA programs
        # execute under the remote-TPU tunnel, CLAUDE.md); sub-ms cost,
        # and the records are transferred right after anyway
        float(jnp.sum(ys["energy"][-1]))
        seg_times.append((length, time.perf_counter() - ts))
        done += length
        seg_idx += 1
        if oracle_jit is not None:
            oracle_hist.append(jax.device_get(oracle_jit(ctx, state)))
        ys_host = jax.device_get(ys)
        if resumed_with_records:
            # fail with a named key if the resumed config's records can't
            # concatenate onto the checkpointed histories
            ckpt.validate_records(all_ys[0], ys_host)
            resumed_with_records = False
        all_ys.append(ys_host)
        if log_fn is not None and not quiet:
            log_fn(done, state, all_ys[-1],
                   oracle_hist[-1] if oracle_hist else None)
        if checkpoint_dir is not None and seg_idx % checkpoint_every == 0:
            partial = {k: np.concatenate([y[k] for y in all_ys], axis=0)
                       for k in all_ys[0]}
            partial["oracle"] = np.stack(oracle_hist, 0) if oracle_hist \
                else np.zeros((0,))
            ckpt.save(checkpoint_dir, state, key, done, partial)
    jax.block_until_ready(state)
    elapsed = time.perf_counter() - t0

    records = {}
    if all_ys:
        records = {k: np.concatenate([y[k] for y in all_ys], axis=0)
                   for k in all_ys[0]}
    records["oracle"] = (np.stack(oracle_hist, 0) if oracle_hist
                         else np.zeros((0,)))
    # pure sampler throughput vs end-to-end wall throughput: quoting the
    # former as "sampler speed" is honest; the latter includes oracle
    # evals, record transfers and checkpoint saves. The FIRST segment pays
    # the jit compile (minutes through the remote-compile tunnel) — drop it
    # from the scan-throughput window when warm segments exist.
    warm = seg_times[1:] if len(seg_times) > 1 else seg_times
    warm_steps = sum(l for l, _ in warm)
    warm_time = sum(t for _, t in warm)
    records["steps_per_sec"] = warm_steps / max(warm_time, 1e-9)
    records["wall_steps_per_sec"] = (done - start_steps) / max(elapsed, 1e-9)
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


def package_result(*, e0, fit0, x0_traj_head, best, final_x, rec,
                   traj_key: str = "traj",
                   traj_tokens: bool = False) -> SamplerResult:
    """Assemble the standard SamplerResult from scan records.

    traj_tokens: the per-step traj records are int token vectors [L]
    (samplers emit those to keep the per-segment host transfer thin — the
    remote-TPU tunnel moves ~5 MB/s, and a [steps, L, V] float trajectory
    costs ~190 MB per 10k-step GFP run vs ~2 MB as int8 tokens); the
    one-hot [n, L, V] contract is reconstructed here on the host.
    """
    best_e, best_fit, best_x = jax.device_get(best)
    traj = None
    if traj_key in rec:
        t = np.asarray(rec[traj_key])
        head = np.asarray(x0_traj_head)
        if traj_tokens:
            eye = np.eye(head.shape[-1], dtype=np.float32)
            t = eye[t.astype(np.int64)]
        elif np.issubdtype(t.dtype, np.integer):
            t = t.astype(np.float32)  # uint8 binary images -> float
        traj = np.concatenate([head[None], t], 0)
    return SamplerResult(
        best_x=np.asarray(best_x), best_energy=np.asarray(best_e),
        best_fitness=np.asarray(best_fit),
        energy_history=np.concatenate(
            [np.asarray(e0)[None], rec["energy"]], 0),
        fitness_history=np.concatenate(
            [np.asarray(fit0)[None], rec["fitness"]], 0),
        random_traj=traj,
        final_x=np.asarray(jax.device_get(final_x)),
        oracle_history=rec["oracle"],
        n_accepted=(rec["accepted"].sum(-1) if "accepted" in rec else None),
        steps_per_sec=rec["steps_per_sec"],
        wall_steps_per_sec=rec.get("wall_steps_per_sec", 0.0),
    )
