"""Shared honest-benchmarking machinery for the tools/ profilers.

One copy of the load-bearing probe hygiene (previously duplicated across
profile_esm.py / probe_esm_dce.py / bench_cnn_variants.py /
profile_step.py — divergence risk on exactly the code whose correctness
round 3 had to fix twice):

  * ``dep`` — dependency-threads a probe's output into the scan carry so
    XLA LICM cannot hoist the measured computation out of the loop;
  * ``timeit`` — scanned min-of-reps timing with a scalar host readback
    inside the timed window (block_until_ready lies under axon for
    pure-XLA programs).

PARAMS-IN-CLOSURE CAVEAT: probes that close over multi-MB params bake
them into the HLO as constants, which are re-streamed per execution
(~0.28 ms per 1.4 MB per call — CLAUDE.md). Pass big pytrees via
``ctx=`` so they enter the jitted program as ARGUMENTS (fn then takes
``(ctx, s, k)``); closure mode remains for cheap probes. The round-3
ESM2 chunk table was cross-checked against ctx-passing step-level sweeps
(same optimum), so its closure-mode numbers carry ~1-2 ms/iter of
constant-streaming bias but the conclusions hold.
"""
from __future__ import annotations

import time

GFP_WT = (
    "SKGEELFTGVVPILVELDGDVNGHKFSVSGEGEGDATYGKLTLKFICTTGKLPVPWPTLVTTLSYGVQCFSRY"
    "PDHMKQHDFFKSAMPEGYVQERTIFFKDDGNYKTRAEVKFEGDTLVNRIELKGIDFKEDGNILGHKLEYNYNS"
    "HNVYIMADKQKNGIKVNFKIRHNIEDGSVQLADHYQQNTPIGDGPVLLPDNHYLSTQSALSKDPNEKRDHMVL"
    "LEFVTAAGITHGMDELYK"
)


def dep(s, val):
    """Re-inject ``val`` into the carry WITHOUT changing its value, via a
    runtime-false predicate XLA cannot fold. CRITICAL: a scan body whose
    carry does not depend on the measured computation gets hoisted out of
    the loop by XLA LICM (pure-XLA bodies only — pallas calls and inner
    while-loops block it), and the probe then times ONE evaluation
    amortized over the scan length. Discovered round 3: monolithic ESM2
    probes read 15 ms/iter while the real dependency-chained sampler step
    paid 92 ms. Probes must also consume ALL outputs (sum over chunks /
    members), or DCE deletes the unconsumed subgraphs — the second
    round-3 measurement trap (tools/probe_esm_dce.py)."""
    import jax.numpy as jnp

    pred = ~jnp.isfinite(val)  # runtime false for finite results
    return jnp.where(pred, s + 1.0, s)


def timeit(name, fn, state, key, iters, reps=3, ctx=None, width=50):
    """Time ``fn`` inside a jitted lax.scan: min over ``reps`` of the
    per-iter wall time, with a scalar readback of the last output inside
    the timed window. ``fn`` is ``(s, k) -> (s, out)``, or
    ``(ctx, s, k) -> (s, out)`` when ``ctx`` is given (ctx enters the jit
    as an argument — use for multi-MB params, see module docstring).
    Returns ms/iter, or None if compilation/execution fails."""
    import jax

    keys = jax.random.split(key, iters)
    if ctx is None:
        run = jax.jit(lambda s, ks: jax.lax.scan(fn, s, ks))
        call = lambda: run(state, keys)
    else:
        run = jax.jit(
            lambda c, s, ks: jax.lax.scan(lambda s, k: fn(c, s, k), s, ks))
        call = lambda: run(ctx, state, keys)
    try:
        out = call()
        _ = float(jax.numpy.asarray(out[1]).reshape(-1)[-1])
    except Exception as e:
        print(f"{name:{width}s}   FAILED: {type(e).__name__}: {str(e)[:140]}",
              flush=True)
        return None
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _, ys = call()
        _ = float(jax.numpy.asarray(ys).reshape(-1)[-1])
        best = min(best, time.perf_counter() - t0)
    ms = best / iters * 1e3
    print(f"{name:{width}s} {ms:8.3f} ms/iter", flush=True)
    return ms
