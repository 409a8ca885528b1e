"""Settle the round-3 ESM2 "residual" open item: were the energy probes
DCE-confounded?

Hypothesis: profile_esm.py's energy_and_grad probes consume only
``e[0] + g[0,0,0]`` — chunk 0's outputs. The unrolled chunks are
INDEPENDENT ops, so XLA dead-code-eliminates chunks 1..7 and the probe
times one chunk, not the 128-chain energy. The full-step probe is honest
(its scan carry is the whole state), so the "unattributed ~30 ms between
step and energy" would simply be the eliminated chunks.

This probe re-times energy_and_grad consuming ALL outputs
(``sum(e) + <g, r>`` for a fixed random r), next to the old
chunk0-only consumption, across chunk sizes. If all-consumed chunk-16
lands near the step's ~61 ms, the mystery is closed (and the PERF.md
chunking table needs re-deriving with honest consumption).

Usage: tools/tpu_run.sh tools/probe_esm_dce.py [--name transformer-S]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools._bench_common import GFP_WT, dep, timeit  # noqa: E402
import functools  # noqa: E402
timeit = functools.partial(timeit, width=52)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--name", default="transformer-S")
    ap.add_argument("--chains", type=int, default=128)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--chunks", default="8,16,32,64,0",
                    help="comma list; 0 = monolithic")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ppde_tpu import codec
    from ppde_tpu import energy as energy_mod
    from ppde_tpu.models import cnn, esm2, potts

    B = args.chains
    wt = GFP_WT
    L = len(wt)
    params = esm2.init(jax.random.PRNGKey(0), args.name, dtype=jnp.bfloat16)
    heads = esm2.CONFIGS[args.name]["heads"]
    perm = jnp.asarray(esm2.potts_to_esm_perm(), jnp.bfloat16)
    x0 = jnp.repeat(jnp.asarray(codec.seqs_to_onehot([wt])), B, 0)
    key = jax.random.PRNGKey(7)

    pp0 = potts.synthetic(wt, seed=0, dtype=jnp.bfloat16)
    ens0 = cnn.init_ensemble(jax.random.PRNGKey(0), 3, input_size=L)
    wt_oh0 = jnp.asarray(codec.seqs_to_onehot([wt]))
    tr_params0 = dict(params, perm=perm,
                      wt_score=jnp.zeros((1,), jnp.float32))

    def tr_apply0(p, x):
        x_e = x.astype(p["perm"].dtype) @ p["perm"]
        return esm2.pseudo_log_likelihood(p, x_e, heads) - p["wt_score"]

    # fixed random direction so <g, r> consumes EVERY gradient element
    r = jax.random.normal(jax.random.PRNGKey(3), x0.shape, jnp.float32)

    print(f"=== DCE probe: ESM2 {args.name} B={B} T={L} bf16 ===", flush=True)
    for chunk in [int(c) for c in args.chunks.split(",")]:
        en0 = energy_mod.protein_poe(
            pp0, ens0, lam=1.0, wt_onehot=wt_oh0,
            transformer=(tr_params0, tr_apply0),
            chunk_size=chunk or None, compute_dtype=jnp.bfloat16)
        label = f"chunk={chunk}" if chunk else "monolithic"

        def eg_all(s, k, en0=en0):
            e, f, g = en0.energy_and_grad(en0.params, s)
            out = jnp.sum(e) + jnp.sum(g.astype(jnp.float32) * r)
            return dep(s, out), out
        timeit(f"energy_and_grad ALL-consumed ({label})", eg_all, x0, key,
               args.iters)

        def eg_c0(s, k, en0=en0):
            e, f, g = en0.energy_and_grad(en0.params, s)
            out = e[0] + g[0, 0, 0].astype(jnp.float32)
            return dep(s, out), out
        timeit(f"energy_and_grad chunk0-only   ({label})", eg_c0, x0, key,
               args.iters)


if __name__ == "__main__":
    main()
