"""Step-anatomy profiler: where does the 1024-chain PPDE step spend time?

Times each piece with an honest scalar readback (block_until_ready lies
under the axon tunnel for pure-XLA programs). Every timed program is
wrapped in a lax.scan over `iters` so per-dispatch overhead amortizes.

Usage: tools/tpu_run.sh tools/profile_step.py [--chains 1024] [--iters 50]
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
    ap.add_argument("--chains", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ppde_tpu import codec, energy as energy_mod, utils
    from ppde_tpu.models import cnn, potts
    from ppde_tpu.ops import cnn_pallas
    from ppde_tpu.samplers.protein import ppde as ppde_mod

    N = args.chains
    wt = GFP_WT
    L, V = len(wt), 20
    pp = potts.synthetic(wt, seed=0, dtype=jnp.bfloat16)
    ens = cnn.init_ensemble(jax.random.PRNGKey(0), 3, input_size=L)
    wt_oh = jnp.asarray(codec.seqs_to_onehot([wt]))
    pop = jnp.repeat(wt_oh, N, axis=0)
    key = jax.random.PRNGKey(7)
    # random population (mutated) so nothing degenerate
    pop = utils.substitute(pop, jax.random.randint(key, (N,), 0, L * V) )

    print(f"=== step anatomy: GFP L={L}, {N} chains, bf16 ===", flush=True)

    # --- 1. potts energy+grad alone ---
    def potts_eg(s, k):
        e, g = potts.score_and_grad(pp, s)
        return s, e[0] + g[0, 0, 0]
    timeit("potts score_and_grad (pallas)", potts_eg, pop, key, args.iters)

    # --- 2. CNN ensemble VJP, XLA path, full batch ---
    en_xla = energy_mod.protein_poe(pp, ens, lam=15.0, wt_onehot=wt_oh,
                                    compute_dtype=jnp.bfloat16)

    def cnn_xla_full(s, k):
        fit, g = energy_mod._fit_and_grad(en_xla.params, s, jnp.bfloat16,
                                          False)
        return s, fit[0] + g[0, 0, 0]
    timeit("CNN VJP XLA full batch", cnn_xla_full, pop, key, args.iters)

    def cnn_xla_chunk(s, k):
        fit, g = energy_mod._fit_and_grad(en_xla.params, s, jnp.bfloat16,
                                          False, cnn_chunk=128)
        return s, fit[0] + g[0, 0, 0]
    if N > 128:
        timeit("CNN VJP XLA chunk=128", cnn_xla_chunk, pop, key, args.iters)

    # --- 3. fused CNN kernel: full batch vs chunked, tile sizes ---
    for bt in (8, 16, 32):
        def cnn_fused(s, k, bt=bt):
            fit, g = cnn_pallas.ensemble_apply_and_grad(
                ens, s, compute_dtype=jnp.bfloat16, batch_tile=bt)
            return s, fit[0] + g[0, 0, 0]
        timeit(f"CNN fused full batch bt={bt}", cnn_fused, pop, key,
               args.iters)

    def cnn_fused_chunk(s, k):
        fit, g = energy_mod._fit_and_grad(en_xla.params, s, jnp.bfloat16,
                                          True, cnn_chunk=128)
        return s, fit[0] + g[0, 0, 0]
    if N > 128:
        timeit("CNN fused chunk=128 (bt=8)", cnn_fused_chunk, pop, key,
               args.iters)

    # --- 4. kernel-only (no im2col/col2im) ---
    P = cnn_pallas.im2col(pop).astype(jnp.bfloat16)
    Tp = cnn_pallas._round_up(L - cnn_pallas.K + 1, 32)
    P = jnp.pad(P, ((0, 0), (0, Tp - (L - cnn_pallas.K + 1)), (0, 0)))
    enc = ens["encoder"]
    M = enc["w"].shape[0]
    KV = enc["w"].shape[1] * enc["w"].shape[2]
    C = enc["w"].shape[3]
    enc_w = enc["w"].reshape(M, KV, C).astype(jnp.bfloat16)
    emb_w = ens["embed"]["w"].astype(jnp.bfloat16)
    dec_w = ens["decoder"]["w"][..., None]

    def kernel_only(s, k):
        fit, dP = cnn_pallas.ensemble_fit_and_patch_grad(
            s, enc_w, enc["b"].astype(jnp.float32).reshape(M, 1, C),
            emb_w, ens["embed"]["b"].astype(jnp.float32).reshape(M, 1, -1),
            dec_w.astype(jnp.bfloat16).reshape(M, 1, -1),
            ens["decoder"]["b"].astype(jnp.float32).reshape(M, 1, 1),
            t_real=L - cnn_pallas.K + 1, batch_tile=8)
        return s, fit[0] + dP[0, 0, 0]
    timeit("CNN kernel only (pre-padded patches, bt=8)", kernel_only, P,
           key, args.iters)

    # --- 5. im2col / col2im alone ---
    def im2col_only(s, k):
        Pp = cnn_pallas.im2col(s).astype(jnp.bfloat16)
        return s, Pp[0, 0, 0].astype(jnp.float32)
    timeit("im2col alone", im2col_only, pop, key, args.iters)

    dP_f32 = jnp.zeros((N, Tp, KV), jnp.float32)

    def col2im_only(s, k):
        dx = cnn_pallas.col2im(s[:, :L - cnn_pallas.K + 1], L)
        return s, dx[0, 0, 0]
    timeit("col2im alone (f32 dP)", col2im_only, dP_f32, key, args.iters)

    # --- 6. full step: fused-chunked energy (the current 1024 default) ---
    en_fused = energy_mod.protein_poe(pp, ens, lam=15.0, wt_onehot=wt_oh,
                                      compute_dtype=jnp.bfloat16,
                                      fused_cnn=True, cnn_chunk=128)
    window_ok = utils.position_window_mask(L, V, 0, L - 1)
    cfg = ppde_mod.PPDEConfig(pas_length=2, nmut_threshold=10)
    for name, en in (("fused-chunked", en_fused), ("xla-chunked",
                     energy_mod.protein_poe(pp, ens, lam=15.0,
                                            wt_onehot=wt_oh,
                                            compute_dtype=jnp.bfloat16,
                                            cnn_chunk=128))):
        step = ppde_mod.make_step(en, cfg, window_ok, N, L, V)
        ctx = {"energy": en.params, "wt": pop[0], "init_x": pop}
        e0, fit0, g0 = jax.jit(en.energy_and_grad)(ctx["energy"], pop)
        ctx["wt_e"], ctx["wt_fit"], ctx["wt_grad"] = e0[0], fit0[0], g0[0]
        st = (pop, (e0, fit0, g0), (e0, fit0, pop))

        def full_step(s, k, step=step, ctx=ctx):
            s2, ys = step(ctx, s, k)
            return s2, ys["energy"][0]
        timeit(f"FULL STEP ({name})", full_step, st, key, args.iters)

        # step minus energy: replace energy_and_grad with carried values
        # (isolates proposal+reverse+MH cost)
        from ppde_tpu.energy import Energy
        en_free = Energy(params=en.params,
                         energy=en.energy,
                         energy_and_grad=lambda p, y, e0=e0, f0=fit0, g0=g0:
                             (e0 + jnp.sum(y[:, 0, 0]) * 0, fit0, g0),
                         fitness=en.fitness, wt_onehot=en.wt_onehot)
        step_free = ppde_mod.make_step(en_free, cfg, window_ok, N, L, V)

        def step_no_energy(s, k, step=step_free, ctx=ctx):
            s2, ys = step(ctx, s, k)
            return s2, ys["energy"][0]
        timeit(f"step minus energy ({name})", step_no_energy, st, key,
               args.iters)
        break  # the no-energy variant is energy-independent; once is enough


if __name__ == "__main__":
    main()
