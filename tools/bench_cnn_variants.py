"""CNN-energy variant bench: close (or prove) the 1024-chain MXU gap.

Measures, in-scan with honest scalar readbacks (CLAUDE.md), at GFP shapes:
  * XLA VJP path, split vs first-argmax pool backward
  * fused Pallas kernel, split vs first-argmax pool backward
  * a forward-only kernel (attribution: fwd vs bwd share)
  * a matmul-only ceiling kernel (same 6 matmuls per member, relu only —
    the in-kernel MXU floor with all pool/mask VPU machinery removed)

Usage: tools/tpu_run.sh tools/bench_cnn_variants.py [--chains 1024]
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools._bench_common import GFP_WT, dep, timeit  # noqa: E402
import functools  # noqa: E402
timeit = functools.partial(timeit, width=48)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--full-step", action="store_true",
                    help="also run full PPDE-step timings for the winners")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ppde_tpu import codec, energy as energy_mod, utils
    from ppde_tpu.models import cnn, potts
    from ppde_tpu.ops import cnn_pallas

    N = args.chains
    wt = GFP_WT
    L, V = len(wt), 20
    ens = cnn.init_ensemble(jax.random.PRNGKey(0), 3, input_size=L)
    wt_oh = jnp.asarray(codec.seqs_to_onehot([wt]))
    pop = jnp.repeat(wt_oh, N, axis=0)
    key = jax.random.PRNGKey(7)
    pop = utils.substitute(pop, jax.random.randint(key, (N,), 0, L * V))

    print(f"=== CNN energy variants: GFP L={L}, {N} chains, bf16 ===",
          flush=True)

    p = {"sup": ens}
    for pb in ("split", "first"):
        def xla_path(s, k, pb=pb):
            fit, g = energy_mod._fit_and_grad(p, s, jnp.bfloat16, False,
                                              cnn_chunk=128, pool_bwd=pb)
            return s, fit[0] + g[0, 0, 0]
        timeit(f"XLA VJP chunk=128 pool_bwd={pb}", xla_path, pop, key,
               args.iters)

    for pb in ("split", "first"):
        for bt in (8, 16):
            def fused(s, k, pb=pb, bt=bt):
                def one(xc):
                    return cnn_pallas.ensemble_apply_and_grad(
                        ens, xc, compute_dtype=jnp.bfloat16, batch_tile=bt,
                        pool_bwd=pb)
                xs = s.reshape(N // 128, 128, L, V)
                fits, gs = jax.lax.map(one, xs)
                return s, fits[0, 0] + gs[0, 0, 0, 0]
            timeit(f"fused chunk=128 bt={bt} pool_bwd={pb}", fused, pop, key,
                   args.iters)

    # ---- attribution kernels (standalone; same block structure) ----
    K = cnn_pallas.K
    T = L - K + 1
    Tp = cnn_pallas._round_up(T, 16)
    enc = ens["encoder"]
    M = enc["w"].shape[0]
    KV = enc["w"].shape[1] * enc["w"].shape[2]
    C = enc["w"].shape[3]
    C2 = ens["embed"]["w"].shape[-1]
    dt = jnp.bfloat16
    enc_w = enc["w"].reshape(M, KV, C).astype(dt)
    enc_wT = jnp.swapaxes(enc_w, 1, 2)
    emb_w = ens["embed"]["w"].astype(dt)
    emb_wT = jnp.swapaxes(emb_w, 1, 2)
    enc_b = enc["b"].astype(jnp.float32).reshape(M, 1, C)
    emb_b = ens["embed"]["b"].astype(jnp.float32).reshape(M, 1, C2)
    dec_w = ens["decoder"]["w"].astype(dt).reshape(M, 1, C2)

    P = cnn_pallas.im2col(pop).astype(dt)
    P = jnp.pad(P, ((0, 0), (0, Tp - T), (0, 0)))

    def fwd_kernel(P_ref, encw_ref, encb_ref, embw_ref, embb_ref, decw_ref,
                   fit_ref, *, t_real):
        bt = P_ref.shape[0]
        f32 = jnp.float32
        cdt = P_ref.dtype
        P2 = P_ref[...].reshape(bt * Tp, KV)
        tmask = jax.lax.broadcasted_iota(jnp.int32, (bt, Tp, C2), 1) < t_real
        acc = jnp.zeros((bt, 1), f32)
        for m in range(M):
            H1 = jnp.maximum(jnp.dot(P2, encw_ref[m],
                                     preferred_element_type=f32)
                             + encb_ref[m], 0.0).astype(cdt)
            H2 = jnp.maximum(jnp.dot(H1, embw_ref[m],
                                     preferred_element_type=f32)
                             + embb_ref[m], 0.0).astype(cdt)
            Hm = jnp.where(tmask, H2.reshape(bt, Tp, C2),
                           jnp.asarray(-1e30, cdt))
            mxf = jnp.max(Hm, axis=1).astype(f32)
            acc += jnp.sum(mxf * decw_ref[m].astype(f32), axis=-1,
                           keepdims=True) / M
        fit_ref[...] = acc

    def mm_kernel(P_ref, encw_ref, encb_ref, embw_ref, embwT_ref, encwT_ref,
                  fit_ref, dP_ref, *, t_real):
        """Same 4 matmuls/member as the real kernel, minimal VPU: relu only,
        pool replaced by a plain row read, backward seeded by H2 itself."""
        bt, Tp_, KV_ = P_ref.shape
        C2_ = embw_ref.shape[-1]
        f32 = jnp.float32
        cdt = P_ref.dtype
        P2 = P_ref[...].reshape(bt * Tp_, KV_)
        acc_fit = jnp.zeros((bt, 1), f32)
        acc_dP = jnp.zeros((bt * Tp_, KV_), f32)
        for m in range(M):
            H1 = jnp.maximum(jnp.dot(P2, encw_ref[m],
                                     preferred_element_type=f32)
                             + encb_ref[m], 0.0).astype(cdt)
            H2 = jnp.maximum(jnp.dot(H1, embw_ref[m],
                                     preferred_element_type=f32), 0.0
                             ).astype(cdt)
            acc_fit += jnp.sum(H2.reshape(bt, Tp_, C2_)[:, 0], axis=-1,
                               keepdims=True) / M
            G1 = jnp.dot(H2, embwT_ref[m], preferred_element_type=f32
                         ).astype(cdt)
            acc_dP += jnp.dot(G1, encwT_ref[m],
                              preferred_element_type=f32) / M
        fit_ref[...] = acc_fit
        dP_ref[...] = acc_dP.reshape(bt, Tp_, KV_)

    def run_fwd(Pc, bt):
        return pl.pallas_call(
            functools.partial(fwd_kernel, t_real=T),
            grid=(Pc.shape[0] // bt,),
            in_specs=[
                pl.BlockSpec((bt, Tp, KV), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((M, KV, C), lambda b: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((M, 1, C), lambda b: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((M, C, C2), lambda b: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((M, 1, C2), lambda b: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((M, 1, C2), lambda b: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bt, 1), lambda b: (b, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Pc.shape[0], 1), jnp.float32),
        )(Pc, enc_w, enc_b, emb_w, emb_b, dec_w)

    def run_mm(Pc, bt):
        return pl.pallas_call(
            functools.partial(mm_kernel, t_real=T),
            grid=(Pc.shape[0] // bt,),
            in_specs=[
                pl.BlockSpec((bt, Tp, KV), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((M, KV, C), lambda b: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((M, 1, C), lambda b: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((M, C, C2), lambda b: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((M, C2, C), lambda b: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((M, C, KV), lambda b: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((bt, 1), lambda b: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bt, Tp, KV), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((Pc.shape[0], 1), jnp.float32),
                jax.ShapeDtypeStruct((Pc.shape[0], Tp, KV), jnp.float32),
            ],
        )(Pc, enc_w, enc_b, emb_w, emb_wT, enc_wT)

    for bt in (8, 16):
        def fwd_only(s, k, bt=bt):
            xs = s.reshape(N // 128, 128, Tp, KV)
            fits = jax.lax.map(lambda xc: run_fwd(xc, bt), xs)
            return s, fits[0, 0, 0]
        timeit(f"fwd-only kernel chunk=128 bt={bt}", fwd_only, P, key,
               args.iters)

    for bt in (8, 16):
        def mm_only(s, k, bt=bt):
            xs = s.reshape(N // 128, 128, Tp, KV)
            fits, dPs = jax.lax.map(lambda xc: run_mm(xc, bt), xs)
            return s, fits[0, 0, 0] + dPs[0, 0, 0, 0]
        timeit(f"matmul-ceiling kernel chunk=128 bt={bt}", mm_only, P, key,
               args.iters)

    # ---- lane-padded matmul ceiling: KV->128, C->256, C2->512 (zero pad,
    # exact) — does edge-tile overhead explain the 55%-of-peak matmuls? ----
    def rup(n, k):
        return (n + k - 1) // k * k
    KVp, Cp, C2p = rup(KV, 128), rup(C, 128), rup(C2, 128)
    enc_w_p = jnp.pad(enc_w, ((0, 0), (0, KVp - KV), (0, Cp - C)))
    enc_b_p = jnp.pad(enc_b, ((0, 0), (0, 0), (0, Cp - C)))
    emb_w_p = jnp.pad(emb_w, ((0, 0), (0, Cp - C), (0, C2p - C2)))
    P_pad = jnp.pad(P, ((0, 0), (0, 0), (0, KVp - KV)))

    def run_mm_padded(Pc, bt):
        KV_, C_, C2_ = KVp, Cp, C2p
        return pl.pallas_call(
            functools.partial(mm_kernel, t_real=T),
            grid=(Pc.shape[0] // bt,),
            in_specs=[
                pl.BlockSpec((bt, Tp, KV_), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((M, KV_, C_), lambda b: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((M, 1, C_), lambda b: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((M, C_, C2_), lambda b: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((M, C2_, C_), lambda b: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((M, C_, KV_), lambda b: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((bt, 1), lambda b: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bt, Tp, KV_), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((Pc.shape[0], 1), jnp.float32),
                jax.ShapeDtypeStruct((Pc.shape[0], Tp, KV_), jnp.float32),
            ],
        )(Pc, enc_w_p, enc_b_p, emb_w_p,
          jnp.swapaxes(emb_w_p, 1, 2), jnp.swapaxes(enc_w_p, 1, 2))

    for bt in (8,):
        def mm_pad(s, k, bt=bt):
            xs = s.reshape(N // 128, 128, Tp, KVp)
            fits, dPs = jax.lax.map(lambda xc: run_mm_padded(xc, bt), xs)
            return s, fits[0, 0, 0] + dPs[0, 0, 0, 0]
        timeit(f"matmul-ceiling LANE-PADDED chunk=128 bt={bt}", mm_pad,
               P_pad, key, args.iters)

    if args.full_step:
        from ppde_tpu.samplers.protein import ppde as ppde_mod
        pp = potts.synthetic(wt, seed=0, dtype=jnp.bfloat16)
        window_ok = utils.position_window_mask(L, V, 0, L - 1)
        cfg = ppde_mod.PPDEConfig(pas_length=2, nmut_threshold=10)
        for name, kw in (
            ("fused/split", dict(fused_cnn=True, pool_bwd="split")),
            ("fused/first", dict(fused_cnn=True, pool_bwd="first")),
            ("vjp/first", dict(fused_cnn=False, pool_bwd="first")),
        ):
            en = energy_mod.protein_poe(pp, ens, lam=15.0, wt_onehot=wt_oh,
                                        compute_dtype=jnp.bfloat16,
                                        cnn_chunk=128, **kw)
            step = ppde_mod.make_step(en, cfg, window_ok, N, L, V)
            ctx = {"energy": en.params, "wt": pop[0], "init_x": pop}
            e0, fit0, g0 = jax.jit(en.energy_and_grad)(ctx["energy"], pop)
            ctx["wt_e"], ctx["wt_fit"], ctx["wt_grad"] = e0[0], fit0[0], g0[0]
            st = (pop, (e0, fit0, g0), (e0, fit0, pop))

            def full_step(s, k, step=step, ctx=ctx):
                s2, ys = step(ctx, s, k)
                return s2, ys["energy"][0]
            timeit(f"FULL STEP ({name})", full_step, st, key, args.iters)


if __name__ == "__main__":
    main()
