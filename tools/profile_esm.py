"""ESM2 expert profiler: attribute the transformer step, measure flash.

Times (in-scan, honest scalar readbacks) at B=128, T=GFP on one chip:
  * PLL forward and forward+input-grad, XLA attention vs flash kernel
  * component stacks: attention-only / FFN-only / LM head (XLA)
  * the full PPDE PoE step (potts + CNN + transformer expert)

Usage: tools/tpu_run.sh tools/profile_esm.py [--name transformer-S]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GFP_WT = (
    "SKGEELFTGVVPILVELDGDVNGHKFSVSGEGEGDATYGKLTLKFICTTGKLPVPWPTLVTTLSYGVQCFSRY"
    "PDHMKQHDFFKSAMPEGYVQERTIFFKDDGNYKTRAEVKFEGDTLVNRIELKGIDFKEDGNILGHKLEYNYNS"
    "HNVYIMADKQKNGIKVNFKIRHNIEDGSVQLADHYQQNTPIGDGPVLLPDNHYLSTQSALSKDPNEKRDHMVL"
    "LEFVTAAGITHGMDELYK"
)


def timeit(name, fn, state, key, iters, reps=3):
    import jax

    keys = jax.random.split(key, iters)
    run = jax.jit(lambda s, ks: jax.lax.scan(fn, s, ks))
    try:
        out = run(state, keys)
        _ = float(jax.numpy.asarray(out[1]).reshape(-1)[-1])
    except Exception as e:
        print(f"{name:46s}   FAILED: {type(e).__name__}: {str(e)[:140]}",
              flush=True)
        return None
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        s, ys = run(state, keys)
        _ = float(jax.numpy.asarray(ys).reshape(-1)[-1])
        best = min(best, time.perf_counter() - t0)
    ms = best / iters * 1e3
    print(f"{name:46s} {ms:8.2f} ms/iter", flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--name", default="transformer-S")
    ap.add_argument("--chains", type=int, default=128)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--full-step", action="store_true")
    ap.add_argument("--skip-components", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ppde_tpu import codec
    from ppde_tpu.models import esm2

    B = args.chains
    wt = GFP_WT
    L = len(wt)
    params = esm2.init(jax.random.PRNGKey(0), args.name, dtype=jnp.bfloat16)
    heads = esm2.CONFIGS[args.name]["heads"]
    perm = jnp.asarray(esm2.potts_to_esm_perm(), jnp.bfloat16)
    x0 = jnp.repeat(jnp.asarray(codec.seqs_to_onehot([wt])), B, 0)
    key = jax.random.PRNGKey(7)
    x_esm = (x0.astype(jnp.bfloat16) @ perm)

    print(f"=== ESM2 {args.name} B={B} T={L} bf16 ===", flush=True)

    for impl in ("xla", "flash"):
        esm2.ATTENTION_IMPL = impl

        def fwd(s, k):
            pll = esm2.pseudo_log_likelihood(params, s, heads)
            return s, pll[0]
        timeit(f"PLL forward ({impl})", fwd, x_esm, key, args.iters)

        def fwdbwd(s, k):
            pll, vjp = jax.vjp(
                lambda v: esm2.pseudo_log_likelihood(params, v, heads), s)
            (g,) = vjp(jnp.ones_like(pll))
            return s, pll[0] + g[0, 0, 0].astype(jnp.float32)
        timeit(f"PLL forward+input-grad ({impl})", fwdbwd, x_esm, key,
               args.iters)
    esm2.ATTENTION_IMPL = None

    if not args.skip_components:
        # component stacks (XLA impl attribution)
        esm2.ATTENTION_IMPL = "xla"
        D = esm2.CONFIGS[args.name]["dim"]
        h0 = (x_esm @ params["embed"])

        def attn_stack(s, k):
            h = s
            for layer in params["layers"]:
                h = h + esm2._attention(layer,
                                        esm2._layer_norm(layer["attn_ln"], h),
                                        heads)
            return s, h[0, 0, 0].astype(jnp.float32)
        timeit("attention stack only (xla)", attn_stack, h0, key, args.iters)

        esm2.ATTENTION_IMPL = "flash"
        timeit("attention stack only (flash)", attn_stack, h0, key,
               args.iters)
        esm2.ATTENTION_IMPL = None

        def ffn_stack(s, k):
            h = s
            for layer in params["layers"]:
                y = esm2._layer_norm(layer["ffn_ln"], h)
                y = jax.nn.gelu(y @ layer["fc1"]["w"] + layer["fc1"]["b"],
                                approximate=True)
                h = h + (y @ layer["fc2"]["w"] + layer["fc2"]["b"])
            return s, h[0, 0, 0].astype(jnp.float32)
        timeit("FFN stack only", ffn_stack, h0, key, args.iters)

        def lm_head(s, k):
            y = esm2._layer_norm(params["final_ln"], s)
            y = jax.nn.gelu(y @ params["lm_dense"]["w"]
                            + params["lm_dense"]["b"], approximate=True)
            y = esm2._layer_norm(params["lm_ln"], y)
            logits = jnp.einsum("btd,vd->btv", y.astype(jnp.float32),
                                params["embed"].astype(jnp.float32))
            return s, logits[0, 0, 0]
        timeit("LM head only", lm_head, h0, key, args.iters)

    if args.full_step:
        from ppde_tpu import energy as energy_mod, utils
        from ppde_tpu.models import cnn, potts
        from ppde_tpu.samplers.protein import ppde as ppde_mod

        # -- energy_and_grad in isolation, chunked vs monolithic --
        pp0 = potts.synthetic(wt, seed=0, dtype=jnp.bfloat16)
        ens0 = cnn.init_ensemble(jax.random.PRNGKey(0), 3, input_size=L)
        wt_oh0 = jnp.asarray(codec.seqs_to_onehot([wt]))
        tr_params0 = dict(params, perm=perm,
                          wt_score=jnp.zeros((1,), jnp.float32))

        def tr_apply0(p, x):
            x_e = x.astype(p["perm"].dtype) @ p["perm"]
            return esm2.pseudo_log_likelihood(p, x_e, heads) - p["wt_score"]

        for impl in ("xla", "flash"):
            esm2.ATTENTION_IMPL = impl
            for chunk in (64, None):
                en0 = energy_mod.protein_poe(
                    pp0, ens0, lam=1.0, wt_onehot=wt_oh0,
                    transformer=(tr_params0, tr_apply0),
                    chunk_size=chunk, compute_dtype=jnp.bfloat16)

                def eg(s, k, en0=en0):
                    e, f, g = en0.energy_and_grad(en0.params, s)
                    return s, e[0] + g[0, 0, 0].astype(jnp.float32)
                timeit(f"energy_and_grad chunk={chunk} ({impl})", eg, x0,
                       key, args.iters)
        esm2.ATTENTION_IMPL = None

        pp = potts.synthetic(wt, seed=0, dtype=jnp.bfloat16)
        ens = cnn.init_ensemble(jax.random.PRNGKey(0), 3, input_size=L)
        wt_oh = jnp.asarray(codec.seqs_to_onehot([wt]))
        tr_params = dict(params, perm=perm,
                         wt_score=jnp.zeros((1,), jnp.float32))

        def tr_apply(p, x):
            x_e = x.astype(p["perm"].dtype) @ p["perm"]
            return esm2.pseudo_log_likelihood(p, x_e, heads) - p["wt_score"]

        for impl in ("xla", "flash"):
            esm2.ATTENTION_IMPL = impl
            en = energy_mod.protein_poe(
                pp, ens, lam=1.0, wt_onehot=wt_oh,
                transformer=(tr_params, tr_apply),
                compute_dtype=jnp.bfloat16)
            window_ok = utils.position_window_mask(L, 20, 0, L - 1)
            cfg = ppde_mod.PPDEConfig(pas_length=2, nmut_threshold=10)
            step = ppde_mod.make_step(en, cfg, window_ok, B, L, 20)
            ctx = {"energy": en.params, "wt": x0[0], "init_x": x0}
            e0, f0, g0 = jax.jit(en.energy_and_grad)(ctx["energy"], x0)
            ctx["wt_e"], ctx["wt_fit"], ctx["wt_grad"] = e0[0], f0[0], g0[0]
            st = (x0, (e0, f0, g0), (e0, f0, x0))

            def full(s, k, step=step, ctx=ctx):
                s2, ys = step(ctx, s, k)
                return s2, ys["energy"][0]
            timeit(f"FULL PoE PPDE step ({impl})", full, st, key,
                   args.iters)
        esm2.ATTENTION_IMPL = None


if __name__ == "__main__":
    main()
