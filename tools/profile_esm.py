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

from tools._bench_common import GFP_WT, dep, timeit  # noqa: E402
import functools  # noqa: E402
timeit = functools.partial(timeit, width=46)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--name", default="transformer-S")
    ap.add_argument("--chains", type=int, default=128)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--full-step", action="store_true")
    ap.add_argument("--skip-components", action="store_true")
    ap.add_argument("--attn-ablation", action="store_true",
                    help="attribute the attention stack: no-rotary, "
                         "merged-QKV, no-LN, proj-only variants")
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
            return dep(s, pll[0]), pll[0]
        timeit(f"PLL forward ({impl})", fwd, x_esm, key, args.iters)

        def fwdbwd(s, k):
            pll, vjp = jax.vjp(
                lambda v: esm2.pseudo_log_likelihood(params, v, heads), s)
            (g,) = vjp(jnp.ones_like(pll))
            out = pll[0] + g[0, 0, 0].astype(jnp.float32)
            return dep(s, out), out
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
            out = h[0, 0, 0].astype(jnp.float32)
            return dep(s, out), out
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
            out = h[0, 0, 0].astype(jnp.float32)
            return dep(s, out), out
        timeit("FFN stack only", ffn_stack, h0, key, args.iters)

        def lm_head(s, k):
            y = esm2._layer_norm(params["final_ln"], s)
            y = jax.nn.gelu(y @ params["lm_dense"]["w"]
                            + params["lm_dense"]["b"], approximate=True)
            y = esm2._layer_norm(params["lm_ln"], y)
            logits = jnp.einsum("btd,vd->btv", y.astype(jnp.float32),
                                params["embed"].astype(jnp.float32))
            return dep(s, logits[0, 0, 0]), logits[0, 0, 0]
        timeit("LM head only", lm_head, h0, key, args.iters)

    if args.attn_ablation:
        import math as _math

        esm2.ATTENTION_IMPL = "flash"
        D = esm2.CONFIGS[args.name]["dim"]
        hd = D // heads
        h0 = (x_esm @ params["embed"])
        from ppde_tpu.ops import attention_pallas as ap_mod

        def attn_variant(rotary=True, merged=False, ln=True, core=True):
            def stack(s, k):
                h = s
                for p in params["layers"]:
                    x = esm2._layer_norm(p["attn_ln"], h) if ln else h
                    B_, T_, D_ = x.shape
                    if merged:
                        wqkv = jnp.concatenate(
                            [p["q"]["w"], p["k"]["w"], p["v"]["w"]], axis=1)
                        bqkv = jnp.concatenate(
                            [p["q"]["b"], p["k"]["b"], p["v"]["b"]])
                        qkv = (x @ wqkv + bqkv).reshape(
                            B_, T_, 3, heads, hd).transpose(2, 0, 3, 1, 4)
                        q = qkv[0] * (1.0 / _math.sqrt(hd))
                        kk, v = qkv[1], qkv[2]
                    else:
                        def proj(pp, vv):
                            return (vv @ pp["w"] + pp["b"]).reshape(
                                B_, T_, heads, hd).transpose(0, 2, 1, 3)
                        q = proj(p["q"], x) * (1.0 / _math.sqrt(hd))
                        kk = proj(p["k"], x)
                        v = proj(p["v"], x)
                    if rotary:
                        q, kk = esm2._rotary(q, kk)
                    q = q.reshape(B_ * heads, T_, hd)
                    kk = kk.reshape(B_ * heads, T_, hd)
                    v = v.reshape(B_ * heads, T_, hd)
                    out = ap_mod.flash_attention(q, kk, v) if core else v
                    out = out.reshape(B_, heads, T_, hd).transpose(
                        0, 2, 1, 3).reshape(B_, T_, D_)
                    h = h + (out @ p["o"]["w"] + p["o"]["b"])
                o = h[0, 0, 0].astype(jnp.float32)
                return dep(s, o), o
            return stack

        timeit("attn ablation: full (flash)", attn_variant(), h0, key,
               args.iters)
        timeit("attn ablation: no rotary", attn_variant(rotary=False), h0,
               key, args.iters)
        timeit("attn ablation: merged QKV", attn_variant(merged=True), h0,
               key, args.iters)
        timeit("attn ablation: no LN", attn_variant(ln=False), h0, key,
               args.iters)
        timeit("attn ablation: no attention core", attn_variant(core=False),
               h0, key, args.iters)
        timeit("attn ablation: merged+no-rotary",
               attn_variant(rotary=False, merged=True), h0, key, args.iters)
        esm2.ATTENTION_IMPL = None

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

        # CONSUME ALL OUTPUTS: chunked evaluations are independent unrolled
        # subgraphs, and a probe that reads only e[0]/g[0,0,0] gets every
        # chunk but the first dead-code-eliminated (this very probe lied
        # 31 vs 63 ms before the fix — tools/probe_esm_dce.py, PERF.md)
        r_dir = jax.random.normal(jax.random.PRNGKey(3), x0.shape,
                                  jnp.float32)
        for impl in ("xla", "flash"):
            esm2.ATTENTION_IMPL = impl
            for chunk in ((8, 16, 32) if impl == "xla" else (16, 32)):
                en0 = energy_mod.protein_poe(
                    pp0, ens0, lam=1.0, wt_onehot=wt_oh0,
                    transformer=(tr_params0, tr_apply0),
                    chunk_size=chunk, compute_dtype=jnp.bfloat16)

                def eg(s, k, en0=en0):
                    e, f, g = en0.energy_and_grad(en0.params, s)
                    out = jnp.sum(e) + jnp.sum(g.astype(jnp.float32) * r_dir)
                    return dep(s, out), out
                timeit(f"energy_and_grad chunk={chunk} ({impl})", eg, x0,
                       key, args.iters)
        esm2.ATTENTION_IMPL = None

        # -- the same monolithic energy, but params as jit ARGUMENTS (the
        # sampler's ctx pattern) instead of closure constants --
        import time as _time
        esm2.ATTENTION_IMPL = "flash"
        en_a = energy_mod.protein_poe(
            pp0, ens0, lam=1.0, wt_onehot=wt_oh0,
            transformer=(tr_params0, tr_apply0),
            compute_dtype=jnp.bfloat16)

        def scan_args(ctx, s, ks):
            def body(s, k):
                e, f, g = en_a.energy_and_grad(ctx, s)
                out = e[0] + g[0, 0, 0].astype(jnp.float32)
                return dep(s, out), out
            return jax.lax.scan(body, s, ks)

        run_a = jax.jit(scan_args)
        ks = jax.random.split(key, args.iters)
        out = run_a(en_a.params, x0, ks)
        _ = float(jnp.asarray(out[1]).reshape(-1)[-1])
        best = float("inf")
        for _ in range(3):
            t0 = _time.perf_counter()
            s, ys = run_a(en_a.params, x0, ks)
            _ = float(jnp.asarray(ys).reshape(-1)[-1])
            best = min(best, _time.perf_counter() - t0)
        print(f"{'energy_and_grad ARGS-ctx (flash)':46s} "
              f"{best / args.iters * 1e3:8.2f} ms/iter", flush=True)
        esm2.ATTENTION_IMPL = None

        # -- step minus energy (carried values; PAS machinery only) --
        esm2.ATTENTION_IMPL = "flash"
        window_ok0 = utils.position_window_mask(L, 20, 0, L - 1)
        cfg0 = ppde_mod.PPDEConfig(pas_length=2, nmut_threshold=10)
        e00, f00, g00 = jax.jit(en_a.energy_and_grad)(en_a.params, x0)
        en_free = energy_mod.Energy(
            params=en_a.params, energy=en_a.energy,
            energy_and_grad=lambda p, y: (
                e00 + jnp.sum(y[:, 0, 0]) * 0, f00, g00),
            fitness=en_a.fitness, wt_onehot=en_a.wt_onehot)
        stepf = ppde_mod.make_step(en_free, cfg0, window_ok0, B, L, 20)
        ctx0 = {"energy": en_a.params, "wt": x0[0], "init_x": x0,
                "wt_e": e00[0], "wt_fit": f00[0], "wt_grad": g00[0]}
        st0 = (x0, (e00, f00, g00), (e00, f00, x0))

        def free_step(s, k):
            s2, ys = stepf(ctx0, s, k)
            return s2, ys["energy"][0]
        timeit("step minus energy (PAS only)", free_step, st0, key,
               args.iters)
        esm2.ATTENTION_IMPL = None

        pp = potts.synthetic(wt, seed=0, dtype=jnp.bfloat16)
        ens = cnn.init_ensemble(jax.random.PRNGKey(0), 3, input_size=L)
        wt_oh = jnp.asarray(codec.seqs_to_onehot([wt]))
        tr_params = dict(params, perm=perm,
                         wt_score=jnp.zeros((1,), jnp.float32))

        def tr_apply(p, x):
            x_e = x.astype(p["perm"].dtype) @ p["perm"]
            return esm2.pseudo_log_likelihood(p, x_e, heads) - p["wt_score"]

        import functools as _ft
        _orig_sg = energy_mod.potts_mod.score_and_grad
        variants = [("xla", 16, "potts-pallas"), ("xla", 8, "potts-pallas"),
                    ("xla", 16, "potts-xla"), ("xla", 16, "no-potts")]
        for impl, ck, pv in variants:
            esm2.ATTENTION_IMPL = impl
            if pv == "potts-xla":
                energy_mod.potts_mod.score_and_grad = _ft.partial(
                    _orig_sg, use_pallas=False)
            else:
                energy_mod.potts_mod.score_and_grad = _orig_sg
            en = energy_mod.protein_poe(
                pp if pv != "no-potts" else None, ens, lam=1.0,
                wt_onehot=wt_oh,
                transformer=(tr_params, tr_apply), chunk_size=ck,
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
            timeit(f"FULL PoE PPDE step ({impl} chunk={ck} {pv})", full, st, key,
                   args.iters)
        energy_mod.potts_mod.score_and_grad = _orig_sg
        esm2.ATTENTION_IMPL = None


if __name__ == "__main__":
    main()
