"""Transformer-expert roofline: analytic FLOPs + MFU + ceiling chain-steps/s.

Closes the ESM2 path the way PERF.md's CNN section is closed (VERDICT r3
"What's weak #2"): state the FLOP count of the PoE energy+grad, the MFU the
measured time implies, and the chain-steps/s ceiling for THIS algorithm on
one chip.

FLOP accounting (per sequence, T tokens, one-hot input; 2 FLOPs/MAC):
  * per layer: QKV+output projections 8·T·D², FFN up+down 4·T·D·F,
    attention score+value matmuls 4·T²·D
  * embed (one-hot @ [V,D]) + LM head (D→V): 4·T·D·V, V=33
  * PLL forward: the above once.
  * energy+grad (dE/dx with FROZEN expert params — sampling time): the VJP
    re-traverses every matmul exactly once with transposed weights and
    accumulates NO parameter gradients, and ESM2-S runs without remat, so
    backward = 1.0x forward matmul FLOPs. Total = 2x forward. (A training
    step with parameter grads would be 3x; that is finetune_esm's regime,
    not the sampler's.)

Ceiling: every matmul at --mxu_frac of bf16 peak (default 0.55 — the
fused-CNN kernel's measured efficiency on this chip at comparable shapes,
PERF.md "CNN roofline") and zero non-matmul wall time. The measured gap to
that ceiling is attributed in PERF.md (latency-bound hd=24 attention cores).

Usage (pure host arithmetic — measured ms via flags):
  python tools/esm_roofline.py --name transformer-S --chains 128 \
      --measured_ms 63.3 --step_ms 62.9
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_BF16_TFLOPS = 197.0  # TPU v5e (v5 lite) bf16 matmul peak per chip


def esm_flops_per_seq(name: str, T: int) -> dict:
    from ppde_tpu.models import esm2

    cfg = esm2.CONFIGS[name]
    N, D, F, V = cfg["layers"], cfg["dim"], cfg["ffn"], 33
    proj = 8 * T * D * D          # Q,K,V,O projections
    ffn = 4 * T * D * F           # up + down
    core = 4 * T * T * D          # scores + values
    embed_head = 4 * T * D * V
    fwd = N * (proj + ffn + core) + embed_head
    return {"layers": N, "dim": D, "ffn": F, "T": T,
            "fwd_flops": fwd,
            "proj_frac": N * proj / fwd, "ffn_frac": N * ffn / fwd,
            "core_frac": N * core / fwd}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--name", default="transformer-S")
    ap.add_argument("--seq_len", type=int, default=239,
                    help="tokens incl. bos/eos (GFP: 237+2)")
    ap.add_argument("--chains", type=int, default=128)
    ap.add_argument("--measured_ms", type=float, required=True,
                    help="measured energy+grad ms for the full population "
                         "(dependency-threaded probe, tools/profile_esm.py)")
    ap.add_argument("--step_ms", type=float, default=None,
                    help="measured full PPDE step ms (one energy+grad per "
                         "step: the carried-gradient optimization)")
    ap.add_argument("--mxu_frac", type=float, default=0.55,
                    help="demonstrated dense-matmul efficiency cap used "
                         "for the ceiling (CNN kernel's measured 55%%)")
    args = ap.parse_args()

    f = esm_flops_per_seq(args.name, args.seq_len)
    fwd_pop = f["fwd_flops"] * args.chains
    eg = 2 * fwd_pop  # input-grad-only VJP: backward == forward matmuls
    t = args.measured_ms / 1e3
    out = {
        "model": args.name, "chains": args.chains, "T": args.seq_len,
        "fwd_tflop_population": round(fwd_pop / 1e12, 3),
        "energy_grad_tflop": round(eg / 1e12, 3),
        "measured_ms": args.measured_ms,
        "effective_tflops": round(eg / t / 1e12, 1),
        "mfu_pct": round(100 * eg / t / 1e12 / PEAK_BF16_TFLOPS, 1),
        "flop_fractions": {k: round(f[k], 3) for k in
                           ("proj_frac", "ffn_frac", "core_frac")},
    }
    # ceiling: one energy+grad per PPDE step (gradient carries across steps)
    ceil_t = eg / (args.mxu_frac * PEAK_BF16_TFLOPS * 1e12)
    out["ceiling_ms"] = round(ceil_t * 1e3, 1)
    out["ceiling_steps_per_sec"] = round(1 / ceil_t, 1)
    out["ceiling_chain_steps_per_sec"] = round(args.chains / ceil_t, 0)
    if args.step_ms:
        out["step_ms"] = args.step_ms
        out["steps_per_sec"] = round(1e3 / args.step_ms, 2)
        out["chain_steps_per_sec"] = round(args.chains * 1e3 / args.step_ms,
                                           0)
        out["pct_of_ceiling"] = round(
            100 * (args.chains * 1e3 / args.step_ms) /
            out["ceiling_chain_steps_per_sec"], 1)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
