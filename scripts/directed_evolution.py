"""Protein directed-evolution experiment CLI.

Flag-surface and artifact parity with the reference entry point
(scripts/directed_evolution.py:34-167): same sampler/expert/energy options,
same run-directory naming ({sampler}_{signature}_{seed}_{timestamp}), same
artifact set (config.txt + 7 .npy files + optional MSA-Transformer scores).

Runs on the TPU by default; --device is accepted for compatibility and
ignored (JAX picks the platform).
"""
from __future__ import annotations

import argparse
import datetime
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def get_sampler_runner(args):
    import jax

    from ppde_tpu.samplers.protein import (cmaes, mala_approx, ppde,
                                           random_search, sa)

    key = jax.random.PRNGKey(args.seed)
    ck = args.checkpoint_dir or None
    if args.sampler == "PPDE":
        cfg = ppde.PPDEConfig(pas_length=args.ppde_pas_length,
                              nmut_threshold=args.nmut_threshold,
                              paper_results=args.paper_results,
                              reference_reverse=args.ppde_reference_reverse)
        return lambda **kw: ppde.run(cfg=cfg, key=key, checkpoint_dir=ck,
                                     **kw)
    if args.sampler == "PPDE-PT":
        from ppde_tpu.samplers.protein import pt

        cfg = pt.PTConfig(pas_length=args.ppde_pas_length,
                          nmut_threshold=args.nmut_threshold,
                          reference_reverse=args.ppde_reference_reverse,
                          n_levels=args.pt_levels,
                          beta_min=args.pt_beta_min,
                          swap_every=args.pt_swap_every)
        return lambda **kw: pt.run(cfg=cfg, key=key, checkpoint_dir=ck, **kw)
    if args.sampler == "simulated_annealing":
        cfg = sa.SAConfig(temp=args.simulated_annealing_temp,
                          muts_per_seq_param=args.muts_per_seq_param,
                          decay_rate=args.decay_rate,
                          nmut_threshold=args.nmut_threshold)
        return lambda **kw: sa.run(cfg=cfg, key=key, checkpoint_dir=ck, **kw)
    if args.sampler == "Random":
        cfg = random_search.RandomConfig(
            muts_per_seq_param=args.muts_per_seq_param)
        return lambda **kw: random_search.run(cfg=cfg, key=key,
                                              checkpoint_dir=ck, **kw)
    if args.sampler == "MALA-approx":
        cfg = mala_approx.MALAConfig(
            step_size=args.diffusion_step_size,
            relaxation_tau=args.diffusion_relaxation_tau)
        return lambda **kw: mala_approx.run(cfg=cfg, key=key,
                                            checkpoint_dir=ck, **kw)
    if args.sampler == "CMAES":
        cfg = cmaes.CMAESConfig(
            population_size=args.cmaes_population_size,
            initial_variance=args.cmaes_initial_variance,
            diag={"auto": None, "full": False, "sep": True}[args.cmaes_cov])
        return lambda **kw: cmaes.run(cfg=cfg, seed=args.seed,
                                      checkpoint_dir=ck, **kw)
    raise ValueError(f"unknown sampler {args.sampler}")


def main(args):
    import jax
    import jax.numpy as jnp

    from ppde_tpu import runtime
    from ppde_tpu.models import potts as potts_mod

    runtime.enable_compile_cache()
    np.random.seed(args.seed)

    unique = (f"{args.sampler}_{args.seed}"
              if args.run_signature == "" else
              f"{args.sampler}_{args.run_signature}_{args.seed}")
    unique += "_" + datetime.datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    results_path = Path(args.results_path, args.protein, unique)
    results_path.mkdir(parents=True, exist_ok=True)

    energy, oracle, pp, orc = runtime.build_protein_energy(args)
    protein_dir = os.path.join(args.protein_weights, args.protein)
    pop = runtime.make_initial_protein_population(protein_dir, args.n_chains)

    e0, _ = jax.jit(energy.energy)(energy.params, pop)
    print(f"WT protein energy: {float(e0.mean()):.3f}", flush=True)

    runner = get_sampler_runner(args)
    if args.mesh_dp or args.mesh_tp > 1 or args.mesh_ep > 1 \
            or args.mesh_sp > 1:
        mesh, energy, pop = runtime.apply_mesh(
            energy, pop, dp=args.mesh_dp or None, tp=args.mesh_tp,
            ep=args.mesh_ep, sp=args.mesh_sp)
        print(f"mesh: {dict(mesh.shape)}", flush=True)
        with mesh:
            res = runner(energy=energy, initial_population=pop,
                         num_steps=args.n_iters,
                         min_pos=pp.min_pos, max_pos=pp.max_pos,
                         oracle=oracle, log_every=args.log_every)
    else:
        res = runner(energy=energy, initial_population=pop,
                     num_steps=args.n_iters,
                     min_pos=pp.min_pos, max_pos=pp.max_pos,
                     oracle=oracle, log_every=args.log_every)

    best = jnp.asarray(res.best_x)
    best_oracle = np.asarray(jax.jit(oracle[1])(oracle[0], best))
    potts_score = np.asarray(potts_mod.score(pp, best, delta=True))

    qs = [0.2, 0.4, 0.6, 0.8, 1.0]
    print(f"energy quantiles: {np.quantile(res.best_energy, qs)}")
    print(f"fitness quantiles: {np.quantile(res.best_fitness, qs)}")
    print(f"oracle quantiles: {np.quantile(best_oracle, qs)}")
    print(f"potts quantiles: {np.quantile(potts_score, qs)}")
    print(f"sampler throughput: {res.steps_per_sec:.1f} steps/s "
          f"({res.steps_per_sec * args.n_chains:.0f} chain-steps/s)")

    runtime.dump_config(args, results_path / "config.txt")
    np.save(results_path / "population.npy", res.best_x)
    np.save(results_path / "pred_fitness_scores.npy", res.best_fitness)
    np.save(results_path / "oracle_fitness_scores.npy", best_oracle)
    np.save(results_path / "potts_scores.npy", potts_score)
    np.save(results_path / "energy_scores.npy", res.best_energy)
    np.save(results_path / "energy_history.npy", res.energy_history)
    np.save(results_path / "fitness_history.npy", res.fitness_history)

    tscore = None
    if not args.disable_MSA_transformer_scoring:
        from ppde_tpu import metrics

        try:
            tscore = metrics.proteins_transformer_score(
                np.asarray(res.best_x), protein_dir, args.msa_path,
                args.msa_size, weights_path=args.msa_transformer_weights,
                msa_model=args.msa_transformer_model)
            print(f"MSATransformer quantiles: {np.quantile(tscore, qs)}")
            np.save(results_path / "transformer_scores.npy", tscore)
        except FileNotFoundError as e:
            print(f"[skip] MSA-Transformer scoring unavailable: {e}",
                  flush=True)

    # machine-readable cell summary: every number PARITY.md quotes for this
    # run, committable as a small JSON (the reference only dumps .npy blobs,
    # directed_evolution.py:92-101 — its tables are not machine-checkable)
    summary = runtime.cell_summary(
        args, results_path, population=np.asarray(res.best_x),
        wt_onehot=np.asarray(pop[0])[None], oracle_scores=best_oracle,
        fitness=np.asarray(res.best_fitness),
        energy=np.asarray(res.best_energy), potts_scores=potts_score,
        transformer_scores=tscore, steps_per_sec=res.steps_per_sec,
        wall_steps_per_sec=res.wall_steps_per_sec,
        potts_provenance=runtime.potts_provenance(protein_dir,
                                                  args.potts_npz))
    with open(results_path / "summary.json", "w") as f:
        json.dump(summary, f, indent=2)
    if args.summary_json:
        os.makedirs(os.path.dirname(os.path.abspath(args.summary_json)),
                    exist_ok=True)
        with open(args.summary_json, "w") as f:
            json.dump(summary, f, indent=2)

    print("done")
    return results_path


def build_parser():
    p = argparse.ArgumentParser()
    g = p.add_argument_group("general")
    g.add_argument("--protein_weights", type=str, default="weights")
    g.add_argument("--results_path", type=str, default="results/proteins")
    g.add_argument("--protein", type=str, default="PABP_YEAST_Fields2013",
                   help="PABP_YEAST_Fields2013, "
                        "UBE4B_MOUSE_Klevit2013-nscor_log2_ratio, "
                        "GFP_AEQVI_Sarkisyan2016")
    g.add_argument("--hub_dir", type=str, default=".")
    g.add_argument("--msa_path", type=str,
                   default="data/proteins/PABP_YEAST.a2m")
    g.add_argument("--msa_size", type=int, default=500)
    g.add_argument("--seed", type=int, default=1234567)
    g.add_argument("--device", type=str, default="tpu",
                   help="accepted for reference compatibility; ignored")
    g.add_argument("--log_every", type=int, default=50)
    g.add_argument("--run_signature", type=str, default="")
    g.add_argument("--n_iters", type=int, default=10000)
    g.add_argument("--n_chains", type=int, default=128)
    g.add_argument("--energy_lamda", type=float, default=5)
    g.add_argument("--energy_function", type=str, default="product_of_experts",
                   help="product_of_experts, supervised")
    g.add_argument("--unsupervised_expert", type=str, default="potts",
                   help="potts, transformer-S, transformer-M, transformer-L, "
                        "potts+transformer")
    g.add_argument("--sampler", type=str, default="PPDE")
    g.add_argument("--nmut_threshold", type=int, default=0)
    g.add_argument("--disable_MSA_transformer_scoring", action="store_true")
    g.add_argument("--paper_results", action="store_true", default=False)
    g.add_argument("--esm_weights", type=str, default=None,
                   help="path to a fair-esm esm2_t*.pt checkpoint "
                        "(transformer experts)")
    g.add_argument("--potts_npz", type=str, default=None,
                   help="override the protein dir's Potts artifact with "
                        "this save_npz fit (expert energy AND the oracle's "
                        "evolutionary feature both use it — e.g. the "
                        "reference-scale-matched artifact from "
                        "scripts/calibrate_oracle_scale.py)")
    g.add_argument("--msa_transformer_weights", type=str, default=None,
                   help="path to a fair-esm esm_msa1b .pt checkpoint, or a "
                        "family-trained .npz (scripts/finetune_msa.py)")
    g.add_argument("--msa_transformer_model", type=str, default="msa-1b",
                   help="msa_transformer.CONFIGS key the weights belong to")
    g.add_argument("--allow_random_esm", action="store_true",
                   help="use randomly-initialized ESM2 (smoke tests only)")
    g.add_argument("--summary_json", type=str, default="",
                   help="also write the machine-readable cell summary to "
                        "this stable path (a summary.json is always written "
                        "into the timestamped run dir); PARITY.md's tables "
                        "cite these")
    g.add_argument("--checkpoint_dir", type=str, default="",
                   help="persist sampler state each log segment and resume "
                        "from an existing checkpoint (capability absent "
                        "from the reference)")
    g.add_argument("--fused_cnn", action="store_true",
                   help="fused Pallas CNN energy kernel (TPU only; wins at "
                        "large populations, see PERF.md)")
    g.add_argument("--cnn_chunk", type=int, default=0,
                   help="chunk the CNN energy over this many chains "
                        "(0 = auto: 128 when n_chains > 256)")
    g.add_argument("--pool_bwd", choices=["split", "first"],
                   default="split",
                   help="max-pool backward: JAX equal-tie-split (default) "
                        "or torch.max first-argmax routing (reference "
                        "gradient parity; ~2%% slower, PERF.md)")
    g.add_argument("--esm_chunk", type=int, default=0,
                   help="chunk the transformer energy over this many chains "
                        "(0 = auto: 16, the measured optimum — unrolled "
                        "chunks beat monolithic 63 vs 105 ms at B=128, "
                        "PERF.md; -1 = force one monolithic evaluation)")
    g.add_argument("--mesh_dp", type=int, default=0,
                   help="shard chains over a dp-axis device mesh of this "
                        "size (0 = single device); chains must divide it")
    g.add_argument("--mesh_tp", type=int, default=1,
                   help="shard the Potts coupling matmul over a tp axis")
    g.add_argument("--mesh_ep", type=int, default=1,
                   help="shard stacked supervised-ensemble members over an "
                        "ep axis (member count must divide it; the default "
                        "3-member ensembles replicate unless ep is 3)")
    g.add_argument("--mesh_sp", type=int, default=1,
                   help="sequence parallelism for transformer experts: "
                        "shard the ESM2 residual stream's T axis over an "
                        "sp axis (activation memory / LN+FFN compute per "
                        "device drop by sp)")
    g.add_argument("--compute_dtype", choices=["f32", "bf16"], default="f32",
                   help="supervised-CNN compute precision (bf16 ~2x faster; "
                        "the reference uses AMP for its transformers)")

    sa_g = p.add_argument_group("simulated_annealing")
    sa_g.add_argument("--simulated_annealing_temp", type=float, default=0.01)
    sa_g.add_argument("--muts_per_seq_param", type=float, default=1.5)
    sa_g.add_argument("--decay_rate", type=float, default=0.999)

    d = p.add_argument_group("mala_approx")
    d.add_argument("--diffusion_step_size", type=float, default=0.1)
    d.add_argument("--diffusion_relaxation_tau", type=float, default=0.99)

    c = p.add_argument_group("cmaes")
    c.add_argument("--cmaes_population_size", type=int, default=16)
    c.add_argument("--cmaes_initial_variance", type=float, default=0.05)
    c.add_argument("--cmaes_cov", choices=["auto", "full", "sep"],
                   default="auto",
                   help="covariance model: full CMA-ES, sep-CMA (diagonal, "
                        "O(d)/gen — needed at GFP's d=4760), or auto by "
                        "dimension")

    pp = p.add_argument_group("ppde")
    pp.add_argument("--ppde_pas_length", type=int, default=2)
    pp.add_argument("--pt_levels", type=int, default=8,
                    help="PPDE-PT: temperature levels (n_chains %% levels "
                         "== 0; beyond-reference parallel tempering, "
                         "samplers/protein/pt.py)")
    pp.add_argument("--pt_beta_min", type=float, default=0.25,
                    help="PPDE-PT: hottest inverse temperature (geometric "
                         "ladder down from 1.0)")
    pp.add_argument("--pt_swap_every", type=int, default=1,
                    help="PPDE-PT: attempt replica exchanges every this "
                         "many steps")
    pp.add_argument("--ppde_reference_reverse", action="store_true",
                    help="reproduce the reference's reverse-path estimator "
                         "(evaluates reverse log-probs at the FORWARD "
                         "indices — not a valid MH involution; biases the "
                         "chain hot. Default is the corrected reverse; see "
                         "PPDEConfig.reference_reverse)")
    return p


if __name__ == "__main__":
    main(build_parser().parse_args())
