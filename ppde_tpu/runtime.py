"""Run assembly: build energies, oracles and samplers from config.

This is the glue the reference keeps inside its entry scripts
(scripts/directed_evolution.py:21-81, scripts/mnist_sum.py:21-127),
factored into a library so the CLI, tests, benchmarks and checkpoint/resume
all construct identical runs.
"""
from __future__ import annotations

import dataclasses
import json
import os
import warnings

import jax
import jax.numpy as jnp
import numpy as np

from ppde_tpu import codec, energy as energy_mod, io as pio
from ppde_tpu.models import cnn, oracle as oracle_mod, potts as potts_mod
from ppde_tpu.models import torch_convert


def load_potts(protein_dir: str, allow_synthetic: bool = True,
               dtype=jnp.float32) -> potts_mod.PottsParams:
    """Load Potts params: potts.pkl (reference artifact) > potts.npz (our
    fitter's artifact) > deterministic synthetic fallback.

    The reference's potts.pkl blobs are missing from its repo
    (.MISSING_LARGE_BLOBS); `scripts/fit_potts.py` regenerates npz params
    from an MSA.
    """
    pkl = os.path.join(protein_dir, "potts.pkl")
    npz = os.path.join(protein_dir, "potts.npz")
    wt_seqs, wt_ids = pio.read_fasta(os.path.join(protein_dir, "wt.fasta"),
                                     return_ids=True)
    if os.path.exists(pkl):
        return potts_mod.load_pickle(protein_dir, dtype)
    if os.path.exists(npz):
        return potts_mod.load_npz(npz, wt_seqs[0], dtype)
    if not allow_synthetic:
        raise FileNotFoundError(f"no potts.pkl/potts.npz under {protein_dir}")
    warnings.warn(
        f"{protein_dir}: no Potts artifact found (the reference repo's "
        "potts.pkl is a missing blob) — using deterministic synthetic "
        "parameters. Fit real ones with scripts/fit_potts.py.")
    offset = (int(wt_ids[0].split("/")[-1].split("-")[0])
              if "/" in wt_ids[0] else 1)
    return potts_mod.synthetic(wt_seqs[0], seed=0, dtype=dtype)


def load_supervised_ensemble(protein_dir: str, n_members: int = 3):
    """Converted reference OnehotCNN checkpoints as stacked params."""
    paths = [os.path.join(protein_dir, f"onehot_cnn_seed={i}.pt")
             for i in range(n_members)]
    return jax.tree.map(jnp.asarray,
                        torch_convert.onehot_cnn_ensemble(paths))


def resolve_esm_chunk(esm_chunk: int, has_transformer: bool,
                      n_chains: int) -> int | None:
    """Map the --esm_chunk flag to an energy chunk_size.

    0 -> auto: 16 when a transformer expert is present and the population
    is big enough to chunk (the measured optimum, see the table at the
    call site); otherwise monolithic. -1 -> force monolithic. Positive ->
    use as given.
    """
    if esm_chunk < 0:
        return None  # explicit monolithic
    if esm_chunk > 0:
        return esm_chunk
    return 16 if (has_transformer and n_chains > 16) else None


def build_protein_energy(args) -> tuple[energy_mod.Energy, "object"]:
    """Construct (energy, oracle=(params, apply)) for a protein run.

    args needs: protein_weights, protein, energy_function, unsupervised_expert,
    energy_lamda, n_chains, and optionally esm_weights/allow_random_esm.
    """
    protein_dir = os.path.join(args.protein_weights, args.protein)
    wt_seqs = pio.read_fasta(os.path.join(protein_dir, "wt.fasta"))
    wt_onehot = jnp.asarray(codec.seqs_to_onehot(wt_seqs))
    sup = load_supervised_ensemble(protein_dir)

    potts_npz = getattr(args, "potts_npz", None)
    if potts_npz:
        # explicit fit override (scale-matched / sweep artifacts): the
        # expert energy and the oracle's evolutionary feature stay coherent
        # because both take this same params object
        pp = potts_mod.load_npz(potts_npz, wt_seqs[0])
    else:
        pp = load_potts(protein_dir)

    # '--unsupervised_expert potts+transformer[-S/M/L]' composes PoE terms
    # (reference energy.py:83-89); the esm2 config key is the transformer
    # part alone
    experts = args.unsupervised_expert.split("+")
    esm_name = next((e for e in experts if e.startswith("transformer")),
                    None)
    transformer = None
    if esm_name is not None:
        from ppde_tpu.models import esm2

        params, apply_fn = esm2.load_expert(
            esm_name, wt_seqs[0],
            weights_path=getattr(args, "esm_weights", None),
            allow_random=getattr(args, "allow_random_esm", False))
        transformer = (params, apply_fn)

    cdt0 = getattr(args, "compute_dtype", "f32")
    cdt_j = jnp.bfloat16 if cdt0 == "bf16" else None
    fused = getattr(args, "fused_cnn", False)
    cnn_chunk = getattr(args, "cnn_chunk", 0) or None
    if cnn_chunk is None and args.n_chains > 256:
        cnn_chunk = 128  # large populations: chunked eval scales linearly
    # 'split' = JAX equal-tie-split (default; never slower, PERF.md);
    # 'first' = torch.max single-index backward (reference nets.py:372)
    pool_bwd = getattr(args, "pool_bwd", "split")
    if args.energy_function == "supervised":
        en = energy_mod.protein_supervised(sup, wt_onehot,
                                           compute_dtype=cdt_j,
                                           fused_cnn=fused,
                                           cnn_chunk=cnn_chunk,
                                           pool_bwd=pool_bwd)
    else:
        use_potts = "potts" in experts
        # Transformer chunking, measured honestly at B=128 ESM2-S
        # (tools/probe_esm_dce.py, round 3 — dependency-threaded probes
        # consuming ALL chunk outputs; energy+grad ms): unrolled chunk-16
        # 63.3 / chunk-8 66.2 / chunk-32 73.4 / chunk-64 96.3 / lax.map-64
        # 93.7 (the reference's minibatch pattern, energy.py:114-130, as a
        # sequential device loop) / monolithic 105.0. Default 16 — the
        # honest optimum, confirmed by step-level timing (62.9 ms @16 <
        # 64.5 @8). --esm_chunk overrides (0 = this default, -1 = force
        # monolithic).
        chunk = resolve_esm_chunk(getattr(args, "esm_chunk", 0),
                                  transformer is not None, args.n_chains)
        en = energy_mod.protein_poe(
            pp if use_potts else None, sup, args.energy_lamda, wt_onehot,
            transformer=transformer, chunk_size=chunk,
            compute_dtype=cdt_j, fused_cnn=fused, cnn_chunk=cnn_chunk,
            pool_bwd=pool_bwd)

    orc = oracle_mod.load(protein_dir, potts_params=pp)
    oracle = (orc, oracle_mod.apply)
    return en, oracle, pp, orc


def make_initial_protein_population(protein_dir: str, n_chains: int):
    wt_seqs = pio.read_fasta(os.path.join(protein_dir, "wt.fasta"))
    wt_onehot = jnp.asarray(codec.seqs_to_onehot(wt_seqs))
    return jnp.repeat(wt_onehot, n_chains, axis=0)


def enable_compile_cache(cache_dir: str | None = None) -> None:
    """Persistent XLA compilation cache: repeat CLI invocations with the
    same shapes skip the (slow, remote) TPU compile entirely. Safe no-op
    if the config knobs are unavailable."""
    try:
        if cache_dir is None:
            cache_dir = os.path.join(os.getcwd(), ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def potts_provenance(protein_dir: str, potts_npz: str | None = None) -> str:
    """Which Potts parameters a run used (PARITY.md's provenance markers):
    'reference-pkl' (the reference's own artifact), 'refit' (our
    scripts/fit_potts.py npz), 'npz:<path>' (an explicit --potts_npz
    override), or 'synthetic' (deterministic fallback for the proteins
    whose potts.pkl is a missing upstream blob)."""
    if potts_npz:
        return f"npz:{potts_npz}"
    if os.path.exists(os.path.join(protein_dir, "potts.pkl")):
        return "reference-pkl"
    if os.path.exists(os.path.join(protein_dir, "potts.npz")):
        return "refit"
    return "synthetic"


def _q(v, qs=(0.2, 0.4, 0.5, 0.6, 0.8, 0.9, 1.0)):
    v = np.asarray(v, dtype=np.float64)
    return {f"p{int(q * 100)}": round(float(np.quantile(v, q)), 4)
            for q in qs}


def cell_summary(args, run_dir, *, population, wt_onehot, oracle_scores,
                 fitness, energy, potts_scores, transformer_scores,
                 steps_per_sec, wall_steps_per_sec,
                 potts_provenance) -> dict:
    """Machine-readable sweep-cell summary: the numbers PARITY.md's tables
    quote (diversity / exploration / score quantiles / throughput), plus
    enough config + provenance to interpret them without the run dir."""
    from ppde_tpu import metrics

    em, es = metrics.exploration(population, wt_onehot)
    summary = {
        "protein": args.protein,
        "sampler": args.sampler,
        "seed": args.seed,
        "n_iters": args.n_iters,
        "n_chains": args.n_chains,
        "energy_function": args.energy_function,
        "unsupervised_expert": args.unsupervised_expert,
        "energy_lamda": args.energy_lamda,
        "nmut_threshold": args.nmut_threshold,
        "reference_reverse": bool(getattr(args, "ppde_reference_reverse",
                                          False)),
        "run_signature": args.run_signature,
        "potts_provenance": potts_provenance,
        "diversity_pct": round(metrics.diversity_pct(population), 2),
        "exploration_mean": round(em, 3),
        "exploration_std": round(es, 3),
        "oracle_logfit": _q(oracle_scores),
        "pred_fitness": _q(fitness),
        "energy": _q(energy),
        "potts_delta": _q(potts_scores),
        "steps_per_sec": round(float(steps_per_sec), 2),
        "wall_steps_per_sec": round(float(wall_steps_per_sec), 2),
        "run_dir": str(run_dir),
        # stable copy location (if any): post-hoc density scoring
        # (scripts/eval_proteins.py --update_summary) updates both files
        "summary_json": getattr(args, "summary_json", "") or None,
    }
    if transformer_scores is not None:
        summary["evolutionary_density"] = _q(transformer_scores)
        summary["msa_transformer_model"] = args.msa_transformer_model
        summary["msa_transformer_weights"] = args.msa_transformer_weights
    return summary


def dump_config(args, path):
    with open(path, "w") as f:
        json.dump({k: (v if isinstance(v, (int, float, str, bool, type(None)))
                       else str(v)) for k, v in vars(args).items()},
                  f, indent=2)


def apply_mesh(energy: energy_mod.Energy, pop, dp: int | None, tp: int = 1,
               ep: int = 1, sp: int = 1):
    """Shard a built energy + population over a (dp, ep, tp, sp) device mesh.

    ``sp`` > 1 turns on sequence parallelism for transformer experts: the
    ESM2 residual stream's T axis shards over the sp mesh axis via the
    module-level esm2.SP_CONSTRAIN hook (the apply_fn closures baked into
    the Energy pick it up without rebuilding; parallel/mesh.sp_constraint).

    The TPU-native scaling path (SURVEY.md §2.3): chains shard over dp
    (embarrassingly parallel), the Potts coupling matmul shards over tp,
    stacked supervised-ensemble members over ep (GSPMD inserts the psum for
    the ensemble mean), everything else replicates. Returns (mesh,
    sharded_energy, sharded_pop); run the sampler inside ``with mesh:``.
    Works identically on a real pod slice and on a virtual CPU mesh
    (xla_force_host_platform_device_count).

    Note on ep with the reference's 3-member ensembles: member counts must
    divide ep for the shard to land (shard_ensemble replicates otherwise),
    so ep>1 pays off only for ensembles sized to the mesh (e.g. 4 members
    on ep=2). For the canonical 3-member runs dp*tp uses every chip with
    zero constraint — that's why it's the default.
    """
    from ppde_tpu.parallel import mesh as pmesh

    mesh = pmesh.make_mesh(dp=dp, ep=ep, tp=tp, sp=sp)
    # set OR CLEAR the hook every call: a later apply_mesh (or a fresh
    # single-device energy) in the same process must not inherit a
    # constraint closed over a stale mesh
    from ppde_tpu.models import esm2

    esm2.SP_CONSTRAIN = pmesh.sp_constraint(mesh) if sp > 1 else None
    params = dict(energy.params)
    if "potts" in params and tp > 1:
        params["potts"] = pmesh.shard_potts(params["potts"], mesh)
    else:
        if "potts" in params:
            params["potts"] = jax.tree.map(
                lambda a: pmesh.replicated(a, mesh), params["potts"])
    if "tr" in params and tp > 1:
        params["tr"] = pmesh.shard_esm(params["tr"], mesh)
    if "sup" in params and ep > 1:
        params["sup"] = pmesh.shard_ensemble(params["sup"], mesh)
    for k in params:
        if (k not in ("potts", "tr", "sup") or (k == "tr" and tp == 1)
                or (k == "sup" and ep == 1)):
            params[k] = jax.tree.map(lambda a: pmesh.replicated(a, mesh),
                                     params[k])
    energy = dataclasses.replace(energy, params=params)
    pop = pmesh.shard_chains(jnp.asarray(pop), mesh)
    return mesh, energy, pop
