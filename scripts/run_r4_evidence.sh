#!/bin/bash
# Round-4 evidence regeneration: every PARITY.md table backed by a COMMITTED
# machine-readable summary (VERDICT round 3, "Missing #2": most tables cited
# results/ paths that did not exist in a fresh checkout).
#
# Phases (run one at a time; each cell is an exclusive-TPU job):
#   proteins — the 3-protein x 6-sampler canonical sweep + the 4-seed PPDE
#              spread (both estimators) + the 2 full-scale PT cells; every
#              cell writes results/proteins/summaries/<cell>.json (tracked).
#   mnist    — the full-scale sampler matrix at the controlled config
#              (lambda=10) and the reference-tuned configs, + PPDE-PT;
#              summaries to results/mnist/r4full_summary.json etc.
#
# Usage: scripts/run_r4_evidence.sh [proteins|mnist|all]
set -uo pipefail
cd "$(dirname "$0")/.."

PHASE=${1:-all}
SUM=results/proteins/summaries
mkdir -p "$SUM"

declare -A LAMBDA_POTTS=(
  [PABP_YEAST_Fields2013]=5
  [UBE4B_MOUSE_Klevit2013-nscor_log2_ratio]=0.5
  [GFP_AEQVI_Sarkisyan2016]=15
)
declare -A SHORT=(
  [PABP_YEAST_Fields2013]=PABP
  [UBE4B_MOUSE_Klevit2013-nscor_log2_ratio]=UBE4B
  [GFP_AEQVI_Sarkisyan2016]=GFP
)

cell() {  # name prot extra-args...
  local name=$1 prot=$2; shift 2
  if [ -s "$SUM/$name.json" ]; then
    echo "=== [skip, summary exists] $name" >&2
    return 0
  fi
  echo "=== $name" >&2
  tools/tpu_run.sh scripts/directed_evolution.py \
    --protein "$prot" --n_chains 128 --nmut_threshold 10 \
    --disable_MSA_transformer_scoring \
    --summary_json "$SUM/$name.json" "$@" \
    || echo "[r4] FAILED: $name" >&2
}

if [ "$PHASE" = proteins ] || [ "$PHASE" = all ]; then
  for prot in PABP_YEAST_Fields2013 \
              UBE4B_MOUSE_Klevit2013-nscor_log2_ratio \
              GFP_AEQVI_Sarkisyan2016; do
    s=${SHORT[$prot]}; lam=${LAMBDA_POTTS[$prot]}
    # PPDE both estimators x 4 seeds (the seed-spread table; grouped so the
    # compile cache is reused across seeds)
    for seed in 1234567 7 42 2024; do
      cell "${s}_PPDE-exact_s${seed}" "$prot" --sampler PPDE \
        --unsupervised_expert potts --energy_lamda "$lam" \
        --n_iters 10000 --seed "$seed" --run_signature potts_exact
    done
    for seed in 1234567 7 42 2024; do
      cell "${s}_PPDE-refrev_s${seed}" "$prot" --sampler PPDE \
        --ppde_reference_reverse --unsupervised_expert potts \
        --energy_lamda "$lam" --n_iters 10000 --seed "$seed" \
        --run_signature potts
    done
    for sampler in simulated_annealing Random MALA-approx; do
      cell "${s}_${sampler}_s1234567" "$prot" --sampler "$sampler" \
        --unsupervised_expert potts --energy_lamda "$lam" \
        --n_iters 10000 --seed 1234567 --run_signature potts
    done
    cell "${s}_CMAES_s1234567" "$prot" --sampler CMAES \
      --unsupervised_expert potts --energy_lamda "$lam" \
      --n_iters 1000 --seed 1234567 --run_signature potts
  done
  # expert ablations (Table 1/2 "Potts only" / "Supervised only" rows —
  # the reference publishes them for ALL THREE proteins)
  for prot in PABP_YEAST_Fields2013 \
              UBE4B_MOUSE_Klevit2013-nscor_log2_ratio \
              GFP_AEQVI_Sarkisyan2016; do
    s=${SHORT[$prot]}; lam=${LAMBDA_POTTS[$prot]}
    cell "${s}_PPDE-pottsonly_s1234567" "$prot" --sampler PPDE \
      --ppde_reference_reverse --unsupervised_expert potts \
      --energy_lamda 0 --n_iters 10000 --seed 1234567 \
      --run_signature potts_only
    cell "${s}_PPDE-suponly_s1234567" "$prot" --sampler PPDE \
      --ppde_reference_reverse --energy_function supervised \
      --unsupervised_expert potts --energy_lamda "$lam" \
      --n_iters 10000 --seed 1234567 --run_signature sup_only
  done
  # beyond-reference: full-scale PPDE-PT cells (corrected reverse)
  for prot in PABP_YEAST_Fields2013 \
              UBE4B_MOUSE_Klevit2013-nscor_log2_ratio \
              GFP_AEQVI_Sarkisyan2016; do
    s=${SHORT[$prot]}; lam=${LAMBDA_POTTS[$prot]}
    cell "${s}_PPDE-PT_s1234567" "$prot" --sampler PPDE-PT \
      --unsupervised_expert potts --energy_lamda "$lam" \
      --n_iters 10000 --seed 1234567 --run_signature potts_pt
  done
fi

if [ "$PHASE" = mnist ] || [ "$PHASE" = all ]; then
  mrun() {
    echo "=== mnist $*" >&2
    tools/tpu_run.sh scripts/mnist_sum.py --n_iters 20000 --n_chains 128 \
      --log_every 100 --wild_type 1 "$@" || echo "[r4] FAILED: $*" >&2
  }
  # controlled comparison: every sampler at the PPDE cell's lambda=10
  mrun --sampler PPDE --ppde_pas_length 10 --energy_lamda 10 \
       --seed 1234567 --suffix r4full
  mrun --sampler PPDE-PT --ppde_pas_length 10 --energy_lamda 10 \
       --seed 1234567 --suffix r4full
  mrun --sampler simulated_annealing --energy_lamda 10 --seed 1234567 \
       --suffix r4full
  mrun --sampler MALA-approx --energy_lamda 10 --diffusion_step_size 0.01 \
       --seed 1234567 --suffix r4full
  mrun --sampler CMAES --energy_lamda 10 --seed 1234567 --suffix r4full
  # reference-tuned baseline configs (reference README's own commands)
  mrun --sampler simulated_annealing --energy_lamda 30 \
       --simulated_annealing_temp 10 --muts_per_seq_param 5 --seed 1 \
       --suffix r4refcfg
  mrun --sampler MALA-approx --energy_lamda 5 --diffusion_step_size 0.1 \
       --diffusion_relaxation_tau 0.9 --seed 1 --suffix r4refcfg
  mrun --sampler CMAES --energy_lamda 20 --cmaes_initial_variance 0.1 \
       --seed 1 --suffix r4refcfg
  tools/tpu_run.sh scripts/summarize_mnist_runs.py --score_ebm \
    --runs_glob 'results/mnist/*_r4full' \
    --out_json results/mnist/r4full_summary.json
  tools/tpu_run.sh scripts/summarize_mnist_runs.py --score_ebm \
    --runs_glob 'results/mnist/*_r4refcfg' \
    --out_json results/mnist/r4refcfg_summary.json
fi

echo "=== r4 evidence phase '$PHASE' done" >&2
