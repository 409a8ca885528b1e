#!/bin/bash
# Round-4 master queue: regenerate every evidence artifact serially (the TPU
# claim is exclusive — ONE client at a time, see CLAUDE.md). Each phase
# script skips cells whose summary already exists, so the queue is cheap to
# re-run after an interruption.
#
# Usage: scripts/run_r4_all.sh  (logs to logs/r4_queue.log)
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p logs

run() {
  echo "=== [queue $(date +%H:%M:%S)] $*" >&2
  "$@" || echo "=== [queue] PHASE FAILED (continuing): $*" >&2
}

run scripts/run_r4_family_cells.sh        # VERDICT #1: Tables 1-2 family rows
run scripts/run_r4_evidence.sh proteins   # VERDICT #2: committed summaries
run scripts/run_r4_650m.sh                # VERDICT #3: 650M quality row
run scripts/run_r4_evidence.sh mnist      # VERDICT #2: MNIST matrices
run scripts/run_r4_qc_pt.sh all           # VERDICT #5/#8: QC + PT value case
echo "=== [queue $(date +%H:%M:%S)] r4 queue complete" >&2
