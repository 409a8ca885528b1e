#!/bin/bash
# Run a python script on the TPU, retrying ONLY on TPU-claim races.
#
# The axon TPU claim is exclusive and takes a few seconds to release between
# processes; a losing claimant either blocks or fails with a claim/transport
# error. A deterministically-crashing script must NOT be retried — its
# traceback is surfaced immediately with the real exit code.
#
# Stream discipline: the wrapped script's STDOUT passes through untouched
# (bench.py's one-JSON-line contract; `tools/tpu_run.sh bench.py | jq`
# works). STDERR is captured to a temp file for the claim-race grep and
# replayed to our stderr after each attempt exits.
set -u
LOG=$(mktemp /tmp/tpu_run.XXXXXX.log)
trap 'rm -f "$LOG"' EXIT

# Signatures of a lost TPU claim race or a dropped tunnel — the only
# failures worth retrying. 'claim' alone is too loose (an assertion
# message containing the word would loop a real crash); require TPU/axon
# context within the same line.
CLAIM_RE='axon_ifrt_start_interposer|interposer|(tpu|axon|device).{0,60}claim|claim.{0,60}(tpu|axon|device)|UNAVAILABLE[: ]|DEADLINE_EXCEEDED|failed to connect|Connection refused|Connection reset|Socket closed|remote_compile.{0,120}(closed|reset|EOF|timeout)'

for attempt in 1 2 3 4 5; do
  # NB: APPEND to PYTHONPATH — clobbering it drops the sitecustomize dir
  # that registers the TPU plugin.
  PYTHONPATH=/root/repo:${PYTHONPATH:-} python "$@" 2>"$LOG"
  code=$?
  cat "$LOG" >&2
  [ "$code" -eq 0 ] && exit 0
  if tail -n 40 "$LOG" | grep -qiE "$CLAIM_RE"; then
    delay=${TPU_RUN_RETRY_DELAY:-15}
    echo "[tpu_run] attempt $attempt hit a TPU claim/tunnel error; retrying in ${delay}s..." >&2
    sleep "$delay"
    continue
  fi
  echo "[tpu_run] real failure (exit $code), not retrying" >&2
  exit "$code"
done
echo "[tpu_run] giving up after 5 claim-race retries" >&2
exit 1
