#!/bin/bash
# Run a python script on the TPU, retrying ONLY on TPU-claim races.
#
# The axon TPU claim is exclusive and takes a few seconds to release between
# processes; a losing claimant either blocks or fails with a claim/transport
# error. A deterministically-crashing script must NOT be retried — its
# traceback is surfaced immediately with the real exit code (this script
# used to retry any exit code 1 for its full timeout with empty output).
set -u
LOG=$(mktemp /tmp/tpu_run.XXXXXX.log)
trap 'rm -f "$LOG"' EXIT

# Signatures that indicate the TPU claim/tunnel lost a race or dropped —
# the only failures worth retrying.
CLAIM_RE='axon_ifrt_start_interposer|claim|UNAVAILABLE|DEADLINE_EXCEEDED|failed to connect|Connection refused|Connection reset|Socket closed|interposer'

for attempt in 1 2 3 4 5; do
  # NB: APPEND to PYTHONPATH — clobbering it drops the sitecustomize dir
  # that registers the TPU plugin.
  PYTHONPATH=/root/repo:${PYTHONPATH:-} python "$@" 2>&1 | tee "$LOG"
  code=${PIPESTATUS[0]}
  [ "$code" -eq 0 ] && exit 0
  if tail -n 40 "$LOG" | grep -qiE "$CLAIM_RE"; then
    delay=${TPU_RUN_RETRY_DELAY:-15}
    echo "[tpu_run] attempt $attempt hit a TPU claim/tunnel error; retrying in ${delay}s..." >&2
    sleep "$delay"
    continue
  fi
  echo "[tpu_run] real failure (exit $code), not retrying:" >&2
  tail -n 25 "$LOG" >&2
  exit "$code"
done
echo "[tpu_run] giving up after 5 claim-race retries" >&2
exit 1
