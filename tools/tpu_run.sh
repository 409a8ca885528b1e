#!/bin/bash
# Run a python script on the TPU with retries: the axon TPU claim is
# exclusive and takes a few seconds to release between processes.
set -u
for attempt in 1 2 3 4 5; do
  # NB: APPEND to PYTHONPATH — clobbering it drops the sitecustomize dir
  # that registers the TPU plugin.
  PYTHONPATH=/root/repo:${PYTHONPATH:-} python "$@" && exit 0
  code=$?
  if [ $code -ne 1 ]; then exit $code; fi
  echo "[tpu_run] attempt $attempt failed (likely TPU claim); retrying in 15s..." >&2
  sleep 15
done
exit 1
