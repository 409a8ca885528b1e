#!/bin/bash
# Run the test suite on CPU WITHOUT claiming the exclusive TPU session.
#
# The image's sitecustomize claims the TPU tunnel at every python interpreter
# start when PALLAS_AXON_POOL_IPS is set; blanking it skips registration so
# tests can run concurrently with TPU benchmarks.
cd "$(dirname "$0")/.." || exit 1
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu exec python -m pytest tests/ -q "$@"
