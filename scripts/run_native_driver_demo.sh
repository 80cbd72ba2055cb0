#!/usr/bin/env bash
# End-to-end native-driver demo: export classifier artifacts from Python,
# then train on the TPU from C++ via the PJRT C API (no Python in the loop).
# The TPU-world equivalent of building and running the reference's LibTorch
# example-app (/root/reference/src/example-app.cpp).
set -euo pipefail
cd "$(dirname "$0")/.."

./scripts/build_native.sh
python scripts/export_classifier_artifacts.py --out artifacts/classifier

# env the axon TPU-tunnel plugin needs (normally set by Python sitecustomize)
export AXON_POOL_SVC_OVERRIDE=${AXON_POOL_SVC_OVERRIDE:-127.0.0.1}
export AXON_LOOPBACK_RELAY=${AXON_LOOPBACK_RELAY:-1}
export TPU_WORKER_HOSTNAMES=${TPU_WORKER_HOSTNAMES:-localhost}

./build-csrc/ttsrt_train artifacts/classifier "${1:-/opt/axon/libaxon_pjrt.so}" "${2:-3}"
