#!/usr/bin/env bash
# End-to-end native inference demo: export VITS2 infer artifacts from
# Python, then synthesize text -> WAV on the TPU from C++ via the PJRT C
# API (no Python in the loop). The serving counterpart of
# run_native_driver_demo.sh.
set -euo pipefail
cd "$(dirname "$0")/.."

./scripts/build_native.sh
python scripts/export_infer_artifacts.py --out artifacts/infer

# env the axon TPU-tunnel plugin needs (normally set by Python sitecustomize)
export AXON_POOL_SVC_OVERRIDE=${AXON_POOL_SVC_OVERRIDE:-127.0.0.1}
export AXON_LOOPBACK_RELAY=${AXON_LOOPBACK_RELAY:-1}
export TPU_WORKER_HOSTNAMES=${TPU_WORKER_HOSTNAMES:-localhost}

./build-csrc/ttsrt_infer artifacts/infer \
  --text "${1:-speech synthesis on tensor processing units}" \
  -o "${2:-native_out.wav}" --bench "${3:-5}"
