#!/bin/bash
# One-shot TPU A/B sweep for the round's pending perf experiments.
# Run when the axon tunnel is back: bash scripts/tpu_ab.sh 2>&1 | tee /tmp/tpu_ab.log
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
echo "=== seg_broadcast kernel vs xla (the r4 dead-code kernel, now live) ==="
timeout 900 python -u scripts/seg_broadcast_ab.py 2>&1 | grep -v WARNING
echo "=== parity (TPU, stream vs tiled) ==="
STREAM_CPU=0 timeout 900 python -u scripts/stream_parity.py 2>&1 | grep -v WARNING
echo "=== bench default (G=128, observed caps, new kernels) ==="
timeout 900 python -u bench.py 2>&1 | grep -v WARNING
echo "=== bench G=256 ==="
SPLAT_BENCH_CHUNK=256 timeout 900 python -u bench.py 2>&1 | grep -v WARNING
echo "=== stage profile ==="
timeout 1500 python -u scripts/stream_profile.py 2>&1 | grep -v WARNING
