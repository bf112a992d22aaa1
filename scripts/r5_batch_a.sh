#!/bin/bash
# On-chip measurement batch A (run with the chain PAUSED — one TPU job
# at a time, docs/PERFORMANCE.md tpu-bench-discipline):
#   1. current per-step op attribution (profile_trace)
#   2. bench A/B: shipping default vs APNERF_PROP_REUSE=1
#   3. shard_map-on-hardware proof (VERDICT r4 next-round #6)
set -u
cd /root/repo
TS=$(date -u +%H%M%S)
echo "=== trace ($(date -u +%H:%M:%S)) ==="
timeout 900 python -u scripts/profile_trace.py 2>&1 | tail -40
echo "=== bench default #1 ($(date -u +%H:%M:%S)) ==="
timeout 900 python -u bench.py
echo "=== bench PROP_REUSE=1 ($(date -u +%H:%M:%S)) ==="
APNERF_PROP_REUSE=1 timeout 900 python -u bench.py
echo "=== bench PROP_REUSE=1 rerun ($(date -u +%H:%M:%S)) ==="
APNERF_PROP_REUSE=1 timeout 900 python -u bench.py
echo "=== bench default #2 ($(date -u +%H:%M:%S)) ==="
timeout 900 python -u bench.py
echo "=== bench chunk=100 ($(date -u +%H:%M:%S)) ==="
BENCH_STEPS_PER_CALL=100 timeout 900 python -u bench.py
echo "=== bench chunk=250 ($(date -u +%H:%M:%S)) ==="
BENCH_STEPS_PER_CALL=250 BENCH_N_CALLS=2 timeout 900 python -u bench.py
echo "=== bench chunk=100 + PROP_REUSE ($(date -u +%H:%M:%S)) ==="
BENCH_STEPS_PER_CALL=100 APNERF_PROP_REUSE=1 timeout 900 python -u bench.py
echo "=== shardmap_onchip ($(date -u +%H:%M:%S)) ==="
timeout 1800 python -u scripts/shardmap_onchip.py
echo "=== batch A done ($(date -u +%H:%M:%S)) ==="
