#!/bin/bash
# On-chip measurement batch B (chain PAUSED; one TPU job at a time):
#   1. overlap A/B at both viz settings (VERDICT r4 next-round #5) —
#      now with the vectorized FakeSim caster
#   2. PSNR-vs-budget probes (VERDICT r4 next-round #4)
set -u
cd /root/repo
echo "=== overlap A/B, viz ON ($(date -u +%H:%M:%S)) ==="
timeout 5400 python -u scripts/profile_overlap.py 2>&1 | tail -12
echo "=== overlap A/B, --no-viz ($(date -u +%H:%M:%S)) ==="
timeout 5400 python -u scripts/profile_overlap.py --no-viz 2>&1 | tail -12
echo "=== psnr probes ($(date -u +%H:%M:%S)) ==="
timeout 7200 python -u scripts/psnr_probe.py \
  --probes base,gamma0.8,gamma0.5,specwd1e-4,wd1e-5 2>&1 | tail -25
echo "=== batch B done ($(date -u +%H:%M:%S)) ==="
