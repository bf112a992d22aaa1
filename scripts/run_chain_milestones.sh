#!/bin/bash
# Staged chained ngp+occ quality run (VERDICT r4 next-round #1).
# Each --until stage trains via 150-step crash-budgeted workers, then
# evals; metrics are snapshotted per milestone so a late-stage failure
# still leaves earlier columns filled.
set -u
cd /root/repo
OUT=${2:-/root/repo/runs/h2h_chain_fake}
SCENE=${1:-fake}
# Resumable per-view eval with small-program dispatches: the monolithic
# 16-view occ eval program both OOM-kills the remote compile helper and
# exceeds the per-process hash-gather crash budget (~4x). See
# active/mapper.py _build_ensemble_renderer and quality_headtohead.py
# worker eval.
export APNERF_EVAL_SPLIT=1
export APNERF_EVAL_RAY_CHUNK=3200
for M in 200 500 1000 2000; do
  if [ -f "$OUT/metrics_${M}.json" ]; then
    echo "=== milestone $M already scored; skipping ==="
    continue
  fi
  echo "=== milestone $M (scene=$SCENE) $(date -u +%H:%M:%S) ==="
  python -u scripts/quality_headtohead.py --chain 150 --steps 2000 \
    --img 640 --scene "$SCENE" --until "$M" --paths ngp+occ --out "$OUT"
  rc=$?
  if [ -f "$OUT/metrics.json" ]; then
    cp "$OUT/metrics.json" "$OUT/metrics_${M}.json"
  fi
  echo "=== milestone $M done rc=$rc $(date -u +%H:%M:%S) ==="
  if [ $rc -ne 0 ]; then echo "stage $M failed; stopping"; exit $rc; fi
done
echo "=== chain complete $(date -u +%H:%M:%S) ==="
