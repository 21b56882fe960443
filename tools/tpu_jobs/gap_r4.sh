#!/bin/bash
# Session-4 post-queue gap sequence (run manually once the r4c queue's
# house job has staged): config-5 rerun with the sub-block OOM fix, the
# frame-cost decomposition, then BASELINE config-1/2/3 chip tables.
# Each job stages its artifact immediately after finishing.
cd /root/repo

echo "[gap] config5 (sub-blocks 8) $(date -u +%H:%M:%S)"
rm -f /tmp/config5_tpu.json  # never promote a stale JSON (ADVICE r4)
timeout 4200 python -m spcbpt_tpu.apps.multichip_bench \
  --scene interior_cove --dim 2048x2048 --platform default --meshes 1x1 \
  --max-depth 12 --light-paths-per-chip 65536 --equal-time 300 \
  --sub-blocks 8 \
  --checkpoint /root/repo/.jax_cache/cove_ck1024.npz \
  --ref-npz /root/repo/.jax_cache/cove_ref2048.npz \
  --json /tmp/config5_tpu.json > /tmp/config5_tpu.log 2>&1
echo "[gap] config5 rc=$?"
[ -f /tmp/config5_tpu.json ] && mkdir -p artifacts/config5 && \
  cp /tmp/config5_tpu.json artifacts/config5/cove_2048_equal_time_300s.json

echo "[gap] frame_cost_decomp $(date -u +%H:%M:%S)"
timeout 3600 python tools/tpu_jobs/frame_cost_decomp.py \
  /tmp/frame_cost_decomp.json > /tmp/frame_cost_decomp.log 2>&1
echo "[gap] decomp rc=$?"
[ -f /tmp/frame_cost_decomp.json ] && \
  cp /tmp/frame_cost_decomp.json artifacts/config4/frame_cost_decomp_tpu.json

echo "[gap] config123 $(date -u +%H:%M:%S)"
bash tools/tpu_jobs/config123_tpu.sh
echo "[gap] config123 done $(date -u +%H:%M:%S)"
