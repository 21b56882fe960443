#!/bin/bash
# Round-4c TPU job queue: continuation of tpu_queue_r4b.sh for the
# session-4 window (tunnel UP, round extended past r4b's 06:10 deadline).
#
# Differences from r4b:
#   - every job is SKIPPED if its staged artifact already exists, so a
#     restart never re-renders a completed table (r4b only guarded bench);
#   - default deadline 08:30 UTC (override with QUEUE_DEADLINE_TS) so the
#     chip is free well before the driver bench at round end.
# Job order matches r4b / VERDICT priority.
cd /root/repo

DEADLINE_TS=${QUEUE_DEADLINE_TS:-$(date -u -d "today 08:30" +%s)}

past_deadline() { [ "$(date +%s)" -ge "$DEADLINE_TS" ]; }

deadline_exit() {
  echo "[queue] $(date -u +%H:%M:%S) DEADLINE reached — staging and exiting" >> /tmp/tpu_queue.log
  stage_all
  exit 0
}

probe() {
  timeout 150 python -c "
import jax, jax.numpy as jnp
y=(jnp.ones((128,128))@jnp.ones((128,128))).block_until_ready()
print('TPU_UP')" 2>/dev/null | grep -q TPU_UP
}

wait_tpu() {
  until probe; do
    past_deadline && deadline_exit
    echo "[queue] $(date -u +%H:%M:%S) tunnel down, retry in 180s" >> /tmp/tpu_queue.log
    sleep 180
  done
  echo "[queue] $(date -u +%H:%M:%S) tunnel UP" >> /tmp/tpu_queue.log
}

# run_watched NAME LOG STALL_S TRIES CMD...
run_watched() {
  local name=$1 log=$2 stall=$3 tries=$4; shift 4
  local try=0
  while [ $try -lt $tries ]; do
    try=$((try+1))
    past_deadline && deadline_exit
    wait_tpu
    echo "[queue] $(date -u +%H:%M:%S) start $name (try $try): $*" >> /tmp/tpu_queue.log
    setsid "$@" >> "$log" 2>&1 &
    local pid=$!
    while kill -0 $pid 2>/dev/null; do
      sleep 60
      if past_deadline; then
        echo "[queue] $(date -u +%H:%M:%S) DEADLINE — killing $name (pg $pid)" >> /tmp/tpu_queue.log
        kill -TERM -$pid 2>/dev/null; sleep 5; kill -KILL -$pid 2>/dev/null
        deadline_exit
      fi
      local age=$(( $(date +%s) - $(stat -c %Y "$log" 2>/dev/null || date +%s) ))
      if [ $age -gt $stall ]; then
        echo "[queue] $(date -u +%H:%M:%S) $name stalled (${age}s quiet) — killing pg $pid" >> /tmp/tpu_queue.log
        kill -TERM -$pid 2>/dev/null; sleep 5; kill -KILL -$pid 2>/dev/null
        break
      fi
    done
    wait $pid; local rc=$?
    echo "[queue] $(date -u +%H:%M:%S) $name exited rc=$rc" >> /tmp/tpu_queue.log
    if [ $rc -eq 0 ]; then return 0; fi
  done
  echo "[queue] $name FAILED after $tries tries" >> /tmp/tpu_queue.log
  return 1
}

stage() {
  if [ -e "$1" ]; then
    mkdir -p "$(dirname "$2")"
    cp -r "$1" "$2"
    echo "[queue] staged $1 -> $2" >> /tmp/tpu_queue.log
  fi
}

stage_all() {
  stage /tmp/config4_1024.json    artifacts/config4/cove_1024_equal_time_180s.json
  stage /tmp/config4_1024_imgs    artifacts/config4/imgs_1024
  stage /tmp/frame_cost_256_trained.json artifacts/config4/frame_cost_256_tpu_trained.json
  stage /tmp/nn_ab.json           artifacts/config4/nn_ab_cove256_48spp_tpu.json
  stage /tmp/config5_tpu.json     artifacts/config5/cove_2048_equal_time_300s.json
  stage /tmp/house_eq.json        artifacts/house/house_512_equal_time_60s.json
  stage /tmp/house_eq_imgs        artifacts/house/imgs_512
  if [ -f /tmp/bench_r4.log ] && [ ! -f artifacts/bench/bench_r4_tpu_validation.log ]; then
    mkdir -p artifacts/bench
    tail -40 /tmp/bench_r4.log > artifacts/bench/bench_r4_tpu_validation.log
  fi
}

echo "[queue] === r4c queue start $(date -u) deadline $(date -u -d @$DEADLINE_TS +%H:%M) ===" >> /tmp/tpu_queue.log

# 1) bench on the chip (skipped once the log is staged)
if [ ! -f artifacts/bench/bench_r4_tpu_validation.log ]; then
  run_watched bench /tmp/bench_r4.log 600 2 \
    timeout 700 python bench.py
  stage_all
fi

# 2) config-4 at 1024^2 (ref: 1024-spp bdpt, chunk-resumable)
if [ ! -f artifacts/config4/cove_1024_equal_time_180s.json ]; then
  run_watched config4 /tmp/config4_1024.log 1800 4 \
    timeout 10800 python -m spcbpt_tpu.apps.benchmark \
      --scene interior_cove --dim 1024x1024 --ref-alg bdpt --ref-spp 1024 \
      --ref-chunk 64 --ref-check-spp 256 \
      --equal-time 180 --algs pt,bdpt,spcbpt --repeats 3 \
      --train-samples 2000000 --ref-npz /root/repo/.jax_cache/cove_ref1024_bdpt.npz \
      --checkpoint /root/repo/.jax_cache/cove_ck1024.npz --json /tmp/config4_1024.json \
      --save-images /tmp/config4_1024_imgs
  stage_all
  echo "[queue] === config4 done $(date -u) ===" >> /tmp/tpu_queue.log
fi

# 3) frame-cost with the real trained checkpoint (VERDICT #5)
if [ ! -f artifacts/config4/frame_cost_256_tpu_trained.json ]; then
  run_watched frame_cost_trained /tmp/frame_cost_trained.log 900 2 \
    timeout 1800 python tools/tpu_jobs/frame_cost.py /tmp/frame_cost_256_trained.json
  stage_all
fi

# 3.5) fallback checkpoint if config-4 died before saving
if [ ! -f /root/repo/.jax_cache/cove_ck1024.npz ]; then
  run_watched ck_fallback /tmp/ck_fallback.log 1800 2 \
    timeout 7200 python -m spcbpt_tpu.apps.benchmark \
      --scene interior_cove --dim 1024x1024 --ref-spp 1 --spp 1 \
      --algs spcbpt --train-samples 2000000 \
      --checkpoint /root/repo/.jax_cache/cove_ck1024.npz --json /tmp/ck_fallback.json
fi

# 4) config-5: 2048^2 ref (resumable) then equal-time via shard_map path
if [ ! -f artifacts/config5/cove_2048_equal_time_300s.json ]; then
  if [ ! -f /root/repo/.jax_cache/cove_ref2048.npz ]; then
    run_watched ref2048 /tmp/ref2048.log 1800 4 \
      timeout 5400 python tools/tpu_jobs/gen_ref_2048.py 96
  fi
  run_watched config5 /tmp/config5_tpu.log 1800 3 \
    timeout 5400 python -m spcbpt_tpu.apps.multichip_bench \
      --scene interior_cove --dim 2048x2048 --platform default --meshes 1x1 \
      --max-depth 12 --light-paths-per-chip 65536 --equal-time 300 \
      --checkpoint /root/repo/.jax_cache/cove_ck1024.npz --ref-npz /root/repo/.jax_cache/cove_ref2048.npz \
      --json /tmp/config5_tpu.json
  stage_all
  echo "[queue] === config5 done $(date -u) ===" >> /tmp/tpu_queue.log
fi

# 5) house showcase at 512^2
if [ ! -f artifacts/house/house_512_equal_time_60s.json ]; then
  run_watched house /tmp/house_eq.log 1800 3 \
    timeout 7200 python -m spcbpt_tpu.apps.benchmark \
      --scene house \
      --dim 512x512 --ref-alg bdpt --ref-spp 1024 --ref-chunk 64 \
      --ref-check-spp 256 \
      --equal-time 60 --algs pt,bdpt,spcbpt --repeats 3 --train-samples 2000000 \
      --ref-npz /root/repo/.jax_cache/house_ref512.npz --checkpoint /root/repo/.jax_cache/house_ck.npz \
      --json /tmp/house_eq.json --save-images /tmp/house_eq_imgs
  stage_all
  echo "[queue] === house done $(date -u) ===" >> /tmp/tpu_queue.log
fi

# 6) NN A/B if time remains
if [ ! -f artifacts/config4/nn_ab_cove256_48spp_tpu.json ]; then
  run_watched nn_ab /tmp/nn_ab_tpu.log 1800 2 \
    timeout 10800 python tools/tpu_jobs/nn_ab.py
  stage_all
fi
echo "[queue] === r4c queue done $(date -u) ===" >> /tmp/tpu_queue.log
