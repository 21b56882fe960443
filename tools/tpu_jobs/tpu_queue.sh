#!/bin/bash
# Round-4 TPU job queue: waits for the axon tunnel, then runs each job with
# a log-staleness watchdog (stalled tunnel => kill job, wait, relaunch; the
# jobs checkpoint their progress so relaunches resume).
#
# Every job's outputs are STAGED into /root/repo/artifacts/ immediately
# after the job (even on partial failure): if this queue finishes after the
# interactive session ends, the driver's end-of-round commit still captures
# the results.
cd /root/repo

# Hard deadline: the driver runs bench.py at round end, and TPU access
# serializes across processes — a queue job still holding the chip would
# block the driver's bench into a timeout (the round-3 failure mode).
# Default: 20:50 UTC today. Override with QUEUE_DEADLINE_TS (epoch secs).
DEADLINE_TS=${QUEUE_DEADLINE_TS:-$(date -u -d "today 20:50" +%s)}

past_deadline() {
  [ "$(date +%s)" -ge "$DEADLINE_TS" ]
}

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
    wait_tpu
    echo "[queue] $(date -u +%H:%M:%S) start $name (try $try): $*" >> /tmp/tpu_queue.log
    setsid "$@" >> "$log" 2>&1 &
    local pid=$!
    while kill -0 $pid 2>/dev/null; do
      sleep 60
      if past_deadline; then
        echo "[queue] $(date -u +%H:%M:%S) DEADLINE — killing $name (pg $pid) to free the chip for the driver bench" >> /tmp/tpu_queue.log
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

# stage SRC DST — copy a result into the repo tree if it exists
stage() {
  if [ -e "$1" ]; then
    mkdir -p "$(dirname "$2")"
    cp -r "$1" "$2"
    echo "[queue] staged $1 -> $2" >> /tmp/tpu_queue.log
  fi
}

stage_all() {
  stage /tmp/frame_cost_256.json  artifacts/config4/frame_cost_256_tpu.json
  stage /tmp/config4_1024.json    artifacts/config4/cove_1024_equal_time_180s.json
  stage /tmp/config4_1024_imgs    artifacts/config4/imgs_1024
  stage /tmp/nn_ab.json           artifacts/config4/nn_ab_cove256_48spp_tpu.json
  stage /tmp/config5_tpu.json     artifacts/config5/cove_2048_equal_time_300s.json
  stage /tmp/house_eq.json        artifacts/house/house_512_equal_time_60s.json
  stage /tmp/house_eq_imgs        artifacts/house/imgs_512
  if [ -f /tmp/bench_r4.log ]; then
    mkdir -p artifacts/bench
    tail -40 /tmp/bench_r4.log > artifacts/bench/bench_r4_tpu_validation.log
  fi
  if [ -f /tmp/tpu_probe34.log ]; then
    mkdir -p artifacts/config4
    tail -60 /tmp/tpu_probe34.log > artifacts/config4/tpu_probe34.log
  fi
}

echo "[queue] === queue start $(date -u) ===" >> /tmp/tpu_queue.log

# 0) validate the restaged bench.py on the real chip FIRST (quick; the
# round's #1 deliverable is a driver-parsed >=50 Mrays/s line)
run_watched bench /tmp/bench_r4.log 600 3 \
  timeout 700 python bench.py
stage_all
echo "[queue] === bench done $(date -u) ===" >> /tmp/tpu_queue.log

# 0.2) Pallas-vs-XLA traversal A/B (short; Mosaic hang is caught by the
# 600 s staleness watchdog — 2 tries then move on)
run_watched pallas_ab /tmp/pallas_ab.log 600 2 \
  timeout 1500 python tools/tpu_jobs/pallas_ab.py /tmp/pallas_ab.json
stage /tmp/pallas_ab.json artifacts/bench/pallas_ab_tpu.json

# 0.5) per-spp frame-cost table post occlusion-mask change (VERDICT #5)
run_watched frame_cost /tmp/frame_cost.log 900 3 \
  timeout 1800 python tools/tpu_jobs/frame_cost.py
stage_all
echo "[queue] === frame_cost done $(date -u) ===" >> /tmp/tpu_queue.log

# 1) config-4: 1024^2 equal-time on cove (ref render resumes via .partial.npz)
run_watched config4 /tmp/config4_1024.log 1800 6 \
  timeout 18000 python -m spcbpt_tpu.apps.benchmark \
    --scene interior_cove --dim 1024x1024 --ref-alg bdpt --ref-spp 1024 \
    --ref-check-spp 1024 --equal-time 180 --algs pt,bdpt,spcbpt --repeats 3 \
    --train-samples 2000000 --ref-npz /root/repo/.jax_cache/cove_ref1024_bdpt.npz \
    --checkpoint /root/repo/.jax_cache/cove_ck1024.npz --json /tmp/config4_1024.json \
    --save-images /tmp/config4_1024_imgs
stage_all

# 2) NN A/B on the TPU (regenerates the 256^2 ref if /tmp was wiped)
run_watched nn_ab /tmp/nn_ab_tpu.log 1800 3 \
  timeout 14400 python tools/tpu_jobs/nn_ab.py
stage_all

# 2.2) frame-cost again, now with a real trained checkpoint (the masked
# occlusion cut's effect depends on the actual Gamma — VERDICT #5 evidence)
run_watched frame_cost_trained /tmp/frame_cost_trained.log 900 2 \
  timeout 1800 python tools/tpu_jobs/frame_cost.py /tmp/frame_cost_256_trained.json
stage /tmp/frame_cost_256_trained.json artifacts/config4/frame_cost_256_tpu_trained.json

# 2.5) fallback: if job 1 never saved the trained checkpoint, train one now
# (config-5 jobs 3+4 hard-require /root/repo/.jax_cache/cove_ck1024.npz)
if [ ! -f /root/repo/.jax_cache/cove_ck1024.npz ]; then
  run_watched ck_fallback /tmp/ck_fallback.log 1800 3 \
    timeout 7200 python -m spcbpt_tpu.apps.benchmark \
      --scene interior_cove --dim 1024x1024 --ref-spp 1 --spp 1 \
      --algs spcbpt --train-samples 2000000 \
      --checkpoint /root/repo/.jax_cache/cove_ck1024.npz --json /tmp/ck_fallback.json
fi

# 3) config-5 reference at 2048^2 (resumable; needs cove_ck1024 from job 1)
run_watched ref2048 /tmp/ref2048.log 1800 6 \
  timeout 14400 python tools/tpu_jobs/gen_ref_2048.py 96

# 4) config-5 equal-time on the real chip
run_watched config5 /tmp/config5_tpu.log 1800 4 \
  timeout 7200 python -m spcbpt_tpu.apps.multichip_bench \
    --scene interior_cove --dim 2048x2048 --platform default --meshes 1x1 \
    --max-depth 12 --light-paths-per-chip 65536 --equal-time 300 \
    --checkpoint /root/repo/.jax_cache/cove_ck1024.npz --ref-npz /root/repo/.jax_cache/cove_ref2048.npz \
    --json /tmp/config5_tpu.json
stage_all
echo "[queue] === queue done $(date -u) ===" >> /tmp/tpu_queue.log

# 5) parity artifact on the reference's own bundled scene (119k tris, env map)
run_watched house /tmp/house_eq.log 1800 4 \
  timeout 14400 python -m spcbpt_tpu.apps.benchmark \
    --scene house \
    --dim 512x512 --ref-alg bdpt --ref-spp 1024 --ref-chunk 64 \
    --ref-check-spp 512 \
    --equal-time 60 --algs pt,bdpt,spcbpt --repeats 3 --train-samples 2000000 \
    --ref-npz /root/repo/.jax_cache/house_ref512.npz --checkpoint /root/repo/.jax_cache/house_ck.npz \
    --json /tmp/house_eq.json --save-images /tmp/house_eq_imgs
stage_all
echo "[queue] === house done $(date -u) ===" >> /tmp/tpu_queue.log

# 7) TPU replication of the CPU per-spp probe (same seeds): discriminates
# realization luck vs a platform-systematic estimator difference
run_watched tpu_probe /tmp/tpu_probe34.log 1200 3 \
  timeout 7200 python tools/tpu_jobs/tpu_probe34.py
stage_all
echo "[queue] === tpu_probe done $(date -u) ===" >> /tmp/tpu_queue.log
