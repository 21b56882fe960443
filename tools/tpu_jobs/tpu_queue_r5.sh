#!/bin/bash
# Round-5 TPU job queue (VERDICT r4 tasks 2/4/5/6 evidence):
#   1. config-2/3 rerun with the contention sentinel (task 5: decontaminated
#      timings, loadavg provenance per repeat)
#   2. frame-cost regen (task 2 evidence: per-spp ratio after the round-5
#      fused-connection + cached-MIS cuts; was 3.96x in the committed table)
#   3. config-5 reference cross-check vs independent BDPT 512^2 (task 4)
#   4. house showcase at 1024^2, BDPT-ref protocol + PNGs (task 6)
#   5. config-5 2048^2 equal-time rerun (timer-fixed budget accounting,
#      round-5 renderer)
#   6. (CPU, after the chip work) 1024^2 virtual-mesh row 1x2-vs-4x2 with
#      sub_blocks>1 (task 4: sub_blocks x multi-tile exercised at scale)
#
# Jobs overwrite committed artifacts, so skip-guards are /tmp done-markers,
# not artifact existence. Same watchdog/staging pattern as tpu_queue_r4c.sh.
cd /root/repo

DEADLINE_TS=${QUEUE_DEADLINE_TS:-$(( $(date +%s) + 14400 ))}

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
  stage /tmp/config2_r5.json        artifacts/config2/cornell_1024_bdpt_16spp_tpu.json
  stage /tmp/config2_r5_imgs        artifacts/config2/imgs
  stage /tmp/config3_r5.json        artifacts/config3/glossy_256_fixed_gamma_16spp_tpu.json
  stage /tmp/config3_r5_imgs        artifacts/config3/imgs
  stage /tmp/frame_cost_256_r5.json artifacts/config4/frame_cost_256_tpu_trained.json
  stage /tmp/ref_crosscheck_512.json artifacts/config5/ref2048_crosscheck_bdpt512.json
  stage /tmp/house_1024.json        artifacts/house/house_1024_equal_time_120s.json
  stage /tmp/house_1024_imgs        artifacts/house/imgs_1024
  stage /tmp/config5_r5.json        artifacts/config5/cove_2048_equal_time_300s.json
  stage /tmp/mesh_row_1024.json     artifacts/config5/cove_1024_mesh_row_4x2_subblocks.json
}

echo "[queue] === r5 queue start $(date -u) deadline $(date -u -d @$DEADLINE_TS +%H:%M) ===" >> /tmp/tpu_queue.log

# 1) config-2 rerun (decontaminated timings)
if [ ! -f /tmp/r5q_config2.done ]; then
  rm -f /tmp/config2_r5.json
  run_watched config2 /tmp/config2_r5.log 900 2 \
    timeout 2700 python -m spcbpt_tpu.apps.benchmark \
      --scene cornell --dim 1024x1024 \
      --ref-alg pt --ref-spp 256 --ref-chunk 64 \
      --spp 16 --algs pt,bdpt --repeats 3 \
      --ref-npz /root/repo/.jax_cache/cornell_ref1024_pt256.npz \
      --json /tmp/config2_r5.json --save-images /tmp/config2_r5_imgs \
    && touch /tmp/r5q_config2.done
  stage_all
fi

# 2) config-3 rerun (decontaminated timings)
if [ ! -f /tmp/r5q_config3.done ]; then
  rm -f /tmp/config3_r5.json
  run_watched config3 /tmp/config3_r5.log 900 2 \
    timeout 3600 python -m spcbpt_tpu.apps.benchmark \
      --scene cornell_glossy --dim 256x256 \
      --ref-alg pt --ref-spp 2048 --ref-chunk 256 \
      --spp 16 --algs pt,bdpt,spcbpt --repeats 3 \
      --train-samples 200000 --gamma-epochs 0 \
      --ref-npz /root/repo/.jax_cache/glossy_ref256_pt2048.npz \
      --checkpoint /root/repo/.jax_cache/glossy_ck_fixed_gamma.npz \
      --json /tmp/config3_r5.json --save-images /tmp/config3_r5_imgs \
    && touch /tmp/r5q_config3.done
  stage_all
fi

# 3) frame-cost regen with the round-5 renderer
if [ ! -f /tmp/r5q_frame_cost.done ]; then
  rm -f /tmp/frame_cost_256_r5.json
  run_watched frame_cost /tmp/frame_cost_r5.log 900 2 \
    timeout 1800 python tools/tpu_jobs/frame_cost.py /tmp/frame_cost_256_r5.json \
    && touch /tmp/r5q_frame_cost.done
  stage_all
fi

# 4) config-5 ref cross-check (resumable BDPT 512^2 x 1024 spp)
if [ ! -f /tmp/r5q_xcheck.done ]; then
  run_watched xcheck /tmp/ref_crosscheck.log 900 3 \
    timeout 5400 python tools/tpu_jobs/ref_crosscheck_512.py /tmp/ref_crosscheck_512.json 1024 \
    && touch /tmp/r5q_xcheck.done
  stage_all
fi

# 5) house showcase at 1024^2 (resumable BDPT ref; PT energy check)
if [ ! -f /tmp/r5q_house.done ]; then
  rm -f /tmp/house_1024.json
  run_watched house1024 /tmp/house_1024.log 1800 3 \
    timeout 10800 python -m spcbpt_tpu.apps.benchmark \
      --scene house \
      --dim 1024x1024 --ref-alg bdpt --ref-spp 1024 --ref-chunk 32 \
      --ref-check-spp 256 \
      --equal-time 120 --algs pt,bdpt,spcbpt --repeats 3 --train-samples 2000000 \
      --ref-npz /root/repo/.jax_cache/house_ref1024_bdpt.npz \
      --checkpoint /root/repo/.jax_cache/house_ck.npz \
      --json /tmp/house_1024.json --save-images /tmp/house_1024_imgs \
    && touch /tmp/r5q_house.done
  stage_all
fi

# 6) config-5 equal-time rerun (fixed budget accounting, round-5 renderer)
if [ ! -f /tmp/r5q_config5.done ]; then
  rm -f /tmp/config5_r5.json
  run_watched config5 /tmp/config5_r5.log 1200 2 \
    timeout 4200 python -m spcbpt_tpu.apps.multichip_bench \
      --scene interior_cove --dim 2048x2048 --platform default --meshes 1x1 \
      --max-depth 12 --light-paths-per-chip 65536 --equal-time 300 \
      --sub-blocks 8 \
      --checkpoint /root/repo/.jax_cache/cove_ck1024.npz \
      --ref-npz /root/repo/.jax_cache/cove_ref2048.npz \
      --json /tmp/config5_r5.json \
    && touch /tmp/r5q_config5.done
  stage_all
fi

# 7) CPU virtual-mesh row at 1024^2 (no chip needed; runs last so it cannot
#    starve a chip job's dispatch loop on this 1-core host)
if [ ! -f /tmp/r5q_meshrow.done ]; then
  rm -f /tmp/mesh_row_1024.json
  echo "[queue] $(date -u +%H:%M:%S) start mesh_row (CPU)" >> /tmp/tpu_queue.log
  timeout 7200 python -m spcbpt_tpu.apps.multichip_bench \
    --scene interior_cove --dim 1024x1024 --platform cpu --cpu-devices 8 \
    --meshes 1x2,4x2 --subframes 1 --mesh-algs pt,spcbpt --sub-blocks 4 \
    --max-depth 8 --light-paths-per-chip 8192 \
    --checkpoint /root/repo/.jax_cache/cove_ck1024.npz \
    --json /tmp/mesh_row_1024.json > /tmp/mesh_row_1024.log 2>&1 \
    && touch /tmp/r5q_meshrow.done
  echo "[queue] $(date -u +%H:%M:%S) mesh_row rc=$?" >> /tmp/tpu_queue.log
  stage_all
fi

echo "[queue] === r5 queue done $(date -u) ===" >> /tmp/tpu_queue.log
