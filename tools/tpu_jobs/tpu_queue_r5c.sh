#!/bin/bash
# Round-5 session-5 TPU queue. The VM reset between sessions wiped
# .jax_cache/ (all checkpoints + cached reference renders), so the r5 queue's
# remaining jobs are re-planned to fit the final session's wall clock, ordered
# so that every job that STARTS can also FINISH before the deadline:
#
#   1. ck_cove    — retrain the cove 1024^2 checkpoint (input of jobs 3/4/5
#                   and of the CPU mesh row)                         ~20 min
#   2. xcheck     — VERDICT item 4a: independent uniform-BDPT 512^2 render
#                   vs the trained-SPCBPT reference protocol (fresh 96-spp
#                   512^2 trained render — the 2048^2 ref cache is gone;
#                   estimator bias does not depend on resolution)    ~27 min
#   3. house1024  — VERDICT item 6: house at 1024^2, BDPT-ref protocol
#                   (ref-spp 512 at 1024^2 — fits the session; recorded in
#                   the artifact), PT energy check, PNGs             ~70 min
#   4. ref2048    — regenerate the 2048^2 trained-SPCBPT ref (stretch)
#   5. config5    — 2048^2 equal-time rerun, fixed budget accounting
#                   (stretch; needs job 4)
#
# The 1024^2 CPU virtual-mesh row (item 4b) is NOT here: it contends with the
# chip jobs' host dispatch loop on this 1-core box; it is run manually after
# the queue's deadline.
cd /root/repo

DEADLINE_TS=${QUEUE_DEADLINE_TS:-$(( $(date +%s) + 8100 ))}

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
  stage /tmp/ref_crosscheck_512.json artifacts/config5/ref2048_crosscheck_bdpt512.json
  stage /tmp/house_1024.json        artifacts/house/house_1024_equal_time_120s.json
  stage /tmp/house_1024_imgs        artifacts/house/imgs_1024
  stage /tmp/config5_r5.json        artifacts/config5/cove_2048_equal_time_300s.json
}

echo "[queue] === r5c queue start $(date -u) deadline $(date -u -d @$DEADLINE_TS +%H:%M) ===" >> /tmp/tpu_queue.log

# 1) cove 1024^2 checkpoint (cache wiped; inputs of xcheck fallback, ref2048,
#    config5 and the CPU mesh row)
if [ ! -f /root/repo/.jax_cache/cove_ck1024.npz ]; then
  run_watched ck_cove /tmp/ck_cove.log 1200 2 \
    timeout 2700 python -m spcbpt_tpu.apps.benchmark \
      --scene interior_cove --dim 1024x1024 --ref-spp 1 --spp 1 \
      --algs spcbpt --train-samples 2000000 \
      --checkpoint /root/repo/.jax_cache/cove_ck1024.npz \
      --json /tmp/ck_cove.json
fi

# 2) config-5 ref cross-check (VERDICT 4a; resumable both sides)
if [ ! -f /tmp/r5q_xcheck.done ]; then
  rm -f /tmp/ref_crosscheck_512.json
  run_watched xcheck /tmp/ref_crosscheck.log 900 3 \
    timeout 3600 python tools/tpu_jobs/ref_crosscheck_512.py /tmp/ref_crosscheck_512.json 512 \
    && touch /tmp/r5q_xcheck.done
  stage_all
fi

# 3) house showcase at 1024^2 (VERDICT 6; resumable BDPT ref; PT energy check)
if [ ! -f /tmp/r5q_house.done ]; then
  rm -f /tmp/house_1024.json
  run_watched house1024 /tmp/house_1024.log 1800 3 \
    timeout 7200 python -m spcbpt_tpu.apps.benchmark \
      --scene house \
      --dim 1024x1024 --ref-alg bdpt --ref-spp 512 --ref-chunk 32 \
      --ref-check-spp 128 \
      --equal-time 120 --algs pt,bdpt,spcbpt --repeats 3 --train-samples 2000000 \
      --ref-npz /root/repo/.jax_cache/house_ref1024_bdpt.npz \
      --checkpoint /root/repo/.jax_cache/house_ck.npz \
      --json /tmp/house_1024.json --save-images /tmp/house_1024_imgs \
    && touch /tmp/r5q_house.done
  stage_all
fi

# 4) 2048^2 trained-SPCBPT ref regen (stretch; resumable every 8 spp)
if [ ! -f /root/repo/.jax_cache/cove_ref2048.npz ]; then
  run_watched ref2048 /tmp/ref2048.log 900 3 \
    timeout 5400 python tools/tpu_jobs/gen_ref_2048.py 96
fi

# 5) config-5 equal-time rerun (stretch; fixed budget accounting)
if [ ! -f /tmp/r5q_config5.done ] && [ -f /root/repo/.jax_cache/cove_ref2048.npz ]; then
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

echo "[queue] === r5c queue done $(date -u) ===" >> /tmp/tpu_queue.log
