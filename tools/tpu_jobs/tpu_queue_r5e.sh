#!/bin/bash
# Round-5 session-6 follow-on: the concurrent CPU checkpoint training was ~10x
# too slow for its 20-min cap (pretrace ~28 paths/s on the contended 1-core
# host), so the mesh row's checkpoint is trained ON THE CHIP as soon as the
# house job releases it, then the 1024^2 virtual-mesh row runs on the CPU
# backend with the trained two-stage sampler (VERDICT item 4b, trained path).
cd /root/repo

log() { echo "[r5e] $(date -u +%H:%M:%S) $*" >> /tmp/tpu_queue.log; }

stage() {
  if [ -e "$1" ]; then
    mkdir -p "$(dirname "$2")"
    cp -r "$1" "$2"
    log "staged $1 -> $2"
  fi
}

log "waiting for house1024 to release the chip"
while ps -p "$(cat /tmp/queue_r5d.pid 2>/dev/null || echo 0)" > /dev/null 2>&1; do
  [ -f /tmp/r5q_house1024.done ] && break
  sleep 30
done
log "chip free (house done=$([ -f /tmp/r5q_house1024.done ] && echo yes || echo no))"

CK=/root/repo/.jax_cache/cove_ck_meshrow.npz
if [ ! -f "$CK" ]; then
  log "start cove ck training on the chip (300k samples)"
  timeout 1500 python -m spcbpt_tpu.apps.benchmark \
    --scene interior_cove --dim 256x256 \
    --ref-spp 1 --spp 1 --algs spcbpt --train-samples 300000 \
    --checkpoint "$CK" \
    --json /tmp/ck_meshrow.json > /tmp/ck_meshrow.log 2>&1
  log "ck training rc=$?"
fi

rm -f /tmp/mesh_row_1024.json
CKARG=""; [ -f "$CK" ] && CKARG="--checkpoint $CK"
[ -f "$CK" ] || log "WARNING mesh row running UNTRAINED"
log "start mesh_row (CPU, 1024^2, trained=$([ -f "$CK" ] && echo yes || echo no))"
timeout 5400 python -m spcbpt_tpu.apps.multichip_bench \
  --scene interior_cove --dim 1024x1024 --platform cpu --cpu-devices 8 \
  --meshes 1x2,4x2 --subframes 1 --mesh-algs pt,spcbpt --sub-blocks 4 \
  --max-depth 8 --light-paths-per-chip 8192 --single-run \
  $CKARG \
  --json /tmp/mesh_row_1024.json > /tmp/mesh_row_1024.log 2>&1 \
  && touch /tmp/r5e_meshrow.done
log "mesh_row rc=$?"
stage /tmp/mesh_row_1024.json artifacts/config5/cove_1024_mesh_row_4x2_subblocks.json
log "=== r5e done ==="
