#!/bin/bash
# Committed artifacts for BASELINE configs 1-3 on the real chip (TPU
# variant of config123_cpu.sh — same protocols, chip wall-clock).
cd /root/repo
mkdir -p artifacts/config1 artifacts/config2 artifacts/config3

# Config 1: Cornell box, unidirectional PT+NEE, 512x512, 64 spp
timeout 1800 python -m spcbpt_tpu.apps.benchmark \
  --scene cornell --dim 512x512 \
  --ref-alg pt --ref-spp 1024 --ref-chunk 128 \
  --spp 64 --algs pt --repeats 3 \
  --ref-npz /root/repo/.jax_cache/cornell_ref512_pt1024.npz \
  --json artifacts/config1/cornell_512_pt_64spp_tpu.json \
  --save-images artifacts/config1/imgs \
  > /tmp/config1_tpu.log 2>&1
echo "config1 rc=$?"

# Config 2: classic BDPT (uniform vertex connection + MIS), Cornell, 1024x1024
timeout 2700 python -m spcbpt_tpu.apps.benchmark \
  --scene cornell --dim 1024x1024 \
  --ref-alg pt --ref-spp 256 --ref-chunk 64 \
  --spp 16 --algs pt,bdpt --repeats 3 \
  --ref-npz /root/repo/.jax_cache/cornell_ref1024_pt256.npz \
  --json artifacts/config2/cornell_1024_bdpt_16spp_tpu.json \
  --save-images artifacts/config2/imgs \
  > /tmp/config2_tpu.log 2>&1
echo "config2 rc=$?"

# Config 3: SPCBPT with FIXED initial Gamma (contribution-integral init,
# no Adam) on the glossy interior scene, vs PT/BDPT at equal spp
timeout 3600 python -m spcbpt_tpu.apps.benchmark \
  --scene cornell_glossy --dim 256x256 \
  --ref-alg pt --ref-spp 2048 --ref-chunk 256 \
  --spp 16 --algs pt,bdpt,spcbpt --repeats 3 \
  --train-samples 200000 --gamma-epochs 0 \
  --ref-npz /root/repo/.jax_cache/glossy_ref256_pt2048.npz \
  --checkpoint /root/repo/.jax_cache/glossy_ck_fixed_gamma.npz \
  --json artifacts/config3/glossy_256_fixed_gamma_16spp_tpu.json \
  --save-images artifacts/config3/imgs \
  > /tmp/config3_tpu.log 2>&1
echo "config3 rc=$?"
echo done > /tmp/config123_tpu_done
