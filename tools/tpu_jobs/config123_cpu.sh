#!/bin/bash
# Explicit committed artifacts for BASELINE configs 1-3 on the CPU backend
# (these configs are algorithm/correctness gates, not chip-perf gates; the
# test suite covers them statistically, this records quotable tables+PNGs).
# Waits for the house hedge to release the CPU first.
cd /root/repo
if [ -f /tmp/house_cpu_hedge.pid ]; then
  while kill -0 "$(cat /tmp/house_cpu_hedge.pid)" 2>/dev/null; do sleep 60; done
fi
mkdir -p artifacts/config1 artifacts/config2 artifacts/config3

# Config 1: Cornell box, unidirectional PT+NEE, 512x512, 64 spp
timeout 7200 python -m spcbpt_tpu.apps.benchmark \
  --scene cornell --dim 512x512 --platform cpu \
  --ref-alg pt --ref-spp 1024 --ref-chunk 128 \
  --spp 64 --algs pt --repeats 3 \
  --ref-npz /root/repo/.jax_cache/cornell_ref512_pt1024.npz \
  --json artifacts/config1/cornell_512_pt_64spp_cpu.json \
  --save-images artifacts/config1/imgs \
  > /tmp/config1_cpu.log 2>&1

# Config 2: classic BDPT (uniform vertex connection + MIS), Cornell, 1024x1024
timeout 10800 python -m spcbpt_tpu.apps.benchmark \
  --scene cornell --dim 1024x1024 --platform cpu \
  --ref-alg pt --ref-spp 256 --ref-chunk 64 \
  --spp 16 --algs pt,bdpt --repeats 3 \
  --ref-npz /root/repo/.jax_cache/cornell_ref1024_pt256.npz \
  --json artifacts/config2/cornell_1024_bdpt_16spp_cpu.json \
  --save-images artifacts/config2/imgs \
  > /tmp/config2_cpu.log 2>&1

# Config 3: SPCBPT with FIXED initial Gamma (contribution-integral init,
# no Adam) on the glossy interior scene, vs PT/BDPT at equal spp
timeout 10800 python -m spcbpt_tpu.apps.benchmark \
  --scene cornell_glossy --dim 256x256 --platform cpu \
  --ref-alg pt --ref-spp 2048 --ref-chunk 256 \
  --spp 16 --algs pt,bdpt,spcbpt --repeats 3 \
  --train-samples 200000 --gamma-epochs 0 \
  --ref-npz /root/repo/.jax_cache/glossy_ref256_pt2048.npz \
  --checkpoint /root/repo/.jax_cache/glossy_ck_fixed_gamma.npz \
  --json artifacts/config3/glossy_256_fixed_gamma_16spp_cpu.json \
  --save-images artifacts/config3/imgs \
  > /tmp/config3_cpu.log 2>&1

echo done > /tmp/config123_done
