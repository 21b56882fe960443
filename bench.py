"""Benchmark entry: prints ONE JSON line for the driver.

Primary metric (BASELINE.md): software traversal throughput in
Mrays/sec/chip, target >= 50 on a v5e chip. Measured as closest-hit traversal
of a full camera-ray wavefront (1024x1024) against the Cornell scene through
the default traversal path (fused brute-force for VMEM-scale scenes, skip-link
BVH for large ones), steady-state over several iterations.
"""
from __future__ import annotations

import json
import sys
import time


def main():
    import jax
    import jax.numpy as jnp
    from spcbpt_tpu.runtime import setup as _setup
    _setup()

    from spcbpt_tpu.scene.cornell import default_scene_path
    from spcbpt_tpu.scene.scene import load_trace_scene, trace_closest
    from spcbpt_tpu.render.common import camera_rays

    ts, desc, cam = load_trace_scene(default_scene_path())
    width = height = 1024
    cam.aspect = 1.0
    eye, U, V, W = cam.uvw()

    @jax.jit
    def trace(frame):
        o, d, state = camera_rays(eye, U, V, W, width, height, frame)
        hit = trace_closest(ts, o, d, 1e-3, 1e16, True)
        return hit.t.sum(), hit.tri.sum()

    # warmup/compile
    jax.block_until_ready(trace(0))

    iters = 10
    t0 = time.time()
    for i in range(iters):
        out = trace(i + 1)
    jax.block_until_ready(out)
    dt = time.time() - t0
    rays = width * height * iters
    mrays = rays / dt / 1e6

    print(json.dumps({
        "metric": "bvh_traversal_throughput",
        "value": round(mrays, 2),
        "unit": "Mrays/s/chip",
        "vs_baseline": round(mrays / 50.0, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
