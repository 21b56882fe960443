"""Benchmark entry: prints ONE JSON line for the driver.

Primary metric (BASELINE.md): software traversal throughput in
Mrays/sec/chip, target >= 50 on a v5e chip, measured on a >=10k-triangle
scene (VERDICT round 1: the round-1 number was brute force over a 32-tri
Cornell). Workload: closest-hit traversal of a full 1024x1024 camera
wavefront (32x32-pixel ray tiles) over the bundled ~33k-triangle interior
scene through the tiled two-level cluster traversal (ops/tile_trace.py),
steady-state over several iterations.
"""
from __future__ import annotations

import json
import sys
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from spcbpt_tpu.runtime import setup as _setup
    _setup()

    from spcbpt_tpu.scene.interior import default_scene_path
    from spcbpt_tpu.scene.scene import load_trace_scene
    from spcbpt_tpu.ops import bvh as bvh_mod
    from spcbpt_tpu.ops import clusters as cl_mod
    from spcbpt_tpu.ops import tile_trace
    from spcbpt_tpu.render.common import camera_rays

    ts, desc, cam = load_trace_scene(default_scene_path())
    width = height = 1024
    cam.aspect = 1.0
    eye, U, V, W = cam.uvw()
    n = width * height

    # camera-wavefront config: 32x32-pixel tiles, K=16 clusters
    flat = bvh_mod.build_bvh(np.asarray(ts.tri_p0), np.asarray(ts.tri_e1),
                             np.asarray(ts.tri_e2))
    order = flat.order
    cs = cl_mod.build_clusters(flat, np.asarray(ts.tri_p0)[order],
                               np.asarray(ts.tri_e1)[order],
                               np.asarray(ts.tri_e2)[order], max_tris=16)
    tmn = jnp.full((n,), 1e-3)
    tmx = jnp.full((n,), 1e16)

    @jax.jit
    def trace(frame):
        o, d, _ = camera_rays(eye, U, V, W, width, height, frame, block=32)
        hit = tile_trace.tile_closest(cs, o, d, tmn, tmx, True, tile=1024)
        return hit.t.sum(), (hit.tri >= 0).sum()

    out = trace(0)
    jax.block_until_ready(out)
    n_hits = int(out[1])
    assert n_hits > 0.9 * n, f"camera rays must hit the interior ({n_hits})"

    iters = 10
    t0 = time.time()
    for i in range(iters):
        out = trace(i + 1)
    jax.block_until_ready(out)
    dt = time.time() - t0
    mrays = n * iters / dt / 1e6

    # secondary metrics: the renderer-relevant numbers (incoherent bounce
    # wavefront through the row-walk kernel, and a real PT frame)
    extras = {}
    try:
        from spcbpt_tpu.ops import bsdf as bsdf_mod
        from spcbpt_tpu.ops import ray_walk
        from spcbpt_tpu.scene.scene import local_geometry, trace_closest
        from spcbpt_tpu.utils import rng as rng_mod

        nb = 1 << 17
        o1, d1, _ = camera_rays(eye, U, V, W, 512, 512, 0, block=16)
        hit = trace_closest(ts, o1[:nb], d1[:nb], 1e-3, 1e16, True)
        geom = local_geometry(ts, hit, o1[:nb], d1[:nb])
        st = rng_mod.seed(jnp.arange(nb, dtype=jnp.uint32), jnp.uint32(7))
        mat = bsdf_mod.gather_mat(ts.mats, geom["mat_id"], geom["base_color"])
        nd, _ = bsdf_mod.sample_bsdf(mat, geom["Ns"], -d1[:nb], st)
        perm = np.random.RandomState(0).permutation(nb)
        o2 = jnp.asarray(np.asarray(geom["P"])[perm])
        d2 = jnp.asarray(np.asarray(nd)[perm])
        tb = jnp.full((nb,), 1e-3)
        te = jnp.full((nb,), 1e16)
        cw = ts.clusters_walk
        if cw is not None:
            f2 = jax.jit(lambda: ray_walk.walk_closest(
                cw, o2, d2, tb, te, True, sort_rays=True).t.sum())
            jax.block_until_ready(f2())
            t0 = time.time()
            for _ in range(5):
                out2 = f2()
            jax.block_until_ready(out2)
            extras["secondary_mrays_walk"] = round(
                nb * 5 / (time.time() - t0) / 1e6, 2)

        from spcbpt_tpu.render import pt_pool
        fr = lambda s: pt_pool.render_pool_jit(ts, eye, U, V, W, 512, 512,
                                               1, s, max_depth=12)
        jax.block_until_ready(fr(0))
        t0 = time.time()
        for s in range(2):
            out3 = fr(s + 1)
        jax.block_until_ready(out3)
        extras["pt_ms_per_spp_512"] = round((time.time() - t0) / 2 * 1e3, 1)
    except Exception as e:  # secondary metrics must never sink the bench
        extras["extras_error"] = str(e)[:200]

    print(json.dumps({
        "metric": "traversal_throughput_33k_tris",
        "value": round(mrays, 2),
        "unit": "Mrays/s/chip",
        "vs_baseline": round(mrays / 50.0, 3),
        **extras,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
