"""Pallas-vs-XLA traversal A/B on the real chip (ROADMAP perf item 1a).

Round-2 note says Mosaic remote compiles hung this environment's compile
service; this job retests that and, if the kernel compiles, times
ops/pallas_walk.walk_closest against ops/ray_walk.walk_closest on the
bench workload (33k-tri interior, 512x512 coherent camera wavefront +
a shuffled incoherent bounce wavefront). The queue's log-staleness
watchdog kills us if Mosaic still hangs. Writes argv[1]
(default /tmp/pallas_ab.json).
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from spcbpt_tpu.runtime import setup as _setup
_setup()

from spcbpt_tpu.ops import bvh as bvh_mod
from spcbpt_tpu.ops import clusters as cl_mod
from spcbpt_tpu.ops import pallas_walk, ray_walk
from spcbpt_tpu.render.common import camera_rays
from spcbpt_tpu.scene.interior import default_scene_path
from spcbpt_tpu.scene.scene import load_trace_scene

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pallas_ab.json"

ts, desc, cam = load_trace_scene(default_scene_path())
cam.aspect = 1.0
eye, U, V, W = cam.uvw()
print(f"[ab] backend {jax.default_backend()}, tris {ts.tri_p0.shape[0]}",
      flush=True)

flat = bvh_mod.build_bvh(np.asarray(ts.tri_p0), np.asarray(ts.tri_e1),
                         np.asarray(ts.tri_e2))
order = flat.order
cs = cl_mod.build_clusters(flat, np.asarray(ts.tri_p0)[order],
                           np.asarray(ts.tri_e1)[order],
                           np.asarray(ts.tri_e2)[order], max_tris=128)
n = 512 * 512
o, d, _ = camera_rays(eye, U, V, W, 512, 512, 0, block=32)
tmn = jnp.full((n,), 1e-3)
tmx = jnp.full((n,), 1e16)
perm = np.random.RandomState(0).permutation(n)
o_inc = jnp.asarray(np.asarray(o)[perm])
d_inc = jnp.asarray(np.asarray(d)[perm])

out = {"tris": int(ts.tri_p0.shape[0]), "rays": n,
       "backend": jax.default_backend()}


def bench(label, fn, iters=5):
    t0 = time.time()
    r = fn()
    jax.block_until_ready(r)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        r = fn()
    jax.block_until_ready(r)
    mrays = n * iters / (time.time() - t0) / 1e6
    out[label] = {"mrays_per_s": round(mrays, 2),
                  "compile_s": round(compile_s, 1)}
    print(f"[ab] {label}: {mrays:.1f} Mrays/s (compile {compile_s:.0f}s)",
          flush=True)
    return r


hx = bench("xla_walk_coherent", lambda: ray_walk.walk_closest(
    cs, o, d, tmn, tmx, True, sort_rays=True))
bench("xla_walk_incoherent", lambda: ray_walk.walk_closest(
    cs, o_inc, d_inc, tmn, tmx, True, sort_rays=True))
print("[ab] compiling pallas kernel (watchdog kills us if Mosaic hangs)...",
      flush=True)
hp = bench("pallas_walk_coherent", lambda: pallas_walk.walk_closest(
    cs, o, d, tmn, tmx, True, sort_rays=True))
bench("pallas_walk_incoherent", lambda: pallas_walk.walk_closest(
    cs, o_inc, d_inc, tmn, tmx, True, sort_rays=True))

agree = float(jnp.mean((hx.tri == hp.tri).astype(jnp.float32)))
t_close = float(jnp.mean((jnp.abs(hx.t - hp.t)
                          <= 1e-3 * jnp.maximum(1.0, jnp.abs(hx.t)))
                         .astype(jnp.float32)))
out["agreement"] = {"tri_id_match": round(agree, 5),
                    "t_within_1e3_rel": round(t_close, 5)}
print(f"[ab] agreement: tri {agree:.4f}, t {t_close:.4f}", flush=True)

with open(OUT, "w") as f:
    json.dump(out, f, indent=2)
print(f"[ab] wrote {OUT}", flush=True)
