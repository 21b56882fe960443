import time, jax, jax.numpy as jnp, numpy as np
from spcbpt_tpu.runtime import setup; setup()
from spcbpt_tpu.scene.scene import load_trace_scene, local_geometry, trace_closest
from spcbpt_tpu.apps.render_cli import resolve_scene
from spcbpt_tpu.ops import bvh as bvh_mod, clusters as cl_mod, tile_trace, pallas_walk
from spcbpt_tpu.ops import bsdf as bsdf_mod
from spcbpt_tpu.render.common import camera_rays
from spcbpt_tpu.utils import rng as rng_mod

ts, desc, cam = load_trace_scene(resolve_scene("interior"))
cam.aspect = 1.0
eye, U, V, W = cam.uvw()
N = 1 << 17
cs32 = ts.clusters

flat = bvh_mod.build_bvh(np.asarray(ts.tri_p0), np.asarray(ts.tri_e1),
                         np.asarray(ts.tri_e2))
order = flat.order
cs128 = cl_mod.build_clusters(flat, np.asarray(ts.tri_p0)[order],
                              np.asarray(ts.tri_e1)[order],
                              np.asarray(ts.tri_e2)[order], max_tris=128)
print(f"C32={cs32.num_clusters} C128={cs128.num_clusters}", flush=True)

o, d, _ = camera_rays(eye, U, V, W, 512, 512, 0, block=16)
o = o[:N]; d = d[:N]
hit = trace_closest(ts, o, d, 1e-3, 1e16, True)
geom = local_geometry(ts, hit, o, d)
state = rng_mod.seed(jnp.arange(N, dtype=jnp.uint32), jnp.uint32(7))
mat = bsdf_mod.gather_mat(ts.mats, geom["mat_id"], geom["base_color"])
nd, state = bsdf_mod.sample_bsdf(mat, geom["Ns"], -d, state)
perm = np.random.RandomState(0).permutation(N)
o2u = jnp.asarray(np.asarray(geom["P"])[perm])
d2u = jnp.asarray(np.asarray(nd)[perm])
tmn = jnp.full((N,), 1e-3); tmx = jnp.full((N,), 1e16)

def bench(fn, label, iters=5):
    t0 = time.time()
    out = fn(); jax.block_until_ready(out)
    c = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    ms = (time.time() - t0) / iters * 1e3
    print(f"{label:52s} {ms:8.1f} ms ({N/ms/1e3:6.2f} Mrays/s) [c {c:.0f}s]",
          flush=True)
    return out

# note: cs32.tri_begin indexes the same reordered tri array as cs128 (same BVH)
h_ref = jax.jit(lambda: tile_trace.tile_closest(cs32, o, d, tmn, tmx, True,
                                                tile=256))()
for cs, kn in ((cs32, 32), (cs128, 128)):
    for tile in (128, 256):
        f = jax.jit(lambda cs=cs, tile=tile: pallas_walk.walk_closest(
            cs, o, d, tmn, tmx, True, tile=tile))
        h = bench(f, f"camera walk K={kn} tile={tile}")
        agree = (np.asarray(h.tri) == np.asarray(h_ref.tri)).mean()
        tfin = np.isfinite(np.asarray(h.t)).all
        print(f"  tri agree vs XLA: {agree:.5f}", flush=True)

for cs, kn in ((cs32, 32), (cs128, 128)):
    for tile in (128, 256):
        f = jax.jit(lambda cs=cs, tile=tile: pallas_walk.walk_closest(
            cs, o2u, d2u, tmn, tmx, True, tile=tile, sort_rays=True))
        bench(f, f"secondary walk K={kn} tile={tile} (sorted)")
f = jax.jit(lambda: pallas_walk.walk_any(
    cs128, o2u, d2u, tmn, jnp.full((N,), 3.0), tile=256, sort_rays=True))
bench(f, "secondary walk_any K=128 tmax=3 (sorted)")
# correctness of secondary (against XLA tile path)
h_ref2 = jax.jit(lambda: tile_trace.tile_closest(
    cs32, o2u, d2u, tmn, tmx, True, tile=256, sort_rays=True))()
h2 = jax.jit(lambda: pallas_walk.walk_closest(
    cs128, o2u, d2u, tmn, tmx, True, tile=256, sort_rays=True))()
agree = (np.asarray(h2.tri) == np.asarray(h_ref2.tri)).mean()
print(f"secondary tri agree K=128 vs XLA K=32: {agree:.5f}", flush=True)
