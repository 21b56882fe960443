"""Post-optimization frame-cost check (VERDICT r4 item 2).

Times pt / SPCBPT conn0/conn1/conn3 per-spp at 256^2 with the trained
checkpoint after the r5 cuts (light_hit_cached reuse of the RMIS update
products; pool presort removal). Companion to the committed decomposition
artifact (tools/tpu_jobs/frame_cost_decomp.py). Reference cost model:
__raygen__SPCBPT ~ pinhole + 3 occlusion rays (raygen.cu:319-443).

Writes JSON to argv[1] (default /tmp/frame_ms_r5.json).
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from spcbpt_tpu.runtime import setup
setup()

from spcbpt_tpu.checkpoint import load_subspace_state
from spcbpt_tpu.render import light_trace, lvc, pt_pool, spcbpt_pool
from spcbpt_tpu.scene.interior import default_scene_path
from spcbpt_tpu.scene.scene import load_trace_scene

W = H = 256
REPS = 5
CK = "/root/repo/.jax_cache/cove_ck1024.npz"

ts, desc, cam = load_trace_scene(default_scene_path(mode="cove"))
cam.aspect = 1.0
eye, U, V, Wv = cam.uvw()
ss = load_subspace_state(CK)
out = {"dim": f"{W}x{H}", "platform": jax.default_backend(), "ms": {}}

lt16 = jax.jit(lambda f: light_trace.trace_light_paths(
    ts, ss, 16384, f, max_depth=8))
build = lvc.make_builder(ss)
fixed = build(lt16(jnp.uint32(1)), jnp.uint32(1))
jax.block_until_ready(fixed)


def bench(label, fn):
    jax.block_until_ready(fn(0))
    t0 = time.time()
    for i in range(REPS):
        r = fn(i + 1)
    jax.block_until_ready(r)
    ms = (time.time() - t0) / REPS * 1e3
    out["ms"][label] = round(ms, 1)
    print(f"[frame_ms] {label}: {ms:.1f} ms", flush=True)


def spc(cn):
    return jax.jit(lambda s: spcbpt_pool.render_pool(
        ts, ss, fixed, (eye, U, V, Wv), W, H, 1, s, max_depth=12,
        connection_n=cn, uniform=False))


bench("pt", jax.jit(lambda s: pt_pool.render_pool(
    ts, (eye, U, V, Wv), W, H, 1, s, max_depth=12)))
bench("conn0", spc(0))
bench("conn1", spc(1))
bench("conn3", spc(3))

# the full SPCBPT frame = light trace + LVC build + eye pass
def full3(s):
    smp = build(lt16(jnp.uint32(s)), jnp.uint32(s))
    return spc(3)(s)

bench("light_trace_build", lambda s: build(lt16(jnp.uint32(s)),
                                           jnp.uint32(s)))
out["ms"]["full_conn3"] = round(out["ms"]["conn3"]
                                + out["ms"]["light_trace_build"], 1)
out["ratio_full3_over_pt"] = round(out["ms"]["full_conn3"]
                                   / out["ms"]["pt"], 2)
print(f"[frame_ms] full_conn3: {out['ms']['full_conn3']} ms "
      f"(ratio {out['ratio_full3_over_pt']}x pt)", flush=True)

dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/frame_ms_r5.json"
with open(dst, "w") as f:
    json.dump(out, f, indent=2)
print(f"[frame_ms] wrote {dst}", flush=True)
