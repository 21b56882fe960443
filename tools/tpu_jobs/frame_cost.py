"""Per-spp frame-cost table on the real chip (VERDICT r4 item 5 criterion:
trained SPCBPT <= 2x PT per spp at 256^2 after the occlusion-mask change).

Measures steady-state ms/spp on interior_cove at 256^2 for:
  - pt_pool (the baseline)
  - spcbpt_pool, trained two-stage sampler, connection_n=3
    (checkpoint if /tmp/cove_ck_256.npz exists, else a synthetic
    trained-shaped state — same code paths, same cost)
Writes /tmp/frame_cost_256.json and prints the table.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from spcbpt_tpu.runtime import setup
setup()

from spcbpt_tpu.scene.interior import default_scene_path
from spcbpt_tpu.scene.scene import load_trace_scene
from spcbpt_tpu.render import light_trace, lvc, pt_pool, spcbpt_pool
from spcbpt_tpu.train import classify

W = H = 256
REPS = 6
LIGHT_PATHS = 16384

ts, desc, cam = load_trace_scene(default_scene_path(mode="cove"))
cam.aspect = 1.0
eye, U, V, Wv = cam.uvw()

# prefer a real trained checkpoint (the contribution-masking rate in the
# occlusion wavefront depends on the actual Gamma/classifier, so synthetic
# states under- or over-state the VERDICT-5 cut); queue runs this job twice:
# before config-4 (synthetic) and after (trained)
_CKS = ["/root/repo/.jax_cache/cove_ck1024.npz",
        "/tmp/cove_ck_256.npz", "/root/repo/.jax_cache/cove_ck256_v2.npz"]
ck = next((p for p in _CKS if os.path.exists(p)), None)
if ck is not None:
    from spcbpt_tpu.checkpoint import load_subspace_state
    ss = load_subspace_state(ck)
    src = ck
else:
    ss = classify.synthetic_trained_state(ts, seed=3)
    src = "synthetic_trained_state"
print(f"[frame_cost] state: {src} (second_stage={ss.second_stage})", flush=True)

out = {"dim": f"{W}x{H}", "state": src, "light_paths": LIGHT_PATHS,
       "platform": jax.default_backend()}


def bench(label, one):
    jax.block_until_ready(one(0))
    t0 = time.time()
    for i in range(REPS):
        r = one(i + 1)
    jax.block_until_ready(r)
    ms = (time.time() - t0) / REPS * 1e3
    out[label] = round(ms, 1)
    print(f"[frame_cost] {label}: {ms:.0f} ms/spp", flush=True)
    return ms


ms_pt = bench("pt_ms_per_spp", lambda s: pt_pool.render_pool_jit(
    ts, eye, U, V, Wv, W, H, 1, s, max_depth=12))

lt = jax.jit(lambda f: light_trace.trace_light_paths(
    ts, ss, LIGHT_PATHS, f, max_depth=8))
build = lvc.make_builder(ss)
ms_sp = bench("spcbpt_ms_per_spp", lambda s: spcbpt_pool.render_pool_jit(
    ts, ss, build(lt(jnp.uint32(s)), jnp.uint32(s)), eye, U, V, Wv,
    W, H, 1, s, max_depth=12, connection_n=3, uniform=False))

out["ratio_spcbpt_over_pt"] = round(ms_sp / ms_pt, 2)
print(f"[frame_cost] ratio spcbpt/pt = {out['ratio_spcbpt_over_pt']}",
      flush=True)
dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/frame_cost_256.json"
with open(dst, "w") as f:
    json.dump(out, f, indent=2)
print(f"[frame_cost] wrote {dst}", flush=True)
