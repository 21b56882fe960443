"""Config-5 shape proof on the virtual CPU mesh: compile + execute ONE
subframe of the sharded BDPT and trained-SPCBPT renderers at the real
2048x2048 target shape over a 4x2 (tile,spp) mesh, recording compile and
execute wall-clock and the film mean (finite, >0 gate).

This is a correctness/compile artifact, not a perf number: CPU wall-clock
says nothing about the chip, but "the 2048^2 sharded program compiles and
executes" removes the scale risk VERDICT r3 weak #3 flagged. Writes the
JSON given as argv[1] (default /tmp/config5_shape_proof.json).

Usage: python tools/tpu_jobs/config5_shape_proof.py [out.json] [WxH] [ckpt]
"""
import json
import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp

from spcbpt_tpu.runtime import setup as _setup
_setup()

from spcbpt_tpu import checkpoint as ckpt_mod
from spcbpt_tpu.apps.render_cli import resolve_scene
from spcbpt_tpu.parallel import tile as par
from spcbpt_tpu.scene.scene import load_trace_scene
from spcbpt_tpu.train import classify

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/config5_shape_proof.json"
DIM = sys.argv[2] if len(sys.argv) > 2 else "2048x2048"
CK = sys.argv[3] if len(sys.argv) > 3 else None
W, H = map(int, DIM.lower().split("x"))

ts, desc, cam = load_trace_scene(resolve_scene("interior_cove"))
cam.aspect = W / H
uvw = cam.uvw()
if CK and os.path.exists(CK):
    ss = ckpt_mod.load_subspace_state(CK)
    src = CK
else:
    ss = classify.synthetic_trained_state(ts, seed=3)
    src = "synthetic_trained_state"
print(f"[proof] {DIM} over 4x2 mesh, state {src}", flush=True)

mesh = par.make_mesh(jax.devices()[:8], tile=4, spp=2)
out = {"dim": DIM, "mesh": "4x2", "platform": "cpu-virtual",
       "state": src, "light_paths_per_chip": 8192, "algs": {}}
for alg, uniform in (("bdpt", True), ("spcbpt", False)):
    fn = jax.jit(lambda ts_, ss_, uniform=uniform: par.sharded_spcbpt_render(
        ts_, ss_, uvw, W, H, 0, mesh, 8192, max_depth=12, uniform=uniform))
    t0 = time.time()
    img = fn(ts, ss)
    jax.block_until_ready(img)
    compile_s = time.time() - t0
    m = float(jnp.mean(img))
    finite = bool(jnp.all(jnp.isfinite(img)))
    out["algs"][alg] = {"compile_and_first_subframe_s": round(compile_s, 1),
                        "film_mean": m, "finite": finite,
                        "pixels": W * H}
    print(f"[proof] {alg}: {compile_s:.0f}s, mean {m:.5f}, finite {finite}",
          flush=True)
    assert finite and m > 0.0 and math.isfinite(m), f"{alg} shape proof failed"

with open(OUT, "w") as f:
    json.dump(out, f, indent=2)
print(f"[proof] wrote {OUT}", flush=True)
