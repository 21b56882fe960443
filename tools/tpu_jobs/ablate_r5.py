"""Ablation profile for VERDICT r4 item 2 (SPCBPT per-spp <= 2x PT).

Times the trained-checkpoint SPCBPT pool renderer at 256^2 with individual
cost sources monkeypatched out (estimator-breaking, TIMING ONLY), to find
where the eye_conn0 overhead (281 vs 171 ms in frame_cost_decomp) and the
~110 ms/connection live. Reference cost model: __raygen__SPCBPT ~ pinhole +
3 occlusion rays (raygen.cu:319-443).

Writes JSON to argv[1] (default /tmp/ablate_r5.json).
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
from spcbpt_tpu.render import light_trace, lvc, pt_pool, spcbpt_pool, rmis
from spcbpt_tpu.render import spcbpt as spcbpt_mod
from spcbpt_tpu.scene.interior import default_scene_path
from spcbpt_tpu.scene import scene as scene_mod
from spcbpt_tpu.scene.scene import load_trace_scene
from spcbpt_tpu.train import classify

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

# saved originals
ORIG = dict(
    label_eye=classify.label_eye, label_light=classify.label_light,
    light_hit=rmis.light_hit, upd=rmis.tracing_update_eye,
    wk_pool=spcbpt_pool.wavefront_key,
    connect_vertex=spcbpt_mod.connect_vertex,
    visibility=spcbpt_mod.visibility,
    general=rmis.general_connection, source=rmis.connection_light_source,
)


def restore():
    classify.label_eye = ORIG["label_eye"]
    classify.label_light = ORIG["label_light"]
    rmis.light_hit = ORIG["light_hit"]
    rmis.tracing_update_eye = ORIG["upd"]
    spcbpt_pool.wavefront_key = ORIG["wk_pool"]
    spcbpt_mod.connect_vertex = ORIG["connect_vertex"]
    spcbpt_mod.visibility = ORIG["visibility"]
    rmis.general_connection = ORIG["general"]
    rmis.connection_light_source = ORIG["source"]


def apply(ablate):
    if "classify" in ablate:
        classify.label_eye = lambda ss, p, n: jnp.zeros(p.shape[:-1], jnp.int32)
        classify.label_light = lambda ss, p, n: jnp.zeros(p.shape[:-1], jnp.int32)
    if "light_hit" in ablate:
        rmis.light_hit = lambda ts, ss, v, p, n, f, pdf, sub: jnp.ones(
            v.single_pdf.shape)
    if "update" in ablate:
        rmis.tracing_update_eye = lambda ts, ss, last, mp, md: (
            jnp.zeros(mp.shape[:-1] + (3,)), jnp.zeros(mp.shape[:-1]))
    if "presort" in ablate:
        spcbpt_pool.wavefront_key = lambda ts, o, d: None
    if "conn_eval" in ablate:
        spcbpt_mod.connect_vertex = lambda ts, ss, e, l: jnp.ones(
            l.position.shape[:-1] + (3,))
    if "conn_vis" in ablate:
        spcbpt_mod.visibility = lambda ts, a, b, eps, sort=None, mask=None: (
            jnp.ones(a.shape[:-1], bool))
    if "conn_rmis" in ablate:
        rmis.general_connection = lambda ts, ss, e, l: jnp.ones(
            l.single_pdf.shape)
        rmis.connection_light_source = lambda ts, ss, e, l: jnp.ones(
            l.single_pdf.shape)


def bench(label, fn):
    jax.block_until_ready(fn(0))
    t0 = time.time()
    for i in range(REPS):
        r = fn(i + 1)
    jax.block_until_ready(r)
    ms = (time.time() - t0) / REPS * 1e3
    out["ms"][label] = round(ms, 1)
    print(f"[ablate] {label}: {ms:.1f} ms", flush=True)


def spc(cn, ablate=()):
    restore()
    apply(set(ablate))
    f = jax.jit(lambda s: spcbpt_pool.render_pool(
        ts, ss, fixed, (eye, U, V, Wv), W, H, 1, s, max_depth=12,
        connection_n=cn, uniform=False))
    return f


bench("pt", jax.jit(lambda s: pt_pool.render_pool(
    ts, (eye, U, V, Wv), W, H, 1, s, max_depth=12)))
bench("conn0_full", spc(0))
bench("conn0_no_classify", spc(0, ["classify"]))
bench("conn0_no_light_hit", spc(0, ["light_hit"]))
bench("conn0_no_update", spc(0, ["update"]))
bench("conn0_no_presort", spc(0, ["presort"]))
bench("conn0_bare", spc(0, ["classify", "light_hit", "update"]))
bench("conn3_full", spc(3))
bench("conn3_no_vis", spc(3, ["conn_vis"]))
bench("conn3_no_eval", spc(3, ["conn_eval"]))
bench("conn3_no_rmis", spc(3, ["conn_rmis"]))
bench("conn1_full", spc(1))
restore()

dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ablate_r5.json"
with open(dst, "w") as f:
    json.dump(out, f, indent=2)
print(f"[ablate] wrote {dst}", flush=True)
