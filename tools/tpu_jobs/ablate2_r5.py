"""Fine-grained per-connection cost ablation (round 5, after the fused
connection evaluator landed). Monkeypatches individual stages of the
connection path out (TIMING ONLY, estimator-breaking) to find where the
~104 ms/connection at 256^2 lives. Writes JSON to argv[1].
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
from spcbpt_tpu.render import light_trace, lvc, spcbpt_pool, rmis
from spcbpt_tpu.render import spcbpt as spcbpt_mod
from spcbpt_tpu.ops import bsdf as bsdf_mod
from spcbpt_tpu.scene.interior import default_scene_path
from spcbpt_tpu.scene.scene import load_trace_scene

import os
W = H = int(os.environ.get("ABL_DIM", 256))
REPS = int(os.environ.get("ABL_REPS", 5))
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

ORIG = dict(
    visibility=spcbpt_mod.visibility,
    first=spcbpt_mod.sample_first_stage,
    second_table=spcbpt_mod.sample_second_stage_table,
    second_mix=spcbpt_mod.sample_second_stage_mixture,
    unpack=spcbpt_mod.unpack_rows,
    fused=spcbpt_mod.connect_vertex_fused,
    rate=rmis.connect_rate,
    parts=rmis.rate_parts,
    wlight=rmis.tracing_weight_light,
    eval_b=bsdf_mod.eval_bsdf,
    pdf_pair=bsdf_mod.pdf_bsdf_pair,
)


def restore():
    spcbpt_mod.visibility = ORIG["visibility"]
    spcbpt_mod.sample_first_stage = ORIG["first"]
    spcbpt_mod.sample_second_stage_table = ORIG["second_table"]
    spcbpt_mod.sample_second_stage_mixture = ORIG["second_mix"]
    spcbpt_mod.unpack_rows = ORIG["unpack"]
    spcbpt_mod.connect_vertex_fused = ORIG["fused"]
    rmis.connect_rate = ORIG["rate"]
    rmis.rate_parts = ORIG["parts"]
    rmis.tracing_weight_light = ORIG["wlight"]
    bsdf_mod.eval_bsdf = ORIG["eval_b"]
    bsdf_mod.pdf_bsdf_pair = ORIG["pdf_pair"]


def apply(ablate):
    if "vis" in ablate:
        spcbpt_mod.visibility = lambda ts, a, b, eps, sort=None, mask=None: (
            jnp.ones(a.shape[:-1], bool))
    if "first" in ablate:
        def fake_first(ss, sub, state, position=None, normal=None):
            return (jnp.zeros(sub.shape, jnp.int32) + 300,
                    jnp.full(sub.shape, 1e-3), state)
        spcbpt_mod.sample_first_stage = fake_first
    if "second" in ablate:
        def fake_second(sampler, lsub, state):
            return (jnp.zeros(lsub.shape, jnp.int32),
                    jnp.full(lsub.shape, 1e-3),
                    jnp.ones(lsub.shape, bool), state)
        spcbpt_mod.sample_second_stage_table = fake_second
        spcbpt_mod.sample_second_stage_mixture = fake_second
    if "unpack" in ablate:
        orig_unpack = ORIG["unpack"]

        def fake_unpack(rows):
            one = orig_unpack(rows[:1])
            n = rows.shape[0]
            return jax.tree_util.tree_map(
                lambda a: jnp.broadcast_to(a, (n,) + a.shape[1:]), one)
        spcbpt_mod.unpack_rows = fake_unpack
    if "gamma" in ablate:
        rmis.connect_rate = lambda ss, e, l, lum: jnp.ones(
            jnp.broadcast_shapes(jnp.shape(e), jnp.shape(l)))
        rmis.rate_parts = lambda ss, e, l, lum: (
            jnp.ones(jnp.broadcast_shapes(jnp.shape(e), jnp.shape(l))),
            jnp.ones(jnp.broadcast_shapes(jnp.shape(e), jnp.shape(l))))
        rmis.tracing_weight_light = lambda ts, ss, last, mp: jnp.ones(
            last.single_pdf.shape)
    if "bsdf" in ablate:
        bsdf_mod.eval_bsdf = lambda mat, n, v, l: jnp.ones(n.shape)
        bsdf_mod.pdf_bsdf_pair = lambda mat, n, a, b: (
            jnp.ones(n.shape[:-1]), jnp.ones(n.shape[:-1]))
    if "fused" in ablate:
        spcbpt_mod.connect_vertex_fused = lambda ts, ss, e, l: jnp.ones(
            l.position.shape[:-1] + (3,))


def bench(label, fn):
    jax.block_until_ready(fn(0))
    t0 = time.time()
    for i in range(REPS):
        r = fn(i + 1)
    jax.block_until_ready(r)
    ms = (time.time() - t0) / REPS * 1e3
    out["ms"][label] = round(ms, 1)
    print(f"[ablate2] {label}: {ms:.1f} ms", flush=True)


def spc(cn, ablate=()):
    restore()
    apply(set(ablate))
    return jax.jit(lambda s: spcbpt_pool.render_pool(
        ts, ss, fixed, (eye, U, V, Wv), W, H, 1, s, max_depth=12,
        connection_n=cn, uniform=False))


bench("conn3_full", spc(3))
bench("conn3_no_vis", spc(3, ["vis"]))
bench("conn3_no_first", spc(3, ["first"]))
bench("conn3_no_second", spc(3, ["second"]))
bench("conn3_no_sampling", spc(3, ["first", "second"]))
bench("conn3_no_unpack", spc(3, ["unpack"]))
bench("conn3_no_gamma", spc(3, ["gamma"]))
bench("conn3_no_bsdf", spc(3, ["bsdf"]))
bench("conn3_no_fused", spc(3, ["fused"]))
bench("conn3_bare", spc(3, ["fused", "first", "second", "unpack", "vis"]))
restore()

dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ablate2_r5.json"
with open(dst, "w") as f:
    json.dump(out, f, indent=2)
print(f"[ablate2] wrote {dst}", flush=True)
