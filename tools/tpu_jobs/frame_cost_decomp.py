"""Frame-cost decomposition + tradeoff sweep for VERDICT r4 item 5
(trained SPCBPT <= 2x PT per spp at 256^2).

Three phases, all on interior_cove at 256^2 with the trained 1024 checkpoint:
  A. decomposition: pt | light-trace | lt+LVC-build | eye-only (conn 0)
     | conn 1 | conn 3 (fixed sampler) | full frame (lt+build+conn3)
  B. light-path sweep: full-frame ms/spp at lp in {4096, 8192, 16384}
     (reference ratio M/pixels = 100k/1.92M = 0.052 -> 3.4k at 256^2,
      optixPathTracer.cpp:84-89,462-467; ours has been 16384 = 0.25)
  C. equal-time quality: relMSE at 30 s for candidate configs vs the
     4x4-box-downsampled 1024^2 BDPT reference (unbiased: pixel mean of an
     unbiased estimate over the same camera footprint)

Writes the JSON table to argv[1] (default /tmp/frame_cost_decomp.json).
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax

if os.environ.get("DECOMP_CPU"):  # CPU smoke mode (tiny shapes, no chip)
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from spcbpt_tpu.runtime import setup
setup()

from spcbpt_tpu.checkpoint import load_subspace_state
from spcbpt_tpu.render import light_trace, lvc, pt_pool, spcbpt_pool
from spcbpt_tpu.render.common import accumulate
from spcbpt_tpu.scene.interior import default_scene_path
from spcbpt_tpu.scene.scene import load_trace_scene
from spcbpt_tpu.utils.image import rel_mse

W = H = 256
REPS = 5
CK = "/root/repo/.jax_cache/cove_ck1024.npz"
REF1024 = "/root/repo/.jax_cache/cove_ref1024_bdpt.npz"

ts, desc, cam = load_trace_scene(default_scene_path(mode="cove"))
cam.aspect = 1.0
eye, U, V, Wv = cam.uvw()
ss = load_subspace_state(CK)
out = {"dim": f"{W}x{H}", "state": CK, "platform": jax.default_backend(),
       "decomp": {}, "lp_sweep": {}, "equal_time": {}}


def bench(label, one, store):
    jax.block_until_ready(one(0))
    t0 = time.time()
    for i in range(REPS):
        r = one(i + 1)
    jax.block_until_ready(r)
    ms = (time.time() - t0) / REPS * 1e3
    store[label] = round(ms, 1)
    print(f"[decomp] {label}: {ms:.1f} ms", flush=True)
    return ms


def lt_fn(lp):
    return jax.jit(lambda f: light_trace.trace_light_paths(
        ts, ss, lp, f, max_depth=8))


# ---- phase A: decomposition at lp=16384 ----
lt16 = lt_fn(16384)
build = lvc.make_builder(ss)
bench("pt", lambda s: pt_pool.render_pool_jit(
    ts, eye, U, V, Wv, W, H, 1, s, max_depth=12), out["decomp"])
bench("light_trace", lambda s: lt16(jnp.uint32(s)), out["decomp"])
bench("lt_plus_build", lambda s: build(lt16(jnp.uint32(s)), jnp.uint32(s)),
      out["decomp"])
fixed = build(lt16(jnp.uint32(1)), jnp.uint32(1))
jax.block_until_ready(fixed)
for cn in (0, 1, 3):
    bench(f"eye_conn{cn}", lambda s, cn=cn: spcbpt_pool.render_pool_jit(
        ts, ss, fixed, eye, U, V, Wv, W, H, 1, s, max_depth=12,
        connection_n=cn, uniform=False), out["decomp"])
bench("full_conn3", lambda s: spcbpt_pool.render_pool_jit(
    ts, ss, build(lt16(jnp.uint32(s)), jnp.uint32(s)), eye, U, V, Wv,
    W, H, 1, s, max_depth=12, connection_n=3, uniform=False), out["decomp"])
out["decomp"]["ratio_full3_over_pt"] = round(
    out["decomp"]["full_conn3"] / out["decomp"]["pt"], 2)

# ---- phase B: lp sweep, full frame conn3 ----
for lp in (4096, 8192):
    ltp = lt_fn(lp)
    bench(f"full_conn3_lp{lp}", lambda s: spcbpt_pool.render_pool_jit(
        ts, ss, build(ltp(jnp.uint32(s)), jnp.uint32(s)), eye, U, V, Wv,
        W, H, 1, s, max_depth=12, connection_n=3, uniform=False),
        out["lp_sweep"])
out["lp_sweep"]["full_conn3_lp16384"] = out["decomp"]["full_conn3"]

# ---- phase C: equal-time quality vs downsampled 1024 ref ----
ref = np.load(REF1024)["img"].reshape(1024, 1024, 3)
ref = ref.reshape(256, 4, 256, 4, 3).mean(axis=(1, 3)).reshape(-1, 3)
BUDGET = 30.0
REPEATS = 3  # odd -> sorted[len//2] is a true median (ADVICE r4)


def equal_time(label, lp, cn):
    ltp = lt_fn(lp)

    def one(s_local, base, acc):
        # base decorrelates the renderer/sampler seeds between repeats;
        # the accumulator running-mean index must be the LOCAL sample
        # index (ADVICE r4 high: passing base+s weighted every rep>0
        # sample by ~1e-6 and left the frame near-black).
        seed = base + s_local
        sampler = build(ltp(jnp.uint32(seed + 7919)), jnp.uint32(seed))
        fs, ct = spcbpt_pool.render_pool_jit(
            ts, ss, sampler, eye, U, V, Wv, W, H, 1, seed, max_depth=12,
            connection_n=cn, uniform=False)
        return accumulate(acc, fs / jnp.maximum(ct[:, None], 1), s_local)

    # warm-up/compile OUTSIDE the budget and DISCARDED from the
    # accumulator (ADVICE r4: the old code kept one free sample).
    jax.block_until_ready(one(0, 999_999_937, jnp.zeros((W * H, 3))))
    reps = []
    for r in range(REPEATS):
        base = r * 1_000_003
        acc = jnp.zeros((W * H, 3))
        t0 = time.time()
        s = 0
        while True:
            acc = one(s, base, acc)
            s += 1
            jax.block_until_ready(acc)
            if time.time() - t0 > BUDGET:
                break
        e = rel_mse(np.asarray(acc), ref, discard=0.001)
        reps.append({"relmse": e, "spp": s, "seconds": time.time() - t0})
        print(f"[eqt] {label}[{r}]: relMSE {e:.5f} at {s} spp", flush=True)
    med = sorted(x["relmse"] for x in reps)[len(reps) // 2]
    out["equal_time"][label] = {"relmse": med, "spp": reps[0]["spp"],
                                "lp": lp, "connection_n": cn, "reps": reps}


equal_time("lp16384_conn3", 16384, 3)
equal_time("lp8192_conn3", 8192, 3)
equal_time("lp4096_conn3", 4096, 3)
equal_time("lp16384_conn1", 16384, 1)
equal_time("lp4096_conn1", 4096, 1)

dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/frame_cost_decomp.json"
with open(dst, "w") as f:
    json.dump(out, f, indent=2)
print(f"[decomp] wrote {dst}", flush=True)
