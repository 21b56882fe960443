"""Config-5 reference re-grounding (VERDICT r4 item 4): validate the
trained-SPCBPT-as-reference PROTOCOL against an INDEPENDENT estimator.

The 2048^2 ground truth (`gen_ref_2048.py`, 96-spp trained SPCBPT) was only
energy-checked against 16-spp PT; a shared bias in the SPCBPT estimator
would be invisible.  This job renders the same view with classic BDPT
(uniform vertex connection, untrained state — none of the trained
Q/Gamma/classifier machinery) at 512^2 x high spp and compares it against
the trained-SPCBPT reference render:

  * if `.jax_cache/cove_ref2048.npz` exists, it is box-downsampled 4x
    (effective ~1536 spp at 512^2) — the original plan;
  * otherwise (cache wiped between sessions) the protocol is validated at
    512^2 directly: a fresh 96-spp trained-SPCBPT render, i.e. exactly the
    gen_ref_2048.py estimator/spp at the comparison resolution.  Estimator
    bias is what is being tested and it does not depend on resolution.

Resumable: both accumulations save partials every 32 spp.
Writes artifacts/config5/ref2048_crosscheck_bdpt512.json via argv[1].
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from spcbpt_tpu.runtime import setup as _setup
_setup()
from spcbpt_tpu.render import light_trace, lvc, spcbpt_pool
from spcbpt_tpu.scene.scene import load_trace_scene
from spcbpt_tpu.apps.render_cli import resolve_scene
from spcbpt_tpu.train import classify
from spcbpt_tpu.utils.image import rel_mse

W = H = 512
SPP = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
REF2048 = "/root/repo/.jax_cache/cove_ref2048.npz"
BDPT_OUT = "/root/repo/.jax_cache/cove_ref512_bdpt.npz"
PARTIAL = BDPT_OUT + ".partial.npz"
DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ref_crosscheck_512.json"

SPC_SPP = 96   # gen_ref_2048.py's spp, reproduced at 512^2 in fallback mode
SPC_OUT = "/root/repo/.jax_cache/cove_ref512_spcbpt96.npz"

ts, desc, cam = load_trace_scene(resolve_scene("interior_cove"))
cam.aspect = 1.0
eye, U, V, Wv = cam.uvw()


def _accumulate(out_npz, spp, render_one, tag):
    """Resumable on-device accumulation (partials every 32 spp)."""
    partial = out_npz + ".partial.npz"
    if os.path.exists(out_npz):
        print(f"[xcheck] reusing {out_npz}", flush=True)
        return np.load(out_npz)["img"]
    acc = np.zeros((W * H, 3))
    cnt = np.zeros((W * H,))
    s_start = 0
    if os.path.exists(partial):
        pz = np.load(partial)
        acc = pz["acc"].astype(np.float64)
        cnt = pz["cnt"].astype(np.float64)
        s_start = int(pz["spp_done"])
        print(f"[xcheck] {tag} resumed {s_start}/{spp} spp", flush=True)
    t0 = time.time()
    dacc = jnp.zeros((W * H, 3))
    dcnt = jnp.zeros((W * H,))
    for s in range(s_start, spp):
        fs, c = render_one(s)
        dacc = dacc + fs
        dcnt = dcnt + c
        if (s + 1) % 32 == 0 or s + 1 == spp:
            jax.block_until_ready(dacc)
            acc += np.asarray(dacc)
            cnt += np.asarray(dcnt)
            dacc = jnp.zeros((W * H, 3))
            dcnt = jnp.zeros((W * H,))
            np.savez_compressed(partial, acc=acc.astype(np.float32),
                                cnt=cnt.astype(np.float32), spp_done=s + 1)
            print(f"[xcheck] {tag} {s+1}/{spp} ({time.time()-t0:.0f}s)",
                  flush=True)
    img = (acc / np.maximum(cnt[:, None], 1)).astype(np.float32)
    np.savez_compressed(out_npz, img=img)
    if os.path.exists(partial):
        os.remove(partial)
    return img


# --- independent side: classic uniform-connection BDPT, untrained state ---
ss_u = classify.untrained_state()
lt_u = jax.jit(lambda f: light_trace.trace_light_paths(ts, ss_u, 65536, f,
                                                       max_depth=8))
build_u = lvc.make_builder(None)


def _bdpt_one(s):
    sampler = build_u(lt_u(jnp.uint32(5000 + s)), jnp.uint32(s))
    return spcbpt_pool.render_pool_jit(
        ts, ss_u, sampler, eye, U, V, Wv, W, H, 1, s,
        max_depth=12, uniform=True)


img_bdpt = _accumulate(BDPT_OUT, SPP, _bdpt_one, "bdpt")

# --- SPCBPT-protocol side ---
if os.path.exists(REF2048):
    ref = np.load(REF2048)["img"].reshape(2048, 2048, 3)
    ref_ds = ref.reshape(512, 4, 512, 4, 3).mean(axis=(1, 3)).reshape(-1, 3)
    spc_src = {"src": REF2048, "downsample": "4x4 box",
               "effective_spp_512": 96 * 16}
else:
    from spcbpt_tpu import checkpoint as ckpt_mod
    ss_t = ckpt_mod.load_subspace_state(
        "/root/repo/.jax_cache/cove_ck1024.npz")
    lt_t = jax.jit(lambda f: light_trace.trace_light_paths(
        ts, ss_t, 65536, f, max_depth=8))
    build_t = lvc.make_builder(ss_t)

    def _spc_one(s):
        sampler = build_t(lt_t(s + 7919), s)
        return spcbpt_pool.render_pool_jit(
            ts, ss_t, sampler, eye, U, V, Wv, W, H, 1, s, max_depth=12)

    ref_ds = _accumulate(SPC_OUT, SPC_SPP, _spc_one,
                         "spcbpt96").reshape(-1, 3)
    spc_src = {"src": SPC_OUT,
               "note": "2048^2 ref cache wiped between sessions; protocol "
                       "reproduced at 512^2 (same trained estimator, same "
                       "96 spp as gen_ref_2048.py)",
               "spp": SPC_SPP}

img_bdpt = img_bdpt.reshape(-1, 3)

out = {
    "what": "independent-estimator cross-check of the config-5 "
            "trained-SPCBPT reference protocol",
    "bdpt_ref": {"dim": "512x512", "spp": SPP,
                 "estimator": "uniform vertex connection (untrained), "
                              "lvc 65536 paths/spp"},
    "spcbpt_ref": spc_src,
    "relmse_spcbptref_vs_bdpt": rel_mse(ref_ds, img_bdpt, discard=0.001),
    "relmse_bdpt_vs_spcbptref": rel_mse(img_bdpt, ref_ds, discard=0.001),
    "mean_rgb_spcbpt_ref": [float(m) for m in ref_ds.mean(axis=0)],
    "mean_rgb_bdpt": [float(m) for m in img_bdpt.mean(axis=0)],
    "energy_rel_diff": float(abs(ref_ds.mean() / img_bdpt.mean() - 1.0)),
}
with open(DST, "w") as f:
    json.dump(out, f, indent=2)
print(json.dumps(out, indent=2), flush=True)
