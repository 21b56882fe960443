"""Probe spp 34..47 of the cove 256^2 SPCBPT render for fireflies: per-spp
film mean and max pixel luminance. Explains the 48-spp relMSE blowup if one
sample draws a huge-weight connection."""
import sys, time
import jax
pass  # default platform: the real TPU
sys.path.insert(0, "/root/repo")
import numpy as np
import jax.numpy as jnp
from spcbpt_tpu import checkpoint as ckpt_mod
from spcbpt_tpu.render import light_trace, lvc, spcbpt_pool
from spcbpt_tpu.scene.scene import load_trace_scene
from spcbpt_tpu.apps.render_cli import resolve_scene

W = H = 256
ts, desc, cam = load_trace_scene(resolve_scene("interior_cove"))
cam.aspect = 1.0
eye, U, V, Wv = cam.uvw()
import os
_CKS = ["/tmp/cove_ck256_ts.npz", "/root/repo/.jax_cache/cove_ck256_v2.npz",
        "/root/repo/.jax_cache/cove_ck1024.npz"]
_ck = next((p for p in _CKS if os.path.exists(p)), None)
if _ck is None:
    sys.exit("[probe] no checkpoint found in " + ", ".join(_CKS))
print(f"[probe] checkpoint {_ck}", flush=True)
ss = ckpt_mod.load_subspace_state(_ck)
lt = jax.jit(lambda f: light_trace.trace_light_paths(ts, ss, 65536, f, max_depth=8))
build = lvc.make_builder(ss)
if not os.path.exists("/root/repo/.jax_cache/cove_ref256_ts.npz"):
    sys.exit("[probe] missing /root/repo/.jax_cache/cove_ref256_ts.npz (run nn_ab job first)")
ref = np.load("/root/repo/.jax_cache/cove_ref256_ts.npz")["img"]
acc = np.zeros((W*H,3)); cnt = np.zeros((W*H,))
for s in range(0, 48):
    t0=time.time()
    sampler = build(lt(s + 7919), s)
    fs, c = spcbpt_pool.render_pool_jit(ts, ss, sampler, eye, U, V, Wv,
                                        W, H, 1, s, max_depth=12)
    jax.block_until_ready(fs)
    f = np.asarray(fs); cc = np.asarray(c)
    img1 = f / np.maximum(cc[:,None],1)
    acc += f; cnt += cc
    from spcbpt_tpu.utils.image import rel_mse
    run = rel_mse(acc/np.maximum(cnt[:,None],1), ref, discard=0.001)
    print(f"spp {s}: mean {img1.mean():.4f} max {img1.max():.1f} "
          f"runrel {run:.4f} ({time.time()-t0:.0f}s)", flush=True)
