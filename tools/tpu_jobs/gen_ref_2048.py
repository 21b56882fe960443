"""Config-5 reference: trained-SPCBPT accumulation at 2048^2 on the TPU,
with an independent-PT energy cross-check. Writes /root/repo/.jax_cache/cove_ref2048.npz.
Resumable: partial accumulation saved every 8 spp to .partial.npz."""
import os
import time, sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from spcbpt_tpu.runtime import setup as _setup
_setup()
from spcbpt_tpu import checkpoint as ckpt_mod
from spcbpt_tpu.render import light_trace, lvc, pt_pool, spcbpt_pool
from spcbpt_tpu.scene.scene import load_trace_scene
from spcbpt_tpu.apps.render_cli import resolve_scene
from spcbpt_tpu.train import classify

W = H = 2048
SPP = int(sys.argv[1]) if len(sys.argv) > 1 else 96
OUT = "/root/repo/.jax_cache/cove_ref2048.npz"
PARTIAL = OUT + ".partial.npz"
ts, desc, cam = load_trace_scene(resolve_scene("interior_cove"))
cam.aspect = 1.0
eye, U, V, Wv = cam.uvw()
ss = ckpt_mod.load_subspace_state("/root/repo/.jax_cache/cove_ck1024.npz")
print(f"[ref2048] spcbpt {SPP} spp, second stage '{ss.second_stage}'", flush=True)
lt = jax.jit(lambda f: light_trace.trace_light_paths(ts, ss, 65536, f, max_depth=8))
build = lvc.make_builder(ss)
acc = np.zeros((W * H, 3)); cnt = np.zeros((W * H,))
s_start = 0
if os.path.exists(PARTIAL):
    pz = np.load(PARTIAL)
    acc = pz["acc"].astype(np.float64); cnt = pz["cnt"].astype(np.float64)
    s_start = int(pz["spp_done"])
    print(f"[ref2048] resumed {s_start}/{SPP} spp", flush=True)
t0 = time.time()
# accumulate ON DEVICE between checkpoints: per-spp np.asarray is ~67 MB of
# device->host traffic per spp at 2048^2, which dominates wall-clock on
# remote-tunnel TPU setups (same fix as benchmark.render_ref_chunk)
dacc = jnp.zeros((W * H, 3)); dcnt = jnp.zeros((W * H,))
for s in range(s_start, SPP):
    sampler = build(lt(s + 7919), s)
    fs, c = spcbpt_pool.render_pool_jit(ts, ss, sampler, eye, U, V, Wv,
                                        W, H, 1, s, max_depth=12)
    dacc = dacc + fs; dcnt = dcnt + c
    if (s + 1) % 8 == 0 or s + 1 == SPP:
        jax.block_until_ready(dacc)
        acc += np.asarray(dacc); cnt += np.asarray(dcnt)
        dacc = jnp.zeros((W * H, 3)); dcnt = jnp.zeros((W * H,))
        np.savez_compressed(PARTIAL, acc=acc.astype(np.float32),
                            cnt=cnt.astype(np.float32), spp_done=s + 1)
        print(f"[ref2048] {s+1}/{SPP} ({time.time()-t0:.0f}s)", flush=True)
img = (acc / np.maximum(cnt[:, None], 1)).astype(np.float32)
np.savez_compressed(OUT, img=img)
os.remove(PARTIAL)
print(f"[ref2048] saved; mean {img.mean():.5f} ({time.time()-t0:.0f}s)", flush=True)

# energy cross-check: independent PT
daccp = jnp.zeros((W * H, 3)); dcntp = jnp.zeros((W * H,))
t0 = time.time()
for s in range(16):
    fs, c = pt_pool.render_pool_jit(ts, eye, U, V, Wv, W, H, 1, 777000 + s,
                                    max_depth=12)
    daccp = daccp + fs; dcntp = dcntp + c
jax.block_until_ready(daccp)
pt_img = np.asarray(daccp) / np.maximum(np.asarray(dcntp)[:, None], 1)
print(f"[check] PT 16spp mean {pt_img.mean():.5f} vs ref {img.mean():.5f} "
      f"(rel {abs(pt_img.mean()/img.mean()-1):.4f}) ({time.time()-t0:.0f}s)",
      flush=True)
