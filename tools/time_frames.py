import time, jax, jax.numpy as jnp, numpy as np
from spcbpt_tpu.runtime import setup; setup()
from spcbpt_tpu.scene.scene import load_trace_scene
from spcbpt_tpu.apps.render_cli import resolve_scene
from spcbpt_tpu.render import light_trace, lvc, pt_pool, spcbpt_pool
from spcbpt_tpu.train import classify

W = H = 512
ts, desc, cam = load_trace_scene(resolve_scene("interior"))
cam.aspect = 1.0
eye, U, V, Wv = cam.uvw()
ss = classify.untrained_state()

def t_pt():
    def one(s):
        return pt_pool.render_pool_jit(ts, eye, U, V, Wv, W, H, 1, s, max_depth=12)
    jax.block_until_ready(one(0))
    t0=time.time(); [jax.block_until_ready(one(i+1)) for i in range(4)]
    print(f"pt: {(time.time()-t0)/4*1000:.0f} ms/spp", flush=True)

def t_bd(lp, label, uniform=True):
    lt = jax.jit(lambda f: light_trace.trace_light_paths(ts, ss, lp, f, max_depth=8))
    build = jax.jit(lvc.build_sampler)
    def one(s):
        sampler = build(lt(s))
        return spcbpt_pool.render_pool_jit(ts, ss, sampler, eye, U, V, Wv, W, H, 1, s, max_depth=12, uniform=uniform)
    jax.block_until_ready(one(0))
    t0=time.time(); [jax.block_until_ready(one(i+1)) for i in range(4)]
    print(f"{label} lp={lp}: {(time.time()-t0)/4*1000:.0f} ms/spp", flush=True)

t_pt()
t_bd(16384, "bdpt")
t_bd(65536, "bdpt")
