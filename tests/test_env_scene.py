"""End-to-end environment-map lighting: synthetic HDR sky + floor scene.

Covers the env chain the unit tests exercise piecewise: HDR load -> CMF build
(with the reference's v=(1+sin(elevation))/2 mapping) -> uniform light pick
including the env slot -> env NEE in the PT integrator -> miss radiance."""
import os

import numpy as np
import jax.numpy as jnp
import pytest


@pytest.fixture(scope="module")
def env_scene(tmp_path_factory):
    root = tmp_path_factory.mktemp("envscene")
    d = os.path.join(root, "env")
    os.makedirs(d, exist_ok=True)
    h, w = 16, 32
    rgb = np.full((h, w, 3), 0.05, np.float32)
    # sun texel pointing UP: v = (1+sin(elevation))/2, so up = high rows
    rgb[13, 8] = [200, 180, 150]
    maxc = rgb.max(axis=-1)
    exp = np.ceil(np.log2(np.maximum(maxc, 1e-30))).astype(np.int32) + 1
    scale = np.exp2(exp - 8)
    rgbe = np.zeros((h, w, 4), np.uint8)
    rgbe[..., :3] = np.clip(rgb / scale[..., None], 0, 255).astype(np.uint8)
    rgbe[..., 3] = (exp + 128).astype(np.uint8)
    with open(os.path.join(d, "sky.hdr"), "wb") as f:
        f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        f.write(f"-Y {h} +X {w}\n".encode())
        f.write(rgbe.tobytes())
    with open(os.path.join(d, "floor.obj"), "w") as f:
        f.write("v -5 0 -5\nv -5 0 5\nv 5 0 5\nv 5 0 -5\nf 1 2 3\nf 1 3 4\n")
    with open(os.path.join(d, "scene.scene"), "w") as f:
        f.write("""
properties
{
    width 48
    height 48
}
cameraSetting
{
    eye 0 3 -8
    lookat 0 1 0
    fov 45
    env_file env/sky.hdr
    env_lum 1.0
}
material White
{
    color 0.7 0.7 0.7
    roughness 0.6
    metallic 0.0
}
light
{
    position -0.5 4.0 -0.5
    v1 0.5 4.0 -0.5
    v2 -0.5 4.0 0.5
    emission 5 5 5
    type Quad
    divLevel 4
}
mesh
{
    file env/floor.obj
    material White
}
""")
    return os.path.join(d, "scene.scene")


def test_env_lit_floor(env_scene):
    from spcbpt_tpu.render import pt
    from spcbpt_tpu.render.common import accumulate
    from spcbpt_tpu.scene.scene import load_trace_scene

    ts, desc, cam = load_trace_scene(env_scene)
    assert ts.has_env
    assert ts.num_lights == 2  # quad + env slot (LightSource_shift parity)
    # env present shifts quad ssBase to half the reserved block
    assert int(ts.lights.ss_base[0]) == 100

    eye, U, V, W = cam.uvw()
    acc = jnp.zeros((48 * 48, 3))
    for s in range(12):
        acc = accumulate(acc, pt.render_frame_jit(ts, eye, U, V, W,
                                                  48, 48, s, 5), s)
    a = np.asarray(acc)
    assert np.isfinite(a).all()
    # the warm sun dominates: overall tint must follow (200, 180, 150)
    mean = a.mean(0)
    assert mean[0] > mean[1] > mean[2] > 0.05, mean
    ratio = mean / mean[0]
    np.testing.assert_allclose(ratio, [1.0, 180 / 200, 150 / 200], atol=0.08)


def test_env_spcbpt_matches_pt(env_scene):
    """SPCBPT-family env completeness (beyond reference parity — the
    reference drops env radiance on its SPCBPT miss path, raygen.cu:699):
    BDPT-uniform with env escape + env-LVC connections must estimate the
    same image as PT."""
    import jax
    from spcbpt_tpu.render import light_trace, lvc, pt, spcbpt
    from spcbpt_tpu.render.common import accumulate
    from spcbpt_tpu.scene.scene import load_trace_scene
    from spcbpt_tpu.train import classify

    ts, desc, cam = load_trace_scene(env_scene)
    eye, U, V, W = cam.uvw()
    ss = classify.untrained_state()
    W_ = H_ = 24
    spp = 24
    lt = jax.jit(lambda f: light_trace.trace_light_paths(ts, ss, 2048, f,
                                                         max_depth=6))
    build = jax.jit(lvc.build_sampler)
    acc_pt = jnp.zeros((W_ * H_, 3))
    acc_bd = jnp.zeros((W_ * H_, 3))
    for s in range(spp):
        acc_pt = accumulate(acc_pt, pt.render_frame_jit(
            ts, eye, U, V, W, W_, H_, s, 6), s)
        sampler = build(lt(s))
        acc_bd = accumulate(acc_bd, spcbpt.render_frame_jit(
            ts, ss, sampler, eye, U, V, W, W_, H_, s,
            max_depth=6, uniform=True), s)
    a = np.asarray(acc_pt)
    b = np.asarray(acc_bd)
    assert np.isfinite(b).all()
    assert b.mean() > 0.01
    ratio = b.mean(0) / a.mean(0)
    assert (np.abs(ratio - 1.0) < 0.15).all(), ratio
