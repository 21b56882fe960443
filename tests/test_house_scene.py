"""End-to-end test on the reference's bundled 'house' scene (read-only data):
texture stack, many materials, multi-light ssBase blocks, BVH traversal mode."""
import os

import numpy as np
import pytest

HOUSE = "/root/reference/src/data/house/house_uvrefine2.scene"


@pytest.mark.skipif(not os.path.exists(HOUSE), reason="reference data absent")
def test_house_builds_and_renders():
    import jax
    from spcbpt_tpu.scene.scene import load_trace_scene
    from spcbpt_tpu.render import pt

    ts, desc, cam = load_trace_scene(HOUSE)
    assert ts.num_tris > 10_000
    assert ts.mode == "bvh"
    assert ts.num_quad_lights == 2
    # ssBase blocks: light 0 at 0, light 1 at divLevel^2 = 100
    assert int(ts.lights.ss_base[0]) == 0
    assert int(ts.lights.ss_base[1]) == 100
    # textures got stacked
    assert ts.textures.shape[0] > 5
    assert int(np.asarray(ts.mats.tex_id).max()) >= 0

    cam.aspect = 1.0
    eye, U, V, W = cam.uvw()
    img = pt.render_frame_jit(ts, eye, U, V, W, 24, 24, 0, 4)
    a = np.asarray(img)
    assert np.isfinite(a).all()
    assert a.mean() > 0.0  # lights reachable


@pytest.mark.skipif(not os.path.exists(HOUSE), reason="reference data absent")
def test_house_spcbpt_trains_and_renders():
    """Full SPCBPT pipeline (pretrace -> classify -> Q/Gamma -> render) on
    the reference's own scene: env labels, 2-light ssBase blocks, texture
    albedo in training features, 119k-tri traversal under the pool renderer."""
    import jax
    from spcbpt_tpu.config import PretraceConfig
    from spcbpt_tpu.render import light_trace, lvc, spcbpt_pool
    from spcbpt_tpu.scene.scene import load_trace_scene
    from spcbpt_tpu.train import pipeline

    ts, desc, cam = load_trace_scene(HOUSE)
    cam.aspect = 1.0
    eye, U, V, W = cam.uvw()
    cfg = PretraceConfig(num_core=2048, target_samples=8_000,
                         target_q_samples=8_000)
    ss, stats = pipeline.preprocess(ts, (eye, U, V, W), 32, 32, cfg,
                                    lt_paths=4096, lt_depth=5)
    assert ss.trained
    assert np.isfinite(np.asarray(ss.cmf_gamma)).all()
    assert np.isfinite(np.asarray(ss.q)).all()

    lv = light_trace.trace_light_paths(ts, ss, 4096, 11, max_depth=5)
    sampler = lvc.build_sampler(lv, table_mode=lvc.table_mode_for(ss),
                                table_seed=11)
    fs, ct = spcbpt_pool.render_pool_jit(ts, ss, sampler, eye, U, V, W,
                                         32, 32, 1, 3, max_depth=6)
    img = np.asarray(fs) / np.maximum(np.asarray(ct)[:, None], 1)
    assert np.isfinite(img).all()
    assert img.mean() > 0.0
