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
