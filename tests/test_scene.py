import numpy as np
import pytest

from spcbpt_tpu.scene import cornell
from spcbpt_tpu.scene.parser import load_scene
from spcbpt_tpu.scene.scene import build_scene, load_trace_scene


@pytest.fixture(scope="module")
def cornell_path(tmp_path_factory):
    root = tmp_path_factory.mktemp("scenes")
    return cornell.generate(str(root))


def test_parse_cornell(cornell_path):
    desc = load_scene(cornell_path)
    assert desc.width == 512 and desc.height == 512
    assert desc.has_camera
    assert len(desc.meshes) == 5
    assert "White" in desc.materials and "Red" in desc.materials
    assert len(desc.lights) == 1
    l = desc.lights[0]
    assert l.light_type == "Quad"
    assert l.div_level == 8
    np.testing.assert_allclose(l.area, 130 * 105, rtol=1e-5)
    # normal points down (cross(u,v))
    np.testing.assert_allclose(l.normal, (0, -1, 0), atol=1e-6)


def test_build_scene(cornell_path):
    desc = load_scene(cornell_path)
    ts = build_scene(desc)
    # 15 quads (3 white walls + left + right + 5 + 5 block faces) = 30 tris,
    # + 2 emitter tris for the light quad
    assert ts.num_tris == 32
    assert ts.num_lights == 1
    assert ts.num_quad_lights == 1
    assert not ts.has_env
    # light subspace base block starts at 0 without env
    assert int(ts.lights.ss_base[0]) == 0
    assert int(ts.lights.div_level[0]) == 8
    # emissive tris are tagged
    assert int((np.asarray(ts.tri_light) >= 0).sum()) == 2


def test_quad_geometry_normals(cornell_path):
    """Light quad triangles' geometric normals must equal the light normal
    (emission is one-sided; back-face culling relies on winding)."""
    desc = load_scene(cornell_path)
    ts = build_scene(desc)
    tl = np.asarray(ts.tri_light)
    e1 = np.asarray(ts.tri_e1)[tl >= 0]
    e2 = np.asarray(ts.tri_e2)[tl >= 0]
    gn = np.cross(e1, e2)
    gn /= np.linalg.norm(gn, axis=-1, keepdims=True)
    np.testing.assert_allclose(gn, [[0, -1, 0], [0, -1, 0]], atol=1e-6)


def test_house_scene_parses():
    """The reference's bundled house scene should parse (geometry files exist
    in the reference checkout only, so just the parse step)."""
    path = "/root/reference/src/data/house/house_uvrefine2.scene"
    desc = load_scene(path)
    assert desc.has_camera
    assert len(desc.meshes) == 29  # 30 mesh blocks, one commented out
    assert len(desc.lights) == 2
    assert all(l.light_type == "Quad" for l in desc.lights)
    assert desc.lights[0].div_level == 10
    assert desc.use_geometry_normal
    assert "Floorboards" in desc.materials
    m = desc.materials["Floorboards"]
    assert m.albedo_tex == "house/textures/chair_wood.jpg"
    np.testing.assert_allclose(m.roughness, 0.1)
