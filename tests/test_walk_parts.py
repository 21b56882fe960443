"""Partitioned large-scene traversal (ops/clusters.build_cluster_parts +
ops/ray_walk.walk_closest_parts) vs the brute-force oracle.

Forces several partitions on a small synthetic soup so the partition merge,
tri_base offsets, tightening tmax, and the scene.py dispatch all get
exercised in interpret mode on CPU; the same path compiles on TPU for scenes
beyond the ~120k-triangle VMEM table (VERDICT r2 item 5)."""
import numpy as np
import jax.numpy as jnp
import pytest

from spcbpt_tpu.ops import bvh as bvh_mod
from spcbpt_tpu.ops import clusters as cl_mod
from spcbpt_tpu.ops import intersect, ray_walk


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(23)
    nt = 900
    p0 = rng.uniform(-1, 1, (nt, 3)).astype(np.float32)
    e1 = rng.normal(0, 0.22, (nt, 3)).astype(np.float32)
    e2 = rng.normal(0, 0.22, (nt, 3)).astype(np.float32)
    flat = bvh_mod.build_bvh(p0, e1, e2)
    order = flat.order
    p0, e1, e2 = p0[order], e1[order], e2[order]
    parts = cl_mod.build_cluster_parts(flat, p0, e1, e2, max_tris=128,
                                       part_max_tris=256, with_coeff=False)
    assert len(parts) >= 3, f"want several partitions, got {len(parts)}"

    n = 256
    o = rng.uniform(-2.5, 2.5, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    tmn = jnp.full((n,), 1e-3)
    tmx = jnp.full((n,), 1e16)
    return parts, p0, e1, e2, jnp.asarray(o), jnp.asarray(d), tmn, tmx


def test_partition_covers_all_triangles(setup):
    parts, p0, *_ = setup
    total = sum(p.tri_p0.shape[0] for p in parts)
    assert total == p0.shape[0]
    # contiguous coverage: each part's base == previous end
    end = 0
    for p in parts:
        assert p.tri_base == end
        end += p.tri_p0.shape[0]


@pytest.mark.parametrize("sort_rays", [False, True])
def test_parts_closest_matches_brute(setup, sort_rays):
    parts, p0, e1, e2, o, d, tmn, tmx = setup
    ref = intersect.brute_force_closest(
        o, d, jnp.asarray(p0), jnp.asarray(e1), jnp.asarray(e2),
        tmn, tmx, True, chunk=128)
    got = ray_walk.walk_closest_parts(parts, o, d, tmn, tmx, True,
                                      sort_rays=sort_rays, interpret=True)
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(ref.t),
                               rtol=1e-4, atol=1e-4)
    assert (np.asarray(got.tri) == np.asarray(ref.tri)).mean() > 0.99


def test_parts_any_matches_brute(setup):
    parts, p0, e1, e2, o, d, tmn, _ = setup
    tmx = jnp.full(o.shape[:1], 1.5)
    ref = intersect.brute_force_any(
        o, d, jnp.asarray(p0), jnp.asarray(e1), jnp.asarray(e2),
        tmn, tmx, chunk=128)
    got = ray_walk.walk_any_parts(parts, o, d, tmn, tmx, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_scene_auto_partitions_above_walk_limit(monkeypatch):
    """scene.load builds tuple clusters_walk above WALK_MAX_TRIS (partition
    budget shrunk so the 33k-tri interior splits) and the parts traversal
    agrees with the scene's own BVH path on camera rays."""
    from spcbpt_tpu.scene import scene as scene_mod
    from spcbpt_tpu.scene.interior import default_scene_path
    monkeypatch.setattr(scene_mod, "WALK_MAX_TRIS", 4096)
    ts, desc, cam = scene_mod.load_trace_scene(default_scene_path(),
                                               mode="walk")
    assert isinstance(ts.clusters_walk, tuple)
    assert len(ts.clusters_walk) >= 2
    cam.aspect = 1.0
    from spcbpt_tpu.render.common import camera_rays
    eye, U, V, W = cam.uvw()
    o, d, _ = camera_rays(eye, U, V, W, 16, 8, 0)
    tmn = jnp.full(o.shape[:1], 1e-3)
    tmx = jnp.full(o.shape[:1], 1e16)
    got = ray_walk.walk_closest_parts(ts.clusters_walk, o, d, tmn, tmx, True,
                                      interpret=True)
    from spcbpt_tpu.ops import traverse
    ref = traverse.bvh_closest(
        o, d, tmn, tmx, ts.bvh_min, ts.bvh_max, ts.bvh_skip,
        ts.bvh_leaf_start, ts.bvh_leaf_count,
        ts.tri_p0, ts.tri_e1, ts.tri_e2, True)
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(ref.t),
                               rtol=1e-4, atol=1e-4)
    assert (np.asarray(got.tri) == np.asarray(ref.tri)).mean() > 0.99
