"""Tiled two-level traversal vs the brute-force intersection oracle."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spcbpt_tpu.ops import bvh as bvh_mod
from spcbpt_tpu.ops import clusters as cl_mod
from spcbpt_tpu.ops import intersect, tile_trace


def _random_tris(n, seed=0, spread=10.0):
    r = np.random.default_rng(seed)
    p0 = r.uniform(-spread, spread, size=(n, 3)).astype(np.float32)
    e1 = r.normal(size=(n, 3)).astype(np.float32) * r.uniform(1.0, 5.0, (n, 1))
    e2 = r.normal(size=(n, 3)).astype(np.float32) * r.uniform(1.0, 5.0, (n, 1))
    return p0, e1, e2


def _random_rays(n, seed=1, spread=12.0):
    """Rays from a shell around the cloud aimed at random interior points —
    dense hit coverage for the oracle comparison."""
    r = np.random.default_rng(seed)
    o = r.uniform(-spread, spread, size=(n, 3)).astype(np.float32)
    target = r.uniform(-spread * 0.4, spread * 0.4, size=(n, 3)).astype(np.float32)
    d = target - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def _build(p0, e1, e2, max_tris=16):
    flat = bvh_mod.build_bvh(p0, e1, e2)
    order = flat.order
    p0o, e1o, e2o = p0[order], e1[order], e2[order]
    cs = cl_mod.build_clusters(flat, p0o, e1o, e2o, max_tris=max_tris)
    return cs, jnp.asarray(p0o), jnp.asarray(e1o), jnp.asarray(e2o)


@pytest.mark.parametrize("n_tris,seed,cull", [(50, 0, True), (300, 1, True),
                                              (300, 2, False), (1200, 3, True)])
def test_closest_matches_brute(n_tris, seed, cull):
    p0, e1, e2 = _random_tris(n_tris, seed)
    cs, p0o, e1o, e2o = _build(p0, e1, e2)
    o, d = _random_rays(257, seed + 10)
    tmin = jnp.full((257,), 1e-3)
    tmax = jnp.full((257,), 1e16)
    ref = intersect.brute_force_closest(o, d, p0o, e1o, e2o, tmin, tmax, cull)
    got = tile_trace.tile_closest(cs, o, d, tmin, tmax, cull, tile=64)
    ref_t = np.asarray(ref.t)
    got_t = np.asarray(got.t)
    # same hit distance everywhere (tri ids may differ only on exact ties)
    np.testing.assert_allclose(got_t, ref_t, rtol=2e-4, atol=1e-4)
    same_tri = np.asarray(ref.tri) == np.asarray(got.tri)
    close_t = np.abs(got_t - ref_t) <= 2e-4 * np.abs(ref_t) + 1e-4
    assert np.all(same_tri | close_t)
    hit = np.asarray(ref.tri) >= 0
    assert hit.sum() > 20  # scene dense enough to be a real test
    np.testing.assert_allclose(np.asarray(got.u)[same_tri & hit],
                               np.asarray(ref.u)[same_tri & hit],
                               rtol=1e-2, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got.v)[same_tri & hit],
                               np.asarray(ref.v)[same_tri & hit],
                               rtol=1e-2, atol=1e-3)


@pytest.mark.parametrize("seed", [0, 4])
def test_any_matches_brute(seed):
    p0, e1, e2 = _random_tris(400, seed)
    cs, p0o, e1o, e2o = _build(p0, e1, e2)
    o, d = _random_rays(130, seed + 20)
    # segment occlusion with a finite far bound
    tmin = jnp.full((130,), 1e-3)
    tmax = jnp.full((130,), 8.0)
    ref = intersect.brute_force_any(o, d, p0o, e1o, e2o, tmin, tmax)
    got = tile_trace.tile_any(cs, o, d, tmin, tmax, tile=64)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    assert np.asarray(ref).sum() > 5


def test_coherent_camera_rays_cornell():
    """Camera wavefront on the bundled Cornell scene through the cluster path
    must match the scene's default (brute) path bit-for-hit."""
    from spcbpt_tpu.scene.cornell import default_scene_path
    from spcbpt_tpu.scene.scene import load_trace_scene, trace_closest
    from spcbpt_tpu.render.common import camera_rays

    ts, desc, cam = load_trace_scene(default_scene_path())
    cam.aspect = 1.0
    eye, U, V, W = cam.uvw()
    o, d, _ = camera_rays(jnp.asarray(eye), jnp.asarray(U), jnp.asarray(V),
                          jnp.asarray(W), 32, 32, 0)
    tmin = jnp.full((1024,), 1e-3)
    tmax = jnp.full((1024,), 1e16)
    ref = trace_closest(ts, o, d, 1e-3, 1e16, True)

    flat = bvh_mod.build_bvh(np.asarray(ts.tri_p0), np.asarray(ts.tri_e1),
                             np.asarray(ts.tri_e2))
    # scene arrays are already in BVH order; rebuild on them directly
    p0o = np.asarray(ts.tri_p0)[flat.order]
    e1o = np.asarray(ts.tri_e1)[flat.order]
    e2o = np.asarray(ts.tri_e2)[flat.order]
    cs = cl_mod.build_clusters(flat, p0o, e1o, e2o, max_tris=16)
    got = tile_trace.tile_closest(cs, o, d, tmin, tmax, True, tile=64)
    # map cluster-order ids back to scene order for comparison
    back = np.asarray(flat.order)
    got_tri = np.where(np.asarray(got.tri) >= 0,
                       back[np.maximum(np.asarray(got.tri), 0)], -1)
    hit_ref = np.asarray(ref.tri) >= 0
    hit_got = got_tri >= 0
    np.testing.assert_array_equal(hit_got, hit_ref)
    np.testing.assert_allclose(np.asarray(got.t)[hit_ref],
                               np.asarray(ref.t)[hit_ref], rtol=2e-4, atol=1e-4)


def test_unpadded_ray_count():
    """Ray counts not divisible by the tile size are padded internally."""
    p0, e1, e2 = _random_tris(100, 7)
    cs, p0o, e1o, e2o = _build(p0, e1, e2)
    o, d = _random_rays(67, 30)
    tmin = jnp.full((67,), 1e-3)
    tmax = jnp.full((67,), 1e16)
    ref = intersect.brute_force_closest(o, d, p0o, e1o, e2o, tmin, tmax, True)
    got = tile_trace.tile_closest(cs, o, d, tmin, tmax, True, tile=32)
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(ref.t),
                               rtol=2e-4, atol=1e-4)


def test_ray_sort_key_live_packs_dead_lanes_last():
    """Direct unit test for the liveness-aware coherence key (a790fde):
    dead lanes (tmax < tmin, the masked-lane convention) must sort strictly
    after every live lane, and live lanes must keep their plain
    ray_sort_key relative order (the coherence the walk kernels rely on)."""
    p0, e1, e2 = _random_tris(100, 11)
    cs, *_ = _build(p0, e1, e2)
    o, d = _random_rays(257, 12)
    r = np.random.default_rng(13)
    dead = jnp.asarray(r.random(257) < 0.4)
    tmin = jnp.full((257,), 1e-3)
    tmax = jnp.where(dead, -1.0, 1e16)

    base = np.asarray(tile_trace.ray_sort_key(cs.cmin, cs.cmax, o, d))
    live_key = np.asarray(tile_trace.ray_sort_key_live(
        cs.cmin, cs.cmax, o, d, tmin, tmax))
    dead_np = np.asarray(dead)
    # every dead key sorts after every live key
    assert live_key[dead_np].min() > live_key[~dead_np].max()
    # live lanes: key unchanged (identical coherence ordering)
    np.testing.assert_array_equal(live_key[~dead_np], base[~dead_np])
    # argsort stability: live lanes appear first, in base-key order
    order = np.argsort(live_key, kind="stable")
    n_live = int((~dead_np).sum())
    assert not dead_np[order[:n_live]].any()


def test_visibility_mask_exact_on_live_lanes():
    """visibility(mask=) must return exactly the unmasked result on lanes
    where mask is True (masked lanes are unspecified by contract)."""
    from spcbpt_tpu.scene.cornell import default_scene_path
    from spcbpt_tpu.scene.scene import load_trace_scene, visibility

    ts, desc, cam = load_trace_scene(default_scene_path())
    r = np.random.default_rng(21)
    lo = np.asarray(ts.tri_p0).min(axis=0)
    hi = np.asarray(ts.tri_p0).max(axis=0)
    a = jnp.asarray(r.uniform(lo, hi, size=(256, 3)).astype(np.float32))
    b = jnp.asarray(r.uniform(lo, hi, size=(256, 3)).astype(np.float32))
    mask = jnp.asarray(r.random(256) < 0.6)

    full = np.asarray(visibility(ts, a, b))
    masked = np.asarray(visibility(ts, a, b, mask=mask))
    m = np.asarray(mask)
    np.testing.assert_array_equal(masked[m], full[m])
    assert m.sum() > 50 and (~m).sum() > 50
