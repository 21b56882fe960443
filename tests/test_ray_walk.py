"""Row-walk traversal kernel (ops/ray_walk.py) vs the brute-force oracle.

Runs the real Pallas kernel in interpreter mode on CPU; the same code path
compiles via Mosaic on TPU (cross-checked there by the profiling scripts and
the renderer A/Bs)."""
import numpy as np
import jax.numpy as jnp
import pytest

from spcbpt_tpu.ops import bvh as bvh_mod
from spcbpt_tpu.ops import clusters as cl_mod
from spcbpt_tpu.ops import intersect, ray_walk


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(11)
    nt = 700
    p0 = rng.uniform(-1, 1, (nt, 3)).astype(np.float32)
    e1 = rng.normal(0, 0.25, (nt, 3)).astype(np.float32)
    e2 = rng.normal(0, 0.25, (nt, 3)).astype(np.float32)
    flat = bvh_mod.build_bvh(p0, e1, e2)
    order = flat.order
    p0, e1, e2 = p0[order], e1[order], e2[order]
    cs = cl_mod.build_clusters(flat, p0, e1, e2, max_tris=128,
                               with_coeff=False)

    n = 300
    o = rng.uniform(-2.5, 2.5, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    tmn = jnp.full((n,), 1e-3)
    tmx = jnp.full((n,), 1e16)
    return cs, p0, e1, e2, jnp.asarray(o), jnp.asarray(d), tmn, tmx


@pytest.mark.parametrize("cull", [True, False])
@pytest.mark.parametrize("sort_rays", [False, True])
def test_walk_closest_matches_brute(setup, cull, sort_rays):
    cs, p0, e1, e2, o, d, tmn, tmx = setup
    ref = intersect.brute_force_closest(
        o, d, jnp.asarray(p0), jnp.asarray(e1), jnp.asarray(e2),
        tmn, tmx, cull, chunk=128)
    got = ray_walk.walk_closest(cs, o, d, tmn, tmx, cull,
                                sort_rays=sort_rays, interpret=True)
    r_tri = np.asarray(ref.tri)
    g_tri = np.asarray(got.tri)
    # near-degenerate duplicate-distance ties may pick another triangle;
    # distances must match everywhere
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(ref.t),
                               rtol=1e-4, atol=1e-4)
    assert (g_tri == r_tri).mean() > 0.99
    same = g_tri == r_tri
    np.testing.assert_allclose(np.asarray(got.u)[same],
                               np.asarray(ref.u)[same], atol=2e-3)
    np.testing.assert_allclose(np.asarray(got.v)[same],
                               np.asarray(ref.v)[same], atol=2e-3)


@pytest.mark.parametrize("sort_rays", [False, True])
def test_walk_any_matches_brute(setup, sort_rays):
    cs, p0, e1, e2, o, d, tmn, tmx = setup
    tmx_seg = jnp.full(o.shape[:1], 1.5)
    ref = intersect.brute_force_any(
        o, d, jnp.asarray(p0), jnp.asarray(e1), jnp.asarray(e2),
        tmn, tmx_seg, chunk=128)
    got = ray_walk.walk_any(cs, o, d, tmn, tmx_seg,
                            sort_rays=sort_rays, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_walk_empty_rows(setup):
    """Rays that overlap nothing (pointing away) terminate with misses."""
    cs, p0, e1, e2, o, d, tmn, tmx = setup
    o_far = o + 100.0
    got = ray_walk.walk_closest(cs, o_far, d, tmn, tmx, True, interpret=True)
    assert (np.asarray(got.tri) == -1).all()
    assert not np.asarray(
        ray_walk.walk_any(cs, o_far, d, tmn, jnp.full(o.shape[:1], 5.0),
                          interpret=True)).any()
