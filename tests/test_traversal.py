import numpy as np
import jax.numpy as jnp
import pytest

from spcbpt_tpu.ops import bvh as bvh_mod
from spcbpt_tpu.ops import intersect, traverse


def random_tris(n, rng):
    p0 = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    e1 = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    e2 = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    return p0, e1, e2


def random_rays(n, rng):
    o = rng.uniform(-8, 8, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_tri_test_basic():
    o = jnp.array([[0.0, 0.0, -1.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    p0 = jnp.array([[-1.0, -1.0, 0.0]])
    e1 = jnp.array([[2.0, 0.0, 0.0]])
    e2 = jnp.array([[0.0, 2.0, 0.0]])
    # n = cross(e1,e2) = +z; ray dir +z => back-facing => culled
    _, _, _, hit = intersect.tri_test(o, d, p0, e1, e2, cull_backface=True)
    assert not bool(hit[0])
    t, u, v, hit = intersect.tri_test(o, d, p0, e1, e2, cull_backface=False)
    assert bool(hit[0]) and abs(float(t[0]) - 1.0) < 1e-6


@pytest.mark.parametrize("cull", [True, False])
def test_bvh_matches_bruteforce(cull):
    rng = np.random.default_rng(0)
    p0, e1, e2 = random_tris(300, rng)
    flat = bvh_mod.build_bvh_numpy(p0, e1, e2)
    order = flat.order
    p0j, e1j, e2j = (jnp.asarray(p0[order]), jnp.asarray(e1[order]),
                     jnp.asarray(e2[order]))
    o, d = random_rays(512, rng)
    tmin = jnp.full(512, 1e-3)
    tmax = jnp.full(512, 1e30)
    ref = intersect.brute_force_closest(o, d, p0j, e1j, e2j, tmin, tmax, cull)
    got = traverse.bvh_closest(
        o, d, tmin, tmax, jnp.asarray(flat.bounds_min),
        jnp.asarray(flat.bounds_max), jnp.asarray(flat.skip),
        jnp.asarray(flat.leaf_start), jnp.asarray(flat.leaf_count),
        p0j, e1j, e2j, cull)
    np.testing.assert_array_equal(np.asarray(ref.tri), np.asarray(got.tri))
    np.testing.assert_allclose(np.asarray(ref.t)[np.asarray(ref.tri) >= 0],
                               np.asarray(got.t)[np.asarray(got.tri) >= 0],
                               rtol=1e-5)


def test_bvh_any_matches_bruteforce():
    rng = np.random.default_rng(1)
    p0, e1, e2 = random_tris(200, rng)
    flat = bvh_mod.build_bvh_numpy(p0, e1, e2)
    order = flat.order
    p0j, e1j, e2j = (jnp.asarray(p0[order]), jnp.asarray(e1[order]),
                     jnp.asarray(e2[order]))
    o, d = random_rays(512, rng)
    tmin = jnp.full(512, 1e-3)
    tmax = jnp.full(512, 4.0)
    ref = intersect.brute_force_any(o, d, p0j, e1j, e2j, tmin, tmax)
    got = traverse.bvh_any(
        o, d, tmin, tmax, jnp.asarray(flat.bounds_min),
        jnp.asarray(flat.bounds_max), jnp.asarray(flat.skip),
        jnp.asarray(flat.leaf_start), jnp.asarray(flat.leaf_count),
        p0j, e1j, e2j)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_native_bvh_matches_numpy_if_available():
    from spcbpt_tpu.native.loader import native_build_bvh
    rng = np.random.default_rng(2)
    p0, e1, e2 = random_tris(500, rng)
    nat = native_build_bvh(p0, e1, e2, bvh_mod.LEAF_SIZE)
    if nat is None:
        pytest.skip("native builder unavailable")
    # traversal over the native tree must agree with brute force
    order = nat.order
    p0j, e1j, e2j = (jnp.asarray(p0[order]), jnp.asarray(e1[order]),
                     jnp.asarray(e2[order]))
    o, d = random_rays(256, rng)
    tmin = jnp.full(256, 1e-3)
    tmax = jnp.full(256, 1e30)
    ref = intersect.brute_force_closest(o, d, p0j, e1j, e2j, tmin, tmax, True)
    got = traverse.bvh_closest(
        o, d, tmin, tmax, jnp.asarray(nat.bounds_min),
        jnp.asarray(nat.bounds_max), jnp.asarray(nat.skip),
        jnp.asarray(nat.leaf_start), jnp.asarray(nat.leaf_count),
        p0j, e1j, e2j, True)
    np.testing.assert_array_equal(np.asarray(ref.tri), np.asarray(got.tri))
