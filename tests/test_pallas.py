"""Pallas traversal kernel correctness (interpret mode on CPU).

The kernels are validated against the XLA brute-force oracle. On this
environment's TPU the Mosaic compile goes through a serialized remote compile
service, so the kernels stay off the default path until re-benchmarked
(STATUS.md); these tests keep their semantics pinned meanwhile.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest


@pytest.fixture(scope="module")
def pallas_interpret():
    """Reload ops.pallas_trace with pallas_call forced to interpret mode."""
    import importlib
    from jax.experimental import pallas as pl
    import spcbpt_tpu.ops.pallas_trace as P

    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    pl.pallas_call = patched
    try:
        importlib.reload(P)
        yield P
    finally:
        pl.pallas_call = orig
        importlib.reload(P)


def test_pallas_matches_bruteforce(pallas_interpret):
    P = pallas_interpret
    from spcbpt_tpu.ops import intersect
    from spcbpt_tpu.render.common import camera_rays
    from spcbpt_tpu.scene.cornell import default_scene_path
    from spcbpt_tpu.scene.scene import load_trace_scene

    ts, desc, cam = load_trace_scene(default_scene_path())
    cam.aspect = 1.0
    eye, U, V, W = cam.uvw()
    o, d, _ = camera_rays(eye, U, V, W, 32, 32, 0)
    tmin = jnp.full(32 * 32, 1e-3)
    tmax = jnp.full(32 * 32, 1e16)

    t, tri, u, v = P.pallas_closest(o, d, tmin, tmax,
                                    ts.tri_p0, ts.tri_e1, ts.tri_e2, True)
    ref = intersect.brute_force_closest(o, d, ts.tri_p0, ts.tri_e1,
                                        ts.tri_e2, tmin, tmax, True)
    np.testing.assert_array_equal(np.asarray(tri), np.asarray(ref.tri))
    m = np.asarray(tri) >= 0
    np.testing.assert_allclose(np.asarray(t)[m], np.asarray(ref.t)[m],
                               rtol=1e-4)

    short = jnp.asarray(np.asarray(ref.t) * 0.99)
    occ = P.pallas_any(o, d, tmin, short, ts.tri_p0, ts.tri_e1, ts.tri_e2)
    ref_occ = intersect.brute_force_any(o, d, ts.tri_p0, ts.tri_e1,
                                        ts.tri_e2, tmin, short)
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(ref_occ))
