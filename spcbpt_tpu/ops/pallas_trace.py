"""Pallas TPU traversal kernels.

The wavefront tracer's hot op is ray/scene intersection. For scenes whose
triangle set fits in VMEM (thousands of tris — the Cornell/benchmark class),
the fastest TPU shape is a fused kernel: the triangle SoA stays resident in
VMEM while ray blocks stream through the grid; every (ray, tri) pair is a VPU
lane op and the closest-hit reduction happens in-register — no HBM round
trips between triangle chunks (the XLA fallback in ops/intersect.py scans
chunks through HBM).

Replaces the RTX hardware traversal of the reference (optixTrace) for the
brute-force regime; larger scenes use ops/traverse.py (XLA skip-link BVH).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RAY_BLOCK = 512
_EPS_DET = 1e-10
_BIG = 1e30


def _closest_kernel(tri_chunks: int, cull_backface: bool,
                    o_ref, d_ref, tmin_ref, tmax_ref,
                    p0_ref, e1_ref, e2_ref,
                    t_ref, tri_ref, u_ref, v_ref):
    ox = o_ref[:, 0:1]
    oy = o_ref[:, 1:2]
    oz = o_ref[:, 2:3]
    dx = d_ref[:, 0:1]
    dy = d_ref[:, 1:2]
    dz = d_ref[:, 2:3]
    tmin = tmin_ref[:, 0:1]
    tmax = tmax_ref[:, 0:1]

    best_t = jnp.minimum(tmax, _BIG)
    best_tri = jnp.full_like(best_t, -1.0)
    best_u = jnp.zeros_like(best_t)
    best_v = jnp.zeros_like(best_t)

    n_chunk = p0_ref.shape[0] // tri_chunks

    for c in range(tri_chunks):
        sl = slice(c * n_chunk, (c + 1) * n_chunk)
        # triangle data laid out (T, 9): p0 | e1 | e2 columns
        p0x = p0_ref[sl, 0][None, :]
        p0y = p0_ref[sl, 1][None, :]
        p0z = p0_ref[sl, 2][None, :]
        e1x = e1_ref[sl, 0][None, :]
        e1y = e1_ref[sl, 1][None, :]
        e1z = e1_ref[sl, 2][None, :]
        e2x = e2_ref[sl, 0][None, :]
        e2y = e2_ref[sl, 1][None, :]
        e2z = e2_ref[sl, 2][None, :]

        # pvec = d x e2
        pvx = dy * e2z - dz * e2y
        pvy = dz * e2x - dx * e2z
        pvz = dx * e2y - dy * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        if cull_backface:
            det_ok = det > _EPS_DET
        else:
            det_ok = jnp.abs(det) > _EPS_DET
        inv_det = jnp.where(det_ok, 1.0 / jnp.where(det_ok, det, 1.0), 0.0)

        tvx = ox - p0x
        tvy = oy - p0y
        tvz = oz - p0z
        u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
        # qvec = tvec x e1
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        v = (dx * qvx + dy * qvy + dz * qvz) * inv_det
        t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det

        hit = det_ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) \
            & (t > tmin) & (t < best_t)
        t_m = jnp.where(hit, t, _BIG)
        # gather-free reduction (Mosaic has no in-kernel gather): min + masks
        tj = jnp.min(t_m, axis=1, keepdims=True)
        at_min = t_m == tj
        ids = jax.lax.broadcasted_iota(jnp.int32, t_m.shape, 1).astype(
            jnp.float32)
        jid = jnp.min(jnp.where(at_min, ids, float(n_chunk)), axis=1,
                      keepdims=True)
        pick = at_min & (ids == jid)
        uj = jnp.sum(jnp.where(pick, u, 0.0), axis=1, keepdims=True)
        vj = jnp.sum(jnp.where(pick, v, 0.0), axis=1, keepdims=True)
        improved = tj < best_t
        best_tri = jnp.where(improved, jid + c * n_chunk, best_tri)
        best_u = jnp.where(improved, uj, best_u)
        best_v = jnp.where(improved, vj, best_v)
        best_t = jnp.where(improved, tj, best_t)

    t_ref[:, 0:1] = best_t
    tri_ref[:, 0:1] = best_tri.astype(jnp.int32)
    u_ref[:, 0:1] = best_u
    v_ref[:, 0:1] = best_v


def _any_kernel(tri_chunks: int,
                o_ref, d_ref, tmin_ref, tmax_ref,
                p0_ref, e1_ref, e2_ref, occ_ref):
    ox = o_ref[:, 0:1]
    oy = o_ref[:, 1:2]
    oz = o_ref[:, 2:3]
    dx = d_ref[:, 0:1]
    dy = d_ref[:, 1:2]
    dz = d_ref[:, 2:3]
    tmin = tmin_ref[:, 0:1]
    tmax = tmax_ref[:, 0:1]
    occ = jnp.zeros_like(tmin, dtype=jnp.int32)
    n_chunk = p0_ref.shape[0] // tri_chunks
    for c in range(tri_chunks):
        sl = slice(c * n_chunk, (c + 1) * n_chunk)
        p0x = p0_ref[sl, 0][None, :]
        p0y = p0_ref[sl, 1][None, :]
        p0z = p0_ref[sl, 2][None, :]
        e1x = e1_ref[sl, 0][None, :]
        e1y = e1_ref[sl, 1][None, :]
        e1z = e1_ref[sl, 2][None, :]
        e2x = e2_ref[sl, 0][None, :]
        e2y = e2_ref[sl, 1][None, :]
        e2z = e2_ref[sl, 2][None, :]
        pvx = dy * e2z - dz * e2y
        pvy = dz * e2x - dx * e2z
        pvz = dx * e2y - dy * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        det_ok = jnp.abs(det) > _EPS_DET
        inv_det = jnp.where(det_ok, 1.0 / jnp.where(det_ok, det, 1.0), 0.0)
        tvx = ox - p0x
        tvy = oy - p0y
        tvz = oz - p0z
        u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        v = (dx * qvx + dy * qvy + dz * qvz) * inv_det
        t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
        hit = det_ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) \
            & (t > tmin) & (t < tmax)
        occ = occ | jnp.any(hit, axis=1, keepdims=True).astype(jnp.int32)
    occ_ref[:, 0:1] = occ


def _pad_tris(p0, e1, e2, mult: int = 128):
    t = p0.shape[0]
    pad = (-t) % mult
    if pad:
        z = jnp.zeros((pad, 3), p0.dtype)
        p0 = jnp.concatenate([p0, z])
        e1 = jnp.concatenate([e1, z])
        e2 = jnp.concatenate([e2, z])
    return p0, e1, e2


@functools.partial(jax.jit, static_argnames=("cull_backface",))
def pallas_closest(origins, dirs, tmin, tmax, tri_p0, tri_e1, tri_e2,
                   cull_backface: bool = True):
    """Fused closest-hit over all triangles. Returns (t, tri, u, v)."""
    n = origins.shape[0]
    pad_r = (-n) % RAY_BLOCK
    if pad_r:
        z = jnp.zeros((pad_r, 3), origins.dtype)
        origins = jnp.concatenate([origins, z])
        dirs = jnp.concatenate([dirs, jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 1.0], dirs.dtype), (pad_r, 3))])
        tmin = jnp.concatenate([tmin, jnp.zeros(pad_r, tmin.dtype)])
        tmax = jnp.concatenate([tmax, jnp.full(pad_r, -1.0, tmax.dtype)])
    p0, e1, e2 = _pad_tris(tri_p0, tri_e1, tri_e2)
    t_total = p0.shape[0]
    # keep each (RAY_BLOCK x chunk) intermediate around 512x2048
    tri_chunks = max(1, t_total // 2048)
    while t_total % tri_chunks:
        tri_chunks -= 1
    n_blocks = origins.shape[0] // RAY_BLOCK

    grid_spec = pl.GridSpec(
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((RAY_BLOCK, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t_total, 3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t_total, 3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t_total, 3), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((RAY_BLOCK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
    )
    t, tri, u, v = pl.pallas_call(
        functools.partial(_closest_kernel, tri_chunks, cull_backface),
        out_shape=[
            jax.ShapeDtypeStruct((origins.shape[0], 1), jnp.float32),
            jax.ShapeDtypeStruct((origins.shape[0], 1), jnp.int32),
            jax.ShapeDtypeStruct((origins.shape[0], 1), jnp.float32),
            jax.ShapeDtypeStruct((origins.shape[0], 1), jnp.float32),
        ],
        grid_spec=grid_spec,
    )(origins, dirs, tmin[:, None], tmax[:, None], p0, e1, e2)
    # out-of-range (padding) triangle ids -> miss
    tri = jnp.where(tri[:n, 0] >= tri_p0.shape[0], -1, tri[:n, 0])
    return t[:n, 0], tri, u[:n, 0], v[:n, 0]


@jax.jit
def pallas_any(origins, dirs, tmin, tmax, tri_p0, tri_e1, tri_e2):
    """Fused any-hit occlusion. Returns bool (N,)."""
    n = origins.shape[0]
    pad_r = (-n) % RAY_BLOCK
    if pad_r:
        z = jnp.zeros((pad_r, 3), origins.dtype)
        origins = jnp.concatenate([origins, z])
        dirs = jnp.concatenate([dirs, jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 1.0], dirs.dtype), (pad_r, 3))])
        tmin = jnp.concatenate([tmin, jnp.zeros(pad_r, tmin.dtype)])
        tmax = jnp.concatenate([tmax, jnp.full(pad_r, -1.0, tmax.dtype)])
    p0, e1, e2 = _pad_tris(tri_p0, tri_e1, tri_e2)
    t_total = p0.shape[0]
    tri_chunks = max(1, t_total // 2048)
    while t_total % tri_chunks:
        tri_chunks -= 1
    n_blocks = origins.shape[0] // RAY_BLOCK
    grid_spec = pl.GridSpec(
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((RAY_BLOCK, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RAY_BLOCK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t_total, 3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t_total, 3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t_total, 3), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((RAY_BLOCK, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    occ = pl.pallas_call(
        functools.partial(_any_kernel, tri_chunks),
        out_shape=jax.ShapeDtypeStruct((origins.shape[0], 1), jnp.int32),
        grid_spec=grid_spec,
    )(origins, dirs, tmin[:, None], tmax[:, None], p0, e1, e2)
    return occ[:n, 0] > 0
