"""Whole-walk Pallas traversal, v2: per-tile private cluster walks with
precomputed near-to-far lists and double-buffered triangle DMA.

Replaces OptiX hardware traversal (reference: optixTrace cuProg.h:434 over
the GAS of sutil/Scene.cpp:943) on the TPU compute path. Lessons from the two
earlier formulations on real v5e hardware:

  * XLA lock-step walk (ops/tile_trace.py): every round materializes
    (NT, R, K) intersection intermediates in HBM (~0.4 ms/round), and tiles
    advance in lock-step so the busiest tile's round count taxes everyone
    (bucketing only softens it). Incoherent wavefronts: ~1.3 Mrays/s.
  * Pallas v1 (ops/pallas_tile.pallas_closest): fused, but re-scans a
    (TB, C) entry table every round to pick the next cluster and issues
    TB serialized DMA start/wait pairs per round -> ~45 us/round in-kernel.

This kernel fixes both:
  1. The near-to-far cluster order per tile is precomputed OUTSIDE the
     kernel (one lax.sort over the (NT, C) entry-bound table — the same
     table the XLA walk builds); the kernel just walks an id list.
  2. One ray-tile per grid program: stragglers only lengthen their own
     program, and the per-tile entry list + count live in SMEM for scalar
     control flow.
  3. The (16, 128) triangle blocks are DMA'd HBM->VMEM double-buffered:
     round r computes on buffer r%2 while r+1 streams into (r+1)%2.
  4. Early termination: the walk stops when the next cluster's conservative
     entry bound exceeds every live lane's current best t (closest) or the
     segment tmax (any-hit), or when all lanes are occluded.

All mutable vector state (best t/tri/u/v, occlusion) lives in output VMEM
refs; the while_loop carries only scalars (Mosaic cannot legalize
loop-carried vectors in padded layouts).

Intersection is direct Moller-Trumbore on the VPU over the full 128-slot
block (~45 flops per ray-triangle slot), so clusters should be built with
max_tris=128: per-visit cost is the same as K=32 but each visit covers 4x
the triangles and the per-tile union shrinks accordingly.

Correctness oracle: ops/intersect.brute_force_* (tests/test_pallas_walk.py,
interpret mode on CPU; tests/test_tile_trace.py cross-checks on TPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .clusters import ClusterSet
from .intersect import Hit
from . import tile_trace

_BIG = 1e30
_EPS_DET = 1e-10


def _mt_rows(o, d, tris, tmn, tmax_eff, cull):
    """Direct Moller-Trumbore: o/d (R,3), tris (16,128) packed [p0,e1,e2]
    rows 0..8 (zero slots have det == 0 and never hit), tmn/tmax_eff (1,R).
    Returns (tt, u, v) of shape (R, 128) with tt = _BIG on miss."""
    ray = lambda x: x[:, None]             # (R, 1)
    tri = lambda r: tris[r][None, :]       # (1, 128)
    ox, oy, oz = ray(o[:, 0]), ray(o[:, 1]), ray(o[:, 2])
    dx, dy, dz = ray(d[:, 0]), ray(d[:, 1]), ray(d[:, 2])
    p0x, p0y, p0z = tri(0), tri(1), tri(2)
    e1x, e1y, e1z = tri(3), tri(4), tri(5)
    e2x, e2y, e2z = tri(6), tri(7), tri(8)

    pvx = dy * e2z - dz * e2y
    pvy = dz * e2x - dx * e2z
    pvz = dx * e2y - dy * e2x
    det = e1x * pvx + e1y * pvy + e1z * pvz
    det_ok = det > _EPS_DET if cull else jnp.abs(det) > _EPS_DET
    inv = jnp.where(det_ok, 1.0 / jnp.where(det_ok, det, 1.0), 0.0)
    tvx = ox - p0x
    tvy = oy - p0y
    tvz = oz - p0z
    u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv
    qvx = tvy * e1z - tvz * e1y
    qvy = tvz * e1x - tvx * e1z
    qvz = tvx * e1y - tvy * e1x
    v = (dx * qvx + dy * qvy + dz * qvz) * inv
    t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv
    hit = det_ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) \
        & (t > tmn.reshape(-1, 1)) & (t < tmax_eff.reshape(-1, 1))
    return jnp.where(hit, t, _BIG), u, v


def _dma(triblk_ref, ids_ref, buf, sems, r):
    cid = ids_ref[0, 0, r]
    return pltpu.make_async_copy(triblk_ref.at[cid],
                                 buf.at[jax.lax.rem(r, 2)],
                                 sems.at[jax.lax.rem(r, 2)])


def _closest_kernel(count_ref, ids_ref, bases_ref, entries_ref,
                    o_ref, d_ref, tmn_ref, tmx_ref, triblk_ref,
                    bt_ref, bid_ref, bu_ref, bv_ref,
                    buf, sems, *, cull: bool):
    r_lanes = o_ref.shape[1]
    n = count_ref[0, 0, 0]
    o = o_ref[0]
    d = d_ref[0]
    tmn = tmn_ref[0]
    tmx = tmx_ref[0]
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (r_lanes, 128), 1)

    bt_ref[0] = jnp.full((1, r_lanes), _BIG)
    bid_ref[0] = jnp.full((1, r_lanes), -1, jnp.int32)
    bu_ref[0] = jnp.zeros((1, r_lanes))
    bv_ref[0] = jnp.zeros((1, r_lanes))

    @pl.when(n > 0)
    def _():
        _dma(triblk_ref, ids_ref, buf, sems, 0).start()

    def body(carry):
        r, _ = carry
        _dma(triblk_ref, ids_ref, buf, sems, r).wait()

        @pl.when(r + 1 < n)
        def _():
            _dma(triblk_ref, ids_ref, buf, sems, r + 1).start()

        best_t = bt_ref[0]
        tmax_eff = jnp.minimum(best_t, tmx)
        tt, u, v = _mt_rows(o, d, buf[jax.lax.rem(r, 2)], tmn, tmax_eff, cull)
        t_min = jnp.min(tt, axis=1)[None, :]              # (1, R)
        improved = t_min < best_t
        at_min = tt == t_min.reshape(-1, 1)
        s_pick = jnp.min(jnp.where(at_min, slot_iota, 128), axis=1)[None, :]
        pick = at_min & (slot_iota == s_pick.reshape(-1, 1))
        u_p = jnp.sum(jnp.where(pick, u, 0.0), axis=1)[None, :]
        v_p = jnp.sum(jnp.where(pick, v, 0.0), axis=1)[None, :]
        tri = bases_ref[0, 0, r] + s_pick
        bid_ref[0] = jnp.where(improved, tri, bid_ref[0])
        bu_ref[0] = jnp.where(improved, u_p, bu_ref[0])
        bv_ref[0] = jnp.where(improved, v_p, bv_ref[0])
        bt_ref[0] = jnp.where(improved, t_min, best_t)

        nxt = r + 1
        t_bound = jnp.max(jnp.minimum(bt_ref[0], tmx))
        go = (nxt < n) & (entries_ref[0, 0, jnp.minimum(nxt, n - 1)]
                          <= t_bound)
        return nxt, go

    r_end, _ = jax.lax.while_loop(lambda c: c[1], body, (0, n > 0))

    # drain the in-flight prefetch if the walk terminated early
    @pl.when(r_end < n)
    def _():
        _dma(triblk_ref, ids_ref, buf, sems, r_end).wait()


def _closest_kernel_vmem(count_ref, ids_ref, bases_ref, entries_ref,
                         o_ref, d_ref, tmn_ref, tmx_ref, triblk_ref,
                         bt_ref, bid_ref, bu_ref, bv_ref, *, cull: bool,
                         prune: bool = True):
    """triblk_ref is the FULL (C, 16, 128) table resident in VMEM (scenes up
    to ~128k tris at 64 B/tri); per round a dynamic dim-0 load replaces the
    HBM DMA + semaphore wait of the streaming variant."""
    r_lanes = o_ref.shape[1]
    n = count_ref[0, 0, 0]
    o = o_ref[0]
    d = d_ref[0]
    tmn = tmn_ref[0]
    tmx = tmx_ref[0]
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (r_lanes, 128), 1)

    bt_ref[0] = jnp.full((1, r_lanes), _BIG)
    bid_ref[0] = jnp.full((1, r_lanes), -1, jnp.int32)
    bu_ref[0] = jnp.zeros((1, r_lanes))
    bv_ref[0] = jnp.zeros((1, r_lanes))

    def body(carry):
        r, _ = carry
        best_t = bt_ref[0]
        tmax_eff = jnp.minimum(best_t, tmx)
        tris = triblk_ref[ids_ref[0, 0, r]]
        tt, u, v = _mt_rows(o, d, tris, tmn, tmax_eff, cull)
        t_min = jnp.min(tt, axis=1)[None, :]
        improved = t_min < best_t
        at_min = tt == t_min.reshape(-1, 1)
        s_pick = jnp.min(jnp.where(at_min, slot_iota, 128), axis=1)[None, :]
        pick = at_min & (slot_iota == s_pick.reshape(-1, 1))
        u_p = jnp.sum(jnp.where(pick, u, 0.0), axis=1)[None, :]
        v_p = jnp.sum(jnp.where(pick, v, 0.0), axis=1)[None, :]
        tri = bases_ref[0, 0, r] + s_pick
        bid_ref[0] = jnp.where(improved, tri, bid_ref[0])
        bu_ref[0] = jnp.where(improved, u_p, bu_ref[0])
        bv_ref[0] = jnp.where(improved, v_p, bv_ref[0])
        bt_ref[0] = jnp.where(improved, t_min, best_t)

        nxt = r + 1
        if prune:
            t_bound = jnp.max(jnp.minimum(bt_ref[0], tmx))
            go = (nxt < n) & (entries_ref[0, 0, jnp.minimum(nxt, n - 1)]
                              <= t_bound)
        else:
            go = nxt < n
        return nxt, go

    jax.lax.while_loop(lambda c: c[1], body, (0, n > 0))


def _any_kernel_vmem(count_ref, ids_ref, entries_ref,
                     o_ref, d_ref, tmn_ref, tmx_ref, triblk_ref, occ_ref):
    r_lanes = o_ref.shape[1]
    n = count_ref[0, 0, 0]
    o = o_ref[0]
    d = d_ref[0]
    tmn = tmn_ref[0]
    tmx = tmx_ref[0]

    occ_ref[0] = jnp.zeros((1, r_lanes), jnp.int32)

    def body(carry):
        r, _ = carry
        occ = occ_ref[0] > 0
        tris = triblk_ref[ids_ref[0, 0, r]]
        tt, _, _ = _mt_rows(o, d, tris, tmn, tmx, False)
        occ = occ | jnp.any(tt < _BIG, axis=1)[None, :]
        occ_ref[0] = occ.astype(jnp.int32)

        nxt = r + 1
        open_max = jnp.max(jnp.where(occ, -_BIG, tmx))
        go = (nxt < n) & (entries_ref[0, 0, jnp.minimum(nxt, n - 1)]
                          <= open_max)
        return nxt, go

    jax.lax.while_loop(lambda c: c[1], body, (0, n > 0))


def _any_kernel(count_ref, ids_ref, entries_ref,
                o_ref, d_ref, tmn_ref, tmx_ref, triblk_ref,
                occ_ref, buf, sems):
    r_lanes = o_ref.shape[1]
    n = count_ref[0, 0, 0]
    o = o_ref[0]
    d = d_ref[0]
    tmn = tmn_ref[0]
    tmx = tmx_ref[0]

    occ_ref[0] = jnp.zeros((1, r_lanes), jnp.int32)

    @pl.when(n > 0)
    def _():
        _dma(triblk_ref, ids_ref, buf, sems, 0).start()

    def body(carry):
        r, _ = carry
        _dma(triblk_ref, ids_ref, buf, sems, r).wait()

        @pl.when(r + 1 < n)
        def _():
            _dma(triblk_ref, ids_ref, buf, sems, r + 1).start()

        occ = occ_ref[0] > 0
        tt, _, _ = _mt_rows(o, d, buf[jax.lax.rem(r, 2)], tmn, tmx, False)
        hit_any = jnp.any(tt < _BIG, axis=1)[None, :]
        occ = occ | hit_any
        occ_ref[0] = occ.astype(jnp.int32)

        nxt = r + 1
        # prune clusters beyond the farthest still-unoccluded segment end
        open_max = jnp.max(jnp.where(occ, -_BIG, tmx))
        go = (nxt < n) & (entries_ref[0, 0, jnp.minimum(nxt, n - 1)]
                          <= open_max)
        return nxt, go

    r_end, _ = jax.lax.while_loop(lambda c: c[1], body, (0, n > 0))

    @pl.when(r_end < n)
    def _():
        _dma(triblk_ref, ids_ref, buf, sems, r_end).wait()


def _prepare(cs: ClusterSet, origins, dirs, tmin, tmax, tile: int):
    """Pad rays, compute the (NT, C) sorted near-to-far walk lists."""
    origins, dirs, tmin, tmax, n_orig, _ = tile_trace._pad_rays(
        origins, dirs, tmin, tmax, tile)
    n = origins.shape[0]
    nt = n // tile
    c = cs.num_clusters
    entries = tile_trace.tile_entries(cs, origins, dirs, tmin, tmax, tile)
    ids = jnp.broadcast_to(jnp.arange(c, dtype=jnp.int32)[None, :], (nt, c))
    entries_s, ids_s = jax.lax.sort((entries, ids), dimension=1, num_keys=1)
    counts = jnp.sum(entries_s < _BIG, axis=1).astype(jnp.int32)
    return (origins, dirs, tmin, tmax, n_orig, n, nt, c,
            entries_s, ids_s, counts)


def _smem_spec(width):
    return pl.BlockSpec((1, 1, width), lambda i: (i, 0, 0),
                        memory_space=pltpu.SMEM)


def _vmem_ray_specs(tile, vmem_resident: bool):
    return [
        pl.BlockSpec((1, tile, 3), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile, 3), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, tile), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, tile), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        # the triangle table: whole-array VMEM residency (no DMA) when it
        # fits, else ANY/HBM with per-round streaming
        pl.BlockSpec(memory_space=pltpu.VMEM) if vmem_resident
        else pl.BlockSpec(memory_space=pltpu.ANY),
    ]


_SCRATCH = [
    pltpu.VMEM((2, 16, 128), jnp.float32),
    pltpu.SemaphoreType.DMA((2,)),
]


@functools.partial(jax.jit,
                   static_argnames=("cull_backface", "tile", "sort_rays",
                                    "interpret", "vmem_resident", "prune"))
def walk_closest(cs: ClusterSet, origins, dirs, tmin, tmax,
                 cull_backface: bool = True, tile: int = 256,
                 sort_rays: bool = False, interpret: bool = False,
                 vmem_resident: bool = True, prune: bool = True) -> Hit:
    """Closest-hit traversal; same contract as tile_trace.tile_closest."""
    ray_perm = None
    if sort_rays:
        key = tile_trace.ray_sort_key_live(cs.cmin, cs.cmax, origins,
                                           dirs, tmin, tmax)
        ray_perm = jnp.argsort(key).astype(jnp.int32)
        origins, dirs = origins[ray_perm], dirs[ray_perm]
        tmin, tmax = tmin[ray_perm], tmax[ray_perm]
    (origins, dirs, tmin, tmax, n_orig, n, nt, c,
     entries_s, ids_s, counts) = _prepare(cs, origins, dirs, tmin, tmax, tile)
    bases_s = jnp.take(cs.tri_begin, ids_s).astype(jnp.int32)

    grid_spec = pl.GridSpec(
        grid=(nt,),
        in_specs=[_smem_spec(1), _smem_spec(c), _smem_spec(c),
                  _smem_spec(c)] + _vmem_ray_specs(tile, vmem_resident),
        out_specs=[pl.BlockSpec((1, 1, tile), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)] * 4,
        scratch_shapes=[] if vmem_resident else _SCRATCH,
    )
    kernel = functools.partial(
        _closest_kernel_vmem if vmem_resident else _closest_kernel,
        cull=cull_backface)
    if vmem_resident:
        kernel = functools.partial(kernel, prune=prune)
    bt, bid, bu, bv = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        out_shape=[
            jax.ShapeDtypeStruct((nt, 1, tile), jnp.float32),
            jax.ShapeDtypeStruct((nt, 1, tile), jnp.int32),
            jax.ShapeDtypeStruct((nt, 1, tile), jnp.float32),
            jax.ShapeDtypeStruct((nt, 1, tile), jnp.float32),
        ],
    )(counts.reshape(nt, 1, 1), ids_s.reshape(nt, 1, c),
      bases_s.reshape(nt, 1, c),
      jnp.asarray(entries_s, jnp.float32).reshape(nt, 1, c),
      origins.reshape(nt, tile, 3), dirs.reshape(nt, tile, 3),
      tmin.reshape(nt, 1, tile), tmax.reshape(nt, 1, tile), cs.tri_block)

    out = [a.reshape(n)[:n_orig] for a in (bt, bid, bu, bv)]
    if ray_perm is not None:
        out = [jnp.zeros_like(a).at[ray_perm].set(a) for a in out]
    bt, bid, bu, bv = out
    found = bid >= 0
    return Hit(t=jnp.where(found, bt, _BIG), tri=bid,
               u=jnp.where(found, bu, 0.0), v=jnp.where(found, bv, 0.0))


@functools.partial(jax.jit,
                   static_argnames=("tile", "sort_rays", "interpret",
                                    "vmem_resident"))
def walk_any(cs: ClusterSet, origins, dirs, tmin, tmax, tile: int = 256,
             sort_rays: bool = False, interpret: bool = False,
             vmem_resident: bool = True):
    """Any-hit (occlusion) traversal; same contract as tile_trace.tile_any.
    No back-face culling (reference cuProg.h:478)."""
    ray_perm = None
    if sort_rays:
        key = tile_trace.ray_sort_key_live(cs.cmin, cs.cmax, origins,
                                           dirs, tmin, tmax)
        ray_perm = jnp.argsort(key).astype(jnp.int32)
        origins, dirs = origins[ray_perm], dirs[ray_perm]
        tmin, tmax = tmin[ray_perm], tmax[ray_perm]
    (origins, dirs, tmin, tmax, n_orig, n, nt, c,
     entries_s, ids_s, counts) = _prepare(cs, origins, dirs, tmin, tmax, tile)

    grid_spec = pl.GridSpec(
        grid=(nt,),
        in_specs=[_smem_spec(1), _smem_spec(c), _smem_spec(c)]
        + _vmem_ray_specs(tile, vmem_resident),
        out_specs=[pl.BlockSpec((1, 1, tile), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)],
        scratch_shapes=[] if vmem_resident else _SCRATCH,
    )
    (occ,) = pl.pallas_call(
        _any_kernel_vmem if vmem_resident else _any_kernel,
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        out_shape=[jax.ShapeDtypeStruct((nt, 1, tile), jnp.int32)],
    )(counts.reshape(nt, 1, 1), ids_s.reshape(nt, 1, c),
      jnp.asarray(entries_s, jnp.float32).reshape(nt, 1, c),
      origins.reshape(nt, tile, 3), dirs.reshape(nt, tile, 3),
      tmin.reshape(nt, 1, tile), tmax.reshape(nt, 1, tile), cs.tri_block)

    occ = (occ.reshape(n)[:n_orig]) > 0
    if ray_perm is not None:
        occ = jnp.zeros_like(occ).at[ray_perm].set(occ)
    return occ
