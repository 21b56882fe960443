"""Fused Pallas traversal kernel: the whole tiled two-level cluster walk of
ops/tile_trace.py in one kernel, VMEM-resident.

Why: the XLA formulation bottoms out at ~20 Mrays/s because every round
materializes (N, 4K) matmul outputs and epilogue temporaries in HBM and all
tiles step in lock-step (per-bucket while_loops only soften that). Here each
grid program owns a block of TB ray-tiles and walks clusters privately:

  per program:
    1. compute ray features and conservative per-tile cluster entry bounds
       in VMEM (interval slab test, ops/tile_trace.tile_entries semantics)
    2. while any tile active:
       a. pick each tile's next cluster ((entry, id)-lexicographic min over
          the (TB, C) entry table — VPU)
       b. DMA the chosen (16, 4K) coefficient blocks from HBM to VMEM
       c. one (R,16)x(16,4K) MXU matmul per tile; epilogue reduces hit t
          and winner numerators entirely in VMEM
    3. write best (t, tri, u, v) blocks

so per-round HBM traffic is just the coefficient DMAs (~16 KB per tile) and
stragglers only stall their own TB-tile program. Math contract identical to
ops/tile_trace.py; oracle tests compare both against brute force.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .clusters import ClusterSet
from .intersect import Hit

_BIG = 1e30
_EPS_DET = 1e-10


def _features(o, d):
    """(TB,R,3)x2 -> (TB,R,16): [vec(o d^T), d, o, 1] (ops/clusters.py)."""
    parts = [o[..., 0:1] * d, o[..., 1:2] * d, o[..., 2:3] * d, d, o,
             jnp.ones(o.shape[:-1] + (1,), o.dtype)]
    return jnp.concatenate(parts, axis=-1)


def _block_entries(o, d, tmn, tmx, cmin, cmax):
    """(TB,R,3) rays vs (C,3) cluster AABBs -> (TB,C) conservative entry
    lower bounds (_BIG where provably no overlap). Same interval math as
    tile_trace.tile_entries."""
    olo = jnp.min(o, axis=1)[:, None, :]
    ohi = jnp.max(o, axis=1)[:, None, :]
    dlo = jnp.min(d, axis=1)[:, None, :]
    dhi = jnp.max(d, axis=1)[:, None, :]
    tmin_lb = jnp.min(tmn, axis=1)
    tmax_ub = jnp.max(tmx, axis=1)

    straddle = (dlo <= 0.0) & (dhi >= 0.0)
    safe_lo = jnp.where(jnp.abs(dlo) < 1e-12,
                        jnp.where(dlo < 0, -1e-12, 1e-12), dlo)
    safe_hi = jnp.where(jnp.abs(dhi) < 1e-12,
                        jnp.where(dhi < 0, -1e-12, 1e-12), dhi)
    il = jnp.minimum(1.0 / safe_lo, 1.0 / safe_hi)
    ih = jnp.maximum(1.0 / safe_lo, 1.0 / safe_hi)

    bmin = cmin[None, :, :]
    bmax = cmax[None, :, :]
    a_lo = bmin - ohi
    a_hi = bmin - olo
    b_lo = bmax - ohi
    b_hi = bmax - olo
    lo_ab = jnp.minimum(a_lo, b_lo)
    hi_ab = jnp.maximum(a_hi, b_hi)
    p1 = lo_ab * il
    p2 = lo_ab * ih
    p3 = hi_ab * il
    p4 = hi_ab * ih
    ax_lo = jnp.minimum(jnp.minimum(p1, p2), jnp.minimum(p3, p4))
    ax_hi = jnp.maximum(jnp.maximum(p1, p2), jnp.maximum(p3, p4))
    ax_lo = jnp.where(straddle, -_BIG, ax_lo)
    ax_hi = jnp.where(straddle, _BIG, ax_hi)
    entry = jnp.max(ax_lo, axis=-1)
    exit_ = jnp.min(ax_hi, axis=-1)
    overlap = (entry <= exit_) & (exit_ >= tmin_lb[:, None]) \
        & (entry <= tmax_ub[:, None])
    return jnp.where(overlap, entry, _BIG)


def _next_cluster(entries, last_e, last_c):
    """(TB,C) entries -> per-tile lexicographic next (entry, id)."""
    tb, c = entries.shape
    ids = jax.lax.broadcasted_iota(jnp.int32, (tb, c), 1)
    cand = (entries > last_e[:, None]) | (
        (entries == last_e[:, None]) & (ids > last_c[:, None]))
    e = jnp.where(cand, entries, _BIG)
    e_min = jnp.min(e, axis=1)
    at_min = (e == e_min[:, None]) & cand
    c_min = jnp.min(jnp.where(at_min, ids, c), axis=1).astype(jnp.int32)
    return e_min, c_min


def _closest_kernel(o_ref, d_ref, tmn_ref, tmx_ref, cmin_ref, cmax_ref,
                    tbg_ref, coeff_ref,
                    bt_ref, bid_ref, bu_ref, bv_ref,
                    block_scr, outs_scr, sems,
                    *, k: int, cull: bool):
    tb, r, _ = o_ref.shape
    c = cmin_ref.shape[0]
    o = o_ref[...]
    d = d_ref[...]
    tmn = tmn_ref[...]
    tmx = tmx_ref[...]
    feats = _features(o, d)
    entries = _block_entries(o, d, tmn, tmx, cmin_ref[...], cmax_ref[...])
    slot = jax.lax.broadcasted_iota(jnp.int32, (tb, r, k), 2)

    def cond(state):
        *_, active, last_e, last_c = state
        return jnp.any(active)

    def body(state):
        best_t, best_id, best_un, best_vn, best_dn, active, last_e, last_c \
            = state
        e, cid = _next_cluster(entries, last_e, last_c)
        t_bound = jnp.max(jnp.minimum(best_t, tmx), axis=1)
        run = active & (e < _BIG) & (e <= t_bound)
        cid_safe = jnp.where(run, cid, 0)

        bases = []
        for j in range(tb):
            pltpu.make_async_copy(coeff_ref.at[cid_safe[j]],
                                  block_scr.at[j], sems.at[j]).start()
        for j in range(tb):
            pltpu.make_async_copy(coeff_ref.at[cid_safe[j]],
                                  block_scr.at[j], sems.at[j]).wait()
            outs_scr[j] = jnp.dot(feats[j], block_scr[j],
                                  preferred_element_type=jnp.float32)
            bases.append(tbg_ref[cid_safe[j], 0])

        outs = outs_scr[...].reshape(tb, r, 4, k)
        u_num = outs[:, :, 0]
        v_num = outs[:, :, 1]
        t_num = outs[:, :, 2]
        det = outs[:, :, 3]
        if cull:
            det_ok = det > _EPS_DET
            s_u, s_v, s_det = u_num, v_num, det
        else:
            det_ok = jnp.abs(det) > _EPS_DET
            sgn = jnp.sign(det)
            s_u, s_v, s_det = u_num * sgn, v_num * sgn, jnp.abs(det)
        inv = jnp.where(det_ok, 1.0 / jnp.where(det_ok, det, 1.0), 0.0)
        t = t_num * inv
        hit = det_ok & (s_u >= 0.0) & (s_v >= 0.0) & (s_u + s_v <= s_det) \
            & (t > tmn[..., None]) \
            & (t < jnp.minimum(best_t, tmx)[..., None]) \
            & run[:, None, None]
        tt = jnp.where(hit, t, _BIG)
        t_min = jnp.min(tt, axis=2)
        improved = t_min < best_t
        at_min = tt == t_min[..., None]
        s_pick = jnp.min(jnp.where(at_min, slot, k), axis=2)
        pick = at_min & (slot == s_pick[..., None])
        u_np = jnp.sum(jnp.where(pick, u_num, 0.0), axis=2)
        v_np = jnp.sum(jnp.where(pick, v_num, 0.0), axis=2)
        d_np = jnp.sum(jnp.where(pick, det, 0.0), axis=2)
        tri = jnp.stack(bases)[:, None] + s_pick
        best_id = jnp.where(improved, tri, best_id)
        best_un = jnp.where(improved, u_np, best_un)
        best_vn = jnp.where(improved, v_np, best_vn)
        best_dn = jnp.where(improved, d_np, best_dn)
        best_t = jnp.where(improved, t_min, best_t)
        return (best_t, best_id, best_un, best_vn, best_dn,
                active & run, jnp.where(run, e, last_e),
                jnp.where(run, cid, last_c))

    state = (jnp.full((tb, r), _BIG),
             jnp.full((tb, r), -1, jnp.int32),
             jnp.zeros((tb, r)), jnp.zeros((tb, r)), jnp.ones((tb, r)),
             jnp.ones((tb,), bool),
             jnp.full((tb,), -_BIG), jnp.full((tb,), -1, jnp.int32))
    best_t, best_id, best_un, best_vn, best_dn, *_ = jax.lax.while_loop(
        cond, body, state)
    inv = 1.0 / jnp.where(jnp.abs(best_dn) > 0, best_dn, 1.0)
    bt_ref[...] = best_t
    bid_ref[...] = best_id
    bu_ref[...] = best_un * inv
    bv_ref[...] = best_vn * inv


def _any_kernel(o_ref, d_ref, tmn_ref, tmx_ref, cmin_ref, cmax_ref,
                coeff_ref, occ_ref, block_scr, outs_scr, sems, *, k: int):
    tb, r, _ = o_ref.shape
    o = o_ref[...]
    d = d_ref[...]
    tmn = tmn_ref[...]
    tmx = tmx_ref[...]
    feats = _features(o, d)
    entries = _block_entries(o, d, tmn, tmx, cmin_ref[...], cmax_ref[...])

    def cond(state):
        occ, active, last_e, last_c = state
        return jnp.any(active)

    def body(state):
        occ, active, last_e, last_c = state
        e, cid = _next_cluster(entries, last_e, last_c)
        all_done = jnp.all(occ | (tmx < tmn), axis=1)
        run = active & (e < _BIG) & ~all_done
        cid_safe = jnp.where(run, cid, 0)

        for j in range(tb):
            pltpu.make_async_copy(coeff_ref.at[cid_safe[j]],
                                  block_scr.at[j], sems.at[j]).start()
        for j in range(tb):
            pltpu.make_async_copy(coeff_ref.at[cid_safe[j]],
                                  block_scr.at[j], sems.at[j]).wait()
            outs_scr[j] = jnp.dot(feats[j], block_scr[j],
                                  preferred_element_type=jnp.float32)

        outs = outs_scr[...].reshape(tb, r, 4, k)
        u_num = outs[:, :, 0]
        v_num = outs[:, :, 1]
        t_num = outs[:, :, 2]
        det = outs[:, :, 3]
        det_ok = jnp.abs(det) > _EPS_DET
        sgn = jnp.sign(det)
        s_u, s_v, s_det = u_num * sgn, v_num * sgn, jnp.abs(det)
        inv = jnp.where(det_ok, 1.0 / jnp.where(det_ok, det, 1.0), 0.0)
        t = t_num * inv
        hit = det_ok & (s_u >= 0.0) & (s_v >= 0.0) & (s_u + s_v <= s_det) \
            & (t > tmn[..., None]) & (t < tmx[..., None]) \
            & run[:, None, None]
        occ = occ | jnp.any(hit, axis=2)
        return (occ, active & run, jnp.where(run, e, last_e),
                jnp.where(run, cid, last_c))

    state = (jnp.zeros((tb, r), bool), jnp.ones((tb,), bool),
             jnp.full((tb,), -_BIG), jnp.full((tb,), -1, jnp.int32))
    occ, *_ = jax.lax.while_loop(cond, body, state)
    occ_ref[...] = occ.astype(jnp.uint8)


def _pad(origins, dirs, tmin, tmax, lanes):
    n = origins.shape[0]
    pad = (-n) % lanes
    if pad:
        origins = jnp.concatenate([origins, jnp.zeros((pad, 3), origins.dtype)])
        dirs = jnp.concatenate(
            [dirs, jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], dirs.dtype),
                                    (pad, 3))])
        tmin = jnp.concatenate([tmin, jnp.zeros((pad,), tmin.dtype)])
        tmax = jnp.concatenate([tmax, jnp.full((pad,), -1.0, tmax.dtype)])
    return origins, dirs, tmin, tmax, n


@functools.partial(jax.jit,
                   static_argnames=("cull_backface", "tile", "tiles_per_block"))
def pallas_closest(cs: ClusterSet, origins, dirs, tmin, tmax,
                   cull_backface: bool = True, tile: int = 64,
                   tiles_per_block: int = 4) -> Hit:
    """Closest-hit traversal via the fused kernel. Same contract as
    tile_trace.tile_closest."""
    tb = tiles_per_block
    r = tile
    lanes = tb * r
    origins, dirs, tmin, tmax, n_orig = _pad(origins, dirs, tmin, tmax, lanes)
    n = origins.shape[0]
    nb = n // lanes
    c = cs.num_clusters
    k = cs.tri_k

    grid_spec = pl.GridSpec(
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((tb, r, 3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, r, 3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, r), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, r), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((tb, r), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, r), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, r), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, r), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((tb, 16, 4 * k), jnp.float32),
            pltpu.VMEM((tb, r, 4 * k), jnp.float32),
            pltpu.SemaphoreType.DMA((tb,)),
        ],
    )
    kernel = functools.partial(_closest_kernel, k=k, cull=cull_backface)
    bt, bid, bu, bv = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nb * tb, r), jnp.float32),
            jax.ShapeDtypeStruct((nb * tb, r), jnp.int32),
            jax.ShapeDtypeStruct((nb * tb, r), jnp.float32),
            jax.ShapeDtypeStruct((nb * tb, r), jnp.float32),
        ],
    )(origins.reshape(nb * tb, r, 3), dirs.reshape(nb * tb, r, 3),
      tmin.reshape(nb * tb, r), tmax.reshape(nb * tb, r),
      cs.cmin, cs.cmax, cs.tri_begin.reshape(-1, 1), cs.coeff)

    bt = bt.reshape(n)[:n_orig]
    bid = bid.reshape(n)[:n_orig]
    found = bid >= 0
    return Hit(t=jnp.where(found, bt, _BIG), tri=bid,
               u=jnp.where(found, bu.reshape(n)[:n_orig], 0.0),
               v=jnp.where(found, bv.reshape(n)[:n_orig], 0.0))


@functools.partial(jax.jit, static_argnames=("tile", "tiles_per_block"))
def pallas_any(cs: ClusterSet, origins, dirs, tmin, tmax, tile: int = 64,
               tiles_per_block: int = 4):
    """Any-hit (occlusion) traversal via the fused kernel."""
    tb = tiles_per_block
    r = tile
    lanes = tb * r
    origins, dirs, tmin, tmax, n_orig = _pad(origins, dirs, tmin, tmax, lanes)
    n = origins.shape[0]
    nb = n // lanes
    c = cs.num_clusters
    k = cs.tri_k

    grid_spec = pl.GridSpec(
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((tb, r, 3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, r, 3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, r), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, r), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((tb, r), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((tb, 16, 4 * k), jnp.float32),
            pltpu.VMEM((tb, r, 4 * k), jnp.float32),
            pltpu.SemaphoreType.DMA((tb,)),
        ],
    )
    kernel = functools.partial(_any_kernel, k=k)
    (occ,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((nb * tb, r), jnp.uint8)],
    )(origins.reshape(nb * tb, r, 3), dirs.reshape(nb * tb, r, 3),
      tmin.reshape(nb * tb, r), tmax.reshape(nb * tb, r),
      cs.cmin, cs.cmax, cs.coeff)
    return occ.reshape(n)[:n_orig].astype(bool)
