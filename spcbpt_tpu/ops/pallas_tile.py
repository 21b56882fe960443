"""Fused Pallas traversal kernel: the whole tiled two-level cluster walk of
ops/tile_trace.py in one kernel, VMEM-resident.

Why: the XLA formulation bottoms out at ~20 Mrays/s because every round
materializes (N, 4K) matmul outputs and epilogue temporaries in HBM and all
tiles step in lock-step (per-bucket while_loops only soften that). Here each
grid program owns a block of TB ray-tiles and walks clusters privately:

  per program:
    1. compute conservative per-tile cluster entry bounds in VMEM
       (interval slab test, ops/tile_trace.tile_entries semantics)
    2. while any tile active:
       a. pick each tile's next cluster ((entry, id)-lexicographic min over
          the (TB, C) entry table — VPU)
       b. DMA the chosen (16, 128) raw triangle blocks to VMEM scratch
       c. direct Moller-Trumbore on the VPU (~45 flops per ray-triangle,
          exact f32 — beats the MXU feature-matmul whose 16-wide contraction
          wastes 8x in padding and 3-6x in f32 passes); hit test and
          min-by-t reduce entirely in VMEM
    3. write best (t, tri, u, v) blocks

so per-round HBM traffic is just the triangle DMAs (8 KB per tile) and
stragglers only stall their own TB-tile program. All mutable walk state lives
in VMEM scratch/output refs and the while_loop carries a single scalar —
Mosaic cannot legalize loop-carried vectors in padded layouts. Math contract
identical to ops/tile_trace.py; oracle tests compare both against brute force
(tests/test_tile_trace.py, tests/test_pallas_tile.py).
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
    """(TB,C) entries + (TB,1) last state -> per-tile lexicographic next
    (entry, id), both (TB,1)."""
    tb, c = entries.shape
    ids = jax.lax.broadcasted_iota(jnp.int32, (tb, c), 1)
    cand = (entries > last_e) | ((entries == last_e) & (ids > last_c))
    e = jnp.where(cand, entries, _BIG)
    e_min = jnp.min(e, axis=1, keepdims=True)
    at_min = (e == e_min) & cand
    c_min = jnp.min(jnp.where(at_min, ids, c), axis=1,
                    keepdims=True).astype(jnp.int32)
    return e_min, c_min


def _mt_vpu(o, d, tris, tmn, tmx, cull):
    """Direct Moller-Trumbore on the VPU: o/d (TB,R,3), tris (TB,16,128)
    packed [p0,e1,e2] in rows 0..8 (zero slots never hit). Returns
    (tt, u, v) with tt = t where hit else _BIG.
    ~45 flops per (ray, triangle), exact f32 — cheaper than the MXU
    feature-matmul (16-wide contraction = 8x padding, x3-6 f32 passes)."""
    ray = lambda x: x[..., None]           # (TB, R, 1)
    tri = lambda x: x[:, None, :]          # (TB, 1, K)
    ox, oy, oz = ray(o[..., 0]), ray(o[..., 1]), ray(o[..., 2])
    dx, dy, dz = ray(d[..., 0]), ray(d[..., 1]), ray(d[..., 2])
    p0x, p0y, p0z = tri(tris[:, 0]), tri(tris[:, 1]), tri(tris[:, 2])
    e1x, e1y, e1z = tri(tris[:, 3]), tri(tris[:, 4]), tri(tris[:, 5])
    e2x, e2y, e2z = tri(tris[:, 6]), tri(tris[:, 7]), tri(tris[:, 8])

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
        & (t > tmn[..., None]) & (t < tmx[..., None])
    return jnp.where(hit, t, _BIG), u, v


def _mt_split(outs, tb, r, k, tmn, tmx, cull, run):
    """Matmul outputs -> (tt, u_num, v_num, det): tt = hit distance or _BIG."""
    outs = outs.reshape(tb, r, 4, k)
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
        & (t > tmn[..., None]) & (t < tmx[..., None]) & run[..., None]
    return jnp.where(hit, t, _BIG), u_num, v_num, det


def _closest_kernel(o_ref, d_ref, tmn_ref, tmx_ref, cmin_ref, cmax_ref,
                    tbg_ref, triblk_ref,
                    bt_ref, bid_ref, bu_ref, bv_ref,
                    block_scr, ste_scr, stc_scr, sems,
                    *, k: int, cull: bool):
    """Mutable state: output refs (best t/tri/u/v), ste_scr (TB,1) f32 last
    entry, stc_scr (TB,2) i32 [last cluster, tile-active]. The while_loop
    carries a single scalar."""
    _, tb, r, _ = o_ref.shape
    o = o_ref[0]
    d = d_ref[0]
    tmn = tmn_ref[0]
    tmx = tmx_ref[0]
    entries = _block_entries(o, d, tmn, tmx, cmin_ref[...], cmax_ref[...])
    kl = 128
    slot = jax.lax.broadcasted_iota(jnp.int32, (tb, r, kl), 2)

    bt_ref[0] = jnp.full((tb, r), _BIG)
    bid_ref[0] = jnp.full((tb, r), -1, jnp.int32)
    bu_ref[0] = jnp.zeros((tb, r))
    bv_ref[0] = jnp.zeros((tb, r))
    ste_scr[...] = jnp.full((tb, 1), -_BIG)
    stc_scr[...] = jnp.concatenate(
        [jnp.full((tb, 1), -1, jnp.int32), jnp.ones((tb, 1), jnp.int32)],
        axis=1)

    def cond(go):
        return go

    def body(_):
        best_t = bt_ref[0]
        last_e = ste_scr[...]
        last_c = stc_scr[:, 0:1]
        active = stc_scr[:, 1:2] > 0
        e, cid = _next_cluster(entries, last_e, last_c)
        t_bound = jnp.max(jnp.minimum(best_t, tmx), axis=1, keepdims=True)
        run = active & (e < _BIG) & (e <= t_bound)        # (TB, 1)
        cid_safe = jnp.where(run, cid, 0)

        bases = []
        for j in range(tb):
            pltpu.make_async_copy(triblk_ref.at[cid_safe[j, 0]],
                                  block_scr.at[j], sems.at[j]).start()
        for j in range(tb):
            pltpu.make_async_copy(triblk_ref.at[cid_safe[j, 0]],
                                  block_scr.at[j], sems.at[j]).wait()
            bases.append(tbg_ref[cid_safe[j, 0], 0])

        tt, u, v = _mt_vpu(o, d, block_scr[...], tmn,
                           jnp.minimum(best_t, tmx), cull)
        tt = jnp.where(run[..., None], tt, _BIG)
        t_min = jnp.min(tt, axis=2)
        improved = t_min < best_t
        at_min = tt == t_min[..., None]
        s_pick = jnp.min(jnp.where(at_min, slot, kl), axis=2)
        pick = at_min & (slot == s_pick[..., None])
        u_p = jnp.sum(jnp.where(pick, u, 0.0), axis=2)
        v_p = jnp.sum(jnp.where(pick, v, 0.0), axis=2)
        tri = jnp.stack(bases)[:, None] + s_pick
        bid_ref[0] = jnp.where(improved, tri, bid_ref[0])
        bu_ref[0] = jnp.where(improved, u_p, bu_ref[0])
        bv_ref[0] = jnp.where(improved, v_p, bv_ref[0])
        bt_ref[0] = jnp.where(improved, t_min, best_t)

        ste_scr[...] = jnp.where(run, e, last_e)
        new_active = (active & run).astype(jnp.int32)
        stc_scr[...] = jnp.concatenate(
            [jnp.where(run, cid, last_c), new_active], axis=1)
        return jnp.sum(new_active) > 0

    jax.lax.while_loop(cond, body, jnp.bool_(True))


def _any_kernel(o_ref, d_ref, tmn_ref, tmx_ref, cmin_ref, cmax_ref,
                triblk_ref, occ_ref,
                block_scr, ste_scr, stc_scr, sems, *, k: int):
    _, tb, r, _ = o_ref.shape
    o = o_ref[0]
    d = d_ref[0]
    tmn = tmn_ref[0]
    tmx = tmx_ref[0]
    entries = _block_entries(o, d, tmn, tmx, cmin_ref[...], cmax_ref[...])

    occ_ref[0] = jnp.zeros((tb, r), jnp.int32)
    ste_scr[...] = jnp.full((tb, 1), -_BIG)
    stc_scr[...] = jnp.concatenate(
        [jnp.full((tb, 1), -1, jnp.int32), jnp.ones((tb, 1), jnp.int32)],
        axis=1)

    def cond(go):
        return go

    def body(_):
        occ = occ_ref[0] > 0
        last_e = ste_scr[...]
        last_c = stc_scr[:, 0:1]
        active = stc_scr[:, 1:2] > 0
        e, cid = _next_cluster(entries, last_e, last_c)
        all_done = jnp.all(occ | (tmx < tmn), axis=1, keepdims=True)
        run = active & (e < _BIG) & ~all_done
        cid_safe = jnp.where(run, cid, 0)

        for j in range(tb):
            pltpu.make_async_copy(triblk_ref.at[cid_safe[j, 0]],
                                  block_scr.at[j], sems.at[j]).start()
        for j in range(tb):
            pltpu.make_async_copy(triblk_ref.at[cid_safe[j, 0]],
                                  block_scr.at[j], sems.at[j]).wait()

        tt, _, _ = _mt_vpu(o, d, block_scr[...], tmn, tmx, False)
        tt = jnp.where(run[..., None], tt, _BIG)
        occ = occ | jnp.any(tt < _BIG, axis=2)
        occ_ref[0] = occ.astype(jnp.int32)

        ste_scr[...] = jnp.where(run, e, last_e)
        new_active = (active & run).astype(jnp.int32)
        stc_scr[...] = jnp.concatenate(
            [jnp.where(run, cid, last_c), new_active], axis=1)
        return jnp.sum(new_active) > 0

    jax.lax.while_loop(cond, body, jnp.bool_(True))


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


def _ray_specs(tb, r, c, with_tbg):
    specs = [
        pl.BlockSpec((1, tb, r, 3), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tb, r, 3), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tb, r), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tb, r), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((c, 3), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((c, 3), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    if with_tbg:
        specs.append(pl.BlockSpec((c, 1), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM))
    specs.append(pl.BlockSpec(memory_space=pltpu.ANY))
    return specs


def _out_spec(tb, r):
    return pl.BlockSpec((1, tb, r), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.jit,
                   static_argnames=("cull_backface", "tile", "tiles_per_block"))
def pallas_closest(cs: ClusterSet, origins, dirs, tmin, tmax,
                   cull_backface: bool = True, tile: int = 128,
                   tiles_per_block: int = 8) -> Hit:
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
        in_specs=_ray_specs(tb, r, c, with_tbg=True),
        out_specs=[_out_spec(tb, r)] * 4,
        scratch_shapes=[
            pltpu.VMEM((tb, 16, 128), jnp.float32),
            pltpu.VMEM((tb, 1), jnp.float32),
            pltpu.VMEM((tb, 2), jnp.int32),
            pltpu.SemaphoreType.DMA((tb,)),
        ],
    )
    kernel = functools.partial(_closest_kernel, k=k, cull=cull_backface)
    bt, bid, bu, bv = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        out_shape=[
            jax.ShapeDtypeStruct((nb, tb, r), jnp.float32),
            jax.ShapeDtypeStruct((nb, tb, r), jnp.int32),
            jax.ShapeDtypeStruct((nb, tb, r), jnp.float32),
            jax.ShapeDtypeStruct((nb, tb, r), jnp.float32),
        ],
    )(origins.reshape(nb, tb, r, 3), dirs.reshape(nb, tb, r, 3),
      tmin.reshape(nb, tb, r), tmax.reshape(nb, tb, r),
      cs.cmin, cs.cmax, cs.tri_begin.reshape(-1, 1), cs.tri_block)

    bt = bt.reshape(n)[:n_orig]
    bid = bid.reshape(n)[:n_orig]
    found = bid >= 0
    return Hit(t=jnp.where(found, bt, _BIG), tri=bid,
               u=jnp.where(found, bu.reshape(n)[:n_orig], 0.0),
               v=jnp.where(found, bv.reshape(n)[:n_orig], 0.0))


@functools.partial(jax.jit, static_argnames=("tile", "tiles_per_block"))
def pallas_any(cs: ClusterSet, origins, dirs, tmin, tmax, tile: int = 128,
               tiles_per_block: int = 8):
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
        in_specs=_ray_specs(tb, r, c, with_tbg=False),
        out_specs=[_out_spec(tb, r)],
        scratch_shapes=[
            pltpu.VMEM((tb, 16, 128), jnp.float32),
            pltpu.VMEM((tb, 1), jnp.float32),
            pltpu.VMEM((tb, 2), jnp.int32),
            pltpu.SemaphoreType.DMA((tb,)),
        ],
    )
    kernel = functools.partial(_any_kernel, k=k)
    (occ,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        out_shape=[jax.ShapeDtypeStruct((nb, tb, r), jnp.int32)],
    )(origins.reshape(nb, tb, r, 3), dirs.reshape(nb, tb, r, 3),
      tmin.reshape(nb, tb, r), tmax.reshape(nb, tb, r),
      cs.cmin, cs.cmax, cs.tri_block)
    return (occ.reshape(n)[:n_orig]) > 0


# ---------------------------------------------------------------------------
# per-round fused kernel for the XLA-orchestrated walk (ops/tile_trace.py)
# ---------------------------------------------------------------------------

def _round_kernel(o_ref, d_ref, tris_ref, tmn_ref, tmx_ref,
                  t_ref, u_ref, v_ref, dn_ref, s_ref, *, k: int, cull: bool):
    """One traversal round for TBK tiles: direct Moller-Trumbore on the VPU
    over each tile's gathered (16, 128) triangle block, hit test and min-by-t
    reduce all in VMEM. Direct MT costs ~45 VPU flops per (ray, triangle) —
    cheaper than the MXU feature-matmul (128 useful flops/tri at 16-wide
    contraction = 8x padding, x3-6 for f32 passes) and exact f32. The XLA
    formulation of the same math runs ~5x slower because the (R, K)
    intermediates and their epilogue spill to HBM."""
    tbk, r, _ = o_ref.shape
    tt, u, v = _mt_vpu(o_ref[...], d_ref[...], tris_ref[...],
                       tmn_ref[...], tmx_ref[...], cull)
    t_min = jnp.min(tt, axis=2)
    at_min = (tt == t_min[..., None]) & (tt < _BIG)
    slot = jax.lax.broadcasted_iota(jnp.int32, (tbk, r, k), 2)
    s_pick = jnp.min(jnp.where(at_min, slot, k), axis=2)
    pick = at_min & (slot == s_pick[..., None])
    t_ref[...] = t_min
    u_ref[...] = jnp.sum(jnp.where(pick, u, 0.0), axis=2)
    v_ref[...] = jnp.sum(jnp.where(pick, v, 0.0), axis=2)
    dn_ref[...] = jnp.ones((tbk, r))
    s_ref[...] = s_pick


def mt_round(origins, dirs, tris, tmn, tmax_eff, cull_backface: bool,
             tiles_per_block: int = 8):
    """Fused traversal round. origins/dirs (NT,R,3), tris (NT,16,128)
    gathered triangle blocks, tmn/tmax_eff (NT,R). Returns per-lane
    (t_min, u, v, ones, slot) with t_min = _BIG on miss."""
    nt, r, _ = origins.shape
    k = tris.shape[2]
    tbk = tiles_per_block
    pad = (-nt) % tbk
    if pad:
        padf = lambda a: jnp.concatenate(
            [a, jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])])
        origins, dirs, tris, tmn, tmax_eff = (
            padf(a) for a in (origins, dirs, tris, tmn, tmax_eff))
    nt_p = nt + pad
    grid_spec = pl.GridSpec(
        grid=(nt_p // tbk,),
        in_specs=[
            pl.BlockSpec((tbk, r, 3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tbk, r, 3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tbk, 16, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tbk, r), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tbk, r), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((tbk, r), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)] * 5,
    )
    kernel = functools.partial(_round_kernel, k=k, cull=cull_backface)
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        out_shape=[
            jax.ShapeDtypeStruct((nt_p, r), jnp.float32),
            jax.ShapeDtypeStruct((nt_p, r), jnp.float32),
            jax.ShapeDtypeStruct((nt_p, r), jnp.float32),
            jax.ShapeDtypeStruct((nt_p, r), jnp.float32),
            jax.ShapeDtypeStruct((nt_p, r), jnp.int32),
        ],
    )(origins, dirs, tris, tmn, tmax_eff)
    return tuple(a[:nt] for a in outs)
