"""Two-level traversal clusters: cut the SAH BVH into contiguous triangle
blocks and pack per-triangle Moller-Trumbore coefficient matrices for MXU
intersection.

Replaces OptiX hardware BVH traversal (reference: sutil/Scene.cpp
buildMeshAccels:943 + optixTrace cuProg.h:434) with a TPU-native scheme:
a flat top level of a few hundred cluster AABBs (dense VPU slab tests) over
leaf blocks of <=K triangles whose ray tests run as one batched matmul on the
MXU (see ops/tile_trace.py for the math and the traversal loop).

The key packing trick: for a triangle (p0, e1, e2) with n = e1 x e2, the
Moller-Trumbore quantities are all linear in the 16-dim ray feature vector
F = [vec(o x d outer, 9), d (3), o (3), 1]:
    u_num = (o-p0).(d x e2)   -> o_i d_j coeffs  eps_ijk e2_k, d coeff -(e2 x p0)
    v_num = ((o-p0) x e1).d   -> o_i d_j coeffs -eps_ijk e1_k, d coeff -(p0 x e1)
    t_num = (o-p0).n          -> o coeff n, const -p0.n
    det   = (d x e2).e1       -> d coeff  e2 x e1 = -n
so a cluster of K triangles becomes a (16, 4K) matrix and testing R rays is a
(R,16)x(16,4K) matmul. Triangle ids are reconstructed as
tri_begin[cluster] + slot (clusters are contiguous ranges of the reordered
triangle array).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct

from .bvh import FlatBVH

FEAT_DIM = 16
N_OUT = 4  # u_num, v_num, t_num, det


@struct.dataclass
class ClusterSet:
    cmin: jnp.ndarray      # (C, 3) cluster AABB min
    cmax: jnp.ndarray      # (C, 3)
    coeff: jnp.ndarray     # (C, 16, 4*K) triangle coefficient blocks
    tri_block: jnp.ndarray  # (C, 16, 128) raw [p0, e1, e2] rows 0..8 per
                            # cluster slot, zero-padded to the f32 VMEM tile
                            # (16, 128) so Pallas kernels can DMA-slice it —
                            # direct VPU Moller-Trumbore input (8KB/cluster)
    tri_begin: jnp.ndarray  # (C,) int32 first (reordered) triangle id
    # reordered triangle geometry for the exact post-loop winner test
    tri_p0: jnp.ndarray    # (T, 3)
    tri_e1: jnp.ndarray    # (T, 3)
    tri_e2: jnp.ndarray    # (T, 3)
    tri_k: int = struct.field(pytree_node=False, default=64)
    # first GLOBAL (reordered) triangle id of this set — nonzero for the
    # partitioned large-scene sets of build_cluster_parts, whose tri_begin /
    # tri_* arrays are local to the partition
    tri_base: int = struct.field(pytree_node=False, default=0)

    @property
    def num_clusters(self) -> int:
        return self.cmin.shape[0]


def _cut_bvh(flat: FlatBVH, max_tris: int):
    """Walk the DFS-ordered skip-link BVH; emit the shallowest subtrees whose
    triangle range is <= max_tris. DFS order makes every subtree's triangles a
    contiguous range of the reordered array."""
    n = len(flat.skip)
    # cumulative triangle count up to each node (leaves contribute)
    leaf_tris = np.where(flat.leaf_start >= 0, flat.leaf_count, 0)
    pref = np.concatenate([[0], np.cumsum(leaf_tris)])
    # tri range of node i's subtree = [pref[i], pref[skip[i]])
    clusters = []  # (tri_begin, tri_end, node)
    i = 0
    while i < n:
        end = int(flat.skip[i])
        count = int(pref[end] - pref[i])
        if count <= max_tris or flat.leaf_start[i] >= 0:
            if count > 0:
                clusters.append((int(pref[i]), int(pref[end]), i))
            i = end
        else:
            i += 1
    return clusters


def pack_coefficients(p0: np.ndarray, e1: np.ndarray, e2: np.ndarray) -> np.ndarray:
    """(T,3)x3 -> (T, 16, 4) coefficient blocks (see module docstring).
    Degenerate triangles (zero normal) produce det == 0 and never hit."""
    t = len(p0)
    n = np.cross(e1, e2)
    eps = np.zeros((3, 3, 3), np.float64)
    eps[0, 1, 2] = eps[1, 2, 0] = eps[2, 0, 1] = 1.0
    eps[0, 2, 1] = eps[2, 1, 0] = eps[1, 0, 2] = -1.0

    coeff = np.zeros((t, FEAT_DIM, N_OUT), np.float64)
    # u_num: o_i d_j block = sum_k eps_ijk e2_k ; d block = -(e2 x p0)
    u_od = np.einsum("ijk,tk->tij", eps, e2)            # (T,3,3) [i=o, j=d]
    coeff[:, 0:9, 0] = u_od.reshape(t, 9)
    coeff[:, 9:12, 0] = -np.cross(e2, p0)
    # v_num: o_i d_j block = -eps_ijk e1_k ; d block = -(p0 x e1)
    v_od = -np.einsum("ijk,tk->tij", eps, e1)
    coeff[:, 0:9, 1] = v_od.reshape(t, 9)
    coeff[:, 9:12, 1] = -np.cross(p0, e1)
    # t_num: o block = n ; const = -p0.n
    coeff[:, 12:15, 2] = n
    coeff[:, 15, 2] = -np.sum(p0 * n, axis=-1)
    # det: d block = -n
    coeff[:, 9:12, 3] = -n
    return coeff.astype(np.float32)


def ray_features(o, d):
    """(N,3),(N,3) -> (N,16) feature matrix F = [vec(o d^T), d, o, 1]."""
    od = (o[..., :, None] * d[..., None, :]).reshape(o.shape[:-1] + (9,))
    one = jnp.ones(o.shape[:-1] + (1,), o.dtype)
    return jnp.concatenate([od, d, o, one], axis=-1)


def _pack_cluster_list(cl, flat: FlatBVH, p0, e1, e2, k: int,
                       with_coeff: bool, tri_base: int,
                       tri_end: int) -> ClusterSet:
    """Pack a list of (lo, hi, node) GLOBAL triangle ranges into a ClusterSet
    whose tri_begin / tri_* arrays are local to [tri_base, tri_end)."""
    c = len(cl)
    coeff = np.zeros((c, k, FEAT_DIM, N_OUT), np.float32) if with_coeff \
        else None
    assert k <= 128, "cluster K above the 128-lane tile is unsupported"
    tri_block = np.zeros((c, 16, 128), np.float32)
    cmin = np.zeros((c, 3), np.float32)
    cmax = np.zeros((c, 3), np.float32)
    begin = np.zeros((c,), np.int32)
    for ci, (lo, hi, node) in enumerate(cl):
        if with_coeff:
            coeff[ci, :hi - lo] = pack_coefficients(p0[lo:hi], e1[lo:hi],
                                                    e2[lo:hi])
        raw = np.concatenate([p0[lo:hi], e1[lo:hi], e2[lo:hi]], axis=1)
        tri_block[ci, :9, :hi - lo] = raw.T
        cmin[ci] = flat.bounds_min[node]
        cmax[ci] = flat.bounds_max[node]
        begin[ci] = lo - tri_base
    # (C, K, 16, 4) -> (C, 16, 4K): outputs grouped by kind then triangle slot
    if with_coeff:
        coeff = coeff.transpose(0, 2, 3, 1).reshape(c, FEAT_DIM, N_OUT * k)
    else:
        coeff = np.zeros((1, 1, 1), np.float32)
    return ClusterSet(cmin=jnp.asarray(cmin), cmax=jnp.asarray(cmax),
                      coeff=jnp.asarray(coeff),
                      tri_block=jnp.asarray(tri_block),
                      tri_begin=jnp.asarray(begin),
                      tri_p0=jnp.asarray(p0[tri_base:tri_end], jnp.float32),
                      tri_e1=jnp.asarray(e1[tri_base:tri_end], jnp.float32),
                      tri_e2=jnp.asarray(e2[tri_base:tri_end], jnp.float32),
                      tri_k=k, tri_base=tri_base)


def build_clusters(flat: FlatBVH, p0: np.ndarray, e1: np.ndarray,
                   e2: np.ndarray, max_tris: int = 64,
                   with_coeff: bool = True) -> ClusterSet:
    """Build a ClusterSet from a flattened BVH and the REORDERED triangle
    arrays (p0/e1/e2 already permuted by flat.order). Triangle ids in the
    packed blocks refer to the reordered arrays (matching Hit.tri).
    with_coeff=False skips the MXU coefficient blocks (4x the tri_block
    bytes) for consumers that only need the raw blocks (ops/ray_walk.py)."""
    cl = _cut_bvh(flat, max_tris)
    p0 = np.asarray(p0, np.float64)
    e1 = np.asarray(e1, np.float64)
    e2 = np.asarray(e2, np.float64)
    return _pack_cluster_list(cl, flat, p0, e1, e2, max_tris, with_coeff,
                              0, len(p0))


def build_cluster_parts(flat: FlatBVH, p0, e1, e2, max_tris: int = 128,
                        part_max_tris: int = 120_000,
                        with_coeff: bool = False) -> tuple:
    """Large-scene variant: cut the BVH once, then group consecutive clusters
    into partitions of <= part_max_tris triangles, each packed as its own
    (VMEM-resident) ClusterSet with local triangle ids + tri_base. The BVH's
    DFS order makes consecutive clusters spatially coherent, so partition
    AABB sets stay tight; ops/ray_walk.walk_closest_parts traverses the
    partitions sequentially with a tightening tmax.

    Replaces the reference's batched GAS build for arbitrary scene sizes
    (sutil/Scene.cpp:943-1259 builds one GAS per mesh batch and compacts)."""
    cl = _cut_bvh(flat, max_tris)
    p0 = np.asarray(p0, np.float64)
    e1 = np.asarray(e1, np.float64)
    e2 = np.asarray(e2, np.float64)
    parts = []
    group = []
    base = 0
    for lo, hi, node in cl:
        if group and hi - base > part_max_tris:
            parts.append(_pack_cluster_list(group, flat, p0, e1, e2, max_tris,
                                            with_coeff, base, group[-1][1]))
            group = []
            base = lo
        group.append((lo, hi, node))
    if group:
        parts.append(_pack_cluster_list(group, flat, p0, e1, e2, max_tris,
                                        with_coeff, base, group[-1][1]))
    return tuple(parts)
