"""Octree "class tree" classifier — reference-parity alternative to the
matmul nearest-centroid runtime classifier in train/classify.py.

The reference accelerates nearest-centroid labeling with an 8-way mid-split
tree over position (alternating a normal split at a fixed depth cadence),
grown until 99% of sample weight in each leaf agrees on one label or depth 15
(reference: classTree_host.h:103-431, classTree_common.h:11-62). We provide
the same capability: build from labeled samples (host numpy), flatten to SoA,
and query under jit with a vectorized while_loop walk. Useful for checkpoint
compatibility experiments and as an accuracy cross-check of the centroid rule
(the tree approximates it; the centroid matmul is exact).
"""
from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

TYPE_POSITION = 0
TYPE_NORMAL = 1

MAX_DEPTH = 15
PURITY = 0.99
MIN_LEAF = 2
# depth cadence at which a normal split is used instead of position
NORMAL_SPLIT_EVERY = 2


@dataclasses.dataclass
class FlatTree:
    mid: np.ndarray      # (N, 3)
    child: np.ndarray    # (N, 8) int32, -1 absent
    label: np.ndarray    # (N,) int32
    node_type: np.ndarray  # (N,) int32 (position/normal)
    leaf: np.ndarray     # (N,) bool


def _majority(labels, weights):
    lab = np.bincount(labels, weights=weights)
    best = int(lab.argmax())
    total = weights.sum()
    purity = lab[best] / total if total > 0 else 1.0
    return best, purity


def build_tree(pos, normal, labels, weights, max_depth: int = MAX_DEPTH,
               purity: float = PURITY) -> FlatTree:
    pos = np.asarray(pos, np.float64)
    normal = np.asarray(normal, np.float64)
    labels = np.asarray(labels, np.int64)
    weights = np.asarray(weights, np.float64)

    nodes = []  # list of dicts

    def grow(idx, depth):
        my = len(nodes)
        nodes.append(None)
        best, pur = _majority(labels[idx], weights[idx])
        node_type = (TYPE_NORMAL if (depth % NORMAL_SPLIT_EVERY
                                     == NORMAL_SPLIT_EVERY - 1)
                     else TYPE_POSITION)
        key = pos if node_type == TYPE_POSITION else normal
        if (pur >= purity or depth >= max_depth or len(idx) <= MIN_LEAF):
            nodes[my] = dict(mid=np.zeros(3), child=np.full(8, -1),
                             label=best, type=node_type, leaf=True)
            return my
        mid = np.median(key[idx], axis=0)
        octant = ((key[idx, 0] > mid[0]).astype(int)
                  + 2 * (key[idx, 1] > mid[1]).astype(int)
                  + 4 * (key[idx, 2] > mid[2]).astype(int))
        n_nonempty = len(np.unique(octant))
        if n_nonempty <= 1:
            # degenerate split (e.g. identical normals): fall back to the
            # other key before giving up
            node_type = (TYPE_POSITION if node_type == TYPE_NORMAL
                         else TYPE_NORMAL)
            key = pos if node_type == TYPE_POSITION else normal
            mid = np.median(key[idx], axis=0)
            octant = ((key[idx, 0] > mid[0]).astype(int)
                      + 2 * (key[idx, 1] > mid[1]).astype(int)
                      + 4 * (key[idx, 2] > mid[2]).astype(int))
            n_nonempty = len(np.unique(octant))
        child = np.full(8, -1, np.int64)
        if n_nonempty <= 1:
            nodes[my] = dict(mid=np.zeros(3), child=np.full(8, -1),
                             label=best, type=node_type, leaf=True)
            return my
        for o in range(8):
            sub = idx[octant == o]
            if len(sub) == 0:
                continue
            child[o] = grow(sub, depth + 1)
        # empty octants fall back to the majority-label leaf of this node:
        # create one shared leaf
        fallback = None
        for o in range(8):
            if child[o] < 0:
                if fallback is None:
                    fallback = len(nodes)
                    nodes.append(dict(mid=np.zeros(3), child=np.full(8, -1),
                                      label=best, type=node_type, leaf=True))
                child[o] = fallback
        nodes[my] = dict(mid=mid, child=child, label=best, type=node_type,
                         leaf=False)
        return my

    import sys
    old = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old, 100000))
    try:
        grow(np.arange(len(pos)), 0)
    finally:
        sys.setrecursionlimit(old)

    n = len(nodes)
    return FlatTree(
        mid=np.stack([nd["mid"] for nd in nodes]).astype(np.float32),
        child=np.stack([nd["child"] for nd in nodes]).astype(np.int32),
        label=np.asarray([nd["label"] for nd in nodes], np.int32),
        node_type=np.asarray([nd["type"] for nd in nodes], np.int32),
        leaf=np.asarray([nd["leaf"] for nd in nodes], bool),
    )


def tree_lookup(tree: FlatTree, pos, normal, max_steps: int = MAX_DEPTH + 2):
    """Vectorized label query (classTree_common.h tree_index:39-52):
    walk from the root picking the octant of (position|normal) vs mid."""
    mid = jnp.asarray(tree.mid)
    child = jnp.asarray(tree.child)
    label = jnp.asarray(tree.label)
    node_type = jnp.asarray(tree.node_type)
    leaf = jnp.asarray(tree.leaf)

    n = pos.shape[0]
    node = jnp.zeros((n,), jnp.int32)

    def body(_, node):
        m = mid[node]
        key = jnp.where((node_type[node] == TYPE_POSITION)[..., None],
                        pos, normal)
        octant = ((key[..., 0] > m[..., 0]).astype(jnp.int32)
                  + 2 * (key[..., 1] > m[..., 1]).astype(jnp.int32)
                  + 4 * (key[..., 2] > m[..., 2]).astype(jnp.int32))
        nxt = child[node, octant]
        return jnp.where(leaf[node] | (nxt < 0), node, nxt)

    node = jax.lax.fori_loop(0, max_steps, body, node)
    return label[node]


def tree_accuracy(tree: FlatTree, pos, normal, labels) -> float:
    """Fraction of samples the tree labels like the training labels — the
    reference prints this as 'acc:n/m' (classTree_host.h:392)."""
    got = np.asarray(tree_lookup(tree, jnp.asarray(pos, jnp.float32),
                                 jnp.asarray(normal, jnp.float32)))
    return float((got == np.asarray(labels)).mean())
