"""Subspace statistics: Q estimation, training-sample reweighting, Gamma
initialization, and the Gamma -> CMF publication step.

Behavior contracts:
- Q (reference MyThrustOp::preprocess_getQ device_thrust.cu:347-409): per
  subspace, the mean cached-vertex weight (float3weight(flux)/pdf) per traced
  light path, streamed over launches as an incremental average; zero entries
  become +inf-like so gamma_ss ~ 0 (Q_zero_handle :335-346).
- sample_reweight (device_thrust.cu:574-623): training-path contributions are
  normalized by the mean contribution of their 10x10-pixel block.
- Gamma init (preprocess_getGamma device_thrust.cu:627-667): Gamma[e,l] +=
  min(contri/sample_pdf, 10) over every connection of every path, then
  row-normalized with uniform fallback.
- CMF publication (Gamma2CMFGamma device_thrust.cu:3406-3433): 20% uniform
  mixture then row cumulative sums with the last entry pinned to 1.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import CONSERVATIVE_RATE, NUM_SUBSPACE
from ..render.vertex import LightVertices, reshape_flat
from ..utils import vec

Q_INF = jnp.float32(3.4e38)


def q_batch(lv: LightVertices):
    """Per-subspace summed weight, vertex counts, path count for one
    light-trace launch. Returns (q_sum (N,), occ_count (N,), path_count ())."""
    flat = reshape_flat(lv)
    w = vec.float3weight(flat.ratio)
    w = jnp.where(jnp.isnan(w) | jnp.isinf(w) | ~flat.valid, 0.0, w)
    lab = jnp.clip(flat.subspace_id, 0, NUM_SUBSPACE - 1)
    q = jnp.zeros(NUM_SUBSPACE, jnp.float32).at[lab].add(w)
    occ = jnp.zeros(NUM_SUBSPACE, jnp.float32).at[lab].add(
        flat.valid.astype(jnp.float32))
    paths = jnp.sum(jnp.where(flat.valid & (flat.depth == 0), 1, 0))
    return q, occ, paths


def q_update(q_mean, acc_paths, q_sum, batch_paths):
    """Incremental average over launches (device_thrust.cu:378-408):
    new_mean = mean*(1-t) + batch_mean*t, t = batch/total."""
    total = acc_paths + batch_paths
    t = batch_paths.astype(jnp.float32) / jnp.maximum(
        total.astype(jnp.float32), 1.0)
    batch_mean = q_sum / jnp.maximum(batch_paths.astype(jnp.float32), 1.0)
    return q_mean * (1.0 - t) + batch_mean * t, total


def q_finalize(q_mean):
    """Q_zero_handle: zero -> FLT_MAX so 1/Q ~ 0."""
    return jnp.where(q_mean == 0.0, Q_INF, q_mean)


def inv_occ_finalize(occ_total, paths_total):
    """paths/vertices per subspace: the uniform-second-stage weight
    normalizer (classify.SubspaceState.inv_occ). Empty subspaces get 0 —
    the strategy cannot sample them (n_l = 0 draws are rejected)."""
    paths = jnp.maximum(paths_total.astype(jnp.float32), 1.0)
    return jnp.where(occ_total > 0.0, paths / jnp.maximum(occ_total, 1.0),
                     0.0)


def sample_reweight(contri, sample_pdf, pixel, width: int, height: int,
                    block: int = 10):
    """Spatial normalization of training contributions
    (device_thrust.cu:574-623): contri /= (block_weight_sum/100 + 0.1)."""
    px = jnp.clip((pixel[:, 0].astype(jnp.float32) / 65535.0 * width)
                  .astype(jnp.int32), 0, width - 1)
    py = jnp.clip((pixel[:, 1].astype(jnp.float32) / 65535.0 * height)
                  .astype(jnp.int32), 0, height - 1)
    bw = (width + block - 1) // block
    bh = (height + block - 1) // block
    bid = (px // block) + (py // block) * bw
    ww = vec.float3weight(contri) / jnp.maximum(sample_pdf, 1e-30)
    ww = jnp.where(jnp.isnan(ww) | jnp.isinf(ww), 0.0, ww)
    sums = jnp.zeros(bw * bh, jnp.float32).at[bid].add(ww)
    w = sums[bid] / 100.0 + 0.1
    return contri / w[:, None]


def gamma_init(label_a, label_b, conn_valid, contri, sample_pdf):
    """Gamma[e,l] += min(path_weight, 10) per connection; row-normalize
    (device_thrust.cu:627-667). Args shaped (P, C) / (P, ...)."""
    w = vec.float3weight(contri) / jnp.maximum(sample_pdf, 1e-30)
    w = jnp.where(jnp.isnan(w) | jnp.isinf(w), 0.0, jnp.minimum(w, 10.0))
    wc = jnp.broadcast_to(w[:, None], label_a.shape)
    wc = jnp.where(conn_valid, wc, 0.0)
    flat_idx = (jnp.clip(label_a, 0, NUM_SUBSPACE - 1) * NUM_SUBSPACE
                + jnp.clip(label_b, 0, NUM_SUBSPACE - 1)).reshape(-1)
    g = jnp.zeros(NUM_SUBSPACE * NUM_SUBSPACE, jnp.float32).at[flat_idx].add(
        wc.reshape(-1))
    g = g.reshape(NUM_SUBSPACE, NUM_SUBSPACE)
    row = jnp.sum(g, axis=1, keepdims=True)
    uniform = jnp.full_like(g, 1.0 / NUM_SUBSPACE)
    return jnp.where(row > 1e-10, g / jnp.maximum(row, 1e-30), uniform)


def gamma_to_cmf(gamma):
    """Gamma2CMFGamma: conservative 20% uniform mix, then row CMFs pinned to 1."""
    t = CONSERVATIVE_RATE
    g = gamma * (1.0 - t) + t / NUM_SUBSPACE
    cmf = jnp.cumsum(g, axis=1)
    return cmf.at[:, -1].set(1.0)
