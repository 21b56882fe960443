"""BDPT vertex record (SoA) shared by the light tracer, LVC and SPCBPT.

Mirrors the fields of the reference BDPTVertex (reference: BDPTVertex.h:9-70)
that the connection/RMIS math consumes. Stored as a flax struct of arrays so a
whole LVC is one pytree; per-lane slices are plain dict-like gathers.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class LightVertices:
    """A batch of light sub-path vertices; leading axes arbitrary.

    The reference stores cumulative flux and cumulative pdf separately
    (BDPTVertex.h:9-70); every consumer (connection eval raygen.cu:253-303,
    LVC weights device_thrust.cu:200-207, RMIS rmis.h) only ever uses their
    RATIO, and the separate products underflow f32 at path length ~6 in
    large-unit scenes (the (cos*cos/t^2)^depth factor cancels in the ratio).
    We therefore carry `ratio = flux / pdf` directly — unit-invariant and
    perfectly conditioned — plus the per-segment `single_pdf` that the RMIS
    recursion consumes."""
    position: jnp.ndarray        # (..., 3)
    normal: jnp.ndarray          # (..., 3)
    ratio: jnp.ndarray           # (..., 3) cumulative flux / cumulative pdf
    color: jnp.ndarray           # (..., 3) texture-modulated base color
    last_position: jnp.ndarray   # (..., 3)
    single_pdf: jnp.ndarray      # (...,) segment pdf for this vertex
    last_normal_proj: jnp.ndarray  # (...,) |dot(N_prev, dir)|
    last_lum: jnp.ndarray        # (...,) float3sum(prev.ratio)
    rmis: jnp.ndarray            # (...,) light-side RMIS_pointer
    mat_id: jnp.ndarray          # (...,) int32
    subspace_id: jnp.ndarray     # (...,) int32
    eye_label: jnp.ndarray       # (...,) int32 eye-tree label at this vertex
                                 # (precomputed: rmis tracing_weight_light
                                 # re-labels light vertices with the EYE tree
                                 # per connection in the reference, rmis.h:71)
    last_zone_id: jnp.ndarray    # (...,) int32
    depth: jnp.ndarray           # (...,) int32
    is_origin: jnp.ndarray       # (...,) bool — on the light source
    is_env: jnp.ndarray          # (...,) bool — directional/env "position-less"
    is_ll_direction: jnp.ndarray  # (...,) bool — previous vertex was directional
    is_brdf: jnp.ndarray         # (...,) bool (dormant, reference parity)
    last_brdf: jnp.ndarray       # (...,) bool
    valid: jnp.ndarray           # (...,) bool

    def take(self, idx):
        """Gather vertices at flat indices idx (any shape)."""
        return jax.tree_util.tree_map(lambda a: a[idx], self)


def reshape_flat(lv: LightVertices) -> LightVertices:
    """Collapse the batch axes to one flat vertex axis. The batch rank is
    taken from `valid` (a pure-batch field), so feature axes like xyz
    survive regardless of how many batch dims the input has."""
    batch_ndim = lv.valid.ndim

    def r(a):
        return a.reshape((-1,) + a.shape[batch_ndim:])
    return jax.tree_util.tree_map(r, lv)
