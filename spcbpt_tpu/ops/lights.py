"""Light sampling: uniform light pick x per-light area/env sampling.

Behavior contract from the reference's lightSample struct (reference:
src/OptiXPathTracer/cuProg.h:554-666): quad sampling is uniform over the
parallelogram with pdf 1/(area*num_lights); the sample's subspace id comes
from a divLevel x divLevel uv grid mapped to the reserved light-source block
(`NUM_SUBSPACE - (ssBase + xb*div + yb) - 1`, cuProg.h:585-590); env sampling
inverts the pixel CMF. ReverseSample reconstructs a sample at a known emitter
uv (used when an eye ray hits a light). traceMode draws the outgoing
direction for light sub-paths (cosine for quads; disk-projected origin for
env, cuProg.h:648-664).

All functions are batched over lanes; light-type divergence is masked select.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..config import NUM_SUBSPACE
from ..scene import envmap as env_mod
from ..utils import vec
from ..utils.rng import next_float


class LightSample(NamedTuple):
    position: jnp.ndarray     # (N, 3) point on light (env: projected origin or far point)
    emission: jnp.ndarray     # (N, 3)
    direction: jnp.ndarray    # (N, 3) env: sampled direction (toward scene from env)
    normal: jnp.ndarray       # (N, 3) quad normal; env: -direction
    uv: jnp.ndarray           # (N, 2)
    pdf: jnp.ndarray          # (N,) area pdf (quad) or solid-angle pdf (env), /num_lights
    subspace_id: jnp.ndarray  # (N,) int32
    light_id: jnp.ndarray     # (N,) int32
    is_env: jnp.ndarray       # (N,) bool

    def trace_direction(self):
        """Direction a light sub-path leaves this sample (cuProg.h:644-646):
        env paths travel opposite the sampled env direction."""
        return vec.where3(self.is_env, -self.direction, self.direction)


def quad_subspace_id(ts, lid, uv):
    """uv-grid bin -> reserved light-source subspace id (cuProg.h:585-590)."""
    div = ts.lights.div_level[lid]
    xb = jnp.clip(jnp.floor(uv[..., 0] * div).astype(jnp.int32), 0, div - 1)
    yb = jnp.clip(jnp.floor(uv[..., 1] * div).astype(jnp.int32), 0, div - 1)
    light_space = ts.lights.ss_base[lid] + xb * div + yb
    return (NUM_SUBSPACE - light_space - 1).astype(jnp.int32)


def reverse_sample_quad(ts, lid, uv):
    """Reconstruct a light sample at emitter uv (cuProg.h:571-600). Returns a
    LightSample. (The reference's env branch here is dead code — see
    SURVEY.md known quirks — env hits are handled by the miss path.)"""
    lid = jnp.asarray(lid, jnp.int32)
    r1 = uv[..., 0]
    r2 = uv[..., 1]
    corner = ts.lights.corner[lid]
    position = (corner + r1[..., None] * ts.lights.u[lid]
                + r2[..., None] * ts.lights.v[lid])
    pdf = 1.0 / ts.lights.area[lid] / ts.num_lights
    emission = ts.lights.emission[lid]
    normal = ts.lights.normal[lid]
    ss = quad_subspace_id(ts, lid, uv)
    z3 = jnp.zeros_like(position)
    return LightSample(position=position, emission=emission, direction=z3,
                       normal=normal, uv=uv, pdf=pdf, subspace_id=ss,
                       light_id=lid, is_env=jnp.zeros(r1.shape, bool))


def sample_light(ts, state):
    """Uniform light pick + per-light position/direction sample
    (cuProg.h:602-626). Returns (LightSample, new rng state)."""
    r, state = next_float(state)
    lid = jnp.clip((r * ts.num_lights).astype(jnp.int32), 0, ts.num_lights - 1)
    r1, state = next_float(state)
    r2, state = next_float(state)
    qlid = jnp.minimum(lid, max(ts.num_quad_lights - 1, 0))
    quad = reverse_sample_quad(ts, qlid, jnp.stack([r1, r2], axis=-1))
    if not ts.has_env:
        return quad, state
    r3, state = next_float(state)
    d, env_pdf, env_col, env_label = env_mod.env_sample(ts.env, r1, r2, r3)
    is_env = lid >= ts.num_quad_lights
    far = 2.0 * ts.env.r * d  # displacement used for NEE visibility targets
    return LightSample(
        position=vec.where3(is_env, far, quad.position),
        emission=vec.where3(is_env, env_col, quad.emission),
        direction=vec.where3(is_env, d, quad.direction),
        normal=vec.where3(is_env, -d, quad.normal),
        uv=jnp.where(is_env[..., None], env_mod.dir2uv(d), quad.uv),
        pdf=jnp.where(is_env, env_pdf / ts.num_lights, quad.pdf),
        subspace_id=jnp.where(is_env, env_label, quad.subspace_id),
        light_id=lid,
        is_env=is_env,
    ), state


def trace_mode(ts, ls: LightSample, state):
    """Draw the sub-path start direction/origin (cuProg.h:648-664).
    Quads: cosine hemisphere about the normal, dir_pdf = cos/pi.
    Env: origin on projected disk, dir_pos_pdf = 1/(pi r^2).
    Returns (direction (N,3), origin (N,3), dir_pdf (N,), new state)."""
    r1, state = next_float(state)
    r2, state = next_float(state)
    local = vec.cosine_sample_hemisphere(r1, r2)
    d_quad = vec.onb_transform(ls.normal, local)
    pdf_quad = jnp.abs(vec.dot(d_quad, ls.normal)) / jnp.pi
    if not ts.has_env:
        return d_quad, ls.position, pdf_quad, state
    r3, state = next_float(state)
    r4, state = next_float(state)
    origin_env = env_mod.env_sample_project_pos(ts.env, ls.direction, r3, r4)
    pdf_env = jnp.broadcast_to(env_mod.env_project_pdf(ts.env), pdf_quad.shape)
    direction = ls.trace_direction()
    return (vec.where3(ls.is_env, direction, d_quad),
            vec.where3(ls.is_env, origin_env, ls.position),
            jnp.where(ls.is_env, pdf_env, pdf_quad), state)
