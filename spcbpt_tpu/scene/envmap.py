"""Environment map: CMF build (host) + device sampling/pdf/label functions.

Host side replicates the reference CMF construction
(optixPathTracer.cpp:382-461): per-pixel luminance plus a diamond 5x5
neighborhood average, 25% uniform mixture, directional lights baked into the
raster. Device side replicates envInfo_device (cuProg.h:125-243): lat-long
dir<->uv mapping, CMF binary-search sampling, solid-angle pdf, divLevel^2
subspace labels.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from ..config import NUM_SUBSPACE, NUM_SUBSPACE_LIGHTSOURCE
from ..utils import vec
from ..utils.vec import float3weight


class EnvMap(NamedTuple):
    tex: jnp.ndarray      # (H, W, 3) float32 radiance
    cmf: jnp.ndarray      # (H*W,) float32 cumulative
    center: jnp.ndarray   # (3,) scene aabb center
    r: jnp.ndarray        # scalar: scene aabb diagonal length
    valid: jnp.ndarray    # () bool

    @property
    def height(self):
        return self.tex.shape[0]

    @property
    def width(self):
        return self.tex.shape[1]

    @property
    def size(self):
        return self.tex.shape[0] * self.tex.shape[1]


ENV_DIV_LEVEL = int(np.sqrt(0.5 * NUM_SUBSPACE_LIGHTSOURCE))  # 10 (cpp:448)


def dummy_envmap() -> EnvMap:
    return EnvMap(tex=jnp.zeros((1, 8, 3), jnp.float32),
                  cmf=jnp.ones((8,), jnp.float32),
                  center=jnp.zeros((3,), jnp.float32),
                  r=jnp.float32(1.0),
                  valid=jnp.asarray(False))


def build_envmap(raster: np.ndarray, scene_center, scene_diag: float,
                 dir_lights=(), env_factor: float = 1.0) -> EnvMap:
    """raster: (H, W, 3) float32. dir_lights: [(direction, intensity rgb)]."""
    raster = np.asarray(raster, np.float32) * np.float32(env_factor)
    h, w, _ = raster.shape
    size = h * w
    # bake directional lights into the raster (optixPathTracer.cpp:451-456)
    for d, inten in dir_lights:
        d = np.asarray(d, np.float64)
        d = d / max(np.linalg.norm(d), 1e-30)
        u, v = _dir2uv_np(-d)
        x = min(int(u * w), w - 1)
        y = min(int(v * h), h - 1)
        raster[y, x] += np.asarray(inten, np.float32) * (size / (4 * np.pi))

    lum = raster.sum(axis=-1)  # float3weight
    # diamond |dx|+|dy|<=2 neighborhood mean added to own weight (cpp:385-417)
    offsets = [(dx, dy) for dx in range(-2, 3) for dy in range(-2, 3)
               if abs(dx) + abs(dy) <= 2]
    acc = np.zeros_like(lum)
    cnt = np.zeros_like(lum)
    for dx, dy in offsets:
        shifted = np.full_like(lum, np.nan)
        ys = slice(max(dy, 0), h + min(dy, 0))
        yd = slice(max(-dy, 0), h + min(-dy, 0))
        xs = slice(max(dx, 0), w + min(dx, 0))
        xd = slice(max(-dx, 0), w + min(-dx, 0))
        shifted[yd, xd] = lum[ys, xs]
        m = ~np.isnan(shifted)
        acc[m] += shifted[m]
        cnt[m] += 1
    p = lum + acc / np.maximum(cnt, 1)
    flat = p.reshape(-1).astype(np.float64)
    cmf = np.cumsum(flat)
    cmf /= max(cmf[-1], 1e-30)
    uniform_rate = 0.25
    i1 = np.arange(1, size + 1, dtype=np.float64) / size
    cmf = cmf * (1 - uniform_rate) + i1 * uniform_rate
    return EnvMap(tex=jnp.asarray(raster),
                  cmf=jnp.asarray(cmf, jnp.float32),
                  center=jnp.asarray(scene_center, jnp.float32),
                  r=jnp.float32(scene_diag),
                  valid=jnp.asarray(True))


# --- direction <-> uv (reference optixPathTracer.h:139-165) ---

def _dir2uv_np(d):
    theta = np.arctan2(d[0], d[2])
    phi = np.pi * 0.5 - np.arccos(np.clip(d[1], -1, 1))
    u = (theta + np.pi) * (0.5 / np.pi)
    v = 0.5 * (1.0 + np.sin(phi))
    return u, v


def dir2uv(d):
    theta = jnp.arctan2(d[..., 0], d[..., 2])
    phi = jnp.pi * 0.5 - jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0))
    u = (theta + jnp.pi) * (0.5 / jnp.pi)
    v = 0.5 * (1.0 + jnp.sin(phi))
    return jnp.stack([u, v], axis=-1)


def uv2dir(uv):
    u, v = uv[..., 0], uv[..., 1]
    phi = jnp.arcsin(jnp.clip(2.0 * v - 1.0, -1.0, 1.0))
    theta = u * (2.0 * jnp.pi) - jnp.pi
    y = jnp.cos(jnp.pi * 0.5 - phi)
    x = jnp.cos(phi) * jnp.sin(theta)
    z = jnp.cos(phi) * jnp.cos(theta)
    return jnp.stack([x, y, z], axis=-1)


def uv2coord(uv, h: int, w: int):
    x = jnp.minimum((uv[..., 0] * w).astype(jnp.int32), w - 1)
    y = jnp.minimum((uv[..., 1] * h).astype(jnp.int32), h - 1)
    return x, y


def env_color(env: EnvMap, d):
    """Nearest-texel lookup (tex2D with point sampling semantics)."""
    uv = dir2uv(d)
    x, y = uv2coord(uv, env.height, env.width)
    return env.tex[y, x]


def env_pdf(env: EnvMap, d):
    """Solid-angle pdf of env sampling (cuProg.h:217-230)."""
    uv = dir2uv(d)
    x, y = uv2coord(uv, env.height, env.width)
    idx = x + y * env.width
    c = env.cmf[idx]
    prev = jnp.where(idx > 0, env.cmf[jnp.maximum(idx - 1, 0)], 0.0)
    pmf = c - prev
    return pmf * env.size / (4.0 * jnp.pi)


def env_label(env: EnvMap, d):
    """Subspace label over a divLevel x divLevel uv grid (cuProg.h:200-215)."""
    uv = dir2uv(d)
    dl = ENV_DIV_LEVEL
    ud = jnp.clip(jnp.floor(uv[..., 0] * dl).astype(jnp.int32), 0, dl - 1)
    vd = jnp.clip(jnp.floor(uv[..., 1] * dl).astype(jnp.int32), 0, dl - 1)
    res_id = ud * dl + vd
    return NUM_SUBSPACE - 1 - res_id


def env_sample(env: EnvMap, r1, r2, r3):
    """Draw a direction by CMF inversion + in-texel jitter (cuProg.h:163-185).

    r1 picks the texel via searchsorted on the cmf; (r2, r3) jitter inside it.
    Returns (direction, pdf, color, label)."""
    idx = jnp.searchsorted(env.cmf, r1, side="right")
    idx = jnp.clip(idx, 0, env.size - 1)
    w = env.width
    x = (idx % w).astype(jnp.float32)
    y = (idx // w).astype(jnp.float32)
    u = (x + r2) / env.width
    v = (y + r3) / env.height
    d = uv2dir(jnp.stack([u, v], axis=-1))
    return d, env_pdf(env, d), env_color(env, d), env_label(env, d)


def env_sample_project_pos(env: EnvMap, d, r1, r2):
    """Start point for env light sub-paths: point on a disk of radius r,
    offset 10r along d from scene center (cuProg.h:186-194)."""
    local = vec.cosine_sample_hemisphere(r1, r2)
    t, b = vec.onb(d)
    return (10.0 * env.r * d + local[..., 0:1] * env.r * t
            + local[..., 1:2] * env.r * b + env.center)


def env_project_pdf(env: EnvMap):
    return 1.0 / (jnp.pi * env.r * env.r)
