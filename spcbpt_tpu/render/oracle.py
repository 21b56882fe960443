"""Full-path estimator oracle: exact contribution / pdf / SPCBPT MIS weights
recomputed from complete path vertex lists.

This is the reference's validation semantics (reference: eval_path +
__raygen__SPCBPT_no_rmis raygen.cu:445-463, contriCompute cuProg.h:900-936,
pdfCompute cuProg.h:937-1008, MISWeight_SPCBPT cuProg.h:1010-1105) — the
unregistered no-RMIS renderer that recomputes every strategy's weight from
scratch. We use it as the test oracle for the O(1) cached RMIS path
(SURVEY.md §4 oracle 3).

Paths are SoA: dict with position/normal/color (N, K, 3), mat_id (N, K),
size (N,) — vertex 0 is the eye (camera) vertex, vertex size-1 is the light
vertex whose `color` slot stores the emitter flux and whose mat-slot pdf
fields come via `light_pdf` (N,) and `light_subspace` (N,).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..config import MIN_RR_RATE
from ..ops import bsdf as bsdf_mod
from ..train import classify
from ..utils import vec
from .rmis import connect_rate


def _mat(ts, path, i):
    return bsdf_mod.gather_mat(ts.mats, jnp.maximum(path["mat_id"][:, i], 0),
                               path["color"][:, i])


def _eval(ts, path, i, d_in, d_out):
    return bsdf_mod.eval_bsdf(_mat(ts, path, i), path["normal"][:, i],
                              d_in, d_out)


def _pdf(ts, path, i, d_in, d_out):
    return bsdf_mod.pdf_bsdf(_mat(ts, path, i), path["normal"][:, i],
                             d_in, d_out)


def _rr(path, i):
    return jnp.maximum(jnp.max(path["color"][:, i], axis=-1), MIN_RR_RATE)


def contri_compute(ts, path, k_max: int):
    """cuProg.h:900-936: product of Le*cos, 1/d^2 segment terms and
    cos*cos*f at interior vertices. size fixed per call via masks."""
    size = path["size"]
    pos = path["position"]
    last = size - 1
    lanes = jnp.arange(pos.shape[0])
    light_pos = pos[lanes, last]
    light_n = path["normal"][lanes, last]
    prev_pos = pos[lanes, jnp.maximum(last - 1, 0)]
    ldir = vec.normalize(prev_pos - light_pos)
    lang = vec.dot(light_n, ldir)
    le = path["light_flux"] * jnp.maximum(lang, 0.0)[..., None]
    throughput = le

    for i in range(1, k_max):
        in_range = i < size
        line = pos[:, i] - pos[:, i - 1]
        d2 = jnp.maximum(vec.dot(line, line), 1e-20)
        throughput = jnp.where(in_range[..., None], throughput / d2[..., None],
                               throughput)
    for i in range(1, k_max - 1):
        interior = i < (size - 1)
        last_dir = vec.normalize(pos[:, i - 1] - pos[:, i])
        next_dir = vec.normalize(pos[:, i + 1] - pos[:, i])
        n = path["normal"][:, i]
        f = _eval(ts, path, i, last_dir, next_dir)
        term = (jnp.abs(vec.dot(n, last_dir))
                * jnp.abs(vec.dot(n, next_dir)))[..., None] * f
        throughput = jnp.where(interior[..., None], throughput * term,
                               throughput)
    cut = lang > 0.0
    return jnp.where(cut[..., None], throughput, 0.0)


def pdf_compute(ts, path, strategy_id, k_max: int):
    """cuProg.h:937-1008: pdf of sampling the path with eye length
    = strategy_id (light length = size - strategy_id)."""
    size = path["size"]
    pos = path["position"]
    lanes = jnp.arange(pos.shape[0])
    s = strategy_id
    light_len = size - s
    pdf = jnp.ones(pos.shape[0])

    # light-side start pdf
    pdf = jnp.where(light_len > 0, pdf * path["light_pdf"], pdf)
    last = size - 1
    light_pos = pos[lanes, last]
    light_n = path["normal"][lanes, last]
    prev_pos = pos[lanes, jnp.maximum(last - 1, 0)]
    ldir = vec.normalize(prev_pos - light_pos)
    pdf = jnp.where(light_len > 1,
                    pdf * jnp.abs(vec.dot(ldir, light_n)) / jnp.pi, pdf)

    # light-side geometric + directional pdfs (indices relative to path end)
    for i in range(1, k_max):
        on = (i < light_len)
        mi = jnp.maximum(size - i - 1, 0)      # midPoint
        la = jnp.maximum(size - i, 0)          # lastPoint (closer to light)
        line = pos[lanes, mi] - pos[lanes, la]
        d2 = jnp.maximum(vec.dot(line, line), 1e-20)
        ldirn = vec.normalize(line)
        g = jnp.abs(vec.dot(path["normal"][lanes, mi], ldirn)) / d2
        pdf = jnp.where(on, pdf * g, pdf)
    for i in range(1, k_max - 1):
        on = (i < light_len - 1)
        mi = jnp.maximum(size - i - 1, 0)
        la = jnp.maximum(size - i, 0)
        ne = jnp.maximum(size - i - 2, 0)
        last_dir = vec.normalize(pos[lanes, la] - pos[lanes, mi])
        next_dir = vec.normalize(pos[lanes, ne] - pos[lanes, mi])
        mat = bsdf_mod.gather_mat(ts.mats,
                                  jnp.maximum(path["mat_id"][lanes, mi], 0),
                                  path["color"][lanes, mi])
        p = bsdf_mod.pdf_bsdf(mat, path["normal"][lanes, mi], last_dir,
                              next_dir)
        rr = jnp.maximum(jnp.max(path["color"][lanes, mi], axis=-1),
                         MIN_RR_RATE)
        pdf = jnp.where(on, pdf * p * rr, pdf)

    # eye-side geometric + directional pdfs
    for i in range(1, k_max):
        on = i < s
        line = pos[:, i] - pos[:, i - 1]
        d2 = jnp.maximum(vec.dot(line, line), 1e-20)
        ldirn = vec.normalize(line)
        g = jnp.abs(vec.dot(path["normal"][:, i], ldirn)) / d2
        pdf = jnp.where(on, pdf * g, pdf)
    for i in range(1, k_max - 1):
        on = i < (s - 1)
        last_dir = vec.normalize(pos[:, i - 1] - pos[:, i])
        next_dir = vec.normalize(pos[:, i + 1] - pos[:, i])
        p = _pdf(ts, path, i, last_dir, next_dir)
        pdf = jnp.where(on, pdf * p * _rr(path, i), pdf)
    return pdf


def suffix_value(ts, path, strategy_id, k_max: int):
    """The cumulative (flux / pdf) of the light sub-path at the connection
    vertex path[strategy_id] — the quantity the live SPCBPT pipeline stores on
    every LVC vertex (BDPTVertex flux/pdf; hit_program.cu:341-438) and feeds
    to connectRate_SOL at connection time (rmis.h general_connection flux =
    lightVertex.flux / lightVertex.pdf).

    Closed form for a quad-light start with cosine-hemisphere emission
    (dir pdf = cos/pi): suffix length 1 gives emission/light_pdf; each added
    segment multiplies by Eval * cos_toward_eye / (Pdf * rr) at the interior
    vertex, and the first segment contributes a bare pi (the emission cosine
    and 1/d^2 terms cancel between flux and pdf)."""
    size = path["size"]
    pos = path["position"]
    lanes = jnp.arange(pos.shape[0])
    s = strategy_id
    light_len = size - s

    v = path["light_flux"] / jnp.maximum(path["light_pdf"], 1e-30)[..., None]
    v = jnp.where((light_len >= 2)[..., None], v * jnp.pi, v)
    # interior light vertices: light depth i = 1 .. light_len-2,
    # path index k = size-1-i
    for i in range(1, k_max - 1):
        on = i < (light_len - 1)
        k = jnp.maximum(size - 1 - i, 0)
        prev = jnp.maximum(size - i, 0)        # one step closer to the light
        nxt = jnp.maximum(size - i - 2, 0)     # one step closer to the eye
        to_prev = vec.normalize(pos[lanes, prev] - pos[lanes, k])
        to_next = vec.normalize(pos[lanes, nxt] - pos[lanes, k])
        n = path["normal"][lanes, k]
        mat = bsdf_mod.gather_mat(ts.mats,
                                  jnp.maximum(path["mat_id"][lanes, k], 0),
                                  path["color"][lanes, k])
        f = bsdf_mod.eval_bsdf(mat, n, to_prev, to_next)
        p = bsdf_mod.pdf_bsdf(mat, n, to_prev, to_next)
        rr = jnp.maximum(jnp.max(path["color"][lanes, k], axis=-1),
                         MIN_RR_RATE)
        factor = f * (jnp.abs(vec.dot(n, to_next))
                      / jnp.maximum(p * rr, 1e-30))[..., None]
        v = jnp.where(on[..., None], v * factor, v)
    return v


def mis_weight_spcbpt(ts, ss: classify.SubspaceState, path, strategy_id,
                      k_max: int):
    """The (unnormalized) SPCBPT balance weight of a strategy, recomputed from
    the complete path: full-path pdf under strategy s (pdfCompute semantics,
    cuProg.h:937-1008) times the subspace connect rate with lum = the light
    vertex's cumulative flux/pdf (connectRate_SOL cuProg.h:70-78, as the live
    renderer uses it at every connection).

    NOTE: the reference's dead validation variant (MISWeight_SPCBPT
    cuProg.h:1010-1105, reached only from the unregistered
    __raygen__SPCBPT_no_rmis) drifted from the live recursion: it weights by
    the raw suffix *contribution* with a doubled fixed-lastMidPoint cosine
    (cuProg.h:1062-1070) and drops the suffix pdf. Deriving the closed form
    of the live rmis.h recursion (each combiner term expands to
    path_pdf(s) * connectRate(e_s, l_s, flux_s/pdf_s) up to a per-path
    constant) gives this oracle, which tests/test_rmis_oracle.py validates
    term-by-term against the cached combiners."""
    size = path["size"]
    pos = path["position"]
    lanes = jnp.arange(pos.shape[0])
    s = strategy_id

    # full path pdf under this strategy (eye prefix x light prefix)
    plain = pdf_compute(ts, path, strategy_id, k_max)

    # subspace connect rate at the strategy boundary
    ei = jnp.maximum(s - 1, 0)
    eye_pos = pos[lanes, ei]
    eye_norm = path["normal"][lanes, ei]
    eye_label = classify.label_eye(ss, eye_pos, eye_norm)
    li = jnp.minimum(s, k_max - 1)
    at_light = s == (size - 1)
    light_label_tree = classify.label_light(ss, pos[lanes, li],
                                            path["normal"][lanes, li])
    light_label = jnp.where(at_light, path["light_subspace"],
                            light_label_tree)
    lum = vec.float3weight(suffix_value(ts, path, strategy_id, k_max))
    rate = connect_rate(ss, eye_label, light_label, lum)
    w = plain * rate
    # pure-pdf strategies: s<=1 (light tracing; disabled) or s==size (BSDF hit)
    use_plain = (strategy_id <= 1) | (strategy_id == size)
    return jnp.where(use_plain, plain, w)


def eval_path(ts, ss, path, strategy_id, k_max: int):
    """raygen.cu:445-463: contri/pdf * normalized MIS weight."""
    pdf = pdf_compute(ts, path, strategy_id, k_max)
    contri = contri_compute(ts, path, k_max)
    num = mis_weight_spcbpt(ts, ss, path, strategy_id, k_max)
    den = jnp.zeros_like(num)
    for i in range(2, k_max + 1):
        on = i <= path["size"]
        den = den + jnp.where(on, mis_weight_spcbpt(ts, ss, path, i, k_max), 0.0)
    ans = contri / jnp.maximum(pdf, 1e-30)[..., None] \
        * (num / jnp.maximum(den, 1e-30))[..., None]
    return vec.scrub(ans)
