"""Cached recursive-MIS weights vs the exact full-path oracle.

The reference keeps an unregistered validation renderer that recomputes every
strategy's MIS weight from scratch (__raygen__SPCBPT_no_rmis raygen.cu:445-463,
MISWeight_SPCBPT cuProg.h:1010-1105). This test is that validation: trace real
light and eye sub-paths on Cornell, assemble complete paths for every
(eye length, light length) combination, and check that the O(1) cached
combiners (render/rmis.py) agree with the oracle's exact recomputation
(render/oracle.py) — including the emitter-hit strategy and isBrdf zeroing.
A perturbation check asserts the comparison actually has teeth.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spcbpt_tpu.config import NUM_SUBSPACE, NUM_SUBSPACE_LIGHTSOURCE
from spcbpt_tpu.render import light_trace, oracle, rmis, spcbpt
from spcbpt_tpu.render.common import camera_rays
from spcbpt_tpu.scene.cornell import default_scene_path
from spcbpt_tpu.scene.scene import load_trace_scene
from spcbpt_tpu.train import classify

MAX_EYE = 3    # surface vertices on the eye chain
MAX_LIGHT = 3  # bounces on the light chain (depth index)
N_LANES = 400


def _random_trained_state(ts, seed=7, second_stage="weighted"):
    """A synthetic trained SubspaceState with non-trivial Gamma/Q/inv_occ so
    the connect-rate terms exercise the subspace machinery in every
    second-stage calibration."""
    r = np.random.default_rng(seed)
    lo = np.asarray(jnp.min(ts.tri_p0, axis=0))
    hi = np.asarray(jnp.max(ts.tri_p0, axis=0))
    diag2 = float(np.sum((hi - lo) ** 2))

    def rand_classifier(n, bias):
        cp = r.uniform(lo, hi, size=(n, 3)).astype(np.float32)
        cn = r.normal(size=(n, 3)).astype(np.float32)
        cn /= np.linalg.norm(cn, axis=1, keepdims=True)
        return classify.Classifier(centers_pos=jnp.asarray(cp),
                                   centers_norm=jnp.asarray(cn),
                                   diag2=jnp.float32(diag2), label_bias=bias)

    gamma = r.uniform(0.2, 1.0, size=(NUM_SUBSPACE, NUM_SUBSPACE))
    gamma /= gamma.sum(axis=1, keepdims=True)
    cmf = np.cumsum(gamma, axis=1).astype(np.float32)
    q = r.uniform(0.5, 2.0, size=(NUM_SUBSPACE,)).astype(np.float32)
    inv_occ = r.uniform(0.5, 4.0, size=(NUM_SUBSPACE,)).astype(np.float32)
    return classify.SubspaceState(
        eye=rand_classifier(64, 0),
        light=rand_classifier(48, NUM_SUBSPACE_LIGHTSOURCE),
        q=jnp.asarray(q), cmf_gamma=jnp.asarray(cmf),
        alias_prob=jnp.ones((1, 1)), alias_idx=jnp.zeros((1, 1), jnp.int32),
        inv_occ=jnp.asarray(inv_occ), trained=True,
        second_stage=second_stage)


@pytest.fixture(scope="module", params=["weighted", "uniform", "mixture"])
def setup(request):
    """One fixture per second-stage calibration: the cached light/eye RMIS
    chains AND the combiners must agree with the oracle under every rate
    form (a mismatched rate anywhere in the recursion breaks the weight
    partition — this caught the light_trace copy of connect_rate)."""
    ts, desc, cam = load_trace_scene(default_scene_path())
    cam.aspect = 1.0
    ss = _random_trained_state(ts, second_stage=request.param)
    eye, U, V, W = cam.uvw()
    side = int(np.sqrt(N_LANES)) + 1
    o, d, state = camera_rays(jnp.asarray(eye), jnp.asarray(U),
                              jnp.asarray(V), jnp.asarray(W), side, side, 3)
    o, d = o[:N_LANES], d[:N_LANES]
    state = jax.tree_util.tree_map(lambda a: a[:N_LANES], state)
    rec = jax.jit(lambda o, d, s: spcbpt.trace_eye_paths(
        ts, ss, o, d, s, MAX_EYE))(o, d, state)
    lvs = jax.jit(lambda: light_trace.trace_light_paths(
        ts, ss, N_LANES, 0, max_depth=MAX_LIGHT))()
    return ts, ss, (o, d), rec, lvs


def _build_path(od, rec, lvs, m, l):
    """Complete path SoA for eye chain length m (surface hits) + light chain
    suffix of depth l. Vertex 0 = camera; vertex size-1 = light origin."""
    o, d = od
    n = o.shape[0]
    size = m + l + 2
    at = lambda tree, i: jax.tree_util.tree_map(lambda a: a[i], tree)

    pos = [o]
    nrm = [d]
    col = [jnp.ones_like(o)]
    mat = [jnp.zeros((n,), jnp.int32)]
    for i in range(m):
        v = at(rec["v"], i)
        pos.append(v.position)
        nrm.append(v.normal)
        col.append(v.color)
        mat.append(v.mat_id)
    for j in range(l, -1, -1):
        v = at(lvs, j)
        pos.append(v.position)
        nrm.append(v.normal)
        col.append(v.color)
        mat.append(v.mat_id)

    lv0 = at(lvs, 0)
    valid = jnp.ones((n,), bool)
    for i in range(m):
        valid = valid & rec["valid"][i]
    for j in range(1, l + 1):
        valid = valid & at(lvs, j).valid

    path = dict(
        position=jnp.stack(pos, axis=1),
        normal=jnp.stack(nrm, axis=1),
        color=jnp.stack(col, axis=1),
        mat_id=jnp.stack(mat, axis=1),
        size=jnp.full((n,), size, jnp.int32),
        # origin vertices: cumulative pdf == single_pdf, so the raw emission
        # is ratio * single_pdf
        light_flux=lv0.ratio * lv0.single_pdf[..., None],
        light_pdf=lv0.single_pdf,
        light_subspace=lv0.subspace_id,
    )
    return path, valid, size


def _oracle_ratio(ts, ss, path, strategy, size):
    num = oracle.mis_weight_spcbpt(ts, ss, path, jnp.full_like(path["size"],
                                                               strategy), size)
    den = jnp.zeros_like(num)
    for i in range(2, size + 1):
        den = den + oracle.mis_weight_spcbpt(
            ts, ss, path, jnp.full_like(path["size"], i), size)
    return num / jnp.maximum(den, 1e-30)


def _compare(cached, expect, valid, gate_max=0.05, gate_mean=0.01,
             floor=1e-3):
    cached = np.asarray(cached)
    expect = np.asarray(expect)
    ok = np.asarray(valid) & np.isfinite(cached) & np.isfinite(expect) \
        & (expect > floor)
    assert ok.sum() >= 20, f"too few valid lanes: {ok.sum()}"
    rel = np.abs(cached[ok] - expect[ok]) / np.maximum(expect[ok], floor)
    return rel, ok


@pytest.mark.parametrize("m,l", [(1, 1), (2, 1), (1, 2), (2, 2), (3, 1)])
def test_general_connection_matches_oracle(setup, m, l):
    ts, ss, od, rec, lvs = setup
    path, valid, size = _build_path(od, rec, lvs, m, l)
    eye_v = jax.tree_util.tree_map(lambda a: a[m - 1], rec["v"])
    light_v = jax.tree_util.tree_map(lambda a: a[l], lvs)
    cached = rmis.general_connection(ts, ss, eye_v, light_v)
    expect = _oracle_ratio(ts, ss, path, m + 1, size)
    rel, ok = _compare(cached, expect, valid)
    assert rel.max() < 0.05, (
        f"m={m} l={l}: max rel err {rel.max():.4f} over {ok.sum()} lanes")
    assert rel.mean() < 0.01, f"mean rel err {rel.mean():.5f}"


@pytest.mark.parametrize("m", [1, 2, 3])
def test_light_source_connection_matches_oracle(setup, m):
    ts, ss, od, rec, lvs = setup
    path, valid, size = _build_path(od, rec, lvs, m, 0)
    eye_v = jax.tree_util.tree_map(lambda a: a[m - 1], rec["v"])
    lv0 = jax.tree_util.tree_map(lambda a: a[0], lvs)
    cached = rmis.connection_light_source(ts, ss, eye_v, lv0)
    expect = _oracle_ratio(ts, ss, path, m + 1, size)
    rel, ok = _compare(cached, expect, valid)
    assert rel.max() < 0.05, (
        f"m={m}: max rel err {rel.max():.4f} over {ok.sum()} lanes")
    assert rel.mean() < 0.01


@pytest.mark.parametrize("m", [1, 2])
def test_emitter_hit_matches_oracle(setup, m):
    """The pure-eye (BSDF emitter hit) strategy: cached light_hit weight for
    an eye chain that lands on the light-origin point vs the oracle's
    strategy_id == size weight (hit_program.cu:128-147 semantics)."""
    ts, ss, od, rec, lvs = setup
    path, valid, size = _build_path(od, rec, lvs, m, 0)
    eye_v = jax.tree_util.tree_map(lambda a: a[m - 1], rec["v"])
    lv0 = jax.tree_util.tree_map(lambda a: a[0], lvs)
    cached = rmis.light_hit(ts, ss, eye_v, lv0.position, lv0.normal,
                            lv0.ratio * lv0.single_pdf[..., None],
                            lv0.single_pdf, lv0.subspace_id)
    expect = _oracle_ratio(ts, ss, path, size, size)
    rel, ok = _compare(cached, expect, valid)
    assert rel.max() < 0.05, (
        f"m={m}: max rel err {rel.max():.4f} over {ok.sum()} lanes")
    assert rel.mean() < 0.01


@pytest.mark.parametrize("m", [1, 2, 3])
def test_light_hit_cached_matches(setup, m):
    """light_hit_cached (the renderer's zero-BSDF-call emitter-hit weight,
    fed by tracing_update_eye's products and the carried sampling pdf) must
    equal the from-scratch light_hit for every chain depth and second-stage
    calibration. The carried quantities are reconstructed here exactly the
    way the render bodies carry them (pending_single = pdf_bsdf * rr of the
    bounce that generated the hit direction)."""
    ts, ss, od, rec, lvs = setup
    eye_v = jax.tree_util.tree_map(lambda a: a[m - 1], rec["v"])
    lv0 = jax.tree_util.tree_map(lambda a: a[0], lvs)
    flux = lv0.ratio * lv0.single_pdf[..., None]

    conn_vec = lv0.position - eye_v.position
    in_dir = conn_vec / jnp.linalg.norm(conn_vec, axis=-1, keepdims=True)
    cos_last = jnp.abs(jnp.sum(eye_v.normal * in_dir, axis=-1))
    inv_t2 = 1.0 / jnp.maximum(jnp.sum(conn_vec * conn_vec, axis=-1), 1e-20)
    lb = eye_v.last_position - eye_v.position
    lb = lb / jnp.maximum(jnp.linalg.norm(lb, axis=-1, keepdims=True), 1e-20)
    pending_single = rmis._pdf_at(ts, eye_v, lb, in_dir) * rmis._rr(eye_v)
    rmis3_next, rmis_u_next = rmis.tracing_update_eye(
        ts, ss, eye_v, lv0.position, jnp.zeros_like(lv0.valid), in_dir=in_dir)

    cached = rmis.light_hit_cached(
        ss, eye_v, rmis3_next, rmis_u_next, in_dir, cos_last, inv_t2,
        pending_single, lv0.normal, flux, lv0.single_pdf, lv0.subspace_id)
    expect = rmis.light_hit(ts, ss, eye_v, lv0.position, lv0.normal,
                            flux, lv0.single_pdf, lv0.subspace_id)

    valid = jnp.ones_like(lv0.valid)
    for i in range(m):
        valid = valid & rec["valid"][i]
    c = np.asarray(cached)
    e = np.asarray(expect)
    ok = np.asarray(valid) & np.isfinite(c) & np.isfinite(e) & (e > 1e-6)
    assert ok.sum() >= 20
    np.testing.assert_allclose(c[ok], e[ok], rtol=2e-4, atol=1e-7)


@pytest.mark.parametrize("m,l", [(1, 0), (2, 0), (1, 1), (2, 2), (3, 1)])
def test_connect_vertex_fused_matches(setup, m, l):
    """The fused connection evaluator (one material gather / eval / pdf-pair
    per endpoint, shared eye-side RMIS accumulator) must reproduce the
    original connect_vertex (which composes the separate general /
    light-source combiners) for every chain depth, light depth (incl. the
    on-light origin l=0) and second-stage calibration. Tolerance covers eval
    reciprocity's float reordering only."""
    ts, ss, od, rec, lvs = setup
    eye_v = jax.tree_util.tree_map(lambda a: a[m - 1], rec["v"])
    light_v = jax.tree_util.tree_map(lambda a: a[l], lvs)
    eye = spcbpt._ConnEye(eye_v, jnp.ones_like(eye_v.position))

    fused = spcbpt.connect_vertex_fused(ts, ss, eye, light_v)
    orig = spcbpt.connect_vertex(ts, ss, eye, light_v)

    valid = light_v.valid
    for i in range(m):
        valid = valid & rec["valid"][i]
    f = np.asarray(fused)
    o = np.asarray(orig)
    ok = np.asarray(valid) & np.all(np.isfinite(o), axis=-1)
    assert ok.sum() >= 20
    atol = 1e-6 * max(1.0, np.abs(o[ok]).max())
    np.testing.assert_allclose(f[ok], o[ok], rtol=2e-4, atol=atol)

    # the precomputed-argument fast paths (pmf1 == Gamma(e,l), hoisted
    # eye_parts, packed weight_b) must be exact too
    from spcbpt_tpu.train import classify
    pmf1 = classify.gamma_block(ss, eye_v.subspace_id, light_v.subspace_id)
    parts = rmis.tracing_weight_eye_parts(ts, ss, eye_v, eye_v.position)
    wb = rmis.tracing_weight_light(ts, ss, light_v, eye_v.position)
    fast = spcbpt.connect_vertex_fused(ts, ss, eye, light_v, pmf1=pmf1,
                                       eye_parts=parts, weight_b=wb)
    np.testing.assert_allclose(np.asarray(fast)[ok], o[ok], rtol=2e-4,
                               atol=atol)


def test_is_brdf_zeroes_weight(setup):
    """Specular vertices force the connection weight to 0 (rmis.h:65-67,
    213-216)."""
    ts, ss, od, rec, lvs = setup
    eye_v = jax.tree_util.tree_map(lambda a: a[0], rec["v"])
    light_v = jax.tree_util.tree_map(lambda a: a[1], lvs)
    eye_brdf = eye_v.replace(is_brdf=jnp.ones_like(eye_v.is_brdf))
    w = rmis.general_connection(ts, ss, eye_brdf, light_v)
    assert np.asarray(jnp.abs(w)).max() == 0.0
    light_brdf = light_v.replace(is_brdf=jnp.ones_like(light_v.is_brdf))
    w2 = rmis.general_connection(ts, ss, eye_v, light_brdf)
    assert np.asarray(jnp.abs(w2)).max() == 0.0


def test_perturbed_rmis_cache_is_detected(setup):
    """Sanity: the comparison has teeth — corrupting the cached RMIS
    accumulators must push the error far over the gates."""
    ts, ss, od, rec, lvs = setup
    m, l = 2, 1
    path, valid, size = _build_path(od, rec, lvs, m, l)
    expect = _oracle_ratio(ts, ss, path, m + 1, size)
    eye_v = jax.tree_util.tree_map(lambda a: a[m - 1], rec["v"])
    light_v = jax.tree_util.tree_map(lambda a: a[l], lvs)

    # corrupt the chain the active mode actually transports
    if ss.second_stage == "uniform":
        bad_eye = eye_v.replace(rmis_u=eye_v.rmis_u * 1.5 + 0.05)
    else:
        bad_eye = eye_v.replace(rmis3=eye_v.rmis3 * 1.5 + 0.05)
    rel, _ = _compare(rmis.general_connection(ts, ss, bad_eye, light_v),
                      expect, valid)
    assert rel.max() > 0.05, "perturbed eye rmis chain not detected"

    # light-side: use a deeper light vertex (l=2) whose rmis pointer carries
    # accumulated strategies; at l=1 it only covers the tiny pure-eye term
    m2, l2 = 1, 2
    path2, valid2, size2 = _build_path(od, rec, lvs, m2, l2)
    expect2 = _oracle_ratio(ts, ss, path2, m2 + 1, size2)
    eye_v2 = jax.tree_util.tree_map(lambda a: a[m2 - 1], rec["v"])
    light_v2 = jax.tree_util.tree_map(lambda a: a[l2], lvs)
    rel_ok, _ = _compare(rmis.general_connection(ts, ss, eye_v2, light_v2),
                         expect2, valid2)
    assert rel_ok.max() < 0.05
    bad_light = light_v2.replace(rmis=light_v2.rmis * 5.0 + 0.5)
    rel2, _ = _compare(rmis.general_connection(ts, ss, eye_v2, bad_light),
                       expect2, valid2)
    assert rel2.max() > 0.05, "perturbed light rmis not detected"
