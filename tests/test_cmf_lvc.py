import numpy as np
import jax
import jax.numpy as jnp

from spcbpt_tpu.ops.cmf import segment_pmf, segment_searchsorted
from spcbpt_tpu.utils import rng as rng_mod


def test_segment_searchsorted_matches_numpy():
    rng = np.random.default_rng(0)
    # three segments of different sizes inside one flat array
    sizes = [5, 1, 17]
    cmfs = []
    for s in sizes:
        w = rng.uniform(0.1, 1.0, s)
        cmfs.append(np.cumsum(w) / w.sum())
    flat = jnp.asarray(np.concatenate(cmfs), jnp.float32)
    base = jnp.asarray([0, 5, 6], jnp.int32)
    size = jnp.asarray(sizes, jnp.int32)

    xs = np.asarray([0.0, 0.3, 0.99, 0.5], np.float32)
    for x in xs:
        got = np.asarray(segment_searchsorted(
            flat, base, size, jnp.full(3, x), max_size=32))
        for seg in range(3):
            expect = int(np.searchsorted(cmfs[seg], x, side="right"))
            expect = min(expect, sizes[seg] - 1)
            assert got[seg] == expect, (seg, x, got[seg], expect)


def test_segment_sampling_distribution():
    """Sampling through the segmented CMF must reproduce the weights."""
    rng = np.random.default_rng(1)
    w = rng.uniform(0.0, 1.0, 16)
    w[3] = 0.0
    cmf = np.cumsum(w) / w.sum()
    flat = jnp.asarray(cmf, jnp.float32)
    n = 200_000
    state = rng_mod.seed(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(5))
    r, _ = rng_mod.next_float(state)
    base = jnp.zeros(n, jnp.int32)
    size = jnp.full(n, 16, jnp.int32)
    idx = np.asarray(jax.jit(
        lambda r: segment_searchsorted(flat, base, size, r, 16))(r))
    hist = np.bincount(idx, minlength=16) / n
    np.testing.assert_allclose(hist, w / w.sum(), atol=0.01)
    # pmf recovery
    pmf = np.asarray(segment_pmf(flat, base[:16], jnp.arange(16)))
    np.testing.assert_allclose(pmf, w / w.sum(), rtol=1e-5, atol=1e-7)


def test_lvc_sampler_structure():
    """build_sampler groups vertices by subspace with normalized segment CMFs."""
    from spcbpt_tpu.render.lvc import build_sampler
    from spcbpt_tpu.render.vertex import LightVertices
    from spcbpt_tpu.config import NUM_SUBSPACE

    n = 64
    rng = np.random.default_rng(2)
    sub = rng.integers(0, 5, n).astype(np.int32)
    valid = rng.uniform(size=n) > 0.2
    flux = rng.uniform(0.1, 1.0, (n, 3)).astype(np.float32)
    pdf = rng.uniform(0.5, 2.0, n).astype(np.float32)

    z3 = jnp.zeros((n, 3))
    zb = jnp.zeros(n, bool)
    lv = LightVertices(
        position=z3, normal=z3, ratio=jnp.asarray(flux / pdf[:, None]),
        color=z3, last_position=z3, single_pdf=jnp.ones(n),
        last_normal_proj=jnp.ones(n), last_lum=jnp.zeros(n),
        rmis=jnp.ones(n), mat_id=jnp.zeros(n, jnp.int32),
        subspace_id=jnp.asarray(sub), eye_label=jnp.zeros(n, jnp.int32),
        last_zone_id=jnp.zeros(n, jnp.int32),
        depth=jnp.zeros(n, jnp.int32), is_origin=jnp.ones(n, bool),
        is_env=zb, is_ll_direction=zb, is_brdf=zb, last_brdf=zb,
        valid=jnp.asarray(valid))
    s = jax.jit(build_sampler)(lv)

    assert int(s.vertex_count) == valid.sum()
    assert int(s.path_count) == valid.sum()  # all depth 0 here
    seg_size = np.asarray(s.seg_size)
    for k in range(5):
        assert seg_size[k] == ((sub == k) & valid).sum()
    assert seg_size[5:].sum() == 0
    # weights grouped correctly: seg_sum matches manual sums
    w = flux.sum(-1) / pdf
    seg_sum = np.asarray(s.seg_sum)
    for k in range(5):
        np.testing.assert_allclose(seg_sum[k], w[(sub == k) & valid].sum(),
                                   rtol=1e-5)
    # cmf of each segment ends at 1
    cmf = np.asarray(s.cmf)
    start = np.asarray(s.seg_start)
    for k in range(5):
        if seg_size[k]:
            end = start[k] + seg_size[k] - 1
            np.testing.assert_allclose(cmf[end], 1.0, rtol=1e-5)
    # order points to valid vertices first
    order = np.asarray(s.order)
    assert valid[order[:valid.sum()]].all()


def test_classifier_roundtrip():
    """Centroid classifier: samples at the centers classify to themselves."""
    from spcbpt_tpu.train import classify
    rng = np.random.default_rng(3)
    pos = rng.uniform(-1, 1, (500, 3))
    norm = rng.normal(size=(500, 3))
    norm /= np.linalg.norm(norm, axis=-1, keepdims=True)
    w = rng.uniform(0.1, 1.0, 500)
    cls = classify.build_classifier(pos, norm, w, 32)
    assert cls.centers_pos.shape == (32, 3)
    labels = np.asarray(classify.classify(cls, cls.centers_pos,
                                          cls.centers_norm))
    np.testing.assert_array_equal(labels, np.arange(32))


def test_gamma_cmf_roundtrip():
    from spcbpt_tpu.train import classify, qgamma
    from spcbpt_tpu.config import NUM_SUBSPACE, CONSERVATIVE_RATE
    rng = np.random.default_rng(4)
    g = rng.uniform(0, 1, (NUM_SUBSPACE, NUM_SUBSPACE)).astype(np.float32)
    g /= g.sum(1, keepdims=True)
    cmf = np.asarray(qgamma.gamma_to_cmf(jnp.asarray(g)))
    assert np.allclose(cmf[:, -1], 1.0)
    ss = classify.SubspaceState(
        eye=classify.dummy_classifier(), light=classify.dummy_classifier(),
        q=jnp.ones(NUM_SUBSPACE), cmf_gamma=jnp.asarray(cmf), trained=True)
    eye_id = jnp.asarray([0, 5, 17])
    light_id = jnp.asarray([0, 1, 999])
    got = np.asarray(classify.gamma_block(ss, eye_id, light_id))
    expect = (g * (1 - CONSERVATIVE_RATE) + CONSERVATIVE_RATE / NUM_SUBSPACE)[
        np.asarray(eye_id), np.asarray(light_id)]
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-7)


def test_alias_sampler_matches_cmf_distribution():
    """The O(1) alias first-stage sampler must draw from the same
    (conservative-mixed) Gamma rows as the CMF bisection and report the same
    pmf values."""
    import jax
    from spcbpt_tpu.train import classify, qgamma
    from spcbpt_tpu.render.lvc import sample_first_stage
    from spcbpt_tpu.config import NUM_SUBSPACE, CONSERVATIVE_RATE

    rng = np.random.default_rng(7)
    g = rng.uniform(0, 1, (NUM_SUBSPACE, NUM_SUBSPACE)).astype(np.float32) ** 4
    g /= g.sum(1, keepdims=True)
    mixed = g * (1 - CONSERVATIVE_RATE) + CONSERVATIVE_RATE / NUM_SUBSPACE
    aprob, aidx = classify.build_alias(mixed)
    base = classify.untrained_state()
    ss_alias = classify.SubspaceState(
        eye=base.eye, light=base.light, q=base.q,
        cmf_gamma=qgamma.gamma_to_cmf(jnp.asarray(g)),
        alias_prob=jnp.asarray(aprob), alias_idx=jnp.asarray(aidx),
        trained=True)
    ss_cmf = ss_alias.replace(alias_prob=jnp.ones((1, 1)),
                              alias_idx=jnp.zeros((1, 1), jnp.int32))

    n = 200_000
    state = rng_mod.seed(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(11))
    eye_row = jnp.full((n,), 3, jnp.int32)
    l_a, pmf_a, _ = jax.jit(sample_first_stage)(ss_alias, eye_row, state)
    l_c, pmf_c, _ = jax.jit(sample_first_stage)(ss_cmf, eye_row, state)

    # same target distribution (chi-square-lite on the top columns)
    top = np.argsort(-mixed[3])[:20]
    ha = np.bincount(np.asarray(l_a), minlength=NUM_SUBSPACE) / n
    hc = np.bincount(np.asarray(l_c), minlength=NUM_SUBSPACE) / n
    np.testing.assert_allclose(ha[top], mixed[3][top], rtol=0.15, atol=2e-4)
    np.testing.assert_allclose(hc[top], mixed[3][top], rtol=0.15, atol=2e-4)
    # pmf reported by the alias path equals the mixed Gamma entry
    np.testing.assert_allclose(np.asarray(pmf_a),
                               mixed[3][np.asarray(l_a)], rtol=1e-3)


def _random_lv(n, n_sub=6, seed=7):
    rng = np.random.default_rng(seed)
    from spcbpt_tpu.render.vertex import LightVertices
    f3 = lambda: jnp.asarray(rng.uniform(-2, 2, (n, 3)).astype(np.float32))
    f1 = lambda lo=0.1, hi=2.0: jnp.asarray(
        rng.uniform(lo, hi, n).astype(np.float32))
    i1 = lambda hi: jnp.asarray(rng.integers(0, hi, n), jnp.int32)
    b1 = lambda p=0.5: jnp.asarray(rng.uniform(size=n) < p)
    return LightVertices(
        position=f3(), normal=f3(), ratio=f3() ** 2, color=f3(),
        last_position=f3(), single_pdf=f1(), last_normal_proj=f1(0.0, 1.0),
        last_lum=f1(), rmis=f1(), mat_id=i1(16), subspace_id=i1(n_sub),
        eye_label=i1(1000), last_zone_id=i1(1000), depth=i1(4),
        is_origin=b1(), is_env=b1(0.1), is_ll_direction=b1(0.1),
        is_brdf=b1(0.1), last_brdf=b1(0.1), valid=b1(0.8))


def test_pack_matrix_unpack_rows_roundtrip():
    """pack_matrix -> unpack_rows must reproduce every field exactly
    (ADVICE r3: the packed fast path had no direct unit test)."""
    from spcbpt_tpu.render.vertex import pack_matrix, unpack_rows
    import dataclasses
    lv = _random_lv(257)
    back = unpack_rows(pack_matrix(lv))
    for f in dataclasses.fields(lv):
        a = np.asarray(getattr(lv, f.name))
        b = np.asarray(getattr(back, f.name))
        assert a.dtype == b.dtype, f.name
        np.testing.assert_array_equal(a, b, err_msg=f.name)


def test_second_stage_table_unbiased_and_targets_pmf():
    """The presampled second-stage table (ADVICE r3): (1) estimator property
    E[w(v)/pmf(v)] = seg_sum per subspace (what the renderer relies on);
    (2) marginal histogram of table entries over many table seeds matches
    the weighted per-subspace pmf."""
    from spcbpt_tpu.render.lvc import (build_sampler, presample_tables,
                                       sample_second_stage_table)
    from spcbpt_tpu.utils import vec

    n_sub = 5
    lv = _random_lv(96, n_sub=n_sub, seed=11)
    s = jax.jit(lambda lv: build_sampler(lv, table_mode="weighted",
                                         table_k=64, table_seed=0))(lv)
    w = np.asarray(vec.float3weight(s.vertices.ratio))
    w = np.where(np.asarray(s.vertices.valid), w, 0.0)
    sub = np.asarray(s.vertices.subspace_id)
    seg_sum = np.asarray(s.seg_sum)

    # (1) unbiasedness of draws through the table
    n_draw = 20_000
    est = np.zeros(n_sub)
    for k in range(n_sub):
        lsub = jnp.full((n_draw,), k, jnp.int32)
        state = rng_mod.seed(jnp.arange(n_draw, dtype=jnp.uint32),
                             jnp.uint32(100 + k))
        idx, pmf, ok, _ = sample_second_stage_table(s, lsub, state)
        assert bool(jnp.all(ok))
        est[k] = float(jnp.mean(w[np.asarray(idx)] / np.asarray(pmf)))
    np.testing.assert_allclose(est, seg_sum[:n_sub], rtol=0.15)

    # (2) marginal table-entry histogram ~ weighted pmf, over table seeds
    counts = np.zeros(len(w))
    n_seeds = 32
    pres = jax.jit(lambda seed: presample_tables(s, "weighted", 32, seed))
    for t in range(n_seeds):
        idx, _ = pres(jnp.uint32(1000 + t))
        counts += np.bincount(np.asarray(idx)[:n_sub].reshape(-1),
                              minlength=len(w))
    for k in range(n_sub):
        m = (sub == k) & (w > 0)
        if not m.any():
            continue
        hist = counts[m] / counts[m].sum()
        pmf_ref = w[m] / w[m].sum()
        np.testing.assert_allclose(hist, pmf_ref, atol=0.05)
