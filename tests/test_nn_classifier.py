import numpy as np
import jax.numpy as jnp

from spcbpt_tpu.config import NUM_SUBSPACE
from spcbpt_tpu.train import nn_classifier as nn


def _setup(n=2048, seed=0):
    rng = np.random.default_rng(seed)
    gamma = rng.uniform(0, 1, (NUM_SUBSPACE, NUM_SUBSPACE)).astype(np.float32)
    gamma /= gamma.sum(1, keepdims=True)
    st = nn.init_params(rng, gamma)
    pos = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
    nrm = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    feats = nn.encode(pos, nrm, jnp.zeros(3), jnp.ones(3))
    eye = jnp.asarray(rng.integers(0, NUM_SUBSPACE, n), jnp.int32)
    return rng, gamma, st, feats, eye


def test_forward_is_distribution():
    _, gamma, st, feats, eye = _setup()
    probs, ids = nn.forward(st, eye, feats)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, rtol=1e-4)
    assert ids.shape == (feats.shape[0], nn.CLOSE_SET)
    # close sets are the top-Gamma columns of each row
    row0 = int(eye[0])
    expect = np.argsort(-gamma[row0])[:nn.CLOSE_SET]
    np.testing.assert_array_equal(np.sort(np.asarray(ids[0])),
                                  np.sort(expect))


def test_training_reduces_second_moment():
    rng, gamma, st, feats, eye = _setup()
    n = feats.shape[0]
    _, ids = nn.forward(st, eye, feats)
    light = np.asarray(ids)[np.arange(n), rng.integers(0, nn.CLOSE_SET, n)]
    batch = dict(eye_label=eye, feats=feats, light_label=jnp.asarray(light),
                 f_square=jnp.asarray(rng.uniform(0.5, 1, n), jnp.float32),
                 pdf0=jnp.asarray(rng.uniform(0.01, 0.1, n), jnp.float32),
                 peak=jnp.asarray(rng.uniform(0.5, 2, n), jnp.float32))
    st2, losses = nn.train(st, jnp.asarray(gamma), [batch] * 15, lr=3e-3)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9


def test_refined_rows_stay_normalized():
    _, gamma, st, feats, eye = _setup(n=16)
    rows = nn.refined_gamma_row(st, jnp.asarray(gamma), eye, feats)
    np.testing.assert_allclose(np.asarray(rows.sum(-1)), 1.0, rtol=1e-4)


# ---------------------------------------------------------------------------
# render-path wiring (lvc.sample_first_stage blended mixture)
# ---------------------------------------------------------------------------
import jax

from spcbpt_tpu.render import lvc
from spcbpt_tpu.train import classify
from spcbpt_tpu.utils import rng as rng_mod


def _tables_state(seed=3, blend=0.5):
    rng = np.random.default_rng(seed)
    gamma = rng.uniform(0.1, 1, (NUM_SUBSPACE, NUM_SUBSPACE)).astype(np.float32)
    gamma /= gamma.sum(1, keepdims=True)
    st = nn.init_params(rng, gamma)
    nt = nn.tables_from_state(st, np.zeros(3), np.ones(3), blend=blend)
    aprob, aidx = classify.build_alias(gamma)
    cmf = np.cumsum(gamma, axis=1).astype(np.float32)
    cmf[:, -1] = 1.0
    ss = classify.publish_tables(classify.SubspaceState(
        eye=classify.dummy_classifier(), light=classify.dummy_classifier(),
        q=jnp.ones((NUM_SUBSPACE,)), cmf_gamma=jnp.asarray(cmf),
        alias_prob=jnp.asarray(aprob), alias_idx=jnp.asarray(aidx),
        nn=nt, trained=True))
    return ss, gamma, nt


def test_blended_first_stage_pmf_matches_histogram():
    """The reported pmf must be the EXACT density of the blended sampling
    procedure — the unbiasedness contract of lvc.sample_first_stage."""
    ss, gamma, nt = _tables_state()
    n = 1 << 17
    row = 17
    eye = jnp.full((n,), row, jnp.int32)
    pos = jnp.tile(jnp.asarray([[0.3, 0.6, 0.2]], jnp.float32), (n, 1))
    nrm = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32), (n, 1))
    state = rng_mod.seed(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(9))
    l, pmf, _ = jax.jit(lambda s: lvc.sample_first_stage(
        ss, eye, s, position=pos, normal=nrm))(state)
    l = np.asarray(l)
    pmf = np.asarray(pmf)
    # analytic blended row at this (row, x)
    probs, ids = nn.close_probs(nt, eye[:1], pos[:1], nrm[:1])
    analytic = 0.5 * gamma[row].astype(np.float64)
    analytic[np.asarray(ids[0])] += 0.5 * np.asarray(probs[0], np.float64)
    # 1. reported pmf == analytic pmf of the drawn label
    np.testing.assert_allclose(pmf, analytic[l], rtol=2e-4, atol=1e-7)
    # 2. histogram of draws ~ analytic (check the close-set labels, which
    #    hold ~50% of the mass; SE at 130k draws ~ 3% per big bin)
    hist = np.bincount(l, minlength=NUM_SUBSPACE) / n
    big = np.asarray(ids[0])
    np.testing.assert_allclose(hist[big], analytic[big], rtol=0.12,
                               atol=2e-4)
    # 3. the analytic pmf is a distribution
    np.testing.assert_allclose(analytic.sum(), 1.0, rtol=1e-5)


def test_nn_state_checkpoint_roundtrip(tmp_path):
    from spcbpt_tpu import checkpoint as ckpt
    ss, _, nt = _tables_state()
    ss = ss.replace(inv_occ=jnp.ones((NUM_SUBSPACE,)))
    p = str(tmp_path / "ck.npz")
    ckpt.save_subspace_state(p, ss)
    ss2 = ckpt.load_subspace_state(p)
    assert ss2.nn is not None and ss2.nn.blend == nt.blend
    np.testing.assert_array_equal(np.asarray(ss2.nn.close_set),
                                  np.asarray(nt.close_set))
    np.testing.assert_allclose(np.asarray(ss2.nn.w1), np.asarray(nt.w1))
