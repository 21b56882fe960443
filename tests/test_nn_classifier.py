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
