import numpy as np
import jax
import jax.numpy as jnp

from spcbpt_tpu.config import CONSERVATIVE_RATE, NUM_SUBSPACE
from spcbpt_tpu.train import gamma_train


def synth_data(p=4096, c=6, seed=0, concentrated=True):
    """Synthetic second-moment data where a few (eye, light) pairs carry all
    the throughput: training should raise Gamma there."""
    rng = np.random.default_rng(seed)
    hot = rng.integers(0, NUM_SUBSPACE * NUM_SUBSPACE, 8)
    label_e = rng.choice(hot, (p, c)).astype(np.int32)
    peak = rng.uniform(0.5, 2.0, (p, c)).astype(np.float32)
    pdf0 = rng.uniform(0.01, 0.1, p).astype(np.float32)
    f_square = rng.uniform(0.5, 1.0, p).astype(np.float32)
    return gamma_train.GammaTrainData(
        f_square=jnp.asarray(f_square), pdf0=jnp.asarray(pdf0),
        peak=jnp.asarray(peak), label_e=jnp.asarray(label_e),
        valid=jnp.ones(p, bool)), hot


def test_theta_gamma_roundtrip():
    rng = np.random.default_rng(1)
    g = rng.uniform(0.001, 0.9, (4, NUM_SUBSPACE)).astype(np.float32)
    theta = gamma_train.theta_from_gamma(jnp.asarray(g))
    back = np.asarray(jax.nn.sigmoid(theta))
    np.testing.assert_allclose(back, g, rtol=1e-4)


def test_gamma_rows_are_mixtures():
    theta = jnp.asarray(np.random.default_rng(2).normal(
        size=(NUM_SUBSPACE, NUM_SUBSPACE)).astype(np.float32))
    g = np.asarray(gamma_train.gamma_from_theta(theta))
    np.testing.assert_allclose(g.sum(1), 1.0, rtol=1e-4)
    assert (g >= CONSERVATIVE_RATE / NUM_SUBSPACE - 1e-9).all()


def test_gradient_matches_finite_difference():
    """Autodiff gradient vs central finite differences on a few entries —
    the reference hand-derives this gradient (device_thrust.cu:1003-1148);
    this is our equivalence check."""
    td, hot = synth_data(p=512, c=4)
    theta = jnp.zeros((NUM_SUBSPACE, NUM_SUBSPACE))
    g = jax.grad(gamma_train.loss_fn)(theta, td)
    eps = 1e-2
    for flat_idx in [int(hot[0]), int(hot[1])]:
        i, j = flat_idx // NUM_SUBSPACE, flat_idx % NUM_SUBSPACE
        tp = theta.at[i, j].add(eps)
        tm = theta.at[i, j].add(-eps)
        fd = (gamma_train.loss_fn(tp, td) - gamma_train.loss_fn(tm, td)) / (2 * eps)
        assert abs(float(g[i, j]) - float(fd)) < 2e-4 + 0.05 * abs(float(fd)), \
            (i, j, float(g[i, j]), float(fd))


def test_training_reduces_loss_and_stays_finite():
    td, hot = synth_data(p=8192, c=6)
    g0 = jnp.full((NUM_SUBSPACE, NUM_SUBSPACE), 1.0 / NUM_SUBSPACE)
    gamma, losses = gamma_train.train_gamma(g0, td, lr=0.05, batch_size=2048,
                                            epochs=3)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.95, (losses[0], losses[-1])
    g = np.asarray(gamma)
    assert np.isfinite(g).all()
    np.testing.assert_allclose(g.sum(1), 1.0, rtol=1e-3)
    # the hot pairs should have received above-uniform probability
    rows = np.asarray(hot) // NUM_SUBSPACE
    cols = np.asarray(hot) % NUM_SUBSPACE
    assert (g[rows, cols] > 1.0 / NUM_SUBSPACE).all()


def test_clamp_outliers_safe_on_degenerate_rows():
    p = 64
    td = gamma_train.GammaTrainData(
        f_square=jnp.full(p, 10.0), pdf0=jnp.zeros(p),
        peak=jnp.zeros((p, 3)), label_e=jnp.zeros((p, 3), jnp.int32),
        valid=jnp.ones(p, bool))
    out = gamma_train.clamp_outliers(td)
    assert bool(jnp.isfinite(out.f_square).all())


def test_loss_gradient_finite_with_zero_denominators():
    """Valid lanes with near-zero denominators must not NaN the gradient
    (regression: the where-guard trap found on Cornell-scale pdfs)."""
    p = 128
    td = gamma_train.GammaTrainData(
        f_square=jnp.zeros(p),            # 0/0 candidate
        pdf0=jnp.zeros(p),
        peak=jnp.zeros((p, 3)),
        label_e=jnp.zeros((p, 3), jnp.int32),
        valid=jnp.ones(p, bool))
    g = jax.grad(gamma_train.loss_fn)(jnp.zeros((NUM_SUBSPACE, NUM_SUBSPACE)), td)
    assert bool(jnp.isfinite(g).all())
