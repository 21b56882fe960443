"""Progressive firefly clamp (render/common.accumulate clamp_c): caps each
subframe at clamp_c*sqrt(subframe+1) — consistent (bias -> 0), cuts the
unbounded connection tail the reference accumulates unclamped
(cuProg.h:901-938)."""
import numpy as np
import jax.numpy as jnp

from spcbpt_tpu.render.common import accumulate


def test_clamp_off_is_plain_running_mean():
    acc = jnp.zeros((4, 3))
    vals = [jnp.full((4, 3), v) for v in (1.0, 5.0, 3.0)]
    a_plain = acc
    a_none = acc
    for s, v in enumerate(vals):
        a_plain = accumulate(a_plain, v, s)
        a_none = accumulate(a_none, v, s, clamp_c=None)
    np.testing.assert_array_equal(np.asarray(a_plain), np.asarray(a_none))
    np.testing.assert_allclose(np.asarray(a_plain), 3.0, rtol=1e-6)


def test_clamp_caps_subframe_at_growing_bound():
    acc = jnp.zeros((1, 3))
    # subframe 0: bound = 2*sqrt(1) = 2 — a 100x firefly clamps to 2
    out = accumulate(acc, jnp.full((1, 3), 100.0), 0, clamp_c=2.0)
    np.testing.assert_allclose(np.asarray(out), 2.0, rtol=1e-6)
    # subframe 99: bound = 2*sqrt(100) = 20
    out = accumulate(jnp.zeros((1, 3)), jnp.full((1, 3), 100.0), 99,
                     clamp_c=2.0)
    np.testing.assert_allclose(np.asarray(out), 20.0 / 100.0, rtol=1e-6)


def test_clamp_is_consistent_on_heavy_tail():
    """Pareto(alpha=1.5) stream has infinite variance; the clamped running
    mean must converge toward the true mean as the bound grows. The exact
    accumulate() recurrence is replicated vectorized in numpy (the jnp
    function is exercised by the unit tests above; 100k sequential jnp
    dispatches would dominate the suite)."""
    rng = np.random.default_rng(7)
    n = 100_000
    xs = rng.pareto(1.5, size=n) + 1.0     # mean = alpha/(alpha-1) = 3
    s = np.arange(n, dtype=np.float64)
    clamped = np.minimum(xs, 1.0 * np.sqrt(s + 1.0))
    # running mean m_s = m_{s-1} + (x_s - m_{s-1})/(s+1) == cumulative mean
    means = np.cumsum(clamped) / (s + 1.0)
    # spot-check the recurrence against the actual function at a few steps
    acc = jnp.zeros((1, 1))
    for k in range(64):
        acc = accumulate(acc, jnp.full((1, 1), xs[k]), k, clamp_c=1.0)
    np.testing.assert_allclose(float(acc[0, 0]), means[63], rtol=1e-5)
    # bias decays with N as the bound grows (decade-scale comparison; the
    # per-sample noise makes adjacent-N comparisons non-monotone)
    b1k = abs(means[1_000 - 1] - 3.0)
    b100k = abs(means[-1] - 3.0)
    assert b100k < b1k * 0.75, (b1k, b100k)
    assert b100k < 0.4, b100k
