"""Gamma (subspace sampling matrix) training with Adam + autodiff.

The reference trains E = row-normalized sigmoid(theta), conservative-mixed,
to minimize the expected second-moment loss of the SPCBPT estimator:
    loss(path) = f^2/sample_pdf / (fix_pdf + sum_conns E[e,l]*peak/Q[l])
with hand-derived gradients through the parameterization on Thrust+cuBLAS
(reference: matrix_parameter device_thrust.cu:1561-1707, forward/backward
matrix_optimal_operator :923-1228, Adam :1437-1559, driver train_optimal_E
:3327-3344; batch 20000, 1 epoch, lr 0.01, theta init by inverse sigmoid of
the contribution-integral Gamma). Here the identical loss is ~30 lines of JAX
with optax.adam and jax.grad.

Training data layout: per path, connections padded to PRETRACE_CONN_PADDING
slots (zero peak slots are inert), so a minibatch is plain array slicing.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..config import CONSERVATIVE_RATE, NUM_SUBSPACE
from ..utils import vec


class GammaTrainData(NamedTuple):
    f_square: jnp.ndarray   # (P,) min(f3w(contri)^2/sample_pdf, clamp)
    pdf0: jnp.ndarray       # (P,) fix_pdf
    peak: jnp.ndarray       # (P, C) peak_pdf / Q[label_b], 0 where invalid
    label_e: jnp.ndarray    # (P, C) int32 flattened eye*N + light index
    valid: jnp.ndarray      # (P,) bool


LOSS_CLAMP = 1e6  # optimal_E_loss_threshold analogue


def build_train_data(batch, q, label_a, label_b) -> GammaTrainData:
    """From a PretraceBatch (+ final conn labels) to training arrays
    (construct_optimal_E_data_* device_thrust.cu:3124-3171)."""
    w = vec.float3weight(batch.contri)
    f_square = w * w / jnp.maximum(batch.sample_pdf, 1e-30)
    f_square = jnp.where(jnp.isnan(f_square) | (f_square > LOSS_CLAMP),
                         LOSS_CLAMP, f_square)
    ql = q[jnp.clip(label_b, 0, NUM_SUBSPACE - 1)]
    peak = jnp.where(ql > 0.0, batch.peak_pdf / ql, 0.0)
    peak = jnp.where(jnp.isnan(peak) | jnp.isinf(peak) | ~batch.conn_valid,
                     0.0, peak)
    label_e = (jnp.clip(label_a, 0, NUM_SUBSPACE - 1) * NUM_SUBSPACE
               + jnp.clip(label_b, 0, NUM_SUBSPACE - 1))
    # sanitize: non-finite entries on invalid lanes would leak NaN gradients
    # through the masked loss (the where-grad trap)
    pdf0 = jnp.where(jnp.isfinite(batch.fix_pdf), batch.fix_pdf, 0.0)
    f_square = jnp.where(jnp.isfinite(f_square), f_square, 0.0)
    valid = batch.valid & jnp.isfinite(batch.fix_pdf) & (batch.fix_pdf > 0.0)
    # condition the optimization: the loss is invariant under a joint scale of
    # (f_square, pdf0, peak) — normalize so denominators are O(1), otherwise
    # scene-unit-dependent pdf magnitudes (area pdfs ~ 1/dist^2 products)
    # underflow den^2 in the f32 backward pass
    denom_proxy = pdf0 + jnp.sum(peak, axis=1)
    mean_den = (jnp.sum(jnp.where(valid, denom_proxy, 0.0))
                / jnp.maximum(jnp.sum(valid), 1))
    scale = 1.0 / jnp.maximum(mean_den, 1e-30)
    return GammaTrainData(f_square=f_square * scale, pdf0=pdf0 * scale,
                          peak=peak * scale,
                          label_e=label_e.astype(jnp.int32),
                          valid=valid)


def clamp_outliers(td: GammaTrainData, sample: int = 1000) -> GammaTrainData:
    """Reference outlier clamp (device_thrust.cu:3282-3295): compute
    loss/uniform-pdf for the first `sample` paths, take the max as threshold,
    and clamp every path's f_square so its ratio stays below it."""
    proxy_pdf = td.pdf0 + jnp.sum(td.peak, axis=1) / 1000.0
    ratio = td.f_square / jnp.maximum(proxy_pdf, 1e-30)
    thresh = jnp.max(jnp.where(td.valid[:sample], ratio[:sample], 0.0))
    new_f = jnp.minimum(td.f_square, thresh * proxy_pdf)
    return td._replace(f_square=new_f)


def gamma_from_theta(theta):
    """E = sigmoid(theta) row-normalized + conservative mixture
    (get_E device_thrust.cu:1175-1190)."""
    e = jax.nn.sigmoid(theta)
    e = e / jnp.maximum(jnp.sum(e, axis=1, keepdims=True), 1e-30)
    return e * (1.0 - CONSERVATIVE_RATE) + CONSERVATIVE_RATE / NUM_SUBSPACE


def theta_from_gamma(gamma, eps: float = 1e-6):
    """Inverse-sigmoid init (initial_with_inver_sigmoid
    device_thrust.cu:3333-3334)."""
    g = jnp.clip(gamma, eps, 1.0 - eps)
    return jnp.log(g / (1.0 - g))


def loss_sum_fn(theta, batch: GammaTrainData):
    """Unnormalized loss: (sum of per-path losses, valid count). Data-parallel
    callers psum both parts so the global mean is exact for UNEVEN per-shard
    valid counts (a pmean of per-shard means is not)."""
    e = gamma_from_theta(theta).reshape(-1)
    pdf_sum = jnp.sum(e[batch.label_e] * batch.peak, axis=1)
    # epsilon-floored denominator: build_train_data normalizes the dataset so
    # mean(den) ~ 1, making 1e-9 a pure numerical guard. (A where-guard is NOT
    # enough: valid lanes can have den ~ 0, and d(f/den) = -f/den^2 hits 0/0.)
    den = batch.pdf0 + pdf_sum + 1e-9
    loss = jnp.where(batch.valid, batch.f_square, 0.0) / den
    return jnp.sum(loss), jnp.sum(batch.valid)


def loss_fn(theta, batch: GammaTrainData):
    s, c = loss_sum_fn(theta, batch)
    return s / jnp.maximum(c, 1)


def train_gamma(gamma_init, td: GammaTrainData, lr: float = 0.01,
                batch_size: int = 20000, epochs: int = 1,
                log_every: int = 0):
    """Adam over minibatches; returns (trained Gamma, losses per step)."""
    theta = theta_from_gamma(gamma_init)
    opt = optax.chain(optax.zero_nans(),
                      optax.adam(lr, b1=0.9, b2=0.999))
    opt_state = opt.init(theta)
    n = td.f_square.shape[0]
    steps_per_epoch = max(n // batch_size, 1)

    @jax.jit
    def step(theta, opt_state, batch):
        loss, g = jax.value_and_grad(loss_fn)(theta, batch)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(theta, updates), opt_state, loss

    losses = []
    for ep in range(epochs):
        for i in range(steps_per_epoch):
            sl = slice(i * batch_size, (i + 1) * batch_size)
            batch = jax.tree_util.tree_map(lambda a: a[sl], td)
            theta, opt_state, loss = step(theta, opt_state, batch)
            losses.append(float(loss))
            if log_every and (i % log_every == 0):
                print(f"gamma train epoch {ep} step {i}: loss {loss:.6g}")
    return gamma_from_theta(theta), losses
