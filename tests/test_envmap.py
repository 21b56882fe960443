import io
import os

import numpy as np
import jax
import jax.numpy as jnp

from spcbpt_tpu.scene import envmap as em
from spcbpt_tpu.utils import rng as rng_mod


def test_dir_uv_roundtrip():
    rng = np.random.default_rng(0)
    d = rng.normal(size=(1000, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d, jnp.float32)
    uv = em.dir2uv(d)
    d2 = em.uv2dir(uv)
    np.testing.assert_allclose(np.asarray(d), np.asarray(d2), atol=2e-3)


def _simple_env(h=16, w=32, hot=(4, 7), hot_val=100.0):
    raster = np.ones((h, w, 3), np.float32) * 0.01
    raster[hot[0], hot[1]] = hot_val
    return em.build_envmap(raster, np.zeros(3), 2.0)


def test_env_pdf_normalizes():
    """Sum over texels of pmf = 1; pdf integrates to ~1 over solid angle for
    the equal-area v-mapping (v = (1+sin(el))/2 makes texels equal-area)."""
    env = _simple_env()
    cmf = np.asarray(env.cmf)
    assert abs(cmf[-1] - 1.0) < 1e-5
    assert (np.diff(cmf) >= -1e-7).all()


def test_env_sampling_prefers_hot_texel():
    env = _simple_env()
    n = 100_000
    state = rng_mod.seed(jnp.arange(n, dtype=jnp.uint32), jnp.uint32(3))
    r1, state = rng_mod.next_float(state)
    r2, state = rng_mod.next_float(state)
    r3, state = rng_mod.next_float(state)
    d, pdf, col, label = jax.jit(em.env_sample, static_argnums=())(env, r1, r2, r3)
    lum = np.asarray(col).sum(-1)
    frac_hot = (lum > 1.0).mean()
    # hot texel has ~74% of smoothed mass * 0.75 + tiny uniform share
    assert 0.3 < frac_hot < 0.95, frac_hot
    # pdf consistency: MC estimate of integral of 1 = E[1/pdf]/(4pi) ~ 1
    inv = 1.0 / np.asarray(pdf)
    est = inv.mean() / (4 * np.pi)
    assert abs(est - 1.0) < 0.05, est


def test_env_labels_in_reserved_block():
    from spcbpt_tpu.config import NUM_SUBSPACE
    env = _simple_env()
    rng = np.random.default_rng(1)
    d = rng.normal(size=(500, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    lab = np.asarray(em.env_label(env, jnp.asarray(d, jnp.float32)))
    assert (lab >= NUM_SUBSPACE - em.ENV_DIV_LEVEL ** 2).all()
    assert (lab <= NUM_SUBSPACE - 1).all()


def test_hdr_loader_roundtrip(tmp_path):
    """Write a flat (non-RLE) Radiance file and read it back."""
    from spcbpt_tpu.scene.hdr import load_hdr
    h, w = 4, 6
    rng = np.random.default_rng(2)
    rgb = rng.uniform(0.1, 4.0, (h, w, 3)).astype(np.float32)
    # encode RGBE
    maxc = rgb.max(axis=-1)
    exp = np.ceil(np.log2(np.maximum(maxc, 1e-30))).astype(np.int32) + 1
    scale = np.exp2(exp - 8)
    rgbe = np.zeros((h, w, 4), np.uint8)
    rgbe[..., :3] = np.clip(rgb / scale[..., None], 0, 255).astype(np.uint8)
    rgbe[..., 3] = (exp + 128).astype(np.uint8)
    path = os.path.join(tmp_path, "t.hdr")
    with open(path, "wb") as f:
        f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        f.write(f"-Y {h} +X {w}\n".encode())
        f.write(rgbe.tobytes())
    back = load_hdr(path)
    assert back.shape == (h, w, 3)
    # 8-bit mantissa floor-quantization: up to ~1/128 relative error
    np.testing.assert_allclose(back, rgb, rtol=0.05, atol=0.04)


def test_checkpoint_roundtrip(tmp_path):
    from spcbpt_tpu import checkpoint as ck
    from spcbpt_tpu.train import classify
    rng = np.random.default_rng(3)
    ss = classify.SubspaceState(
        eye=classify.Classifier(
            centers_pos=jnp.asarray(rng.normal(size=(10, 3)), jnp.float32),
            centers_norm=jnp.asarray(rng.normal(size=(10, 3)), jnp.float32),
            diag2=jnp.float32(2.5)),
        light=classify.dummy_classifier(4),
        q=jnp.asarray(rng.uniform(1, 5, 1000), jnp.float32),
        cmf_gamma=jnp.asarray(rng.uniform(size=(1000, 1000)), jnp.float32),
        trained=True)
    path = os.path.join(tmp_path, "ss.npz")
    ck.save_subspace_state(path, ss)
    back = ck.load_subspace_state(path)
    assert back.trained
    np.testing.assert_allclose(np.asarray(back.q), np.asarray(ss.q))
    np.testing.assert_allclose(np.asarray(back.eye.centers_pos),
                               np.asarray(ss.eye.centers_pos))
    np.testing.assert_allclose(float(back.eye.diag2), 2.5)
