"""Statistical convergence regression gates (VERDICT r1 weak #7).

A committed 4096-spp PT golden (tests/golden/cornell_pt_32.npz, generated on
CPU with fixed seeds) anchors two kinds of gate per estimator:

  1. bias: the 64-spp image mean must match the golden mean within 2%
     (mean-of-means SE at this sample count is ~0.9%, so a silent 2-3%
     energy bias fails deterministically);
  2. variance/efficiency: relMSE vs golden must stay within 1.3x of the
     recorded value (renders are seed-deterministic, so a regression in the
     estimator or sampler moves this immediately).

Recorded values (2026-08-16, CPU, seeds as below):
  pt   relMSE 0.0863
  bdpt relMSE 0.0240  (uniform-connection SPCBPT pool = classic BDPT)

Golden provenance (ADVICE r3): cornell_pt_32.npz was regenerated at commit
b3700f1 under the two-sided transport convention (config.CULL_BACKFACE =
False — every transport ray treats backfaces as consistent absorbers; the
pre-b3700f1 golden used the reference's one-sided radiance-ray culling).
Any future regeneration must note the convention commit here, or a silent
convention flip becomes unauditable.

Reference semantics: the Space-toggle A/B convergence check of the
reference (optixPathTracer.cpp:198-208), made quantitative per SURVEY.md §4.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spcbpt_tpu.render import light_trace, lvc, pt_pool, spcbpt_pool
from spcbpt_tpu.scene.cornell import default_scene_path
from spcbpt_tpu.scene.scene import load_trace_scene
from spcbpt_tpu.train import classify
from spcbpt_tpu.utils.image import rel_mse

W_ = H_ = 32
SPP = 64

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "cornell_pt_32.npz")


@pytest.fixture(scope="module")
def setup():
    ts, desc, cam = load_trace_scene(default_scene_path())
    cam.aspect = 1.0
    golden = np.load(GOLDEN)["img"]
    return ts, cam.uvw(), golden


def _relmse(img, ref):
    return rel_mse(img, ref, eps=1e-4)


def test_pt_convergence(setup):
    ts, (eye, U, V, W), golden = setup
    fsum, cnt = pt_pool.render_pool_jit(ts, eye, U, V, W, W_, H_, SPP, 1,
                                        n_pool=1 << 14, max_depth=8)
    img = np.asarray(fsum) / np.asarray(cnt)[:, None]
    assert np.isfinite(img).all()
    bias = img.mean() / golden.mean() - 1.0
    assert abs(bias) < 0.02, f"PT energy bias {bias:+.3%}"
    r = _relmse(img, golden)
    assert r < 0.0863 * 1.3, f"PT relMSE regressed: {r:.4f} (recorded 0.0863)"


def test_bdpt_convergence(setup):
    ts, (eye, U, V, W), golden = setup
    ss = classify.untrained_state()
    lt = jax.jit(lambda f: light_trace.trace_light_paths(ts, ss, 2048, f,
                                                         max_depth=8))
    build = jax.jit(lvc.build_sampler)
    acc = jnp.zeros((W_ * H_, 3))
    cnts = np.zeros((W_ * H_,))
    for s in range(SPP // 8):
        sampler = build(lt(s))
        fs, c = spcbpt_pool.render_pool_jit(
            ts, ss, sampler, eye, U, V, W, W_, H_, 8, s * 8,
            n_pool=1 << 14, max_depth=8, uniform=True)
        acc = acc + fs
        cnts += np.asarray(c)
    img = np.asarray(acc) / cnts[:, None]
    assert np.isfinite(img).all()
    bias = img.mean() / golden.mean() - 1.0
    assert abs(bias) < 0.02, f"BDPT energy bias {bias:+.3%}"
    r = _relmse(img, golden)
    assert r < 0.0240 * 1.3, \
        f"BDPT relMSE regressed: {r:.4f} (recorded 0.0240)"
    # BDPT at equal spp must stay decisively better than PT on Cornell
    # (the reference's implicit claim; round-1 measured ~2.7x)
    assert r < 0.0863 * 0.6
