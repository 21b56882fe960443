"""Interior-scene convergence gates (VERDICT r2 weak #7 / next #8).

The Cornell gates (test_convergence.py) exercise a 32-triangle closed box;
every round-2/3 estimator change (dual-chain RMIS, rate calibration, env MIS,
the two-sided transport convention) binds on the 33k-triangle interior
scenes. This file anchors the directly-lit variant (`interior_lit`, big
visible ceiling panel — PT is trivially correct there) with a committed
4096-spp PT golden at 32x32 (tests/golden/interior_lit_pt_32.npz, CPU bvh
mode, seeds 50_000+) and cross-convergence asserts:

  PT     64 spp: recorded bias +0.07%, relMSE 0.0478
  BDPT  128 spp: recorded bias +0.89%, relMSE 0.0336
  SPCBPT (random-Gamma trained state, mixture second stage) 128 spp:
         recorded bias +1.6%, relMSE 0.1517

The SPCBPT gate uses a synthetic trained state: unbiasedness depends only on
sampler/weight pmf consistency, never on Gamma quality, so a random Gamma
gates the trained code path (alias first stage, in-subspace second stage,
inv_occ rates) without a training run. Renders are seed-deterministic; a
rate-calibration or MIS regression moves these immediately.

Reference semantics: quantitative version of the reference's Space-toggle
A/B convergence check (optixPathTracer.cpp:198-208), per SURVEY.md §4.
"""
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from spcbpt_tpu.render import light_trace, lvc, pt_pool, spcbpt_pool
from spcbpt_tpu.scene.scene import load_trace_scene
from spcbpt_tpu.apps.render_cli import resolve_scene
from spcbpt_tpu.train import classify
from spcbpt_tpu.utils.image import rel_mse

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from test_rmis_oracle import _random_trained_state  # noqa: E402

W_ = H_ = 32

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "interior_lit_pt_32.npz")


@pytest.fixture(scope="module")
def setup():
    ts, desc, cam = load_trace_scene(resolve_scene("interior_lit"))
    cam.aspect = 1.0
    golden = np.load(GOLDEN)["img"]
    return ts, cam.uvw(), golden


def _relmse(img, ref):
    return rel_mse(img, ref, eps=1e-4)


def test_pt_interior_convergence(setup):
    ts, (eye, U, V, W), golden = setup
    fsum, cnt = pt_pool.render_pool_jit(ts, eye, U, V, W, W_, H_, 64, 1,
                                        n_pool=1 << 13, max_depth=8)
    img = np.asarray(fsum) / np.maximum(np.asarray(cnt)[:, None], 1)
    assert np.isfinite(img).all()
    bias = img.mean() / golden.mean() - 1.0
    assert abs(bias) < 0.02, f"PT energy bias {bias:+.3%}"
    r = _relmse(img, golden)
    assert r < 0.0478 * 1.3, f"PT relMSE regressed: {r:.4f} (recorded 0.0478)"


def test_bdpt_interior_convergence(setup):
    ts, (eye, U, V, W), golden = setup
    ss = classify.untrained_state()
    lt = jax.jit(lambda f: light_trace.trace_light_paths(ts, ss, 2048, f,
                                                         max_depth=8))
    build = jax.jit(lvc.build_sampler)
    acc = jnp.zeros((W_ * H_, 3))
    cnts = np.zeros((W_ * H_,))
    for s in range(16):
        sampler = build(lt(1000 + s))
        fs, c = spcbpt_pool.render_pool_jit(
            ts, ss, sampler, eye, U, V, W, W_, H_, 8, 90_000 + s * 8,
            n_pool=1 << 13, max_depth=8, uniform=True)
        acc = acc + fs
        cnts += np.asarray(c)
    img = np.asarray(acc) / cnts[:, None]
    assert np.isfinite(img).all()
    bias = img.mean() / golden.mean() - 1.0
    assert abs(bias) < 0.025, f"BDPT energy bias {bias:+.3%}"
    r = _relmse(img, golden)
    assert r < 0.0336 * 1.3, \
        f"BDPT relMSE regressed: {r:.4f} (recorded 0.0336)"


def test_spcbpt_trained_path_interior_convergence(setup):
    """Trained-state code path (alias first stage, mixture second stage,
    inv_occ-aware RMIS rates) must stay unbiased on the interior."""
    ts, (eye, U, V, W), golden = setup
    ss = _random_trained_state(ts, second_stage="mixture")
    lt = jax.jit(lambda f: light_trace.trace_light_paths(ts, ss, 2048, f,
                                                         max_depth=8))
    build = lvc.make_builder(ss)
    acc = jnp.zeros((W_ * H_, 3))
    cnts = np.zeros((W_ * H_,))
    for s in range(16):
        sampler = build(lt(500 + s), s)
        fs, c = spcbpt_pool.render_pool_jit(
            ts, ss, sampler, eye, U, V, W, W_, H_, 8, 40_000 + s * 8,
            n_pool=1 << 13, max_depth=8, uniform=False)
        acc = acc + fs
        cnts += np.asarray(c)
    img = np.asarray(acc) / cnts[:, None]
    assert np.isfinite(img).all()
    bias = img.mean() / golden.mean() - 1.0
    assert abs(bias) < 0.03, f"SPCBPT energy bias {bias:+.3%}"
    r = _relmse(img, golden)
    assert r < 0.1517 * 1.3, \
        f"SPCBPT relMSE regressed: {r:.4f} (recorded 0.1517)"
