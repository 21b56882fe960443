"""Train-time second-stage selection (render/autotune.py)."""
import numpy as np

from spcbpt_tpu.render.autotune import select_second_stage


def test_low_dynamic_range_picks_weighted():
    q = np.full(1000, 5.0)
    q[::7] *= 1.2
    inv_occ = np.full(1000, 2.0)
    mode, st = select_second_stage(q, inv_occ)
    assert mode == "weighted" and st["flux_dr"] < 2.5


def test_high_dynamic_range_picks_uniform():
    rng = np.random.default_rng(0)
    q = 10.0 ** rng.uniform(-3, 2, 1000)
    inv_occ = np.full(1000, 2.0)
    mode, st = select_second_stage(q, inv_occ)
    assert mode == "uniform" and st["flux_dr"] > 2.5


def test_empty_subspaces_handled():
    q = np.full(1000, 3.4e38)
    q[:4] = 1.0
    inv_occ = np.zeros(1000)
    inv_occ[:4] = 1.0
    mode, st = select_second_stage(q, inv_occ)
    assert mode == "uniform"  # too few samples -> robust default
