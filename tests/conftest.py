"""Test harness: force CPU with 8 virtual devices so sharding tests work
without TPU hardware (SURVEY.md §4).

NOTE: this environment's sitecustomize imports jax at interpreter startup
(axon TPU plugin), so setting os.environ["JAX_PLATFORMS"] here is too late —
use jax.config.update instead, before any backend is initialized.
"""
import os
import sys

import jax
jax.config.update("jax_platforms", "cpu")
# jax 0.9 ignores XLA_FLAGS=--xla_force_host_platform_device_count; the
# supported mechanism is the jax_num_cpu_devices config (before backend init).
jax.config.update("jax_num_cpu_devices", 8)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest

# ---------------------------------------------------------------------------
# quick/slow tiers: `pytest -m quick` is the <~2 min CI-style gate covering
# units, one PT convergence gate, RMIS-oracle on one calibration, LVC
# equivalence, traversal-vs-brute, and one sharding test. The full suite
# (default, ~11 min CPU) adds the heavy convergence/equivalence renders.
# Anything listed here (exact nodeid or prefix) is marked slow; everything
# else is quick. New tests default to quick — add them here if they render.
# ---------------------------------------------------------------------------
_SLOW = [
    "tests/test_benchmark_app.py",  # 3 subprocess jax startups
    "tests/test_env_scene.py::test_env_spcbpt_matches_pt",
    "tests/test_env_scene.py::test_env_lit_floor",
    "tests/test_convergence.py::test_bdpt_convergence",
    "tests/test_convergence_interior.py::test_bdpt_interior_convergence",
    "tests/test_convergence_interior.py::test_spcbpt_trained_path_interior_convergence",
    "tests/test_units.py::test_bdpt_unit_invariant",
    "tests/test_units.py::test_lvc_weights_finite_in_raw_units",
    "tests/test_render.py::test_spcbpt_pool_matches_naive",
    "tests/test_render.py::test_bdpt_matches_pt_mean",
    "tests/test_render.py::test_spcbpt_trained_state_runs",
    "tests/test_render.py::test_light_trace_physicality",
    "tests/test_render.py::test_pt_frame_finite_and_lit",
    "tests/test_render.py::test_pt_pool_presort_matches_brute",
    "tests/test_render.py::test_pt_pool_matches_naive",
    "tests/test_ray_walk.py::test_walk_empty_rows",
    "tests/test_ray_walk.py::test_walk_closest_matches_brute[True-False]",
    "tests/test_ray_walk.py::test_walk_closest_matches_brute[False-True]",
    "tests/test_ray_walk.py::test_walk_closest_matches_brute[False-False]",
    "tests/test_ray_walk.py::test_walk_any_matches_brute[False]",
    "tests/test_house_scene.py",
    "tests/test_viewer.py::test_scripted_session_renders_and_saves",
    # keep only the 'weighted' calibration quick: each calibration pays its
    # own ~12 s trained-state module fixture
    "tests/test_rmis_oracle.py::test_general_connection_matches_oracle[mixture",
    "tests/test_rmis_oracle.py::test_general_connection_matches_oracle[uniform",
    "tests/test_rmis_oracle.py::test_light_source_connection_matches_oracle[mixture",
    "tests/test_rmis_oracle.py::test_light_source_connection_matches_oracle[uniform",
    "tests/test_rmis_oracle.py::test_perturbed_rmis_cache_is_detected[mixture]",
    "tests/test_rmis_oracle.py::test_perturbed_rmis_cache_is_detected[uniform]",
    "tests/test_rmis_oracle.py::test_is_brdf_zeroes_weight[mixture]",
    "tests/test_rmis_oracle.py::test_is_brdf_zeroes_weight[uniform]",
    "tests/test_tile_trace.py::test_coherent_camera_rays_cornell",
    "tests/test_pallas.py::test_pallas_matches_bruteforce",
    "tests/test_parallel.py::test_sharded_spcbpt_render_runs",
    "tests/test_parallel.py::test_sharded_pt_spp_axis_is_mean_of_streams",
    "tests/test_parallel.py::test_sharded_pt_equals_sequential_tiles",
    "tests/test_parallel.py::test_sharded_spcbpt_trained_equals_sequential_tiles",
    "tests/test_walk_parts.py",
    "tests/test_rmis_oracle.py::test_emitter_hit_matches_oracle[mixture",
    "tests/test_rmis_oracle.py::test_emitter_hit_matches_oracle[uniform",
    "tests/test_convergence_interior.py::test_pt_interior_convergence",
    "tests/test_nn_classifier.py::test_blended_first_stage_pmf_matches_histogram",
    "tests/test_tile_trace.py::test_closest_matches_brute[300",
    "tests/test_tile_trace.py::test_closest_matches_brute[1200",
    # round 5: the quick tier measured 264 s on this box; these three are
    # 148 s of it (the sub_blocks equivalence alone is 136 s). The full
    # suite still runs them.
    "tests/test_parallel.py::test_sharded_spcbpt_sub_blocks_exact",
    "tests/test_parallel.py::test_dp_gamma_step_matches_single_device",
    "tests/test_nn_classifier.py::test_nn_state_checkpoint_roundtrip",
]


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: heavy render/equivalence test (excluded by -m quick)")
    config.addinivalue_line(
        "markers", "quick: fast tier, `pytest -m quick` (<~2 min on CPU)")


def pytest_collection_modifyitems(config, items):
    for item in items:
        nid = item.nodeid
        if any(nid == s or nid.startswith(s) for s in _SLOW):
            item.add_marker(pytest.mark.slow)
        else:
            item.add_marker(pytest.mark.quick)
