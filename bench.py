"""Benchmark entry: prints the driver's JSON metric line.

Primary metric (BASELINE.md): software traversal throughput in
Mrays/sec/chip, target >= 50 on a v5e chip, measured on a >=10k-triangle
scene. Workload: closest-hit traversal of a full 1024x1024 camera
wavefront (32x32-pixel ray tiles) over the bundled ~33k-triangle interior
scene through the tiled two-level cluster traversal (ops/tile_trace.py),
steady-state over several iterations.

Robustness contract (VERDICT round 2: rc=124 lost the whole round's
number): the primary JSON line is printed IMMEDIATELY after the primary
measurement, flushed; secondary metrics each run only if enough of the
wall-clock budget remains, and a merged line (same metric/value) is
printed at the end — whether the driver parses the first or the last JSON
line it sees a valid result. A SIGALRM watchdog force-exits 0 if anything
hangs after the primary line is out.
"""
from __future__ import annotations

import json
import os
import signal
import sys
import time

T0 = time.time()
# Total wall-clock budget. The driver timeout observed is ~600 s; leave
# healthy margin for interpreter startup + teardown.
BUDGET = float(os.environ.get("SPCBPT_BENCH_BUDGET", "420"))
_primary_line = None


def _remaining():
    return BUDGET - (time.time() - T0)


def _emit(obj):
    print(json.dumps(obj), flush=True)


def _watchdog(signum, frame):  # pragma: no cover - only fires on overrun
    if _primary_line is not None:
        sys.stdout.flush()
        os._exit(0)
    os._exit(3)


def _geom_cache_path(n_tris: int) -> str:
    d = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, f"bench_geom_{n_tris}.npz")


def _build_or_load_clusters(ts):
    """Bench-specific (max_tris=16) cluster build is ~38 s of host numpy on
    the 33k-tri interior; cache it on disk keyed by triangle count."""
    import numpy as np
    import jax.numpy as jnp
    from spcbpt_tpu.ops import bvh as bvh_mod
    from spcbpt_tpu.ops import clusters as cl_mod

    n_tris = int(ts.tri_p0.shape[0])
    path = _geom_cache_path(n_tris)
    if os.path.exists(path):
        try:
            z = np.load(path)
            return cl_mod.ClusterSet(
                cmin=jnp.asarray(z["cmin"]), cmax=jnp.asarray(z["cmax"]),
                coeff=jnp.asarray(z["coeff"]),
                tri_block=jnp.asarray(z["tri_block"]),
                tri_begin=jnp.asarray(z["tri_begin"]),
                tri_p0=jnp.asarray(z["tri_p0"]),
                tri_e1=jnp.asarray(z["tri_e1"]),
                tri_e2=jnp.asarray(z["tri_e2"]),
                tri_k=int(z["tri_k"]))
        except Exception:
            pass
    flat = bvh_mod.build_bvh(np.asarray(ts.tri_p0), np.asarray(ts.tri_e1),
                             np.asarray(ts.tri_e2))
    order = flat.order
    cs = cl_mod.build_clusters(flat, np.asarray(ts.tri_p0)[order],
                               np.asarray(ts.tri_e1)[order],
                               np.asarray(ts.tri_e2)[order], max_tris=16)
    try:
        np.savez(path, cmin=np.asarray(cs.cmin), cmax=np.asarray(cs.cmax),
                 coeff=np.asarray(cs.coeff),
                 tri_block=np.asarray(cs.tri_block),
                 tri_begin=np.asarray(cs.tri_begin),
                 tri_p0=np.asarray(cs.tri_p0), tri_e1=np.asarray(cs.tri_e1),
                 tri_e2=np.asarray(cs.tri_e2), tri_k=cs.tri_k)
    except Exception:
        pass
    return cs


def main():
    global _primary_line
    signal.signal(signal.SIGALRM, _watchdog)
    signal.alarm(int(BUDGET) + 90)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from spcbpt_tpu.runtime import setup as _setup
    _setup()

    from spcbpt_tpu.scene.interior import default_scene_path
    from spcbpt_tpu.scene.scene import load_trace_scene
    from spcbpt_tpu.ops import tile_trace
    from spcbpt_tpu.render.common import camera_rays

    ts, desc, cam = load_trace_scene(default_scene_path())
    width = height = 1024
    cam.aspect = 1.0
    eye, U, V, W = cam.uvw()
    n = width * height

    cs = _build_or_load_clusters(ts)
    tmn = jnp.full((n,), 1e-3)
    tmx = jnp.full((n,), 1e16)

    @jax.jit
    def trace(frame):
        o, d, _ = camera_rays(eye, U, V, W, width, height, frame, block=32)
        hit = tile_trace.tile_closest(cs, o, d, tmn, tmx, True, tile=1024)
        return hit.t.sum(), (hit.tri >= 0).sum()

    out = trace(0)
    jax.block_until_ready(out)
    n_hits = int(out[1])
    assert n_hits > 0.9 * n, f"camera rays must hit the interior ({n_hits})"

    iters = 10
    t0 = time.time()
    for i in range(iters):
        out = trace(i + 1)
    jax.block_until_ready(out)
    dt = time.time() - t0
    mrays = n * iters / dt / 1e6

    primary = {
        "metric": "traversal_throughput_33k_tris",
        "value": round(mrays, 2),
        "unit": "Mrays/s/chip",
        "vs_baseline": round(mrays / 50.0, 3),
    }
    _primary_line = primary
    _emit(primary)

    # ---- secondary metrics, each under the remaining wall-clock budget ----
    extras = {}
    try:
        if _remaining() > 150:
            from spcbpt_tpu.ops import bsdf as bsdf_mod
            from spcbpt_tpu.ops import ray_walk
            from spcbpt_tpu.scene.scene import local_geometry, trace_closest
            from spcbpt_tpu.utils import rng as rng_mod

            nb = 1 << 17
            o1, d1, _ = camera_rays(eye, U, V, W, 512, 512, 0, block=16)
            hit = trace_closest(ts, o1[:nb], d1[:nb], 1e-3, 1e16, True)
            geom = local_geometry(ts, hit, o1[:nb], d1[:nb])
            st = rng_mod.seed(jnp.arange(nb, dtype=jnp.uint32), jnp.uint32(7))
            mat = bsdf_mod.gather_mat(ts.mats, geom["mat_id"],
                                      geom["base_color"])
            nd, _ = bsdf_mod.sample_bsdf(mat, geom["Ns"], -d1[:nb], st)
            perm = np.random.RandomState(0).permutation(nb)
            o2 = jnp.asarray(np.asarray(geom["P"])[perm])
            d2 = jnp.asarray(np.asarray(nd)[perm])
            tb = jnp.full((nb,), 1e-3)
            te = jnp.full((nb,), 1e16)
            cw = ts.clusters_walk
            if cw is not None and _remaining() > 120:
                f2 = jax.jit(lambda: ray_walk.walk_closest(
                    cw, o2, d2, tb, te, True, sort_rays=True).t.sum())
                jax.block_until_ready(f2())
                t0 = time.time()
                for _ in range(5):
                    out2 = f2()
                jax.block_until_ready(out2)
                extras["secondary_mrays_walk"] = round(
                    nb * 5 / (time.time() - t0) / 1e6, 2)

        if _remaining() > 150:
            # Large-scene traversal (VERDICT r2 item 5): midpoint-subdivide
            # the interior 1:4 per level so the triangle count passes
            # WALK_MAX_TRIS and the PARTITIONED cluster-set path is what is
            # measured. Geometry is identical, only tessellation changes, so
            # rates are comparable with the 33k headline.
            from spcbpt_tpu.ops import bvh as bvh_mod2
            from spcbpt_tpu.ops import clusters as cl_mod2
            from spcbpt_tpu.ops import ray_walk as rw2

            def _subdiv(p0, e1, e2):
                A, B, C = p0, p0 + e1, p0 + e2
                mab, mac, mbc = (A + B) / 2, (A + C) / 2, (B + C) / 2
                sp0 = np.concatenate([A, mab, mac, mbc])
                sp1 = np.concatenate([mab, B, mbc, mac])
                sp2 = np.concatenate([mac, mbc, C, mab])
                return sp0, sp1 - sp0, sp2 - sp0

            sp0 = np.asarray(ts.tri_p0)
            se1 = np.asarray(ts.tri_e1)
            se2 = np.asarray(ts.tri_e2)
            oL, dL, _ = camera_rays(eye, U, V, W, 512, 512, 0, block=32)
            nL = 512 * 512
            tbL = jnp.full((nL,), 1e-3)
            teL = jnp.full((nL,), 1e16)
            for level in (1, 2):     # 130k (2 parts), 521k (5 parts)
                if _remaining() < 150:
                    break
                sp0, se1, se2 = _subdiv(sp0, se1, se2)
                flatL = bvh_mod2.build_bvh(sp0, se1, se2)
                oLrd = flatL.order
                partsL = cl_mod2.build_cluster_parts(
                    flatL, sp0[oLrd], se1[oLrd], se2[oLrd], max_tris=128,
                    part_max_tris=120_000, with_coeff=False)
                fL = jax.jit(lambda partsL=partsL: rw2.walk_closest_parts(
                    partsL, oL, dL, tbL, teL, True, sort_rays=True).t.sum())
                jax.block_until_ready(fL())
                t0 = time.time()
                for _ in range(5):
                    outL = fL()
                jax.block_until_ready(outL)
                key = f"mrays_parts_{len(sp0)//1000}k_p{len(partsL)}"
                extras[key] = round(nL * 5 / (time.time() - t0) / 1e6, 2)

        if _remaining() > 90:
            from spcbpt_tpu.render import pt_pool
            fr = lambda s: pt_pool.render_pool_jit(
                ts, eye, U, V, W, 512, 512, 1, s, max_depth=12)
            jax.block_until_ready(fr(0))
            t0 = time.time()
            for s in range(2):
                out3 = fr(s + 1)
            jax.block_until_ready(out3)
            extras["pt_ms_per_spp_512"] = round((time.time() - t0) / 2 * 1e3, 1)
    except Exception as e:  # secondary metrics must never sink the bench
        extras["extras_error"] = str(e)[:200]

    extras["bench_seconds"] = round(time.time() - T0, 1)
    # Final merged line: identical primary metric/value + extras, so a
    # last-line parse also sees the headline number.
    _emit({**primary, **extras})
    return 0


if __name__ == "__main__":
    sys.exit(main())
