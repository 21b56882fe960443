"""Benchmark entry: prints the driver's JSON metric line.

Primary metric (BASELINE.md): software traversal throughput in
Mrays/sec/chip, target >= 50 on a v5e chip, measured on a >=10k-triangle
scene. Workload: closest-hit traversal of full camera wavefronts over the
bundled ~33k-triangle interior scene through the tiled two-level cluster
traversal (ops/tile_trace.py), steady-state over several iterations.
Metric name is FROZEN: ``traversal_throughput_33k_tris`` (same as round 3).

Robustness contract (VERDICT r2: rc=124; r3: rc=3 — both lost the round's
number to TPU-tunnel stalls). This file is now a two-process harness:

- The PARENT (this process) imports no JAX. It spawns a measurement CHILD
  on the TPU and relays every JSON line the child prints as soon as it
  appears. If the child produces no primary line within PRIMARY_DEADLINE
  (tunnel stalled / compile wedged), the parent kills it and spawns a
  forced-CPU child (jax.config platform forcing — env vars do NOT stop the
  axon client from initializing, see tests/conftest.py) whose small
  wavefront always completes. A primary JSON line is therefore emitted in
  every scenario short of the interpreter itself being broken.
- The CHILD stages its measurements: (1) bounded device probe (tiny
  matmul); (2) a small 512x512 wavefront -> the primary line, printed and
  flushed immediately; (3) the 1024x1024 headline re-emitted as a merged
  line with the same metric name; (4) optional extras, each gated on the
  remaining wall-clock budget.
"""
from __future__ import annotations

import hashlib
import json
import os
import signal
import subprocess
import sys
import time

T0 = time.time()
# Total wall-clock budget. The driver timeout observed is ~600 s; leave
# healthy margin for interpreter startup + teardown.
BUDGET = float(os.environ.get("SPCBPT_BENCH_BUDGET", "420"))
# If the TPU child has not produced a primary line by then, fall back to CPU.
PRIMARY_DEADLINE = float(os.environ.get("SPCBPT_BENCH_PRIMARY_DEADLINE", "210"))
METRIC = "traversal_throughput_33k_tris"


def _remaining():
    return BUDGET - (time.time() - T0)


def _emit(obj):
    print(json.dumps(obj), flush=True)


# --------------------------------------------------------------------------
# Parent: stdlib-only process supervisor.
# --------------------------------------------------------------------------

def _run_child(platform: str, deadline: float, primary_seen: list,
               primary_deadline: float | None = None) -> bool:
    """Spawn a measurement child; relay its stdout lines until `deadline`
    (absolute time.time()). If `primary_deadline` is given and no primary
    metric line has appeared by then, give up early (the caller falls back).
    Returns True if a primary metric line was relayed. Kills the child group
    on exit."""
    env = dict(os.environ)
    env["SPCBPT_BENCH_CHILD"] = platform
    p = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__)],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        env=env, start_new_session=True, text=True, bufsize=1)
    got_primary = False
    try:
        while True:
            limit = deadline
            if not got_primary and primary_deadline is not None:
                limit = min(limit, primary_deadline)
            budget = limit - time.time()
            if budget <= 0:
                break
            # line-granular timeout via SIGALRM-free poll: readline blocks,
            # so bound it with a watchdog alarm in the parent
            signal.alarm(max(int(budget) + 1, 1))
            try:
                line = p.stdout.readline()
            except _Timeout:
                break
            finally:
                signal.alarm(0)
            if not line:
                break
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                obj = json.loads(line)
            except ValueError:
                continue
            if obj.get("metric") == METRIC and "value" in obj:
                _emit(obj)
                got_primary = True
                primary_seen.append(obj)
            elif got_primary:
                _emit(obj)
    finally:
        try:
            os.killpg(p.pid, signal.SIGKILL)
        except (ProcessLookupError, PermissionError, OSError):
            pass
        try:
            p.wait(timeout=10)
        except Exception:
            pass
    return got_primary


class _Timeout(Exception):
    pass


def _alarm(signum, frame):
    raise _Timeout()


def parent_main() -> int:
    signal.signal(signal.SIGALRM, _alarm)
    primary = []
    # Stage 1: the real TPU measurement, bounded by the primary deadline;
    # once the primary line is out, let it keep refining until near budget.
    tpu_ok = _run_child("device", T0 + (BUDGET - 20), primary,
                        primary_deadline=T0 + PRIMARY_DEADLINE)
    if tpu_ok:
        return 0
    # Stage 2: tunnel stalled or TPU broken — forced-CPU small wavefront so
    # the driver still parses a valid primary line (marked as a fallback).
    if _remaining() > 45:
        cpu_ok = _run_child("cpu", T0 + (BUDGET - 10), primary)
        if cpu_ok:
            return 0
    # Stage 3: nothing measurable at all.
    return 3


# --------------------------------------------------------------------------
# Child: the actual measurement (runs on `device` = whatever jax picks,
# normally the axon TPU; or forced CPU for the fallback).
# --------------------------------------------------------------------------

def _geom_cache_path(tag: str) -> str:
    d = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, f"bench_geom_{tag}.npz")


# Bump when the ClusterSet packing format changes (ADVICE r3: cache keyed
# only by triangle count measured stale geometry silently).
_GEOM_FORMAT_VERSION = 2


def _geom_tag(ts) -> str:
    import numpy as np
    h = hashlib.sha256()
    for a in (ts.tri_p0, ts.tri_e1, ts.tri_e2):
        h.update(np.ascontiguousarray(np.asarray(a, np.float32)).tobytes())
    return f"v{_GEOM_FORMAT_VERSION}_{h.hexdigest()[:16]}"


def _build_or_load_clusters(ts):
    """Bench-specific (max_tris=16) cluster build is ~38 s of host numpy on
    the 33k-tri interior; cache it on disk keyed by geometry content hash +
    format version."""
    import numpy as np
    import jax.numpy as jnp
    from spcbpt_tpu.ops import bvh as bvh_mod
    from spcbpt_tpu.ops import clusters as cl_mod

    path = _geom_cache_path(_geom_tag(ts))
    if os.path.exists(path):
        try:
            z = np.load(path)
            return cl_mod.ClusterSet(
                cmin=jnp.asarray(z["cmin"]), cmax=jnp.asarray(z["cmax"]),
                coeff=jnp.asarray(z["coeff"]),
                tri_block=jnp.asarray(z["tri_block"]),
                tri_begin=jnp.asarray(z["tri_begin"]),
                tri_p0=jnp.asarray(z["tri_p0"]), tri_e1=jnp.asarray(z["tri_e1"]),
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


def _measure_trace(cs, eye, U, V, W, width, height, iters, tile):
    import jax
    import jax.numpy as jnp
    from spcbpt_tpu.ops import tile_trace
    from spcbpt_tpu.render.common import camera_rays

    n = width * height
    tmn = jnp.full((n,), 1e-3)
    tmx = jnp.full((n,), 1e16)

    @jax.jit
    def trace(frame):
        o, d, _ = camera_rays(eye, U, V, W, width, height, frame, block=32)
        hit = tile_trace.tile_closest(cs, o, d, tmn, tmx, True, tile=tile)
        return hit.t.sum(), (hit.tri >= 0).sum()

    out = trace(0)
    jax.block_until_ready(out)
    n_hits = int(out[1])
    assert n_hits > 0.9 * n, f"camera rays must hit the interior ({n_hits})"
    t0 = time.time()
    for i in range(iters):
        out = trace(i + 1)
    jax.block_until_ready(out)
    return n * iters / (time.time() - t0) / 1e6


def child_main(platform: str) -> int:
    import jax
    if platform == "cpu":
        # env-var platform forcing does not stop the axon client from
        # initializing when the tunnel is wedged; config update pre-init does
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from spcbpt_tpu.runtime import setup as _setup
    _setup()

    # Stage 0: bounded device probe — fail fast (parent falls back) instead
    # of wedging inside a big compile.
    x = jnp.ones((256, 256))
    jax.block_until_ready((x @ x).sum())
    backend = jax.default_backend()

    from spcbpt_tpu.scene.interior import default_scene_path
    from spcbpt_tpu.scene.scene import load_trace_scene
    from spcbpt_tpu.render.common import camera_rays

    ts, desc, cam = load_trace_scene(default_scene_path())
    cam.aspect = 1.0
    eye, U, V, W = cam.uvw()
    cs = _build_or_load_clusters(ts)

    # Stage 1: small wavefront -> the PRIMARY line, out as early as possible.
    small_iters = 6 if platform != "cpu" else 2
    mrays = _measure_trace(cs, eye, U, V, W, 512, 512, small_iters, tile=1024)
    primary = {
        "metric": METRIC,
        "value": round(mrays, 2),
        "unit": "Mrays/s/chip",
        "vs_baseline": round(mrays / 50.0, 3),
    }
    extras = {"backend": backend, "wavefront": "512x512"}
    if platform == "cpu":
        extras["platform_fallback"] = "cpu (TPU tunnel unavailable)"
    _emit({**primary, **extras})

    if platform == "cpu":
        # CPU fallback exists only to guarantee a parsed line; skip the rest.
        _emit({**primary, **extras, "bench_seconds": round(time.time() - T0, 1)})
        return 0

    # Stage 2: the 1024x1024 headline (round-1/3 workload), merged line with
    # the same metric name so a last-line parse sees the headline number.
    try:
        if _remaining() > 120:
            mrays_big = _measure_trace(cs, eye, U, V, W, 1024, 1024, 10,
                                       tile=1024)
            primary = {
                "metric": METRIC,
                "value": round(mrays_big, 2),
                "unit": "Mrays/s/chip",
                "vs_baseline": round(mrays_big / 50.0, 3),
            }
            extras["wavefront"] = "1024x1024"
            extras["mrays_512"] = round(mrays, 2)
            _emit({**primary, **extras})
    except Exception as e:
        extras["headline_error"] = str(e)[:200]

    # Stage 3: secondary metrics, each under the remaining wall-clock budget.
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
            # Large-scene traversal: midpoint-subdivide the interior 1:4 per
            # level so the triangle count passes WALK_MAX_TRIS and the
            # PARTITIONED cluster-set path is what is measured.
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
    # Final merged line: identical primary metric/value + extras.
    _emit({**primary, **extras})
    return 0


if __name__ == "__main__":
    child = os.environ.get("SPCBPT_BENCH_CHILD")
    if child:
        sys.exit(child_main(child))
    sys.exit(parent_main())
