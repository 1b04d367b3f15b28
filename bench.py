"""Benchmark: scan pairs registered per second, end-to-end on one chip.

Runs the flagship fully-jittable registration step (normals -> ISS -> FPFH
-> mutual matching -> batched RANSAC -> refit) on a synthetic bump-terrain
pair of N points per side, on whatever platform JAX selects (the real TPU
under the driver).  vs_baseline compares against a self-measured CPU run of
the same step at the same size (the reference publishes no numbers,
BASELINE.md; its own C++/PCL stack is not buildable in this image, so the
CPU XLA path is the stand-in host baseline).

Prints ONE json line:
  {"metric": ..., "value": N, "unit": "pairs/s", "vs_baseline": N}
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

N = int(os.environ.get("LGR_BENCH_N", 65536))
REPEATS = int(os.environ.get("LGR_BENCH_REPEATS", 5))
CPU_N = int(os.environ.get("LGR_BENCH_CPU_N", N))
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cpu_cache.json")
CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")


def _pair(n):
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from __graft_entry__ import _synthetic_pair

    return _synthetic_pair(n)


def _enable_compile_cache():
    import jax

    try:
        if jax.default_backend() not in ("tpu", "axon"):
            return  # CPU AOT cache entries are machine-feature specific
        jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass


def run_step(n: int, repeats: int) -> float:
    """Returns seconds per pair (min over repeats)."""
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    from lidar_global_registration_tpu.models.flagship import (
        FlagshipConfig,
        register_pair_staged,
    )

    use_iss = os.environ.get("LGR_BENCH_ISS", "0") == "1"
    if use_iss:
        # feature-rich scene (ground + boxes + mounds): ISS keypoints
        # co-locate, the matcher runs on compacted keypoint rows -- the
        # scaling regime of the reference's shipped ISS+cluster sweep.
        # Generated ON DEVICE: the tunnel moves host arrays at ~0.2 MB/s,
        # which would add minutes of untimed setup per million points.
        from __graft_entry__ import _synthetic_scene_pair_device

        a, b, vp_a, vp_b = _synthetic_scene_pair_device(n)
        area = 30.0 * 30.0 + 250.0  # ground + box faces (approx)
        spacing = float(np.sqrt(area / n))
        radii = dict(
            normal_cell=4.0 * spacing,
            iss=3.0 * spacing,
            feature=8.0 * spacing,
            thr=4.0 * spacing,
        )
    else:
        # keypoint=any (reference `keypoint: any` mode, like its corner e2e
        # fixture): dense descriptor matching dominates, and the synthetic
        # pair registers successfully (ISS keypoints of two independent
        # samplings of a smooth surface rarely co-locate).
        a, b = _pair(n)
        spacing = 30.0 / np.sqrt(n)
        ang = 0.4
        Rb = np.array(
            [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]],
            np.float32,
        )
        tb = np.array([2.0, -1.0, 0.5], np.float32)
        vp_a = np.array([15.0, 15.0, 120.0], np.float32)
        vp_b = Rb.T @ (vp_a - tb)
    cfg = FlagshipConfig(
        # ISS mode keeps the reference's 1e6-ish sampling headroom (the
        # on-device adaptive loop exits early once a pose is found)
        rounds=64 if use_iss else 8,
        hypothesis_batch=1024,
        use_iss=use_iss,
        match_tile=4096,
    )
    if not use_iss:
        radii = dict(
            normal_cell=spacing * 4.0, iss=spacing * 3.0,
            feature=spacing * 8.0, thr=spacing * 4.0,
        )
    args = (
        jnp.asarray(a),
        jnp.ones((n,), bool),
        jnp.asarray(b),
        jnp.ones((n,), bool),
        jax.random.PRNGKey(566),
        jnp.float32(radii["normal_cell"]),
        jnp.float32(spacing * 2.0),
        jnp.float32(spacing * 2.0),
        jnp.float32(radii["iss"]),
        jnp.float32(radii["iss"]),
        jnp.float32(radii["feature"]),
        jnp.float32(radii["thr"]),
    )
    kwargs = dict(vp_src=jnp.asarray(vp_a), vp_tgt=jnp.asarray(vp_b))
    out = register_pair_staged(*args, cfg=cfg, **kwargs)
    jax.block_until_ready(out)  # compile + warmup
    # vary inputs per repeat: some runtimes replay-cache identical
    # (program, args) executions, which would fake sub-real timings
    variants = []
    for r in range(repeats):
        eps = jnp.float32(1e-5 * (r + 1))
        variants.append((args[0] + eps,) + args[1:])
    best = float("inf")
    for r in range(repeats):
        t0 = time.perf_counter()
        out = register_pair_staged(*variants[r], cfg=cfg, **kwargs)
        # force a host transfer: block_until_ready returns before device
        # completion on some tunneled runtimes
        np.asarray(out["transformation"])
        dt = time.perf_counter() - t0
        print(f"# repeat {r}: {dt:.3f}s", file=sys.stderr)
        best = min(best, dt)
    print(
        f"# staged run: converged={bool(out['converged'])} "
        f"corr={float(out['n_correspondences']):.0f} inliers={int(out['inliers'])}",
        file=sys.stderr,
    )
    return best


def cpu_baseline(n: int) -> float:
    key = f"cpu_{n}"
    if os.path.exists(CACHE):
        try:
            cache = json.load(open(CACHE))
            if key in cache:
                return cache[key]
        except Exception:
            cache = {}
    else:
        cache = {}
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["LGR_BENCH_MODE"] = "cpu_worker"
    env["LGR_BENCH_N"] = str(n)
    env["LGR_BENCH_REPEATS"] = "2"
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    secs = json.loads(line)["seconds_per_pair"]
    cache[key] = secs
    try:
        json.dump(cache, open(CACHE, "w"))
    except Exception:
        pass
    return secs


def main():
    if os.environ.get("LGR_BENCH_MODE") == "cpu_worker":
        import jax

        jax.config.update("jax_platforms", "cpu")
        secs = run_step(N, REPEATS)
        print(json.dumps({"seconds_per_pair": secs}))
        return

    secs = run_step(N, REPEATS)
    try:
        base = cpu_baseline(CPU_N)
        vs = (base / secs) * (N / CPU_N) ** 0  # same-size comparison
    except Exception:
        base = None
        vs = float("nan")
    print(
        json.dumps(
            {
                "metric": f"register_{N//1024}k_pt_pair_e2e",
                "value": round(1.0 / secs, 4),
                "unit": "pairs/s",
                "vs_baseline": round(vs, 3) if vs == vs else None,
            }
        )
    )


if __name__ == "__main__":
    main()
