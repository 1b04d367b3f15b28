"""Micro-profiler for the flagship feature stage on the live backend.

Times each kernel of the FPFH feature path (grid build, radius pass,
SPFH, combine) with honest host-pull timing (block_until_ready returns
early over the axon tunnel; only host transfers measure real work).

Usage:  PYTHONPATH=/root/repo:$PYTHONPATH python tools/profile_stages.py [N]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np


def host_pull(x):
    import jax

    for leaf in jax.tree_util.tree_leaves(x):
        np.asarray(leaf[..., :1] if getattr(leaf, "ndim", 0) else leaf)


def timed(label, fn, *args, repeats=3, **kw):
    t0 = time.perf_counter()
    out = fn(*args, **kw)
    host_pull(out)
    t_compile = time.perf_counter() - t0
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        host_pull(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{label:28s} {best*1e3:9.1f} ms   (first incl compile {t_compile:.1f} s)")
    return out


def main():
    plat = os.environ.get("JAX_PLATFORMS")
    import jax

    if plat:
        jax.config.update("jax_platforms", plat)
    if jax.default_backend() in ("tpu", "axon"):
        jax.config.update(
            "jax_compilation_cache_dir", os.path.expanduser("~/.lgr_jax_cache")
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import _synthetic_pair
    from lidar_global_registration_tpu.ops import grid as gridmod
    from lidar_global_registration_tpu.ops import fpfh as fpfhmod
    from lidar_global_registration_tpu.ops.normals import estimate_normals_knn
    from lidar_global_registration_tpu.ops.density import cloud_density
    from lidar_global_registration_tpu.types import Cloud

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    K = int(os.environ.get("PROF_K", "128"))
    CAP = int(os.environ.get("PROF_CAP", "96"))
    print(f"backend={jax.default_backend()} N={N} K={K} cap={CAP}")

    a, _b = _synthetic_pair(N)
    cloud = Cloud.from_numpy(np.asarray(a))
    xyz, valid = cloud.xyz, cloud.valid
    Npad = cloud.capacity

    dens = float(cloud_density(cloud))
    radius = 6.0 * dens
    print(f"density={dens:.4f} feature_radius={radius:.4f}")

    g = timed("build_grid", gridmod.build_grid, xyz, valid, radius, cell_cap=CAP)
    sidx = jnp.arange(Npad, dtype=jnp.int32)

    def radius_pass():
        return gridmod.radius_neighbors(
            g, xyz, valid, radius, k=K, cap=CAP, include_self=False, query_index=sidx
        )

    idx, sdist, mask = timed("radius_neighbors", radius_pass)

    def radius_pass_approx():
        return gridmod.radius_neighbors(
            g, xyz, valid, radius, k=K, cap=CAP, include_self=False,
            query_index=sidx, approx=True,
        )

    timed("radius_neighbors approx", radius_pass_approx)

    cloud_n = timed("normals(knn16)", estimate_normals_knn, cloud, None, 16)
    normal = cloud_n.normal

    spfh_all = timed("spfh", fpfhmod.spfh, xyz, normal, idx, mask)

    def combine():
        return fpfhmod.combine_spfh(
            xyz, normal, xyz, normal, spfh_all, idx, sdist, mask
        )

    timed("combine_spfh", combine)

    def full():
        return fpfhmod.fpfh(
            xyz, valid, xyz, normal, valid, radius, kp_normal=normal,
            k_neighbors=K, cap=CAP,
        )

    timed("fpfh full", full)


if __name__ == "__main__":
    main()
