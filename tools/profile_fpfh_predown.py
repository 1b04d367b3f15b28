"""Profile the REAL 10M FPFH working set: the pre-downsampled cloud
(655k rows at the bench's derived radii), through the same plan /
surface / ISS / fpfh_pass stack register_pair_staged runs, with
per-sub-stage timings.  The raw-N profile (profile_fpfh.py) measures a
different regime (no downsample, small radii).

Usage: LGR_PROF_N=10485760 python tools/profile_fpfh_predown.py
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from bench import _derive_radii, _enable_compile_cache
    from __graft_entry__ import _synthetic_scene_pair_device
    from lidar_global_registration_tpu.models.flagship import (
        _aabb_pair,
        pre_downsample_pair,
    )
    from lidar_global_registration_tpu.ops.pallas.cellgrid import (
        fpfh_pass,
        iss_pass,
        plan_grid,
        set_normals,
        surface_pass,
    )

    _enable_compile_cache()
    n = int(os.environ.get("LGR_PROF_N", str(10_485_760)))
    repeats = int(os.environ.get("LGR_PROF_REPEATS", "3"))

    extent = 30.0 * max(1.0, np.sqrt(n / 2**20))
    a, b, _vpa, _vpb = _synthetic_scene_pair_device(n, extent=extent)
    a, b = jnp.asarray(a), jnp.asarray(b)
    ones = jnp.ones((n,), bool)
    radii = _derive_radii(a, b, n)
    pair_aabb = np.asarray(_aabb_pair(a, ones, b, ones))
    sx, sv, tx, tv = pre_downsample_pair(
        a, ones, b, ones, 2.0 * radii["density_src"],
        2.0 * radii["density_tgt"], aabb=pair_aabb)
    m = sx.shape[0]
    radii = _derive_radii(sx, tx, m, valid_a=sv, valid_b=tv)
    print(f"# {n} -> {m} rows/side; radii: "
          + " ".join(f"{k}={v:.3f}" for k, v in radii.items()),
          file=sys.stderr)
    feature_radius = float(radii["feature"])
    normal_cell = float(radii["normal_cell"])
    iss_radius = float(radii["iss_src"])

    def _force(out):
        for leaf in jax.tree_util.tree_leaves(out):
            if hasattr(leaf, "ndim"):
                np.asarray(leaf if leaf.ndim == 0 else leaf.reshape(-1)[:1])
            elif hasattr(leaf, "state"):  # GridPlan
                np.asarray(leaf.state[0].reshape(-1)[:1])

    def timeit(label, fn):
        out = fn()
        _force(out)
        ts = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            out = fn()
            _force(out)
            ts.append(time.perf_counter() - t0)
        print(f"{label:24s} {np.median(ts)*1e3:9.1f} ms")
        return out

    z = jnp.zeros_like(sx)
    plan_n = timeit("plan normal grid", lambda: plan_grid(
        sx, z, sv, normal_cell))
    plan_f = timeit("plan feature grid", lambda: plan_grid(
        sx, z, sv, feature_radius))
    print(f"# feature grid: C={plan_f.C} SEG={plan_f.SEG} "
          f"R_pad={plan_f.R_pad} packed={plan_f.packed} "
          f"maxocc={plan_f.maxocc}", file=sys.stderr)

    out = timeit("surface_pass", lambda: surface_pass(plan_n, normal_cell))
    normal = out[0]
    kp = None
    try:
        kpo = timeit("iss_pass", lambda: iss_pass(
            plan_n, iss_radius, normal_cell))
        kp = kpo[0] if isinstance(kpo, tuple) else kpo
        print(f"# keypoints: {int(jnp.sum(kp.astype(jnp.int32)))} of {m}",
              file=sys.stderr)
    except Exception as e:  # signature drift: fall back to a mask
        print(f"# iss_pass skipped ({e}); random 2% mask", file=sys.stderr)
        kp = jax.random.uniform(jax.random.PRNGKey(566), (m,)) < 0.02

    pf = set_normals(plan_f, normal)
    timeit("fpfh_pass", lambda: fpfh_pass(pf, feature_radius, kp=kp))


if __name__ == "__main__":
    from bench import _ensure_axon_env

    _ensure_axon_env()
    main()
