"""Micro-profile of the FPFH cell pass (the 10M bottleneck: ~58 of 80 s).

Times fpfh_pass alone — plan build excluded — on the bench's device-side
synthetic scene, with an ISS-like keypoint mask (LGR_PROF_KP_FRAC of rows,
random; random spreads keypoints wider than real ISS clusters do, so the
block-masking benefit measured here is conservative) or unmasked.

Knobs: LGR_PROF_N (points), LGR_PACKED_C (packed block width),
LGR_SEG_CAP, LGR_PROF_KP_FRAC (0 = unmasked), LGR_PROF_REPEATS.

Usage:  python tools/profile_fpfh.py
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
    from lidar_global_registration_tpu.ops.pallas.cellgrid import (
        fpfh_pass,
        plan_grid,
        set_normals,
        surface_pass,
    )

    _enable_compile_cache()
    n = int(os.environ.get("LGR_PROF_N", str(1 << 20)))
    kp_frac = float(os.environ.get("LGR_PROF_KP_FRAC", "0.013"))
    repeats = int(os.environ.get("LGR_PROF_REPEATS", "3"))

    extent = 30.0 * max(1.0, np.sqrt(n / 2**20))
    a, _b, _vpa, _vpb = _synthetic_scene_pair_device(n, extent=extent)
    a = jnp.asarray(a)
    valid = jnp.ones((n,), bool)
    radii = _derive_radii(a, a, n)
    feature_radius = float(radii["feature"])
    normal_cell = float(radii["normal_cell"])

    z = jnp.zeros_like(a)
    t0 = time.perf_counter()
    plan_n = plan_grid(a, z, valid, normal_cell)
    plan_f = plan_grid(a, z, valid, feature_radius)
    print(
        f"# plans: {time.perf_counter() - t0:.2f}s  "
        f"feature grid: C={plan_f.C} SEG={plan_f.SEG} R_pad={plan_f.R_pad} "
        f"packed={plan_f.packed} maxocc={plan_f.maxocc}",
        file=sys.stderr,
    )

    normal, _curv, _dens, _sal, _npts = surface_pass(plan_n, normal_cell)
    normal = jax.block_until_ready(normal)

    if kp_frac > 0:
        rng = jax.random.PRNGKey(566)
        kp = jax.random.uniform(rng, (n,)) < kp_frac
    else:
        kp = None

    pf = set_normals(plan_f, normal)

    def run():
        feat, fv = fpfh_pass(pf, feature_radius, kp=kp)
        return np.asarray(jnp.sum(fv.astype(jnp.int32))), feat

    t0 = time.perf_counter()
    nv, feat = run()
    print(f"# compile+run: {time.perf_counter() - t0:.2f}s  valid={int(nv)}",
          file=sys.stderr)
    times = []
    for r in range(repeats):
        t0 = time.perf_counter()
        nv, feat = run()
        dt = time.perf_counter() - t0
        times.append(dt)
        print(f"# repeat {r}: {dt:.3f}s", file=sys.stderr)
    med = float(np.median(times))
    print(
        f"fpfh_pass N={n} C={plan_f.C} SEG={plan_f.SEG} packed={plan_f.packed} "
        f"kp_frac={kp_frac} median={med:.3f}s"
    )


if __name__ == "__main__":
    from bench import _ensure_axon_env

    _ensure_axon_env()
    main()
