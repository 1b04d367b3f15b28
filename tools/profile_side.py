"""Micro-profile of the fused side stage (surface + ISS cell passes) —
~16 s of the 10M budget.  The side grid's occupancy is ~7-10 (normal
cell ~= 3 point spacings), so a C=512 packed block spans ~55 y-columns
and every candidate row is evaluated against all 512 queries: the
wasted-pair ratio is ~9x worse than on the feature grid.  Knobs:
LGR_PROF_N, LGR_PACKED_C, LGR_SEG_CAP, LGR_PROF_REPEATS.

Usage: python tools/profile_side.py
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
        plan_grid_many,
        surface_iss_masked,
    )

    _enable_compile_cache()
    n = int(os.environ.get("LGR_PROF_N", str(1 << 20)))
    repeats = int(os.environ.get("LGR_PROF_REPEATS", "3"))

    extent = 30.0 * max(1.0, np.sqrt(n / 2**20))
    a, _b, vpa, _vpb = _synthetic_scene_pair_device(n, extent=extent)
    a = jnp.asarray(a)
    valid = jnp.ones((n,), bool)
    radii = _derive_radii(a, a, n)
    normal_cell = float(radii["normal_cell"])
    iss_radius = float(radii["iss_src"])
    feature_radius = float(radii["feature"])

    z = jnp.zeros_like(a)
    plan_n, plan_f = plan_grid_many([
        (a, z, valid, max(normal_cell, iss_radius)),
        (a, z, valid, feature_radius),
    ])
    print(
        f"# side grid: C={plan_n.C} SEG={plan_n.SEG} R_pad={plan_n.R_pad} "
        f"packed={plan_n.packed} maxocc={plan_n.maxocc}",
        file=sys.stderr,
    )

    def run():
        _normal, kp, _dens, _sal = surface_iss_masked(
            plan_n, plan_f, normal_cell, iss_radius,
            viewpoint=jnp.asarray(vpa), shot=False,
        )
        return int(np.asarray(jnp.sum(kp.astype(jnp.int32))))

    t0 = time.perf_counter()
    nkp = run()
    print(f"# compile+run: {time.perf_counter() - t0:.2f}s kp={nkp}",
          file=sys.stderr)
    times = []
    for r in range(repeats):
        t0 = time.perf_counter()
        nkp = run()
        dt = time.perf_counter() - t0
        times.append(dt)
        print(f"# repeat {r}: {dt:.3f}s", file=sys.stderr)
    print(
        f"side_pass N={n} C={plan_n.C} SEG={plan_n.SEG} "
        f"packed={plan_n.packed} kp={nkp} "
        f"median={float(np.median(times)):.3f}s"
    )


if __name__ == "__main__":
    from bench import _ensure_axon_env

    _ensure_axon_env()
    main()
