"""A/B the FPFH pass output layout at fixed N: fast [R_pad, C, n_out]
vs memory-constrained channel-major (tposed) — the layout the 10M run is
forced into.  Quantifies the tposed consumer cost (per-channel element
gathers) that the e2e stage timings can't separate.

Usage: LGR_PROF_N=4194304 python tools/profile_fpfh_layout.py
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
    from lidar_global_registration_tpu.ops.pallas import cellgrid as cg

    _enable_compile_cache()
    n = int(os.environ.get("LGR_PROF_N", str(1 << 22)))
    kp_frac = float(os.environ.get("LGR_PROF_KP_FRAC", "0.013"))

    extent = 30.0 * max(1.0, np.sqrt(n / 2**20))
    a, _b, _vpa, _vpb = _synthetic_scene_pair_device(n, extent=extent)
    a = jnp.asarray(a)
    valid = jnp.ones((n,), bool)
    radii = _derive_radii(a, a, n)
    feature_radius = float(radii["feature"])
    normal_cell = float(radii["normal_cell"])

    z = jnp.zeros_like(a)
    plan_n = cg.plan_grid(a, z, valid, normal_cell)
    plan_f = cg.plan_grid(a, z, valid, feature_radius)
    print(
        f"# feature grid: C={plan_f.C} SEG={plan_f.SEG} R_pad={plan_f.R_pad} "
        f"packed={plan_f.packed}", file=sys.stderr,
    )
    normal, _c, _d, _s, _np_ = cg.surface_pass(plan_n, normal_cell)
    normal = jax.block_until_ready(normal)
    pf = cg.set_normals(plan_f, normal)
    kp = None
    if kp_frac > 0:
        kp = jax.random.uniform(jax.random.PRNGKey(566), (n,)) < kp_frac

    r2 = jnp.asarray(feature_radius, jnp.float32) ** 2

    @jax.jit
    def run_fast():
        f, fv = cg._fpfh_impl(pf.state, r2, pf.C, pf.SEG, pf.R_pad, False,
                              kp=kp, packed_rows=pf.packed, tposed=False)
        return f, jnp.sum(fv.astype(jnp.int32))

    @jax.jit
    def run_tposed():
        f, fv = cg._fpfh_impl(pf.state, r2, pf.C, pf.SEG, pf.R_pad, False,
                              kp=kp, packed_rows=pf.packed, tposed=True)
        return f, jnp.sum(fv.astype(jnp.int32))

    for name, fn in (("fast", run_fast), ("tposed", run_tposed)):
        try:
            f, nv = fn()
            nv = int(np.asarray(nv))
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                f, nv2 = fn()
                np.asarray(nv2)
                times.append(time.perf_counter() - t0)
            print(f"{name}: median={float(np.median(times)):.3f}s valid={nv}")
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    from bench import _ensure_axon_env

    _ensure_axon_env()
    main()
