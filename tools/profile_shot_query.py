"""Knob sweep for the SHOT-stage radius query at 10M-derived shapes.

radius_neighbors was measured at 4.7 s for 98k queries x 27 cells x cap 512
(tools/profile_shot.py) — ~half the SHOT stage.  This sweeps cap / k /
approx to locate the cost: candidate slots (27*cap gathers + d2) vs the
top-k selection.

Usage: python tools/profile_shot_query.py [n_surface] [n_kp]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from lidar_global_registration_tpu.ops import grid as gridmod


def bumps(n, extent, seed):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(0, extent, (n, 2)).astype(np.float32)
    z = (
        np.sin(xy[:, 0] * 0.35) * np.cos(xy[:, 1] * 0.27) * 2.0
        + np.sin(xy[:, 0] * 0.05) * 4.0
    ).astype(np.float32)
    return np.concatenate([xy, z[:, None]], axis=1)


def t(label, fn):
    out = jax.block_until_ready(fn())
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1]))
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn())
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1]))
    print(f"  {label}: {time.perf_counter() - t0:.3f}s", flush=True)
    return out


def main():
    n_surface = int(sys.argv[1]) if len(sys.argv) > 1 else 655360
    n_kp = int(sys.argv[2]) if len(sys.argv) > 2 else 98304
    radius = 4.15
    surf = bumps(n_surface, 500.0, 0)
    kp = surf[np.random.default_rng(1).choice(n_surface, n_kp, replace=False)]
    sx = jnp.asarray(surf)
    sv = jnp.ones((n_surface,), bool)
    qx = jnp.asarray(kp)
    qv = jnp.ones((n_kp,), bool)
    print(f"# surface={n_surface} kp={n_kp} radius={radius}")

    grids = {}
    for cap in (512, 256, 128):
        grids[cap] = t(
            f"build_grid cap={cap}",
            lambda cap=cap: gridmod.build_grid(sx, sv, radius, cell_cap=cap),
        )
    for cap, k, approx in (
        (512, 512, True),
        (256, 512, True),
        (128, 512, True),
        (256, 256, True),
        (128, 256, True),
        (256, 256, False),
    ):
        idx, dist, mask = t(
            f"radius_neighbors cap={cap} k={k} approx={approx}",
            lambda cap=cap, k=k, approx=approx: gridmod.radius_neighbors(
                grids[cap], qx, qv, radius, k=k, cap=cap, approx=approx
            ),
        )
        nb = np.asarray(jnp.sum(mask, axis=1))
        print(f"    neighbors: mean {nb.mean():.0f} p99 {np.percentile(nb, 99):.0f}")


if __name__ == "__main__":
    main()
