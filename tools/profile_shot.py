"""Sub-stage profiler for the staged-path SHOT stage at 10M-derived shapes.

The SHOT-10M steady-state budget (LGR_STAGE_TIMING=1, 2026-08-20) is
shot_src 1.44 s + shot_tgt 0.60 s of a 2.51 s pair — the dominant item.
This tool times the pieces of ops/shot.shot() in isolation at the shapes
the 10M bench actually produces (655k-row feature-scale surface, ~100k
keypoints, radius 4.15, voxel spacing 0.39 -> cap 512, k 512):

  build_grid | radius_neighbors | shot_lrf (fallback frames) |
  shot_from_neighbors (the 5-way quadrilinear histogram)

Usage: python tools/profile_shot.py [n_surface] [n_kp]
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
from lidar_global_registration_tpu.ops import lrf as lrfmod
from lidar_global_registration_tpu.ops.shot import shot_from_neighbors


def bumps(n, extent, seed):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(0, extent, (n, 2)).astype(np.float32)
    z = (
        np.sin(xy[:, 0] * 0.35) * np.cos(xy[:, 1] * 0.27) * 2.0
        + np.sin(xy[:, 0] * 0.05) * 4.0
    ).astype(np.float32)
    return np.concatenate([xy, z[:, None]], axis=1)


def t(label, fn, *args, **kw):
    out = jax.block_until_ready(fn(*args, **kw))
    # force a host pull (block_until_ready returns early on axon)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args, **kw))
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))
    dt = time.perf_counter() - t0
    print(f"  {label}: {dt:.3f}s", flush=True)
    return out


def main():
    n_surface = int(sys.argv[1]) if len(sys.argv) > 1 else 655360
    n_kp = int(sys.argv[2]) if len(sys.argv) > 2 else 98304
    radius = 4.15
    cap = 512
    k = 512

    surf = bumps(n_surface, 500.0, 0)
    kp = surf[np.random.default_rng(1).choice(n_surface, n_kp, replace=False)]
    sx = jnp.asarray(surf)
    sv = jnp.ones((n_surface,), bool)
    qx = jnp.asarray(kp)
    qv = jnp.ones((n_kp,), bool)
    # synthetic unit normals (slope-consistent enough for timing)
    nrm = np.zeros((n_surface, 3), np.float32)
    nrm[:, 2] = 1.0
    sn = jnp.asarray(nrm)

    print(f"# surface={n_surface} kp={n_kp} radius={radius} cap={cap} k={k}")
    g = t("build_grid", lambda: gridmod.build_grid(sx, sv, radius, cell_cap=cap))

    def q():
        return gridmod.radius_neighbors(
            g, qx, qv, radius, k=k, cap=cap, approx=gridmod.approx_topk_default()
        )

    idx, dist, mask = t("radius_neighbors", q)
    nb = np.asarray(jnp.sum(mask, axis=1))
    print(f"  (neighbors/query: mean {nb.mean():.0f}, p99 {np.percentile(nb, 99):.0f})")

    frames, _ok = t("shot_lrf", lambda: lrfmod.shot_lrf(qx, radius, sx, idx, mask))
    t(
        "shot_histogram",
        lambda: shot_from_neighbors(
            qx, frames, sx, sn, idx, mask, radius, use_scatter=False
        ),
    )


if __name__ == "__main__":
    main()
