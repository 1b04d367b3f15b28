"""Split the SHOT radius query into gather / distance / select costs.

radius_neighbors at the SHOT-10M shapes costs ~0.85 s for 16k queries
(tools/profile_shot.py) — ~100x off the ~3.6 GB of candidate traffic.
This isolates which piece: the [M,27] row-gather of cap-wide cell rows,
the d2/ok compute, approx_min_k vs exact top_k, or the winner-id gathers.

Usage: python tools/profile_shot_query_split.py [n_surface] [n_kp] [cap] [k]
"""
from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from lidar_global_registration_tpu.ops import grid as gridmod
from lidar_global_registration_tpu.ops.grid import _cell_coords_1d, _hash_cells, _OFFSETS_LIST


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
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn())
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))
    print(f"  {label}: {time.perf_counter() - t0:.3f}s", flush=True)
    return out


@partial(jax.jit, static_argnames=("cap", "stage", "k"))
def query_stage(grid, q, qvalid, radius, cap: int, stage: str, k: int):
    M = q.shape[0]
    ccap = min(cap, grid.cell_cap)
    inv = 1.0 / jnp.maximum(grid.cell_size, 1e-30)
    qc = [_cell_coords_1d(q[:, d], grid.origin[d], inv) for d in range(3)]
    offsets = jnp.asarray(_OFFSETS_LIST, jnp.int32)
    cells = [qc[d][:, None] + offsets[None, :, d] for d in range(3)]
    keys = _hash_cells(cells[0], cells[1], cells[2])
    rows = grid.rank_table[keys]
    view = lambda a: a.reshape(-1, grid.cell_cap)[:, :ccap]
    ok = jnp.ones((M, 27 * ccap), bool)
    d2 = jnp.zeros((M, 27 * ccap), jnp.float32)
    for d, flat in enumerate((grid.cell_x, grid.cell_y, grid.cell_z)):
        cvals = view(flat)[rows].reshape(M, 27 * ccap)
        if stage == "gather":
            d2 = d2 + cvals  # consume without compare/repeat
            continue
        want = jnp.repeat(cells[d], ccap, axis=1)
        ok = ok & (_cell_coords_1d(cvals, grid.origin[d], inv) == want)
        dd = cvals - q[:, d][:, None]
        d2 = d2 + dd * dd
    if stage == "gather":
        return jnp.sum(d2)
    ok = ok & qvalid[:, None] & (d2 <= radius * radius)
    if stage == "d2":
        return jnp.sum(jnp.where(ok, d2, 0.0))
    d2m = jnp.where(ok, d2, jnp.float32(3.0e38))
    if stage == "approx":
        neg2, sel = jax.lax.approx_min_k(d2m, k, recall_target=0.95)
        return jnp.sum(neg2)
    if stage == "exact":
        neg, sel = jax.lax.top_k(-d2m, k)
        return jnp.sum(neg)
    raise ValueError(stage)


def main():
    n_surface = int(sys.argv[1]) if len(sys.argv) > 1 else 458752
    n_kp = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
    cap = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    k = int(sys.argv[4]) if len(sys.argv) > 4 else 512
    radius = 4.15
    surf = bumps(n_surface, 500.0, 0)
    kp = surf[np.random.default_rng(1).choice(n_surface, n_kp, replace=False)]
    sx = jnp.asarray(surf)
    sv = jnp.ones((n_surface,), bool)
    qx = jnp.asarray(kp)
    qv = jnp.ones((n_kp,), bool)
    print(f"# surface={n_surface} kp={n_kp} cap={cap} k={k} "
          f"slots={n_kp * 27 * cap / 1e6:.0f}M")
    g = t("build_grid", lambda: gridmod.build_grid(sx, sv, radius, cell_cap=cap))
    for stage in ("gather", "d2", "approx", "exact"):
        t(f"stage={stage}", lambda stage=stage: query_stage(
            g, qx, qv, jnp.float32(radius), cap, stage, k))


if __name__ == "__main__":
    main()
