"""Point-density estimation (reference: src/common.cpp:202-208, 531-547).

smoothed density(i) = min(d_k(i), d_k(j)) where d_k is the distance to the
k-th nearest neighbor (self included, PCL convention) and j is i's nearest
non-self neighbor.  Global cloud density = 0.8-quantile of the k=8 smoothed
densities with the reference's nth_element indexing.

The kd-tree kNN becomes a grid-hash envelope search; the cell size is found
by a short host-side doubling loop until enough queries see >= k neighbors
(the reference caps searches the same way via max_neighbors_).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from lidar_global_registration_tpu.ops import grid as gridmod
from lidar_global_registration_tpu.ops.downsample import aabb_diagonal
from lidar_global_registration_tpu.types import Cloud


def _auto_cell_size(cloud: Cloud, k: int) -> float:
    """Initial guess: points live on 2D surfaces, so the k-NN radius scales
    like spacing * sqrt(k/pi); spacing ~ diag / sqrt(N).

    The cell must stay close to the k-NN radius: the 27-cell envelope only
    guarantees completeness within one cell size, while oversized cells
    overflow the per-cell candidate cap and silently return far neighbors
    (the cap keeps an arbitrary subset of the cell, not the nearest)."""
    n = max(int(np.asarray(cloud.count())), 1)
    diag = float(np.asarray(aabb_diagonal(cloud)))
    spacing = diag / max(np.sqrt(n), 1.0)
    return max(spacing * np.sqrt(max(k, 2) / np.pi) * 1.5, 1e-12)


def knn_distances(
    cloud: Cloud,
    k: int,
    cell_size: float | None = None,
    cap: int = 32,
    max_doublings: int = 8,
    min_covered: float = 0.999,
    chunk: int | None = None,
):
    """Distances to the k nearest non-self neighbors plus the nearest
    neighbor's index; host-adaptive cell size.

    Returns (idx i32[N,k], dist f32[N,k], mask bool[N,k], cell_size)."""
    cell = cell_size if cell_size is not None else _auto_cell_size(cloud, k + 1)
    qidx = jnp.arange(cloud.capacity, dtype=jnp.int32)
    n_valid = max(int(np.asarray(cloud.count())), 1)
    for _ in range(max_doublings):
        g = gridmod.build_grid(cloud.xyz, cloud.valid, cell, cell_cap=cap)
        idx, dist, mask = gridmod.knn(
            g,
            cloud.xyz,
            cloud.valid,
            k,
            cap=cap,
            include_self=False,
            query_index=qidx,
            chunk=chunk,
        )
        # covered = found k neighbors AND the k-th lies inside the envelope
        # guarantee radius (one cell size) — otherwise nearer points could
        # hide beyond the 27-cell block.
        big = jnp.float32(1.0e38)
        kth = jnp.where(mask[:, k - 1], dist[:, k - 1], big)
        covered = int(
            np.asarray(
                jnp.sum((jnp.sum(mask, axis=1) >= k) & (kth <= cell) & cloud.valid)
            )
        )
        if covered >= min_covered * n_valid:
            break
        cell *= 2.0
    return idx, dist, mask, cell


def smoothed_densities(
    cloud: Cloud, k: int = 2, cell_size: float | None = None, chunk: int | None = None
):
    """Reference common.cpp:531-547 with PCL self-inclusive k.

    d_raw(i) = distance to the (k-1)-th non-self neighbor;
    out(i) = min(d_raw(i), d_raw(nn(i))).
    Returns (densities f32[N] (0 where invalid), cell_size used)."""
    kk = max(k - 1, 1)
    idx, dist, mask, cell = knn_distances(cloud, kk, cell_size, chunk=chunk)
    big = jnp.float32(3.0e38)
    d_raw = jnp.where(mask[:, kk - 1], dist[:, kk - 1], big)
    nn = idx[:, 0]
    d_nn = jnp.where(mask[:, 0], d_raw[nn], big)
    out = jnp.minimum(d_raw, d_nn)
    out = jnp.where(cloud.valid & (out < big), out, 0.0)
    return out, cell


def cloud_density(cloud: Cloud, quantile: float = 0.8, chunk: int | None = None) -> float:
    """Reference common.cpp:202-208: nth_element at k = clamp(q*n - 1)."""
    dens, _ = smoothed_densities(cloud, k=8, chunk=chunk)
    d = np.asarray(dens)[np.asarray(cloud.valid)]
    n = len(d)
    if n == 0:
        return 0.0
    kth = min(max(int(quantile * n - 1), 0), n - 1)
    return float(np.partition(d, kth)[kth])
