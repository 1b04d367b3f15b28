"""kNN-PCA normal estimation with viewpoint orientation and postprocessing.

Reference: src/common.cpp:593-655 (estimateNormalsPoints via
pcl::NormalEstimationOMP + postprocessNormals).  PCA covariance over the k
nearest neighbors (self inclusive), normal = eigenvector of the smallest
eigenvalue, curvature = l0 / (l0+l1+l2), flip toward viewpoint.  The kd-tree
becomes the grid-hash kNN; per-point loops become one batched einsum feeding
the closed-form 3x3 eigensolver.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from lidar_global_registration_tpu.ops import grid as gridmod
from lidar_global_registration_tpu.ops.eigen3 import smallest_eigvec_sym3
from lidar_global_registration_tpu.types import Cloud


def covariance_from_neighbors(xyz_all, idx, mask):
    """Masked mean-centered covariance per query.

    xyz_all f32[N,3], idx i32[M,K], mask bool[M,K] ->
      (cov f32[M,3,3], mean f32[M,3], count i32[M])

    Gathers are per coordinate (structure-of-arrays): a materialized
    [M, K, 3] array tiles its 3-wide last dim to 128 lanes on TPU, a 42x
    memory blowup at cloud scale."""
    w = mask.astype(jnp.float32)
    cnt = jnp.sum(w, axis=1)
    safe = jnp.maximum(cnt, 1.0)
    comps = []  # centered, weighted coordinate components [M,K]
    means = []
    for d in range(3):
        xd = xyz_all[:, d][idx]
        md = jnp.sum(xd * w, axis=1) / safe
        comps.append((xd - md[:, None]) * w)
        means.append(md)
    mean = jnp.stack(means, axis=-1)
    rows = []
    for i in range(3):
        row = []
        for j in range(3):
            if j < i:
                row.append(rows[j][i])
            else:
                # w is 0/1 so the two carried factors of w collapse to one
                row.append(jnp.sum(comps[i] * comps[j], axis=1) / safe)
        rows.append(row)
    cov = jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)
    return cov, mean, cnt.astype(jnp.int32)


def normals_from_neighbors(points, xyz_surface, idx, mask, viewpoint=None):
    """PCA normals + curvature for `points` given neighbor lists on surface.

    Returns (normal f32[M,3], curvature f32[M], ok bool[M])."""
    cov, _, cnt = covariance_from_neighbors(xyz_surface, idx, mask)
    eig, v = smallest_eigvec_sym3(cov)
    lam = jnp.maximum(eig, 0.0)
    tot = jnp.sum(lam, axis=-1)
    curvature = jnp.where(tot > 0, lam[:, 0] / jnp.maximum(tot, 1e-30), 0.0)
    ok = cnt >= 3
    if viewpoint is None:
        viewpoint = jnp.zeros((3,), jnp.float32)
    else:
        viewpoint = jnp.asarray(viewpoint, jnp.float32)
    to_vp = viewpoint[None, :] - points
    flip = jnp.sum(v * to_vp, axis=-1) < 0.0
    v = jnp.where(flip[:, None], -v, v)
    v = jnp.where(ok[:, None], v, 0.0)
    return v, curvature, ok


def postprocess_normals(normal, curvature, ok, file_normal, normals_available: bool):
    """Reference common.cpp:593-628.

    - if file normals exist: replace failed estimates with file normals and
      flip estimates that disagree with file normals;
    - renormalize every finite normal.
    Zero-norm plays the role of PCL's NaN normals."""
    if normals_available:
        fn = file_normal
        has_file = jnp.sum(fn * fn, axis=-1) > 0
        normal = jnp.where((~ok & has_file)[:, None], fn, normal)
        ok = ok | has_file
        dot = jnp.sum(normal * fn, axis=-1)
        flip = has_file & (dot < 0)
        normal = jnp.where(flip[:, None], -normal, normal)
    n = jnp.sqrt(jnp.sum(normal * normal, axis=-1, keepdims=True))
    normal = jnp.where(n > 1e-30, normal / jnp.maximum(n, 1e-30), normal)
    return normal, curvature, ok


def estimate_normals_knn(
    cloud: Cloud,
    surface: Cloud | None = None,
    k: int = 30,
    viewpoint=None,
    normals_available: bool = False,
    cell_size: float | None = None,
    cap: int = 64,
    chunk: int | None = None,
) -> Cloud:
    """estimateNormalsPoints equivalent (common.cpp:644-655).

    Estimates per-point normals for `cloud` from the k nearest points of
    `surface` (default: the cloud itself), then applies postprocessNormals.
    Host-adaptive grid cell size as in ops.density.knn_distances."""
    from lidar_global_registration_tpu.ops.density import _auto_cell_size
    import numpy as np

    surf = cloud if surface is None else surface
    cell = cell_size if cell_size is not None else _auto_cell_size(surf, k)
    n_valid = max(int(np.asarray(cloud.count())), 1)
    for _ in range(8):
        g = gridmod.build_grid(surf.xyz, surf.valid, cell, cell_cap=cap)
        idx, dist, mask = gridmod.knn(
            g, cloud.xyz, cloud.valid, k, cap=cap, include_self=True, chunk=chunk
        )
        big = jnp.float32(1.0e38)
        kth = jnp.where(mask[:, k - 1], dist[:, k - 1], big)
        covered = int(
            np.asarray(jnp.sum((jnp.sum(mask, axis=1) >= k) & (kth <= cell) & cloud.valid))
        )
        if covered >= 0.999 * n_valid:
            break
        cell *= 2.0

    normal, curvature, ok = normals_from_neighbors(cloud.xyz, surf.xyz, idx, mask, viewpoint)
    normal, curvature, ok = postprocess_normals(
        normal, curvature, ok, cloud.normal, normals_available
    )
    normal = jnp.where(cloud.valid[:, None], normal, 0.0)
    curvature = jnp.where(cloud.valid, curvature, 0.0)
    return dataclasses.replace(cloud, normal=normal, curvature=curvature)
