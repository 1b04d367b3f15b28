"""Per-point weight functions for the weighted_closest_plane metric.

Reference: src/weights.cpp — constant, exp_curvature, curvedness (principal
curvatures via pcl::PrincipalCurvaturesEstimation), harris/tomasi/curvature
(pcl::HarrisKeypoint3D responses over the normal covariance), and nss
(inverse normal-space histogram).

TPU re-design: all of them reduce to one kNN pass + batched 3x3 covariance
eigen-analysis of either projected normals (principal curvatures) or raw
normals (Harris family), so they share the neighbor lists.

Note: the reference's NSS findBin (weights.cpp:151-163) indexes theta*8 and
phi*8 without dividing by pi/2pi, overflowing its own 8x8 histogram; we bin
theta/pi and phi/2pi instead (the evident intent).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from lidar_global_registration_tpu.ops import grid as gridmod
from lidar_global_registration_tpu.ops.density import _auto_cell_size
from lidar_global_registration_tpu.ops.eigen3 import eigvals_sym3
from lidar_global_registration_tpu.types import (
    Cloud,
    METRIC_WEIGHT_CONSTANT,
    METRIC_WEIGHT_CURVATURE,
    METRIC_WEIGHT_CURVEDNESS,
    METRIC_WEIGHT_EXP_CURVATURE,
    METRIC_WEIGHT_HARRIS,
    METRIC_WEIGHT_NSS,
    METRIC_WEIGHT_TOMASI,
)

NS_BIN = 8


def _knn(cloud: Cloud, k: int):
    cell = _auto_cell_size(cloud, k)
    n_valid = max(int(np.asarray(cloud.count())), 1)
    for _ in range(8):
        g = gridmod.build_grid(cloud.xyz, cloud.valid, cell, cell_cap=64)
        idx, dist, mask = gridmod.knn(g, cloud.xyz, cloud.valid, k, cap=64)
        big = jnp.float32(1.0e38)
        kth = jnp.where(mask[:, k - 1], dist[:, k - 1], big)
        covered = int(
            np.asarray(jnp.sum((jnp.sum(mask, axis=1) >= k) & (kth <= cell) & cloud.valid))
        )
        if covered >= 0.999 * n_valid:
            break
        cell *= 2.0
    return idx, mask


def principal_curvatures(cloud: Cloud, k: int):
    """pc1 >= pc2 per point: eigenvalues of the covariance of neighbor
    normals projected onto the point's tangent plane (PCL semantics)."""
    idx, mask = _knn(cloud, k)
    n = cloud.normal
    ni = n[:, None, :]  # [N,1,3]
    nj = n[idx]  # [N,K,3]
    # project onto tangent plane of n_i:  m = (I - n n^T) nj
    proj = nj - jnp.sum(nj * ni, axis=-1, keepdims=True) * ni
    w = mask.astype(jnp.float32)
    cnt = jnp.maximum(jnp.sum(w, axis=1), 1.0)
    mean = jnp.sum(proj * w[..., None], axis=1) / cnt[:, None]
    d = (proj - mean[:, None, :]) * w[..., None]
    cov = jnp.einsum("nki,nkj->nij", d, d, precision=jax.lax.Precision.HIGHEST) / cnt[:, None, None]
    eig = eigvals_sym3(cov)  # ascending
    pc1 = eig[:, 2]
    pc2 = eig[:, 1]
    return pc1, pc2


def _normal_covariance_eigs(cloud: Cloud, k: int):
    idx, mask = _knn(cloud, k)
    nj = cloud.normal[idx]
    ok = mask & (jnp.sum(nj * nj, axis=-1) > 0.5)
    w = ok.astype(jnp.float32)
    cnt = jnp.maximum(jnp.sum(w, axis=1), 1.0)
    cov = jnp.einsum("nk,nki,nkj->nij", w, nj, nj, precision=jax.lax.Precision.HIGHEST) / cnt[:, None, None]
    return cov, eigvals_sym3(cov)


def _quantile(values: np.ndarray, q: float) -> float:
    """Reference quantile (utils.h:478-498): linear blend of nth elements."""
    v = np.asarray(values, np.float64)
    n = len(v)
    if n == 0:
        return float("nan")
    if n == 1:
        return float(v[0])
    i = int(np.floor(q * (n - 1)))
    j = min(i + 1, n - 1)
    vi = np.partition(v, i)[i]
    if i < j:
        vj = np.partition(v, j)[j]
        return float(vi * (n * q - i) + vj * (j - n * q))
    return float(vi)


def weight_function(weight_id: str, nr_points: int, cloud: Cloud) -> jax.Array:
    """getWeightFunction dispatch (weights.cpp:24-41); returns f32[N]."""
    N = cloud.capacity
    valid = cloud.valid
    if weight_id == METRIC_WEIGHT_CONSTANT:
        return jnp.where(valid, 1.0, 0.0)

    if weight_id == METRIC_WEIGHT_EXP_CURVATURE:
        pc1, pc2 = principal_curvatures(cloud, nr_points)
        max_pc = jnp.where(valid, jnp.maximum(pc1, pc2), 0.0)
        q = _quantile(np.asarray(max_pc)[np.asarray(valid)], 0.8)
        lam = np.log(1.05) * q
        w = jnp.where(max_pc > 0, jnp.exp(-lam / jnp.maximum(max_pc, 1e-30)), 0.0)
        return jnp.where(valid, w, 0.0)

    if weight_id == METRIC_WEIGHT_CURVEDNESS:
        pc1, pc2 = principal_curvatures(cloud, nr_points)
        w = jnp.log(jnp.sqrt(jnp.maximum((pc1 * pc1 + pc2 * pc2) / 2.0, 0.0)) + 1.0)
        return jnp.where(valid, w, 0.0)

    if weight_id in (METRIC_WEIGHT_HARRIS, METRIC_WEIGHT_TOMASI, METRIC_WEIGHT_CURVATURE):
        if weight_id == METRIC_WEIGHT_CURVATURE:
            return jnp.where(valid, jnp.where(jnp.isfinite(cloud.curvature), cloud.curvature, 0.0), 0.0)
        cov, eig = _normal_covariance_eigs(cloud, nr_points)
        if weight_id == METRIC_WEIGHT_TOMASI:
            return jnp.where(valid, eig[:, 0], 0.0)
        det = jnp.linalg.det(cov)
        tr = cov[:, 0, 0] + cov[:, 1, 1] + cov[:, 2, 2]
        return jnp.where(valid, det - 0.04 * tr * tr, 0.0)

    if weight_id == METRIC_WEIGHT_NSS:
        n = cloud.normal
        ok = valid & (jnp.sum(n * n, axis=-1) > 0.5)
        theta = jnp.arccos(jnp.clip(n[:, 2], -1.0, 1.0)) / jnp.pi  # [0,1]
        phi = jnp.mod(jnp.arctan2(n[:, 1], n[:, 0]) + 2 * jnp.pi, 2 * jnp.pi) / (
            2 * jnp.pi
        )
        bt = jnp.minimum(jnp.floor(theta * NS_BIN), NS_BIN - 1).astype(jnp.int32)
        bp = jnp.minimum(jnp.floor(phi * NS_BIN), NS_BIN - 1).astype(jnp.int32)
        b = bt * NS_BIN + bp
        hist = jax.ops.segment_sum(
            ok.astype(jnp.float32), b, num_segments=NS_BIN * NS_BIN
        )
        w = 1.0 / jnp.maximum(hist[b], 1.0) / (NS_BIN * NS_BIN)
        return jnp.where(ok, w, 0.0)

    # unknown -> constant with a warning, like the reference
    import warnings

    warnings.warn(f"weight function {weight_id!r} isn't supported, using constant")
    return jnp.where(valid, 1.0, 0.0)
