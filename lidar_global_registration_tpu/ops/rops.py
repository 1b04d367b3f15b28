"""RoPS-135 descriptors (Rotational Projection Statistics).

Reference: the custom PCL fork accepting precomputed LRFs
(include/pcl/impl/rops_custom_lrf.hpp, common.h:348-392): 3 rotation axes x
number_of_rotations (3) x 3 projection planes x 5 statistics (central
moments m11, m12, m21, m22 and Shannon entropy of a 5x5 distribution
matrix) = 135 values.  The reference needs a greedy-projection mesh to
build LRFs when none are given and weights every triangle's vote by its
area (rops_custom_lrf.hpp:98-118).  Mesh-free TPU variant: the LRF comes
from the weighted covariance (SHOT LRF — same disk of support, no GP3
dependency), and the triangle-area weight is replaced by a per-point AREA
PROXY: each surface point votes with the reciprocal of its local point
count within radius/5, i.e. its share of the local surface area.  On a
uniformly sampled mesh both weightings converge to the same distribution;
the proxy additionally de-biases non-uniform scan densities, which the
point-sampled (unweighted) variant could not.

TPU re-design: per-coordinate (SoA) gathers; the static 9-rotation stack
unrolls into per-rotation [M,K] component math; each 5x5 distribution
matrix is a segment-sum histogram.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from lidar_global_registration_tpu.ops import grid as gridmod
from lidar_global_registration_tpu.ops import lrf as lrfmod

N_BINS = 5
N_ROTATIONS = 3
DIM = 3 * N_ROTATIONS * 3 * 5  # 135


def _rotation_stack() -> np.ndarray:
    """Static [9, 3, 3]: for each LRF axis (x,y,z) and each of N_ROTATIONS
    angles, the rotation matrix about that axis."""
    mats = []
    for axis in range(3):
        for r in range(N_ROTATIONS):
            theta = 2.0 * np.pi * (r + 1) / (N_ROTATIONS + 1)
            c, s = np.cos(theta), np.sin(theta)
            if axis == 0:
                m = [[1, 0, 0], [0, c, -s], [0, s, c]]
            elif axis == 1:
                m = [[c, 0, s], [0, 1, 0], [-s, 0, c]]
            else:
                m = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
            mats.append(m)
    return np.array(mats, np.float32)


_ROTS_NP = _rotation_stack()


def _distribution_stats(u, v, w_mask, weights, cnt):
    """5x5 normalized distribution matrix stats for one projection.

    u, v: [M,K] plane coordinates; weights [M,K] per-point area weights
    (the reference weighs votes by triangle area); returns f32[M,5]."""
    M = u.shape[0]
    big = jnp.float32(3.0e38)
    umin = jnp.min(jnp.where(w_mask, u, big), axis=1, keepdims=True)
    umax = jnp.max(jnp.where(w_mask, u, -big), axis=1, keepdims=True)
    vmin = jnp.min(jnp.where(w_mask, v, big), axis=1, keepdims=True)
    vmax = jnp.max(jnp.where(w_mask, v, -big), axis=1, keepdims=True)
    ub = jnp.clip(
        jnp.floor((u - umin) / jnp.maximum(umax - umin, 1e-30) * N_BINS), 0, N_BINS - 1
    ).astype(jnp.int32)
    vb = jnp.clip(
        jnp.floor((v - vmin) / jnp.maximum(vmax - vmin, 1e-30) * N_BINS), 0, N_BINS - 1
    ).astype(jnp.int32)
    cell = ub * N_BINS + vb
    rows = jnp.arange(M, dtype=jnp.int32)[:, None]
    dm = jax.ops.segment_sum(
        jnp.where(w_mask, weights, 0.0).reshape(-1),
        (rows * (N_BINS * N_BINS) + cell).reshape(-1),
        num_segments=M * N_BINS * N_BINS,
    ).reshape(M, N_BINS, N_BINS)
    dm = dm / cnt[:, None, None]

    ii = jnp.arange(N_BINS, dtype=jnp.float32)
    ci = jnp.sum(dm * ii[None, :, None], axis=(1, 2))
    cj = jnp.sum(dm * ii[None, None, :], axis=(1, 2))
    di = ii[None, :, None] - ci[:, None, None]
    dj = ii[None, None, :] - cj[:, None, None]
    m11 = jnp.sum(dm * di * dj, axis=(1, 2))
    m12 = jnp.sum(dm * di * dj * dj, axis=(1, 2))
    m21 = jnp.sum(dm * di * di * dj, axis=(1, 2))
    m22 = jnp.sum(dm * di * di * dj * dj, axis=(1, 2))
    ent = -jnp.sum(jnp.where(dm > 0, dm * jnp.log(jnp.maximum(dm, 1e-30)), 0.0), axis=(1, 2))
    return jnp.stack([m11, m12, m21, m22, ent], axis=-1)


@partial(jax.jit, static_argnames=())
def rops_from_neighbors(kp_xyz, frames, surface_xyz, idx, mask, weights=None):
    """kp_xyz f32[M,3]; frames f32[M,3,3] rows=(x,y,z); idx i32[M,K];
    weights: optional [M,K] area weights (default: uniform)."""
    d = [surface_xyz[:, c][idx] - kp_xyz[:, c][:, None] for c in range(3)]  # [M,K]
    # LRF coordinates: loc_j = frames[:, j, :] . d
    loc = [
        d[0] * frames[:, j, 0:1] + d[1] * frames[:, j, 1:2] + d[2] * frames[:, j, 2:3]
        for j in range(3)
    ]
    if weights is None:
        weights = jnp.ones(mask.shape, jnp.float32)
    cnt = jnp.maximum(
        jnp.sum(jnp.where(mask, weights, 0.0), axis=1), 1e-30
    )
    feats = []  # ordered [projection][rotation] to match the AoS layout
    per_proj = [[], [], []]
    for r in range(9):
        Rm = _ROTS_NP[r]
        rot = [
            float(Rm[i, 0]) * loc[0] + float(Rm[i, 1]) * loc[1] + float(Rm[i, 2]) * loc[2]
            for i in range(3)
        ]
        for p, (a, b) in enumerate(((1, 2), (0, 2), (0, 1))):
            per_proj[p].append(_distribution_stats(rot[a], rot[b], mask, weights, cnt))
    for p in range(3):
        feats.append(jnp.stack(per_proj[p], axis=1))  # [M,9,5]
    desc = jnp.concatenate(feats, axis=-1).reshape(kp_xyz.shape[0], DIM)
    return desc


def rops(
    kp_xyz,
    kp_valid,
    surface_xyz,
    surface_valid,
    radius,
    frames=None,
    k_neighbors: int = 384,
    cap: int = 128,
    density_k: int = 48,
    area_weighting: bool = True,
    chunk: int | None = None,
    approx: bool | None = None,
):
    if approx is None:
        approx = gridmod.approx_topk_default()
    g = gridmod.build_grid(surface_xyz, surface_valid, radius, cell_cap=cap)
    idx, _d, mask = gridmod.radius_neighbors(
        g, kp_xyz, kp_valid, radius, k=k_neighbors, cap=cap, chunk=chunk, approx=approx
    )
    if frames is None:
        frames, _ok = lrfmod.shot_lrf(kp_xyz, radius, surface_xyz, idx, mask)
    weights = None
    if area_weighting:
        # mesh-free stand-in for the reference's triangle-area vote
        # (rops_custom_lrf.hpp:98-118): each point's area share = 1/count of
        # surface points within radius/5 around it (same self-join pass the
        # USC per-neighbor density uses)
        density_r = radius / 5.0
        g5 = gridmod.build_grid(surface_xyz, surface_valid, density_r, cell_cap=cap)
        sidx = jnp.arange(surface_xyz.shape[0], dtype=jnp.int32)
        _i5, _d5, m5 = gridmod.radius_neighbors(
            g5, surface_xyz, surface_valid, density_r, k=density_k, cap=cap,
            include_self=False, query_index=sidx, chunk=chunk, approx=approx,
        )
        counts = jnp.sum(m5, axis=1).astype(jnp.float32) + 1.0
        weights = 1.0 / counts[idx]
    desc = rops_from_neighbors(
        kp_xyz, jnp.asarray(frames), surface_xyz, idx, mask, weights
    )
    n_nb = jnp.sum(mask, axis=1)
    ok = kp_valid & (n_nb >= 5)
    return jnp.where(ok[:, None], desc, 0.0), ok
