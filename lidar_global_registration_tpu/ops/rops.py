"""RoPS-135 descriptors (Rotational Projection Statistics).

Reference: the custom PCL fork accepting precomputed LRFs
(include/pcl/impl/rops_custom_lrf.hpp, common.h:348-392): 3 rotation axes x
number_of_rotations (3) x 3 projection planes x 5 statistics (central
moments m11, m12, m21, m22 and Shannon entropy of a 5x5 distribution
matrix) = 135 values.  The reference needs a greedy-projection mesh only to
build LRFs when none are given; our mesh-free variant always derives the
LRF from the weighted covariance (SHOT LRF) when no frames are supplied —
point-sampled statistics instead of triangle-area-weighted ones.

TPU re-design: the per-keypoint loop over rotations becomes one einsum over
a static stack of rotation matrices; the 5x5 distribution matrices are
segment-sum histograms over padded neighbor lists.
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


def _rotation_stack():
    """Static [9, 3, 3] stack: for each axis (x,y,z of the LRF frame) and
    each of N_ROTATIONS angles, the rotation matrix about that axis."""
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
    return jnp.asarray(np.array(mats, np.float32))


_ROTS = None


def _rots():
    global _ROTS
    if _ROTS is None:
        _ROTS = _rotation_stack()
    return _ROTS


@partial(jax.jit, static_argnames=())
def rops_from_neighbors(kp_xyz, frames, nb_xyz, nb_mask):
    """kp_xyz f32[M,3]; frames f32[M,3,3] rows=(x,y,z); nb f32[M,K,3]."""
    M, K = nb_mask.shape
    rel = nb_xyz - kp_xyz[:, None, :]
    # into LRF coordinates: local = frames @ rel
    local = jnp.einsum("mij,mkj->mki", frames, rel)
    R = _rots()  # [9,3,3]
    rot = jnp.einsum("rij,mkj->mrki", R, local)  # [M,9,K,3]

    # three projections: drop axis 0 / 1 / 2
    proj_pairs = [(1, 2), (0, 2), (0, 1)]
    feats = []
    w = nb_mask.astype(jnp.float32)[:, None, :]  # [M,1,K]
    cnt = jnp.maximum(jnp.sum(w, axis=-1), 1.0)  # [M,1]
    for a, b in proj_pairs:
        u = rot[..., a]  # [M,9,K]
        v = rot[..., b]
        big = jnp.float32(3.0e38)
        umin = jnp.min(jnp.where(nb_mask[:, None, :], u, big), axis=-1, keepdims=True)
        umax = jnp.max(jnp.where(nb_mask[:, None, :], u, -big), axis=-1, keepdims=True)
        vmin = jnp.min(jnp.where(nb_mask[:, None, :], v, big), axis=-1, keepdims=True)
        vmax = jnp.max(jnp.where(nb_mask[:, None, :], v, -big), axis=-1, keepdims=True)
        ub = jnp.clip(
            jnp.floor((u - umin) / jnp.maximum(umax - umin, 1e-30) * N_BINS),
            0,
            N_BINS - 1,
        ).astype(jnp.int32)
        vb = jnp.clip(
            jnp.floor((v - vmin) / jnp.maximum(vmax - vmin, 1e-30) * N_BINS),
            0,
            N_BINS - 1,
        ).astype(jnp.int32)
        cell = ub * N_BINS + vb  # [M,9,K]
        rowid = (
            jnp.arange(M, dtype=jnp.int32)[:, None, None] * 9
            + jnp.arange(9, dtype=jnp.int32)[None, :, None]
        )
        flat = rowid * (N_BINS * N_BINS) + cell
        dm = jax.ops.segment_sum(
            jnp.broadcast_to(w, cell.shape).reshape(-1),
            flat.reshape(-1),
            num_segments=M * 9 * N_BINS * N_BINS,
        ).reshape(M, 9, N_BINS, N_BINS)
        dm = dm / cnt[..., None, None]  # normalized distribution matrix

        ii = jnp.arange(N_BINS, dtype=jnp.float32)
        ci = jnp.sum(dm * ii[None, None, :, None], axis=(2, 3))
        cj = jnp.sum(dm * ii[None, None, None, :], axis=(2, 3))
        di = ii[None, None, :, None] - ci[..., None, None]
        dj = ii[None, None, None, :] - cj[..., None, None]
        m11 = jnp.sum(dm * di * dj, axis=(2, 3))
        m12 = jnp.sum(dm * di * dj * dj, axis=(2, 3))
        m21 = jnp.sum(dm * di * di * dj, axis=(2, 3))
        m22 = jnp.sum(dm * di * di * dj * dj, axis=(2, 3))
        ent = -jnp.sum(
            jnp.where(dm > 0, dm * jnp.log(jnp.maximum(dm, 1e-30)), 0.0), axis=(2, 3)
        )
        feats.append(jnp.stack([m11, m12, m21, m22, ent], axis=-1))  # [M,9,5]

    desc = jnp.concatenate(feats, axis=-1).reshape(M, DIM)
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
    chunk: int | None = 2048,
):
    g = gridmod.build_grid(surface_xyz, surface_valid, radius)
    idx, _d, mask = gridmod.radius_neighbors(
        g, kp_xyz, kp_valid, radius, k=k_neighbors, cap=cap, chunk=chunk
    )
    nb_xyz = surface_xyz[idx]
    if frames is None:
        frames, _ok = lrfmod.shot_lrf(kp_xyz, radius, nb_xyz, mask)
    desc = rops_from_neighbors(kp_xyz, jnp.asarray(frames), nb_xyz, mask)
    n_nb = jnp.sum(mask, axis=1)
    ok = kp_valid & (n_nb >= 5)
    return jnp.where(ok[:, None], desc, 0.0), ok
