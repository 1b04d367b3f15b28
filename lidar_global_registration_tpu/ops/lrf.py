"""Local reference frames: SHOT LRF, gravity LRF, ground-truth LRF.

Reference: common.cpp:693-755 (estimateReferenceFrames) with three modes:
  - 'default':  the descriptor's own LRF (SHOT LRF computed here);
  - 'gravity':  z = point normal, y = gravity x z, x = y x z; falls back to
                the SHOT LRF when the normal is within 0.04 rad of gravity;
  - 'gt':       constant frame rotated by the inverse GT rotation (debug).

SHOT LRF (pcl::SHOTLocalReferenceFrameEstimation): covariance of neighbor
offsets weighted by (r - d), eigenvectors sorted descending, x/z axes sign-
disambiguated toward the neighbor majority, y = z x x.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from lidar_global_registration_tpu.ops.eigen3 import eigh_sym3

RF_MIN_ANGLE_RAD = 0.04  # common.cpp:21


@partial(jax.jit, static_argnames=())
def shot_lrf(xyz_q, radius, xyz_all, idx, mask, diffs=None, dist=None):
    """SHOT LRFs for query points over indexed neighborhoods.

    xyz_q f32[M,3]; xyz_all f32[N,3]; idx i32[M,K]; mask bool[M,K];
    radius scalar.  Returns (frames f32[M,3,3] rows = (x,y,z), ok bool[M]).

    Per-coordinate gathers (SoA): [M,K,3] intermediates pad the 3-wide dim
    to 128 lanes on TPU.  `diffs`/`dist` accept the precomputed per-
    coordinate neighbor offsets so a caller that also histograms the same
    neighborhood (ops/shot.py) pays the [M,K] element gathers once."""
    if diffs is None:
        diffs = [xyz_all[:, c][idx] - xyz_q[:, c][:, None] for c in range(3)]
    if dist is None:
        dist2 = diffs[0] ** 2 + diffs[1] ** 2 + diffs[2] ** 2
        dist = jnp.sqrt(jnp.maximum(dist2, 0.0))
    w = jnp.where(mask, jnp.maximum(radius - dist, 0.0), 0.0)
    wsum = jnp.sum(w, axis=1)
    rows = []
    for i in range(3):
        row = []
        for j in range(3):
            if j < i:
                row.append(rows[j][i])
            else:
                row.append(jnp.sum(w * diffs[i] * diffs[j], axis=1))
        rows.append(row)
    cov = jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)
    cov = cov / jnp.maximum(wsum, 1e-30)[:, None, None]
    eig, V = eigh_sym3(cov)  # ascending: v0 smallest
    x = V[..., :, 2]  # largest eigenvector
    z = V[..., :, 0]  # smallest eigenvector
    # Sign disambiguation: orient toward the side with more neighbors
    # (weighted by validity only, like PCL's point-count majority).
    proj_x = diffs[0] * x[:, 0:1] + diffs[1] * x[:, 1:2] + diffs[2] * x[:, 2:3]
    proj_z = diffs[0] * z[:, 0:1] + diffs[1] * z[:, 1:2] + diffs[2] * z[:, 2:3]
    px = jnp.sum(jnp.where(mask, jnp.sign(proj_x), 0.0), axis=1)
    pz = jnp.sum(jnp.where(mask, jnp.sign(proj_z), 0.0), axis=1)
    x = jnp.where((px < 0)[:, None], -x, x)
    z = jnp.where((pz < 0)[:, None], -z, z)
    y = jnp.cross(z, x)
    frames = jnp.stack([x, y, z], axis=1)  # rows
    ok = wsum > 0
    return frames, ok


def gravity_lrf(normals, gravity=None):
    """Gravity-aligned frames (common.cpp:712-734).

    Returns (frames f32[M,3,3] rows=(x,y,z), needs_fallback bool[M]) where
    needs_fallback marks normals within RF_MIN_ANGLE_RAD of gravity.  Axes
    are normalized (the reference leaves them scaled by sin(angle); only
    directions matter to every consumer)."""
    if gravity is None:
        gravity = jnp.array([0.0, 0.0, 1.0], jnp.float32)
    z = normals
    cosang = jnp.clip(jnp.abs(jnp.sum(z * gravity[None, :], axis=-1)), 0.0, 1.0)
    needs_fallback = jnp.arccos(cosang) <= RF_MIN_ANGLE_RAD
    y = jnp.cross(jnp.broadcast_to(gravity, z.shape), z)
    yn = jnp.sqrt(jnp.maximum(jnp.sum(y * y, axis=-1, keepdims=True), 1e-30))
    y = y / yn
    x = jnp.cross(y, z)
    xn = jnp.sqrt(jnp.maximum(jnp.sum(x * x, axis=-1, keepdims=True), 1e-30))
    x = x / xn
    frames = jnp.stack([x, y, z], axis=1)
    return frames, needs_fallback


def gt_lrf(n: int, ground_truth: jax.Array):
    """Constant frame rotated by inv(R_gt) (common.cpp:697-711)."""
    R = ground_truth[:3, :3]
    lrf = jnp.linalg.inv(R)  # columns of inv(R) are the axes
    # reference sets x_axis = col0, y = col1, z = col2; our rows = axes.
    frame = lrf.T
    return jnp.broadcast_to(frame[None], (n, 3, 3))
