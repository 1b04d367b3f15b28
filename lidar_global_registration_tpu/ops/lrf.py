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
def shot_lrf(xyz_q, radius, nb_xyz, nb_mask):
    """SHOT LRFs for query points with gathered neighborhoods.

    xyz_q f32[M,3]; nb_xyz f32[M,K,3]; nb_mask bool[M,K]; radius scalar.
    Returns (frames f32[M,3,3] rows = (x,y,z), ok bool[M])."""
    d = nb_xyz - xyz_q[:, None, :]
    dist = jnp.sqrt(jnp.maximum(jnp.sum(d * d, axis=-1), 0.0))
    w = jnp.where(nb_mask, jnp.maximum(radius - dist, 0.0), 0.0)
    wsum = jnp.sum(w, axis=1)
    cov = jnp.einsum("mk,mki,mkj->mij", w, d, d) / jnp.maximum(wsum, 1e-30)[
        :, None, None
    ]
    eig, V = eigh_sym3(cov)  # ascending: v0 smallest
    x = V[..., :, 2]  # largest eigenvector
    z = V[..., :, 0]  # smallest eigenvector
    # Sign disambiguation: orient toward the side with more neighbors
    # (weighted by validity only, like PCL's point-count majority).
    px = jnp.sum(jnp.where(nb_mask, jnp.sign(jnp.einsum("mki,mi->mk", d, x)), 0.0), axis=1)
    pz = jnp.sum(jnp.where(nb_mask, jnp.sign(jnp.einsum("mki,mi->mk", d, z)), 0.0), axis=1)
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
