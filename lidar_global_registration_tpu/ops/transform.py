"""Rigid-transform estimation: batched SVD-free Kabsch / Umeyama.

Reference: src/transformation.cpp:4-38 (Kabsch via Eigen::JacobiSVD with the
determinant reflection fix) and pcl::umeyama inside GROR
(include/gror/ia_gror.hpp refineTransformationMatrix).

TPU re-design: instead of an iterative SVD we use the closed-form polar
decomposition.  With H = sum (p - cp)(q - cq)^T, H = U S V^T and the optimal
rotation is R = V D U^T (D fixes reflections).  H^T H = V S^2 V^T is symmetric
3x3 -> closed-form eigendecomposition gives V and S; U = H V S^-1.  This is
branch-free, f32, and vmaps over thousands of RANSAC hypotheses.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from lidar_global_registration_tpu.ops.eigen3 import eigh_sym3

_EPS = 1e-12


def quat_to_rotmat(quat: jax.Array) -> jax.Array:
    """Unit quaternion (w,x,y,z) [...,4] -> rotation matrix [...,3,3]."""
    w, x, y, z = quat[..., 0], quat[..., 1], quat[..., 2], quat[..., 3]
    R = jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )
    return R


def kabsch(p: jax.Array, q: jax.Array, w: jax.Array | None = None):
    """Optimal rigid transform aligning p -> q (batched, Horn's method).

    p, q: f32[..., N, 3]; w: optional f32[..., N] weights (use the validity
    mask as weights for padded sets).
    Returns (R f32[...,3,3], t f32[...,3]) with q ~ R p + t.

    Uses the quaternion eigen formulation (largest eigenvector of Horn's 4x4
    K matrix) instead of an SVD of H: linear in H (no conditioning squared),
    exact for the rank-2 H of minimal 3-point RANSAC samples, and batched
    eigh on 4x4 is cheap on the MXU-free path.
    """
    if w is None:
        w = jnp.ones(p.shape[:-1], p.dtype)
    wsum = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), _EPS)
    wn = w / wsum
    cp = jnp.sum(p * wn[..., None], axis=-2)
    cq = jnp.sum(q * wn[..., None], axis=-2)
    pc = (p - cp[..., None, :]) * w[..., None]
    qc = q - cq[..., None, :]
    # S = pc^T qc (correlation, highest precision matters on TPU where the
    # default matmul path is bf16-based)
    S = jnp.einsum("...ni,...nj->...ij", pc, qc, precision=jax.lax.Precision.HIGHEST)
    scale = jnp.maximum(jnp.max(jnp.abs(S), axis=(-2, -1)), _EPS)
    S = S / scale[..., None, None]

    s00, s01, s02 = S[..., 0, 0], S[..., 0, 1], S[..., 0, 2]
    s10, s11, s12 = S[..., 1, 0], S[..., 1, 1], S[..., 1, 2]
    s20, s21, s22 = S[..., 2, 0], S[..., 2, 1], S[..., 2, 2]
    K = jnp.stack(
        [
            jnp.stack([s00 + s11 + s22, s12 - s21, s20 - s02, s01 - s10], -1),
            jnp.stack([s12 - s21, s00 - s11 - s22, s01 + s10, s02 + s20], -1),
            jnp.stack([s20 - s02, s01 + s10, -s00 + s11 - s22, s12 + s21], -1),
            jnp.stack([s01 - s10, s02 + s20, s12 + s21, -s00 - s11 + s22], -1),
        ],
        axis=-2,
    )
    eigval, eigvec = jnp.linalg.eigh(K)
    quat = eigvec[..., :, -1]  # largest eigenvalue
    R = quat_to_rotmat(quat)
    t = cq - jnp.einsum("...ij,...j->...i", R, cp, precision=jax.lax.Precision.HIGHEST)
    return R, t


def umeyama(p: jax.Array, q: jax.Array, w: jax.Array | None = None):
    """Rigid (no-scale) Umeyama == Kabsch; kept as a named alias mirroring
    pcl::umeyama(cloud_src, cloud_tgt, false) used by GROR's refine step."""
    return kabsch(p, q, w)


def to_matrix4(R: jax.Array, t: jax.Array) -> jax.Array:
    shape = R.shape[:-2]
    T = jnp.zeros(shape + (4, 4), R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def from_matrix4(T: jax.Array):
    return T[..., :3, :3], T[..., :3, 3]


def apply_transform(T: jax.Array, pts: jax.Array) -> jax.Array:
    R, t = from_matrix4(T)
    # HIGHEST: the runtime may lower default f32 dots to one bf16 pass;
    # a 2^-8 relative error on scene-scale coordinates (~0.1 m at 30 m)
    # is the same order as the inlier threshold
    return (
        jnp.einsum("...ij,...nj->...ni", R, pts,
                   precision=jax.lax.Precision.HIGHEST) + t[..., None, :]
    )


def rotation_translation_error(T1, T2):
    """angle(R1^-1 R2), ||t1 - t2|| (reference: src/analysis.cpp:19-24)."""
    R1, t1 = from_matrix4(T1)
    R2, t2 = from_matrix4(T2)
    Rd = jnp.swapaxes(R1, -1, -2) @ R2
    tr = Rd[..., 0, 0] + Rd[..., 1, 1] + Rd[..., 2, 2]
    ang = jnp.arccos(jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0))
    terr = jnp.sqrt(jnp.sum((t1 - t2) ** 2, axis=-1))
    return ang, terr
