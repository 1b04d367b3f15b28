"""Quadric saliency fitting for sub-voxel keypoint refinement.

Reference: src/quadric.cpp + ISSKeypoint3DDebug::estimateSubVoxelKeyPoints
(src/pcl/iss_debug.cpp:171-219): fit z = a x^2 + b xy + c y^2 + d x + e y + f
to the ISS third-eigenvalue saliencies of a keypoint's 6 nearest neighbors
in a normal-aligned frame, take the analytic maximum of the paraboloid, and
accept it if it stays within the salient radius.

TPU re-design: the per-keypoint LSQ solve is a batched 6x6 normal-equations
solve; the rotation to the normal-aligned frame is the batched Rodrigues
rotation.  All keypoints refine in one shot.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

MIN_ANGLE = 0.04  # quadric.cpp:8


def rotation_to_align_z(normals: jax.Array) -> jax.Array:
    """calculateRotationToAlignZAxis (quadric.cpp:124-131), batched.

    Returns R f32[...,3,3] = AngleAxis(angle(z,n), z x n): the rotation that
    maps +z onto the normal (identity when nearly aligned).  Matching the
    reference, the caller rotates points by R for the planar fit and maps
    the result back with R^T."""
    n = normals / jnp.maximum(
        jnp.linalg.norm(normals, axis=-1, keepdims=True), 1e-30
    )
    z = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], n.dtype), n.shape)
    c = jnp.clip(jnp.sum(n * z, axis=-1), -1.0, 1.0)
    angle = jnp.arccos(c)
    axis = jnp.cross(z, n)
    an = jnp.linalg.norm(axis, axis=-1, keepdims=True)
    axis = axis / jnp.maximum(an, 1e-30)
    # Rodrigues about `axis` by `angle` -- note the reference builds
    # AngleAxis(angle, z x n) which rotates n to z for its use.
    ca = jnp.cos(angle)[..., None, None]
    sa = jnp.sin(angle)[..., None, None]
    zz = jnp.zeros_like(axis[..., 0])
    K = jnp.stack(
        [
            jnp.stack([zz, -axis[..., 2], axis[..., 1]], -1),
            jnp.stack([axis[..., 2], zz, -axis[..., 0]], -1),
            jnp.stack([-axis[..., 1], axis[..., 0], zz], -1),
        ],
        axis=-2,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=n.dtype), K.shape)
    outer = axis[..., :, None] * axis[..., None, :]
    R = ca * eye + sa * K + (1.0 - ca) * outer
    near = (jnp.abs(angle) < MIN_ANGLE)[..., None, None]
    return jnp.where(near, eye, R)


def fit_quadric_2d(xs, ys, values, mask):
    """LSQ coefficients of z = a x^2 + b xy + c y^2 + d x + e y + f.

    xs/ys/values/mask: f32[..., K].  Returns coefs f32[..., 6]."""
    one = jnp.ones_like(xs)
    A = jnp.stack([xs * xs, xs * ys, ys * ys, xs, ys, one], axis=-1)  # [...,K,6]
    w = mask.astype(xs.dtype)[..., None]
    Aw = A * w
    AtA = jnp.einsum("...ki,...kj->...ij", Aw, A, precision=jax.lax.Precision.HIGHEST)
    Atb = jnp.einsum("...ki,...k->...i", Aw, values, precision=jax.lax.Precision.HIGHEST)
    AtA = AtA + 1e-8 * jnp.eye(6, dtype=xs.dtype)
    return jnp.linalg.solve(AtA, Atb[..., None])[..., 0]


def quadric_maximum(coefs):
    """Analytic stationary point of the paraboloid (quadric.cpp:88-95).

    Returns ((x, y) f32[...,2], ok bool[...]) - ok when the 2x2 system is
    well conditioned."""
    a, b, c, d, e, _f = [coefs[..., i] for i in range(6)]
    det = 4.0 * a * c - b * b
    ok = jnp.abs(det) > 1e-20
    safe = jnp.where(ok, det, 1.0)
    x = (-2.0 * c * d + b * e) / safe
    y = (-2.0 * a * e + b * d) / safe
    return jnp.stack([x, y], axis=-1), ok


def subvoxel_keypoints(
    kp_xyz, kp_normal, nb_xyz, nb_saliency, nb_mask, salient_radius
):
    """estimateSubVoxelKeyPoints equivalent, batched over keypoints.

    kp_xyz f32[M,3]; kp_normal f32[M,3]; nb_xyz f32[M,K,3] (the keypoint's
    nearest neighbors, K>=6); nb_saliency f32[M,K] their ISS third
    eigenvalues; nb_mask bool[M,K].
    Returns (refined f32[M,3], ok bool[M]): refined keypoint positions;
    ok=False where the refinement left the salient radius (the reference
    then keeps/flags the original point)."""
    R = rotation_to_align_z(kp_normal)  # [M,3,3]
    rot = jnp.einsum("mij,mkj->mki", R, nb_xyz, precision=jax.lax.Precision.HIGHEST)
    xs, ys, zs = rot[..., 0], rot[..., 1], rot[..., 2]
    coefs = fit_quadric_2d(xs, ys, nb_saliency, nb_mask)
    mx, ok2 = quadric_maximum(coefs)
    # radius guard in the rotated plane (estimateRadius + containment check)
    x0 = jnp.where(nb_mask, xs, 0.0)
    y0 = jnp.where(nb_mask, ys, 0.0)
    # anchor = highest-saliency neighbor (placeCenterAtBeginning semantics)
    big = jnp.float32(-3.0e38)
    anchor = jnp.argmax(jnp.where(nb_mask, nb_saliency, big), axis=-1)
    ax = jnp.take_along_axis(xs, anchor[:, None], axis=1)[:, 0]
    ay = jnp.take_along_axis(ys, anchor[:, None], axis=1)[:, 0]
    rad2 = jnp.max(
        jnp.where(nb_mask, (xs - ax[:, None]) ** 2 + (ys - ay[:, None]) ** 2, 0.0),
        axis=-1,
    )
    inside = (mx[:, 0] - ax) ** 2 + (mx[:, 1] - ay) ** 2 < rad2
    # height from the quadric fit of the neighbor z-values at the maximum
    zcoefs = fit_quadric_2d(xs, ys, zs, nb_mask)
    a, b, c, d, e, f = [zcoefs[..., i] for i in range(6)]
    z = (
        a * mx[:, 0] ** 2
        + b * mx[:, 0] * mx[:, 1]
        + c * mx[:, 1] ** 2
        + d * mx[:, 0]
        + e * mx[:, 1]
        + f
    )
    refined_local = jnp.stack([mx[:, 0], mx[:, 1], z], axis=-1)
    refined = jnp.einsum("mji,mj->mi", R, refined_local)  # R^T local
    close = jnp.linalg.norm(refined - kp_xyz, axis=-1) < salient_radius
    ok = ok2 & inside & close
    refined = jnp.where(ok[:, None], refined, kp_xyz)
    return refined, ok
