"""Closed-form symmetric 3x3 eigendecomposition, batched and VPU-friendly.

The reference leans on Eigen's iterative solvers inside PCL (normal
estimation, ISS saliency, SHOT LRF).  On TPU we want a branch-free closed
form that vmaps over millions of points: eigenvalues via the trigonometric
(Smith) method, eigenvectors via cross products of rows of (A - lambda I)
with soft pivoting.  Everything is f32 with a scale-normalization prologue
for conditioning.

No reference code is reused; the algorithms are the textbook closed forms.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-20


def eigvals_sym3(A: jax.Array) -> jax.Array:
    """Eigenvalues of symmetric 3x3 matrices, ascending.

    A: f32[..., 3, 3] (assumed symmetric). Returns f32[..., 3] with
    eig[..., 0] <= eig[..., 1] <= eig[..., 2].
    """
    # Scale for conditioning.
    scale = jnp.maximum(jnp.max(jnp.abs(A), axis=(-2, -1)), _EPS)
    B = A / scale[..., None, None]

    a00 = B[..., 0, 0]
    a11 = B[..., 1, 1]
    a22 = B[..., 2, 2]
    a01 = B[..., 0, 1]
    a02 = B[..., 0, 2]
    a12 = B[..., 1, 2]

    q = (a00 + a11 + a22) / 3.0
    p1 = a01 * a01 + a02 * a02 + a12 * a12
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = b00 * b00 + b11 * b11 + b22 * b22 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 0.0))

    safe_p = jnp.maximum(p, _EPS)
    c00, c11, c22 = b00 / safe_p, b11 / safe_p, b22 / safe_p
    c01, c02, c12 = a01 / safe_p, a02 / safe_p, a12 / safe_p
    detC = (
        c00 * (c11 * c22 - c12 * c12)
        - c01 * (c01 * c22 - c12 * c02)
        + c02 * (c01 * c12 - c11 * c02)
    )
    r = jnp.clip(detC / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0

    e_hi = q + 2.0 * p * jnp.cos(phi)
    e_lo = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e_mid = 3.0 * q - e_hi - e_lo

    # Diagonal / isotropic case: p ~ 0 -> all eigenvalues = q.
    is_iso = p <= _EPS
    e_hi = jnp.where(is_iso, q, e_hi)
    e_mid = jnp.where(is_iso, q, e_mid)
    e_lo = jnp.where(is_iso, q, e_lo)

    eig = jnp.stack([e_lo, e_mid, e_hi], axis=-1) * scale[..., None]
    return eig


def _eigvec_for(B: jax.Array, lam: jax.Array) -> jax.Array:
    """Eigenvector for eigenvalue lam of symmetric B[...,3,3] (unit scale).

    Uses the largest cross product of rows of (B - lam I); falls back to a
    canonical axis orthogonalized against the strongest row if degenerate.
    """
    M = B - lam[..., None, None] * jnp.eye(3, dtype=B.dtype)
    r0, r1, r2 = M[..., 0, :], M[..., 1, :], M[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, axis=-1)
    n02 = jnp.sum(c02 * c02, axis=-1)
    n12 = jnp.sum(c12 * c12, axis=-1)
    ns = jnp.stack([n01, n02, n12], axis=-1)
    cs = jnp.stack([c01, c02, c12], axis=-2)
    best = jnp.argmax(ns, axis=-1)
    v = jnp.take_along_axis(cs, best[..., None, None], axis=-2)[..., 0, :]
    nbest = jnp.take_along_axis(ns, best[..., None], axis=-1)[..., 0]

    # Degenerate fallback: eigenspace has dim >= 2.  Any vector orthogonal to
    # the strongest row of M works; if M ~ 0 entirely, return +z.
    rn = jnp.stack(
        [
            jnp.sum(r0 * r0, axis=-1),
            jnp.sum(r1 * r1, axis=-1),
            jnp.sum(r2 * r2, axis=-1),
        ],
        axis=-1,
    )
    ridx = jnp.argmax(rn, axis=-1)
    rbest = jnp.take_along_axis(M, ridx[..., None, None], axis=-2)[..., 0, :]
    rbn = jnp.take_along_axis(rn, ridx[..., None], axis=-1)[..., 0]
    # Orthogonalize x-axis (or y if parallel) against rbest.
    ex = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], B.dtype), rbest.shape)
    ey = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], B.dtype), rbest.shape)
    cx = jnp.cross(rbest, ex)
    cy = jnp.cross(rbest, ey)
    use_y = jnp.sum(cx * cx, axis=-1) < jnp.sum(cy * cy, axis=-1)
    fall = jnp.where(use_y[..., None], cy, cx)
    ez = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], B.dtype), rbest.shape)
    fall = jnp.where((rbn <= _EPS)[..., None], ez, fall)

    v = jnp.where((nbest <= _EPS * 10.0)[..., None], fall, v)
    norm = jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), _EPS))
    return v / norm


def eigh_sym3(A: jax.Array):
    """Full symmetric 3x3 eigendecomposition.

    Returns (eigvals f32[...,3] ascending, eigvecs f32[...,3,3]) where
    eigvecs[..., :, k] is the unit eigenvector for eigvals[..., k].
    """
    scale = jnp.maximum(jnp.max(jnp.abs(A), axis=(-2, -1)), _EPS)
    B = A / scale[..., None, None]
    eig = eigvals_sym3(A) / scale[..., None]

    v2 = _eigvec_for(B, eig[..., 2])
    v0 = _eigvec_for(B, eig[..., 0])
    # Orthogonalize v0 against v2; if they collapsed (fully degenerate
    # matrices), substitute the canonical axis least aligned with v2.
    v0 = v0 - jnp.sum(v0 * v2, axis=-1, keepdims=True) * v2
    n0sq = jnp.sum(v0 * v0, axis=-1)
    axis = jnp.argmin(jnp.abs(v2), axis=-1)
    e = jax.nn.one_hot(axis, 3, dtype=B.dtype)
    alt = e - jnp.sum(e * v2, axis=-1, keepdims=True) * v2
    v0 = jnp.where((n0sq <= 1e-12)[..., None], alt, v0)
    n0 = jnp.sqrt(jnp.maximum(jnp.sum(v0 * v0, axis=-1, keepdims=True), _EPS))
    v0 = v0 / n0
    v1 = jnp.cross(v2, v0)
    n1 = jnp.sqrt(jnp.maximum(jnp.sum(v1 * v1, axis=-1, keepdims=True), _EPS))
    v1 = v1 / n1

    V = jnp.stack([v0, v1, v2], axis=-1)
    return eig * scale[..., None], V


def smallest_eigvec_sym3(A: jax.Array):
    """(eigenvalue, unit eigenvector) of the smallest eigenvalue. Cheap path
    for normal estimation: avoids computing the other two eigenvectors."""
    scale = jnp.maximum(jnp.max(jnp.abs(A), axis=(-2, -1)), _EPS)
    B = A / scale[..., None, None]
    eig = eigvals_sym3(A) / scale[..., None]
    v = _eigvec_for(B, eig[..., 0])
    return eig * scale[..., None], v
