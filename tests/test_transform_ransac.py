import numpy as np
import jax.numpy as jnp

from lidar_global_registration_tpu.types import AlignmentParameters, Cloud, Correspondences
from lidar_global_registration_tpu.ops.transform import (
    kabsch,
    rotation_translation_error,
    to_matrix4,
)
from lidar_global_registration_tpu.models.ransac import align_ransac


def random_rigid(rng):
    A = rng.normal(size=(3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    t = rng.normal(size=3) * 5
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = Q
    T[:3, 3] = t
    return T


def test_kabsch_exact(rng):
    T = random_rigid(rng)
    p = rng.normal(size=(50, 3)).astype(np.float32)
    q = p @ T[:3, :3].T + T[:3, 3]
    R, t = kabsch(jnp.asarray(p), jnp.asarray(q))
    np.testing.assert_allclose(np.asarray(R), T[:3, :3], atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), T[:3, 3], atol=1e-4)


def test_kabsch_batched_weighted(rng):
    B = 16
    Ts = np.stack([random_rigid(rng) for _ in range(B)])
    p = rng.normal(size=(B, 30, 3)).astype(np.float32)
    q = np.einsum("bij,bnj->bni", Ts[:, :3, :3], p) + Ts[:, None, :3, 3]
    # corrupt masked-out points; weights must ignore them
    w = np.ones((B, 30), np.float32)
    w[:, 25:] = 0.0
    q[:, 25:] += 100.0
    R, t = kabsch(jnp.asarray(p), jnp.asarray(q.astype(np.float32)), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(R), Ts[:, :3, :3], atol=2e-3)
    np.testing.assert_allclose(np.asarray(t), Ts[:, :3, 3], atol=2e-3)


def test_kabsch_3point(rng):
    # minimal 3-point samples, the RANSAC hot path
    T = random_rigid(rng)
    p = rng.normal(size=(128, 3, 3)).astype(np.float32)
    q = np.einsum("ij,bnj->bni", T[:3, :3], p) + T[:3, 3]
    R, t = kabsch(jnp.asarray(p), jnp.asarray(q.astype(np.float32)))
    np.testing.assert_allclose(np.asarray(R), np.broadcast_to(T[:3, :3], (128, 3, 3)), atol=5e-3)


def test_rotation_translation_error():
    T1 = np.eye(4, dtype=np.float32)
    ang = 0.3
    T2 = np.eye(4, dtype=np.float32)
    T2[:3, :3] = np.array(
        [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]]
    )
    T2[:3, 3] = [1, 2, 2]
    r, t = rotation_translation_error(jnp.asarray(T1), jnp.asarray(T2))
    np.testing.assert_allclose(float(r), ang, atol=1e-5)
    np.testing.assert_allclose(float(t), 3.0, atol=1e-5)


def _make_corr_problem(rng, n_inliers=80, n_outliers=40):
    T = random_rigid(rng)
    src_pts = rng.uniform(-5, 5, size=(n_inliers + n_outliers, 3)).astype(np.float32)
    tgt_pts = (src_pts @ T[:3, :3].T + T[:3, 3]).astype(np.float32)
    # corrupt outlier correspondences: match wrong targets
    perm = rng.permutation(n_outliers) + n_inliers
    match = np.arange(n_inliers + n_outliers)
    match[n_inliers:] = perm
    while np.any(match[n_inliers:] == np.arange(n_inliers, n_inliers + n_outliers)):
        rng.shuffle(match[n_inliers:])
    src = Cloud.from_numpy(src_pts)
    tgt = Cloud.from_numpy(tgt_pts)
    M = 128
    corrs = Correspondences(
        query=jnp.asarray(np.pad(np.arange(n_inliers + n_outliers), (0, M - n_inliers - n_outliers)).astype(np.int32)),
        match=jnp.asarray(np.pad(match, (0, M - len(match))).astype(np.int32)),
        distance=jnp.zeros((M,), jnp.float32),
        threshold=jnp.full((M,), 0.1, jnp.float32),
        valid=jnp.asarray(np.arange(M) < n_inliers + n_outliers),
    )
    return T, src, tgt, corrs


def test_ransac_correspondences_metric(rng):
    T, src, tgt, corrs = _make_corr_problem(rng)
    params = AlignmentParameters(
        metric_id="correspondences",
        score_id="constant",
        distance_thr=0.1,
        max_iterations=4096,
        hypothesis_batch=256,
    )
    res = align_ransac(src, tgt, corrs, params)
    assert res.converged
    r_err, t_err = rotation_translation_error(
        jnp.asarray(res.transformation), jnp.asarray(T)
    )
    assert float(r_err) < 1e-2, float(r_err)
    assert float(t_err) < 5e-2, float(t_err)


def test_ransac_uniformity_metric(rng):
    T, src, tgt, corrs = _make_corr_problem(rng)
    params = AlignmentParameters(
        metric_id="uniformity",
        distance_thr=0.1,
        max_iterations=2048,
        hypothesis_batch=256,
    )
    res = align_ransac(src, tgt, corrs, params)
    r_err, t_err = rotation_translation_error(
        jnp.asarray(res.transformation), jnp.asarray(T)
    )
    assert float(r_err) < 1e-2
    assert float(t_err) < 5e-2
