import numpy as np
import jax.numpy as jnp

from lidar_global_registration_tpu.ops.quadric import (
    fit_quadric_2d,
    quadric_maximum,
    rotation_to_align_z,
)
from lidar_global_registration_tpu.ops.weights import weight_function
from lidar_global_registration_tpu.types import Cloud


def test_quadric_fit_and_maximum(rng):
    # z = -(x-1)^2 - 2(y+0.5)^2 + 3 has maximum at (1, -0.5)
    xs = rng.uniform(-3, 3, size=(1, 16)).astype(np.float32)
    ys = rng.uniform(-3, 3, size=(1, 16)).astype(np.float32)
    zs = -((xs - 1.0) ** 2) - 2.0 * (ys + 0.5) ** 2 + 3.0
    mask = jnp.ones((1, 16), bool)
    coefs = fit_quadric_2d(jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(zs), mask)
    mx, ok = quadric_maximum(coefs)
    assert bool(ok[0])
    np.testing.assert_allclose(np.asarray(mx)[0], [1.0, -0.5], atol=1e-3)


def test_rotation_to_align_z(rng):
    n = rng.normal(size=(64, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    R = np.asarray(rotation_to_align_z(jnp.asarray(n)))
    # reference convention: R maps +z onto the normal
    z = np.tile(np.array([0.0, 0.0, 1.0], np.float32), (len(n), 1))
    mapped = np.einsum("mij,mj->mi", R, z)
    cos = np.sum(mapped * n, axis=1)
    assert (cos > 0.999).mean() > 0.95


def test_subvoxel_keypoints_synthetic(rng):
    """Saliency peaked off-grid: refinement should move toward the peak."""
    from lidar_global_registration_tpu.ops.quadric import subvoxel_keypoints

    peak = np.array([0.3, -0.2, 0.0], np.float32)
    grid = np.array(
        [[i, j, 0.0] for i in (-1, 0, 1) for j in (-1, 0, 1)], np.float32
    )
    sal = 5.0 - np.sum((grid[:, :2] - peak[:2]) ** 2, axis=1)
    kp = jnp.asarray(np.zeros((1, 3), np.float32))
    normal = jnp.asarray(np.array([[0, 0, 1.0]], np.float32))
    refined, ok = subvoxel_keypoints(
        kp,
        normal,
        jnp.asarray(grid[None]),
        jnp.asarray(sal[None].astype(np.float32)),
        jnp.ones((1, 9), bool),
        salient_radius=2.0,
    )
    assert bool(ok[0])
    np.testing.assert_allclose(np.asarray(refined)[0, :2], peak[:2], atol=1e-3)


def test_weight_functions(rng):
    # plane + bump: curvature-based weights should be higher near the bump
    xy = rng.uniform(-5, 5, size=(600, 2)).astype(np.float32)
    z = 2.0 * np.exp(-np.sum(xy**2, axis=1) / 2.0)
    xyz = np.column_stack([xy, z]).astype(np.float32)
    from lidar_global_registration_tpu.ops.normals import estimate_normals_knn

    cloud = estimate_normals_knn(Cloud.from_numpy(xyz), k=12)
    v = np.asarray(cloud.valid)
    near = np.linalg.norm(xy, axis=1) < 1.5
    far = np.linalg.norm(xy, axis=1) > 4.0

    w_const = np.asarray(weight_function("constant", 12, cloud))
    np.testing.assert_array_equal(w_const[v][: len(xy)], 1.0)

    for wid in ("curvedness", "tomasi", "curvature", "exp_curvature"):
        w = np.asarray(weight_function(wid, 12, cloud))[: len(xy)]
        assert np.isfinite(w).all(), wid
        assert w[near].mean() > w[far].mean(), (wid, w[near].mean(), w[far].mean())

    w_nss = np.asarray(weight_function("nss", 12, cloud))[: len(xy)]
    # NSS: rare normal directions (bump flanks) get higher weight than the
    # dominant up-facing plane normals
    assert w_nss[near].mean() > w_nss[far].mean()
    w_harris = np.asarray(weight_function("harris", 12, cloud))[: len(xy)]
    assert np.isfinite(w_harris).all()
