import numpy as np

from lidar_global_registration_tpu.types import Cloud
from lidar_global_registration_tpu.ops.normals import estimate_normals_knn


def test_plane_normals(rng):
    # Points on z=0 plane: normals must be +/- z, oriented toward viewpoint.
    pts = rng.uniform(0, 10, size=(400, 2)).astype(np.float32)
    pts = np.concatenate([pts, np.zeros((400, 1), np.float32)], axis=1)
    cloud = Cloud.from_numpy(pts)
    out = estimate_normals_knn(cloud, k=10, viewpoint=np.array([0, 0, 100.0]))
    v = np.asarray(out.valid)
    n = np.asarray(out.normal)[v]
    np.testing.assert_allclose(np.abs(n[:, 2]), 1.0, atol=1e-3)
    assert (n[:, 2] > 0).all()  # oriented to viewpoint
    c = np.asarray(out.curvature)[v]
    assert np.all(c < 1e-3)


def test_sphere_normals(rng):
    # Points on a unit sphere: normal ~ radial direction.
    x = rng.normal(size=(2000, 3)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    cloud = Cloud.from_numpy(x)
    out = estimate_normals_knn(cloud, k=16, viewpoint=np.array([0.0, 0, 0]))
    v = np.asarray(out.valid)
    n = np.asarray(out.normal)[v]
    cos = np.abs(np.sum(n * x, axis=1))
    assert np.quantile(cos, 0.05) > 0.95
    # viewpoint at center: normals point inward (toward vp)
    assert (np.sum(n * x, axis=1) < 0).mean() > 0.95


def test_file_normal_orientation(rng):
    pts = rng.uniform(0, 5, size=(200, 2)).astype(np.float32)
    pts = np.concatenate([pts, np.zeros((200, 1), np.float32)], axis=1)
    file_n = np.tile(np.array([[0, 0, -1.0]], np.float32), (200, 1))
    cloud = Cloud.from_numpy(pts, normal=file_n)
    out = estimate_normals_knn(
        cloud, k=10, viewpoint=np.array([0, 0, 100.0]), normals_available=True
    )
    v = np.asarray(out.valid)
    n = np.asarray(out.normal)[v]
    # file normals say -z; estimates flipped to agree with the file
    assert (n[:, 2] < 0).all()
