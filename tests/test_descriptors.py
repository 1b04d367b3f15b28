"""Descriptor correctness properties.

- keypoint invariance (port of tests/keypoint_extraction.cpp): descriptors
  at a subset of points equal the same rows of descriptors at all points;
- rigid invariance: descriptors with self-estimated LRFs are invariant
  under a rigid motion of the scene;
- FPFH matches a direct NumPy oracle on a small cloud.
"""
import numpy as np
import jax.numpy as jnp

from lidar_global_registration_tpu.ops.fpfh import fpfh
from lidar_global_registration_tpu.ops.shot import shot
from lidar_global_registration_tpu.ops.rops import rops
from lidar_global_registration_tpu.ops.usc import usc


def bumpy_cloud(rng, n=800, extent=10.0):
    xy = rng.uniform(0, extent, size=(n, 2))
    z = np.zeros(n)
    for _ in range(8):
        c = rng.uniform(0, extent, size=2)
        w = rng.uniform(0.5, 2.0)
        h = rng.uniform(-1.5, 1.5)
        z += h * np.exp(-np.sum((xy - c) ** 2, axis=1) / (2 * w * w))
    return np.column_stack([xy, z]).astype(np.float32)


def normals_for(xyz):
    from lidar_global_registration_tpu.types import Cloud
    from lidar_global_registration_tpu.ops.normals import estimate_normals_knn

    cloud = Cloud.from_numpy(xyz, capacity=len(xyz))
    out = estimate_normals_knn(cloud, k=12)
    return np.asarray(out.normal)


def random_rigid(rng):
    Q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    t = rng.normal(size=3) * 3
    return Q.astype(np.float32), t.astype(np.float32)


def test_shot_keypoint_invariance(rng):
    xyz = bumpy_cloud(rng, 512)
    nrm = normals_for(xyz)
    v = jnp.ones(len(xyz), bool)
    radius = 1.5
    d_all, ok_all = shot(jnp.asarray(xyz), v, jnp.asarray(xyz), jnp.asarray(nrm), v, radius)
    sub = np.arange(0, 512, 7)
    d_sub, ok_sub = shot(
        jnp.asarray(xyz[sub]), jnp.ones(len(sub), bool),
        jnp.asarray(xyz), jnp.asarray(nrm), v, radius,
    )
    np.testing.assert_array_equal(np.asarray(ok_all)[sub], np.asarray(ok_sub))
    np.testing.assert_allclose(
        np.asarray(d_all)[sub], np.asarray(d_sub), atol=1e-5
    )


def test_shot_rigid_invariance(rng):
    xyz = bumpy_cloud(rng, 512)
    nrm = normals_for(xyz)
    R, t = random_rigid(rng)
    xyz2 = xyz @ R.T + t
    nrm2 = nrm @ R.T
    v = jnp.ones(len(xyz), bool)
    radius = 1.5
    d1, ok1 = shot(jnp.asarray(xyz), v, jnp.asarray(xyz), jnp.asarray(nrm), v, radius)
    d2, ok2 = shot(jnp.asarray(xyz2), v, jnp.asarray(xyz2), jnp.asarray(nrm2), v, radius)
    ok = np.asarray(ok1) & np.asarray(ok2)
    # L2 distance between corresponding descriptors must be tiny vs typical
    # inter-descriptor distance
    dd = np.linalg.norm(np.asarray(d1)[ok] - np.asarray(d2)[ok], axis=1)
    assert np.quantile(dd, 0.9) < 0.05, np.quantile(dd, [0.5, 0.9, 0.99])


def test_fpfh_rigid_invariance(rng):
    xyz = bumpy_cloud(rng, 512)
    nrm = normals_for(xyz)
    R, t = random_rigid(rng)
    xyz2 = (xyz @ R.T + t).astype(np.float32)
    nrm2 = nrm @ R.T
    v = jnp.ones(len(xyz), bool)
    radius = 1.5
    d1, _ = fpfh(jnp.asarray(xyz), v, jnp.asarray(xyz), jnp.asarray(nrm), v, radius,
                 kp_normal=jnp.asarray(nrm))
    d2, _ = fpfh(jnp.asarray(xyz2), v, jnp.asarray(xyz2), jnp.asarray(nrm2), v, radius,
                 kp_normal=jnp.asarray(nrm2))
    dd = np.linalg.norm(np.asarray(d1) - np.asarray(d2), axis=1)
    scale = np.linalg.norm(np.asarray(d1), axis=1).mean()
    assert np.quantile(dd, 0.9) < 0.02 * scale


def test_rops_usc_run_and_rigid_invariance(rng):
    xyz = bumpy_cloud(rng, 384)
    v = jnp.ones(len(xyz), bool)
    radius = 2.0
    R, t = random_rigid(rng)
    xyz2 = (xyz @ R.T + t).astype(np.float32)
    d1, ok1 = rops(jnp.asarray(xyz), v, jnp.asarray(xyz), v, radius)
    d2, ok2 = rops(jnp.asarray(xyz2), v, jnp.asarray(xyz2), v, radius)
    assert d1.shape == (len(xyz), 135)
    ok = np.asarray(ok1) & np.asarray(ok2)
    assert ok.sum() > 300
    dd = np.linalg.norm(np.asarray(d1)[ok] - np.asarray(d2)[ok], axis=1)
    scale = np.linalg.norm(np.asarray(d1)[ok], axis=1).mean()
    assert np.quantile(dd, 0.9) < 0.05 * scale, np.quantile(dd, [0.5, 0.9])

    u1, uok1 = usc(jnp.asarray(xyz), v, jnp.asarray(xyz), v, radius)
    u2, uok2 = usc(jnp.asarray(xyz2), v, jnp.asarray(xyz2), v, radius)
    assert u1.shape == (len(xyz), 1960)
    ok = np.asarray(uok1) & np.asarray(uok2)
    dd = np.linalg.norm(np.asarray(u1)[ok] - np.asarray(u2)[ok], axis=1)
    # USC is raw-weight (PCL never normalizes it): gate relative to scale
    uscale = np.linalg.norm(np.asarray(u1)[ok], axis=1).mean()
    assert np.quantile(dd, 0.9) < 0.1 * uscale, np.quantile(dd, [0.5, 0.9])


def test_fpfh_pair_features_oracle(rng):
    """pair_features against a literal NumPy reimplementation."""
    from lidar_global_registration_tpu.ops.fpfh import pair_features

    p1 = rng.normal(size=(100, 3)).astype(np.float32)
    p2 = rng.normal(size=(100, 3)).astype(np.float32)
    n1 = rng.normal(size=(100, 3)).astype(np.float32)
    n2 = rng.normal(size=(100, 3)).astype(np.float32)
    n1 /= np.linalg.norm(n1, axis=1, keepdims=True)
    n2 /= np.linalg.norm(n2, axis=1, keepdims=True)
    f1, f2, f3, ok = pair_features(
        jnp.asarray(p1), jnp.asarray(n1), jnp.asarray(p2), jnp.asarray(n2)
    )
    f1, f2, f3, ok = map(np.asarray, (f1, f2, f3, ok))
    for i in range(100):
        dp = p2[i] - p1[i]
        d = np.linalg.norm(dp)
        a1 = np.dot(n1[i], dp) / d
        a2 = np.dot(n2[i], dp) / d
        if np.arccos(np.abs(np.clip(a1, -1, 1))) > np.arccos(np.abs(np.clip(a2, -1, 1))):
            ns, nt, dps, ref3 = n2[i], n1[i], -dp, a2
        else:
            ns, nt, dps, ref3 = n1[i], n2[i], dp, a1
        vv = np.cross(dps, ns)
        vn = np.linalg.norm(vv)
        if vn < 1e-12:
            assert not ok[i]
            continue
        vv /= vn
        ww = np.cross(ns, vv)
        ref2 = np.dot(vv, nt)
        ref1 = np.arctan2(np.dot(ww, nt), np.dot(ns, nt))
        assert abs(f3[i] - ref3) < 1e-5
        assert abs(f2[i] - ref2) < 1e-5
        assert abs(f1[i] - ref1) < 1e-5
