"""Feature-scale FPFH surface (staged ISS path).

The reference pyramid computes each scale level's descriptors on a cloud
downsampled to voxel = sqrt(pi r^2 / n) with normals re-estimated at that
scale (matching.h:229-261, FEATURE_NR common.h:56).  The staged TPU path
mirrors this: ISS keypoints keep their exact positions, descriptors are
evaluated at each keypoint's voxel-centroid row of the per-scale surface.

Covers: the voxel_centroids_map row map (oracle), and end-to-end recall of
the staged path with the feature-scale surface engaged (dense cloud, force
interpret mode) vs disabled.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lidar_global_registration_tpu.ops.downsample import (
    voxel_centroids,
    voxel_centroids_map,
)


def test_voxel_centroids_map_oracle(rng):
    n = 3000
    xyz = rng.uniform(0, 4.0, (n, 3)).astype(np.float32)
    valid = rng.uniform(size=n) > 0.1
    voxel = 0.37
    ox, ov, row_of, n_small = voxel_centroids_map(
        jnp.asarray(xyz), jnp.asarray(valid), voxel
    )
    ox, ov, row_of = np.asarray(ox), np.asarray(ov), np.asarray(row_of)
    # oracle: bucket by integer voxel coordinate with the same origin rule
    origin = xyz[valid].min(axis=0) - 0.5 * voxel
    key = np.floor((xyz - origin) / voxel).astype(np.int64)
    buckets = {}
    for i in np.nonzero(valid)[0]:
        buckets.setdefault(tuple(key[i]), []).append(i)
    assert int(n_small) == len(buckets)
    assert int(ov.sum()) == len(buckets)
    for k, rows in buckets.items():
        r = row_of[rows[0]]
        # every member of the voxel maps to the same output row
        assert all(row_of[i] == r for i in rows)
        assert ov[r]
        np.testing.assert_allclose(
            ox[r], xyz[rows].mean(axis=0), rtol=1e-5, atol=1e-5
        )
    # same centroid SET as voxel_centroids (padding convention differs)
    vx, vv, cnt = voxel_centroids(jnp.asarray(xyz), jnp.asarray(valid), voxel)
    vx, vv = np.asarray(vx), np.asarray(vv)
    assert int(cnt) == len(buckets)
    got = {tuple(np.round(p, 4)) for p in ox[ov]}
    want = {tuple(np.round(p, 4)) for p in vx[vv]}
    assert got == want


def _scene(n, seed):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(0, 10.0, (n, 2)).astype(np.float32)
    z = np.zeros(n, np.float32)
    for cx, cy, h, w in ((2.5, 3.0, 1.0, 0.7), (7.0, 6.5, 1.4, 0.9),
                         (4.5, 8.0, 0.8, 0.6), (1.5, 7.5, 1.1, 0.5),
                         (8.2, 2.2, 0.9, 0.8)):
        m = (np.abs(xy[:, 0] - cx) < w) & (np.abs(xy[:, 1] - cy) < w)
        z = z + np.where(m, h, 0.0).astype(np.float32)
    rng2 = np.random.default_rng(99)
    for _ in range(25):
        cx, cy = rng2.uniform(1, 9, 2)
        h = rng2.uniform(0.1, 0.6)
        w = rng2.uniform(0.2, 0.5)
        d2 = (xy[:, 0] - cx) ** 2 + (xy[:, 1] - cy) ** 2
        z = z + (h * np.exp(-d2 / (2 * w * w))).astype(np.float32)
    return np.column_stack([xy, z]).astype(np.float32)


@pytest.mark.slow
def test_feature_scale_e2e_recall(monkeypatch, capsys):
    """Dense cloud (spacing well below the per-scale voxel): the
    feature-scale surface engages and the pair still registers with the
    correct pose."""
    monkeypatch.setenv("LGR_CELL_FPFH", "force")
    from lidar_global_registration_tpu.models.flagship import (
        FlagshipConfig,
        register_pair_staged,
    )

    n = 16384
    a = _scene(n, 3)
    b = _scene(n, 4)
    ang = 0.3
    R = np.array(
        [[np.cos(ang), -np.sin(ang), 0],
         [np.sin(ang), np.cos(ang), 0],
         [0, 0, 1]], np.float32,
    )
    t = np.array([1.5, -0.8, 0.2], np.float32)
    b = b @ R.T + t
    key = jax.random.PRNGKey(566)
    # feature radius 1.2 -> voxel_f = sqrt(pi 1.2^2/352) ~ 0.113 vs
    # spacing 10/sqrt(16384) ~ 0.078: the surface shrinks ~2x, fs engages
    args = (
        jnp.asarray(a), jnp.ones((n,), bool),
        jnp.asarray(b), jnp.ones((n,), bool), key,
        jnp.float32(0.4), jnp.float32(0.1), jnp.float32(0.1),
        jnp.float32(0.3), jnp.float32(0.3),
        jnp.float32(1.2), jnp.float32(0.4),
    )
    cfg = FlagshipConfig(use_iss=True, rounds=3, hypothesis_batch=256)
    out = register_pair_staged(*args, cfg=cfg)
    captured = capsys.readouterr()
    assert "-> classic masked path" not in captured.out, captured.out
    assert bool(out["converged"])
    T = np.asarray(out["transformation"])
    dR = T[:3, :3] @ R.T
    r_err = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
    assert r_err < 0.05, r_err
    assert np.linalg.norm(T[:3, 3] - t) < 0.3


@pytest.mark.slow
def test_feature_scale_shot_e2e_recall(monkeypatch, capsys):
    """Same dense scene with the reference's shipped descriptor: SHOT-352
    + gravity LRF evaluated on the per-scale surface (exact keypoint
    positions, per-scale normals + support)."""
    monkeypatch.setenv("LGR_CELL_FPFH", "force")
    from lidar_global_registration_tpu.models.flagship import (
        FlagshipConfig,
        register_pair_staged,
    )

    n = 16384
    a = _scene(n, 3)
    b = _scene(n, 4)
    ang = 0.3
    R = np.array(
        [[np.cos(ang), -np.sin(ang), 0],
         [np.sin(ang), np.cos(ang), 0],
         [0, 0, 1]], np.float32,
    )
    t = np.array([1.5, -0.8, 0.2], np.float32)
    b = b @ R.T + t
    key = jax.random.PRNGKey(566)
    args = (
        jnp.asarray(a), jnp.ones((n,), bool),
        jnp.asarray(b), jnp.ones((n,), bool), key,
        jnp.float32(0.4), jnp.float32(0.1), jnp.float32(0.1),
        jnp.float32(0.3), jnp.float32(0.3),
        jnp.float32(1.2), jnp.float32(0.4),
    )
    cfg = FlagshipConfig(
        use_iss=True, rounds=6, hypothesis_batch=512,
        descriptor="shot", lrf="gravity", metric="uniformity",
    )
    out = register_pair_staged(*args, cfg=cfg)
    captured = capsys.readouterr()
    assert "-> classic masked path" not in captured.out, captured.out
    assert bool(out["converged"])
    T = np.asarray(out["transformation"])
    dR = T[:3, :3] @ R.T
    r_err = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
    assert r_err < 0.05, r_err
    assert np.linalg.norm(T[:3, 3] - t) < 0.3
