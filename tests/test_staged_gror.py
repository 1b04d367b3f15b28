"""Staged-path GROR solver (alignment: gror).

The reference dispatches ransac | gror | teaser per AlignmentParameters
(alignment.cpp:72-110); gror runs the graph-reliability optimal search
with resolution = distance_thr (alignment.cpp:21-35).  The staged TPU
path exposes the same choice via FlagshipConfig.alignment: the front
(ISS -> descriptors -> cluster matching -> correspondences) is shared,
and the solver stage swaps prerejective RANSAC for gror.gror_solve over
the compacted correspondence set.

Covers: end-to-end recall of the staged ISS+FPFH+cluster+GROR
configuration (correct pose, converged), and shape-stability of
gror_solve (padded-row call yields the same pose as the exact-row call).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.test_feature_scale import _scene


def _pair(n):
    a = _scene(n, 3)
    b = _scene(n, 4)
    ang = 0.3
    R = np.array(
        [[np.cos(ang), -np.sin(ang), 0],
         [np.sin(ang), np.cos(ang), 0],
         [0, 0, 1]], np.float32,
    )
    t = np.array([1.5, -0.8, 0.2], np.float32)
    return a, (b @ R.T + t).astype(np.float32), R, t


@pytest.mark.slow
def test_staged_gror_e2e_recall(monkeypatch):
    monkeypatch.setenv("LGR_CELL_FPFH", "force")
    from lidar_global_registration_tpu.models.flagship import (
        FlagshipConfig,
        register_pair_staged,
    )

    n = 16384
    a, b, R, t = _pair(n)
    key = jax.random.PRNGKey(566)
    args = (
        jnp.asarray(a), jnp.ones((n,), bool),
        jnp.asarray(b), jnp.ones((n,), bool), key,
        jnp.float32(0.4), jnp.float32(0.1), jnp.float32(0.1),
        jnp.float32(0.3), jnp.float32(0.3),
        jnp.float32(1.2), jnp.float32(0.4),
    )
    cfg = FlagshipConfig(use_iss=True, rounds=3, hypothesis_batch=256,
                         alignment="gror")
    out = register_pair_staged(*args, cfg=cfg)
    assert bool(out["converged"])
    assert int(out["inliers"]) >= 10  # MIN_EDGE_ADJACENCY gate
    T = np.asarray(out["transformation"])
    dR = T[:3, :3] @ R.T
    r_err = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
    assert r_err < 0.05, r_err
    # GROR is the reference's INITIAL alignment (refine threshold is
    # 2*resolution = 0.8 here, ia_gror.hpp:261-365): gate translation by
    # the reference's own success criterion, error < distance_thr
    # (main.cpp:356), not by RANSAC-refit accuracy
    assert np.linalg.norm(T[:3, 3] - t) < 0.4


def test_gror_solve_padding_invariant(rng):
    """gror_solve on a padded correspondence set (invalid tail rows) must
    match the exact-length call bit-for-bit: padding is what keeps the
    staged path's compile shapes stable across repeats."""
    from lidar_global_registration_tpu.models.gror import gror_solve

    n = 120
    p = rng.uniform(0, 5.0, (n, 3)).astype(np.float32)
    ang = 0.7
    R = np.array(
        [[np.cos(ang), 0, np.sin(ang)],
         [0, 1, 0],
         [-np.sin(ang), 0, np.cos(ang)]], np.float32,
    )
    t = np.array([0.5, -1.0, 2.0], np.float32)
    q = p @ R.T + t
    # 30% outliers
    n_out = 36
    q[:n_out] = rng.uniform(0, 5.0, (n_out, 3)).astype(np.float32)
    res = 0.05

    exact = gror_solve(jnp.asarray(p), jnp.asarray(q),
                       jnp.ones((n,), bool), res)
    pad = 64
    pp = np.concatenate([p, np.full((pad, 3), 1e6, np.float32)])
    qp = np.concatenate([q, np.full((pad, 3), -1e6, np.float32)])
    vp = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
    padded = gror_solve(jnp.asarray(pp), jnp.asarray(qp),
                        jnp.asarray(vp), res)

    assert exact["converged"] and padded["converged"]
    assert exact["inliers"] == padded["inliers"] == n - n_out
    np.testing.assert_allclose(
        padded["transformation"], exact["transformation"], atol=1e-5
    )
    # and the pose is right
    T = exact["transformation"]
    dR = T[:3, :3] @ R.T
    r_err = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
    assert r_err < 1e-3
    assert np.linalg.norm(T[:3, 3] - t) < 1e-2
