"""Multi-chip coverage of the reference's SHIPPED regime (VERDICT r3 #2):
ISS + SHOT-352 + gravity LRF + cluster consensus + uniformity metric
(data/tests.yaml: descriptor shot, lrf gravity, matching cluster, metric
uniformity) through the dp x tp sharded batch step — and exact parity with
the single-device register_pair_step at equal N, since the tp pipeline is a
pure re-tiling of the same math."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.test_flagship_parallel import _args
from tests.test_tp_feature_sharding import _run_mesh
from lidar_global_registration_tpu.models.flagship import (
    MIN_NR_INLIERS,
    FlagshipConfig,
    register_pair_step,
)
from __graft_entry__ import _synthetic_scene_pair


def _scene_args(n, seed=566):
    """Returns (step args, (vp_src, vp_tgt)) — the scanner viewpoints matter:
    without them normal orientation flips inconsistently between the sides,
    which flips SHOT's cos(normal, z) bins and the gravity frames."""
    a, b, vp_a, vp_b = _synthetic_scene_pair(n, seed=seed)
    spacing = 30.0 / np.sqrt(n)
    return (
        jnp.asarray(a),
        jnp.ones((n,), bool),
        jnp.asarray(b),
        jnp.ones((n,), bool),
        jax.random.PRNGKey(566),
        jnp.float32(spacing * 4.0),
        jnp.float32(spacing * 2.0),
        jnp.float32(spacing * 2.0),
        jnp.float32(spacing * 3.0),
        jnp.float32(spacing * 3.0),
        jnp.float32(spacing * 8.0),
        jnp.float32(spacing * 4.0),
    ), (vp_a, vp_b)


def test_tp2_shot_cluster_matches_single_device():
    """tp=2 sharded ISS+SHOT+gravity+cluster+uniformity == single device."""
    n = 2048
    cfg = FlagshipConfig(
        rounds=8, hypothesis_batch=256, use_iss=True,
        descriptor="shot", lrf="gravity", metric="uniformity",
    )
    args, vps = _scene_args(n)
    out = register_pair_step(
        *args, vp_src=jnp.asarray(vps[0]), vp_tgt=jnp.asarray(vps[1]), cfg=cfg
    )
    T1 = np.asarray(out["transformation"])
    T2, inl2, nc2 = _run_mesh(args, cfg, tp=2, vps=vps)
    for b in range(T2.shape[0]):
        np.testing.assert_allclose(T2[b], T1, atol=1e-5)
        assert int(nc2[b]) == int(out["n_correspondences"])
        assert int(inl2[b]) == int(out["inliers"])


@pytest.mark.slow
def test_single_device_shot_cluster_registers_scene():
    """The shipped regime REGISTERS the box+mound scene at 16k points:
    converged pose within derived-threshold bounds of the known GT.
    16k is the recall floor of this scene for SHOT at keypoints (~800
    points per structure; 8k leaves 1-NN precision under what RANSAC can
    use — measured 9/232 correct matches at 8k vs convergence at 16k)."""
    n = 16384
    spacing = 30.0 / np.sqrt(n)
    cfg = FlagshipConfig(
        rounds=16, hypothesis_batch=256, use_iss=True,
        descriptor="shot", lrf="gravity", metric="uniformity",
    )
    args, vps = _scene_args(n)
    out = register_pair_step(
        *args, vp_src=jnp.asarray(vps[0]), vp_tgt=jnp.asarray(vps[1]), cfg=cfg
    )
    assert bool(out["converged"])
    assert int(out["inliers"]) > MIN_NR_INLIERS
    T = np.asarray(out["transformation"])
    ang = 0.4
    Rgt = np.array(
        [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]],
        np.float32,
    ).T
    tgt_t = -Rgt @ np.array([2.0, -1.0, 0.5], np.float32)
    dR = T[:3, :3] @ Rgt.T
    r_err = float(np.arccos(np.clip((np.trace(dR) - 1.0) / 2.0, -1.0, 1.0)))
    t_err = float(np.linalg.norm(T[:3, 3] - tgt_t))
    assert r_err < 0.03, r_err
    # keypoint-based registration localizes to keypoint spacing: gate at
    # the derived distance_thr like the reference's own success criterion
    # (overlap_error < distance_thr, main.cpp:356)
    assert t_err < 4.0 * spacing, (t_err, spacing)
