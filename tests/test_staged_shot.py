"""Staged ISS+SHOT+cluster configuration (the reference's SHIPPED regime:
`descriptor: shot, lrf: gravity, matching: cluster` — data/tests.yaml).

The staged path computes SHOT-352 only at the compacted keypoint rows
(flagship._shot_stage) with gravity frames + SHOT-LRF fallback; this must
register the boxy fixture end-to-end.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lidar_global_registration_tpu.models.flagship import (
    FlagshipConfig,
    register_pair_staged,
)
from lidar_global_registration_tpu.ops.transform import rotation_translation_error


@pytest.mark.slow
def test_staged_iss_shot_cluster_registers():
    from __graft_entry__ import _synthetic_scene_pair

    n = 16384
    a, b, vp_a, vp_b = _synthetic_scene_pair(n)
    spacing = float(np.sqrt(1150.0 / n))
    cfg = FlagshipConfig(
        rounds=16, hypothesis_batch=512, use_iss=True, cluster_matching=True,
        descriptor="shot", lrf="gravity", metric="uniformity",
    )
    out = register_pair_staged(
        jnp.asarray(a), jnp.ones((n,), bool), jnp.asarray(b), jnp.ones((n,), bool),
        jax.random.PRNGKey(566),
        jnp.float32(spacing * 4.0), jnp.float32(spacing * 2.0),
        jnp.float32(spacing * 2.0), jnp.float32(spacing * 3.0),
        jnp.float32(spacing * 3.0), jnp.float32(spacing * 8.0),
        jnp.float32(spacing * 4.0),
        cfg=cfg,
        vp_src=jnp.asarray(vp_a), vp_tgt=jnp.asarray(vp_b),
    )
    ang = 0.4
    R = np.array(
        [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]],
        np.float32,
    )
    t = np.array([2.0, -1.0, 0.5], np.float32)
    T_gt = np.eye(4, dtype=np.float32)
    T_gt[:3, :3] = R.T
    T_gt[:3, 3] = -R.T @ t
    assert bool(out["converged"])
    r_err, t_err = rotation_translation_error(
        jnp.asarray(out["transformation"]), jnp.asarray(T_gt)
    )
    assert float(r_err) < 0.03, float(r_err)
    assert float(t_err) < 8.0 * spacing, float(t_err)
