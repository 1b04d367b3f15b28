"""Flagship jittable step + dp/tp sharded batch (virtual 8-device mesh)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __graft_entry__ import _synthetic_pair  # noqa: E402
from lidar_global_registration_tpu.models.flagship import (  # noqa: E402
    FlagshipConfig,
    register_pair_step,
)


def _args(n, cfg_seed=566):
    a, b = _synthetic_pair(n, seed=cfg_seed)
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
    )


@pytest.mark.slow
def test_flagship_registers_synthetic_pair():
    n = 2048
    cfg = FlagshipConfig(rounds=8, hypothesis_batch=512, use_iss=False)
    out = register_pair_step(*_args(n), cfg=cfg)
    assert bool(out["converged"])
    T = np.asarray(out["transformation"])
    ang = 0.4
    # ground truth: x_b = R^T (x_a - t)
    R = np.array(
        [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]],
        np.float32,
    )
    cos_err = (np.trace(T[:3, :3] @ R) - 1.0) / 2.0  # angle of T R (T ~ R^T)
    assert cos_err > np.cos(np.deg2rad(3.0)), T


def test_flagship_deterministic():
    n = 512
    cfg = FlagshipConfig(rounds=2, hypothesis_batch=128, use_iss=False)
    o1 = register_pair_step(*_args(n), cfg=cfg)
    o2 = register_pair_step(*_args(n), cfg=cfg)
    np.testing.assert_array_equal(
        np.asarray(o1["transformation"]), np.asarray(o2["transformation"])
    )


def test_flagship_query_chunking_invariant():
    n = 512
    base = FlagshipConfig(rounds=2, hypothesis_batch=128, use_iss=True)
    chunked = FlagshipConfig(rounds=2, hypothesis_batch=128, use_iss=True, query_chunk=128)
    o1 = register_pair_step(*_args(n), cfg=base)
    o2 = register_pair_step(*_args(n), cfg=chunked)
    np.testing.assert_allclose(
        np.asarray(o1["transformation"]), np.asarray(o2["transformation"]), atol=1e-5
    )
    assert int(o1["n_correspondences"]) == int(o2["n_correspondences"])


@pytest.mark.slow
def test_dryrun_multichip_8dev():
    from __graft_entry__ import dryrun_multichip

    assert len(jax.devices()) >= 8
    dryrun_multichip(8)


def test_staged_keypoint_compaction_matches_monolithic(rng):
    """With sparse ISS keypoints the staged path compacts descriptor rows
    before matching (M x M matmul instead of N x N); results must be
    identical to the monolithic full-matrix step."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from lidar_global_registration_tpu.models.flagship import (
        FlagshipConfig,
        register_pair_staged,
        register_pair_step,
    )

    # boxy scene: ISS actually fires (smooth terrain starves it)
    def scene(seed):
        r = np.random.default_rng(seed)
        g = np.column_stack([r.uniform(0, 8, 2600), r.uniform(0, 8, 2600), np.zeros(2600)])
        o, s = np.array([3.0, 3.0, 0.0]), np.array([1.5, 1.0, 1.2])
        faces = []
        for eu, ev, off in [
            ([s[0], 0, 0], [0, 0, s[2]], [0, 0, 0]),
            ([s[0], 0, 0], [0, 0, s[2]], [0, s[1], 0]),
            ([0, s[1], 0], [0, 0, s[2]], [0, 0, 0]),
            ([0, s[1], 0], [0, 0, s[2]], [s[0], 0, 0]),
            ([s[0], 0, 0], [0, s[1], 0], [0, 0, s[2]]),
        ]:
            uv = r.uniform(size=(260, 2))
            faces.append(o + off + uv[:, :1] * np.asarray(eu) + uv[:, 1:] * np.asarray(ev))
        pts = np.concatenate([g] + faces)
        pts += r.normal(scale=0.004, size=pts.shape)
        return pts.astype(np.float32)

    a = scene(11)
    b_world = scene(12)
    ang = 0.3
    R = np.array([[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
    t = np.array([1.0, -0.5, 0.1], np.float32)
    b = ((b_world - t) @ R).astype(np.float32)
    N = len(a)
    pad = 1 << (N - 1).bit_length()
    ap = np.zeros((pad, 3), np.float32); ap[:N] = a
    bp = np.zeros((pad, 3), np.float32); bp[:N] = b
    valid = np.arange(pad) < N
    spacing = 0.05
    cfg = FlagshipConfig(rounds=4, hypothesis_batch=256, use_iss=True,
                         cluster_matching=False)  # monolithic path has no cluster stage
    args = (
        jnp.asarray(ap), jnp.asarray(valid), jnp.asarray(bp), jnp.asarray(valid),
        jax.random.PRNGKey(566),
        jnp.float32(spacing * 4.0), jnp.float32(spacing * 2.0),
        jnp.float32(spacing * 2.0), jnp.float32(spacing * 3.0),
        jnp.float32(spacing * 3.0), jnp.float32(spacing * 8.0),
        jnp.float32(spacing * 4.0),
    )
    out_staged = register_pair_staged(*args, cfg=cfg)
    out_mono = register_pair_step(*args, cfg=cfg)
    assert float(out_staged["n_correspondences"]) == float(out_mono["n_correspondences"])
    np.testing.assert_allclose(
        np.asarray(out_staged["transformation"]),
        np.asarray(out_mono["transformation"]),
        atol=1e-5,
    )
    assert int(out_staged["inliers"]) == int(out_mono["inliers"])


@pytest.mark.slow
def test_cluster_filter_rescues_repetitive_structure():
    """On a scene with repeated box corners, pure mutual 1-NN matches
    near-identical descriptors arbitrarily; the cluster consensus filter
    (the reference's default strategy) recovers the correct pose."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _synthetic_scene_pair
    from lidar_global_registration_tpu.models.flagship import (
        FlagshipConfig,
        register_pair_staged,
    )
    from lidar_global_registration_tpu.ops.transform import (
        rotation_translation_error,
    )

    n = 32768
    a, b, vp_a, vp_b = _synthetic_scene_pair(n)
    spacing = float(np.sqrt(1150.0 / n))
    args = (
        jnp.asarray(a), jnp.ones((n,), bool), jnp.asarray(b), jnp.ones((n,), bool),
        jax.random.PRNGKey(566),
        jnp.float32(spacing * 4.0), jnp.float32(spacing * 2.0),
        jnp.float32(spacing * 2.0), jnp.float32(spacing * 3.0),
        jnp.float32(spacing * 3.0), jnp.float32(spacing * 8.0),
        jnp.float32(spacing * 4.0),
    )
    kwargs = dict(vp_src=jnp.asarray(vp_a), vp_tgt=jnp.asarray(vp_b))
    ang = 0.4
    R = np.array(
        [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]],
        np.float32,
    )
    t = np.array([2.0, -1.0, 0.5], np.float32)
    T_gt = np.eye(4, dtype=np.float32)
    T_gt[:3, :3] = R.T
    T_gt[:3, 3] = -R.T @ t

    cfg_on = FlagshipConfig(rounds=8, hypothesis_batch=1024, use_iss=True,
                            cluster_matching=True)
    out_on = register_pair_staged(*args, cfg=cfg_on, **kwargs)
    assert bool(out_on["converged"])
    r_err, t_err = rotation_translation_error(
        jnp.asarray(out_on["transformation"]), jnp.asarray(T_gt)
    )
    assert float(r_err) < 0.02, float(r_err)
    assert float(t_err) < 8.0 * spacing, float(t_err)

    cfg_off = FlagshipConfig(rounds=8, hypothesis_batch=1024, use_iss=True,
                             cluster_matching=False)
    out_off = register_pair_staged(*args, cfg=cfg_off, **kwargs)
    r2, _t2 = rotation_translation_error(
        jnp.asarray(out_off["transformation"]), jnp.asarray(T_gt)
    )
    # mutual-only matching must NOT find the pose here (else the fixture
    # stopped exercising the repetitive-structure failure mode)
    assert (not bool(out_off["converged"])) or float(r2) > 0.05


def test_flagship_in_pass_compaction_matches(monkeypatch):
    """big_n in-pass FPFH compaction (fpfh_pass kp_rows) must register the
    same scene as the default post-hoc path, with matching pose."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _synthetic_scene_pair
    from lidar_global_registration_tpu.models.flagship import (
        FlagshipConfig,
        register_pair_staged,
    )
    from lidar_global_registration_tpu.ops.transform import (
        rotation_translation_error,
    )

    n = 32768
    a, b, vp_a, vp_b = _synthetic_scene_pair(n)
    spacing = float(np.sqrt(1150.0 / n))
    args = (
        jnp.asarray(a), jnp.ones((n,), bool), jnp.asarray(b), jnp.ones((n,), bool),
        jax.random.PRNGKey(566),
        jnp.float32(spacing * 4.0), jnp.float32(spacing * 2.0),
        jnp.float32(spacing * 2.0), jnp.float32(spacing * 3.0),
        jnp.float32(spacing * 3.0), jnp.float32(spacing * 8.0),
        jnp.float32(spacing * 4.0),
    )
    kwargs = dict(vp_src=jnp.asarray(vp_a), vp_tgt=jnp.asarray(vp_b))
    ang = 0.4
    R = np.array(
        [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]],
        np.float32,
    )
    t = np.array([2.0, -1.0, 0.5], np.float32)
    T_gt = np.eye(4, dtype=np.float32)
    T_gt[:3, :3] = R.T
    T_gt[:3, 3] = -R.T @ t

    monkeypatch.setenv("LGR_EARLY_COMPACT_N", "1")  # force big_n path
    cfg = FlagshipConfig(rounds=8, hypothesis_batch=1024, use_iss=True,
                         cluster_matching=True)
    out = register_pair_staged(*args, cfg=cfg, **kwargs)
    assert bool(out["converged"])
    r_err, t_err = rotation_translation_error(
        jnp.asarray(out["transformation"]), jnp.asarray(T_gt)
    )
    assert float(r_err) < 0.02, float(r_err)
    assert float(t_err) < 8.0 * spacing, float(t_err)


def test_pre_downsample_pair_registers():
    """Loader-equivalent pre-downsample (reference common.cpp:444-464):
    the compacted 2x-density pair must still register with the correct
    pose, and the compaction must keep every voxel centroid."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _synthetic_scene_pair
    from lidar_global_registration_tpu.models.flagship import (
        FlagshipConfig,
        pre_downsample_pair,
        register_pair_staged,
    )
    from lidar_global_registration_tpu.ops.transform import (
        rotation_translation_error,
    )

    n = 32768
    a, b, vp_a, vp_b = _synthetic_scene_pair(n)
    spacing = float(np.sqrt(1150.0 / n))
    ones = jnp.ones((n,), bool)
    sx, sv, tx, tv = pre_downsample_pair(
        jnp.asarray(a), ones, jnp.asarray(b), ones,
        2.0 * spacing, 2.0 * spacing,
    )
    m = sx.shape[0]
    n_s = int(np.asarray(jnp.sum(sv.astype(jnp.int32))))
    assert 0 < n_s <= m < n  # genuinely downsampled, correctly padded
    assert sx.shape == tx.shape

    sp2 = spacing * 2.0  # downsampled spacing
    args = (
        sx, sv, tx, tv, jax.random.PRNGKey(566),
        jnp.float32(sp2 * 4.0), jnp.float32(sp2 * 2.0),
        jnp.float32(sp2 * 2.0), jnp.float32(sp2 * 3.0),
        jnp.float32(sp2 * 3.0), jnp.float32(sp2 * 8.0),
        jnp.float32(sp2 * 4.0),
    )
    kwargs = dict(vp_src=jnp.asarray(vp_a), vp_tgt=jnp.asarray(vp_b))
    ang = 0.4
    R = np.array(
        [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]],
        np.float32,
    )
    t = np.array([2.0, -1.0, 0.5], np.float32)
    T_gt = np.eye(4, dtype=np.float32)
    T_gt[:3, :3] = R.T
    T_gt[:3, 3] = -R.T @ t

    cfg = FlagshipConfig(rounds=8, hypothesis_batch=1024, use_iss=True,
                         cluster_matching=True)
    out = register_pair_staged(*args, cfg=cfg, **kwargs)
    assert bool(out["converged"])
    r_err, t_err = rotation_translation_error(
        jnp.asarray(out["transformation"]), jnp.asarray(T_gt)
    )
    assert float(r_err) < 0.03, float(r_err)
    assert float(t_err) < 8.0 * sp2, float(t_err)
