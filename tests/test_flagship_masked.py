"""Masked staged pipeline == unmasked staged pipeline, end to end.

LGR_CELL_FPFH=force routes the staged path through the Pallas cell
kernels in interpret mode on CPU, so the masked wiring (ISS-first side
stage, stencil need masks, keypoint-block FPFH) is exercised exactly as
on TPU."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from lidar_global_registration_tpu.models.flagship import (
    FlagshipConfig,
    register_pair_staged,
)


def _scene(n, seed, shift):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(0, 10.0, (n, 2)).astype(np.float32)
    z = (0.5 * np.sin(xy[:, 0]) + 0.3 * np.cos(1.3 * xy[:, 1])).astype(
        np.float32
    )
    for cx, cy, h, w in ((2.5, 3.0, 1.0, 0.7), (7.0, 6.5, 1.4, 0.9),
                         (4.5, 8.0, 0.8, 0.6)):
        m = (np.abs(xy[:, 0] - cx) < w) & (np.abs(xy[:, 1] - cy) < w)
        z = z + np.where(m, h, 0.0).astype(np.float32)
    return np.column_stack([xy, z]).astype(np.float32) + shift


@pytest.mark.slow
def test_masked_equals_unmasked_staged(monkeypatch):
    monkeypatch.setenv("LGR_CELL_FPFH", "force")
    n = 4096
    a = _scene(n, 3, np.zeros(3, np.float32))
    b = _scene(n, 3, np.zeros(3, np.float32))  # same sampling: kps co-locate
    import jax

    key = jax.random.PRNGKey(566)
    args = (
        jnp.asarray(a), jnp.ones((n,), bool),
        jnp.asarray(b), jnp.ones((n,), bool),
        key,
        jnp.float32(0.5),   # normal_cell
        jnp.float32(0.12), jnp.float32(0.12),  # density cells
        jnp.float32(0.35), jnp.float32(0.35),  # iss radii
        jnp.float32(1.0),   # feature radius
        jnp.float32(0.4),   # distance thr
    )
    out_m = register_pair_staged(
        *args, cfg=FlagshipConfig(use_iss=True, masked_features=True,
                                  rounds=2, hypothesis_batch=128)
    )
    out_u = register_pair_staged(
        *args, cfg=FlagshipConfig(use_iss=True, masked_features=False,
                                  rounds=2, hypothesis_batch=128)
    )
    # identical correspondence sets => identical RANSAC outcome
    assert int(out_m["n_correspondences"]) == int(out_u["n_correspondences"])
    assert int(out_m["n_correspondences"]) > 0
    np.testing.assert_allclose(
        np.asarray(out_m["transformation"]),
        np.asarray(out_u["transformation"]),
        atol=1e-5,
    )


@pytest.mark.slow
def test_early_compaction_equals_late(monkeypatch):
    """LGR_EARLY_COMPACT_N forces the large-N path that compacts each
    side's descriptors to keypoint rows right after its FPFH (freeing the
    [N, 33] array and the side's plan states before the other side runs —
    the 10M-point HBM fix).  The result must match the late-compaction
    path exactly."""
    monkeypatch.setenv("LGR_CELL_FPFH", "force")
    n = 4096
    a = _scene(n, 3, np.zeros(3, np.float32))
    b = _scene(n, 3, np.zeros(3, np.float32))
    import jax

    key = jax.random.PRNGKey(566)
    args = (
        jnp.asarray(a), jnp.ones((n,), bool),
        jnp.asarray(b), jnp.ones((n,), bool),
        key,
        jnp.float32(0.5),
        jnp.float32(0.12), jnp.float32(0.12),
        jnp.float32(0.35), jnp.float32(0.35),
        jnp.float32(1.0),
        jnp.float32(0.4),
    )
    cfg = FlagshipConfig(use_iss=True, masked_features=True,
                         rounds=2, hypothesis_batch=128)
    monkeypatch.setenv("LGR_EARLY_COMPACT_N", "1")  # force the big-N path
    out_e = register_pair_staged(*args, cfg=cfg)
    monkeypatch.setenv("LGR_EARLY_COMPACT_N", str(1 << 22))
    out_l = register_pair_staged(*args, cfg=cfg)
    assert int(out_e["n_correspondences"]) == int(out_l["n_correspondences"])
    assert int(out_e["n_correspondences"]) > 0
    np.testing.assert_array_equal(
        np.asarray(out_e["transformation"]), np.asarray(out_l["transformation"])
    )
    assert int(out_e["inliers"]) == int(out_l["inliers"])
