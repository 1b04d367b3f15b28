"""Masked-query-block parity: the keypoint-regime fast path must return
bit-identical values at every needed row.

The skip flag (tab lane 34, ops/pallas/cellgrid.py) only suppresses
candidate streaming for blocks no consumer reads; reference semantics are
unchanged — PCL computes descriptors on keypoint clouds only
(reference: src/feature_analysis.cpp estimation over keypoint indices).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lidar_global_registration_tpu.ops.pallas.cellgrid import (
    fpfh_cells,
    plan_grid,
    point_need,
    surface_cells,
    surface_pass,
)


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(11)
    n = 4096
    xy = rng.uniform(0, 8.0, (n, 2)).astype(np.float32)
    z = (0.4 * np.sin(xy[:, 0]) + 0.25 * np.cos(1.7 * xy[:, 1])).astype(
        np.float32
    )
    # a couple of boxes for curvature structure
    box = (np.abs(xy[:, 0] - 3.0) < 0.8) & (np.abs(xy[:, 1] - 5.0) < 0.8)
    z = z + np.where(box, 0.9, 0.0).astype(np.float32)
    xyz = np.column_stack([xy, z]).astype(np.float32)
    valid = np.ones(n, bool)
    valid[-37:] = False  # padded tail
    return jnp.asarray(xyz), jnp.asarray(valid)


def test_masked_fpfh_matches_full_at_kp_rows(scene):
    xyz, valid = scene
    n = xyz.shape[0]
    rng = np.random.default_rng(5)
    kp = jnp.asarray(rng.random(n) < 0.03) & valid
    r = 0.6
    # normals from the full surface pass (shared by both variants)
    normal, _c, _d, _e, ok = surface_cells(xyz, valid, 0.35)
    full, full_ok = fpfh_cells(xyz, normal, valid & ok, r)
    masked, masked_ok = fpfh_cells(xyz, normal, valid & ok, r, kp=kp)
    sel = np.asarray(kp & full_ok)
    assert sel.sum() > 20
    np.testing.assert_array_equal(
        np.asarray(masked_ok)[sel], np.asarray(full_ok)[sel]
    )
    np.testing.assert_allclose(
        np.asarray(masked)[sel], np.asarray(full)[sel], rtol=0, atol=0
    )
    # and the mask actually prunes blocks: far rows must be invalid
    far = ~np.asarray(point_need(plan_grid(xyz, normal, valid, r), kp, 1))
    assert far.sum() > 0
    assert not np.asarray(masked_ok)[far].any()


def test_masked_surface_matches_full_at_need_rows(scene):
    xyz, valid = scene
    n = xyz.shape[0]
    rng = np.random.default_rng(7)
    kp = jnp.asarray(rng.random(n) < 0.02) & valid
    feature_radius = 0.9
    normal_radius = 0.35
    plan_f = plan_grid(xyz, jnp.zeros_like(xyz), valid, feature_radius)
    need = point_need(plan_f, kp, 2)
    vp = jnp.asarray([4.0, 4.0, 50.0], jnp.float32)
    plan_n = plan_grid(xyz, jnp.zeros_like(xyz), valid, normal_radius)
    fn, fc, fd, fe, fok = surface_pass(plan_n, normal_radius, viewpoint=vp)
    mn, mc, md, me, mok = surface_pass(
        plan_n, normal_radius, viewpoint=vp, need=need
    )
    sel = np.asarray(need & fok)
    assert sel.sum() > 50
    np.testing.assert_array_equal(np.asarray(mok)[sel], np.asarray(fok)[sel])
    np.testing.assert_allclose(
        np.asarray(mn)[sel], np.asarray(fn)[sel], rtol=0, atol=0
    )
    np.testing.assert_allclose(
        np.asarray(md)[sel], np.asarray(fd)[sel], rtol=0, atol=2e-7
    )
    # masked-out rows are cleanly invalid, not stale
    off = ~np.asarray(need)
    assert off.sum() > 0
    assert not np.asarray(mok)[off].any()
    assert np.all(np.asarray(mn)[off] == 0.0)


def test_point_need_covers_euclidean_ball(scene):
    xyz, valid = scene
    n = xyz.shape[0]
    rng = np.random.default_rng(9)
    kp = jnp.asarray(rng.random(n) < 0.01) & valid
    cell = 0.8
    plan = plan_grid(xyz, jnp.zeros_like(xyz), valid, cell)
    for s in (1, 2):
        need = np.asarray(point_need(plan, kp, s))
        P = np.asarray(xyz)
        K = P[np.asarray(kp)]
        d = np.sqrt(((P[:, None, :] - K[None, :, :]) ** 2).sum(-1)).min(1)
        # cell growth m can coarsen the grid; the guarantee is in GRID cells
        m = plan.m
        inside = (d < 0.999 * s * cell * m) & np.asarray(valid)
        assert need[inside].all()
        # all keypoints themselves are needed
        assert need[np.asarray(kp)].all()
