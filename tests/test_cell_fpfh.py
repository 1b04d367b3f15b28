"""Parity: the fused Pallas cell-list FPFH kernel vs the XLA fpfh pipeline.

The two implementations share the same math (PCL FPFHEstimationOMP semantics,
include/common.h:322-332) but different neighbor enumeration: the XLA path
uses K-capped grid-hash top-k lists, the cell kernel consumes every point of
the 27 neighbor cell runs.  On a fixture where neither cap binds they must
agree bin-for-bin up to the kernel's polynomial atan2 (~1e-5 rad, far below
the 2*pi/11 bin width, so only pairs within 1e-5 of a bin edge may flip).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lidar_global_registration_tpu.ops.fpfh import fpfh
from lidar_global_registration_tpu.ops.pallas.cellgrid import fpfh_cells


def _bump_cloud(n, rng):
    centers = rng.uniform([0, 0], [12, 12], size=(40, 2))
    widths = rng.uniform(0.3, 2.0, size=40)
    heights = rng.uniform(-1.0, 1.0, size=40)
    xy = rng.uniform([0, 0], [12, 12], size=(n, 2))
    z = np.zeros(n)
    for c, w, h in zip(centers, widths, heights):
        z += h * np.exp(-np.sum((xy - c) ** 2, axis=1) / (2 * w * w))
    return np.column_stack([xy, z]).astype(np.float32)


def _normals(xyz, valid, radius):
    from lidar_global_registration_tpu.ops import grid as gridmod
    from lidar_global_registration_tpu.ops.normals import normals_from_neighbors

    g = gridmod.build_grid(xyz, valid, radius, cell_cap=64)
    idx, _d, mask = gridmod.radius_neighbors(
        g, xyz, valid, radius, k=32, cap=64,
        query_index=jnp.arange(xyz.shape[0], dtype=jnp.int32),
    )
    n, _c, _ok = normals_from_neighbors(xyz, xyz, idx, mask)
    return n


@pytest.mark.parametrize("n_pad_extra", [0, 64])
def test_cell_fpfh_matches_xla_fpfh(rng, n_pad_extra):
    N = 1536
    xyz_np = _bump_cloud(N, rng)
    pad = N + n_pad_extra
    xyz = jnp.zeros((pad, 3), jnp.float32).at[:N].set(jnp.asarray(xyz_np))
    valid = jnp.arange(pad) < N
    radius = jnp.float32(0.9)

    normal = _normals(xyz, valid, radius)

    feat_ref, fv_ref = fpfh(
        xyz, valid, xyz, normal, valid, radius,
        kp_normal=normal, k_neighbors=256, cap=128,
    )
    feat_cell, fv_cell = fpfh_cells(xyz, normal, valid, radius, interpret=True, exact=True)

    fv_ref = np.asarray(fv_ref)
    fv_cell = np.asarray(fv_cell)
    np.testing.assert_array_equal(fv_cell, fv_ref)

    a = np.asarray(feat_ref)[fv_ref]
    b = np.asarray(feat_cell)[fv_ref]
    diff = np.abs(a - b)
    # bin-edge flips from the polynomial atan2 move at most ~2*incr (<10)
    # in isolated entries; everything else must match to float tolerance.
    frac_off = np.mean(diff > 0.5)
    assert frac_off < 1e-3, f"{frac_off:.2e} of entries differ by >0.5"
    assert np.median(diff) < 1e-3
    row_l1 = np.abs(a - b).sum(axis=1)
    assert np.percentile(row_l1, 95) < 1.0


def test_cell_fpfh_handles_invalid_tail(rng):
    """Padding rows must come back invalid with zero features."""
    N, pad = 700, 1024
    xyz_np = _bump_cloud(N, rng)
    xyz = jnp.zeros((pad, 3), jnp.float32).at[:N].set(jnp.asarray(xyz_np))
    valid = jnp.arange(pad) < N
    radius = jnp.float32(1.1)
    normal = _normals(xyz, valid, radius)
    feat, fv = fpfh_cells(xyz, normal, valid, radius, interpret=True, exact=True)
    fv = np.asarray(fv)
    assert not fv[N:].any()
    assert np.all(np.asarray(feat)[~fv] == 0.0)
    # interior points must have informative (nonzero) descriptors
    assert fv[:N].mean() > 0.95


def test_cell_fpfh_kp_rows_compacted(rng):
    """kp_rows parity: the compacted [M, 33] output must equal the full
    pass gathered at those rows (both layouts), including validity and
    out-of-range padding rows."""
    from lidar_global_registration_tpu.ops.pallas.cellgrid import (
        _fpfh_impl,
        plan_grid,
        set_normals,
    )

    N, pad = 1200, 1280
    xyz_np = _bump_cloud(N, rng)
    xyz = jnp.zeros((pad, 3), jnp.float32).at[:N].set(jnp.asarray(xyz_np))
    valid = jnp.arange(pad) < N
    radius = jnp.float32(0.9)
    normal = _normals(xyz, valid, radius)

    plan = plan_grid(xyz, jnp.zeros_like(xyz), valid, float(radius))
    plan = set_normals(plan, normal)
    kp = np.zeros(pad, bool)
    kp_idx = rng.choice(N, size=96, replace=False)
    kp[kp_idx] = True
    kp = jnp.asarray(kp)
    M = 128  # padded row list: tail entries point past N
    rows = jnp.full((M,), pad, jnp.int32).at[:96].set(
        jnp.asarray(np.sort(kp_idx).astype(np.int32))
    )

    r2 = radius * radius
    for tposed in (False, True):
        full, fv_full = _fpfh_impl(
            plan.state, r2, plan.C, plan.SEG, plan.R_pad, True, kp=kp,
            packed_rows=plan.packed, tposed=tposed,
        )
        comp, fv_comp = _fpfh_impl(
            plan.state, r2, plan.C, plan.SEG, plan.R_pad, True, kp=kp,
            packed_rows=plan.packed, tposed=tposed, kp_rows=rows,
        )
        fv_full = np.asarray(fv_full)
        fv_comp = np.asarray(fv_comp)
        np.testing.assert_array_equal(fv_comp[:96], fv_full[np.sort(kp_idx)])
        assert not fv_comp[96:].any()
        np.testing.assert_allclose(
            np.asarray(comp)[:96], np.asarray(full)[np.sort(kp_idx)],
            rtol=0, atol=0,
        )
        assert np.all(np.asarray(comp)[96:] == 0.0)
