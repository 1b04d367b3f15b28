"""Parity: fused Pallas cell-surface pass vs the XLA side-stage machinery
(grid radius lists + SoA covariance normals + k=2 smoothed density)."""
import numpy as np
import jax.numpy as jnp

from lidar_global_registration_tpu.models.flagship import _knn_fixed, _smoothed_density
from lidar_global_registration_tpu.ops.normals import normals_from_neighbors
from lidar_global_registration_tpu.ops.pallas.cellgrid import surface_cells


def _bump_cloud(n, rng):
    centers = rng.uniform([0, 0], [12, 12], size=(40, 2))
    widths = rng.uniform(0.3, 2.0, size=40)
    heights = rng.uniform(-1.0, 1.0, size=40)
    xy = rng.uniform([0, 0], [12, 12], size=(n, 2))
    z = np.zeros(n)
    for c, w, h in zip(centers, widths, heights):
        z += h * np.exp(-np.sum((xy - c) ** 2, axis=1) / (2 * w * w))
    return np.column_stack([xy, z]).astype(np.float32)


def test_cell_surface_matches_xla_side(rng):
    N, pad = 1400, 1536
    xyz_np = _bump_cloud(N, rng)
    xyz = jnp.zeros((pad, 3), jnp.float32).at[:N].set(jnp.asarray(xyz_np))
    valid = jnp.arange(pad) < N
    cell = jnp.float32(0.55)
    vp = jnp.asarray(np.array([6.0, 6.0, 50.0], np.float32))

    # XLA reference with caps high enough that no neighborhood truncates
    idx, dist, mask = _knn_fixed(xyz, valid, xyz, valid, cell, 96, 96, True)
    assert int(np.asarray(jnp.sum(mask, axis=1)).max()) < 96
    n_ref, c_ref, ok_ref = normals_from_neighbors(xyz, xyz, idx, mask, vp)
    d_ref = _smoothed_density(xyz, valid, cell, 96)

    n_c, c_c, d_c, eig, ok_c = surface_cells(xyz, valid, cell, vp, interpret=True, exact=True)

    ok_ref = np.asarray(ok_ref) & np.asarray(valid)
    ok_c_np = np.asarray(ok_c)
    np.testing.assert_array_equal(ok_c_np, ok_ref)

    both = ok_ref
    cnt = np.asarray(jnp.sum(mask, axis=1))
    # signed dot: magnitude AND viewpoint orientation must agree.  Minimal
    # (3-point) neighborhoods have rank-2 covariance with a near-zero
    # eigengap, where f32 noise legitimately rotates the eigenvector a few
    # degrees — hold those to a looser bound.
    sdots = np.sum(np.asarray(n_ref) * np.asarray(n_c), axis=1)
    solid = both & (cnt >= 4)
    assert np.min(sdots[solid]) > 0.9999, np.min(sdots[solid])
    assert np.min(sdots[both]) > 0.9, np.min(sdots[both])
    np.testing.assert_allclose(
        np.asarray(c_c)[solid], np.asarray(c_ref)[solid], atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(d_c)[:N], np.asarray(d_ref)[:N], rtol=1e-4, atol=1e-5
    )
    # padding rows are inert
    assert not ok_c_np[N:].any()
    assert np.all(np.asarray(d_c)[N:] == 0.0)
