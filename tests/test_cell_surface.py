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


def test_cell_surface_georeferenced_offset(rng):
    """Clouds georeferenced far from the origin (UTM-style coordinates)
    must produce the same normals as the same cloud at the origin: the
    kernel accumulates query-centered moments, so E[dd^T] - mean mean^T
    never cancels catastrophically in f32."""
    N, pad = 1200, 1280
    xyz_np = _bump_cloud(N, rng)
    offset = np.array([20000.0, -35000.0, 1500.0], np.float32)
    base = jnp.zeros((pad, 3), jnp.float32).at[:N].set(jnp.asarray(xyz_np))
    moved = jnp.zeros((pad, 3), jnp.float32).at[:N].set(
        jnp.asarray(xyz_np + offset)
    )
    valid = jnp.arange(pad) < N
    cell = jnp.float32(0.55)
    vp0 = jnp.asarray(np.array([6.0, 6.0, 50.0], np.float32))
    vp1 = jnp.asarray(np.array([6.0, 6.0, 50.0], np.float32) + offset)

    n0, _c0, d0, _e0, ok0 = surface_cells(base, valid, cell, vp0, interpret=True,
                                          exact=True)
    n1, _c1, d1, _e1, ok1 = surface_cells(moved, valid, cell, vp1, interpret=True,
                                          exact=True)
    both = np.asarray(ok0) & np.asarray(ok1)
    assert both.sum() > 0.9 * N
    dots = np.sum(np.asarray(n0)[both] * np.asarray(n1)[both], axis=1)
    # the offset cloud quantizes positions at f32 ulp(2e4) ~ 2mm, a real
    # perturbation of the data itself; demand agreement far beyond what a
    # cancelling covariance could deliver (which was ~random normals)
    assert np.median(dots) > 0.9999, np.median(dots)
    assert (dots > 0.99).mean() > 0.97, (dots > 0.99).mean()
