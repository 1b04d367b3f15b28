"""Numeric parity of USC-1960 against a NumPy oracle of the PCL math.

The oracle is a literal port of pcl::UniqueShapeContext::initCompute +
computePointDescriptor (features/impl/usc.hpp; invoked by the reference
via estimateFeatures<USC>, include/common.h:334-346): log-radial edge
scan, degree-based elevation/azimuth edge scans, tangent-plane projection
azimuth with cross.dot(normal) sign, the Frome volume LUT, per-neighbor
density weighting, azimuth-major bin order, NO normalization.  Bin counts
(radius 10, elevation 14, azimuth 14) are the unique factorization of the
UniqueShapeContext1960 width into (R, E, A) — PCL's 3DSC sibling uses
(15, 11, 12) = ShapeContext1980, none of which divide 1960.
"""
import numpy as np
import jax.numpy as jnp

from lidar_global_registration_tpu.ops.usc import (
    DIM,
    N_AZIM,
    N_ELEV,
    N_RAD,
    usc_from_neighbors,
)


def usc_oracle_one(center, frame, nbr_xyz, nbr_density, radius):
    """Descriptor for ONE keypoint, PCL loop semantics in float64.

    frame rows = (x_axis, y_axis, normal).  nbr_density[i] = point count
    within radius/5 of neighbor i (self included).
    """
    min_radius = radius / 10.0
    # initCompute: radii_interval_, theta/phi divisions (degrees), volume LUT
    radii_interval = np.array(
        [
            np.exp(np.log(min_radius) + (j / N_RAD) * np.log(radius / min_radius))
            for j in range(N_RAD + 1)
        ]
    )
    elevation_interval = 180.0 / N_ELEV
    azimuth_interval = 360.0 / N_AZIM
    theta_divisions = np.array([k * elevation_interval for k in range(N_ELEV + 1)])
    phi_divisions = np.array([l * azimuth_interval for l in range(N_AZIM + 1)])

    integr_phi = np.deg2rad(phi_divisions[1]) - np.deg2rad(phi_divisions[0])
    volume_lut = np.zeros(DIM)
    for j in range(N_RAD):
        integr_r = (radii_interval[j + 1] ** 3 - radii_interval[j] ** 3) / 3.0
        for k in range(N_ELEV):
            integr_theta = np.cos(np.deg2rad(theta_divisions[k])) - np.cos(
                np.deg2rad(theta_divisions[k + 1])
            )
            V = integr_phi * integr_theta * integr_r
            for l in range(N_AZIM):
                volume_lut[(l * N_ELEV * N_RAD) + (k * N_RAD) + j] = 1.0 / np.cbrt(V)

    x_axis, y_axis, normal = frame[0], frame[1], frame[2]
    desc = np.zeros(DIM)
    for ne, neighbour in enumerate(nbr_xyz):
        r = float(np.linalg.norm(neighbour - center))
        if r < 1e-12 or r > radius:
            continue
        # project into tangent plane, angle vs x_axis signed by cross.normal
        delta = neighbour - center
        proj = delta - np.dot(delta, normal) * normal
        nproj = np.linalg.norm(proj)
        proj = proj / nproj if nproj > 0 else proj
        cross = np.cross(x_axis, proj)
        phi = np.rad2deg(np.arctan2(np.linalg.norm(cross), np.dot(x_axis, proj)))
        phi = 360.0 - phi if np.dot(cross, normal) < 0.0 else phi
        # angle vs normal in [0, 180]
        no = delta / r
        theta = np.rad2deg(np.arccos(np.clip(np.dot(normal, no), -1.0, 1.0)))

        j = 0
        for rad in range(1, N_RAD + 1):
            if r <= radii_interval[rad]:
                j = rad - 1
                break
        k = 0
        for ang in range(1, N_ELEV + 1):
            if theta <= theta_divisions[ang]:
                k = ang - 1
                break
        l = 0
        for ang in range(1, N_AZIM + 1):
            if phi <= phi_divisions[ang]:
                l = ang - 1
                break

        point_density = float(nbr_density[ne])
        v_index = (l * N_ELEV * N_RAD) + (k * N_RAD) + j
        w = 0.0 if point_density == 0 else (1.0 / point_density) * volume_lut[v_index]
        desc[v_index] += w
    return desc


def _random_frame(rng):
    A = rng.normal(size=(3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    return Q.astype(np.float32)


def test_usc_matches_numpy_oracle(rng):
    M, K = 10, 64
    radius = 1.3
    centers = rng.uniform(-3, 3, size=(M, 3)).astype(np.float32)
    frames = np.stack([_random_frame(rng) for _ in range(M)])

    dirs = rng.normal(size=(M, K, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    # spread radii across all log shells incl. a few inside r_min
    radii = radius * rng.uniform(0.03, 0.999, size=(M, K, 1))
    nbr = (centers[:, None, :] + dirs * radii).astype(np.float32)
    density = rng.integers(1, 40, size=(M, K)).astype(np.float32)

    surface_xyz = nbr.reshape(M * K, 3)
    idx = np.arange(M * K, dtype=np.int32).reshape(M, K)
    mask = np.ones((M, K), bool)
    mask[:, -5:] = rng.uniform(size=(M, 5)) > 0.5

    desc = np.asarray(
        usc_from_neighbors(
            jnp.asarray(centers), jnp.asarray(frames), jnp.asarray(surface_xyz),
            jnp.asarray(idx), jnp.asarray(mask), jnp.asarray(density),
            jnp.float32(radius),
        )
    )
    assert desc.shape == (M, DIM)

    for m in range(M):
        ref = usc_oracle_one(
            centers[m].astype(np.float64),
            frames[m].astype(np.float64),
            nbr[m][mask[m]].astype(np.float64),
            density[m][mask[m]],
            radius,
        )
        np.testing.assert_allclose(desc[m], ref, rtol=2e-4, atol=2e-4,
                                   err_msg=f"kp {m}")


def test_usc_unnormalized_raw_weights():
    """PCL never L2-normalizes USC: one neighbor of density d in bin b must
    contribute exactly 1/(d * cbrt(V_b)) — the raw weight, not a unit
    vector."""
    center = np.zeros((1, 3), np.float32)
    frame = np.eye(3, dtype=np.float32)[None]
    radius = 2.0
    p = np.array([[1.1, 0.2, 0.4]], np.float32)  # one neighbor
    idx = np.zeros((1, 1), np.int32)
    mask = np.ones((1, 1), bool)
    density = np.full((1, 1), 7.0, np.float32)
    desc = np.asarray(
        usc_from_neighbors(
            jnp.asarray(center), jnp.asarray(frame), jnp.asarray(p),
            jnp.asarray(idx), jnp.asarray(mask), jnp.asarray(density),
            jnp.float32(radius),
        )
    )[0]
    nz = np.nonzero(desc)[0]
    assert len(nz) == 1
    ref = usc_oracle_one(
        np.zeros(3), np.eye(3), p.astype(np.float64), [7.0], radius
    )
    assert np.nonzero(ref)[0][0] == nz[0]
    np.testing.assert_allclose(desc[nz[0]], ref[nz[0]], rtol=1e-5)
    assert abs(np.linalg.norm(desc) - 1.0) > 1e-3  # really unnormalized


def test_usc_bin_order_is_azimuth_major():
    """desc index must be (azimuth*E + elev)*R + radial (PCL v_index)."""
    center = np.zeros((1, 3), np.float32)
    frame = np.eye(3, dtype=np.float32)[None]
    radius = 2.0
    r_min = radius / 10.0
    # neighbor at azimuth bin 3, elevation bin 2, radial shell 0
    az = (3 + 0.5) * 2 * np.pi / N_AZIM
    el = (2 + 0.5) * np.pi / N_ELEV
    r = r_min * 0.5  # inside min radius -> shell 0
    p = np.array(
        [[r * np.sin(el) * np.cos(az), r * np.sin(el) * np.sin(az), r * np.cos(el)]],
        np.float32,
    )
    desc = np.asarray(
        usc_from_neighbors(
            jnp.asarray(center), jnp.asarray(frame), jnp.asarray(p),
            jnp.zeros((1, 1), jnp.int32), jnp.ones((1, 1), bool),
            jnp.ones((1, 1), jnp.float32), jnp.float32(radius),
        )
    )[0]
    expect = (3 * N_ELEV + 2) * N_RAD + 0
    assert np.nonzero(desc)[0].tolist() == [expect]
