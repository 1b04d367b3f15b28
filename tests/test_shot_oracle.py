"""Numeric parity of SHOT-352 against a NumPy oracle of the PCL math.

The oracle below is a direct port of the reference's per-neighbor
quadrilinear interpolation (`interpolateSingleChannelDebug`,
src/pcl/shot_debug.cpp:29-194, plus createBinDistanceShape /
normalizeHistogram semantics) in plain double-precision NumPy — a
bin-level independent implementation that catches sector, sign, and
interpolation regressions the rotation-invariance tests cannot.
"""
import numpy as np
import jax.numpy as jnp

from lidar_global_registration_tpu.ops.shot import shot_from_neighbors

NR_BINS = 10
DIM = 352
RAD_45 = np.pi / 4
RAD_90 = np.pi / 2
RAD_135 = 3 * np.pi / 4
RAD_PI_7_8 = np.pi * 7.0 / 8.0
MAX_ANGULAR = 32


def shot_oracle_one(center, frame, nbr_xyz, nbr_normal, radius):
    """Descriptor for ONE keypoint. frame rows = (x, y, z) axes."""
    shot = np.zeros(DIM, np.float64)
    r12, r34, r14 = radius / 2.0, radius * 3.0 / 4.0, radius / 4.0
    fx, fy, fz = frame[0], frame[1], frame[2]
    for pj, nj in zip(nbr_xyz, nbr_normal):
        # createBinDistanceShape: cosine of neighbor normal vs frame z
        if not np.all(np.isfinite(nj)) or np.dot(nj, nj) < 0.5:
            continue
        cosine = float(np.clip(np.dot(fz, nj), -1.0, 1.0))
        bin_distance = ((1.0 + cosine) * NR_BINS) / 2.0

        delta = pj - center
        distance = float(np.linalg.norm(delta))
        if abs(distance) < 1e-15:
            continue
        x = float(np.dot(delta, fx))
        y = float(np.dot(delta, fy))
        z = float(np.dot(delta, fz))
        if abs(y) < 1e-30:
            y = 0.0
        if abs(x) < 1e-30:
            x = 0.0
        if abs(z) < 1e-30:
            z = 0.0

        bit4 = 1 if (y > 0 or (y == 0.0 and x < 0)) else 0
        bit3 = (1 - bit4) if (x > 0 or (x == 0.0 and y > 0)) else bit4
        desc_index = ((bit4 << 3) + (bit3 << 2)) << 1
        if x * y > 0 or x == 0.0:
            desc_index += 0 if abs(x) >= abs(y) else 4
        else:
            desc_index += 4 if abs(x) > abs(y) else 0
        desc_index += 1 if z > 0 else 0
        desc_index += 2 if distance > r12 else 0

        step_index = int(np.floor(bin_distance + 0.5))
        volume_index = desc_index * (NR_BINS + 1)

        bin_distance -= step_index
        int_weight = 1 - abs(bin_distance)
        if bin_distance > 0:
            shot[volume_index + ((step_index + 1) % NR_BINS)] += bin_distance
        else:
            shot[volume_index + ((step_index - 1 + NR_BINS) % NR_BINS)] += -bin_distance

        if distance > r12:  # external sphere
            radius_distance = (distance - r34) / r12
            if distance > r34:
                int_weight += 1 - radius_distance
            else:
                int_weight += 1 + radius_distance
                shot[(desc_index - 2) * (NR_BINS + 1) + step_index] -= radius_distance
        else:  # internal sphere
            radius_distance = (distance - r14) / r12
            if distance < r14:
                int_weight += 1 + radius_distance
            else:
                int_weight += 1 - radius_distance
                shot[(desc_index + 2) * (NR_BINS + 1) + step_index] += radius_distance

        inclination = float(np.arccos(np.clip(z / distance, -1.0, 1.0)))
        if inclination > RAD_90 or (abs(inclination - RAD_90) < 1e-30 and z <= 0):
            incl_dist = (inclination - RAD_135) / RAD_90
            if inclination > RAD_135:
                int_weight += 1 - incl_dist
            else:
                int_weight += 1 + incl_dist
                shot[(desc_index + 1) * (NR_BINS + 1) + step_index] -= incl_dist
        else:
            incl_dist = (inclination - RAD_45) / RAD_90
            if inclination < RAD_45:
                int_weight += 1 + incl_dist
            else:
                int_weight += 1 - incl_dist
                shot[(desc_index - 1) * (NR_BINS + 1) + step_index] += incl_dist

        if y != 0.0 or x != 0.0:
            azimuth = float(np.arctan2(y, x))
            sel = desc_index >> 2
            az_dist = (azimuth - (-RAD_PI_7_8 + RAD_45 * sel)) / RAD_45
            az_dist = max(-0.5, min(az_dist, 0.5))
            if az_dist > 0:
                int_weight += 1 - az_dist
                interp_index = (desc_index + 4) % MAX_ANGULAR
                shot[interp_index * (NR_BINS + 1) + step_index] += az_dist
            else:
                int_weight += 1 + az_dist
                interp_index = (desc_index - 4 + MAX_ANGULAR) % MAX_ANGULAR
                shot[interp_index * (NR_BINS + 1) + step_index] -= az_dist

        shot[volume_index + step_index] += int_weight

    norm = np.linalg.norm(shot)
    return shot / norm if norm > 0 else shot


def _random_frame(rng):
    A = rng.normal(size=(3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    return Q.astype(np.float32)


def test_shot_matches_numpy_oracle(rng):
    M, K = 12, 48
    radius = 1.0
    centers = rng.uniform(-3, 3, size=(M, 3)).astype(np.float32)
    frames = np.stack([_random_frame(rng) for _ in range(M)])

    # neighbor bank: K points per keypoint inside the radius, unit normals
    dirs = rng.normal(size=(M, K, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    radii = radius * rng.uniform(0.05, 0.999, size=(M, K, 1)) ** (1 / 3)
    nbr = (centers[:, None, :] + dirs * radii).astype(np.float32)
    nrm = rng.normal(size=(M, K, 3))
    nrm = (nrm / np.linalg.norm(nrm, axis=-1, keepdims=True)).astype(np.float32)

    surface_xyz = nbr.reshape(M * K, 3)
    surface_normal = nrm.reshape(M * K, 3)
    idx = np.arange(M * K, dtype=np.int32).reshape(M, K)
    mask = np.ones((M, K), bool)
    # knock out a few neighbors to exercise masking
    mask[:, -3:] = rng.uniform(size=(M, 3)) > 0.5

    desc, ok = shot_from_neighbors(
        jnp.asarray(centers), jnp.asarray(frames), jnp.asarray(surface_xyz),
        jnp.asarray(surface_normal), jnp.asarray(idx), jnp.asarray(mask),
        jnp.float32(radius),
    )
    desc = np.asarray(desc)
    assert np.asarray(ok).all()

    for m in range(M):
        ref = shot_oracle_one(
            centers[m].astype(np.float64),
            frames[m].astype(np.float64),
            nbr[m][mask[m]].astype(np.float64),
            nrm[m][mask[m]].astype(np.float64),
            radius,
        )
        np.testing.assert_allclose(desc[m], ref, atol=2e-4, err_msg=f"kp {m}")


def test_shot_oracle_few_neighbors_invalid(rng):
    """<5 neighbors -> invalid descriptor (shot_debug.cpp:199-207)."""
    center = np.zeros((1, 3), np.float32)
    frame = np.eye(3, dtype=np.float32)[None]
    pts = rng.uniform(-0.5, 0.5, size=(4, 3)).astype(np.float32)
    nrm = np.tile(np.array([[0, 0, 1]], np.float32), (4, 1))
    idx = np.arange(4, dtype=np.int32)[None]
    mask = np.ones((1, 4), bool)
    desc, ok = shot_from_neighbors(
        jnp.asarray(center), jnp.asarray(frame), jnp.asarray(pts),
        jnp.asarray(nrm), jnp.asarray(idx), jnp.asarray(mask), jnp.float32(1.0),
    )
    assert not bool(np.asarray(ok)[0])
    assert np.all(np.asarray(desc)[0] == 0)


def test_shot_fused_onehot_matches_scatter(rng):
    """The TPU lowering (fused one-hot reduction, use_scatter=False) and the
    CPU lowering (segment-sum scatter) are the same math; they must agree to
    float32 round-off on identical inputs."""
    M, K = 16, 64
    radius = 0.8
    centers = rng.uniform(-2, 2, size=(M, 3)).astype(np.float32)
    frames = np.stack([_random_frame(rng) for _ in range(M)])
    dirs = rng.normal(size=(M, K, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    radii = radius * rng.uniform(0.05, 0.999, size=(M, K, 1)) ** (1 / 3)
    nbr = (centers[:, None, :] + dirs * radii).astype(np.float32)
    nrm = rng.normal(size=(M, K, 3))
    nrm = (nrm / np.linalg.norm(nrm, axis=-1, keepdims=True)).astype(np.float32)
    idx = np.arange(M * K, dtype=np.int32).reshape(M, K)
    mask = rng.uniform(size=(M, K)) > 0.1
    args = (
        jnp.asarray(centers), jnp.asarray(frames),
        jnp.asarray(nbr.reshape(M * K, 3)), jnp.asarray(nrm.reshape(M * K, 3)),
        jnp.asarray(idx), jnp.asarray(mask), jnp.float32(radius),
    )
    d_scatter, ok_s = shot_from_neighbors(*args, use_scatter=True)
    d_fused, ok_f = shot_from_neighbors(*args, use_scatter=False)
    np.testing.assert_array_equal(np.asarray(ok_s), np.asarray(ok_f))
    np.testing.assert_allclose(
        np.asarray(d_fused), np.asarray(d_scatter), atol=1e-6
    )
