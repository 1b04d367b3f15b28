"""Parity: fused Pallas cell-ISS passes vs the XLA grid-query ISS."""
import numpy as np
import jax.numpy as jnp

from lidar_global_registration_tpu.ops.iss import iss_keypoints
from lidar_global_registration_tpu.ops.pallas.cellgrid import iss_cells
from lidar_global_registration_tpu.types import Cloud


def _boxy_cloud(rng, n_ground=2500, n_box=900):
    """Ground plane + a box: edges/corners produce genuine ISS keypoints."""
    g = np.column_stack(
        [rng.uniform(0, 8, n_ground), rng.uniform(0, 8, n_ground), np.zeros(n_ground)]
    )
    faces = []
    o = np.array([3.0, 3.0, 0.0])
    s = np.array([1.5, 1.0, 1.2])
    per = n_box // 5
    for eu, ev, off in [
        ([s[0], 0, 0], [0, 0, s[2]], [0, 0, 0]),
        ([s[0], 0, 0], [0, 0, s[2]], [0, s[1], 0]),
        ([0, s[1], 0], [0, 0, s[2]], [0, 0, 0]),
        ([0, s[1], 0], [0, 0, s[2]], [s[0], 0, 0]),
        ([s[0], 0, 0], [0, s[1], 0], [0, 0, s[2]]),
    ]:
        uv = rng.uniform(size=(per, 2))
        faces.append(o + off + uv[:, :1] * np.asarray(eu) + uv[:, 1:] * np.asarray(ev))
    pts = np.concatenate([g] + faces)
    # scanner-like noise: exactly planar patches make the lambda3 > 0 gamma
    # decision an fp coin flip (lambda3 ~ 1e-10 of either sign); real scans
    # are never exact and neither implementation should be judged on it
    pts += rng.normal(scale=0.004, size=pts.shape)
    return pts.astype(np.float32)


def test_cell_iss_matches_xla(rng):
    pts = _boxy_cloud(rng)
    N = len(pts)
    pad = 1 << (N - 1).bit_length()
    xyz = jnp.zeros((pad, 3), jnp.float32).at[:N].set(jnp.asarray(pts))
    valid = jnp.arange(pad) < N
    radius = 0.35

    cloud = Cloud.from_numpy(pts)
    # re-pad to the same capacity so indices line up
    if cloud.capacity != pad:
        import jax.numpy as _j
        cloud = Cloud(
            xyz=xyz, normal=_j.zeros((pad, 3)), weight=_j.ones((pad,)),
            curvature=_j.zeros((pad,)), valid=valid,
        )
    # XLA reference with caps high enough that nothing truncates
    kp_ref, sal_ref = iss_keypoints(
        cloud, radius, cap_per_cell=128, k_neighbors=128
    )
    kp_c, sal_c = iss_cells(xyz, valid, radius, interpret=True, exact=True)

    kp_ref = np.asarray(kp_ref) & np.asarray(valid)
    kp_c = np.asarray(kp_c)
    sal_ref = np.asarray(sal_ref)
    sal_c = np.asarray(sal_c)

    # saliency parity where the gamma tests passed in both
    on = (sal_ref > 0) & (sal_c > 0)
    np.testing.assert_allclose(sal_c[on], sal_ref[on], rtol=2e-3, atol=3e-7)
    # the gamma decision may flip for values straddling 0.975 in f32; demand
    # near-total agreement and identical keypoint sets modulo those flips
    flip = (sal_ref > 0) != (sal_c > 0)
    assert flip.mean() < 5e-3, flip.mean()
    agree = kp_ref == kp_c
    assert agree.mean() > 0.995, agree.mean()
    assert kp_ref.sum() > 10  # the fixture must actually produce keypoints
    both = kp_ref & kp_c
    assert both.sum() >= 0.9 * max(kp_ref.sum(), kp_c.sum())
