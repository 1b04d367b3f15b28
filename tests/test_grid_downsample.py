import numpy as np
import jax.numpy as jnp

from lidar_global_registration_tpu.types import Cloud
from lidar_global_registration_tpu.ops import grid as gridmod
from lidar_global_registration_tpu.ops.downsample import (
    aabb,
    aabb_diagonal,
    filter_duplicate_points,
    voxel_downsample,
)
from lidar_global_registration_tpu.ops.density import smoothed_densities, cloud_density


def brute_knn(pts, q, k, include_self):
    d = np.linalg.norm(pts[None, :, :] - q[:, None, :], axis=-1)
    if not include_self:
        same = d < 1e-12
        d = np.where(same, np.inf, d)
    idx = np.argsort(d, axis=1)[:, :k]
    return idx, np.take_along_axis(d, idx, axis=1)


def test_radius_neighbors_vs_bruteforce(rng):
    pts = rng.uniform(0, 10, size=(300, 3)).astype(np.float32)
    cloud = Cloud.from_numpy(pts)
    radius = 1.2
    g = gridmod.build_grid(cloud.xyz, cloud.valid, radius)
    idx, dist, mask = gridmod.radius_neighbors(
        g, cloud.xyz, cloud.valid, radius, k=32, cap=64
    )
    idx, dist, mask = np.asarray(idx), np.asarray(dist), np.asarray(mask)
    d_all = np.linalg.norm(pts[None] - pts[:, None], axis=-1)
    for i in range(pts.shape[0]):
        ref = set(np.nonzero(d_all[i] <= radius)[0].tolist())
        got = set(idx[i][mask[i]].tolist())
        if len(ref) <= 32:
            assert got == ref, f"query {i}: {got ^ ref}"
        # distances sorted ascending among valid entries
        dv = dist[i][mask[i]]
        assert np.all(np.diff(dv) >= -1e-6)


def test_knn_vs_bruteforce(rng):
    pts = rng.uniform(0, 4, size=(256, 3)).astype(np.float32)
    cloud = Cloud.from_numpy(pts)
    g = gridmod.build_grid(cloud.xyz, cloud.valid, 2.0)
    k = 8
    idx, dist, mask = gridmod.knn(
        g, cloud.xyz, cloud.valid, k, cap=128, include_self=False,
        query_index=jnp.arange(cloud.capacity, dtype=jnp.int32),
    )
    idx, dist, mask = np.asarray(idx), np.asarray(dist), np.asarray(mask)
    ridx, rdist = brute_knn(pts, pts, k, include_self=False)
    n = pts.shape[0]
    # cell=2.0 over a 4-unit box: the 27-cell envelope covers everything.
    np.testing.assert_allclose(dist[:n], rdist.astype(np.float32), atol=1e-4)
    assert mask[:n].all()


def test_knn_chunked_matches_unchunked(rng):
    pts = rng.uniform(0, 4, size=(250, 3)).astype(np.float32)
    cloud = Cloud.from_numpy(pts, capacity=256)
    g = gridmod.build_grid(cloud.xyz, cloud.valid, 2.0)
    a = gridmod.knn(g, cloud.xyz, cloud.valid, 4, cap=128)
    b = gridmod.knn(g, cloud.xyz, cloud.valid, 4, cap=128, chunk=64)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_voxel_downsample_weighted(rng):
    # Two clusters of known points; voxel large enough to merge each cluster.
    pts = np.array(
        [[0.1, 0.1, 0.1], [0.2, 0.1, 0.1], [5.0, 5.0, 5.0], [5.1, 5.0, 5.0], [5.0, 5.2, 5.0]],
        np.float32,
    )
    w = np.array([1.0, 3.0, 1.0, 1.0, 2.0], np.float32)
    cloud = Cloud.from_numpy(pts, weight=w, capacity=128)
    out = voxel_downsample(cloud, 1.0)
    v = np.asarray(out.valid)
    xyz = np.asarray(out.xyz)[v]
    wt = np.asarray(out.weight)[v]
    assert v.sum() == 2
    order = np.argsort(xyz[:, 0])
    xyz, wt = xyz[order], wt[order]
    np.testing.assert_allclose(wt, [4.0, 4.0])
    np.testing.assert_allclose(
        xyz[0], (1 * pts[0] + 3 * pts[1]) / 4.0, atol=1e-6
    )
    np.testing.assert_allclose(
        xyz[1], (pts[2] + pts[3] + 2 * pts[4]) / 4.0, atol=1e-6
    )


def test_voxel_downsample_weight_compounds(rng):
    pts = rng.uniform(0, 2, size=(500, 3)).astype(np.float32)
    cloud = Cloud.from_numpy(pts, capacity=512)
    d1 = voxel_downsample(cloud, 0.5)
    d2 = voxel_downsample(d1, 1.0)
    # Total weight is conserved through repeated downsampling.
    assert abs(float(np.asarray(d2.weight).sum()) - 500.0) < 1e-3
    assert int(np.asarray(d2.valid).sum()) <= int(np.asarray(d1.valid).sum())


def test_filter_duplicate_points():
    pts = np.array(
        [[0, 0, 0], [1, 1, 1], [0, 0, 0], [2, 2, 2], [1, 1, 1]], np.float32
    )
    cloud = Cloud.from_numpy(pts, capacity=128)
    out = filter_duplicate_points(cloud)
    v = np.asarray(out.valid)
    assert v.sum() == 3
    got = {tuple(p) for p in np.asarray(out.xyz)[v].tolist()}
    assert got == {(0.0, 0.0, 0.0), (1.0, 1.0, 1.0), (2.0, 2.0, 2.0)}


def test_aabb():
    pts = np.array([[0, -1, 2], [3, 4, -5]], np.float32)
    cloud = Cloud.from_numpy(pts, capacity=128)
    lo, hi = aabb(cloud)
    np.testing.assert_allclose(np.asarray(lo), [0, -1, -5])
    np.testing.assert_allclose(np.asarray(hi), [3, 4, 2])
    diag = float(np.asarray(aabb_diagonal(cloud)))
    np.testing.assert_allclose(diag, np.linalg.norm([3, 5, 7]), rtol=1e-6)


def test_smoothed_densities_regular_grid():
    # Regular 10x10 grid with spacing 1: every point's nearest non-self
    # neighbor is at distance 1, so smoothed density (k=2) == 1 everywhere.
    xs, ys = np.meshgrid(np.arange(10.0), np.arange(10.0))
    pts = np.stack([xs.ravel(), ys.ravel(), np.zeros(100)], axis=1).astype(np.float32)
    cloud = Cloud.from_numpy(pts)
    dens, _ = smoothed_densities(cloud, k=2)
    d = np.asarray(dens)[np.asarray(cloud.valid)]
    np.testing.assert_allclose(d, 1.0, atol=1e-5)
    # 0.8-quantile of 7th-non-self-NN distances: sqrt(2) interior, 2.0 at the
    # boundary (36/100 points) -> quantile lands in [sqrt(2), 2].
    assert np.sqrt(2.0) - 1e-5 <= cloud_density(cloud) <= 2.0 + 1e-5


def test_surface_area_estimate(rng):
    """Mesh-free surface area (reference calculateSurfaceArea analogue,
    main.cpp:118-150): a 20x20 plane patch has area 400."""
    from lidar_global_registration_tpu.analysis import surface_area
    from lidar_global_registration_tpu.types import Cloud

    pts = np.column_stack(
        [rng.uniform(0, 20, 20000), rng.uniform(0, 20, 20000), np.zeros(20000)]
    ).astype(np.float32)
    area = surface_area(Cloud.from_numpy(pts))
    assert abs(area - 400.0) / 400.0 < 0.15, area

    # sphere of radius 2: area = 4 pi r^2 ~ 50.27
    d = rng.normal(size=(20000, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    sph = (2.0 * d).astype(np.float32)
    area_s = surface_area(Cloud.from_numpy(sph))
    assert abs(area_s - 4 * np.pi * 4) / (4 * np.pi * 4) < 0.15, area_s


def test_voxel_centroids_matches_voxel_downsample():
    """The xyz-only fast path (loader pre-downsample) must equal the full
    weighted accumulator on unit-weight, normal-free clouds."""
    import numpy as np
    import jax.numpy as jnp
    from lidar_global_registration_tpu.ops.downsample import (
        voxel_centroids,
        voxel_downsample,
    )
    from lidar_global_registration_tpu.types import Cloud

    rng = np.random.default_rng(3)
    N, pad = 5000, 5120
    xyz = jnp.zeros((pad, 3), jnp.float32).at[:N].set(
        jnp.asarray(rng.uniform(0, 9, size=(N, 3)).astype(np.float32))
    )
    valid = jnp.arange(pad) < N
    z = jnp.zeros((pad,), jnp.float32)
    c = Cloud(xyz=xyz, normal=jnp.zeros_like(xyz), weight=z + 1.0,
              curvature=z, valid=valid)
    ref = voxel_downsample(c, 0.7)
    got_xyz, got_valid, got_n = voxel_centroids(xyz, valid, 0.7)
    np.testing.assert_array_equal(np.asarray(got_valid), np.asarray(ref.valid))
    np.testing.assert_allclose(
        np.asarray(got_xyz)[np.asarray(ref.valid)],
        np.asarray(ref.xyz)[np.asarray(ref.valid)], rtol=0, atol=1e-6,
    )
    assert int(got_n) == int(jnp.sum(ref.valid.astype(jnp.int32)))


def test_voxel_centroids_packed_matches():
    """Packed single-key sort path == 3-key lexsort path (the loader
    pre-downsample fast path), including through the host wrapper."""
    import numpy as np
    import jax.numpy as jnp
    from lidar_global_registration_tpu.models.flagship import (
        _aabb_pair,
        _voxel_bits,
    )
    from lidar_global_registration_tpu.ops.downsample import (
        voxel_centroids,
        voxel_centroids_packed,
    )

    rng = np.random.default_rng(5)
    N = 4096
    xyz = jnp.asarray(
        np.column_stack([
            rng.uniform(0, 11, N), rng.uniform(0, 7, N), rng.uniform(0, 2, N)
        ]).astype(np.float32)
    )
    valid = jnp.arange(N) < N - 128  # masked tail
    voxel = 0.55
    ref_xyz, ref_valid, ref_n = voxel_centroids(xyz, valid, voxel)
    aabb = np.asarray(_aabb_pair(xyz, valid, xyz, valid))
    bits = _voxel_bits(aabb[0, 0], aabb[0, 1], voxel)
    assert bits is not None
    origin = jnp.asarray(aabb[0, 0] - 0.5 * voxel, jnp.float32)
    got_xyz, got_valid, got_n = voxel_centroids_packed(
        xyz, valid, voxel, origin, bits
    )
    assert int(got_n) == int(ref_n)
    # packed output rows sit at run-first sorted positions (not compacted
    # to the front), but both paths emit voxels in z-major key order, so
    # the compacted sequences must match row for row
    np.testing.assert_allclose(
        np.asarray(got_xyz)[np.asarray(got_valid)],
        np.asarray(ref_xyz)[np.asarray(ref_valid)], rtol=0, atol=1e-5,
    )


def test_voxel_centroids_map_packed_matches():
    """voxel_centroids_map_packed == voxel_centroids_map: same front-
    compacted centroid rows in the same key order, same row_of map, same
    count.  Includes a deep-occupancy voxel (> the suffix-sum doubling cap
    of 64) so the lax.cond tail executes, and a masked pad tail so the
    dead sentinel run is exercised."""
    import numpy as np
    from lidar_global_registration_tpu.models.flagship import (
        _aabb_pair,
        _voxel_bits,
    )
    from lidar_global_registration_tpu.ops.downsample import (
        voxel_centroids_map,
        voxel_centroids_map_packed,
    )

    rng = np.random.default_rng(11)
    N = 4096
    pts = np.column_stack([
        rng.uniform(0, 11, N), rng.uniform(0, 7, N), rng.uniform(0, 2, N)
    ]).astype(np.float32)
    # 200 points inside ONE voxel: a run deeper than the doubling cap
    pts[1000:1200] = np.float32([5.2, 3.3, 1.1]) + rng.uniform(
        0, 0.05, (200, 3)
    ).astype(np.float32)
    xyz = jnp.asarray(pts)
    valid = jnp.arange(N) < N - 128  # masked pad tail
    voxel = 0.55
    ref_xyz, ref_valid, ref_row, ref_n = voxel_centroids_map(
        xyz, valid, voxel
    )
    aabb = np.asarray(_aabb_pair(xyz, valid, xyz, valid))
    bits = _voxel_bits(aabb[0, 0], aabb[0, 1], voxel)
    assert bits is not None
    got_xyz, got_valid, got_row, got_n = voxel_centroids_map_packed(
        xyz, valid, voxel, bits
    )
    assert int(got_n) == int(ref_n)
    np.testing.assert_array_equal(
        np.asarray(got_valid), np.asarray(ref_valid)
    )
    np.testing.assert_allclose(
        np.asarray(got_xyz)[np.asarray(got_valid)],
        np.asarray(ref_xyz)[np.asarray(ref_valid)], rtol=0, atol=1e-4,
    )
    v = np.asarray(valid)
    np.testing.assert_array_equal(
        np.asarray(got_row)[v], np.asarray(ref_row)[v]
    )


def test_voxel_centroids_packed_deep_run():
    """The capped suffix-sum's cond tail: one voxel holding ~all points
    (run length >> 64) still averages exactly."""
    import numpy as np
    from lidar_global_registration_tpu.ops.downsample import (
        voxel_centroids_packed,
    )

    rng = np.random.default_rng(3)
    N = 512
    pts = (np.float32([1.0, 1.0, 1.0])
           + rng.uniform(0, 0.2, (N, 3)).astype(np.float32))
    xyz = jnp.asarray(pts)
    valid = jnp.ones((N,), bool)
    voxel = 0.5
    origin = jnp.asarray([-0.25, -0.25, -0.25], jnp.float32)
    out_xyz, out_valid, n = voxel_centroids_packed(
        xyz, valid, voxel, origin, (4, 4, 4)
    )
    assert int(n) == 1
    got = np.asarray(out_xyz)[np.asarray(out_valid)][0]
    np.testing.assert_allclose(got, pts.mean(axis=0), rtol=0, atol=1e-5)
