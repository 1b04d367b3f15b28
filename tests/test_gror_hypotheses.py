import numpy as np
import jax.numpy as jnp

from lidar_global_registration_tpu.types import AlignmentParameters, Cloud, Correspondences
from lidar_global_registration_tpu.models.gror import align_gror
from lidar_global_registration_tpu.models.hypotheses import (
    choose_best_hypothesis,
    update_hypotheses,
)
from lidar_global_registration_tpu.ops.transform import rotation_translation_error


def random_rigid(rng):
    A = rng.normal(size=(3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = Q
    T[:3, 3] = rng.normal(size=3) * 5
    return T


def make_problem(rng, n_inliers=60, n_outliers=60, noise=0.01):
    T = random_rigid(rng)
    src_pts = rng.uniform(-5, 5, size=(n_inliers + n_outliers, 3)).astype(np.float32)
    tgt_pts = (src_pts @ T[:3, :3].T + T[:3, 3]).astype(np.float32)
    tgt_pts += noise * rng.normal(size=tgt_pts.shape).astype(np.float32)
    match = np.arange(n_inliers + n_outliers)
    match[n_inliers:] = rng.permutation(n_outliers) + n_inliers
    src = Cloud.from_numpy(src_pts)
    tgt = Cloud.from_numpy(tgt_pts)
    M = 128
    corrs = Correspondences(
        query=jnp.asarray(np.pad(np.arange(len(match)), (0, M - len(match))).astype(np.int32)),
        match=jnp.asarray(np.pad(match, (0, M - len(match))).astype(np.int32)),
        distance=jnp.zeros((M,), jnp.float32),
        threshold=jnp.full((M,), 0.1, jnp.float32),
        valid=jnp.asarray(np.arange(M) < len(match)),
    )
    return T, src, tgt, corrs


def test_gror_recovers_transform(rng):
    T, src, tgt, corrs = make_problem(rng)
    params = AlignmentParameters(distance_thr=0.05)
    res = align_gror(src, tgt, corrs, params)
    r, t = rotation_translation_error(jnp.asarray(res.transformation), jnp.asarray(T))
    assert float(r) < 2e-2, float(r)
    assert float(t) < 1e-1, float(t)
    assert res.converged


def test_update_hypotheses_pool():
    params = AlignmentParameters(distance_thr=0.1)
    tns, metrics = [], []
    T0 = np.eye(4, dtype=np.float32)
    update_hypotheses(tns, metrics, T0, 1.0, params)
    assert len(tns) == 1
    # similar hypothesis with lower metric is rejected
    T1 = T0.copy()
    T1[:3, 3] = [0.01, 0, 0]
    update_hypotheses(tns, metrics, T1, 0.5, params)
    assert len(tns) == 1 and metrics[0] == 1.0
    # similar with higher metric replaces
    update_hypotheses(tns, metrics, T1, 2.0, params)
    assert len(tns) == 1 and metrics[0] == 2.0
    # dissimilar hypothesis appended (rotation > 20 deg)
    ang = 0.8
    T2 = np.eye(4, dtype=np.float32)
    T2[:3, :3] = np.array(
        [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]]
    )
    update_hypotheses(tns, metrics, T2, 1.0, params)
    assert len(tns) == 2
    # far-too-weak hypothesis is ignored
    T3 = T2.copy()
    T3[:3, 3] = [50, 0, 0]
    update_hypotheses(tns, metrics, T3, 0.01, params)
    assert len(tns) == 2
    # a new much-better hypothesis prunes weak ones
    T4 = np.eye(4, dtype=np.float32)
    T4[:3, :3] = T2[:3, :3].T
    update_hypotheses(tns, metrics, T4, 100.0, params)
    assert all(m >= 0.1 * 100.0 for m in metrics)


def test_choose_best_hypothesis_prefers_true_transform(rng, tmp_path):
    T, src, tgt, corrs = make_problem(rng, n_inliers=80, n_outliers=20)
    wrong = random_rigid(rng)
    params = AlignmentParameters(
        distance_thr=0.1, testname="hyp", dir_path=str(tmp_path), ground_truth=T
    )
    import os

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        best = choose_best_hypothesis(src, tgt, corrs, params, [wrong, T])
    finally:
        os.chdir(cwd)
    r, t = rotation_translation_error(jnp.asarray(best), jnp.asarray(T))
    assert float(r) < 1e-4 and float(t) < 1e-4


def test_gror_edge_search_matches_brute_force(rng):
    """The RCFS-pruned round search must return the same optimum (TCFS
    count) as exhaustive TCFS over every candidate edge — the 'optimal'
    guarantee of GROR (ia_gror.hpp:199-258)."""
    import jax.numpy as jnp
    from lidar_global_registration_tpu.models.gror import (
        _edge_search,
        _node_degrees,
        _tcfs_stab,
        _two_point_align,
    )

    T, src, tgt, corrs = make_problem(rng, n_inliers=40, n_outliers=80, noise=0.02)
    corrs = corrs.compact()
    p = src.xyz[corrs.query]
    q = tgt.xyz[corrs.match]
    valid = corrs.valid
    resolution = 0.05

    _deg, adj = _node_degrees(p, q, valid, resolution)
    adj_np = np.asarray(adj)
    upper = np.triu(adj_np, 1)
    qualify = np.nonzero(upper.sum(1) >= 10)[0]
    assert len(qualify) > 16
    partners = np.argmax(
        np.where(upper[qualify], adj_np.sum(1)[None, :], -1), axis=1
    )
    i1 = jnp.asarray(qualify.astype(np.int64))
    i2 = jnp.asarray(partners.astype(np.int64))

    # pruned search with small rounds
    _be, best_pruned, _ba, rounds, R, t, axis, origin = _edge_search(
        p, q, valid, resolution, i1, i2, edge_batch=16
    )
    # exhaustive: TCFS over every edge in one batch
    _angles, counts = _tcfs_stab(R, t, axis, origin, p, q, valid, resolution)
    best_exhaustive = int(np.asarray(counts).max())

    assert best_pruned == best_exhaustive
    # the prune must actually skip work on this fixture (inliers dominate)
    assert rounds < -(-len(qualify) // 16)


def test_gror_all_outliers_does_not_converge(rng):
    """Pure-noise correspondences must not report success: the converged
    gate requires refined inlier support >= the edge qualification floor."""
    src_pts = rng.uniform(-5, 5, size=(120, 3)).astype(np.float32)
    tgt_pts = rng.uniform(-5, 5, size=(120, 3)).astype(np.float32)
    src = Cloud.from_numpy(src_pts)
    tgt = Cloud.from_numpy(tgt_pts)
    M = 128
    corrs = Correspondences(
        query=jnp.asarray(np.pad(np.arange(120), (0, M - 120)).astype(np.int32)),
        match=jnp.asarray(np.pad(rng.permutation(120), (0, M - 120)).astype(np.int32)),
        distance=jnp.zeros((M,), jnp.float32),
        threshold=jnp.full((M,), 0.1, jnp.float32),
        valid=jnp.asarray(np.arange(M) < 120),
    )
    params = AlignmentParameters(distance_thr=0.02)
    res = align_gror(src, tgt, corrs, params)
    assert not res.converged


def test_degrees_chunked_parity(rng):
    """_degrees_only (row-chunked, no [n,n] adjacency) == _node_degrees."""
    from lidar_global_registration_tpu.models.gror import (
        _degrees_only,
        _node_degrees,
    )

    n = 517  # not a chunk multiple: exercises the padded tail
    p = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    valid = jnp.asarray(rng.random(n) < 0.85)
    got = np.asarray(_degrees_only(p, q, valid, 0.4, chunk=128))
    want, _ = _node_degrees(p, q, valid, 0.4)
    np.testing.assert_array_equal(got, np.asarray(want))


def test_tcfs_stab_count_realized_at_angle(rng):
    """THE stab invariant: composing rot(axis, returned_angle) with the
    edge transform must realize the returned count as actual inliers
    (d < 2*resolution).  Guards the event-sort tie-break: a float key
    `loc*2 - is_start` once dragged starts up to 0.5 rad early, reporting
    a spurious count at a wrong angle (85 vs the true 84 on a zero-noise
    edge) that refined to 3 inliers."""
    import jax.numpy as jnp
    from lidar_global_registration_tpu.models.gror import (
        _axis_rotation,
        _tcfs_stab,
        _two_point_align,
    )

    for noise in (0.0, 0.01):
        n = 100
        p = rng.uniform(0, 5.0, (n, 3)).astype(np.float32)
        ang = 0.7
        R_gt = np.array(
            [[np.cos(ang), 0, np.sin(ang)],
             [0, 1, 0],
             [-np.sin(ang), 0, np.cos(ang)]], np.float32,
        )
        t_gt = np.array([0.5, -1.0, 2.0], np.float32)
        q = (p @ R_gt.T + t_gt).astype(np.float32)
        q += noise * rng.normal(size=q.shape).astype(np.float32)
        n_out = 30
        q[:n_out] = rng.uniform(0, 5.0, (n_out, 3)).astype(np.float32)
        res = 0.05
        valid = jnp.ones((n,), bool)

        # a handful of inlier edges
        pairs = [(40, 80), (55, 99), (33, 66), (90, 48)]
        i1 = np.array([a for a, _ in pairs])
        i2 = np.array([b for _, b in pairs])
        R, t, axis, origin = _two_point_align(
            jnp.asarray(p[i1]), jnp.asarray(q[i1]),
            jnp.asarray(p[i2]), jnp.asarray(q[i2]),
        )
        angles, counts = _tcfs_stab(
            R, t, axis, origin, jnp.asarray(p), jnp.asarray(q), valid, res
        )
        angles, counts = np.asarray(angles), np.asarray(counts)
        rot = np.asarray(_axis_rotation(axis, jnp.asarray(angles)))
        Rb, tb, org = np.asarray(R), np.asarray(t), np.asarray(origin)
        for e in range(len(pairs)):
            Rf = rot[e] @ Rb[e]
            tf = rot[e] @ (tb[e] - org[e]) + org[e]
            d = np.linalg.norm(q - (p @ Rf.T + tf), axis=1)
            realized = int((d < 2 * res).sum())
            # the stab count must NEVER exceed what its angle realizes
            # (ends-before-starts tie-break guarantees the open-gap count);
            # one count of headroom upward for f32 midpoint rounding
            assert int(counts[e]) <= realized <= int(counts[e]) + 1, (
                f"edge {e}: stab count {counts[e]} vs realized {realized} "
                f"at angle {angles[e]:.4f} (noise {noise})"
            )
            # and the true inlier population is found
            assert int(counts[e]) >= n - n_out - 2, (counts[e], noise)
