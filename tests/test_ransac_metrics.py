"""Device-RANSAC metric selection (flagship.ransac_solve cfg.metric).

The reference's shipped sweep scores hypotheses with the UNIFORMITY metric
(data/tests.yaml `metric: uniformity`, metric.cpp:167-179) and gates
convergence on min_tolerable 0.3 (metric.h:98).  Round 2's device fast path
only supported correspondence counting; these tests cover the uniformity
path end-to-end and the correspondence-compaction invariance.
"""
import numpy as np
import jax
import jax.numpy as jnp

from lidar_global_registration_tpu.models.flagship import (
    FlagshipConfig,
    ransac_solve,
    register_pair_staged,
)
from lidar_global_registration_tpu.ops.transform import rotation_translation_error

from tests.test_flagship_parallel import _args


def _corr_fixture(rng, m=600, outlier_frac=0.55):
    """Known rigid transform + outliers, as masked correspondence arrays."""
    p = rng.uniform(-5, 5, size=(m, 3)).astype(np.float32)
    ang = 0.3
    R = np.array(
        [[np.cos(ang), 0, np.sin(ang)], [0, 1, 0], [-np.sin(ang), 0, np.cos(ang)]],
        np.float32,
    )
    t = np.array([0.7, -0.2, 1.1], np.float32)
    q = p @ R.T + t
    n_out = int(m * outlier_frac)
    q[:n_out] = rng.uniform(-5, 5, size=(n_out, 3)).astype(np.float32)
    perm = rng.permutation(m)
    return p[perm], q[perm], R, t


def test_uniformity_metric_recovers_pose(rng):
    p, q, R, t = _corr_fixture(rng)
    m = len(p)
    thr = jnp.full((m,), 0.05, jnp.float32)
    cvalid = jnp.ones((m,), bool)
    cfg = FlagshipConfig(rounds=8, hypothesis_batch=256, metric="uniformity")
    out = ransac_solve(jnp.asarray(p), jnp.asarray(q), thr, cvalid,
                       jax.random.PRNGKey(3), cfg)
    assert bool(out["converged"])
    T = np.asarray(out["transformation"])
    assert np.allclose(T[:3, :3], R, atol=1e-3)
    assert np.allclose(T[:3, 3], t, atol=1e-2)
    # the reported metric is the 3-axis projected entropy: in (0.3, 1]
    mv = float(out["metric"])
    assert 0.3 < mv <= 1.0, mv


def test_uniformity_min_tolerable_gate(rng):
    """Inliers concentrated in a tiny blob have near-zero projected entropy:
    the 0.3 min-tolerable gate must refuse convergence even though the
    inlier count clears the count gates (metric.h:98)."""
    rng2 = np.random.default_rng(7)
    m = 400
    # correspondences span the full extent, but only a tiny blob supports
    # the identity pose (the bins normalize to the correspondence bbox, so
    # concentration must be relative to the spread of the whole set)
    p = rng2.uniform(-5, 5, size=(m, 3)).astype(np.float32)
    p[: m // 2] = rng2.uniform(0, 1e-2, size=(m // 2, 3)) + 2.0
    q = rng2.uniform(-5, 5, size=(m, 3)).astype(np.float32)
    q[: m // 2] = p[: m // 2]
    thr = jnp.full((m,), 0.05, jnp.float32)
    cvalid = jnp.ones((m,), bool)
    cfg = FlagshipConfig(rounds=2, hypothesis_batch=128, metric="uniformity",
                         edge_thr=0.0)
    out = ransac_solve(jnp.asarray(p), jnp.asarray(q), thr, cvalid,
                       jax.random.PRNGKey(3), cfg)
    # count metric would converge here (every row is an inlier); uniformity
    # must not
    assert not bool(out["converged"])
    cfg_c = FlagshipConfig(rounds=2, hypothesis_batch=128,
                           metric="correspondences", edge_thr=0.0)
    out_c = ransac_solve(jnp.asarray(p), jnp.asarray(q), thr, cvalid,
                         jax.random.PRNGKey(3), cfg_c)
    assert bool(out_c["converged"])


def test_ransac_compact_invariance(rng):
    """Compacting the correspondence arrays to a prefix that still holds
    every valid row must not change the solution."""
    p, q, _R, _t = _corr_fixture(rng, m=500)
    pad = 2048
    pp = np.zeros((pad, 3), np.float32)
    qp = np.zeros((pad, 3), np.float32)
    pp[:500], qp[:500] = p, q
    thr = jnp.full((pad,), 0.05, jnp.float32)
    cvalid = jnp.arange(pad) < 500
    key = jax.random.PRNGKey(11)
    cfg_off = FlagshipConfig(rounds=4, hypothesis_batch=256, ransac_compact=0)
    cfg_on = FlagshipConfig(rounds=4, hypothesis_batch=256, ransac_compact=512)
    o1 = ransac_solve(jnp.asarray(pp), jnp.asarray(qp), thr, cvalid, key, cfg_off)
    o2 = ransac_solve(jnp.asarray(pp), jnp.asarray(qp), thr, cvalid, key, cfg_on)
    assert int(o1["n_correspondences"]) == int(o2["n_correspondences"]) == 500
    np.testing.assert_allclose(
        np.asarray(o1["transformation"]), np.asarray(o2["transformation"]),
        atol=1e-5,
    )
    assert int(o1["inliers"]) == int(o2["inliers"])


def test_staged_uniformity_end_to_end():
    """The staged pipeline runs metric: uniformity end-to-end (the
    reference-default scoring) and still registers the synthetic pair."""
    n = 2048
    cfg = FlagshipConfig(rounds=8, hypothesis_batch=512, use_iss=False,
                         metric="uniformity")
    out = register_pair_staged(*_args(n), cfg=cfg)
    assert bool(out["converged"])
    ang = 0.4
    R = np.array(
        [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]],
        np.float32,
    )
    t = np.array([2.0, -1.0, 0.5], np.float32)
    T_gt = np.eye(4, dtype=np.float32)
    T_gt[:3, :3] = R.T
    T_gt[:3, 3] = -R.T @ t
    r_err, t_err = rotation_translation_error(
        jnp.asarray(out["transformation"]), jnp.asarray(T_gt)
    )
    assert float(r_err) < 0.05
    assert float(t_err) < 0.6
