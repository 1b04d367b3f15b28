"""Metric estimators vs literal NumPy oracles (reference formulas from
src/metric.cpp / src/analysis.cpp)."""
import numpy as np
import jax.numpy as jnp

from lidar_global_registration_tpu.ops import metrics as M


def test_score_functions(rng):
    d = rng.uniform(0.01, 1.0, size=100).astype(np.float32)
    t = rng.uniform(0.5, 2.0, size=100).astype(np.float32)
    dj, tj = jnp.asarray(d), jnp.asarray(t)
    np.testing.assert_allclose(np.asarray(M.score_values(dj, tj, "constant")), 1.0)
    np.testing.assert_allclose(
        np.asarray(M.score_values(dj, tj, "mae")), np.abs(d - t) / t, rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(M.score_values(dj, tj, "mse")), (d - t) ** 2 / t**2, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(M.score_values(dj, tj, "exp")),
        np.exp(-(d**2) / (2 * t**2)),
        rtol=1e-5,
    )


def test_corr_metric_oracle(rng):
    Mn = 200
    p = rng.normal(size=(Mn, 3)).astype(np.float32)
    q = rng.normal(size=(Mn, 3)).astype(np.float32)
    thr = rng.uniform(0.5, 3.0, size=Mn).astype(np.float32)
    valid = rng.random(Mn) < 0.9
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = [0.1, -0.2, 0.3]
    R = T[None, :3, :3]
    t = T[None, :3, 3]
    metric, cnt, rmse, mask, dist = M.corr_metric(
        jnp.asarray(R), jnp.asarray(t), jnp.asarray(p), jnp.asarray(q),
        jnp.asarray(thr), jnp.asarray(valid), "mse",
    )
    d = np.linalg.norm(p @ T[:3, :3].T + T[:3, 3] - q, axis=1)
    inl = (d < thr) & valid
    assert int(cnt[0]) == int(inl.sum())
    score = np.sum(((d[inl] - thr[inl]) ** 2) / thr[inl] ** 2)
    np.testing.assert_allclose(float(metric[0]), score / valid.sum(), rtol=1e-4)
    exp_rmse = np.sqrt(np.mean(d[inl] ** 2))
    np.testing.assert_allclose(float(rmse[0]), exp_rmse, rtol=1e-5)


def test_uniformity_entropy_oracle(rng):
    Mn = 500
    p = rng.uniform(0, 10, size=(Mn, 3)).astype(np.float32)
    mask = rng.random(Mn) < 0.7
    lo = jnp.asarray(np.zeros(3, np.float32))
    hi = jnp.asarray(np.full(3, 10.0, np.float32))
    bins3 = M.uniformity_bins(jnp.asarray(p), lo, hi)
    ent = M.uniformity_entropy(jnp.asarray(mask[None, :]), bins3)

    # literal reference reimplementation (analysis.cpp:96-130)
    NB = M.N_BINS
    b = np.minimum(np.floor(p / 10.0 * NB), NB - 1).astype(int)
    sel = b[mask]
    es = []
    for k in range(3):
        h = np.zeros((NB, NB))
        for row in sel:
            h[row[(k + 1) % 3], row[(k + 2) % 3]] += 1
        pr = h / mask.sum()
        e = -np.sum(pr[pr > 0] * np.log(pr[pr > 0])) / np.log(NB * NB)
        es.append(e)
    np.testing.assert_allclose(float(ent[0]), np.cbrt(np.prod(es)), rtol=1e-4)


def test_estimate_max_iterations_formula():
    # supporting fraction f=0.4 -> pessimistic 0.1; iters = ln(1e-3)/ln(1-1e-3)
    sup = jnp.asarray(40.0)
    iters = M.estimate_max_iterations(sup, jnp.asarray(100.0), 0.999, 3)
    expected = np.log(1 - 0.999) / np.log(1 - 0.1**3)
    np.testing.assert_allclose(float(iters), expected, rtol=1e-3)
    # zero support -> effectively unbounded
    assert float(M.estimate_max_iterations(jnp.asarray(0.0), jnp.asarray(100.0), 0.999, 3)) > 1e9


def test_closest_plane_metric_plane(rng):
    """Points over a plane: every sample within threshold is an inlier and
    the point-to-plane distance equals |z|."""
    from lidar_global_registration_tpu.ops import grid as gridmod

    n = 2000  # spacing ~0.22 < search radius 0.4, so every sample finds a NN
    xy = rng.uniform(0, 10, size=(n, 2)).astype(np.float32)
    tgt = np.column_stack([xy, np.zeros(n)]).astype(np.float32)
    tgt_normal = np.tile(np.array([[0, 0, 1.0]], np.float32), (n, 1))
    s = 64
    sample = np.column_stack(
        [rng.uniform(1, 9, size=(s, 2)), rng.uniform(-0.05, 0.05, size=(s, 1))]
    ).astype(np.float32)
    thr = 0.2
    g = gridmod.build_grid(jnp.asarray(tgt), jnp.ones(n, bool), 2.0 * thr)
    R = jnp.asarray(np.eye(3, dtype=np.float32)[None])
    t = jnp.asarray(np.zeros((1, 3), np.float32))
    metric, cnt, rmse = M.closest_plane_metric(
        R, t, jnp.asarray(sample), jnp.ones(s, bool), g, jnp.asarray(tgt_normal),
        thr, "constant", denom=float(s),
    )
    assert int(cnt[0]) == s
    np.testing.assert_allclose(float(metric[0]), 1.0, rtol=1e-5)
    exp_rmse = np.sqrt(np.mean(sample[:, 2] ** 2))
    np.testing.assert_allclose(float(rmse[0]), exp_rmse, rtol=2e-2)
