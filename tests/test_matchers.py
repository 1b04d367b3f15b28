"""Matcher-backend parity: the reference's testing centerpiece
(tests/flann_bf_matcher.cpp): matchBF == matchFLANN == matchLocal(identity
guess, unbounded radius) index-for-index, both directions.  In the TPU
framework BF and FLANN collapse into one kernel (match_bf); we test it
against a NumPy oracle and against match_local, and the tiled path against
the single-tile path."""
import numpy as np
import jax.numpy as jnp

from lidar_global_registration_tpu.ops.matchers import match_bf, match_local


def oracle_knn(q, t, k, tvalid):
    d = np.linalg.norm(q[:, None, :] - t[None, :, :], axis=-1)
    d = np.where(tvalid[None, :], d, np.inf)
    idx = np.argsort(d, axis=1, kind="stable")[:, :k]
    return idx, np.take_along_axis(d, idx, axis=1)


def test_match_bf_vs_oracle(rng):
    Nq, Nt, D, k = 100, 173, 33, 3
    q = rng.normal(size=(Nq, D)).astype(np.float32)
    t = rng.normal(size=(Nt, D)).astype(np.float32)
    qv = np.ones(Nq, bool)
    tv = np.ones(Nt, bool)
    tv[5] = False
    idx, dist, mask = match_bf(
        jnp.asarray(q), jnp.asarray(t), jnp.asarray(qv), jnp.asarray(tv), k=k, tile=64
    )
    ridx, rdist = oracle_knn(q, t, k, tv)
    assert np.asarray(mask).all()
    np.testing.assert_allclose(np.asarray(dist), rdist, atol=1e-4, rtol=1e-4)
    # indices equal where distances are unambiguous
    amb = np.abs(rdist - np.asarray(dist)) > 1e-6
    np.testing.assert_array_equal(np.asarray(idx)[~amb], ridx[~amb])


def test_match_bf_tiling_invariance(rng):
    Nq, Nt, D = 64, 300, 16
    q = rng.normal(size=(Nq, D)).astype(np.float32)
    t = rng.normal(size=(Nt, D)).astype(np.float32)
    v = jnp.ones(max(Nq, Nt), bool)
    a = match_bf(jnp.asarray(q), jnp.asarray(t), v[:Nq], v[:Nt], k=1, tile=32)
    b = match_bf(jnp.asarray(q), jnp.asarray(t), v[:Nq], v[:Nt], k=1, tile=512)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]), atol=1e-5)


def test_match_local_identity_equals_bf(rng):
    """matchLocal with identity guess + unbounded radius must agree with BF
    (flann_bf_matcher.h:70-89)."""
    N, D = 80, 8
    xyz_q = rng.uniform(0, 3, size=(N, 3)).astype(np.float32)
    xyz_t = rng.uniform(0, 3, size=(N, 3)).astype(np.float32)
    fq = rng.normal(size=(N, D)).astype(np.float32)
    ft = rng.normal(size=(N, D)).astype(np.float32)
    v = jnp.ones(N, bool)
    bf_idx, bf_dist, bf_mask = match_bf(jnp.asarray(fq), jnp.asarray(ft), v, v, k=1)
    lo_idx, lo_dist, lo_mask = match_local(
        jnp.asarray(xyz_q),
        v,
        jnp.asarray(fq),
        jnp.asarray(xyz_t),
        v,
        jnp.asarray(ft),
        jnp.eye(4, dtype=jnp.float32),
        search_radius=100.0,
        k=1,
        cand=N,
        cap=N,
    )
    assert np.asarray(lo_mask).all()
    np.testing.assert_array_equal(np.asarray(bf_idx), np.asarray(lo_idx))
    np.testing.assert_allclose(np.asarray(bf_dist), np.asarray(lo_dist), atol=1e-4)


def test_knn_merge_semantics(rng):
    """Port of tests/knn_result.cpp: the bounded k-list keeps the k smallest
    distances in ascending order as candidates stream in tile by tile."""
    t = np.array([[float(i)] for i in [9, 3, 7, 1, 8, 2, 5, 6, 0, 4]], np.float32)
    q = np.zeros((1, 1), np.float32)
    v1 = jnp.ones(1, bool)
    vt = jnp.ones(len(t), bool)
    for k in (1, 3, 5):
        idx, dist, mask = match_bf(jnp.asarray(q), jnp.asarray(t), v1, vt, k=k, tile=4)
        d = np.asarray(dist)[0]
        assert np.all(np.diff(d) >= 0)  # ascending
        np.testing.assert_allclose(d, np.arange(k, dtype=np.float32), atol=1e-6)
        # returned indices point at the points with values 0..k-1
        np.testing.assert_allclose(np.sort(t[np.asarray(idx)[0], 0]), np.arange(k))
