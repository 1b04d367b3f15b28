"""Pallas NN kernel vs the XLA matcher (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp

from lidar_global_registration_tpu.ops.matchers import match_bf
from lidar_global_registration_tpu.ops.pallas.topk_l2 import nn_l2_pallas


def test_pallas_nn_matches_xla(rng):
    Nq, Nt, D = 200, 333, 33
    q = rng.normal(size=(Nq, D)).astype(np.float32)
    t = rng.normal(size=(Nt, D)).astype(np.float32)
    qv = np.ones(Nq, bool)
    tv = np.ones(Nt, bool)
    tv[17] = False
    pi, pd, pm = nn_l2_pallas(
        jnp.asarray(q), jnp.asarray(t), jnp.asarray(qv), jnp.asarray(tv),
        tile_q=64, tile_t=128, interpret=True,
    )
    xi, xd, xm = match_bf(jnp.asarray(q), jnp.asarray(t), jnp.asarray(qv), jnp.asarray(tv), k=1)
    np.testing.assert_array_equal(np.asarray(pm), np.asarray(xm[:, 0]))
    np.testing.assert_allclose(np.asarray(pd), np.asarray(xd[:, 0]), rtol=1e-5, atol=1e-5)
    # index agreement where distances are unambiguous
    amb = np.abs(np.asarray(pd) - np.asarray(xd[:, 0])) > 1e-6
    np.testing.assert_array_equal(np.asarray(pi)[~amb], np.asarray(xi[:, 0])[~amb])


def test_pallas_nn_invalid_queries(rng):
    q = rng.normal(size=(64, 16)).astype(np.float32)
    t = rng.normal(size=(64, 16)).astype(np.float32)
    qv = np.zeros(64, bool)
    qv[:10] = True
    pi, pd, pm = nn_l2_pallas(
        jnp.asarray(q), jnp.asarray(t), jnp.asarray(qv),
        jnp.ones(64, bool), tile_q=32, tile_t=32, interpret=True,
    )
    assert np.asarray(pm)[:10].all()
    assert not np.asarray(pm)[10:].any()
