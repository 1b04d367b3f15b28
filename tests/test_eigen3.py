import numpy as np
import jax.numpy as jnp

from lidar_global_registration_tpu.ops.eigen3 import eigvals_sym3, eigh_sym3, smallest_eigvec_sym3


def random_sym(rng, n):
    A = rng.normal(size=(n, 3, 3)).astype(np.float32)
    return (A + np.swapaxes(A, -1, -2)) / 2


def test_eigvals_match_numpy(rng):
    A = random_sym(rng, 512)
    ours = np.asarray(eigvals_sym3(jnp.asarray(A)))
    ref = np.linalg.eigvalsh(A.astype(np.float64))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_eigvecs_are_eigvecs(rng):
    A = random_sym(rng, 512)
    eig, V = eigh_sym3(jnp.asarray(A))
    eig, V = np.asarray(eig), np.asarray(V)
    for k in range(3):
        Av = np.einsum("nij,nj->ni", A, V[:, :, k])
        lv = eig[:, k, None] * V[:, :, k]
        np.testing.assert_allclose(Av, lv, atol=5e-3)
    # Orthonormal
    G = np.einsum("nij,nik->njk", V, V)
    np.testing.assert_allclose(G, np.broadcast_to(np.eye(3), G.shape), atol=1e-4)


def test_smallest_eigvec(rng):
    A = random_sym(rng, 256)
    eig, v = smallest_eigvec_sym3(jnp.asarray(A))
    eig, v = np.asarray(eig), np.asarray(v)
    ref = np.linalg.eigvalsh(A.astype(np.float64))
    np.testing.assert_allclose(eig[:, 0], ref[:, 0], atol=2e-4, rtol=2e-4)
    Av = np.einsum("nij,nj->ni", A, v)
    np.testing.assert_allclose(Av, eig[:, :1] * v, atol=5e-3)


def test_degenerate_cases():
    A = np.stack([
        np.eye(3, dtype=np.float32),            # isotropic
        np.diag([2.0, 2.0, 1.0]).astype(np.float32),  # repeated max
        np.diag([3.0, 1.0, 1.0]).astype(np.float32),  # repeated min
        np.zeros((3, 3), np.float32),           # zero
    ])
    eig, V = eigh_sym3(jnp.asarray(A))
    eig, V = np.asarray(eig), np.asarray(V)
    assert np.all(np.isfinite(eig)) and np.all(np.isfinite(V))
    ref = np.linalg.eigvalsh(A.astype(np.float64))
    np.testing.assert_allclose(eig, ref, atol=3e-4)
    G = np.einsum("nij,nik->njk", V, V)
    np.testing.assert_allclose(G, np.broadcast_to(np.eye(3), G.shape), atol=1e-4)
