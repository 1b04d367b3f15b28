"""tp-sharded feature stages: the row-sharded normals/ISS/FPFH pipeline
(parallel/batch._pair_step_tp) must reproduce the single-device flagship
step exactly — sharding the query rows and all_gathering the products is a
pure re-tiling of the same math (SURVEY §2.12: shard one pair across
chips)."""
import numpy as np
import jax
import jax.numpy as jnp

from tests.test_flagship_parallel import _args
from lidar_global_registration_tpu.models.flagship import (
    FlagshipConfig,
    register_pair_step,
)
from lidar_global_registration_tpu.parallel.batch import make_register_batch
from lidar_global_registration_tpu.parallel.mesh import make_mesh, pair_sharding


def _run_mesh(args, cfg, tp, vps=None):
    n_dev = 4 * tp
    mesh = make_mesh(n_dev, tp=tp)
    step = make_register_batch(mesh, cfg)
    B = mesh.shape["dp"]
    batched = []
    for a in args[:4]:
        batched.append(jnp.broadcast_to(a[None], (B,) + a.shape))
    keys = jnp.broadcast_to(args[4][None], (B,) + args[4].shape)
    scalars = jnp.broadcast_to(
        jnp.stack([jnp.asarray(s, jnp.float32) for s in args[5:]])[None], (B, 7)
    )
    if vps is None:
        vps_b = jnp.zeros((B, 2, 3), jnp.float32)  # origin ≡ viewpoint=None
    else:
        vps_b = jnp.broadcast_to(
            jnp.asarray(np.stack(vps), jnp.float32)[None], (B, 2, 3)
        )
    sh = pair_sharding(mesh)
    put = lambda x: jax.device_put(x, sh)
    T, inliers, n_corr = step(
        put(batched[0]), put(batched[1]), put(batched[2]), put(batched[3]),
        put(keys), put(scalars), put(vps_b),
    )
    return np.asarray(T), np.asarray(inliers), np.asarray(n_corr)


def test_tp2_matches_single_device():
    n = 1024
    cfg = FlagshipConfig(rounds=4, hypothesis_batch=256, use_iss=True)
    args = _args(n)
    out = register_pair_step(*args, cfg=cfg)
    T1 = np.asarray(out["transformation"])
    T2, inl2, nc2 = _run_mesh(args, cfg, tp=2)
    for b in range(T2.shape[0]):
        np.testing.assert_allclose(T2[b], T1, atol=1e-5)
        assert int(nc2[b]) == int(out["n_correspondences"])
        assert int(inl2[b]) == int(out["inliers"])
