"""The packed-lane point-id encoding past 2^24 (VERDICT r3 #9).

Round 3 hard-failed the cell kernels at N >= 2^24 because point ids rode
the f32 id lane as plain casts (exact integers only to 2^24 — 16.7M
points/side, 1.6x the 10M bench).  The lane now carries a biased-bitcast
encoding (_encode_id_f32): positive NORMAL floats whose IEEE ordering
equals the id ordering, so the kernels' min/compare/select tie-breaks are
unchanged and the ceiling moves to 2^30.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from lidar_global_registration_tpu.ops.pallas.cellgrid import (
    _decode_id_f32,
    _encode_id_f32,
    plan_grid,
)


def test_id_encoding_roundtrip_and_order():
    ids = np.unique(np.concatenate([
        np.arange(0, 4096, dtype=np.int64),
        2 ** np.arange(1, 30, dtype=np.int64) - 1,
        2 ** np.arange(1, 30, dtype=np.int64),
        np.array([(1 << 30) - 1], dtype=np.int64),
        np.random.default_rng(0).integers(0, 1 << 30, 4096),
    ])).astype(np.int32)
    enc = np.asarray(_encode_id_f32(jnp.asarray(ids)))
    # all positive NORMAL floats: no TPU denormal-flush hazard, below BIG
    assert np.all(enc > 0)
    assert np.all(enc >= np.finfo(np.float32).tiny)
    assert np.all(enc < 3.0e38)
    # exact round-trip
    dec = np.asarray(_decode_id_f32(jnp.asarray(enc)))
    np.testing.assert_array_equal(dec, ids)
    # strict monotonicity: float compare == id compare (ids are sorted)
    assert np.all(np.diff(enc) > 0)


def test_surface_pass_nn_ids_unchanged(rng):
    """The surface pass's k=2 density smoothing consumes decoded NN ids;
    its values must be identical to the XLA-oracle density (the existing
    parity gate, re-checked here against the new encoding)."""
    from lidar_global_registration_tpu.models.flagship import (
        _smoothed_density,
    )
    from lidar_global_registration_tpu.ops.pallas.cellgrid import (
        surface_cells,
    )

    n = 4096
    xyz = rng.uniform(0, 10, (n, 3)).astype(np.float32)
    xyz[:, 2] *= 0.1
    valid = jnp.ones((n,), bool)
    cell = 0.6
    _normal, _curv, density = surface_cells(
        jnp.asarray(xyz), valid, cell, interpret=True
    )[:3]
    ref = _smoothed_density(jnp.asarray(xyz), valid, cell, 64)
    np.testing.assert_allclose(
        np.asarray(density), np.asarray(ref), rtol=1e-5, atol=1e-6
    )


@pytest.mark.slow
def test_plan_grid_past_2pow24():
    """plan_grid at N just past the OLD 2^24 ceiling builds a plan instead
    of raising (the round-3 guard); kernels are not launched — the plan
    (sort + stats + layout) is the part that was gated."""
    n = (1 << 24) + 4096
    rng = np.random.default_rng(1)
    xyz = np.empty((n, 3), np.float32)
    xyz[:, 0] = rng.uniform(0, 400, n)
    xyz[:, 1] = rng.uniform(0, 400, n)
    xyz[:, 2] = rng.uniform(0, 4, n)
    plan = plan_grid(
        jnp.asarray(xyz), jnp.zeros_like(jnp.asarray(xyz)),
        jnp.ones((n,), bool), 2.0
    )
    assert plan.n_valid == n
