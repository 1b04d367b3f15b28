"""Parity: the chunked sorted-rows pass runner vs the single-chunk path.

_run_pass_sorted splits a pass's table rows into fixed-size chunks (the
10M-scale memory-bounding layout) and assembles sorted-order rows via one
row gather + dynamic_update_slice per chunk.  Chunking is a pure
scheduling choice: with LGR_CHUNK_GIB forced tiny the same grid must
produce bit-identical features/keypoints to the unchunked run.
"""
import numpy as np
import jax.numpy as jnp


def _bump_cloud(n, rng):
    centers = rng.uniform([0, 0], [14, 14], size=(50, 2))
    widths = rng.uniform(0.3, 2.0, size=50)
    heights = rng.uniform(-1.0, 1.0, size=50)
    xy = rng.uniform([0, 0], [14, 14], size=(n, 2))
    z = np.zeros(n)
    for c, w, h in zip(centers, widths, heights):
        z += h * np.exp(-np.sum((xy - c) ** 2, axis=1) / (2 * w * w))
    return np.column_stack([xy, z]).astype(np.float32)


def test_chunked_fpfh_and_surface_match_unchunked(rng, monkeypatch):
    from lidar_global_registration_tpu.ops.pallas.cellgrid import (
        fpfh_cells,
        surface_iss_cells,
    )

    N = 3100
    xyz = jnp.asarray(_bump_cloud(N, rng))
    valid = jnp.ones((N,), bool)
    radius = 0.8

    # normals from the surface pass itself (chunk-invariant input)
    out_ref = surface_iss_cells(xyz, valid, radius, 0.5, interpret=True)
    normal = out_ref["normal"]
    feat_ref, fv_ref = fpfh_cells(xyz, normal, valid, radius, interpret=True)

    import jax

    monkeypatch.setenv("LGR_CHUNK_GIB", "0.00005")  # 8 table rows/chunk
    jax.clear_caches()  # env is read at trace time; force a re-trace
    out_c = surface_iss_cells(
        xyz + 0.0, valid, radius, 0.5, interpret=True
    )
    feat_c, fv_c = fpfh_cells(xyz + 0.0, normal, valid, radius, interpret=True)

    np.testing.assert_array_equal(np.asarray(fv_c), np.asarray(fv_ref))
    np.testing.assert_array_equal(np.asarray(feat_c), np.asarray(feat_ref))
    np.testing.assert_array_equal(
        np.asarray(out_c["kp"]), np.asarray(out_ref["kp"])
    )
    np.testing.assert_array_equal(
        np.asarray(out_c["normal"]), np.asarray(out_ref["normal"])
    )
    np.testing.assert_array_equal(
        np.asarray(out_c["density"]), np.asarray(out_ref["density"])
    )
