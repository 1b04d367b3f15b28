"""10M-point grid planning guarantees (CPU, gated: ~2 min).

Locks in the scale properties the 10M-point north-star run relies on:
both derived grids choose the packed-row layout, every block fits R_pad,
point ids stay below the f32-exact 2^24 limit, and the per-side HBM
footprint (packed lanes + block outputs) stays under a v5e's 16 GiB.
"""
import os

import numpy as np
import pytest
import jax.numpy as jnp

from lidar_global_registration_tpu.ops.pallas import cellgrid as cg


@pytest.mark.slow
@pytest.mark.skipif(
    os.environ.get("LGR_BIG_TESTS") != "1",
    reason="~2 min / ~20 GB host RAM; set LGR_BIG_TESTS=1",
)
def test_plan_grid_at_10m_points():
    N = 10_485_760
    extent = 30.0 * np.sqrt(N / 2**20)  # bench scaling: density ~ TLS scan
    rng = np.random.default_rng(0)
    xy = rng.uniform(0, extent, (N, 2)).astype(np.float32)
    z = (0.6 * np.sin(xy[:, 0] * 0.5) * np.cos(xy[:, 1] * 0.4)).astype(
        np.float32
    )
    xyz = jnp.asarray(np.column_stack([xy, z]))
    valid = jnp.ones((N,), bool)
    spacing = extent / np.sqrt(N)
    z0 = jnp.zeros_like(xyz)
    pn, pf = cg.plan_grid_many([
        (xyz, z0, valid, max(4.0 * spacing, 2.5 * spacing)),
        (xyz, z0, valid, 8.0 * spacing),
    ])
    for p in (pn, pf):
        # terrain at any radius is thin-column: the packed layout must win
        assert p.packed
        assert p.m == 1
        tab, nb, prow, posb = cg._build_tab(p.state, p.C, p.SEG, p.R_pad,
                                            packed=True)
        assert int(nb) <= p.R_pad, (int(nb), p.R_pad)
        lanes_gib = (N + 2 * p.SEG) * 128 * 4 / 2**30
        out_gib = p.R_pad * p.C * 40 * 4 / 2**30
        assert lanes_gib + out_gib < 10.0, (lanes_gib, out_gib)
