"""Packed-row layout parity: on thin-z (2.5D) grids, query blocks pack
consecutive cells of one x-slab into full C-point windows instead of one
mostly-empty 128-lane tile per cell (sparse grids paid >10x slot, DMA and
compute waste).  Candidate spans cover the block's whole [ky_lo, ky_hi]
range, so packing must never change any query's value.

Reference behavior being preserved: radius neighborhoods identical to
pcl's radiusSearch over a voxel hash (common.h:322-332) — the layout is a
pure scheduling decision.
"""
import numpy as np
import jax.numpy as jnp

from lidar_global_registration_tpu.ops.pallas import cellgrid as cg


def _thin_cloud(n, rng, extent=14.0):
    xy = rng.uniform(0, extent, (n, 2))
    z = 0.4 * np.sin(xy[:, 0] * 0.8) * np.cos(xy[:, 1] * 0.6)
    z = z + 0.03 * rng.normal(size=n)
    return np.column_stack([xy, z]).astype(np.float32)


def _two_plans(xyz, valid, r):
    """(unpacked plan, packed plan) over the SAME sorted state."""
    state, stats = cg._stats_device(xyz, jnp.zeros_like(xyz), valid, r,
                                    exact=True)
    st = np.asarray(stats).astype(np.int64)
    st_u = st.copy()
    st_u[cg._ST_PACK] = 0  # force the per-cell sizing path
    pl_p = cg._plan_from_stats(state, st)
    pl_u = cg._plan_from_stats(state, st_u)
    assert pl_p.packed, "thin fixture must choose the packed layout"
    assert not pl_u.packed
    # the packed layout must be materially denser (fewer table rows)
    assert pl_p.R_pad * 4 <= pl_u.R_pad, (pl_p.R_pad, pl_u.R_pad)
    return pl_u, pl_p


def _run_side(pl, packed):
    r2 = jnp.float32(0.35 * 0.35)
    return cg._surface_iss_impl(
        pl.state, r2, r2, jnp.float32(0.975), jnp.float32(0.975),
        jnp.zeros((3,), jnp.float32), C=pl.C, SEG=pl.SEG, R_pad=pl.R_pad,
        interpret=True, do_surface=True, do_iss=True, min_neighbors=4,
        packed_rows=packed,
    )


def test_packed_rows_match_unpacked(rng):
    N = 6000
    xyz = jnp.asarray(_thin_cloud(N, rng))
    valid = jnp.ones((N,), bool)
    pl_u, pl_p = _two_plans(xyz, valid, 0.35)
    out_u = _run_side(pl_u, False)
    out_p = _run_side(pl_p, True)
    np.testing.assert_array_equal(np.asarray(out_u["ok"]),
                                  np.asarray(out_p["ok"]))
    np.testing.assert_array_equal(np.asarray(out_u["kp"]),
                                  np.asarray(out_p["kp"]))
    # same neighbor sets; only the block-mean centering anchor differs.
    # Eigen-degenerate neighborhoods (l0 ~ l1) have ill-conditioned
    # eigenvectors, so a tiny rounding change can swing those normals —
    # everything else must agree tightly.
    dots = np.abs(np.sum(np.asarray(out_u["normal"])
                         * np.asarray(out_p["normal"]), axis=1))
    ok = np.asarray(out_u["ok"])
    assert (dots[ok] > 0.999).mean() > 0.998, (dots[ok] > 0.999).mean()
    np.testing.assert_allclose(np.asarray(out_u["curv"]),
                               np.asarray(out_p["curv"]),
                               rtol=0, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out_u["density"]),
                               np.asarray(out_p["density"]),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_u["saliency"]),
                               np.asarray(out_p["saliency"]),
                               rtol=5e-3, atol=1e-5)


def test_packed_rows_fpfh_bit_identical(rng):
    """The SPFH anchor is grid-independent (cloud AABB center), so FPFH
    must agree BIT-FOR-BIT across layouts."""
    N = 6000
    xyz = jnp.asarray(_thin_cloud(N, rng))
    valid = jnp.ones((N,), bool)
    pl_u, pl_p = _two_plans(xyz, valid, 0.35)
    r2 = jnp.float32(0.35 * 0.35)
    f_u, fv_u = cg._fpfh_impl(pl_u.state, r2, pl_u.C, pl_u.SEG, pl_u.R_pad,
                              True, packed_rows=False)
    f_p, fv_p = cg._fpfh_impl(pl_p.state, r2, pl_p.C, pl_p.SEG, pl_p.R_pad,
                              True, packed_rows=True)
    np.testing.assert_array_equal(np.asarray(fv_u), np.asarray(fv_p))
    np.testing.assert_array_equal(np.asarray(f_u), np.asarray(f_p))


def test_packed_rows_masked_need(rng):
    """point_need + masked surface/FPFH on the packed layout: values at
    every needed row match the unmasked packed run."""
    N = 4000
    xyz = jnp.asarray(_thin_cloud(N, rng))
    valid = jnp.ones((N,), bool)
    _pl_u, pl = _two_plans(xyz, valid, 0.35)
    r2 = jnp.float32(0.35 * 0.35)
    kp, _sal = cg.iss_pass(pl, 0.35, interpret=True)
    assert int(np.asarray(kp).sum()) > 5
    need = cg.point_need(pl, kp, 2)
    assert bool(np.asarray(need & ~kp).any())  # the stencil widens the set
    full = cg.surface_pass(pl, 0.35, interpret=True)
    masked = cg.surface_pass(pl, 0.35, need=need, interpret=True)
    sel = np.asarray(need)
    np.testing.assert_array_equal(np.asarray(full[0])[sel],
                                  np.asarray(masked[0])[sel])
    f_full, v_full = cg.fpfh_pass(pl, 0.35, interpret=True)
    f_kp, v_kp = cg.fpfh_pass(pl, 0.35, kp=kp, interpret=True)
    kpn = np.asarray(kp)
    np.testing.assert_array_equal(np.asarray(v_full)[kpn],
                                  np.asarray(v_kp)[kpn])
    np.testing.assert_array_equal(np.asarray(f_full)[kpn],
                                  np.asarray(f_kp)[kpn])


def test_tposed_out_layout_bit_identical(rng):
    """Memory-constrained [R_pad, n_out, C] pass layout vs the fast
    [R_pad, C, n_out] one: identical block values consumed through
    per-channel gathers instead of one row gather, so every output must
    agree bit-for-bit.  (The fast layout's minor n_out dim pads to 128
    lanes under TPU tiling — 16x HBM for the 8-channel side passes; the
    tposed layout keeps the compacted FPFH consumer memory-light.)
    The surface/ISS passes now have a single chunked sorted-rows layout;
    the layout fork survives only in _fpfh_impl's kp_rows consumer, so
    that is what this exercises — on the PACKED thin-column layout
    (test_cell_fpfh covers the unpacked plan)."""
    N = 6000
    xyz = jnp.asarray(_thin_cloud(N, rng))
    valid = jnp.ones((N,), bool)
    _pl_u, pl = _two_plans(xyz, valid, 0.35)
    r2 = jnp.float32(0.35 * 0.35)
    normal = cg.surface_pass(pl, 0.35, interpret=True)[0]
    pl = cg.set_normals(pl, normal)
    kp_idx = np.sort(rng.choice(N, size=96, replace=False)).astype(np.int32)
    M = 128
    rows = jnp.full((M,), N, jnp.int32).at[:96].set(jnp.asarray(kp_idx))
    kp = jnp.zeros((N,), bool).at[jnp.asarray(kp_idx)].set(True)

    f_f, v_f = cg._fpfh_impl(pl.state, r2, pl.C, pl.SEG, pl.R_pad, True,
                             kp=kp, packed_rows=True, tposed=False,
                             kp_rows=rows)
    f_t, v_t = cg._fpfh_impl(pl.state, r2, pl.C, pl.SEG, pl.R_pad, True,
                             kp=kp, packed_rows=True, tposed=True,
                             kp_rows=rows)
    assert np.asarray(v_f)[:96].any()
    np.testing.assert_array_equal(np.asarray(v_f), np.asarray(v_t))
    np.testing.assert_array_equal(np.asarray(f_f), np.asarray(f_t))
