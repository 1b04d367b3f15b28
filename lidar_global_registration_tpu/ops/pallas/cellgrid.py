"""Unified cell-list Pallas kernels: surface (normals/density), ISS, FPFH.

The neighbor machinery for every self-join op in the pipeline:

  prep (XLA):  sort points by a 30-bit lexicographic cell key (cell size =
      search radius, so the 27-stencil is envelope-complete).  Because z is
      the fastest-varying key component, the three cells (x', y', z-1..z+1)
      of a stencil COLUMN occupy one contiguous run of the sorted order —
      each cell needs only 9 column DMAs plus its own run, not 27 cell DMAs
      (DMA issue overhead measured ~60us/cell at 27 descriptors dominated
      the round-1 kernels).  The candidate block height is bucketed to the
      actual max cell occupancy (32/64/96/128) instead of a fixed 128, so
      sparse grids stop paying 8x the DMA traffic.
  kernels:     one grid step per occupied cell; every per-point input AND
      intermediate rides in the 128 lanes of the packed array (xyz, normal,
      id, valid, plus pass-written channels: ISS counts/saliency, SPFH
      histograms), so multi-pass ops chain by scattering results back into
      packed lanes between passes — no side streams.

Passes:
  surface_cells: PCA normal + curvature + smoothed density + eigenvalues
      (pcl::NormalEstimationOMP radius variant, common.cpp:630-655;
      calculateSmoothedDensities, common.cpp:531-547).
  iss_cells:     counts -> weighted scatter saliency -> NMS
      (pcl::ISSKeypoint3D, common.cpp:657-691).
  fpfh_cells:    SPFH -> 1/d^2-weighted combine
      (pcl::FPFHEstimationOMP, include/common.h:322-332).

Parity tests: tests/test_cell_surface.py, test_cell_iss.py, test_cell_fpfh.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NR_BINS = 11
DIM = 33
_COORD_CLIP = 1023  # 10 bits per axis -> 30-bit unique lexicographic key
PAD = 3.0e18
BIG = 3.0e38
_BIG_KEY = np.int32(1 << 30)
TAB_LANES = 128  # col_start @0:9, col_len @16:25, own @32/33; 128-lane DMA tile
C_BUCKETS = (32, 64, 96, 128, 192, 256)

# packed lane assignments
CH_ORDER = 6
CH_VALID = 7
CH_EXTRA = 8  # first pass-writable lane (ISS count / SPFH block start)
CH_SAL = 9
CH_OK = 10


def _atan2_poly(y, x):
    """Polynomial atan2 (Mosaic has no atan2/acos lowering).

    Abramowitz-Stegun 4.4.49 minimax polynomial on [0,1] with quadrant
    reduction; ~1e-5 rad absolute error."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    z = lo / jnp.maximum(hi, 1e-30)
    s = z * z
    p = z * (
        0.99986614
        + s * (-0.33029951 + s * (0.18014100 + s * (-0.08513300 + s * 0.02083510)))
    )
    r = jnp.where(ay > ax, np.float32(np.pi / 2) - p, p)
    r = jnp.where(x < 0, np.float32(np.pi) - r, r)
    return jnp.where(y < 0, -r, r)


def _acos_poly(r):
    return _atan2_poly(jnp.sqrt(jnp.maximum(1.0 - r * r, 0.0)), r)


def _lex_keys(xyz, valid, origin, inv_cell):
    cs = []
    for d in range(3):
        c = jnp.floor((xyz[:, d] - origin[d]) * inv_cell)
        cs.append(jnp.clip(c, 0, _COORD_CLIP).astype(jnp.int32))
    key = (cs[0] << 20) | (cs[1] << 10) | cs[2]
    return jnp.where(valid, key, _BIG_KEY), cs


@functools.partial(jax.jit, static_argnames=("factors",))
def _grid_stats(xyz, valid, cell_size, factors=(1,)):
    """Per cell-size-multiple m in `factors`: (occupied cells, max occupancy,
    median point occupancy, p99.9 point occupancy).  ONE sort serves every
    factor: coarse cell ids floor(c/m) are per-axis monotone in the fine
    ids, so the fine-sorted key array is already sorted for every integer
    multiple of the cell."""
    big = jnp.float32(3.0e37)
    masked = jnp.where(valid[:, None], xyz, big)
    origin = jnp.min(masked, axis=0)
    origin = jnp.where(jnp.isfinite(origin), origin, 0.0) - 0.5 * cell_size
    inv = 1.0 / jnp.maximum(cell_size, 1e-30)
    keys, _ = _lex_keys(xyz, valid, origin, inv)
    ks = jnp.sort(keys)
    vs = ks < _BIG_KEY
    idx = jnp.arange(ks.shape[0], dtype=jnp.int32)
    n_valid = jnp.maximum(jnp.sum(vs.astype(jnp.int32)), 1)
    pad = ks.shape[0] - n_valid
    out = []
    kx, ky, kz = ks >> 20, (ks >> 10) & 1023, ks & 1023
    for m in factors:
        cks = ((kx // m) << 20) | ((ky // m) << 10) | (kz // m)
        cks = jnp.where(vs, cks, _BIG_KEY)
        first = vs & jnp.concatenate([jnp.ones((1,), bool), cks[1:] != cks[:-1]])
        n_rows = jnp.sum(first.astype(jnp.int32))
        run_start = jax.lax.associative_scan(jnp.maximum, jnp.where(first, idx, -1))
        pos = idx - run_start
        maxocc = jnp.max(jnp.where(vs, pos, -1)) + 1
        last = vs & jnp.concatenate([cks[1:] != cks[:-1], jnp.ones((1,), bool)])
        run_end = jax.lax.associative_scan(
            jnp.minimum, jnp.where(last, idx, jnp.int32(2**30)), reverse=True
        )
        occ_f = jnp.where(vs, run_end - run_start + 1, -1).astype(jnp.float32)
        occ_sorted = jnp.sort(occ_f)  # invalid (-1) first
        q50 = occ_sorted[pad + n_valid // 2]
        q999 = occ_sorted[pad + (n_valid * 999) // 1000]
        out.append(
            jnp.stack([n_rows.astype(jnp.float32), maxocc.astype(jnp.float32), q50, q999])
        )
    # ONE stacked array -> ONE host pull in _sizes (each pull is a full
    # round-trip on tunneled runtimes; 16 scalar pulls cost ~0.5 s)
    return jnp.stack(out)


def prep_cell_columns(xyz, normal, valid, fine_cell, m: int, C: int, R_pad: int):
    """Sort by cell key; build the per-cell 9-column run table.

    The grid cell is `m * fine_cell` but ids are computed as the FINE ids
    integer-divided by m — the exact partition _grid_stats measured (same
    fine origin), so R_pad and the C bucket describe the grid that is
    actually built.  Returns (packed f32[N+3C, 128], order i32[N],
    rank i32[N], pos i32[N], vs bool[N], tab i32[R_pad, TAB_LANES],
    n_rows i32[]).  tab row r: for each of the 9 (dx, dy) stencil columns,
    the sorted-point offset and length of the contiguous (z-1, z, z+1)
    cell run union, plus the row's own run (start, len)."""
    N = xyz.shape[0]
    fine_cell = jnp.asarray(fine_cell, jnp.float32)
    big = jnp.float32(3.0e37)
    masked = jnp.where(valid[:, None], xyz, big)
    origin = jnp.min(masked, axis=0)
    origin = jnp.where(jnp.isfinite(origin), origin, 0.0) - 0.5 * fine_cell
    inv = 1.0 / jnp.maximum(fine_cell, 1e-30)
    fkeys, fcs = _lex_keys(xyz, valid, origin, inv)
    if m == 1:
        keys = fkeys
    else:
        cs = [c // m for c in fcs]
        keys = (cs[0] << 20) | (cs[1] << 10) | cs[2]
        keys = jnp.where(fkeys < _BIG_KEY, keys, _BIG_KEY)

    ks, xs, ys, zs, nxs, nys, nzs, order = jax.lax.sort(
        (keys, xyz[:, 0], xyz[:, 1], xyz[:, 2],
         normal[:, 0], normal[:, 1], normal[:, 2],
         jnp.arange(N, dtype=jnp.int32)),
        num_keys=1,
        is_stable=True,
    )
    vs = ks < _BIG_KEY
    first = vs & jnp.concatenate([jnp.ones((1,), bool), ks[1:] != ks[:-1]])
    rank = jnp.cumsum(first.astype(jnp.int32)) - 1
    n_rows = jnp.maximum(rank[-1] + 1, 0)

    idx = jnp.arange(N, dtype=jnp.int32)
    run_start_sorted = jax.lax.associative_scan(
        jnp.maximum, jnp.where(first, idx, -1)
    )
    pos = idx - run_start_sorted

    rank_for_search = jnp.where(vs, rank, jnp.int32(2**30))
    rows = jnp.arange(R_pad, dtype=jnp.int32)
    row_start = jnp.searchsorted(rank_for_search, rows, side="left").astype(jnp.int32)
    row_key = ks[jnp.minimum(row_start, N - 1)]
    row_key = jnp.where(rows < n_rows, row_key, _BIG_KEY)
    n_valid = jnp.sum(vs.astype(jnp.int32))
    row_start = jnp.where(rows < n_rows, row_start, n_valid)
    row_end = jnp.concatenate([row_start[1:], n_valid[None]])
    row_len = jnp.maximum(row_end - row_start, 0)

    kx, ky, kz = row_key >> 20, (row_key >> 10) & 1023, row_key & 1023
    col_offs = [(i, j) for i in (-1, 0, 1) for j in (-1, 0, 1)]
    col_start = jnp.zeros((R_pad, 9), jnp.int32)
    col_len = jnp.zeros((R_pad, 9), jnp.int32)
    for ci, (di, dj) in enumerate(col_offs):
        nkx = kx + di
        nky = ky + dj
        xy_ok = (nkx >= 0) & (nkx <= _COORD_CLIP) & (nky >= 0) & (nky <= _COORD_CLIP)
        starts = []
        lens = []
        exists = []
        for dk in (-1, 0, 1):
            nkz = kz + dk
            z_ok = (nkz >= 0) & (nkz <= _COORD_CLIP)
            nkey = (nkx << 20) | (nky << 10) | nkz
            nrow = jnp.searchsorted(row_key, nkey, side="left")
            nrow = jnp.minimum(nrow, R_pad - 1).astype(jnp.int32)
            found = (row_key[nrow] == nkey) & xy_ok & z_ok & (rows < n_rows)
            starts.append(jnp.where(found, row_start[nrow], jnp.int32(2**30)))
            lens.append(jnp.where(found, row_start[nrow] + row_len[nrow], -1))
            exists.append(found)
        lo = jnp.minimum(jnp.minimum(starts[0], starts[1]), starts[2])
        hi = jnp.maximum(jnp.maximum(lens[0], lens[1]), lens[2])
        any_found = exists[0] | exists[1] | exists[2]
        # cells of one (x', y') column with z in {z-1, z, z+1} are adjacent
        # in key order, so [lo, hi) is a contiguous sorted-point range
        col_start = col_start.at[:, ci].set(jnp.where(any_found, lo, n_valid))
        col_len = col_len.at[:, ci].set(jnp.where(any_found, hi - lo, 0))

    tab = jnp.zeros((R_pad, TAB_LANES), jnp.int32)
    tab = tab.at[:, 0:9].set(col_start)
    tab = tab.at[:, 16:25].set(col_len)
    tab = tab.at[:, 32].set(row_start)
    tab = tab.at[:, 33].set(row_len)

    vflag = vs.astype(jnp.float32)
    packed = jnp.stack(
        [xs, ys, zs, nxs, nys, nzs, order.astype(jnp.float32), vflag], axis=1
    )
    packed = jnp.where(vs[:, None], packed, jnp.float32(PAD))
    packed = jnp.concatenate(
        [packed, jnp.full((N, 128 - packed.shape[1]), jnp.float32(PAD))], axis=1
    )
    packed = jnp.concatenate(
        [packed, jnp.full((3 * C, 128), jnp.float32(PAD))], axis=0
    )  # tail pad: pl.ds(start, 3C) never overruns
    return packed, order, rank, pos, vs, tab, n_rows


def _slot_map(rank, pos, vs, R_pad, C):
    slot = jnp.clip(rank, 0, R_pad - 1) * C + jnp.minimum(pos, C - 1)
    kept = vs & (rank >= 0) & (rank < R_pad) & (pos < C)
    return slot, kept


def _query_lanes(qblk, eye):
    """[C, 128] own block (sublanes) -> [128, C] lane-major via one MXU op."""
    return jax.lax.dot_general(
        qblk, eye, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _dma_cols(tabs, packed_ref, cand, qblk, csems, qsem):
    """DMA the own run ([C,128]) and the 9 column runs ([3C,128]) into VMEM;
    returns after ALL copies complete (callers read qblk/cand right away)."""
    C = qblk.shape[0]
    CC = cand.shape[1]

    q_copy = pltpu.make_async_copy(
        packed_ref.at[pl.ds(tabs[0, 32], C), :], qblk, qsem
    )
    q_copy.start()

    def start(c, _):
        pltpu.make_async_copy(
            packed_ref.at[pl.ds(tabs[0, c], CC), :], cand.at[c], csems.at[c]
        ).start()
        return 0

    jax.lax.fori_loop(0, 9, start, 0)
    q_copy.wait()

    def wait(c, _):
        pltpu.make_async_copy(
            packed_ref.at[pl.ds(tabs[0, c], CC), :], cand.at[c], csems.at[c]
        ).wait()
        return 0

    jax.lax.fori_loop(0, 9, wait, 0)


def _fold_cols(tabs, cand, body, init):
    """Fold body(c, cc, col_len, acc) over the 9 candidate columns."""

    def step(c, acc):
        return body(c, cand[c], tabs[0, 16 + c], acc)

    return jax.lax.fori_loop(0, 9, step, init)


def _smallest_eig3(a00, a01, a02, a11, a12, a22):
    """Smallest (eigvals, eigvec) of symmetric 3x3 in [1, C] component lanes.
    Smith closed form (acos via the atan2 polynomial) + cross-product
    eigenvector with degenerate fallback to +z — ops/eigen3.py in SoA."""
    eps = 1e-20
    scale = jnp.maximum(
        jnp.maximum(
            jnp.maximum(jnp.abs(a00), jnp.abs(a11)),
            jnp.maximum(jnp.abs(a22), jnp.abs(a01)),
        ),
        jnp.maximum(jnp.maximum(jnp.abs(a02), jnp.abs(a12)), eps),
    )
    b00, b11, b22 = a00 / scale, a11 / scale, a22 / scale
    b01, b02, b12 = a01 / scale, a02 / scale, a12 / scale

    q = (b00 + b11 + b22) / 3.0
    p1 = b01 * b01 + b02 * b02 + b12 * b12
    c00, c11, c22 = b00 - q, b11 - q, b22 - q
    p2 = c00 * c00 + c11 * c11 + c22 * c22 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 0.0))
    sp = jnp.maximum(p, eps)
    d00, d11, d22 = c00 / sp, c11 / sp, c22 / sp
    d01, d02, d12 = b01 / sp, b02 / sp, b12 / sp
    detC = (
        d00 * (d11 * d22 - d12 * d12)
        - d01 * (d01 * d22 - d12 * d02)
        + d02 * (d01 * d12 - d11 * d02)
    )
    r = jnp.clip(detC / 2.0, -1.0, 1.0)
    phi = _acos_poly(r) / 3.0
    e_hi = q + 2.0 * p * jnp.cos(phi)
    e_lo = q + 2.0 * p * jnp.cos(phi + 2.0 * np.pi / 3.0)
    e_mid = 3.0 * q - e_hi - e_lo
    iso = p <= eps
    e_hi = jnp.where(iso, q, e_hi)
    e_mid = jnp.where(iso, q, e_mid)
    e_lo = jnp.where(iso, q, e_lo)

    m00, m11, m22 = b00 - e_lo, b11 - e_lo, b22 - e_lo

    def cross(ax, ay, az, bx, by, bz):
        return (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)

    c01 = cross(m00, b01, b02, b01, m11, b12)
    c02 = cross(m00, b01, b02, b02, b12, m22)
    c12 = cross(b01, m11, b12, b02, b12, m22)

    def n2(v):
        return v[0] * v[0] + v[1] * v[1] + v[2] * v[2]

    n01, n02, n12 = n2(c01), n2(c02), n2(c12)
    best12 = n12 > jnp.maximum(n01, n02)
    best02 = (~best12) & (n02 > n01)
    vx = jnp.where(best12, c12[0], jnp.where(best02, c02[0], c01[0]))
    vy = jnp.where(best12, c12[1], jnp.where(best02, c02[1], c01[1]))
    vz = jnp.where(best12, c12[2], jnp.where(best02, c02[2], c01[2]))
    nbest = jnp.maximum(jnp.maximum(n01, n02), n12)
    degen = nbest <= eps * 10.0
    vx = jnp.where(degen, 0.0, vx)
    vy = jnp.where(degen, 0.0, vy)
    vz = jnp.where(degen, 1.0, vz)
    vn = jnp.sqrt(jnp.maximum(vx * vx + vy * vy + vz * vz, eps))
    return (e_lo * scale, e_mid * scale, e_hi * scale, vx / vn, vy / vn, vz / vn)


# ---------------------------------------------------------------------------
# surface kernel: count/mean/covariance -> normal, curvature, eigvals, NN
# ---------------------------------------------------------------------------
N_CH_SURF = 16


def _surface_kernel(meta_ref, tab_ref, packed_ref, out_ref, cand, qblk, tabs, csems, qsem, tsem):
    r = pl.program_id(0)
    C = qblk.shape[0]
    n_rows = meta_ref[1].astype(jnp.int32)

    @pl.when(r >= n_rows)
    def _zero():
        out_ref[...] = jnp.zeros(out_ref.shape, jnp.float32)

    @pl.when(r < n_rows)
    def _():
        tcopy = pltpu.make_async_copy(tab_ref.at[pl.ds(r, 1)], tabs, tsem)
        tcopy.start()
        tcopy.wait()
        _dma_cols(tabs, packed_ref, cand, qblk, csems, qsem)
        eye = jnp.eye(C, dtype=jnp.float32)
        qrow = _query_lanes(qblk[...], eye)
        qx, qy, qz = qrow[0:1, :], qrow[1:2, :], qrow[2:3, :]
        qvalid = qrow[CH_VALID : CH_VALID + 1, :] > 0.5
        r2 = meta_ref[0]
        CC = cand.shape[1]
        jc = jax.lax.broadcasted_iota(jnp.int32, (CC, 1), 0)

        zero = jnp.zeros((1, C), jnp.float32)
        init = (zero,) * 10 + (jnp.full((1, C), BIG), jnp.full((1, C), -1.0))

        def body(c, cc, clen, acc):
            (s1, sx, sy, sz, sxx, sxy, sxz, syy, syz, szz, dmin, nnid) = acc
            cx, cy, cz = cc[:, 0:1], cc[:, 1:2], cc[:, 2:3]
            dx, dy, dz = cx - qx, cy - qy, cz - qz
            d2 = dx * dx + dy * dy + dz * dz
            ok = (d2 <= r2) & (jc < clen) & (cc[:, 7:8] > 0.5) & qvalid
            okf = ok.astype(jnp.float32)
            s1 += jnp.sum(okf, axis=0, keepdims=True)
            # moments of (c - q), NOT of raw world coordinates: covariance is
            # shift-invariant and the query-centered deltas are radius-scale,
            # so E[d d^T] - mean mean^T stays f32-exact even for clouds
            # georeferenced thousands of meters from the origin
            sx += jnp.sum(jnp.where(ok, dx, 0.0), axis=0, keepdims=True)
            sy += jnp.sum(jnp.where(ok, dy, 0.0), axis=0, keepdims=True)
            sz += jnp.sum(jnp.where(ok, dz, 0.0), axis=0, keepdims=True)
            sxx += jnp.sum(jnp.where(ok, dx * dx, 0.0), axis=0, keepdims=True)
            sxy += jnp.sum(jnp.where(ok, dx * dy, 0.0), axis=0, keepdims=True)
            sxz += jnp.sum(jnp.where(ok, dx * dz, 0.0), axis=0, keepdims=True)
            syy += jnp.sum(jnp.where(ok, dy * dy, 0.0), axis=0, keepdims=True)
            syz += jnp.sum(jnp.where(ok, dy * dz, 0.0), axis=0, keepdims=True)
            szz += jnp.sum(jnp.where(ok, dz * dz, 0.0), axis=0, keepdims=True)
            dpos = jnp.where(ok & (d2 > 1e-24), d2, BIG)
            tmin = jnp.min(dpos, axis=0, keepdims=True)
            targ = jnp.min(
                jnp.where(dpos == tmin, cc[:, 6:7], BIG), axis=0, keepdims=True
            )
            better = tmin < dmin
            nnid = jnp.where(better, targ, nnid)
            dmin = jnp.where(better, tmin, dmin)
            return (s1, sx, sy, sz, sxx, sxy, sxz, syy, syz, szz, dmin, nnid)

        (s1, sx, sy, sz, sxx, sxy, sxz, syy, syz, szz, dmin, nnid) = _fold_cols(
            tabs, cand, body, init
        )
        cnt = jnp.maximum(s1, 1.0)
        mx, my, mz = sx / cnt, sy / cnt, sz / cnt
        l0, l1, l2, vx, vy, vz = _smallest_eig3(
            sxx / cnt - mx * mx,
            sxy / cnt - mx * my,
            sxz / cnt - mx * mz,
            syy / cnt - my * my,
            syz / cnt - my * mz,
            szz / cnt - mz * mz,
        )
        out_ref[0, 0, :] = vx[0]
        out_ref[0, 1, :] = vy[0]
        out_ref[0, 2, :] = vz[0]
        tot = jnp.maximum(l0 + l1 + l2, 1e-30)
        out_ref[0, 3, :] = jnp.where(tot > 0, jnp.maximum(l0, 0.0) / tot, 0.0)[0]
        out_ref[0, 4, :] = l0[0]
        out_ref[0, 5, :] = l1[0]
        out_ref[0, 6, :] = l2[0]
        out_ref[0, 7, :] = s1[0]
        out_ref[0, 8, :] = jnp.sqrt(jnp.minimum(dmin, BIG))[0]
        out_ref[0, 9, :] = nnid[0]
        out_ref[0, 10:, :] = jnp.zeros((N_CH_SURF - 10, C), jnp.float32)


# ---------------------------------------------------------------------------
# ISS kernels
# ---------------------------------------------------------------------------
def _iss_count_kernel(meta_ref, tab_ref, packed_ref, out_ref, cand, qblk, tabs, csems, qsem, tsem):
    r = pl.program_id(0)
    C = qblk.shape[0]
    n_rows = meta_ref[1].astype(jnp.int32)

    @pl.when(r >= n_rows)
    def _zero():
        out_ref[...] = jnp.zeros(out_ref.shape, jnp.float32)

    @pl.when(r < n_rows)
    def _():
        tcopy = pltpu.make_async_copy(tab_ref.at[pl.ds(r, 1)], tabs, tsem)
        tcopy.start()
        tcopy.wait()
        _dma_cols(tabs, packed_ref, cand, qblk, csems, qsem)
        eye = jnp.eye(C, dtype=jnp.float32)
        qrow = _query_lanes(qblk[...], eye)
        qx, qy, qz = qrow[0:1, :], qrow[1:2, :], qrow[2:3, :]
        qvalid = qrow[CH_VALID : CH_VALID + 1, :] > 0.5
        r2 = meta_ref[0]
        CC = cand.shape[1]
        jc = jax.lax.broadcasted_iota(jnp.int32, (CC, 1), 0)

        def body(c, cc, clen, s1):
            dx = cc[:, 0:1] - qx
            dy = cc[:, 1:2] - qy
            dz = cc[:, 2:3] - qz
            d2 = dx * dx + dy * dy + dz * dz
            ok = (d2 <= r2) & (jc < clen) & (cc[:, 7:8] > 0.5) & qvalid
            return s1 + jnp.sum(ok.astype(jnp.float32), axis=0, keepdims=True)

        s1 = _fold_cols(tabs, cand, body, jnp.zeros((1, C), jnp.float32))
        out_ref[0, 0, :] = s1[0]  # includes self (d2 = 0 passes)
        out_ref[0, 1:, :] = jnp.zeros((out_ref.shape[1] - 1, C), jnp.float32)


def _iss_saliency_kernel(meta_ref, tab_ref, packed_ref, out_ref, cand, qblk, tabs, csems, qsem, tsem):
    r = pl.program_id(0)
    C = qblk.shape[0]
    n_rows = meta_ref[1].astype(jnp.int32)

    @pl.when(r >= n_rows)
    def _zero():
        out_ref[...] = jnp.zeros(out_ref.shape, jnp.float32)

    @pl.when(r < n_rows)
    def _():
        tcopy = pltpu.make_async_copy(tab_ref.at[pl.ds(r, 1)], tabs, tsem)
        tcopy.start()
        tcopy.wait()
        _dma_cols(tabs, packed_ref, cand, qblk, csems, qsem)
        eye = jnp.eye(C, dtype=jnp.float32)
        qrow = _query_lanes(qblk[...], eye)
        qx, qy, qz = qrow[0:1, :], qrow[1:2, :], qrow[2:3, :]
        qvalid = qrow[CH_VALID : CH_VALID + 1, :] > 0.5
        r2 = meta_ref[0]
        gamma21 = meta_ref[2]
        gamma32 = meta_ref[3]
        CC = cand.shape[1]
        jc = jax.lax.broadcasted_iota(jnp.int32, (CC, 1), 0)

        zero = jnp.zeros((1, C), jnp.float32)
        init = (zero,) * 8

        def body(c, cc, clen, acc):
            ws, sxx, sxy, sxz, syy, syz, szz, nnb = acc
            dx = cc[:, 0:1] - qx
            dy = cc[:, 1:2] - qy
            dz = cc[:, 2:3] - qz
            d2 = dx * dx + dy * dy + dz * dz
            ok = (
                (d2 <= r2)
                & (d2 > 1e-24)  # exclude self from the scatter
                & (jc < clen)
                & (cc[:, 7:8] > 0.5)
                & qvalid
            )
            w = jnp.where(
                ok, 1.0 / jnp.maximum(cc[:, CH_EXTRA : CH_EXTRA + 1], 1.0), 0.0
            )
            ws += jnp.sum(w, axis=0, keepdims=True)
            sxx += jnp.sum(w * dx * dx, axis=0, keepdims=True)
            sxy += jnp.sum(w * dx * dy, axis=0, keepdims=True)
            sxz += jnp.sum(w * dx * dz, axis=0, keepdims=True)
            syy += jnp.sum(w * dy * dy, axis=0, keepdims=True)
            syz += jnp.sum(w * dy * dz, axis=0, keepdims=True)
            szz += jnp.sum(w * dz * dz, axis=0, keepdims=True)
            nnb += jnp.sum(ok.astype(jnp.float32), axis=0, keepdims=True)
            return (ws, sxx, sxy, sxz, syy, syz, szz, nnb)

        ws, sxx, sxy, sxz, syy, syz, szz, nnb = _fold_cols(tabs, cand, body, init)
        wsafe = jnp.maximum(ws, 1e-30)
        l3, l2, l1, _vx, _vy, _vz = _smallest_eig3(
            sxx / wsafe, sxy / wsafe, sxz / wsafe, syy / wsafe, syz / wsafe, szz / wsafe
        )
        ok_g = (
            (ws > 0)
            & (l2 / jnp.maximum(l1, 1e-30) < gamma21)
            & (l3 / jnp.maximum(l2, 1e-30) < gamma32)
            & (l3 > 0)
            & qvalid
        )
        out_ref[0, 0, :] = jnp.where(ok_g, l3, 0.0)[0]
        out_ref[0, 1, :] = ok_g.astype(jnp.float32)[0]
        out_ref[0, 2, :] = nnb[0]
        out_ref[0, 3:, :] = jnp.zeros((out_ref.shape[1] - 3, C), jnp.float32)


def _iss_nms_kernel(meta_ref, tab_ref, packed_ref, out_ref, cand, qblk, tabs, csems, qsem, tsem):
    r = pl.program_id(0)
    C = qblk.shape[0]
    n_rows = meta_ref[1].astype(jnp.int32)

    @pl.when(r >= n_rows)
    def _zero():
        out_ref[...] = jnp.zeros(out_ref.shape, jnp.float32)

    @pl.when(r < n_rows)
    def _():
        tcopy = pltpu.make_async_copy(tab_ref.at[pl.ds(r, 1)], tabs, tsem)
        tcopy.start()
        tcopy.wait()
        _dma_cols(tabs, packed_ref, cand, qblk, csems, qsem)
        eye = jnp.eye(C, dtype=jnp.float32)
        qrow = _query_lanes(qblk[...], eye)
        qx, qy, qz = qrow[0:1, :], qrow[1:2, :], qrow[2:3, :]
        qvalid = qrow[CH_VALID : CH_VALID + 1, :] > 0.5
        q_sal = qrow[CH_SAL : CH_SAL + 1, :]
        q_ok = qrow[CH_OK : CH_OK + 1, :] > 0.5
        r2 = meta_ref[0]
        min_nb = meta_ref[4]
        CC = cand.shape[1]
        jc = jax.lax.broadcasted_iota(jnp.int32, (CC, 1), 0)

        init = (jnp.full((1, C), -BIG), jnp.zeros((1, C), jnp.float32))

        def body(c, cc, clen, acc):
            nb_max, nnb = acc
            dx = cc[:, 0:1] - qx
            dy = cc[:, 1:2] - qy
            dz = cc[:, 2:3] - qz
            d2 = dx * dx + dy * dy + dz * dz
            ok = (
                (d2 <= r2)
                & (d2 > 1e-24)
                & (jc < clen)
                & (cc[:, 7:8] > 0.5)
                & qvalid
            )
            nb_max = jnp.maximum(
                nb_max,
                jnp.max(
                    jnp.where(ok, cc[:, CH_SAL : CH_SAL + 1], -BIG),
                    axis=0,
                    keepdims=True,
                ),
            )
            nnb += jnp.sum(ok.astype(jnp.float32), axis=0, keepdims=True)
            return (nb_max, nnb)

        nb_max, nnb = _fold_cols(tabs, cand, body, init)
        is_kp = q_ok & (nnb >= min_nb) & (q_sal > nb_max) & qvalid
        out_ref[0, 0, :] = is_kp.astype(jnp.float32)[0]
        out_ref[0, 1:, :] = jnp.zeros((out_ref.shape[1] - 1, C), jnp.float32)


# ---------------------------------------------------------------------------
# FPFH kernels
# ---------------------------------------------------------------------------
def _pair_feature_bins(qx, qy, qz, qnx, qny, qnz, cc, r2):
    """Darboux features + bins for one candidate column vs the query lanes.

    q*: [1, C] lane vectors; cc: [CC, 128] candidates on sublanes.
    Matches ops/fpfh.pair_features_soa (the acos comparison reduces to a
    |cos| comparison since acos is monotone decreasing)."""
    cx, cy, cz = cc[:, 0:1], cc[:, 1:2], cc[:, 2:3]
    cnx, cny, cnz = cc[:, 3:4], cc[:, 4:5], cc[:, 5:6]
    dpx, dpy, dpz = cx - qx, cy - qy, cz - qz  # dp = neighbor - query
    d2 = dpx * dpx + dpy * dpy + dpz * dpz
    dsafe = jnp.maximum(jnp.sqrt(jnp.maximum(d2, 0.0)), 1e-30)
    a1 = (qnx * dpx + qny * dpy + qnz * dpz) / dsafe
    a2 = (cnx * dpx + cny * dpy + cnz * dpz) / dsafe
    swap = jnp.abs(a1) < jnp.abs(a2)
    nsx = jnp.where(swap, jnp.broadcast_to(cnx, swap.shape), jnp.broadcast_to(qnx, swap.shape))
    nsy = jnp.where(swap, jnp.broadcast_to(cny, swap.shape), jnp.broadcast_to(qny, swap.shape))
    nsz = jnp.where(swap, jnp.broadcast_to(cnz, swap.shape), jnp.broadcast_to(qnz, swap.shape))
    ntx = jnp.where(swap, jnp.broadcast_to(qnx, swap.shape), jnp.broadcast_to(cnx, swap.shape))
    nty = jnp.where(swap, jnp.broadcast_to(qny, swap.shape), jnp.broadcast_to(cny, swap.shape))
    ntz = jnp.where(swap, jnp.broadcast_to(qnz, swap.shape), jnp.broadcast_to(cnz, swap.shape))
    sgn = jnp.where(swap, -1.0, 1.0)
    dpx, dpy, dpz = sgn * dpx, sgn * dpy, sgn * dpz
    f3 = jnp.where(swap, a2, a1)
    vx = dpy * nsz - dpz * nsy
    vy = dpz * nsx - dpx * nsz
    vz = dpx * nsy - dpy * nsx
    vn = jnp.sqrt(jnp.maximum(vx * vx + vy * vy + vz * vz, 0.0))
    okv = (d2 > 0.0) & (vn > 1e-12)
    vsn = jnp.maximum(vn, 1e-30)
    vx, vy, vz = vx / vsn, vy / vsn, vz / vsn
    wx = nsy * vz - nsz * vy
    wy = nsz * vx - nsx * vz
    wz = nsx * vy - nsy * vx
    f2 = vx * ntx + vy * nty + vz * ntz
    f1 = _atan2_poly(
        wx * ntx + wy * nty + wz * ntz, nsx * ntx + nsy * nty + nsz * ntz
    )
    b1 = jnp.clip(
        jnp.floor(NR_BINS * (f1 + np.pi) / (2.0 * np.pi)), 0, NR_BINS - 1
    ).astype(jnp.int32)
    b2 = jnp.clip(jnp.floor(NR_BINS * (f2 + 1.0) / 2.0), 0, NR_BINS - 1).astype(jnp.int32)
    b3 = jnp.clip(jnp.floor(NR_BINS * (f3 + 1.0) / 2.0), 0, NR_BINS - 1).astype(jnp.int32)
    cn2 = cnx * cnx + cny * cny + cnz * cnz
    qn2 = qnx * qnx + qny * qny + qnz * qnz
    ok = okv & (d2 <= r2) & (cn2 > 0.5) & (qn2 > 0.5)
    return b1, b2, b3, ok


def _spfh_kernel(meta_ref, tab_ref, packed_ref, out_ref, cand, qblk, acc, tabs, csems, qsem, tsem):
    r = pl.program_id(0)
    C = qblk.shape[0]
    n_rows = meta_ref[1].astype(jnp.int32)

    @pl.when(r >= n_rows)
    def _zero():
        out_ref[...] = jnp.zeros(out_ref.shape, jnp.float32)

    @pl.when(r < n_rows)
    def _():
        tcopy = pltpu.make_async_copy(tab_ref.at[pl.ds(r, 1)], tabs, tsem)
        tcopy.start()
        tcopy.wait()
        _dma_cols(tabs, packed_ref, cand, qblk, csems, qsem)
        eye = jnp.eye(C, dtype=jnp.float32)
        qrow = _query_lanes(qblk[...], eye)
        qx, qy, qz = qrow[0:1, :], qrow[1:2, :], qrow[2:3, :]
        qnx, qny, qnz = qrow[3:4, :], qrow[4:5, :], qrow[5:6, :]
        qvalid = qrow[CH_VALID : CH_VALID + 1, :] > 0.5
        r2 = meta_ref[0]
        CC = cand.shape[1]
        jc = jax.lax.broadcasted_iota(jnp.int32, (CC, 1), 0)

        acc[...] = jnp.zeros_like(acc)

        def body(c, _):
            cc = cand[c]
            clen = tabs[0, 16 + c]
            b1, b2, b3, ok = _pair_feature_bins(qx, qy, qz, qnx, qny, qnz, cc, r2)
            ok = ok & (jc < clen) & (cc[:, 7:8] > 0.5) & qvalid
            okf = ok.astype(jnp.float32)
            acc[DIM : DIM + 1, :] += jnp.sum(okf, axis=0, keepdims=True)
            for which, b in enumerate((b1, b2, b3)):
                for k in range(NR_BINS):
                    acc[which * NR_BINS + k : which * NR_BINS + k + 1, :] += jnp.sum(
                        jnp.where(b == k, okf, 0.0), axis=0, keepdims=True
                    )
            return 0

        jax.lax.fori_loop(0, 9, body, 0)
        cnt = acc[DIM : DIM + 1, :]
        incr = jnp.where(cnt > 0, 100.0 / jnp.maximum(cnt, 1.0), 0.0)
        out_ref[0, 0:DIM, :] = acc[0:DIM, :] * incr
        out_ref[0, DIM, :] = cnt[0]


def _combine_kernel(meta_ref, tab_ref, packed_ref, out_ref, cand, qblk, wsum, tabs, csems, qsem, tsem):
    """FPFH combine: the SPFH of every point rides in packed lanes
    CH_EXTRA..CH_EXTRA+33 (written back between passes), so the weighted
    neighbor sum is 9 small MXU matmuls over the same candidate columns."""
    r = pl.program_id(0)
    C = qblk.shape[0]
    n_rows = meta_ref[1].astype(jnp.int32)

    @pl.when(r >= n_rows)
    def _zero():
        out_ref[...] = jnp.zeros(out_ref.shape, jnp.float32)

    @pl.when(r < n_rows)
    def _():
        tcopy = pltpu.make_async_copy(tab_ref.at[pl.ds(r, 1)], tabs, tsem)
        tcopy.start()
        tcopy.wait()
        _dma_cols(tabs, packed_ref, cand, qblk, csems, qsem)
        eye = jnp.eye(C, dtype=jnp.float32)
        qrow = _query_lanes(qblk[...], eye)
        qx, qy, qz = qrow[0:1, :], qrow[1:2, :], qrow[2:3, :]
        qvalid = qrow[CH_VALID : CH_VALID + 1, :] > 0.5
        q_spfh = qrow[CH_EXTRA : CH_EXTRA + DIM, :]  # [33, C]
        r2 = meta_ref[0]
        CC = cand.shape[1]
        jc = jax.lax.broadcasted_iota(jnp.int32, (CC, 1), 0)

        wsum[...] = jnp.zeros_like(wsum)

        def body(c, _):
            cc = cand[c]
            clen = tabs[0, 16 + c]
            cx, cy, cz = cc[:, 0:1], cc[:, 1:2], cc[:, 2:3]
            d2 = (cx - qx) ** 2 + (cy - qy) ** 2 + (cz - qz) ** 2
            ok = (
                (d2 > 0.0)
                & (d2 <= r2)
                & (jc < clen)
                & (cc[:, 7:8] > 0.5)
                & qvalid
            )
            w = jnp.where(ok, 1.0 / jnp.maximum(d2, 1e-30), 0.0)  # [CC, C]
            wsum[DIM : DIM + 1, :] += jnp.sum(
                ok.astype(jnp.float32), axis=0, keepdims=True
            )
            # [33, C] += SPFH_cand^T [33, CC] @ W [CC, C]
            wsum[0:DIM, :] += jax.lax.dot_general(
                cc[:, CH_EXTRA : CH_EXTRA + DIM],
                w,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return 0

        jax.lax.fori_loop(0, 9, body, 0)
        kcnt = wsum[DIM : DIM + 1, :]
        mean = wsum[0:DIM, :] / jnp.maximum(kcnt, 1.0)
        feat = q_spfh + mean
        blocks = []
        for blk in range(3):
            f = feat[blk * NR_BINS : (blk + 1) * NR_BINS, :]
            s = jnp.sum(f, axis=0, keepdims=True)
            blocks.append(jnp.where(s > 0, 100.0 * f / jnp.maximum(s, 1e-30), f))
        out_ref[0, :, :] = jnp.concatenate(blocks + [kcnt], axis=0)  # [34, C]


# ---------------------------------------------------------------------------
# pass runner + wrappers
# ---------------------------------------------------------------------------
def _run_pass(kernel, meta, tab, packed, R_pad, C, n_out_ch, interpret, extra_scratch=()):
    CC = 3 * C
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(R_pad,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, n_out_ch, C), lambda r, *_: (r, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((9, CC, 128), jnp.float32),
            pltpu.VMEM((C, 128), jnp.float32),
            *extra_scratch,
            pltpu.SMEM((1, TAB_LANES), jnp.int32),
            pltpu.SemaphoreType.DMA((9,)),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R_pad, n_out_ch, C), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(meta, tab, packed)


def _round_up(n, m):
    return ((n + m - 1) // m) * m


OCC_TARGET = 48  # grow the cell until the median point's cell holds ~this


def _sizes(xyz, valid, radius, grow_cell: bool = True, exact: bool = False):
    """Host-pulled grid sizing: (R_pad, C bucket, cell_size).

    The kernels mask by the true radius; the CELL may be any size >= radius
    (the 27-stencil stays envelope-complete).  Sparse grids (median cell
    occupancy far below OCC_TARGET) pay per-step overhead on hundreds of
    thousands of near-empty cells, so the cell is grown an integer factor
    toward the target.  The candidate bucket is sized by the p99.9 POINT
    occupancy rather than the max: isolated dense junction cells (face
    intersections) would otherwise force the largest block on everyone;
    points beyond the bucket in such cells are truncated, the same cap
    semantics as the reference's max_neighbors_ (iss_debug.cpp:47-54)."""
    if exact:
        grow_cell = False
    factors = (1, 2, 3, 4) if grow_cell else (1,)
    all_stats = np.asarray(
        _grid_stats(xyz, valid, radius, factors=factors)
    ).astype(np.int64).tolist()
    n_rows, maxocc, q50, q999 = all_stats[0]
    m = 1
    if grow_cell and q50 > 0:
        import math

        m = int(min(4, max(1, round(math.sqrt(OCC_TARGET / max(q50, 1))))))
        if m > 1:
            n_rows, maxocc, q50, q999 = all_stats[factors.index(m)]
    R_pad = max(512, _round_up(max(n_rows, 1), 512))
    R_pad = min(R_pad, xyz.shape[0] + 1)
    target = maxocc if exact else min(max(q999, 1), maxocc)
    C = next((b for b in C_BUCKETS if b >= target), None)
    return R_pad, C, m


def _slot_gather(out_ch, rank, pos, vs, order, R_pad, C):
    """Map one [R_pad, C] output channel back to original point order."""
    slot, kept = _slot_map(rank, pos, vs, R_pad, C)
    vals_sorted = jnp.where(kept, out_ch.reshape(-1)[slot], 0.0)
    return vals_sorted, kept


@functools.partial(jax.jit, static_argnames=("m", "C", "R_pad", "interpret"))
def _surface_impl(xyz, valid, radius, m, C, R_pad, interpret):
    packed, order, rank, pos, vs, tab, n_rows = prep_cell_columns(
        xyz, jnp.zeros_like(xyz), valid, radius, m, C, R_pad
    )
    meta = jnp.stack([radius * radius, jnp.minimum(n_rows, R_pad).astype(jnp.float32)])
    out = _run_pass(_surface_kernel, meta, tab, packed, R_pad, C, N_CH_SURF, interpret)
    inv = jnp.argsort(order)
    chans = []
    for ch in range(10):
        vals_sorted, _kept = _slot_gather(out[:, ch, :], rank, pos, vs, order, R_pad, C)
        chans.append(vals_sorted[inv])
    return chans


def surface_cells(xyz, valid, radius, viewpoint=None, interpret=None,
                  exact: bool = False):
    """Self-join surface pass: (normal oriented to viewpoint, curvature,
    k=2-smoothed density, eigvals ascending [N,3], ok)."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    radius = jnp.asarray(radius, jnp.float32)
    R_pad, Cb, m = _sizes(xyz, valid, radius, exact=exact)
    if Cb is None:
        raise ValueError(
            f"cell occupancy exceeds the {C_BUCKETS[-1]} kernel cap; "
            "use the XLA path for this cloud"
        )
    nx, ny, nz, curv, l0, l1, l2, cnt, dmin, nnid_f = _surface_impl(
        xyz, valid, radius, m, Cb, R_pad, interpret
    )
    normal = jnp.stack([nx, ny, nz], axis=1)
    eigvals = jnp.stack([l0, l1, l2], axis=1)
    nnid = jnp.clip(nnid_f.astype(jnp.int32), 0, xyz.shape[0] - 1)
    has_nn = (nnid_f >= 0) & (dmin < BIG / 2)

    ok = valid & (cnt >= 3)
    if viewpoint is None:
        viewpoint = jnp.zeros((3,), jnp.float32)
    else:
        viewpoint = jnp.asarray(viewpoint, jnp.float32)
    to_vp = viewpoint[None, :] - xyz
    flip = jnp.sum(normal * to_vp, axis=-1) < 0.0
    normal = jnp.where(flip[:, None], -normal, normal)
    normal = jnp.where(ok[:, None], normal, 0.0)

    d_raw = jnp.where(valid & has_nn, dmin, 0.0)
    d_nn = jnp.where(has_nn, d_raw[nnid], d_raw)
    density = jnp.where(
        valid & has_nn, jnp.minimum(d_raw, jnp.where(d_nn > 0, d_nn, d_raw)), 0.0
    )
    return normal, curv, density, eigvals, ok


@functools.partial(
    jax.jit, static_argnames=("m", "C", "R_pad", "interpret", "min_neighbors")
)
def _iss_impl(xyz, valid, radius, m, gamma21, gamma32, C, R_pad, interpret, min_neighbors):
    N = xyz.shape[0]
    packed, order, rank, pos, vs, tab, n_rows = prep_cell_columns(
        xyz, jnp.zeros_like(xyz), valid, radius, m, C, R_pad
    )
    meta = jnp.stack(
        [
            radius * radius,
            jnp.minimum(n_rows, R_pad).astype(jnp.float32),
            jnp.asarray(gamma21, jnp.float32),
            jnp.asarray(gamma32, jnp.float32),
            jnp.float32(min_neighbors),
        ]
    )
    out1 = _run_pass(_iss_count_kernel, meta, tab, packed, R_pad, C, 8, interpret)
    counts_sorted, _ = _slot_gather(out1[:, 0, :], rank, pos, vs, order, R_pad, C)
    packed = packed.at[:N, CH_EXTRA].set(counts_sorted)

    out2 = _run_pass(_iss_saliency_kernel, meta, tab, packed, R_pad, C, 8, interpret)
    sal_sorted, _ = _slot_gather(out2[:, 0, :], rank, pos, vs, order, R_pad, C)
    ok_sorted, _ = _slot_gather(out2[:, 1, :], rank, pos, vs, order, R_pad, C)
    packed = packed.at[:N, CH_SAL].set(sal_sorted)
    packed = packed.at[:N, CH_OK].set(ok_sorted)

    out3 = _run_pass(_iss_nms_kernel, meta, tab, packed, R_pad, C, 8, interpret)
    kp_sorted, _ = _slot_gather(out3[:, 0, :], rank, pos, vs, order, R_pad, C)

    inv = jnp.argsort(order)
    return (kp_sorted[inv] > 0.5) & valid, jnp.where(valid, sal_sorted[inv], 0.0)


def iss_cells(
    xyz,
    valid,
    iss_radius,
    gamma21: float = 0.975,
    gamma32: float = 0.975,
    min_neighbors: int = 4,
    interpret=None,
    exact: bool = False,
):
    """Self-join ISS keypoints: (is_keypoint bool[N], saliency f32[N])."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    radius = jnp.asarray(iss_radius, jnp.float32)
    R_pad, Cb, m = _sizes(xyz, valid, radius, exact=exact)
    if Cb is None:
        raise ValueError(
            f"cell occupancy exceeds the {C_BUCKETS[-1]} kernel cap; "
            "use the XLA path for this cloud"
        )
    return _iss_impl(
        xyz, valid, radius, m, gamma21, gamma32, Cb, R_pad,
        interpret, min_neighbors,
    )


@functools.partial(jax.jit, static_argnames=("m", "C", "R_pad", "interpret"))
def _fpfh_impl(xyz, normal, valid, radius, m, C, R_pad, interpret):
    N = xyz.shape[0]
    packed, order, rank, pos, vs, tab, n_rows = prep_cell_columns(
        xyz, normal, valid, radius, m, C, R_pad
    )
    meta = jnp.stack([radius * radius, jnp.minimum(n_rows, R_pad).astype(jnp.float32)])
    spfh = _run_pass(
        _spfh_kernel, meta, tab, packed, R_pad, C, DIM + 1, interpret,
        extra_scratch=(pltpu.VMEM((DIM + 1, C), jnp.float32),),
    )
    # write each point's SPFH into its packed lanes for the combine pass
    slot, kept = _slot_map(rank, pos, vs, R_pad, C)
    spfh_lanes = jnp.swapaxes(spfh[:, 0:DIM, :], 1, 2).reshape(R_pad * C, DIM)
    spfh_sorted = jnp.where(kept[:, None], spfh_lanes[slot], 0.0)
    packed = packed.at[:N, CH_EXTRA : CH_EXTRA + DIM].set(spfh_sorted)

    out = _run_pass(
        _combine_kernel, meta, tab, packed, R_pad, C, DIM + 1, interpret,
        extra_scratch=(pltpu.VMEM((DIM + 1, C), jnp.float32),),
    )
    flat = jnp.swapaxes(out, 1, 2).reshape(R_pad * C, DIM + 1)
    feats_sorted = jnp.where(kept[:, None], flat[slot], 0.0)
    inv = jnp.argsort(order)
    feats = feats_sorted[inv]
    feat = feats[:, :DIM]
    k_cnt = feats[:, DIM]
    feat_valid = valid & (k_cnt > 0)
    feat = jnp.where(feat_valid[:, None], feat, 0.0)
    return feat, feat_valid


def fpfh_cells(xyz, normal, valid, radius, interpret=None,
               exact: bool = False):
    """Self-join FPFH: (feat f32[N,33], feat_valid bool[N])."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    radius = jnp.asarray(radius, jnp.float32)
    R_pad, Cb, m = _sizes(xyz, valid, radius, exact=exact)
    if Cb is None:
        raise ValueError(
            f"cell occupancy exceeds the {C_BUCKETS[-1]} kernel cap; "
            "use the XLA path for this cloud"
        )
    return _fpfh_impl(xyz, normal, valid, radius, m, Cb, R_pad, interpret)
