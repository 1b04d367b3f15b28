"""Unified cell-list Pallas kernels: surface (normals/density), ISS, FPFH.

The neighbor machinery for every self-join op in the pipeline:

  plan (XLA, ONE 8-operand sort per grid):  sort points by a lexicographic
      cell key (cell size >= search radius, so the 27-stencil is
      envelope-complete).  Occupancy statistics ride ON the same sorted
      order the kernels consume — exact run lengths, column (z-union)
      occupancies and per-bucket drop counts come out of the one sort, so
      the block sizes the host picks describe the grid that is actually
      built.  (Round-2 computed coarse-factor stats from the FINE-sorted
      key array; lexicographic order is NOT preserved under per-axis //m,
      so coarse cells fragmented into up to m^2 runs and the stats
      underestimated occupancy — the advisor-flagged bug.  The fix is
      structural: stats are now derived from the coarse-sorted order
      itself, and the quantile guesswork is replaced by exact drop
      accounting per candidate block size.)
  key bits:    allocated per axis from the measured AABB (ceil log2 of the
      cell count), so large scans are not clipped at 1024 cells/axis; the
      host refuses grids needing more than 30 total bits (invalid-key
      sentinel occupies bit 30) and the callers fall back to the XLA path.
  kernels:     G cells per grid step; the per-cell candidate columns are
      DMA'd in 128-row chunks sized to the ACTUAL column occupancy and
      double-buffered across cells (issue cell g+1's copies before waiting
      on cell g's), so DMA latency hides behind compute; the compute folds
      are chunk-adaptive too — near-empty stencil columns cost one
      [128, C] VPU pass instead of a full worst-case block.
      Every per-point input AND intermediate rides in the 128 lanes of the
      packed array (xyz, normal, id, valid, plus pass-written channels:
      ISS counts/saliency, SPFH histograms), so multi-pass ops chain by
      scattering results back into packed lanes between passes.

Passes:
  surface_cells: PCA normal + curvature + smoothed density + eigenvalues
      (pcl::NormalEstimationOMP radius variant, common.cpp:630-655;
      calculateSmoothedDensities, common.cpp:531-547).
  iss_cells:     counts -> weighted scatter saliency -> NMS
      (pcl::ISSKeypoint3D, common.cpp:657-691).
  surface_iss_cells: both of the above sharing ONE sorted grid (cell =
      max of the two radii; each pass masks its own radius) — one sort
      and one column table instead of two.
  fpfh_cells:    SPFH -> 1/d^2-weighted combine
      (pcl::FPFHEstimationOMP, include/common.h:322-332).

Parity tests: tests/test_cell_surface.py, test_cell_iss.py, test_cell_fpfh.py
(exact=True) and the non-exact m>1 grid-stats parity in test_cell_stats.py.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NR_BINS = 11
DIM = 33
PAD = 3.0e18
BIG = 3.0e38
_BIG_KEY = np.int32(1 << 30)
TAB_LANES = 128  # col_start @0:9, col_len @16:25, own @32/33; 128-lane DMA tile
# C is the LANE dimension of every compute array: sub-128 buckets would
# waste VREG lanes AND Mosaic rejects lane-unaligned sub-ref slices, so
# blocks are whole 128-lane tiles.
C_BUCKETS = (128, 256, 384, 512)
CC_BUCKETS = (128, 256, 384, 512, 768)
CHUNK = 128  # candidate DMA/compute granularity (sublane rows)
G_CELLS = 8  # cells per grid step (tab rows per auto-pipelined SMEM block)

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


# ---------------------------------------------------------------------------
# grid frame + keys (dynamic per-axis bit allocation)
# ---------------------------------------------------------------------------
def _grid_frame(xyz, valid, cell):
    """(origin f32[3], inv f32, bits (bx, by, bz) i32 scalars).

    Per-axis key widths are ceil(log2(cells along that axis)) measured from
    the AABB, so flat scans spend their bits on x/y instead of clipping at
    a fixed 10 bits per axis (round-2 behavior, which broke past 1024
    cells/axis — a 10M-point scan at ISS radius needs ~2^11 x/y cells)."""
    big = jnp.float32(3.0e37)
    lo = jnp.min(jnp.where(valid[:, None], xyz, big), axis=0)
    hi = jnp.max(jnp.where(valid[:, None], xyz, -big), axis=0)
    ok = (lo <= hi) & jnp.isfinite(lo) & jnp.isfinite(hi)
    lo = jnp.where(ok, lo, 0.0)
    hi = jnp.where(ok, hi, 0.0)
    origin = lo - 0.5 * cell
    inv = 1.0 / jnp.maximum(cell, 1e-30)
    n = jnp.floor((hi - origin) * inv).astype(jnp.int32) + 1

    def nbits(v):
        k = jnp.arange(15, dtype=jnp.int32)
        return jnp.sum((v > (1 << k)).astype(jnp.int32))

    return origin, inv, (nbits(n[0]), nbits(n[1]), nbits(n[2]))


def _lex_keys(xyz, valid, origin, inv, bits):
    bx, by, bz = bits
    clips = [(1 << b) - 1 for b in bits]
    cs = []
    for d in range(3):
        c = jnp.floor((xyz[:, d] - origin[d]) * inv)
        cs.append(jnp.clip(c, 0, clips[d]).astype(jnp.int32))
    key = (cs[0] << (by + bz)) | (cs[1] << bz) | cs[2]
    return jnp.where(valid, key, _BIG_KEY), cs, clips


def _coarsen_key(key, bits, m):
    bx, by, bz = bits
    kx = key >> (by + bz)
    ky = (key >> bz) & ((1 << by) - 1)
    kz = key & ((1 << bz) - 1)
    return ((kx // m) << (by + bz)) | ((ky // m) << bz) | (kz // m)


# ---------------------------------------------------------------------------
# planning: ONE heavy sort per grid, stats riding on it
# ---------------------------------------------------------------------------
_N_SAMPLE = 4096


@jax.jit
def _light_stats(xyz, valid, cell):
    """Cheap m-choice pass: 1-operand key sort at m=1, sampled median cell
    occupancy.  Returns f32[2] = (occ_q50, n_valid)."""
    origin, inv, bits = _grid_frame(xyz, valid, cell)
    keys, _, _ = _lex_keys(xyz, valid, origin, inv, bits)
    ks = jnp.sort(keys)
    N = ks.shape[0]
    vs = ks < _BIG_KEY
    n_valid = jnp.sum(vs.astype(jnp.int32))
    idx = jnp.arange(N, dtype=jnp.int32)
    first = vs & jnp.concatenate([jnp.ones((1,), bool), ks[1:] != ks[:-1]])
    run_start = jax.lax.associative_scan(jnp.maximum, jnp.where(first, idx, -1))
    last = vs & jnp.concatenate([ks[1:] != ks[:-1], jnp.ones((1,), bool)])
    run_end = jax.lax.associative_scan(
        jnp.minimum, jnp.where(last, idx, jnp.int32(2**30)), reverse=True
    )
    occ = jnp.where(vs, run_end - run_start + 1, 0)
    samp = (jnp.arange(_N_SAMPLE, dtype=jnp.int32) * jnp.maximum(n_valid, 1)) // _N_SAMPLE
    occ_s = jnp.sort(occ[samp])
    return jnp.stack(
        [occ_s[_N_SAMPLE // 2].astype(jnp.float32), n_valid.astype(jnp.float32)]
    )


# stats vector layout (host parses by these offsets)
_ST_NROWS = 0
_ST_NVALID = 1
_ST_MAXOCC = 2
_ST_COLMAX = 3
_ST_BITS = 4
_ST_DROPC = 5  # len(C_BUCKETS) entries
_ST_DROPCC = _ST_DROPC + len(C_BUCKETS)  # len(CC_BUCKETS) entries
_ST_LEN = _ST_DROPCC + len(CC_BUCKETS)


@jax.jit
def _sort_stats(xyz, normal, valid, cell, m):
    """THE grid sort (8 operands, stable) + exact occupancy statistics.

    m is a traced cell-growth factor: the grid cell is m*cell but ids are
    the fine ids integer-divided by m (same origin), and the SORT is by the
    coarse key, so every downstream consumer (stats, column table, kernels)
    sees the identical partition.  Returns (state tuple kept on device,
    stats f32[_ST_LEN] pulled once by the host):

      stats = [n_rows, n_valid, max occupancy, max column (z-union)
               occupancy, total key bits,
               per C bucket: #points with in-cell position >= bucket
               (queries that would lose their slot),
               per CC bucket: #points whose own 3-z column run exceeds the
               bucket (candidates that would be truncated)]."""
    origin, inv, bits = _grid_frame(xyz, valid, cell)
    fkeys, _, clips = _lex_keys(xyz, valid, origin, inv, bits)
    keys = jnp.where(fkeys < _BIG_KEY, _coarsen_key(fkeys, bits, m), _BIG_KEY)
    N = xyz.shape[0]
    ks, xs, ys, zs, nxs, nys, nzs, order = jax.lax.sort(
        (keys, xyz[:, 0], xyz[:, 1], xyz[:, 2],
         normal[:, 0], normal[:, 1], normal[:, 2],
         jnp.arange(N, dtype=jnp.int32)),
        num_keys=1,
        is_stable=True,
    )
    idx = jnp.arange(N, dtype=jnp.int32)
    vs = ks < _BIG_KEY
    n_valid = jnp.sum(vs.astype(jnp.int32))
    first = vs & jnp.concatenate([jnp.ones((1,), bool), ks[1:] != ks[:-1]])
    rank = jnp.cumsum(first.astype(jnp.int32)) - 1
    n_rows = jnp.maximum(rank[-1] + 1, 0)
    run_start = jax.lax.associative_scan(jnp.maximum, jnp.where(first, idx, -1))
    pos = idx - run_start
    last = vs & jnp.concatenate([ks[1:] != ks[:-1], jnp.ones((1,), bool)])
    run_end = jax.lax.associative_scan(
        jnp.minimum, jnp.where(last, idx, jnp.int32(2**30)), reverse=True
    )
    occ = jnp.where(vs, run_end - run_start + 1, 0)
    maxocc = jnp.max(occ)

    # column (3-cell z-union) occupancy per point, via run-neighbor
    # adjacency in the sorted order: prev run's last element sits at
    # first-1, next run's first at last+1, so shifts give the z-1/z+1
    # occupancies without any gather or extra sort.
    bx, by, bz = bits
    kz = ks & ((1 << bz) - 1)
    clip_z = clips[2] // jnp.maximum(m, 1)
    prev_k = jnp.concatenate([jnp.full((1,), _BIG_KEY), ks[:-1]])
    prev_occ = jnp.concatenate([jnp.zeros((1,), jnp.int32), occ[:-1]])
    next_k = jnp.concatenate([ks[1:], jnp.full((1,), _BIG_KEY)])
    next_occ = jnp.concatenate([occ[1:], jnp.zeros((1,), jnp.int32)])
    a_first = occ + jnp.where((kz > 0) & (prev_k == ks - 1), prev_occ, 0)
    a_prop = jax.lax.associative_scan(jnp.maximum, jnp.where(first, a_first, -1))
    b_last = jnp.where((kz < clip_z) & (next_k == ks + 1), next_occ, 0)
    b_prop = jax.lax.associative_scan(
        jnp.maximum, jnp.where(last, b_last, -1), reverse=True
    )
    colocc = jnp.where(vs, a_prop + b_prop, 0)
    # gap-centered windows: a query in cell z references column (x', y')
    # whose z and z-1 may be empty while z-2/z+1 are not; the widest such
    # window is occ(r) + occ(next) when the next run is exactly 2 z-cells up
    gap = occ + jnp.where(last & (kz + 2 <= clip_z) & (next_k == ks + 2), next_occ, 0)
    colmax = jnp.maximum(jnp.max(colocc), jnp.max(jnp.where(vs, gap, 0)))

    drops_c = [jnp.sum((vs & (pos >= b)).astype(jnp.int32)) for b in C_BUCKETS]
    drops_cc = [jnp.sum((vs & (colocc > b)).astype(jnp.int32)) for b in CC_BUCKETS]
    stats = jnp.stack(
        [
            n_rows.astype(jnp.float32),
            n_valid.astype(jnp.float32),
            maxocc.astype(jnp.float32),
            colmax.astype(jnp.float32),
            (bx + by + bz).astype(jnp.float32),
        ]
        + [d.astype(jnp.float32) for d in drops_c]
        + [d.astype(jnp.float32) for d in drops_cc]
    )
    state = (ks, xs, ys, zs, nxs, nys, nzs, order, vs, rank, pos,
             jnp.stack([bx, by, bz]), jnp.asarray(m, jnp.int32))
    return state, stats


class GridPlan:
    """Host-side sizing decisions + device-resident sorted state."""

    __slots__ = ("C", "CC", "R_pad", "m", "n_rows", "n_valid", "dropped_q",
                 "dropped_cc", "maxocc", "colmax", "state")

    def __init__(self, C, CC, R_pad, m, n_rows, n_valid, dropped_q,
                 dropped_cc, maxocc, colmax, state):
        self.C, self.CC, self.R_pad, self.m = C, CC, R_pad, m
        self.n_rows, self.n_valid = n_rows, n_valid
        self.dropped_q, self.dropped_cc = dropped_q, dropped_cc
        self.maxocc, self.colmax = maxocc, colmax
        self.state = state


OCC_TARGET = 96  # grow the cell until the median point's cell holds ~this
# (the query block is a full 128-lane tile; near-full median occupancy
# keeps the lanes busy without inflating the stencil volume too much)
_DROP_TOL = 2e-3  # accepted silently-capped point fraction (exact mode: 0)


def plan_grid(xyz, normal, valid, cell, exact: bool = False,
              m: int | None = None, drop_tol: float = _DROP_TOL):
    """Sort + size one grid.  Raises ValueError when the cloud does not fit
    the kernel format (too many key bits / occupancy beyond every bucket) —
    callers fall back to the XLA path.

    Cap semantics (same spirit as the reference's max_neighbors_,
    iss_debug.cpp:47-54) are now EXPLICIT: the C/CC buckets are the
    smallest whose measured overflow point count is within drop_tol, and
    the overflow counts are reported on the plan (and printed when they are
    nonzero) instead of silently truncating."""
    if xyz.shape[0] >= (1 << 24):
        # point ids ride in f32 packed lanes: exact only below 2^24
        raise ValueError(
            f"N={xyz.shape[0]} exceeds the 2^24 f32-exact id limit of the "
            "packed-lane cell kernels"
        )
    if exact:
        m = 1
    if m is None:
        q50, _nv = np.asarray(_light_stats(xyz, valid, jnp.asarray(cell, jnp.float32)))
        # 2.5D growth model: occupancy ~ m^2 for surface-like scans
        m = int(np.clip(round(float(np.sqrt(OCC_TARGET / max(q50, 1.0)))), 1, 4))
    state, stats = _sort_stats(
        xyz, normal, valid, jnp.asarray(cell, jnp.float32), jnp.int32(m)
    )
    st = np.asarray(stats).astype(np.int64)
    n_rows, n_valid, maxocc, colmax, bits = st[0], st[1], st[2], st[3], st[4]
    if bits > 30:
        raise ValueError(f"grid needs {bits} key bits (> 30); XLA fallback")
    tol = 0 if exact else max(int(drop_tol * max(n_valid, 1)), 0)
    C = next(
        (b for b, d in zip(C_BUCKETS, st[_ST_DROPC:_ST_DROPC + len(C_BUCKETS)])
         if d <= tol),
        None,
    )
    CC = next(
        (b for b, d in zip(CC_BUCKETS, st[_ST_DROPCC:_ST_DROPCC + len(CC_BUCKETS)])
         if d <= tol),
        None,
    )
    if C is None or CC is None:
        raise ValueError(
            f"cell occupancy (max {maxocc}, column max {colmax}) exceeds the "
            f"kernel caps at drop tolerance {tol}; use the XLA path"
        )
    dropped_q = int(st[_ST_DROPC + C_BUCKETS.index(C)])
    dropped_cc = int(st[_ST_DROPCC + CC_BUCKETS.index(CC)])
    if dropped_q or dropped_cc:
        print(
            f"# cellgrid plan: capping {dropped_q} query slots / "
            f"{dropped_cc} column candidates of {n_valid} points "
            f"(C={C}, CC={CC})",
            flush=True,
        )
    R_pad = max(G_CELLS, _round_up(max(int(n_rows), 1), G_CELLS))
    R_pad = min(R_pad, _round_up(xyz.shape[0] + 1, G_CELLS))
    return GridPlan(int(C), int(CC), int(R_pad), int(m), int(n_rows),
                    int(n_valid), dropped_q, dropped_cc, int(maxocc),
                    int(colmax), state)


# ---------------------------------------------------------------------------
# table build (from the sorted state; no further sorts)
# ---------------------------------------------------------------------------
def _build_tables(state, C: int, CC: int, R_pad: int):
    """Per-cell 9-column run table + packed [N + CC + CHUNK, 128] lanes.

    tab row r: for each of the 9 (dx, dy) stencil columns, the sorted-point
    offset and length of the contiguous (z-1, z, z+1) cell run union, plus
    the row's own run (start, len)."""
    (ks, xs, ys, zs, nxs, nys, nzs, order, vs, rank, pos, bits_arr, m) = state
    N = ks.shape[0]
    bx, by, bz = bits_arr[0], bits_arr[1], bits_arr[2]
    n_valid = jnp.sum(vs.astype(jnp.int32))
    n_rows = jnp.maximum(jnp.max(jnp.where(vs, rank, -1)) + 1, 0)

    rank_for_search = jnp.where(vs, rank, jnp.int32(2**30))
    rows = jnp.arange(R_pad, dtype=jnp.int32)
    row_start = jnp.searchsorted(rank_for_search, rows, side="left").astype(jnp.int32)
    row_key = ks[jnp.minimum(row_start, N - 1)]
    row_key = jnp.where(rows < n_rows, row_key, _BIG_KEY)
    row_start = jnp.where(rows < n_rows, row_start, n_valid)
    row_end = jnp.concatenate([row_start[1:], n_valid[None]])
    row_len = jnp.maximum(row_end - row_start, 0)

    # coarse per-axis bounds (ids are fine//m, fields keep the fine widths)
    clip_cx = ((1 << bx) - 1) // m
    clip_cy = ((1 << by) - 1) // m
    clip_cz = ((1 << bz) - 1) // m
    kx = row_key >> (by + bz)
    ky = (row_key >> bz) & ((1 << by) - 1)
    kz = row_key & ((1 << bz) - 1)
    col_offs = [(i, j) for i in (-1, 0, 1) for j in (-1, 0, 1)]
    col_start = jnp.zeros((R_pad, 9), jnp.int32)
    col_len = jnp.zeros((R_pad, 9), jnp.int32)
    for ci, (di, dj) in enumerate(col_offs):
        nkx = kx + di
        nky = ky + dj
        xy_ok = (nkx >= 0) & (nkx <= clip_cx) & (nky >= 0) & (nky <= clip_cy)
        starts = []
        lens = []
        exists = []
        for dk in (-1, 0, 1):
            nkz = kz + dk
            z_ok = (nkz >= 0) & (nkz <= clip_cz)
            nkey = (nkx << (by + bz)) | (nky << bz) | nkz
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
    # tail pad: chunked column DMAs (ceil(len/CHUNK) copies) never overrun
    packed = jnp.concatenate(
        [packed, jnp.full((CC + CHUNK, 128), jnp.float32(PAD))], axis=0
    )
    return packed, tab, n_rows


def _slot_map(rank, pos, vs, R_pad, C):
    slot = jnp.clip(rank, 0, R_pad - 1) * C + jnp.minimum(pos, C - 1)
    kept = vs & (rank >= 0) & (rank < R_pad) & (pos < C)
    return slot, kept


def _slot_gather(out_ch, rank, pos, vs, R_pad, C):
    """Map one [R_pad, C] output channel back to sorted point order."""
    slot, kept = _slot_map(rank, pos, vs, R_pad, C)
    vals_sorted = jnp.where(kept, out_ch.reshape(-1)[slot], 0.0)
    return vals_sorted, kept


def _query_lanes(qblk, eye):
    """[C, 128] own block (sublanes) -> [128, C] lane-major via one MXU op."""
    return jax.lax.dot_general(
        qblk, eye, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


# ---------------------------------------------------------------------------
# blocked pass runner: G cells per step, double-buffered chunked DMAs
# ---------------------------------------------------------------------------
def _issue_cell(tab_ref, g, packed_ref, cand, qblk, csems, qsem, slot, C, CC):
    own_start = tab_ref[g, 32]
    pltpu.make_async_copy(
        packed_ref.at[pl.ds(own_start, C), :], qblk.at[slot], qsem.at[slot]
    ).start()

    def col(c, _):
        cst = tab_ref[g, c]
        clen = tab_ref[g, 16 + c]
        nch = jnp.minimum(pl.cdiv(clen, CHUNK), CC // CHUNK)

        def one(k, _):
            pltpu.make_async_copy(
                packed_ref.at[pl.ds(cst + CHUNK * k, CHUNK), :],
                cand.at[slot, c, pl.ds(CHUNK * k, CHUNK), :],
                csems.at[slot, c],
            ).start()
            return 0

        jax.lax.fori_loop(0, nch, one, 0)
        return 0

    jax.lax.fori_loop(0, 9, col, 0)


def _wait_cell(tab_ref, g, packed_ref, cand, qblk, csems, qsem, slot, C, CC):
    own_start = tab_ref[g, 32]
    pltpu.make_async_copy(
        packed_ref.at[pl.ds(own_start, C), :], qblk.at[slot], qsem.at[slot]
    ).wait()

    def col(c, _):
        cst = tab_ref[g, c]
        clen = tab_ref[g, 16 + c]
        nch = jnp.minimum(pl.cdiv(clen, CHUNK), CC // CHUNK)

        def one(k, _):
            pltpu.make_async_copy(
                packed_ref.at[pl.ds(cst + CHUNK * k, CHUNK), :],
                cand.at[slot, c, pl.ds(CHUNK * k, CHUNK), :],
                csems.at[slot, c],
            ).wait()
            return 0

        jax.lax.fori_loop(0, nch, one, 0)
        return 0

    jax.lax.fori_loop(0, 9, col, 0)


def _fold_cols_chunked(tab_ref, g, cand_slot, CC, body, init):
    """Fold body(cc_chunk [CHUNK,128], jc_global [CHUNK,1], clen, acc) over
    the occupied CHUNK-row chunks of the 9 candidate columns."""

    def col_step(c, acc):
        clen = tab_ref[g, 16 + c]
        nch = jnp.minimum(pl.cdiv(clen, CHUNK), CC // CHUNK)

        def ch_step(k, acc):
            cc = cand_slot[c, pl.ds(CHUNK * k, CHUNK), :]
            jc = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0) + CHUNK * k
            return body(cc, jc, clen, acc)

        return jax.lax.fori_loop(0, nch, ch_step, acc)

    return jax.lax.fori_loop(0, 9, col_step, init)


def _make_blocked_kernel(cell_fn, n_out: int, C: int, CC: int):
    """Wrap a per-cell compute into the G-blocked double-buffered driver.

    cell_fn(meta_ref, tab_ref, g, cand_slot, qrow, out_g, scratch) writes
    out_g [n_out, C]; qrow is the lane-major [128, C] own block."""

    def kernel(meta_ref, tab_ref, packed_ref, out_ref, cand, qblk, *rest):
        csems, qsem = rest[-2], rest[-1]
        scratch = rest[:-2]
        rblk = pl.program_id(0)
        n_rows = meta_ref[1].astype(jnp.int32)
        eye = jnp.eye(C, dtype=jnp.float32)

        @pl.when(rblk * G_CELLS < n_rows)
        def _():
            _issue_cell(tab_ref, 0, packed_ref, cand, qblk, csems, qsem, 0, C, CC)

        for g in range(G_CELLS):
            slot = g & 1
            if g + 1 < G_CELLS:

                @pl.when(rblk * G_CELLS + g + 1 < n_rows)
                def _(g=g):
                    _issue_cell(
                        tab_ref, g + 1, packed_ref, cand, qblk, csems, qsem,
                        (g + 1) & 1, C, CC,
                    )

            @pl.when(rblk * G_CELLS + g < n_rows)
            def _(g=g, slot=slot):
                _wait_cell(tab_ref, g, packed_ref, cand, qblk, csems, qsem, slot, C, CC)
                qrow = _query_lanes(qblk[slot], eye)
                cell_fn(meta_ref, tab_ref, g, cand.at[slot], qrow,
                        out_ref.at[g], scratch)

            @pl.when(rblk * G_CELLS + g >= n_rows)
            def _(g=g):
                out_ref[g] = jnp.zeros((n_out, C), jnp.float32)

    return kernel


def _run_pass(cell_fn, meta, tab, packed, R_pad, C, CC, n_out, interpret,
              extra_scratch=()):
    kernel = _make_blocked_kernel(cell_fn, n_out, C, CC)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(R_pad // G_CELLS,),
        in_specs=[
            pl.BlockSpec(
                (G_CELLS, TAB_LANES), lambda r, *_: (r, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (G_CELLS, n_out, C), lambda r, *_: (r, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 9, CC, 128), jnp.float32),
            pltpu.VMEM((2, C, 128), jnp.float32),
            *extra_scratch,
            pltpu.SemaphoreType.DMA((2, 9)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R_pad, n_out, C), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(meta, tab, packed)


def _round_up(n, mult):
    return ((n + mult - 1) // mult) * mult


# ---------------------------------------------------------------------------
# eigen helper (shared by surface + ISS saliency)
# ---------------------------------------------------------------------------
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
# surface cell: count/mean/covariance -> normal, curvature, eigvals, NN
# ---------------------------------------------------------------------------
N_CH_SURF = 16


def _surface_cell(meta_ref, tab_ref, g, cand_slot, qrow, out_g, scratch):
    C = qrow.shape[1]
    CC = cand_slot.shape[1]
    qx, qy, qz = qrow[0:1, :], qrow[1:2, :], qrow[2:3, :]
    qvalid = qrow[CH_VALID:CH_VALID + 1, :] > 0.5
    r2 = meta_ref[0]

    zero = jnp.zeros((1, C), jnp.float32)
    init = (zero,) * 10 + (jnp.full((1, C), BIG), jnp.full((1, C), -1.0))

    def body(cc, jc, clen, acc):
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

    (s1, sx, sy, sz, sxx, sxy, sxz, syy, syz, szz, dmin, nnid) = _fold_cols_chunked(
        tab_ref, g, cand_slot, CC, body, init
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
    out_g[0, :] = vx[0]
    out_g[1, :] = vy[0]
    out_g[2, :] = vz[0]
    tot = jnp.maximum(l0 + l1 + l2, 1e-30)
    out_g[3, :] = jnp.where(tot > 0, jnp.maximum(l0, 0.0) / tot, 0.0)[0]
    out_g[4, :] = l0[0]
    out_g[5, :] = l1[0]
    out_g[6, :] = l2[0]
    out_g[7, :] = s1[0]
    out_g[8, :] = jnp.sqrt(jnp.minimum(dmin, BIG))[0]
    out_g[9, :] = nnid[0]
    out_g[10:, :] = jnp.zeros((N_CH_SURF - 10, C), jnp.float32)


# ---------------------------------------------------------------------------
# ISS cells
# ---------------------------------------------------------------------------
def _iss_count_cell(meta_ref, tab_ref, g, cand_slot, qrow, out_g, scratch):
    C = qrow.shape[1]
    CC = cand_slot.shape[1]
    qx, qy, qz = qrow[0:1, :], qrow[1:2, :], qrow[2:3, :]
    qvalid = qrow[CH_VALID:CH_VALID + 1, :] > 0.5
    r2 = meta_ref[0]

    def body(cc, jc, clen, s1):
        dx = cc[:, 0:1] - qx
        dy = cc[:, 1:2] - qy
        dz = cc[:, 2:3] - qz
        d2 = dx * dx + dy * dy + dz * dz
        ok = (d2 <= r2) & (jc < clen) & (cc[:, 7:8] > 0.5) & qvalid
        return s1 + jnp.sum(ok.astype(jnp.float32), axis=0, keepdims=True)

    s1 = _fold_cols_chunked(
        tab_ref, g, cand_slot, CC, body, jnp.zeros((1, C), jnp.float32)
    )
    out_g[0, :] = s1[0]  # includes self (d2 = 0 passes)
    out_g[1:, :] = jnp.zeros((out_g.shape[0] - 1, C), jnp.float32)


def _iss_saliency_cell(meta_ref, tab_ref, g, cand_slot, qrow, out_g, scratch):
    C = qrow.shape[1]
    CC = cand_slot.shape[1]
    qx, qy, qz = qrow[0:1, :], qrow[1:2, :], qrow[2:3, :]
    qvalid = qrow[CH_VALID:CH_VALID + 1, :] > 0.5
    r2 = meta_ref[0]
    gamma21 = meta_ref[2]
    gamma32 = meta_ref[3]

    zero = jnp.zeros((1, C), jnp.float32)
    init = (zero,) * 8

    def body(cc, jc, clen, acc):
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
            ok, 1.0 / jnp.maximum(cc[:, CH_EXTRA:CH_EXTRA + 1], 1.0), 0.0
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

    ws, sxx, sxy, sxz, syy, syz, szz, nnb = _fold_cols_chunked(
        tab_ref, g, cand_slot, CC, body, init
    )
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
    out_g[0, :] = jnp.where(ok_g, l3, 0.0)[0]
    out_g[1, :] = ok_g.astype(jnp.float32)[0]
    out_g[2, :] = nnb[0]
    out_g[3:, :] = jnp.zeros((out_g.shape[0] - 3, C), jnp.float32)


def _iss_nms_cell(meta_ref, tab_ref, g, cand_slot, qrow, out_g, scratch):
    C = qrow.shape[1]
    CC = cand_slot.shape[1]
    qx, qy, qz = qrow[0:1, :], qrow[1:2, :], qrow[2:3, :]
    qvalid = qrow[CH_VALID:CH_VALID + 1, :] > 0.5
    q_sal = qrow[CH_SAL:CH_SAL + 1, :]
    q_ok = qrow[CH_OK:CH_OK + 1, :] > 0.5
    r2 = meta_ref[0]
    min_nb = meta_ref[4]

    init = (jnp.full((1, C), -BIG), jnp.zeros((1, C), jnp.float32))

    def body(cc, jc, clen, acc):
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
                jnp.where(ok, cc[:, CH_SAL:CH_SAL + 1], -BIG),
                axis=0,
                keepdims=True,
            ),
        )
        nnb += jnp.sum(ok.astype(jnp.float32), axis=0, keepdims=True)
        return (nb_max, nnb)

    nb_max, nnb = _fold_cols_chunked(tab_ref, g, cand_slot, CC, body, init)
    is_kp = q_ok & (nnb >= min_nb) & (q_sal > nb_max) & qvalid
    out_g[0, :] = is_kp.astype(jnp.float32)[0]
    out_g[1:, :] = jnp.zeros((out_g.shape[0] - 1, C), jnp.float32)


# ---------------------------------------------------------------------------
# FPFH cells
# ---------------------------------------------------------------------------
def _pair_feature_bins(qx, qy, qz, qnx, qny, qnz, cc, r2):
    """Darboux features + bins for one candidate chunk vs the query lanes.

    q*: [1, C] lane vectors; cc: [CHUNK, 128] candidates on sublanes.
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


def _spfh_cell(meta_ref, tab_ref, g, cand_slot, qrow, out_g, scratch):
    (acc,) = scratch
    C = qrow.shape[1]
    CC = cand_slot.shape[1]
    qx, qy, qz = qrow[0:1, :], qrow[1:2, :], qrow[2:3, :]
    qnx, qny, qnz = qrow[3:4, :], qrow[4:5, :], qrow[5:6, :]
    qvalid = qrow[CH_VALID:CH_VALID + 1, :] > 0.5
    r2 = meta_ref[0]

    acc[...] = jnp.zeros_like(acc)

    def body(cc, jc, clen, _):
        b1, b2, b3, ok = _pair_feature_bins(qx, qy, qz, qnx, qny, qnz, cc, r2)
        ok = ok & (jc < clen) & (cc[:, 7:8] > 0.5) & qvalid
        okf = ok.astype(jnp.float32)
        acc[DIM:DIM + 1, :] += jnp.sum(okf, axis=0, keepdims=True)
        for which, b in enumerate((b1, b2, b3)):
            for k in range(NR_BINS):
                acc[which * NR_BINS + k:which * NR_BINS + k + 1, :] += jnp.sum(
                    jnp.where(b == k, okf, 0.0), axis=0, keepdims=True
                )
        return 0

    _fold_cols_chunked(tab_ref, g, cand_slot, CC, body, 0)
    cnt = acc[DIM:DIM + 1, :]
    incr = jnp.where(cnt > 0, 100.0 / jnp.maximum(cnt, 1.0), 0.0)
    out_g[0:DIM, :] = acc[0:DIM, :] * incr
    out_g[DIM, :] = cnt[0]


def _combine_cell(meta_ref, tab_ref, g, cand_slot, qrow, out_g, scratch):
    """FPFH combine: the SPFH of every point rides in packed lanes
    CH_EXTRA..CH_EXTRA+33 (written back between passes), so the weighted
    neighbor sum is a small MXU matmul per candidate chunk."""
    (wsum,) = scratch
    C = qrow.shape[1]
    CC = cand_slot.shape[1]
    qx, qy, qz = qrow[0:1, :], qrow[1:2, :], qrow[2:3, :]
    qvalid = qrow[CH_VALID:CH_VALID + 1, :] > 0.5
    q_spfh = qrow[CH_EXTRA:CH_EXTRA + DIM, :]  # [33, C]
    r2 = meta_ref[0]

    wsum[...] = jnp.zeros_like(wsum)

    def body(cc, jc, clen, _):
        cx, cy, cz = cc[:, 0:1], cc[:, 1:2], cc[:, 2:3]
        d2 = (cx - qx) ** 2 + (cy - qy) ** 2 + (cz - qz) ** 2
        ok = (
            (d2 > 0.0)
            & (d2 <= r2)
            & (jc < clen)
            & (cc[:, 7:8] > 0.5)
            & qvalid
        )
        w = jnp.where(ok, 1.0 / jnp.maximum(d2, 1e-30), 0.0)  # [CHUNK, C]
        wsum[DIM:DIM + 1, :] += jnp.sum(
            ok.astype(jnp.float32), axis=0, keepdims=True
        )
        # [33, C] += SPFH_cand^T [33, CHUNK] @ W [CHUNK, C]
        wsum[0:DIM, :] += jax.lax.dot_general(
            cc[:, CH_EXTRA:CH_EXTRA + DIM],
            w,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return 0

    _fold_cols_chunked(tab_ref, g, cand_slot, CC, body, 0)
    kcnt = wsum[DIM:DIM + 1, :]
    mean = wsum[0:DIM, :] / jnp.maximum(kcnt, 1.0)
    feat = q_spfh + mean
    blocks = []
    for blk in range(3):
        f = feat[blk * NR_BINS:(blk + 1) * NR_BINS, :]
        s = jnp.sum(f, axis=0, keepdims=True)
        blocks.append(jnp.where(s > 0, 100.0 * f / jnp.maximum(s, 1e-30), f))
    out_g[:, :] = jnp.concatenate(blocks + [kcnt], axis=0)  # [34, C]


# ---------------------------------------------------------------------------
# jitted pass drivers (consume the sorted state; statics fixed by the plan)
# ---------------------------------------------------------------------------
def _default_interpret(interpret):
    if interpret is None:
        return jax.default_backend() not in ("tpu", "axon")
    return interpret


@functools.partial(
    jax.jit,
    static_argnames=("C", "CC", "R_pad", "interpret", "do_surface", "do_iss",
                     "min_neighbors"),
)
def _surface_iss_impl(state, normal_r2, iss_r2, gamma21, gamma32, viewpoint,
                      C, CC, R_pad, interpret, do_surface, do_iss,
                      min_neighbors):
    (ks, xs, ys, zs, nxs, nys, nzs, order, vs, rank, pos, bits_arr, m) = state
    N = ks.shape[0]
    packed, tab, n_rows = _build_tables(state, C, CC, R_pad)
    nrows_f = jnp.minimum(n_rows, R_pad).astype(jnp.float32)
    inv = jnp.argsort(order)
    out = {}

    if do_surface:
        meta = jnp.stack([normal_r2, nrows_f, jnp.float32(0), jnp.float32(0),
                          jnp.float32(0)])
        srf = _run_pass(_surface_cell, meta, tab, packed, R_pad, C, CC,
                        N_CH_SURF, interpret)
        chans = []
        for ch in range(10):
            v, _ = _slot_gather(srf[:, ch, :], rank, pos, vs, R_pad, C)
            chans.append(v[inv])
        nx, ny, nz, curv, l0, l1, l2, cnt, dmin, nnid_f = chans
        normal = jnp.stack([nx, ny, nz], axis=1)
        eigvals = jnp.stack([l0, l1, l2], axis=1)
        nnid = jnp.clip(nnid_f.astype(jnp.int32), 0, N - 1)
        has_nn = (nnid_f >= 0) & (dmin < BIG / 2)
        valid_o = vs[inv]  # vs is sorted-order; inv maps back to input order
        ok = valid_o & (cnt >= 3)
        to_vp = viewpoint[None, :] - jnp.stack(
            [xs[inv], ys[inv], zs[inv]], axis=1
        )
        flip = jnp.sum(normal * to_vp, axis=-1) < 0.0
        normal = jnp.where(flip[:, None], -normal, normal)
        normal = jnp.where(ok[:, None], normal, 0.0)
        d_raw = jnp.where(valid_o & has_nn, dmin, 0.0)
        d_nn = jnp.where(has_nn, d_raw[nnid], d_raw)
        density = jnp.where(
            valid_o & has_nn,
            jnp.minimum(d_raw, jnp.where(d_nn > 0, d_nn, d_raw)),
            0.0,
        )
        out.update(normal=normal, curv=curv, density=density,
                   eigvals=eigvals, ok=ok)

    if do_iss:
        meta = jnp.stack([iss_r2, nrows_f, gamma21, gamma32,
                          jnp.float32(min_neighbors)])
        o1 = _run_pass(_iss_count_cell, meta, tab, packed, R_pad, C, CC, 8,
                       interpret)
        counts_sorted, _ = _slot_gather(o1[:, 0, :], rank, pos, vs, R_pad, C)
        packed = packed.at[:N, CH_EXTRA].set(counts_sorted)

        o2 = _run_pass(_iss_saliency_cell, meta, tab, packed, R_pad, C, CC, 8,
                       interpret)
        sal_sorted, _ = _slot_gather(o2[:, 0, :], rank, pos, vs, R_pad, C)
        ok_sorted, _ = _slot_gather(o2[:, 1, :], rank, pos, vs, R_pad, C)
        packed = packed.at[:N, CH_SAL].set(sal_sorted)
        packed = packed.at[:N, CH_OK].set(ok_sorted)

        o3 = _run_pass(_iss_nms_cell, meta, tab, packed, R_pad, C, CC, 8,
                       interpret)
        kp_sorted, _ = _slot_gather(o3[:, 0, :], rank, pos, vs, R_pad, C)
        valid_o = vs[inv]
        out.update(
            kp=(kp_sorted[inv] > 0.5) & valid_o,
            saliency=jnp.where(valid_o, sal_sorted[inv], 0.0),
        )
    return out


@functools.partial(jax.jit, static_argnames=("C", "CC", "R_pad", "interpret"))
def _fpfh_impl(state, r2, C, CC, R_pad, interpret):
    (ks, xs, ys, zs, nxs, nys, nzs, order, vs, rank, pos, bits_arr, m) = state
    N = ks.shape[0]
    packed, tab, n_rows = _build_tables(state, C, CC, R_pad)
    nrows_f = jnp.minimum(n_rows, R_pad).astype(jnp.float32)
    meta = jnp.stack([r2, nrows_f])
    spfh = _run_pass(
        _spfh_cell, meta, tab, packed, R_pad, C, CC, DIM + 1, interpret,
        extra_scratch=(pltpu.VMEM((DIM + 1, C), jnp.float32),),
    )
    # write each point's SPFH into its packed lanes for the combine pass
    slot, kept = _slot_map(rank, pos, vs, R_pad, C)
    spfh_lanes = jnp.swapaxes(spfh[:, 0:DIM, :], 1, 2).reshape(R_pad * C, DIM)
    spfh_sorted = jnp.where(kept[:, None], spfh_lanes[slot], 0.0)
    packed = packed.at[:N, CH_EXTRA:CH_EXTRA + DIM].set(spfh_sorted)

    outp = _run_pass(
        _combine_cell, meta, tab, packed, R_pad, C, CC, DIM + 1, interpret,
        extra_scratch=(pltpu.VMEM((DIM + 1, C), jnp.float32),),
    )
    flat = jnp.swapaxes(outp, 1, 2).reshape(R_pad * C, DIM + 1)
    feats_sorted = jnp.where(kept[:, None], flat[slot], 0.0)
    inv = jnp.argsort(order)
    feats = feats_sorted[inv]
    feat = feats[:, :DIM]
    k_cnt = feats[:, DIM]
    valid_o = vs[inv]
    feat_valid = valid_o & (k_cnt > 0)
    feat = jnp.where(feat_valid[:, None], feat, 0.0)
    return feat, feat_valid


# ---------------------------------------------------------------------------
# public wrappers
# ---------------------------------------------------------------------------
def surface_iss_cells(xyz, valid, normal_radius, iss_radius, viewpoint=None,
                      gamma21: float = 0.975, gamma32: float = 0.975,
                      min_neighbors: int = 4, interpret=None,
                      exact: bool = False):
    """Surface pass + ISS keypoints over ONE shared grid (cell = max of the
    radii; each kernel masks its own radius).  Returns dict with normal,
    curv, density, eigvals, ok, kp, saliency."""
    interpret = _default_interpret(interpret)
    cell = float(np.maximum(np.asarray(normal_radius), np.asarray(iss_radius)))
    plan = plan_grid(xyz, jnp.zeros_like(xyz), valid, cell, exact=exact)
    if viewpoint is None:
        viewpoint = jnp.zeros((3,), jnp.float32)
    else:
        viewpoint = jnp.asarray(viewpoint, jnp.float32)
    nr = jnp.asarray(normal_radius, jnp.float32)
    ir = jnp.asarray(iss_radius, jnp.float32)
    return _surface_iss_impl(
        plan.state, nr * nr, ir * ir, jnp.float32(gamma21),
        jnp.float32(gamma32), viewpoint, plan.C, plan.CC, plan.R_pad,
        interpret, True, True, min_neighbors,
    )


def surface_cells(xyz, valid, radius, viewpoint=None, interpret=None,
                  exact: bool = False):
    """Self-join surface pass: (normal oriented to viewpoint, curvature,
    k=2-smoothed density, eigvals ascending [N,3], ok)."""
    interpret = _default_interpret(interpret)
    plan = plan_grid(xyz, jnp.zeros_like(xyz), valid, float(np.asarray(radius)),
                     exact=exact)
    if viewpoint is None:
        viewpoint = jnp.zeros((3,), jnp.float32)
    else:
        viewpoint = jnp.asarray(viewpoint, jnp.float32)
    r = jnp.asarray(radius, jnp.float32)
    out = _surface_iss_impl(
        plan.state, r * r, r * r, jnp.float32(0.975), jnp.float32(0.975),
        viewpoint, plan.C, plan.CC, plan.R_pad, interpret, True, False, 4,
    )
    return out["normal"], out["curv"], out["density"], out["eigvals"], out["ok"]


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
    interpret = _default_interpret(interpret)
    plan = plan_grid(xyz, jnp.zeros_like(xyz), valid,
                     float(np.asarray(iss_radius)), exact=exact)
    r = jnp.asarray(iss_radius, jnp.float32)
    out = _surface_iss_impl(
        plan.state, r * r, r * r, jnp.float32(gamma21), jnp.float32(gamma32),
        jnp.zeros((3,), jnp.float32), plan.C, plan.CC, plan.R_pad, interpret,
        False, True, min_neighbors,
    )
    return out["kp"], out["saliency"]


def fpfh_cells(xyz, normal, valid, radius, interpret=None,
               exact: bool = False):
    """Self-join FPFH: (feat f32[N,33], feat_valid bool[N])."""
    interpret = _default_interpret(interpret)
    plan = plan_grid(xyz, normal, valid, float(np.asarray(radius)), exact=exact)
    r = jnp.asarray(radius, jnp.float32)
    return _fpfh_impl(plan.state, r * r, plan.C, plan.CC, plan.R_pad, interpret)
