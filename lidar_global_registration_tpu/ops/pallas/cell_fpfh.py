"""Fused cell-list FPFH: Pallas TPU kernels over contiguous cell runs.

Replaces the XLA FPFH pipeline (grid scatter build -> 27-cell row gathers
-> top-k sort -> SPFH gathers -> [M,K,33] combine gather) for the self-join
case (keypoints == surface: the flagship / keypoint=any path) with two
cell-pair kernels:

  prep (plain JAX):  sort points by a collision-free 30-bit lexicographic
      cell key (one multi-operand sort, NO scatter); per occupied cell,
      binary-search the run starts/rows of its 27 neighbor cells.
  kernel A (SPFH):   one grid step per occupied cell; DMAs the 27 neighbor
      runs ([C,8] packed coords+normals+id+valid) into VMEM with dynamic
      SUBLANE offsets (pl.ds on the point axis -- the supported axis; lane
      offsets would hit Mosaic's 128-multiple rule), computes Darboux pair
      features for all (candidate, query) pairs, and accumulates the 3x11
      histogram with masked reductions.  No top-k anywhere: every in-radius
      neighbor contributes (closer to PCL's uncapped radiusSearch than the
      XLA path's K-cap).
  kernel B (FPFH):   1/d^2-weighted SPFH combination as 27 small MXU
      matmuls (W^T [C,C] @ SPFH [C,33]) per cell + per-block
      renormalization to 100.

Reference semantics: pcl::FPFHEstimationOMP via estimateFeatures<FPFH>
(include/common.h:322-332); histogram and weighting follow ops/fpfh.py.

Memory traffic per cell: 27 runs x 4KB (A) + 27 x 21KB (B) -- two orders
of magnitude below the XLA path's materialized candidate matrices and the
[M,K,33] combine gather.
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
_BIG_KEY = np.int32(1 << 30)
TAB_LANES = 128  # per-cell run table row: starts @0:27, lens @32:59, rows @64:91


def _lex_keys(xyz, valid, origin, inv_cell):
    cs = []
    for d in range(3):
        c = jnp.floor((xyz[:, d] - origin[d]) * inv_cell)
        cs.append(jnp.clip(c, 0, _COORD_CLIP).astype(jnp.int32))
    key = (cs[0] << 20) | (cs[1] << 10) | cs[2]
    return jnp.where(valid, key, _BIG_KEY), cs


def prep_cell_runs(xyz, normal, valid, cell_size, C: int, R_pad: int | None = None):
    """Sort points by cell key and compute per-cell neighbor run tables.

    Returns (packed f32[N+C, 128], order i32[N], rank i32[N], pos i32[N],
    vs bool[N], tab i32[R, TAB_LANES], n_rows i32[]) with R = R_pad
    (default N).  tab row r holds 27 (start, len, nbr_row) triples — the
    sorted offset, run length, and row id of each neighbor cell (len 0 for
    missing neighbors).  The kernels DMA ONE tab row per grid step into
    SMEM scratch, so SMEM residency is O(1) in R (scalar-prefetching the
    whole table capped scaling at ~9k cells: 1MB SMEM).  Restricting the
    tables to R_pad rows keeps the searchsorted fan-out at R_pad*27 instead
    of N*27 (element-gather bound, measured 0.5s at 64k otherwise)."""
    N = xyz.shape[0]
    if R_pad is None:
        R_pad = N
    cell_size = jnp.asarray(cell_size, jnp.float32)
    big = jnp.float32(3.0e37)
    masked = jnp.where(valid[:, None], xyz, big)
    origin = jnp.min(masked, axis=0)
    origin = jnp.where(jnp.isfinite(origin), origin, 0.0) - 0.5 * cell_size
    inv = 1.0 / jnp.maximum(cell_size, 1e-30)
    keys, _ = _lex_keys(xyz, valid, origin, inv)

    ks, xs, ys, zs, nxs, nys, nzs, order = jax.lax.sort(
        (keys, xyz[:, 0], xyz[:, 1], xyz[:, 2],
         normal[:, 0], normal[:, 1], normal[:, 2],
         jnp.arange(N, dtype=jnp.int32)),
        num_keys=1,
        is_stable=True,
    )
    vs = ks < _BIG_KEY  # sorted validity
    first = vs & jnp.concatenate([jnp.ones((1,), bool), ks[1:] != ks[:-1]])
    rank = jnp.cumsum(first.astype(jnp.int32)) - 1  # [N]
    n_rows = jnp.maximum(rank[-1] + 1, 0)

    idx = jnp.arange(N, dtype=jnp.int32)
    run_start_sorted = jax.lax.associative_scan(
        jnp.maximum, jnp.where(first, idx, -1)
    )
    pos = idx - run_start_sorted

    # per-row tables (first R_pad rows only): start/key of the r-th cell
    rank_for_search = jnp.where(vs, rank, jnp.int32(2**30))
    rows = jnp.arange(R_pad, dtype=jnp.int32)
    row_start = jnp.searchsorted(rank_for_search, rows, side="left").astype(jnp.int32)
    row_key = ks[jnp.minimum(row_start, N - 1)]
    row_key = jnp.where(rows < n_rows, row_key, _BIG_KEY)

    # 27 neighbor cell keys per row -> rows via binary search over row keys
    kx, ky, kz = row_key >> 20, (row_key >> 10) & 1023, row_key & 1023
    offs = jnp.asarray(
        [[i, j, k] for i in (-1, 0, 1) for j in (-1, 0, 1) for k in (-1, 0, 1)],
        jnp.int32,
    )
    nkx = kx[:, None] + offs[None, :, 0]
    nky = ky[:, None] + offs[None, :, 1]
    nkz = kz[:, None] + offs[None, :, 2]
    in_box = (
        (nkx >= 0) & (nkx <= _COORD_CLIP)
        & (nky >= 0) & (nky <= _COORD_CLIP)
        & (nkz >= 0) & (nkz <= _COORD_CLIP)
    )
    nkey = (nkx << 20) | (nky << 10) | nkz  # [R_pad,27]
    nrow = jnp.searchsorted(row_key, nkey.reshape(-1), side="left")
    nrow = jnp.minimum(nrow, R_pad - 1).astype(jnp.int32).reshape(R_pad, 27)
    found = (row_key[nrow] == nkey) & in_box & (rows[:, None] < n_rows)
    n_valid = jnp.sum(vs.astype(jnp.int32))
    row_start = jnp.where(rows < n_rows, row_start, n_valid)
    # run length: occupied runs are consecutive in sorted order, so
    # row_end[r] == row_start[r+1] (last row ends at n_valid)
    row_end = jnp.concatenate([row_start[1:], n_valid[None]])
    row_len = row_end - row_start
    nb_start = jnp.where(found, row_start[nrow], n_valid)  # PAD tail
    nb_len = jnp.where(found, row_len[nrow], 0)
    # (start, len, nbr_row) triples, one row per cell, DMA'd per grid step:
    # lanes 0:27 = starts, 32:59 = lengths, 64:91 = neighbor row ids
    tab = jnp.zeros((R_pad, TAB_LANES), jnp.int32)
    tab = tab.at[:, 0:27].set(nb_start)
    tab = tab.at[:, 32:59].set(nb_len)
    tab = tab.at[:, 64:91].set(nrow)

    vflag = vs.astype(jnp.float32)
    packed = jnp.stack(
        [xs, ys, zs, nxs, nys, nzs, order.astype(jnp.float32), vflag], axis=1
    )
    packed = jnp.where(vs[:, None], packed, jnp.float32(PAD))
    # widen to 128 lanes: Mosaic DMA slices must cover full 128-lane tiles
    packed = jnp.concatenate(
        [packed, jnp.full((N, 120), jnp.float32(PAD))], axis=1
    )
    packed = jnp.concatenate(
        [packed, jnp.full((C, 128), jnp.float32(PAD))], axis=0
    )  # tail pad so pl.ds(start, C) never overruns
    return packed, order, rank, pos, vs, tab, n_rows


def _atan2_poly(y, x):
    """Polynomial atan2 (Mosaic has no atan2 lowering).

    Abramowitz-Stegun 4.4.49 minimax polynomial on [0,1] with quadrant
    reduction; ~1e-5 rad absolute error -- far below the 2*pi/11 bin width
    the result is quantized to."""
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


def _query_lanes(cand_own, eye):
    """[C, 8] query block (sublanes) -> [8, C] lane-major via one MXU op."""
    return jax.lax.dot_general(
        cand_own, eye, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _pair_feature_bins(qx, qy, qz, qnx, qny, qnz, cand, r2):
    """Darboux features + bins for one (neighbor-cell, query-cell) pair.

    q*: [1, C] lane vectors; cand: [C, 8] candidates on sublanes.
    Returns (b1, b2, b3 i32[C,C], ok bool[C,C]) with candidates on axis 0.
    Matches ops/fpfh.pair_features_soa (the acos comparison reduces to a
    |cos| comparison since acos is monotone decreasing)."""
    cx, cy, cz = cand[:, 0:1], cand[:, 1:2], cand[:, 2:3]
    cnx, cny, cnz = cand[:, 3:4], cand[:, 4:5], cand[:, 5:6]
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


def _spfh_kernel(r2_ref, tab_ref, packed_ref, out_ref, cand, acc, tabs, sems, tsem):
    r = pl.program_id(0)
    C = cand.shape[1]
    n_rows = r2_ref[1].astype(jnp.int32)

    @pl.when(r >= n_rows)
    def _zero():
        out_ref[...] = jnp.zeros(out_ref.shape, jnp.float32)

    @pl.when(r < n_rows)
    def _():
        tcopy = pltpu.make_async_copy(tab_ref.at[pl.ds(r, 1)], tabs, tsem)
        tcopy.start()
        tcopy.wait()

        def start(c, _):
            pltpu.make_async_copy(
                packed_ref.at[pl.ds(tabs[0, c], C), :],
                cand.at[c],
                sems.at[c],
            ).start()
            return 0

        jax.lax.fori_loop(0, 27, start, 0)

        def wait(c, _):
            pltpu.make_async_copy(
                packed_ref.at[pl.ds(tabs[0, c], C), :],
                cand.at[c],
                sems.at[c],
            ).wait()
            return 0

        jax.lax.fori_loop(0, 27, wait, 0)

        eye = jnp.eye(C, dtype=jnp.float32)
        qrow = _query_lanes(cand[13], eye)  # [8, C]
        qx, qy, qz = qrow[0:1, :], qrow[1:2, :], qrow[2:3, :]
        qnx, qny, qnz = qrow[3:4, :], qrow[4:5, :], qrow[5:6, :]
        qvalid = qrow[7:8, :] > 0.5
        r2 = r2_ref[0]
        jq = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)

        acc[...] = jnp.zeros_like(acc)

        def body(c, _):
            cc = cand[c]
            nlen = jnp.minimum(tabs[0, 32 + c], C)
            b1, b2, b3, ok = _pair_feature_bins(qx, qy, qz, qnx, qny, qnz, cc, r2)
            ok = ok & (jq < nlen) & (cc[:, 7:8] > 0.5) & qvalid
            okf = ok.astype(jnp.float32)
            acc[DIM : DIM + 1, :] += jnp.sum(okf, axis=0, keepdims=True)
            for which, b in enumerate((b1, b2, b3)):
                for k in range(NR_BINS):
                    acc[which * NR_BINS + k : which * NR_BINS + k + 1, :] += jnp.sum(
                        jnp.where(b == k, okf, 0.0), axis=0, keepdims=True
                    )
            return 0

        jax.lax.fori_loop(0, 27, body, 0)
        cnt = acc[DIM : DIM + 1, :]
        incr = jnp.where(cnt > 0, 100.0 / jnp.maximum(cnt, 1.0), 0.0)
        out_ref[0, :, :] = acc[0:DIM, :] * incr


def _fpfh_kernel(
    r2_ref, tab_ref, packed_ref, spfh_ref, out_ref,
    cand, spfh_c, wsum, tabs, sems, sems2, tsem,
):
    r = pl.program_id(0)
    C = cand.shape[1]
    n_rows = r2_ref[1].astype(jnp.int32)

    @pl.when(r >= n_rows)
    def _zero():
        out_ref[...] = jnp.zeros(out_ref.shape, jnp.float32)

    @pl.when(r < n_rows)
    def _():
        tcopy = pltpu.make_async_copy(tab_ref.at[pl.ds(r, 1)], tabs, tsem)
        tcopy.start()
        tcopy.wait()

        def start(c, _):
            pltpu.make_async_copy(
                packed_ref.at[pl.ds(tabs[0, c], C), :], cand.at[c], sems.at[c]
            ).start()
            pltpu.make_async_copy(
                spfh_ref.at[pl.ds(tabs[0, 64 + c], 1)],
                spfh_c.at[pl.ds(c, 1)],
                sems2.at[c],
            ).start()
            return 0

        jax.lax.fori_loop(0, 27, start, 0)

        def wait(c, _):
            pltpu.make_async_copy(
                packed_ref.at[pl.ds(tabs[0, c], C), :], cand.at[c], sems.at[c]
            ).wait()
            pltpu.make_async_copy(
                spfh_ref.at[pl.ds(tabs[0, 64 + c], 1)],
                spfh_c.at[pl.ds(c, 1)],
                sems2.at[c],
            ).wait()
            return 0

        jax.lax.fori_loop(0, 27, wait, 0)

        eye = jnp.eye(C, dtype=jnp.float32)
        qrow = _query_lanes(cand[13], eye)
        qx, qy, qz = qrow[0:1, :], qrow[1:2, :], qrow[2:3, :]
        qvalid = qrow[7:8, :] > 0.5
        r2 = r2_ref[0]
        jq = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)

        wsum[...] = jnp.zeros_like(wsum)

        def body(c, _):
            cc = cand[c]
            cx, cy, cz = cc[:, 0:1], cc[:, 1:2], cc[:, 2:3]
            d2 = (cx - qx) ** 2 + (cy - qy) ** 2 + (cz - qz) ** 2
            nlen = jnp.minimum(tabs[0, 32 + c], C)
            ok = (
                (d2 > 0.0)
                & (d2 <= r2)
                & (jq < nlen)
                & (cc[:, 7:8] > 0.5)
                & qvalid
            )
            w = jnp.where(ok, 1.0 / jnp.maximum(d2, 1e-30), 0.0)  # [Ccand, Cq]
            wsum[DIM : DIM + 1, :] += jnp.sum(ok.astype(jnp.float32), axis=0, keepdims=True)
            # [33, Cq] += SPFH_c [33, Ccand] @ W [Ccand, Cq]
            wsum[0:DIM, :] += jax.lax.dot_general(
                spfh_c[c],
                w,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return 0

        jax.lax.fori_loop(0, 27, body, 0)
        kcnt = wsum[DIM : DIM + 1, :]  # [1, Cq]
        mean = wsum[0:DIM, :] / jnp.maximum(kcnt, 1.0)
        feat = spfh_c[13] + mean  # [33, Cq]
        blocks = []
        for blk in range(3):
            f = feat[blk * NR_BINS : (blk + 1) * NR_BINS, :]
            s = jnp.sum(f, axis=0, keepdims=True)
            blocks.append(jnp.where(s > 0, 100.0 * f / jnp.maximum(s, 1e-30), f))
        out_ref[0, :, :] = jnp.concatenate(blocks + [kcnt], axis=0)  # [34, Cq]


def _round_up(n, m):
    return ((n + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("C", "R_pad", "interpret"))
def _fpfh_cells_impl(xyz, normal, valid, radius, C, R_pad, interpret):
    N = xyz.shape[0]
    (packed, order, rank, pos, vs, tab, n_rows) = prep_cell_runs(
        xyz, normal, valid, radius, C, R_pad
    )
    n_rows_c = jnp.minimum(n_rows, R_pad)
    meta = jnp.stack([radius * radius, n_rows_c.astype(jnp.float32)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(R_pad,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, DIM, C), lambda r, *_: (r, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((27, C, 128), jnp.float32),
            pltpu.VMEM((DIM + 1, C), jnp.float32),
            pltpu.SMEM((1, TAB_LANES), jnp.int32),
            pltpu.SemaphoreType.DMA((27,)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    spfh = pl.pallas_call(
        _spfh_kernel,
        out_shape=jax.ShapeDtypeStruct((R_pad, DIM, C), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(meta, tab, packed)

    grid_spec2 = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(R_pad,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, DIM + 1, C), lambda r, *_: (r, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((27, C, 128), jnp.float32),
            pltpu.VMEM((27, DIM, C), jnp.float32),
            pltpu.VMEM((DIM + 1, C), jnp.float32),
            pltpu.SMEM((1, TAB_LANES), jnp.int32),
            pltpu.SemaphoreType.DMA((27,)),
            pltpu.SemaphoreType.DMA((27,)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        _fpfh_kernel,
        out_shape=jax.ShapeDtypeStruct((R_pad, DIM + 1, C), jnp.float32),
        grid_spec=grid_spec2,
        interpret=interpret,
    )(meta, tab, packed, spfh)

    # map cell-slot results back to original point order:
    # sorted point i lives at (rank[i], pos[i]); undo the sort by argsort
    flat = jnp.swapaxes(out, 1, 2).reshape(R_pad * C, DIM + 1)
    slot = jnp.clip(rank, 0, R_pad - 1) * C + jnp.minimum(pos, C - 1)
    kept = vs & (rank >= 0) & (rank < R_pad) & (pos < C)
    feats_sorted = jnp.where(kept[:, None], flat[slot], 0.0)
    inv = jnp.argsort(order)
    feats = feats_sorted[inv]
    feat = feats[:, :DIM]
    k_cnt = feats[:, DIM]
    feat_valid = valid & (k_cnt > 0)
    feat = jnp.where(feat_valid[:, None], feat, 0.0)
    return feat, feat_valid


@jax.jit
def _count_rows(xyz, valid, cell_size):
    big = jnp.float32(3.0e37)
    masked = jnp.where(valid[:, None], xyz, big)
    origin = jnp.min(masked, axis=0)
    origin = jnp.where(jnp.isfinite(origin), origin, 0.0) - 0.5 * cell_size
    inv = 1.0 / jnp.maximum(cell_size, 1e-30)
    keys, _ = _lex_keys(xyz, valid, origin, inv)
    ks = jnp.sort(keys)
    vs = ks < _BIG_KEY
    first = vs & jnp.concatenate([jnp.ones((1,), bool), ks[1:] != ks[:-1]])
    return jnp.sum(first.astype(jnp.int32))


def fpfh_cells(xyz, normal, valid, radius, C: int = 128, interpret: bool | None = None):
    """Self-join FPFH via the fused cell kernels.

    xyz/normal f32[N,3], valid bool[N] -> (feat f32[N,33], feat_valid[N]).
    Host-pulls the occupied-cell count to size a static grid (bucketed to a
    multiple of 512 to bound recompiles) -- use from host-orchestrated
    (staged / pipeline) paths only, not inside an enclosing jit."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    radius = jnp.asarray(radius, jnp.float32)
    n_rows = int(np.asarray(_count_rows(xyz, valid, radius)))
    R_pad = max(512, _round_up(n_rows, 512))
    R_pad = min(R_pad, xyz.shape[0] + 1)
    return _fpfh_cells_impl(xyz, normal, valid, radius, C, R_pad, interpret)
