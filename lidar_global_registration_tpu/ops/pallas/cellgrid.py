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
G_CELLS = 8  # cells per grid step (tab rows per auto-pipelined SMEM block)

# packed lane assignments
CH_ORDER = 6
CH_ID = 6  # point id (sorted `order`) lane — biased-bitcast f32 (see
# _encode_id_f32): exact and order-preserving for ANY realistic N (the
# old order.astype(f32) encoding was exact only below 2^24 = 16.7M
# points/side, 1.6x the 10M bench size)
CH_VALID = 7
CH_EXTRA = 8  # first pass-writable lane (ISS count / SPFH block start)
CH_SAL = 9
CH_OK = 10


ID_BIAS = 0x0C000000  # bit-space offset for the f32 id encoding


def _encode_id_f32(ids_i32):
    """Monotone f32 encoding of nonnegative int32 point ids.

    bitcast(id + ID_BIAS): every encoded value is a positive NORMAL f32
    (exponent >= 0x18 — TPU denormal flush can never zero it), the IEEE
    ordering of positive floats equals the integer ordering of their bit
    patterns (min / compare / select preserve id order), identity-matmul
    transposes are value-exact, and every id below 2^30 stays under the
    BIG sentinel.  Replaces the order.astype(f32) lane, which was exact
    only below 2^24 ids.  The lane must only ever be moved/compared —
    arithmetic on it is meaningless."""
    return jax.lax.bitcast_convert_type(
        ids_i32.astype(jnp.int32) + jnp.int32(ID_BIAS), jnp.float32
    )


def _decode_id_f32(f):
    return jax.lax.bitcast_convert_type(f, jnp.int32) - jnp.int32(ID_BIAS)


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


# stats vector layout (host parses by these offsets)
_ST_NROWS = 0
_ST_NVALID = 1
_ST_MAXOCC = 2
_ST_COLMAX = 3
_ST_BITS = 4
_ST_COLQ50 = 5
_ST_OVER = 6  # len(C_BUCKETS) entries: points with in-cell pos >= bucket
_ST_BLOCKS = _ST_OVER + len(C_BUCKETS)  # len(C_BUCKETS): total query blocks
_ST_M = _ST_BLOCKS + len(C_BUCKETS)  # the chosen cell-growth factor
_ST_PACK = _ST_M + 1  # 1.0 iff the grid is thin-COLUMN (packed-row layout)
_ST_NSLABS = _ST_PACK + 1  # number of x-slabs (kx runs)
_ST_PBLOCKS = _ST_NSLABS + 1  # len(C_BUCKETS): packed-row block counts
_ST_LEN = _ST_PBLOCKS + len(C_BUCKETS)


def _run_fill_fwd(flag, val, fill):
    """out[i] = val[j] for the LATEST j <= i with flag[j], else fill.

    Semantically the pair-carry associative max-scan, but built from the
    cummax primitive + ONE gather: jax.lax.associative_scan's recursive
    slice/concat tree makes XLA compile time blow up superlinearly in N
    (measured: 56 s per scan at N=1M on CPU, the dominant share of the
    20-minute-per-program TPU compiles at 4M), while cummax lowers to a
    single reduce-window op and compiles in seconds at any N."""
    idx = jnp.arange(flag.shape[0], dtype=jnp.int32)
    f = jax.lax.cummax(jnp.where(flag, idx, -1), axis=0)
    return jnp.where(f >= 0, val[jnp.maximum(f, 0)], fill)


def _thin_fraction(ks, bz):
    """Fraction of valid points within 4 z-cells of their xy-column's
    first occupied z-cell, from keys sorted ascending.

    This is the packed-row eligibility test: a packed block's candidate
    spans cover the FULL z range of each (kx, ky) column, so the waste
    vs the true 3-cell z stencil is bounded by how far points sit above
    their column base.  Per-column depth, not global z bits, is what
    matters: a 10M-point terrain scan at ISS radius has ~100 global
    z-cells yet per-column depth 1-2 — exactly the sparse fine grid
    that needs packing most."""
    vs = ks < _BIG_KEY
    n_valid = jnp.maximum(jnp.sum(vs.astype(jnp.int32)), 1)
    kxy = ks >> bz
    kz = ks & ((1 << bz) - 1)
    idx = jnp.arange(ks.shape[0], dtype=jnp.int32)
    cfirst = vs & jnp.concatenate(
        [jnp.ones((1,), bool), kxy[1:] != kxy[:-1]]
    )

    kz0 = _run_fill_fwd(cfirst, kz, 0)  # z of the latest column start
    thin_pt = vs & (kz - kz0 <= 3)
    return jnp.sum(thin_pt.astype(jnp.float32)) / n_valid.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("auto_m",))
def _sort_stats(xyz, normal, valid, cell, m, auto_m: bool = False):
    """THE grid sort (stable (key, id) sort + one row gather) + exact
    occupancy statistics.

    m is a traced cell-growth factor: the grid cell is m*cell but ids are
    the fine ids integer-divided by m (same origin), and the SORT is by the
    coarse key, so every downstream consumer (stats, column table, kernels)
    sees the identical partition.  With auto_m the factor itself is chosen
    ON DEVICE from the sampled median fine-cell occupancy (the former
    _light_stats program + host pull, folded in here so planning a grid
    costs ONE host sync, not two).  Returns (state tuple kept on device,
    stats f32[_ST_LEN] pulled once by the host):

      stats = [n_rows, n_valid, max occupancy, max column (z-union)
               occupancy, total key bits,
               per C bucket: #points with in-cell position >= bucket
               (queries that would lose their slot),
               sampled median column occupancy,
               per C bucket: overflow point count and total query blocks,
               the cell-growth factor m]."""
    origin, inv, bits = _grid_frame(xyz, valid, cell)
    fkeys, _, clips = _lex_keys(xyz, valid, origin, inv, bits)
    if auto_m:
        # m-choice on device: 1-operand fine-key sort, sampled median
        # occupancy, 2.5D growth model (occupancy ~ m^2 for surface scans)
        fs = jnp.sort(fkeys)
        Nf = fs.shape[0]
        fvs = fs < _BIG_KEY
        fn_valid = jnp.sum(fvs.astype(jnp.int32))
        fidx = jnp.arange(Nf, dtype=jnp.int32)
        ffirst = fvs & jnp.concatenate([jnp.ones((1,), bool), fs[1:] != fs[:-1]])
        frs = jax.lax.cummax(jnp.where(ffirst, fidx, -1), axis=0)
        flast = fvs & jnp.concatenate([fs[1:] != fs[:-1], jnp.ones((1,), bool)])
        fre = jax.lax.cummin(
            jnp.where(flast, fidx, jnp.int32(2**30)), axis=0, reverse=True
        )
        focc = jnp.where(fvs, fre - frs + 1, 0)
        fsamp = (
            jnp.arange(_N_SAMPLE, dtype=jnp.int32) * jnp.maximum(fn_valid, 1)
        ) // _N_SAMPLE
        q50 = jnp.sort(focc[fsamp])[_N_SAMPLE // 2].astype(jnp.float32)
        m = jnp.clip(
            jnp.round(jnp.sqrt(OCC_TARGET / jnp.maximum(q50, 1.0))), 1, 4
        ).astype(jnp.int32)
        # thin-COLUMN grids use the packed-row layout instead of cell
        # growth: packing fills query blocks without inflating the stencil
        # volume, so the finest grid (m=1) wins
        m = jnp.where(_thin_fraction(fs, bits[2]) > 0.85, jnp.int32(1), m)
    else:
        m = jnp.asarray(m, jnp.int32)
    keys = jnp.where(fkeys < _BIG_KEY, _coarsen_key(fkeys, bits, m), _BIG_KEY)
    N = xyz.shape[0]
    # 2-operand sort + ONE [N, 8] row gather: the stable sort moves only
    # 8 B/point of payload instead of 32 B (measured on this hardware:
    # row gathers run near bandwidth, element gathers ~100x off — the
    # sorted channels come out of a single row-indexed gather)
    ks, order = jax.lax.sort(
        (keys, jnp.arange(N, dtype=jnp.int32)), num_keys=1, is_stable=True
    )
    chan = jnp.concatenate([xyz, normal], axis=1)[order]
    xs, ys, zs = chan[:, 0], chan[:, 1], chan[:, 2]
    nxs, nys, nzs = chan[:, 3], chan[:, 4], chan[:, 5]
    idx = jnp.arange(N, dtype=jnp.int32)
    vs = ks < _BIG_KEY
    n_valid = jnp.sum(vs.astype(jnp.int32))
    first = vs & jnp.concatenate([jnp.ones((1,), bool), ks[1:] != ks[:-1]])
    rank = jnp.cumsum(first.astype(jnp.int32)) - 1
    n_rows = jnp.maximum(rank[-1] + 1, 0)
    run_start = jax.lax.cummax(jnp.where(first, idx, -1), axis=0)
    pos = idx - run_start
    last = vs & jnp.concatenate([ks[1:] != ks[:-1], jnp.ones((1,), bool)])
    run_end = jax.lax.cummin(
        jnp.where(last, idx, jnp.int32(2**30)), axis=0, reverse=True
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
    # propagate val from flagged rows forward across each run: select-by-
    # latest-flagged-index (a bare max-scan would leak the global max
    # across runs since val is not monotone) — cummax + gather
    a_contrib = jnp.where((kz > 0) & (prev_k == ks - 1), prev_occ, 0)
    a_prop = _run_fill_fwd(first, a_contrib, 0)
    b_contrib = jnp.where((kz < clip_z) & (next_k == ks + 1), next_occ, 0)
    b_prop = _run_fill_fwd(last[::-1], b_contrib[::-1], 0)[::-1]
    colocc = jnp.where(vs, occ + a_prop + b_prop, 0)
    # gap-centered windows: a query in cell z references column (x', y')
    # whose z and z-1 may be empty while z-2/z+1 are not; the widest such
    # window is occ(r) + occ(next) when the next run is exactly 2 z-cells up
    gap = occ + jnp.where(last & (kz + 2 <= clip_z) & (next_k == ks + 2), next_occ, 0)
    colmax = jnp.maximum(jnp.max(colocc), jnp.max(jnp.where(vs, gap, 0)))
    samp = (jnp.arange(_N_SAMPLE, dtype=jnp.int32) * jnp.maximum(n_valid, 1)) // _N_SAMPLE
    colq50 = jnp.sort(colocc[samp])[_N_SAMPLE // 2]

    over_c = [jnp.sum((vs & (pos >= b)).astype(jnp.int32)) for b in C_BUCKETS]
    # total query blocks if cells split every `b` points: run-firsts plus
    # every in-cell position that is a positive multiple of b
    blocks_c = [
        n_rows + jnp.sum((vs & (pos > 0) & (pos % b == 0)).astype(jnp.int32))
        for b in C_BUCKETS
    ]
    # packed-row layout stats: blocks are b-point windows of each x-slab
    # (kx run) — slab-firsts plus every in-slab position multiple of b
    kxs = ks >> (by + bz)
    slab_first = vs & jnp.concatenate(
        [jnp.ones((1,), bool), kxs[1:] != kxs[:-1]]
    )
    slab_start = jax.lax.cummax(jnp.where(slab_first, idx, -1), axis=0)
    pos_slab = idx - slab_start
    n_slabs = jnp.sum(slab_first.astype(jnp.int32))
    pblocks_c = [
        n_slabs
        + jnp.sum((vs & (pos_slab > 0) & (pos_slab % b == 0)).astype(jnp.int32))
        for b in C_BUCKETS
    ]
    stats = jnp.stack(
        [
            n_rows.astype(jnp.float32),
            n_valid.astype(jnp.float32),
            maxocc.astype(jnp.float32),
            colmax.astype(jnp.float32),
            (bx + by + bz).astype(jnp.float32),
            colq50.astype(jnp.float32),
        ]
        + [d.astype(jnp.float32) for d in over_c]
        + [d.astype(jnp.float32) for d in blocks_c]
        + [m.astype(jnp.float32),
           (_thin_fraction(ks, bz) > 0.85).astype(jnp.float32),
           n_slabs.astype(jnp.float32)]
        + [d.astype(jnp.float32) for d in pblocks_c]
    )
    # rank is a build-time intermediate (n_rows only) — storing it in the
    # device-resident state would hold 4 B/point of dead HBM per plan
    state = (ks, xs, ys, zs, nxs, nys, nzs, order, vs, pos,
             jnp.stack([bx, by, bz]), jnp.asarray(m, jnp.int32))
    return state, stats


class GridPlan:
    """Host-side sizing decisions + device-resident sorted state.

    Nothing is ever capped or truncated: cells denser than C split into
    multiple query blocks, and candidate columns of any length stream
    through a fixed SEG-row window — C and SEG are pure performance knobs."""

    __slots__ = ("C", "SEG", "R_pad", "m", "n_rows", "n_valid",
                 "maxocc", "colmax", "state", "packed")

    def __init__(self, C, SEG, R_pad, m, n_rows, n_valid, maxocc, colmax,
                 state, packed=False):
        self.C, self.SEG, self.R_pad, self.m = C, SEG, R_pad, m
        self.n_rows, self.n_valid = n_rows, n_valid
        self.maxocc, self.colmax = maxocc, colmax
        self.state = state
        self.packed = packed


OCC_TARGET = 96  # grow the cell until the median point's cell holds ~this
# (the query block is a full 128-lane tile; near-full median occupancy
# keeps the lanes busy without inflating the stencil volume too much)
SEG_BUCKETS = (128, 256, 512, 1024)


def _stats_device(xyz, normal, valid, cell, exact: bool = False,
                  m: int | None = None):
    """Launch the (sort + stats) program; NO host pull happens here."""
    if xyz.shape[0] >= (1 << 30):
        # the biased-bitcast id lane (_encode_id_f32) is exact to 2^30
        raise ValueError(
            f"N={xyz.shape[0]} exceeds the 2^30 id-lane encoding range"
        )
    if exact:
        m = 1
    return _sort_stats(
        xyz, normal, valid, jnp.asarray(cell, jnp.float32),
        jnp.int32(m if m is not None else 1), auto_m=m is None,
    )


def _plan_from_stats(state, st):
    """Host sizing decisions from a pulled stats vector (int64[_ST_LEN])."""
    n_rows, n_valid, maxocc, colmax, bits = st[0], st[1], st[2], st[3], st[4]
    colq50 = int(st[_ST_COLQ50])
    if bits > 30:
        raise ValueError(f"grid needs {bits} key bits (> 30); XLA fallback")
    N = state[0].shape[0]
    if N >= 1 << 30:
        # the biased-bitcast id lane (_encode_id_f32) is exact to 2^30
        raise ValueError(f"N={N} >= 2^30: id-lane encoding range; XLA fallback")
    over = st[_ST_OVER:_ST_OVER + len(C_BUCKETS)]
    blocks = st[_ST_BLOCKS:_ST_BLOCKS + len(C_BUCKETS)]
    packed = int(st[_ST_PACK]) > 0  # thin-column (2.5D scan) grids pack rows
    if not packed:
        # unpacked C bucket: smallest whose over-C spill stays under 10%
        ci = next(
            (i for i, b in enumerate(C_BUCKETS)
             if over[i] <= 0.1 * max(n_valid, 1)),
            len(C_BUCKETS) - 1,
        )
        # memory-pressure override: the unpacked layout sizes one block per
        # cell run, so sparse fine grids fragment into ~4x more slots than
        # points (measured at 10M: 42M slots -> the pass buffers + tables
        # alone exceed a v5e's HBM).  The packed layout is a pure
        # scheduling choice (identical values, tests/test_cell_packed.py);
        # its z-span waste is a time cost, OOM is not.
        slots_u = int(blocks[ci]) * C_BUCKETS[ci]
        if slots_u * 512 > _FAST_PASS_GIB * 2**30:
            packed = True
    if packed:
        # blocks are C-point windows of each x-slab: slots are ~always
        # full, so C maximizes queries amortizing each block's candidate
        # spans — capped so short slabs don't strand most of a block
        n_slabs = max(int(st[_ST_NSLABS]), 1)
        per_slab = max(n_valid, 1) // n_slabs
        ci = len(C_BUCKETS) - 1
        while ci > 0 and C_BUCKETS[ci] > 2 * per_slab:
            ci -= 1
        # the pair product per query scales with the block's candidate span
        # (~C + 2*occ rows), while DMA per query is ~C-independent, so on
        # compute-bound passes a SMALLER C is strictly less wasted work;
        # LGR_PACKED_C overrides the DMA-amortizing default for measurement
        c_env = int(os.environ.get("LGR_PACKED_C", "0"))
        if c_env in C_BUCKETS:
            ci = C_BUCKETS.index(c_env)
        C = C_BUCKETS[ci]
        n_blocks = int(st[_ST_PBLOCKS + ci])
    else:
        C = C_BUCKETS[ci]
        n_blocks = int(blocks[ci])
    SEG = next((s for s in SEG_BUCKETS if s >= colq50), SEG_BUCKETS[-1])
    if packed:
        # packed candidate spans run ~C + 2 y-columns long; stream them
        # through the big window
        SEG = SEG_BUCKETS[-1] if C >= 256 else max(SEG, 256)
    # Mosaic allocates the kernel body's [SEG, C] dataflow on the VMEM
    # stack (~15 live f32 intermediates in the pair-feature chunk, ~55 B
    # per element measured); SEG*C = 512k blew the 16 MiB scoped-vmem
    # limit at 1M points (28.9 MiB) — the pass limit is 100 MiB now, so
    # the product cap is tunable (LGR_SEG_CAP).  SEG is a pure
    # streaming-window knob: shrinking it costs only DMA wait
    # granularity, never correctness or coverage.
    seg_cap = int(os.environ.get("LGR_SEG_CAP", "131072"))
    while SEG > SEG_BUCKETS[0] and SEG * C > seg_cap:
        SEG //= 2
    # geometric R_pad ladder: each distinct R_pad is a fresh XLA+Mosaic
    # compile (~minutes over the remote-compile tunnel), so quantize the
    # grid length instead of rounding to the next multiple of G
    nsteps = 1
    while nsteps * G_CELLS < max(n_blocks, 1):
        nsteps = nsteps + max(nsteps // 2, 1)  # 1.5x ladder
    R_pad = nsteps * G_CELLS
    return GridPlan(int(C), int(SEG), int(R_pad), int(st[_ST_M]), int(n_rows),
                    int(n_valid), int(maxocc), int(colmax), state,
                    packed=packed)


def plan_grid(xyz, normal, valid, cell, exact: bool = False,
              m: int | None = None):
    """Sort + size one grid in ONE host sync.  Raises ValueError only when
    the cloud does not fit the kernel format (too many key bits / too many
    points for f32-exact ids) — callers fall back to the XLA path.

    C (query-block lanes) is the smallest bucket holding >= 90% of points
    in their cell's first block — denser cells just get more blocks; SEG
    (candidate stream window) tracks the median column occupancy so small
    columns do not pay a huge window's masked compute."""
    state, stats = _stats_device(xyz, normal, valid, cell, exact, m)
    return _plan_from_stats(state, np.asarray(stats).astype(np.int64))


def plan_grid_many(specs):
    """Plan several grids with ONE host sync total: specs is a list of
    (xyz, normal, valid, cell[, exact[, m]]) tuples; all stats vectors are
    stacked on device and pulled together.  On tunneled TPU runtimes every
    pull is a full round-trip, so the staged registration path plans both
    of a side's grids (normal/ISS + feature) through here."""
    launched = [_stats_device(*s) for s in specs]
    all_stats = np.asarray(jnp.stack([sv for _st, sv in launched])).astype(np.int64)
    return [
        _plan_from_stats(st, all_stats[i]) for i, (st, _sv) in enumerate(launched)
    ]


# ---------------------------------------------------------------------------
# table build (from the sorted state; no further sorts)
# ---------------------------------------------------------------------------
def _block_layout(state, C: int, R_pad: int, packed: bool = False):
    """Query-block layout shared by the span table and the need masks.

    packed=False: a block is (a <= C-point piece of) ONE cell.
    packed=True (thin-z grids): a block is a C-point window of one x-slab
    (kx run) — consecutive cells share a block until it fills, so sparse
    grids stop paying a mostly-empty 128-lane tile per cell.  Queries are
    independent, and the candidate spans below cover the block's whole
    [ky_lo, ky_hi] range, so packing never changes any query's value.

    Returns (prow, posb, n_blocks, row_start, row_len, row_key_lo,
    row_key_hi): block id / in-block lane per point, and per-table-row
    start offset, length and first/last cell key."""
    (ks, xs, ys, zs, nxs, nys, nzs, order, vs, pos, bits_arr, m) = state
    N = ks.shape[0]
    n_valid = jnp.sum(vs.astype(jnp.int32))
    idx = jnp.arange(N, dtype=jnp.int32)

    if packed:
        by, bz = bits_arr[1], bits_arr[2]
        kxs = ks >> (by + bz)
        slab_first = vs & jnp.concatenate(
            [jnp.ones((1,), bool), kxs[1:] != kxs[:-1]]
        )
        slab_start = jax.lax.cummax(jnp.where(slab_first, idx, -1), axis=0)
        pos_slab = idx - slab_start
        bfirst = vs & (slab_first | (pos_slab % C == 0))
        posb = pos_slab % C
    else:
        # a new block starts at every run first AND every in-cell position
        # that is a multiple of C
        first = vs & jnp.concatenate([jnp.ones((1,), bool), ks[1:] != ks[:-1]])
        bfirst = vs & (first | (pos % C == 0))
        posb = pos % C
    prow = jnp.cumsum(bfirst.astype(jnp.int32)) - 1
    n_blocks = jnp.maximum(prow[-1] + 1, 0)

    prow_search = jnp.where(vs, prow, jnp.int32(2**30))
    rows = jnp.arange(R_pad, dtype=jnp.int32)
    row_start = jnp.searchsorted(prow_search, rows, side="left").astype(jnp.int32)
    row_key = ks[jnp.minimum(row_start, N - 1)]
    row_key = jnp.where(rows < n_blocks, row_key, _BIG_KEY)
    row_start = jnp.where(rows < n_blocks, row_start, n_valid)
    row_end = jnp.concatenate([row_start[1:], n_valid[None]])
    row_len = jnp.maximum(row_end - row_start, 0)
    if packed:
        row_key_hi = ks[jnp.clip(row_start + row_len - 1, 0, N - 1)]
        row_key_hi = jnp.where(rows < n_blocks, row_key_hi, _BIG_KEY)
    else:
        row_key_hi = row_key
    return prow, posb, n_blocks, row_start, row_len, row_key, row_key_hi


def _row_stencil_any(state, row_key, row_key_hi, flags_sorted, s: int,
                     packed: bool = False):
    """Per-table-row bool: does the (2s+1)^3 cell stencil around this row's
    cell (range, when packed) contain any flagged point?  flags_sorted is a
    bool[N] in sorted order; counts come from one prefix sum + 2 key
    searches per (dx, dy) (the z range is contiguous in key order).  Packed
    rows span [ky_lo, ky_hi] of one x-slab, so each dx needs ONE span over
    [ky_lo - s, ky_hi + s] x full z (conservative in z, which is <= 4 cells
    on packed grids)."""
    (ks, xs, ys, zs, nxs, nys, nzs, order, vs, pos, bits_arr, m) = state
    bx, by, bz = bits_arr[0], bits_arr[1], bits_arr[2]
    clip_cx = ((1 << bx) - 1) // m
    clip_cy = ((1 << by) - 1) // m
    clip_cz = ((1 << bz) - 1) // m
    cum = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum((flags_sorted & vs).astype(jnp.int32))]
    )
    kx = row_key >> (by + bz)
    ky = (row_key >> bz) & ((1 << by) - 1)
    valid_row = row_key < _BIG_KEY
    any_hit = jnp.zeros(row_key.shape, bool)
    if packed:
        ky_lo = jnp.maximum(ky - s, 0)
        ky_hi = jnp.minimum(
            ((row_key_hi >> bz) & ((1 << by) - 1)) + s, clip_cy
        )
        for di in range(-s, s + 1):
            nkx = kx + di
            x_ok = (nkx >= 0) & (nkx <= clip_cx)
            key_lo = (nkx << (by + bz)) | (ky_lo << bz)
            key_hi = (nkx << (by + bz)) | (ky_hi << bz) | clip_cz
            lo = jnp.searchsorted(ks, key_lo, side="left").astype(jnp.int32)
            hi = jnp.searchsorted(ks, key_hi, side="right").astype(jnp.int32)
            any_hit = any_hit | (valid_row & x_ok & (cum[hi] > cum[lo]))
        return any_hit
    kz = row_key & ((1 << bz) - 1)
    zlo = jnp.maximum(kz - s, 0)
    zhi = jnp.minimum(kz + s, clip_cz)
    for di in range(-s, s + 1):
        for dj in range(-s, s + 1):
            nkx = kx + di
            nky = ky + dj
            xy_ok = (nkx >= 0) & (nkx <= clip_cx) & (nky >= 0) & (nky <= clip_cy)
            key_lo = (nkx << (by + bz)) | (nky << bz) | zlo
            key_hi = (nkx << (by + bz)) | (nky << bz) | zhi
            lo = jnp.searchsorted(ks, key_lo, side="left").astype(jnp.int32)
            hi = jnp.searchsorted(ks, key_hi, side="right").astype(jnp.int32)
            any_hit = any_hit | (valid_row & xy_ok & (cum[hi] > cum[lo]))
    return any_hit


def _build_tab(state, C: int, SEG: int, R_pad: int, need_sorted=None,
               flag_stencil=None, packed: bool = False, layout=None):
    """Per-QUERY-BLOCK 9-column span table + packed [N + 2*SEG, 128] lanes.

    A cell with more than C points occupies ceil(occ/C) consecutive table
    rows (query blocks) sharing the same stencil columns — NO query is ever
    dropped.  tab row r: for each of the 9 (dx, dy) stencil columns, the
    sorted-point offset and TRUE length of the contiguous (z-1, z, z+1)
    cell-run union (streamed in SEG-row windows by the kernels — no
    truncation), plus the block's own run (start, len <= C).

    Masked queries (the keypoint-regime fast path): tab lane 34 is a
    per-row compute flag.  `need_sorted` (bool[N], sorted order) keeps a
    row iff any of its points is needed; `flag_stencil=(flags_sorted, s)`
    keeps a row iff the (2s+1)^3 cell stencil around it contains a flagged
    point.  Skipped rows cost one grid iteration and an output zero-fill —
    no DMA, no candidate streaming — and their points read back as invalid,
    so masking never changes the values of kept queries (parity test:
    tests/test_cell_masked.py)."""
    (ks, xs, ys, zs, nxs, nys, nzs, order, vs, pos, bits_arr, m) = state
    N = ks.shape[0]
    bx, by, bz = bits_arr[0], bits_arr[1], bits_arr[2]
    n_valid = jnp.sum(vs.astype(jnp.int32))
    if layout is None:
        layout = _block_layout(state, C, R_pad, packed)
    prow, posb, n_blocks, row_start, row_len, row_key, row_key_hi = layout
    rows = jnp.arange(R_pad, dtype=jnp.int32)

    run = rows < n_blocks
    if need_sorted is not None:
        cumn = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.cumsum((need_sorted & vs).astype(jnp.int32))]
        )
        row_end_n = row_start + row_len
        run = run & (cumn[row_end_n] > cumn[row_start])
    if flag_stencil is not None:
        flags_sorted, s = flag_stencil
        run = run & _row_stencil_any(state, row_key, row_key_hi, flags_sorted,
                                     int(s), packed)

    if packed:
        # packed rows: 3 candidate spans (dx = -1, 0, +1), each the
        # contiguous key range [(kx+dx, ky_lo-1, 0) .. (kx+dx, ky_hi+1,
        # zmax)] — a superset of every constituent cell's 3x3x3 stencil
        # (thin z: the whole z extent is <= 4 cells).  2 searches per span.
        clip_cy_p = ((1 << by) - 1) // m
        clip_cz_p = ((1 << bz) - 1) // m
        clip_cx_p = ((1 << bx) - 1) // m
        kx_p = row_key >> (by + bz)
        ky_lo = jnp.maximum(((row_key >> bz) & ((1 << by) - 1)) - 1, 0)
        ky_hi = jnp.minimum(
            ((row_key_hi >> bz) & ((1 << by) - 1)) + 1, clip_cy_p
        )
        col_start = jnp.full((R_pad, 9), n_valid, jnp.int32)
        col_len = jnp.zeros((R_pad, 9), jnp.int32)
        for ci, di in enumerate((-1, 0, 1)):
            nkx = kx_p + di
            xy_ok = (nkx >= 0) & (nkx <= clip_cx_p) & (rows < n_blocks)
            key_lo = (nkx << (by + bz)) | (ky_lo << bz)
            key_hi = (nkx << (by + bz)) | (ky_hi << bz) | clip_cz_p
            lo = jnp.searchsorted(ks, key_lo, side="left").astype(jnp.int32)
            hi = jnp.searchsorted(ks, key_hi, side="right").astype(jnp.int32)
            good = xy_ok & (hi > lo)
            col_start = col_start.at[:, ci].set(jnp.where(good, lo, n_valid))
            col_len = col_len.at[:, ci].set(jnp.where(good, hi - lo, 0))
        tab = jnp.zeros((R_pad, TAB_LANES), jnp.int32)
        tab = tab.at[:, 0:9].set(col_start)
        tab = tab.at[:, 16:25].set(col_len)
        tab = tab.at[:, 32].set(row_start)
        tab = tab.at[:, 33].set(row_len)
        tab = tab.at[:, 34].set(run.astype(jnp.int32))
        return tab, n_blocks, prow, posb

    # point offsets of cell boundaries, for the column spans: cells may span
    # several blocks, so column ends come from key searches over the points
    # (2 searches per column: first point of the z-1 cell, one past the last
    # point of the z+1 cell — the three z cells are adjacent in key order)
    clip_cx = ((1 << bx) - 1) // m
    clip_cy = ((1 << by) - 1) // m
    clip_cz = ((1 << bz) - 1) // m
    kx = row_key >> (by + bz)
    ky = (row_key >> bz) & ((1 << by) - 1)
    kz = row_key & ((1 << bz) - 1)
    ks_search = ks  # invalid keys are _BIG_KEY and sort last
    col_offs = [(i, j) for i in (-1, 0, 1) for j in (-1, 0, 1)]
    col_start = jnp.zeros((R_pad, 9), jnp.int32)
    col_len = jnp.zeros((R_pad, 9), jnp.int32)
    lo_raw = [None] * 9
    hi_raw = [None] * 9
    ok_raw = [None] * 9
    for ci, (di, dj) in enumerate(col_offs):
        nkx = kx + di
        nky = ky + dj
        xy_ok = (nkx >= 0) & (nkx <= clip_cx) & (nky >= 0) & (nky <= clip_cy)
        zlo = jnp.maximum(kz - 1, 0)
        zhi = jnp.minimum(kz + 1, clip_cz)
        key_lo = (nkx << (by + bz)) | (nky << bz) | zlo
        key_hi = (nkx << (by + bz)) | (nky << bz) | zhi
        lo = jnp.searchsorted(ks_search, key_lo, side="left").astype(jnp.int32)
        hi = jnp.searchsorted(ks_search, key_hi, side="right").astype(jnp.int32)
        lo_raw[ci], hi_raw[ci], ok_raw[ci] = lo, hi, xy_ok
        good = xy_ok & (rows < n_blocks) & (hi > lo)
        col_start = col_start.at[:, ci].set(jnp.where(good, lo, n_valid))
        col_len = col_len.at[:, ci].set(jnp.where(good, hi - lo, 0))

    # merged spans: for each dx, the (y-1, y, y+1) columns are CONTIGUOUS
    # in key order, so they can stream as ONE span [lo(dx,y-1), hi(dx,y+1))
    # per block -- 3 DMA windows instead of 9 on thin (2.5D scan) grids.
    # The slack cells swept in between (middle column z outside [z-1,z+1])
    # are just extra candidates; every kernel distance-filters, so values
    # are unchanged.  Chosen PER ROW: merged iff it needs no more SEG
    # windows than the 9 exact columns (volumetric clouds with deep z
    # columns keep the exact layout).  The kernel is agnostic: it streams
    # whatever (start, len) pairs the table holds.
    m_start = jnp.zeros((R_pad, 9), jnp.int32)
    m_len = jnp.zeros((R_pad, 9), jnp.int32)
    for di_i, di in enumerate((-1, 0, 1)):
        cis = [di_i * 3 + dj_i for dj_i in range(3)]  # dj = -1, 0, +1
        lo3 = jnp.full(rows.shape, 0, jnp.int32)
        hi3 = jnp.full(rows.shape, 0, jnp.int32)
        any_ok = jnp.zeros(rows.shape, bool)
        for ci in cis:  # first valid dj gives the low bound
            take = ok_raw[ci] & ~any_ok
            lo3 = jnp.where(take, lo_raw[ci], lo3)
            any_ok = any_ok | ok_raw[ci]
        seen = jnp.zeros(rows.shape, bool)
        for ci in reversed(cis):  # last valid dj gives the high bound
            take = ok_raw[ci] & ~seen
            hi3 = jnp.where(take, hi_raw[ci], hi3)
            seen = seen | ok_raw[ci]
        good = any_ok & (rows < n_blocks) & (hi3 > lo3)
        m_start = m_start.at[:, di_i].set(jnp.where(good, lo3, n_valid))
        m_len = m_len.at[:, di_i].set(jnp.where(good, hi3 - lo3, 0))

    w9 = jnp.sum(-(-col_len // SEG), axis=1)
    w3 = jnp.sum(-(-m_len // SEG), axis=1)
    use3 = (w3 <= w9)[:, None]
    col_start = jnp.where(use3, m_start, col_start)
    col_len = jnp.where(use3, m_len, col_len)

    tab = jnp.zeros((R_pad, TAB_LANES), jnp.int32)
    tab = tab.at[:, 0:9].set(col_start)
    tab = tab.at[:, 16:25].set(col_len)
    tab = tab.at[:, 32].set(row_start)
    tab = tab.at[:, 33].set(row_len)
    tab = tab.at[:, 34].set(run.astype(jnp.int32))
    return tab, n_blocks, prow, posb


def _retab(tab, state, C: int, R_pad: int, need_sorted=None,
           flag_stencil=None, packed: bool = False, layout=None):
    """Re-derive ONLY the lane-34 compute flags of an existing span table
    for a different query mask (the spans themselves are mask-invariant).
    Saves rebuilding the searchsorted column spans between the SPFH and
    combine passes.  Pass `layout` (the _block_layout tuple the caller
    already has) to skip recomputing its full-length scans/searches —
    several whole-N device passes each at 10M points."""
    if layout is None:
        layout = _block_layout(state, C, R_pad, packed)
    prow, posb, n_blocks, row_start, row_len, row_key, row_key_hi = layout
    (ks, xs, ys, zs, nxs, nys, nzs, order, vs, pos, bits_arr, m) = state
    rows = jnp.arange(R_pad, dtype=jnp.int32)
    run = rows < n_blocks
    if need_sorted is not None:
        cumn = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.cumsum((need_sorted & vs).astype(jnp.int32))]
        )
        run = run & (cumn[row_start + row_len] > cumn[row_start])
    if flag_stencil is not None:
        flags_sorted, s = flag_stencil
        run = run & _row_stencil_any(state, row_key, row_key_hi, flags_sorted,
                                     int(s), packed)
    return tab.at[:, 34].set(run.astype(jnp.int32))


def _build_packed(state, C: int, SEG: int):
    (ks, xs, ys, zs, nxs, nys, nzs, order, vs, pos, bits_arr, m) = state
    N = ks.shape[0]
    vflag = vs.astype(jnp.float32)
    packed = jnp.stack(
        [xs, ys, zs, nxs, nys, nzs, _encode_id_f32(order), vflag], axis=1
    )
    packed = jnp.where(vs[:, None], packed, jnp.float32(PAD))
    packed = jnp.concatenate(
        [packed, jnp.full((N, 128 - packed.shape[1]), jnp.float32(PAD))], axis=1
    )
    # tail pad: the last SEG window and the C-row query copy never overrun
    packed = jnp.concatenate(
        [packed, jnp.full((SEG + max(C, SEG), 128), jnp.float32(PAD))], axis=0
    )
    return packed


def _inverse_perm(order):
    """Inverse of a permutation via O(N) scatter (argsort is a full sort)."""
    N = order.shape[0]
    return jnp.zeros((N,), order.dtype).at[order].set(
        jnp.arange(N, dtype=order.dtype), unique_indices=True
    )


_FAST_PASS_GIB = float(os.environ.get("LGR_PASS_FAST_GIB", "4.0"))


def _tposed_out(R_pad: int, C: int) -> bool:
    """True when a pass must emit [R_pad, n_out, C] instead of the fast
    [R_pad, C, n_out] layout.

    TPU tiling T(8,128) pads the minor dim to 128 lanes, so the fast
    layout physically costs R_pad*C*512 B regardless of n_out — 16x for
    the 8-channel side passes; at 10M points the unpacked side pass hit a
    21.5 GiB single allocation on a 16 GiB v5e.  The transposed layout is
    padding-free but its consumers pay one element gather per channel
    (measured 244 ms vs 62 ms for 10 channels of 1M rows), so it engages
    only when the padded buffer would not fit comfortably."""
    return R_pad * C * 512 > _FAST_PASS_GIB * 2**30


def _rows_at_slots(o, k, slot, kept, tposed):
    """[len(slot), k] rows of the first k output channels, either layout."""
    if tposed:
        cols = [
            jnp.where(kept, o[:, ch, :].reshape(-1)[slot], 0.0)
            for ch in range(k)
        ]
        return jnp.stack(cols, axis=1)
    flat = o[:, :, :k].reshape(o.shape[0] * o.shape[1], k)
    return jnp.where(kept[:, None], flat[slot], 0.0)


# Explicit MXU precisions: the runtime may lower DEFAULT-precision f32
# dots to ONE bf16 pass (measured after a toolchain update:
# --xla_allow_excess_precision=true made the eye-transpose lossy, maxerr
# 6e-2 — every self-pair diff stopped being exactly 0 and ISS NMS
# returned ZERO keypoints).  Identity transposes must be BIT-EXACT
# (PREC_EXACT); moment/histogram accumulations need f32-grade accuracy
# (PREC_ACC = 3-pass bf16, exact for 0/1 masks and block-scale values).
PREC_EXACT = jax.lax.Precision.HIGHEST
# Mosaic supports only DEFAULT/HIGHEST inside kernels (HIGH raises
# NotImplementedError); the accumulation dots are tiny-K contractions far
# off the critical path, so the 6-pass cost is invisible
PREC_ACC = jax.lax.Precision.HIGHEST


def _query_lanes(qblk, eye):
    """[C, 128] own block (sublanes) -> [128, C] lane-major via one MXU op.

    BIT-EXACT required: these lanes are compared against the same values
    read straight from the packed candidate rows (ISS NMS saliency, pair
    self-exclusion by exact-zero diff)."""
    return jax.lax.dot_general(
        qblk, eye, (((0,), (0,)), ((), ())),
        precision=PREC_EXACT, preferred_element_type=jnp.float32,
    )


# ---------------------------------------------------------------------------
# blocked pass runner: G query blocks per step, candidates STREAMED through
# a double-buffered SEG-row window (no length caps anywhere)
# ---------------------------------------------------------------------------
def _make_stream_fold(tab_ref, g, packed_ref, segbuf, segsems, SEG):
    """fold(body, init): stream the 9 candidate columns of block g in
    SEG-row windows, double-buffered (window s+1 is in flight while s
    computes).  body(cc [SEG,128], jc_global [SEG,1], clen, acc)."""

    def fold(body, init):
        def col_step(c, acc):
            cst = tab_ref[g, c]
            clen = tab_ref[g, 16 + c]
            nseg = pl.cdiv(clen, SEG)

            def copy(s, slot):
                return pltpu.make_async_copy(
                    packed_ref.at[pl.ds(cst + SEG * s, SEG), :],
                    segbuf.at[slot],
                    segsems.at[slot],
                )

            @pl.when(nseg > 0)
            def _():
                copy(0, 0).start()

            def seg_step(s, acc):
                slot = jax.lax.rem(s, 2)

                @pl.when(s + 1 < nseg)
                def _():
                    copy(s + 1, jax.lax.rem(s + 1, 2)).start()

                copy(s, slot).wait()
                cc = segbuf[slot]
                jc = jax.lax.broadcasted_iota(jnp.int32, (SEG, 1), 0) + SEG * s
                return body(cc, jc, clen, acc)

            return jax.lax.fori_loop(0, nseg, seg_step, acc)

        return jax.lax.fori_loop(0, 9, col_step, init)

    return fold


def _make_blocked_kernel(cell_fn, n_out: int, C: int, SEG: int,
                         tposed: bool = False):
    """Wrap a per-query-block compute into the G-blocked driver.

    cell_fn(meta_ref, tab_ref, g, fold, qrow, out_g, scratch) writes
    out_g [n_out, C]; qrow is the lane-major [128, C] own block; fold
    streams the candidate columns.  tposed: emit the channel-major
    [n_out, C] block as-is (memory-constrained layout, see _tposed_out)
    instead of MXU-flipping it to point-major [C, n_out]."""

    def kernel(meta_ref, tab_ref, packed_ref, out_ref, segbuf, qblk, *rest):
        segsems, qsem = rest[-3], rest[-2]
        obuf = rest[-1]
        scratch = rest[:-3]
        rblk = pl.program_id(0)
        n_rows = meta_ref[1].astype(jnp.int32)
        eye = jnp.eye(C, dtype=jnp.float32)

        def q_copy(g, slot):
            return pltpu.make_async_copy(
                packed_ref.at[pl.ds(tab_ref[g, 32], C), :], qblk.at[slot],
                qsem.at[slot],
            )

        def live(g):
            # tab lane 34: per-row compute flag (masked-query fast path).
            # The index clamp keeps the eager predicate read in bounds when
            # called with g+1 == G_CELLS (the caller's `g + 1 < G_CELLS`
            # conjunct already forces the result false there).
            flag = tab_ref[jnp.minimum(g, G_CELLS - 1), 34]
            return (rblk * G_CELLS + g < n_rows) & (flag > 0)

        @pl.when(live(0))
        def _():
            q_copy(0, 0).start()

        # traced loop over the G blocks of this step (an unrolled python
        # loop multiplied Mosaic compile time by G)
        def g_body(g, _):
            slot = jax.lax.rem(g, 2)

            @pl.when((g + 1 < G_CELLS) & live(g + 1))
            def _():
                q_copy(g + 1, jax.lax.rem(g + 1, 2)).start()

            @pl.when(live(g))
            def _():
                q_copy(g, slot).wait()
                qrow = _query_lanes(qblk[slot], eye)
                fold = _make_stream_fold(tab_ref, g, packed_ref, segbuf,
                                         segsems, SEG)
                cell_fn(meta_ref, tab_ref, g, fold, qrow, obuf, scratch)
                if tposed:
                    out_ref[g] = obuf[...]
                else:
                    # out rides [C, n_out] (point-major) so the XLA
                    # scatter-back is a plain reshape + row gather, no
                    # [R_pad, n_out, C] transpose; one MXU op flips the block
                    out_ref[g] = jax.lax.dot_general(
                        eye, obuf[...], (((1,), (1,)), ((), ())),
                        precision=PREC_EXACT,  # values re-enter packed lanes
                        preferred_element_type=jnp.float32,
                    )

            @pl.when(jnp.logical_not(live(g)))
            def _():
                shape = (n_out, C) if tposed else (C, n_out)
                out_ref[g] = jnp.zeros(shape, jnp.float32)

            return 0

        jax.lax.fori_loop(0, G_CELLS, g_body, 0)

    return kernel


def _run_pass(cell_fn, meta, tab, packed, R_pad, C, SEG, n_out, interpret,
              extra_scratch=(), tposed=False):
    # sub-ref slicing (out_ref.at[g]) requires the sublane dim 8-aligned
    n_out = _round_up(n_out, 8)
    kernel = _make_blocked_kernel(cell_fn, n_out, C, SEG, tposed=tposed)
    out_block = (G_CELLS, n_out, C) if tposed else (G_CELLS, C, n_out)
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
            out_block, lambda r, *_: (r, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, SEG, 128), jnp.float32),
            pltpu.VMEM((2, C, 128), jnp.float32),
            *extra_scratch,
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((n_out, C), jnp.float32),  # obuf: cell_fn output block
        ],
    )
    out_shape = (R_pad, n_out, C) if tposed else (R_pad, C, n_out)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        # the packed-row layout (C=512) needs ~29 MB of scoped VMEM for the
        # double-buffered out blocks + stream scratch; the Mosaic default
        # (16 MB) is conservative vs the 128 MB physical VMEM on v5e
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(meta, tab, packed)


def _round_up(n, mult):
    return ((n + mult - 1) // mult) * mult


def _chunk_gib():
    """LGR_CHUNK_GIB, read HOST-SIDE per plan/pass call (it becomes a jit
    static below): changing the env var between runs recompiles with the
    new window instead of silently replaying the first compile's Rc."""
    return float(os.environ.get("LGR_CHUNK_GIB", "0.75"))


def _run_pass_sorted(cell_fn, meta, tab, packed, N, R_pad, C, SEG, n_out,
                     k, prow, posb, interpret, extra_scratch=(),
                     chunk_gib=0.75):
    """Run a pass and return its first k channels AT SORTED POINT ROWS
    (f32[N, k]) — the layout every consumer actually wants.

    Replaces (tposed pass + per-channel element gathers) at large N: the
    fast [Rc, C, n_out->128-lane] block layout is run CHUNK by chunk over
    the table rows (peak extra HBM <= LGR_CHUNK_GIB), and each chunk's
    rows land in sorted order via ONE row gather + dynamic_update_slice.
    Points of later chunks inside a chunk's fixed window get zeros that
    the owning (later) chunk overwrites — chunk order is ascending and
    block point ranges are monotone, so the final rows are exact.
    Invalid/out-of-layout points read back garbage finite values; callers
    mask with their kept masks exactly as for the other layouts."""
    n_out_p = _round_up(n_out, 8)
    Rc = int((chunk_gib * 2**30) // (C * 512))
    Rc = max(G_CELLS, (Rc // G_CELLS) * G_CELLS)
    if Rc >= R_pad:
        out = _run_pass(cell_fn, meta, tab, packed, R_pad, C, SEG, n_out,
                        interpret, extra_scratch=extra_scratch, tposed=False)
        flat = out.reshape(R_pad * C, n_out_p)
        slot = jnp.clip(prow, 0, R_pad - 1) * C + posb
        return flat[slot][:, :k]

    n_chunks = -(-R_pad // Rc)
    W = Rc * C
    slot = jnp.clip(prow, 0, R_pad - 1) * C + posb
    slot_pad = jnp.concatenate(
        [slot, jnp.full((W,), jnp.int32(-1))]
    ).astype(jnp.int32)
    # chunk-invariant padded table: slice rows [c*Rc, c*Rc + Rc)
    tab_pad = jnp.concatenate(
        [tab, jnp.zeros((n_chunks * Rc - R_pad, TAB_LANES), tab.dtype)]
    )
    result0 = jnp.zeros((N + W, k), jnp.float32)

    def body(c, result):
        off = c * Rc
        tab_c = jax.lax.dynamic_slice(tab_pad, (off, 0), (Rc, TAB_LANES))
        meta_c = meta.at[1].set(
            jnp.clip(meta[1] - jnp.float32(off), 0.0, jnp.float32(Rc))
        )
        out = _run_pass(cell_fn, meta_c, tab_c, packed, Rc, C, SEG, n_out,
                        interpret, extra_scratch=extra_scratch, tposed=False)
        flat = out.reshape(W, n_out_p)
        base = tab_c[0, 32]  # sorted point offset of the chunk's first block
        slot_w = jax.lax.dynamic_slice(slot_pad, (base,), (W,)) - off * C
        in_rng = (slot_w >= 0) & (slot_w < W)
        rows = flat[jnp.where(in_rng, slot_w, 0)][:, :k]
        rows = jnp.where(in_rng[:, None], rows, 0.0)
        return jax.lax.dynamic_update_slice(result, rows, (base, jnp.int32(0)))

    result = jax.lax.fori_loop(0, n_chunks, body, result0)
    return result[:N]


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


def _block_geometry(qrow, C):
    """Per-block query geometry for the MXU moment contraction.

    Returns (bx, by, bz) [1,1] block center (mean of valid queries),
    (qdx, qdy, qdz) [1, C] centered query coords (zeroed at dead lanes),
    qvalid [1, C].  Centering keeps the second-moment features at
    neighborhood scale (f32-exact squares even for clouds georeferenced
    thousands of meters from the origin), while pair diffs stay the
    exact per-pair subtraction cd - qd: for the self pair both center
    the SAME point with the SAME rounding, so dx == 0 exactly and the
    d2 > eps self-exclusion keeps working."""
    q7 = qrow[CH_VALID:CH_VALID + 1, :]
    qvalid = (q7 > 0.5) & (q7 < 2.0)  # PAD lanes carry 3e18
    qvf = qvalid.astype(jnp.float32)
    qx, qy, qz = qrow[0:1, :], qrow[1:2, :], qrow[2:3, :]
    nq = jnp.maximum(jnp.sum(qvf, axis=1, keepdims=True), 1.0)
    bx = jnp.sum(qx * qvf, axis=1, keepdims=True) / nq
    by = jnp.sum(qy * qvf, axis=1, keepdims=True) / nq
    bz = jnp.sum(qz * qvf, axis=1, keepdims=True) / nq
    qdx = jnp.where(qvalid, qx - bx, 0.0)
    qdy = jnp.where(qvalid, qy - by, 0.0)
    qdz = jnp.where(qvalid, qz - bz, 0.0)
    return bx, by, bz, qdx, qdy, qdz, qvalid


def _chunk_centered(cc, bx, by, bz):
    """Centered candidate coords for one chunk: cd* [SEG,1] (zeroed at
    PAD rows so the downstream moment matmul never sees 0 * huge),
    cval [SEG,1] bool, cvf its f32 form."""
    c7 = cc[:, 7:8]
    cval = (c7 > 0.5) & (c7 < 2.0)
    cvf = cval.astype(jnp.float32)
    cdx = (cc[:, 0:1] - bx) * cvf
    cdy = (cc[:, 1:2] - by) * cvf
    cdz = (cc[:, 2:3] - bz) * cvf
    return cdx, cdy, cdz, cval, cvf


def _surface_cell(meta_ref, tab_ref, g, fold, qrow, out_g, scratch):
    """Covariance via candidate-only moments on the MXU.

    Per-query covariance is shift-invariant, so it derives from
    block-centered candidate moments F = [1, d, d (x) d] contracted
    against the pair mask: mom [16, C] += F^T @ ok — one MXU matmul per
    chunk instead of 12 masked VPU reductions (the VPU was the measured
    bottleneck of every cell pass).  Pair distances stay exact per-pair
    diffs of the centered coords (see _block_geometry)."""
    C = qrow.shape[1]
    r2 = meta_ref[0]
    bx, by, bz, qdx, qdy, qdz, qvalid = _block_geometry(qrow, C)

    init = (
        jnp.zeros((16, C), jnp.float32),
        jnp.full((1, C), BIG),
        jnp.full((1, C), -1.0),
    )

    def body(cc, jc, clen, acc):
        mom, dmin, nnid = acc
        cdx, cdy, cdz, cval, cvf = _chunk_centered(cc, bx, by, bz)
        dx, dy, dz = cdx - qdx, cdy - qdy, cdz - qdz
        d2 = dx * dx + dy * dy + dz * dz
        ok = (d2 <= r2) & (jc < clen) & cval & qvalid
        okf = ok.astype(jnp.float32)
        F = jnp.concatenate([
            cvf, cdx, cdy, cdz,
            cdx * cdx, cdx * cdy, cdx * cdz,
            cdy * cdy, cdy * cdz, cdz * cdz,
            jnp.zeros((cvf.shape[0], 6), jnp.float32),
        ], axis=1)  # [SEG, 16]
        mom = mom + jax.lax.dot_general(
            F, okf, (((0,), (0,)), ((), ())),
            precision=PREC_ACC,
            preferred_element_type=jnp.float32,
        )
        # self-exclusion by zero distance — the framework-wide convention
        # (ops/grid.py include_self=False uses the same predicate): exact
        # duplicates are removed at load time (common.cpp:417-427), so only
        # the query itself can sit at d2 = 0
        dpos = jnp.where(ok & (d2 > 0.0), d2, BIG)
        tmin = jnp.min(dpos, axis=0, keepdims=True)
        targ = jnp.min(
            jnp.where(dpos == tmin, cc[:, CH_ID:CH_ID + 1], BIG),
            axis=0, keepdims=True,
        )
        better = tmin < dmin
        nnid = jnp.where(better, targ, nnid)
        dmin = jnp.where(better, tmin, dmin)
        return (mom, dmin, nnid)

    mom, dmin, nnid = fold(body, init)
    s1 = mom[0:1, :]
    cnt = jnp.maximum(s1, 1.0)
    mx, my, mz = mom[1:2, :] / cnt, mom[2:3, :] / cnt, mom[3:4, :] / cnt
    l0, l1, l2, vx, vy, vz = _smallest_eig3(
        mom[4:5, :] / cnt - mx * mx,
        mom[5:6, :] / cnt - mx * my,
        mom[6:7, :] / cnt - mx * mz,
        mom[7:8, :] / cnt - my * my,
        mom[8:9, :] / cnt - my * mz,
        mom[9:10, :] / cnt - mz * mz,
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
def _iss_count_cell(meta_ref, tab_ref, g, fold, qrow, out_g, scratch):
    C = qrow.shape[1]
    r2 = meta_ref[0]
    bx, by, bz, qdx, qdy, qdz, qvalid = _block_geometry(qrow, C)

    def body(cc, jc, clen, s1):
        cdx, cdy, cdz, cval, cvf = _chunk_centered(cc, bx, by, bz)
        dx, dy, dz = cdx - qdx, cdy - qdy, cdz - qdz
        d2 = dx * dx + dy * dy + dz * dz
        ok = (d2 <= r2) & (jc < clen) & cval & qvalid
        okf = ok.astype(jnp.float32)
        return s1 + jax.lax.dot_general(
            cvf, okf, (((0,), (0,)), ((), ())),
            precision=PREC_ACC,
            preferred_element_type=jnp.float32,
        )

    s1 = fold(body, jnp.zeros((1, C), jnp.float32))
    out_g[0, :] = s1[0]  # includes self (d2 = 0 passes)
    out_g[1:, :] = jnp.zeros((out_g.shape[0] - 1, C), jnp.float32)


def _iss_saliency_cell(meta_ref, tab_ref, g, fold, qrow, out_g, scratch):
    """Weighted scatter matrix around the query via MXU moments: the
    per-candidate weight w = 1/count folds into the candidate feature
    columns, and the query-centered second moments are reconstructed
    from block-centered ones (shift identities) once per block."""
    C = qrow.shape[1]
    r2 = meta_ref[0]
    gamma21 = meta_ref[2]
    gamma32 = meta_ref[3]
    bx, by, bz, qdx, qdy, qdz, qvalid = _block_geometry(qrow, C)

    def body(cc, jc, clen, mom):
        cdx, cdy, cdz, cval, cvf = _chunk_centered(cc, bx, by, bz)
        dx, dy, dz = cdx - qdx, cdy - qdy, cdz - qdz
        d2 = dx * dx + dy * dy + dz * dz
        ok = (
            (d2 <= r2)
            # exclude self from the scatter by zero distance (the
            # framework-wide include_self=False convention, ops/grid.py:
            # duplicates are removed at load, common.cpp:417-427)
            & (d2 > 0.0)
            & (jc < clen)
            & cval
            & qvalid
        )
        okf = ok.astype(jnp.float32)
        w = cvf / jnp.maximum(cc[:, CH_EXTRA:CH_EXTRA + 1], 1.0)  # [SEG,1]
        F = jnp.concatenate([
            w, w * cdx, w * cdy, w * cdz,
            w * cdx * cdx, w * cdx * cdy, w * cdx * cdz,
            w * cdy * cdy, w * cdy * cdz, w * cdz * cdz,
            cvf, jnp.zeros((cvf.shape[0], 5), jnp.float32),
        ], axis=1)  # [SEG, 16]
        return mom + jax.lax.dot_general(
            F, okf, (((0,), (0,)), ((), ())),
            precision=PREC_ACC,
            preferred_element_type=jnp.float32,
        )

    mom = fold(body, jnp.zeros((16, C), jnp.float32))
    ws, nnb = mom[0:1, :], mom[10:11, :]
    wx, wy, wz = mom[1:2, :], mom[2:3, :], mom[3:4, :]
    # shift back to query-centered: sum w (c-q)(c-q)^T from cd moments
    sxx = mom[4:5, :] - 2.0 * qdx * wx + qdx * qdx * ws
    sxy = mom[5:6, :] - qdx * wy - qdy * wx + qdx * qdy * ws
    sxz = mom[6:7, :] - qdx * wz - qdz * wx + qdx * qdz * ws
    syy = mom[7:8, :] - 2.0 * qdy * wy + qdy * qdy * ws
    syz = mom[8:9, :] - qdy * wz - qdz * wy + qdy * qdz * ws
    szz = mom[9:10, :] - 2.0 * qdz * wz + qdz * qdz * ws
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


def _iss_nms_cell(meta_ref, tab_ref, g, fold, qrow, out_g, scratch):
    C = qrow.shape[1]
    q_sal = qrow[CH_SAL:CH_SAL + 1, :]
    q_ok = qrow[CH_OK:CH_OK + 1, :] > 0.5
    r2 = meta_ref[0]
    min_nb = meta_ref[4]
    bx, by, bz, qdx, qdy, qdz, qvalid = _block_geometry(qrow, C)

    init = (jnp.full((1, C), -BIG), jnp.zeros((1, C), jnp.float32))

    def body(cc, jc, clen, acc):
        nb_max, nnb = acc
        cdx, cdy, cdz, cval, _cvf = _chunk_centered(cc, bx, by, bz)
        dx, dy, dz = cdx - qdx, cdy - qdy, cdz - qdz
        d2 = dx * dx + dy * dy + dz * dz
        ok = (
            (d2 <= r2)
            & (d2 > 0.0)  # self-exclusion convention: see _surface_cell
            & (jc < clen)
            & cval
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

    nb_max, nnb = fold(body, init)
    is_kp = q_ok & (nnb >= min_nb) & (q_sal > nb_max) & qvalid
    out_g[0, :] = is_kp.astype(jnp.float32)[0]
    out_g[1:, :] = jnp.zeros((out_g.shape[0] - 1, C), jnp.float32)


# ---------------------------------------------------------------------------
# FPFH cells
# ---------------------------------------------------------------------------
def _pair_feature_bins(qgeom, cc, bx, by, bz, r2):
    """Darboux features + bins for one candidate chunk vs the query lanes.

    qgeom: per-block query-side precomputation (_spfh_query_geom);
    cc: [CHUNK, 128] candidates on sublanes.
    Matches ops/fpfh.pair_features_soa (the acos comparison reduces to a
    |cos| comparison since acos is monotone decreasing).

    MXU formulation: every bilinear the Darboux frame needs — qn.dp,
    cn.dp, qn.cn, and the triple product dp.(qn x cn) — is a
    [SEG,3] @ [3,C] contraction of candidate-side vectors against
    query-side ones (dp = cd - qd splits both triple-product terms into
    candidate-only x query-only factors: cd.(qn x cn) = qn.(cn x cd),
    qd.(qn x cn) = cn.(qd x qn)).  The normalized cross-product chain
    collapses to the identities |dp x ns|^2 = d2 |ns|^2 - (dp.ns)^2 and
    (ns x (dp x ns)/v).nt = (|ns|^2 dp.nt - (dp.ns)(ns.nt))/v, and
    atan2's positive-scale invariance moves the 1/v onto the x operand.
    ~90 -> ~45 VPU ops per [SEG, C] chunk; the dots ride the MXU."""
    (qdx, qdy, qdz, qn3, qdqn, qn2, qdxqn) = qgeom
    cdx, cdy, cdz, cval, _cvf = _chunk_centered(cc, bx, by, bz)
    cnx, cny, cnz = cc[:, 3:4], cc[:, 4:5], cc[:, 5:6]
    cn3 = jnp.concatenate([cnx, cny, cnz], axis=1)  # [SEG, 3]
    cd3 = jnp.concatenate([cdx, cdy, cdz], axis=1)  # [SEG, 3]
    cnxcd3 = jnp.concatenate([
        cny * cdz - cnz * cdy,
        cnz * cdx - cnx * cdz,
        cnx * cdy - cny * cdx,
    ], axis=1)  # cn x cd, [SEG, 3]
    cncd = cnx * cdx + cny * cdy + cnz * cdz  # [SEG, 1]
    cn2 = cnx * cnx + cny * cny + cnz * cnz  # [SEG, 1]

    def mm(lhs, rhs):
        return jax.lax.dot_general(
            lhs, rhs, (((1,), (0,)), ((), ())),
            precision=PREC_ACC,
            preferred_element_type=jnp.float32,
        )

    # exact per-pair diffs (self stays exactly 0 — see _block_geometry)
    dpx, dpy, dpz = cdx - qdx, cdy - qdy, cdz - qdz  # [SEG, C]
    d2 = dpx * dpx + dpy * dpy + dpz * dpz
    qndp = mm(cd3, qn3) - qdqn  # qn . dp
    cndp = cncd - mm(cn3, jnp.concatenate([qdx, qdy, qdz], axis=0))  # cn . dp
    nsnt = mm(cn3, qn3)  # qn . cn (symmetric under swap)
    trip = mm(cnxcd3, qn3) - mm(cn3, qdxqn)  # dp . (qn x cn)

    dsafe = jnp.maximum(jnp.sqrt(jnp.maximum(d2, 0.0)), 1e-30)
    a1 = qndp / dsafe
    a2 = cndp / dsafe
    swap = jnp.abs(a1) < jnp.abs(a2)
    f3 = jnp.where(swap, a2, a1)
    ns_dp = jnp.where(swap, cndp, qndp)  # |dp'.ns| (sign-free use below)
    ns2 = jnp.where(swap, jnp.broadcast_to(cn2, swap.shape),
                    jnp.broadcast_to(qn2, swap.shape))
    vn = jnp.sqrt(jnp.maximum(d2 * ns2 - ns_dp * ns_dp, 0.0))  # |dp' x ns|
    okv = (d2 > 0.0) & (vn > 1e-12)
    vsn = jnp.maximum(vn, 1e-30)
    f2 = trip / vsn  # det[dp', ns, nt] / |dp' x ns| — same sign either way
    # w.nt = (|ns|^2 dp'.nt - (dp'.ns)(ns.nt)) / vn
    w_num = jnp.where(
        swap, cndp * nsnt - cn2 * qndp, qn2 * cndp - qndp * nsnt
    )
    f1 = _atan2_poly(w_num, nsnt * vsn)
    b1 = jnp.clip(
        jnp.floor(NR_BINS * (f1 + np.pi) / (2.0 * np.pi)), 0, NR_BINS - 1
    ).astype(jnp.int32)
    b2 = jnp.clip(jnp.floor(NR_BINS * (f2 + 1.0) / 2.0), 0, NR_BINS - 1).astype(jnp.int32)
    b3 = jnp.clip(jnp.floor(NR_BINS * (f3 + 1.0) / 2.0), 0, NR_BINS - 1).astype(jnp.int32)
    ok = okv & (d2 <= r2) & (cn2 > 0.5) & (qn2 > 0.5) & cval
    return b1, b2, b3, ok


def _spfh_query_geom(qrow, C, meta_ref):
    """Query-side constants for _pair_feature_bins, built once per block:
    centered coords, qn3 [3,C], qd.qn [1,C], |qn|^2 [1,C], (qd x qn) [3,C].

    Centering anchor: the CLOUD's AABB center (meta lanes 2:5), NOT the
    query-block mean — pair features must be identical across different
    grid plans of the same cloud (tests/test_cell_stats.py compares the
    exact m=1 grid against the auto-grown one bin-for-bin), so nothing
    block-dependent may enter the arithmetic.  The anchor still keeps
    every product at scene scale for georeferenced clouds."""
    bx, by, bz = meta_ref[2], meta_ref[3], meta_ref[4]
    q7 = qrow[CH_VALID:CH_VALID + 1, :]
    qvalid = (q7 > 0.5) & (q7 < 2.0)
    qx, qy, qz = qrow[0:1, :], qrow[1:2, :], qrow[2:3, :]
    qdx = jnp.where(qvalid, qx - bx, 0.0)
    qdy = jnp.where(qvalid, qy - by, 0.0)
    qdz = jnp.where(qvalid, qz - bz, 0.0)
    qnx, qny, qnz = qrow[3:4, :], qrow[4:5, :], qrow[5:6, :]
    qn3 = jnp.concatenate([qnx, qny, qnz], axis=0)  # [3, C]
    qdqn = qdx * qnx + qdy * qny + qdz * qnz  # [1, C]
    qn2 = qnx * qnx + qny * qny + qnz * qnz  # [1, C]
    qdxqn = jnp.concatenate([
        qdy * qnz - qdz * qny,
        qdz * qnx - qdx * qnz,
        qdx * qny - qdy * qnx,
    ], axis=0)  # qd x qn, [3, C]
    qgeom = (qdx, qdy, qdz, qn3, qdqn, qn2, qdxqn)
    return qgeom, bx, by, bz, qvalid


def _spfh_cell(meta_ref, tab_ref, g, fold, qrow, out_g, scratch):
    (acc,) = scratch
    C = qrow.shape[1]
    qgeom, bx, by, bz, qvalid = _spfh_query_geom(qrow, C, meta_ref)
    r2 = meta_ref[0]

    acc[...] = jnp.zeros_like(acc)

    def body(cc, jc, clen, _):
        b1, b2, b3, ok = _pair_feature_bins(qgeom, cc, bx, by, bz, r2)
        ok = ok & (jc < clen) & qvalid
        okf = ok.astype(jnp.float32)
        oki = ok.astype(jnp.int32)
        acc[DIM:DIM + 1, :] += jnp.sum(okf, axis=0, keepdims=True)
        # Packed-integer histogram: several bins ride bit-fields of one
        # i32 lane, decoded every window (field capacity >= SEG = window
        # length, so counts can never overflow), cutting the 11 masked
        # [SEG, C] reductions per feature to 4 (or 6 at SEG = 1024).
        # Integer adds are exact: the decoded counts are bit-identical
        # to the per-bin reduction.
        if cc.shape[0] <= 1023:
            fields, bits = 3, 10
        else:
            fields, bits = 2, 15
        n_groups = -(-NR_BINS // fields)
        mask_f = (1 << bits) - 1
        for which, b in enumerate((b1, b2, b3)):
            if fields == 3:
                grp = (b * 11) >> 5  # == b // 3 for b in [0, 11)
            else:
                grp = b >> 1
            sh = (b - fields * grp) * bits
            v = oki << sh
            for gi in range(n_groups):
                p = jnp.sum(
                    jnp.where(grp == gi, v, 0), axis=0, keepdims=True
                )  # [1, C] i32: `fields` packed bin counts
                for f in range(fields):
                    k = fields * gi + f
                    if k >= NR_BINS:
                        break
                    acc[which * NR_BINS + k:which * NR_BINS + k + 1, :] += (
                        (p >> (bits * f)) & mask_f
                    ).astype(jnp.float32)
        return 0

    fold(body, 0)
    cnt = acc[DIM:DIM + 1, :]
    incr = jnp.where(cnt > 0, 100.0 / jnp.maximum(cnt, 1.0), 0.0)
    out_g[0:DIM, :] = acc[0:DIM, :] * incr
    out_g[DIM, :] = cnt[0]
    out_g[DIM + 1:, :] = jnp.zeros((out_g.shape[0] - DIM - 1, C), jnp.float32)


def _combine_cell(meta_ref, tab_ref, g, fold, qrow, out_g, scratch):
    """FPFH combine: the SPFH of every point rides in packed lanes
    CH_EXTRA..CH_EXTRA+33 (written back between passes), so the weighted
    neighbor sum is a small MXU matmul per candidate chunk."""
    (wsum,) = scratch
    C = qrow.shape[1]
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
            precision=PREC_ACC,
            preferred_element_type=jnp.float32,
        )
        return 0

    fold(body, 0)
    kcnt = wsum[DIM:DIM + 1, :]
    mean = wsum[0:DIM, :] / jnp.maximum(kcnt, 1.0)
    feat = q_spfh + mean
    blocks = []
    for blk in range(3):
        f = feat[blk * NR_BINS:(blk + 1) * NR_BINS, :]
        s = jnp.sum(f, axis=0, keepdims=True)
        blocks.append(jnp.where(s > 0, 100.0 * f / jnp.maximum(s, 1e-30), f))
    out_g[0:DIM + 1, :] = jnp.concatenate(blocks + [kcnt], axis=0)  # [34, C]
    out_g[DIM + 1:, :] = jnp.zeros((out_g.shape[0] - DIM - 1, C), jnp.float32)


# ---------------------------------------------------------------------------
# jitted pass drivers (consume the sorted state; statics fixed by the plan)
# ---------------------------------------------------------------------------
def _default_interpret(interpret):
    if interpret is None:
        return jax.default_backend() not in ("tpu", "axon")
    return interpret


@functools.partial(
    jax.jit,
    static_argnames=("C", "SEG", "R_pad", "interpret", "do_surface", "do_iss",
                     "min_neighbors", "need_C", "need_R_pad", "need_s",
                     "packed_rows", "need_packed_rows", "chunk_gib"),
)
def _surface_iss_impl(state, normal_r2, iss_r2, gamma21, gamma32, viewpoint,
                      C, SEG, R_pad, interpret, do_surface, do_iss,
                      min_neighbors, surface_need=None, need_state=None,
                      need_C=0, need_R_pad=0, need_s=0, packed_rows=False,
                      need_packed_rows=False, chunk_gib=0.75):
    """need_state (+ its need_C/need_R_pad statics): fused keypoint-regime
    side stage — ISS runs first, the surface `need` mask derives from the
    fresh keypoints via the OTHER grid's stencil (point_need), and the
    masked surface pass reuses THIS grid's packed table: one packed build
    and one device program for the whole side stage."""
    (ks, xs, ys, zs, nxs, nys, nzs, order, vs, pos, bits_arr, m) = state
    N = ks.shape[0]
    layout = _block_layout(state, C, R_pad, packed_rows)
    tab, n_rows, prow, posb = _build_tab(state, C, SEG, R_pad,
                                         packed=packed_rows, layout=layout)
    packed = _build_packed(state, C, SEG)
    nrows_f = jnp.minimum(n_rows, R_pad).astype(jnp.float32)
    inv = _inverse_perm(order)
    out = {}

    kept_i = vs & (prow >= 0) & (prow < R_pad)

    def _sorted(cell_fn, meta, tab_p, pk, k, n_out=8):
        # chunked fast-layout runner: sorted-order rows without the tposed
        # layout's per-channel full-N element gathers
        return jnp.where(
            kept_i[:, None],
            _run_pass_sorted(cell_fn, meta, tab_p, pk, N, R_pad, C, SEG,
                             n_out, k, prow, posb, interpret,
                             chunk_gib=chunk_gib),
            0.0,
        )

    if do_iss:
        meta = jnp.stack([iss_r2, nrows_f, gamma21, gamma32,
                          jnp.float32(min_neighbors)])
        counts_sorted = _sorted(_iss_count_cell, meta, tab, packed, 1)[:, 0]
        packed = packed.at[:N, CH_EXTRA].set(counts_sorted)

        rows2 = _sorted(_iss_saliency_cell, meta, tab, packed, 2)
        sal_sorted, ok_sorted = rows2[:, 0], rows2[:, 1]
        packed = packed.at[:N, CH_SAL].set(sal_sorted)
        packed = packed.at[:N, CH_OK].set(ok_sorted)

        # NMS only decides rows that passed the eigen gates (is_kp needs
        # q_ok); blocks without a single survivor skip entirely
        tab_nms = _retab(tab, state, C, R_pad, need_sorted=(ok_sorted > 0.5),
                         packed=packed_rows, layout=layout)
        kp_sorted = _sorted(_iss_nms_cell, meta, tab_nms, packed, 1)[:, 0]
        valid_o_i = vs[inv]
        kp_input = (kp_sorted[inv] > 0.5) & valid_o_i
        out.update(
            kp=kp_input,
            saliency=jnp.where(valid_o_i, sal_sorted[inv], 0.0),
        )
        if do_surface and surface_need is None and need_state is not None:
            surface_need = _point_need_impl(
                need_state, need_C, need_R_pad, kp_input, need_s,
                need_packed_rows,
            )

    if do_surface:
        tab_s = tab
        if surface_need is not None:
            # masked-query fast path: only blocks within ONE grid cell of a
            # needed point stream candidates (keypoint-regime surfaces — the
            # need mask marks points whose normals/density any later stage
            # reads).  The 1-cell stencil (not just blocks HOLDING a needed
            # point) guarantees the k=2 density smoothing below reads a
            # computed d_raw at every needed point's NN — the NN lies within
            # normal_radius <= cell, hence in an adjacent cell — for ANY
            # caller-provided mask, not only pre-dilated point_need masks.
            tab_s = _retab(tab, state, C, R_pad,
                           flag_stencil=(surface_need[order] & vs, 1),
                           packed=packed_rows, layout=layout)
        meta = jnp.stack([normal_r2, nrows_f, jnp.float32(0), jnp.float32(0),
                          jnp.float32(0)])
        # ONE row gather for all 10 channels per chunk (element gathers are
        # ~100x off speed-of-light on this hardware; rows ~7x faster —
        # BASELINE.md); chunking replaces the tposed per-channel gathers
        rows_s = _sorted(_surface_cell, meta, tab_s, packed, 10,
                         n_out=N_CH_SURF)[inv]
        (nx, ny, nz, curv, l0, l1, l2, cnt, dmin, nnid_f) = (
            rows_s[:, ch] for ch in range(10)
        )
        normal = jnp.stack([nx, ny, nz], axis=1)
        eigvals = jnp.stack([l0, l1, l2], axis=1)
        # id lane is the biased-bitcast encoding (tiny-positive floats);
        # the -1.0 init of rows that never saw a neighbor stays negative
        has_nn = (nnid_f > 0) & (dmin < BIG / 2)
        nnid = jnp.clip(_decode_id_f32(nnid_f), 0, N - 1)
        valid_o = vs[inv]  # vs is sorted-order; inv maps back to input order
        ok = valid_o & (cnt >= 3)
        if surface_need is not None:
            # stencil-only boundary rows computed real values (the density
            # smoothing reads their d_raw) but stay cleanly invalid outputs
            ok = ok & surface_need
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
    return out


@functools.partial(jax.jit, static_argnames=("C", "SEG", "R_pad", "interpret",
                                             "packed_rows", "tposed",
                                             "chunk_gib"))
def _fpfh_impl(state, r2, C, SEG, R_pad, interpret, kp=None,
               packed_rows=False, tposed=None, kp_rows=None, chunk_gib=0.75):
    """kp (input-order bool[N] or None): the keypoint-regime fast path.
    FPFH is consumed only at keypoint rows, so SPFH runs only on blocks
    within ONE cell of a keypoint cell (every neighbor the combine pass
    reads — cell == radius makes |q-k| <= r imply adjacent cells) and the
    combine pass only on blocks whose own 1-cell stencil holds a keypoint
    (i.e. cells that can contain one; block granularity is conservative).

    kp_rows (int32[M] input-order row ids, >= N padding): compacted
    output.  Returns ([M, 33], bool[M]) gathered ONLY at those rows —
    the full-N consumer (33 per-channel element gathers in the
    memory-constrained tposed layout, measured +5.1 s at 4M points) and
    the [N, 33] materialization are skipped entirely."""
    (ks, xs, ys, zs, nxs, nys, nzs, order, vs, pos, bits_arr, m) = state
    N = ks.shape[0]
    packed = _build_packed(state, C, SEG)
    layout = _block_layout(state, C, R_pad, packed_rows)
    tab, n_rows, prow, posb = _build_tab(state, C, SEG, R_pad,
                                         packed=packed_rows, layout=layout)
    nrows_f = jnp.minimum(n_rows, R_pad).astype(jnp.float32)
    # grid-independent centering anchor for the pair features: AABB center
    # (min/max are order-independent, so every plan of this cloud agrees)
    big = jnp.float32(3.0e37)
    gc = [
        0.5 * (jnp.min(jnp.where(vs, c, big)) + jnp.max(jnp.where(vs, c, -big)))
        for c in (xs, ys, zs)
    ]
    meta = jnp.stack([r2, nrows_f, gc[0], gc[1], gc[2]])
    tab_spfh = tab
    tab_comb = tab
    if kp is not None:
        kp_sorted = kp[order] & vs
        tab_spfh = _retab(tab, state, C, R_pad, flag_stencil=(kp_sorted, 1),
                          packed=packed_rows, layout=layout)
        tab_comb = _retab(tab, state, C, R_pad, need_sorted=kp_sorted,
                          packed=packed_rows, layout=layout)
    if tposed is None:
        tposed = _tposed_out(R_pad, C)
    slot = jnp.clip(prow, 0, R_pad - 1) * C + posb
    kept = vs & (prow >= 0) & (prow < R_pad)
    # write each point's SPFH into its packed lanes for the combine pass;
    # the chunked sorted-rows runner keeps peak HBM bounded WITHOUT the
    # tposed layout's 33 per-channel full-N element gathers
    spfh_sorted = jnp.where(
        kept[:, None],
        _run_pass_sorted(
            _spfh_cell, meta, tab_spfh, packed, N, R_pad, C, SEG, DIM + 1,
            DIM, prow, posb, interpret,
            extra_scratch=(pltpu.VMEM((DIM + 1, C), jnp.float32),),
            chunk_gib=chunk_gib,
        ),
        0.0,
    )
    packed = packed.at[:N, CH_EXTRA:CH_EXTRA + DIM].set(spfh_sorted)

    inv = _inverse_perm(order)
    if kp_rows is not None:
        # compacted consumer: only M keypoint rows are read back, so the
        # memory-light tposed layout's element gathers are cheap here
        outp = _run_pass(
            _combine_cell, meta, tab_comb, packed, R_pad, C, SEG, DIM + 1,
            interpret,
            extra_scratch=(pltpu.VMEM((DIM + 1, C), jnp.float32),),
            tposed=tposed,
        )
        srt = inv[jnp.minimum(kp_rows, N - 1)]
        feats_kp = _rows_at_slots(outp, DIM + 1, slot[srt],
                                  kept[srt] & (kp_rows < N), tposed)
        feat = feats_kp[:, :DIM]
        feat_valid = (kp_rows < N) & kept[srt] & (feats_kp[:, DIM] > 0)
        return jnp.where(feat_valid[:, None], feat, 0.0), feat_valid
    feats_sorted = jnp.where(
        kept[:, None],
        _run_pass_sorted(
            _combine_cell, meta, tab_comb, packed, N, R_pad, C, SEG, DIM + 1,
            DIM + 1, prow, posb, interpret,
            extra_scratch=(pltpu.VMEM((DIM + 1, C), jnp.float32),),
            chunk_gib=chunk_gib,
        ),
        0.0,
    )
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
        jnp.float32(gamma32), viewpoint, plan.C, plan.SEG, plan.R_pad,
        interpret, True, True, min_neighbors, packed_rows=plan.packed,
        chunk_gib=_chunk_gib(),
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
        viewpoint, plan.C, plan.SEG, plan.R_pad, interpret, True, False, 4,
        packed_rows=plan.packed, chunk_gib=_chunk_gib(),
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
        jnp.zeros((3,), jnp.float32), plan.C, plan.SEG, plan.R_pad, interpret,
        False, True, min_neighbors, packed_rows=plan.packed,
        chunk_gib=_chunk_gib(),
    )
    return out["kp"], out["saliency"]


def fpfh_cells(xyz, normal, valid, radius, interpret=None,
               exact: bool = False, kp=None, m: int | None = None):
    """Self-join FPFH: (feat f32[N,33], feat_valid bool[N]).

    kp (bool[N], input order): keypoint-regime fast path — descriptors are
    exact at keypoint rows and undefined elsewhere (SPFH runs only within
    one cell of keypoint cells; the combine pass only on keypoint blocks).
    Callers must AND feat_valid with the keypoint mask, as the reference
    computes FPFH on keypoint clouds only (fpfh_debug.cpp / feature
    estimation over keypoint indices)."""
    interpret = _default_interpret(interpret)
    plan = plan_grid(xyz, normal, valid, float(np.asarray(radius)),
                     exact=exact, m=m)
    r = jnp.asarray(radius, jnp.float32)
    return _fpfh_impl(plan.state, r * r, plan.C, plan.SEG, plan.R_pad,
                      interpret, kp=kp, packed_rows=plan.packed,
                      chunk_gib=_chunk_gib())


@functools.partial(jax.jit, static_argnames=("C", "R_pad", "s", "packed"))
def _point_need_impl(state, C, R_pad, flags, s, packed=False):
    (ks, xs, ys, zs, nxs, nys, nzs, order, vs, pos, bits_arr, m) = state
    N = ks.shape[0]
    prow, posb, n_blocks, row_start, row_len, row_key, row_key_hi = (
        _block_layout(state, C, R_pad, packed)
    )
    hit = _row_stencil_any(state, row_key, row_key_hi, flags[order] & vs, s,
                           packed)
    need_sorted = vs & hit[jnp.clip(prow, 0, R_pad - 1)] & (prow < R_pad)
    return jnp.zeros((N,), bool).at[order].set(need_sorted)


def point_need(plan, flags, s: int):
    """Input-order bool[N]: point's cell is within `s` cells (Chebyshev, on
    this plan's grid) of a cell containing a flagged point.  Block-granular
    and conservative: every point whose true distance to a flagged point is
    <= s * cell is marked (plus some extras on the same blocks)."""
    return _point_need_impl(plan.state, plan.C, plan.R_pad, flags, int(s),
                            plan.packed)


# ---------------------------------------------------------------------------
# plan-level passes (one plan_grid sort, several passes — the staged
# keypoint-regime pipeline: ISS first, then masked surface / FPFH)
# ---------------------------------------------------------------------------
def iss_pass(plan, iss_radius, gamma21: float = 0.975, gamma32: float = 0.975,
             min_neighbors: int = 4, interpret=None):
    """ISS keypoints on an existing plan: (kp bool[N], saliency f32[N])."""
    interpret = _default_interpret(interpret)
    r = jnp.asarray(iss_radius, jnp.float32)
    out = _surface_iss_impl(
        plan.state, r * r, r * r, jnp.float32(gamma21), jnp.float32(gamma32),
        jnp.zeros((3,), jnp.float32), plan.C, plan.SEG, plan.R_pad, interpret,
        False, True, min_neighbors, packed_rows=plan.packed,
        chunk_gib=_chunk_gib(),
    )
    return out["kp"], out["saliency"]


def surface_pass(plan, normal_radius, viewpoint=None, need=None,
                 interpret=None):
    """Surface pass on an existing plan: (normal, curv, density, eigvals,
    ok).  need (bool[N] input order): only blocks within one grid cell of
    a needed point compute (the 1-cell stencil keeps the k=2 density
    smoothing exact at needed points whose NN is not itself needed);
    non-needed points return ok=False / zero normals."""
    interpret = _default_interpret(interpret)
    if viewpoint is None:
        viewpoint = jnp.zeros((3,), jnp.float32)
    else:
        viewpoint = jnp.asarray(viewpoint, jnp.float32)
    r = jnp.asarray(normal_radius, jnp.float32)
    out = _surface_iss_impl(
        plan.state, r * r, r * r, jnp.float32(0.975), jnp.float32(0.975),
        viewpoint, plan.C, plan.SEG, plan.R_pad, interpret, True, False, 4,
        surface_need=need, packed_rows=plan.packed, chunk_gib=_chunk_gib(),
    )
    return out["normal"], out["curv"], out["density"], out["eigvals"], out["ok"]


def surface_iss_masked(plan_n, plan_f, normal_radius, iss_radius,
                       viewpoint=None, shot: bool = False,
                       gamma21: float = 0.975, gamma32: float = 0.975,
                       min_neighbors: int = 4, interpret=None):
    """Fused keypoint-regime side stage on plan_n's grid: ISS keypoints
    first, then the surface pass masked to blocks a later stage reads
    (SPFH support = 2 feature cells of a keypoint, SHOT = 1; the stencil
    runs on plan_f's grid).  ONE packed-table build and ONE device
    program for the whole side stage (previously iss_pass + point_need +
    surface_pass dispatched three).  Returns (normal, kp, density,
    saliency)."""
    interpret = _default_interpret(interpret)
    if viewpoint is None:
        viewpoint = jnp.zeros((3,), jnp.float32)
    else:
        viewpoint = jnp.asarray(viewpoint, jnp.float32)
    nr = jnp.asarray(normal_radius, jnp.float32)
    ir = jnp.asarray(iss_radius, jnp.float32)
    out = _surface_iss_impl(
        plan_n.state, nr * nr, ir * ir, jnp.float32(gamma21),
        jnp.float32(gamma32), viewpoint, plan_n.C, plan_n.SEG, plan_n.R_pad,
        interpret, True, True, min_neighbors,
        need_state=plan_f.state, need_C=plan_f.C, need_R_pad=plan_f.R_pad,
        need_s=1 if shot else 2, packed_rows=plan_n.packed,
        need_packed_rows=plan_f.packed, chunk_gib=_chunk_gib(),
    )
    return out["normal"], out["kp"], out["density"], out["saliency"]


@jax.jit
def _set_normals_impl(state, normal):
    (ks, xs, ys, zs, nxs, nys, nzs, order, vs, pos, bits_arr, m) = state
    ns = normal[order]
    return (ks, xs, ys, zs, ns[:, 0], ns[:, 1], ns[:, 2], order, vs,
            pos, bits_arr, m)


def set_normals(plan, normal):
    """New GridPlan with `normal` (input order) injected into the sorted
    state — lets the feature grid be planned before normals exist."""
    return GridPlan(plan.C, plan.SEG, plan.R_pad, plan.m, plan.n_rows,
                    plan.n_valid, plan.maxocc, plan.colmax,
                    _set_normals_impl(plan.state, normal),
                    packed=plan.packed)


def fpfh_pass(plan, radius, kp=None, interpret=None, kp_rows=None):
    """FPFH on an existing plan (normals already in the state):
    (feat f32[N,33], feat_valid bool[N]).  See fpfh_cells for kp;
    kp_rows compacts the output to those rows ([M,33], bool[M])."""
    interpret = _default_interpret(interpret)
    r = jnp.asarray(radius, jnp.float32)
    return _fpfh_impl(plan.state, r * r, plan.C, plan.SEG, plan.R_pad,
                      interpret, kp=kp, packed_rows=plan.packed,
                      kp_rows=kp_rows, chunk_gib=_chunk_gib())
