"""Grid-hash fixed-radius neighbor lists: the TPU replacement for kd-trees.

The reference uses pcl::KdTreeFLANN everywhere (radius + kNN search,
include/common.h, matching.h).  Recursive trees are hostile to XLA; instead
we bucket points into a uniform grid keyed by a spatial hash, sort once, and
answer queries by scanning the 27 neighboring cells with a *fixed* per-cell
candidate cap and masking.  This trades exactness at the cap boundary for
static shapes — the same trade the reference makes when it caps ISS radius
searches at `max_neighbors_` (src/pcl/iss_debug.cpp:47-54).

Memory-access design (the perf-critical part):
  - at build time points are scattered into a dense CELL-LIST layout
    [rows, cell_cap] per coordinate (structure-of-arrays — a [*, 3] gather
    would pad its 3-wide last dim to 128 lanes on TPU), where `rows` ranks
    the occupied buckets;
  - a query reads each of its 27 cells as ONE ROW gather (XLA lowers row
    gathers with contiguous slices efficiently; per-element gathers measured
    ~100x slower);
  - only the final top-k winners translate back to original point ids.

All functions are jit-friendly with static K / cap / chunk sizes.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp

INT32_MAX = jnp.iinfo(jnp.int32).max
_COORD_CLIP = 1 << 20  # cell coordinates clipped here before hashing
_TABLE_BITS = 18  # bucket table size (2^18 buckets, ~1MB of starts)
_H = 1 << _TABLE_BITS


def _hash_cells(cx, cy, cz):
    """Classic 3-prime spatial hash folded into [0, 2^18) bucket ids.

    Bucket collisions only add distance-filtered candidates; the
    per-candidate cell check below removes aliased cells."""
    h = (
        cx * jnp.int32(73856093)
        ^ cy * jnp.int32(19349663)
        ^ cz * jnp.int32(83492791)
    )
    return h & jnp.int32(_H - 1)


def approx_topk_default() -> bool:
    """Whether ApproxTopK is profitable on the live backend.

    TPU lowers jax.lax.approx_min_k to the native aggregated partial-reduce;
    the CPU fallback is a slower sort variant (measured ~7x slower), so
    approximate neighbor selection is only enabled on TPU backends.
    LGR_APPROX=0 forces exact top-k everywhere (A/B hook)."""
    import jax
    import os

    if os.environ.get("LGR_APPROX", "1") == "0":
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def _cell_coords_1d(x, origin_d, inv_cell):
    c = jnp.floor((x - origin_d) * inv_cell)
    return jnp.clip(c, -_COORD_CLIP, _COORD_CLIP).astype(jnp.int32)


@jax.tree_util.register_dataclass
@dataclass
class HashGrid:
    """Cell-list spatial index over a padded point set.

    cell_x/y/z/ord are flat [(rows+1) * cell_cap] arrays: row r holds the
    points of the r-th occupied bucket (overflow beyond cell_cap dropped,
    like the reference's max_neighbors_ cap); the final row is a spill
    target whose entries never pass the coordinate check."""

    xyz: jax.Array  # f32[N,3] ORIGINAL order (for callers)
    valid: jax.Array  # bool[N]
    origin: jax.Array  # f32[3]
    cell_size: jax.Array  # f32[]
    rank_table: jax.Array  # i32[_H+1] occupied-bucket rank per bucket
    cell_x: jax.Array  # f32[(rows+1)*cap]
    cell_y: jax.Array
    cell_z: jax.Array
    cell_ord: jax.Array  # i32[(rows+1)*cap] original point ids
    cell_cap: int = field(metadata=dict(static=True))  # static


def build_grid(
    xyz: jax.Array, valid: jax.Array, cell_size, cell_cap: int = 128
) -> HashGrid:
    """Build the cell-list index.  cell_cap bounds points kept per cell."""
    N = xyz.shape[0]
    cell_size = jnp.asarray(cell_size, jnp.float32)
    big = jnp.float32(3.0e37)
    masked = jnp.where(valid[:, None], xyz, big)
    origin = jnp.min(masked, axis=0)
    origin = jnp.where(jnp.isfinite(origin), origin, 0.0) - 0.5 * cell_size
    inv = 1.0 / jnp.maximum(cell_size, 1e-30)
    cx = _cell_coords_1d(xyz[:, 0], origin[0], inv)
    cy = _cell_coords_1d(xyz[:, 1], origin[1], inv)
    cz = _cell_coords_1d(xyz[:, 2], origin[2], inv)
    keys = _hash_cells(cx, cy, cz)
    keys = jnp.where(valid, keys, jnp.int32(_H))  # invalid points sort last
    order = jnp.argsort(keys).astype(jnp.int32)
    keys_sorted = keys[order]
    counts = jax.ops.segment_sum(
        jnp.ones_like(keys, dtype=jnp.int32),
        jnp.minimum(keys, _H),
        num_segments=_H + 1,
    )
    bucket_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1].astype(jnp.int32)]
    )
    # rank occupied buckets; empty buckets inherit a neighboring rank whose
    # row fails the coordinate check at query time
    occupied = (counts[:_H] > 0).astype(jnp.int32)
    rank_of_bucket = jnp.cumsum(occupied) - 1
    rank_table = jnp.concatenate(
        [jnp.maximum(rank_of_bucket, 0), jnp.full((1,), N, jnp.int32)]
    ).astype(jnp.int32)

    # scatter sorted points into [rows+1, cap] flat cell lists
    slot = jnp.arange(N, dtype=jnp.int32)
    b = keys_sorted
    pos = slot - bucket_start[jnp.minimum(b, _H)]
    row = jnp.where(b < _H, rank_table[jnp.minimum(b, _H)], N)
    ok = (b < _H) & (pos < cell_cap)
    flat = jnp.where(ok, row * cell_cap + pos, N * cell_cap)
    size = (N + 1) * cell_cap
    pad = jnp.float32(3.0e18)
    xs, ys, zs = xyz[:, 0][order], xyz[:, 1][order], xyz[:, 2][order]
    cell_x = jnp.full((size,), pad).at[flat].set(xs, mode="drop")
    cell_y = jnp.full((size,), pad).at[flat].set(ys, mode="drop")
    cell_z = jnp.full((size,), pad).at[flat].set(zs, mode="drop")
    cell_ord = jnp.zeros((size,), jnp.int32).at[flat].set(order, mode="drop")
    return HashGrid(
        xyz=xyz,
        valid=valid,
        origin=origin,
        cell_size=cell_size,
        rank_table=rank_table,
        cell_x=cell_x,
        cell_y=cell_y,
        cell_z=cell_z,
        cell_ord=cell_ord,
        cell_cap=cell_cap,
    )


_OFFSETS_LIST = [[i, j, k] for i in (-1, 0, 1) for j in (-1, 0, 1) for k in (-1, 0, 1)]


@partial(jax.jit, static_argnames=("k", "cap", "include_self", "approx"))
def _radius_neighbors_chunk(
    grid: HashGrid,
    q: jax.Array,
    qvalid: jax.Array,
    qidx: jax.Array,
    radius: jax.Array,
    k: int,
    cap: int,
    include_self: bool,
    approx: bool = False,
):
    M = q.shape[0]
    ccap = min(cap, grid.cell_cap)
    inv = 1.0 / jnp.maximum(grid.cell_size, 1e-30)
    qc = [_cell_coords_1d(q[:, d], grid.origin[d], inv) for d in range(3)]  # [M] x3
    offsets = jnp.asarray(_OFFSETS_LIST, jnp.int32)  # [27,3]
    cells = [qc[d][:, None] + offsets[None, :, d] for d in range(3)]  # [M,27] x3
    keys = _hash_cells(cells[0], cells[1], cells[2])  # [M,27]
    rows = grid.rank_table[keys]  # [M,27] cell-list row per neighbor cell

    view = lambda a: a.reshape(-1, grid.cell_cap)[:, :ccap]
    # [M,27,ccap] broadcasting instead of materialized [M,27*ccap] repeats:
    # the jnp.repeat `want` copies alone were ~1 GB at 16k queries x cap 512
    ok = jnp.ones((M, 27, ccap), bool)
    d2 = jnp.zeros((M, 27, ccap), jnp.float32)
    for d, flat in enumerate((grid.cell_x, grid.cell_y, grid.cell_z)):
        cvals = view(flat)[rows]  # ROW gather, [M,27,ccap]
        ok = ok & (
            _cell_coords_1d(cvals, grid.origin[d], inv) == cells[d][:, :, None]
        )
        dd = cvals - q[:, d][:, None, None]
        d2 = d2 + dd * dd
    ok = ok.reshape(M, 27 * ccap)
    d2 = d2.reshape(M, 27 * ccap)

    ok = ok & qvalid[:, None] & (d2 <= radius * radius)
    BIG = jnp.float32(3.0e38)
    if not include_self:
        # self-exclusion by zero distance: exact duplicates are removed at
        # load time (common.cpp:417-427), so only the query itself sits at 0
        ok = ok & (d2 > 0.0)
    d2m = jnp.where(ok, d2, BIG)
    if approx and k < 27 * ccap:
        # TPU-native ApproxTopK (aggregated partial reduce) instead of a full
        # sort: descriptor neighborhoods tolerate a ~5% recall miss at the
        # radius boundary, and the sort dominates the radius pass otherwise.
        # On CPU this lowers to the exact sort, keeping tests deterministic.
        neg2, sel = jax.lax.approx_min_k(d2m, k, recall_target=0.95)
        neg = -neg2
    else:
        neg, sel = jax.lax.top_k(-d2m, k)  # [M,k]
    d2_sel = -neg
    dist = jnp.sqrt(jnp.maximum(d2_sel, 0.0))
    # original ids only for the k winners (tiny gather); index the [M,27]
    # row table by sel//ccap instead of materializing a [M,27*ccap] repeat
    win_row = jnp.take_along_axis(rows, sel // ccap, axis=1)
    win_pos = sel % ccap
    idx = grid.cell_ord[win_row * grid.cell_cap + win_pos]
    # validity from the SELECTED distance (rejected slots carry BIG in d2m):
    # gathering the [M, 27*ccap] ok matrix per winner materialized the
    # whole candidate mask a second time (~0.2 s/side at the 10M shapes)
    mask = (d2_sel <= radius * radius) & qvalid[:, None]
    idx = jnp.where(mask, idx, 0)
    dist = jnp.where(mask, dist, BIG)
    return idx, dist, mask


def radius_neighbors(
    grid: HashGrid,
    queries: jax.Array,
    qvalid: jax.Array,
    radius,
    k: int,
    cap: int = 32,
    include_self: bool = True,
    query_index: jax.Array | None = None,
    chunk: int | None = None,
    approx: bool = False,
):
    """k nearest neighbors within `radius` around each query point.

    The search envelope is the 27-cell neighborhood, so `radius` should be
    <= grid.cell_size for a guaranteed-complete ball (larger radii return the
    envelope-limited approximation, exactly like a capped radiusSearch).

    Returns (idx i32[M,k], dist f32[M,k], mask bool[M,k]) sorted by distance.
    """
    radius = jnp.asarray(radius, jnp.float32)
    M = queries.shape[0]
    if query_index is None:
        query_index = jnp.full((M,), -1, jnp.int32)
    # Auto-chunk only when the candidate matrix would blow past the memory
    # budget.  Chunks are an UNROLLED traced loop: lax.map serializes and
    # defeats fusion (measured 400x slower than inline at 64k queries).
    if chunk is None:
        # a live candidate slot costs ~16 B of transients at once (3 f32
        # coordinate views + the distance matrix + top-k sort copies) —
        # 240M slots ~ 3.8 GB peak per chunk.  300M slots OOMed a 16 GB
        # v5e at 10M queries during the bench's density derivation; the
        # SHOT-stage query (~16k queries x 27 x 512 = 226M slots) now runs
        # UNCHUNKED — the 4-way chunk split cost ~0.25 s of unfused
        # output concats per side at 10M
        budget_slots = 240_000_000
        slots = M * 27 * cap
        if slots > budget_slots:
            n_chunks = -(-slots // budget_slots)
            chunk = -(-M // n_chunks)
            chunk = max(128, ((chunk + 127) // 128) * 128)
    if chunk is None or chunk >= M:
        return _radius_neighbors_chunk(
            grid, queries, qvalid, query_index, radius, k, cap, include_self, approx
        )
    outs = []
    for s in range(0, M, chunk):
        e = min(s + chunk, M)
        pad = chunk - (e - s)
        qq = queries[s:e]
        vv = qvalid[s:e]
        ii = query_index[s:e]
        if pad:
            qq = jnp.concatenate([qq, jnp.full((pad, 3), 3.0e18, qq.dtype)], axis=0)
            vv = jnp.concatenate([vv, jnp.zeros((pad,), bool)], axis=0)
            ii = jnp.concatenate([ii, jnp.full((pad,), -1, jnp.int32)], axis=0)
        outs.append(
            _radius_neighbors_chunk(
                grid, qq, vv, ii, radius, k, cap, include_self, approx
            )
        )
    idx = jnp.concatenate([o[0] for o in outs], axis=0)[:M]
    dist = jnp.concatenate([o[1] for o in outs], axis=0)[:M]
    mask = jnp.concatenate([o[2] for o in outs], axis=0)[:M]
    return idx, dist, mask


def knn(
    grid: HashGrid,
    queries: jax.Array,
    qvalid: jax.Array,
    k: int,
    cap: int = 32,
    include_self: bool = True,
    query_index: jax.Array | None = None,
    chunk: int | None = None,
    approx: bool = False,
):
    """Approximate kNN: the k nearest points inside the 27-cell envelope.

    Choose grid.cell_size so that the expected k-NN radius fits within one
    cell (the caller typically knows the sampling density after a voxel
    downsample, mirroring how the reference picks radii from density at
    matching.h:177-189)."""
    big_r = grid.cell_size * jnp.float32(1.0e6)  # effectively inf inside envelope
    return radius_neighbors(
        grid,
        queries,
        qvalid,
        big_r,
        k,
        cap=cap,
        include_self=include_self,
        query_index=query_index,
        chunk=chunk,
        approx=approx,
    )
