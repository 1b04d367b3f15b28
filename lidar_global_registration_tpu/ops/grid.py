"""Grid-hash fixed-radius neighbor lists: the TPU replacement for kd-trees.

The reference uses pcl::KdTreeFLANN everywhere (radius + kNN search,
include/common.h, matching.h).  Recursive trees are hostile to XLA; instead
we bucket points into a uniform grid keyed by a spatial hash, sort once, and
answer queries by scanning the 27 neighboring cells with a *fixed* per-cell
candidate cap and masking.  This trades exactness at the cap boundary for
static shapes — the same trade the reference makes when it caps ISS radius
searches at `max_neighbors_` (src/pcl/iss_debug.cpp:47-54).

Memory-access design (the perf-critical part):
  - points are physically REORDERED by cell hash at build time (coordinates
    kept as separate sorted x/y/z arrays — structure-of-arrays, since any
    materialized [*, 3] gather pads its last dim to 128 lanes on TPU);
  - a query reads each of its 27 cells as ONE contiguous run of `cap` slots
    (a slice-gather of 27 rows per query), not 27*cap scattered elements;
  - only the final top-k indices translate back to original point ids.

All functions are jit-friendly with static K / cap / chunk sizes.
"""
from __future__ import annotations

from dataclasses import dataclass
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


def _cell_coords_1d(x, origin_d, inv_cell):
    c = jnp.floor((x - origin_d) * inv_cell)
    return jnp.clip(c, -_COORD_CLIP, _COORD_CLIP).astype(jnp.int32)


@jax.tree_util.register_dataclass
@dataclass
class HashGrid:
    """Cell-hash-sorted spatial index over a padded point set."""

    xyz: jax.Array  # f32[N,3] ORIGINAL order (for callers)
    valid: jax.Array  # bool[N]
    origin: jax.Array  # f32[3]
    cell_size: jax.Array  # f32[]
    keys_sorted: jax.Array  # i32[N] sorted bucket keys (invalid -> _H)
    order: jax.Array  # i32[N] original point index per sorted slot
    bucket_start: jax.Array  # i32[_H+1] first sorted slot of each bucket
    xs: jax.Array  # f32[N] coordinates in sorted order (SoA)
    ys: jax.Array
    zs: jax.Array


def build_grid(xyz: jax.Array, valid: jax.Array, cell_size) -> HashGrid:
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
    # O(1)-lookup bucket table: start of bucket b = #keys < b (exclusive
    # cumsum of per-bucket counts) — replaces a 17-step binary search per
    # (query, cell) with one element gather.
    counts = jax.ops.segment_sum(
        jnp.ones_like(keys, dtype=jnp.int32),
        jnp.minimum(keys, _H),
        num_segments=_H + 1,
    )
    bucket_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1].astype(jnp.int32)]
    )
    return HashGrid(
        xyz=xyz,
        valid=valid,
        origin=origin,
        cell_size=cell_size,
        keys_sorted=keys_sorted,
        order=order,
        bucket_start=bucket_start,
        xs=xyz[:, 0][order],
        ys=xyz[:, 1][order],
        zs=xyz[:, 2][order],
    )


_OFFSETS_LIST = [[i, j, k] for i in (-1, 0, 1) for j in (-1, 0, 1) for k in (-1, 0, 1)]


def _gather_runs(arr: jax.Array, starts: jax.Array, cap: int) -> jax.Array:
    """arr f32/i32[N+pad]; starts i32[R] -> [R, cap] contiguous runs.

    One slice-gather per run (TPU-friendly sequential reads) instead of
    R*cap scattered element gathers."""
    return jax.vmap(lambda s: jax.lax.dynamic_slice(arr, (s,), (cap,)))(starts)


@partial(jax.jit, static_argnames=("k", "cap", "include_self"))
def _radius_neighbors_chunk(
    grid: HashGrid,
    q: jax.Array,
    qvalid: jax.Array,
    qidx: jax.Array,
    radius: jax.Array,
    k: int,
    cap: int,
    include_self: bool,
):
    M = q.shape[0]
    N = grid.keys_sorted.shape[0]
    inv = 1.0 / jnp.maximum(grid.cell_size, 1e-30)
    qc = [
        _cell_coords_1d(q[:, d], grid.origin[d], inv) for d in range(3)
    ]  # [M] x3
    offsets = jnp.asarray(_OFFSETS_LIST, jnp.int32)  # [27,3]
    cells = [qc[d][:, None] + offsets[None, :, d] for d in range(3)]  # [M,27] x3
    keys = _hash_cells(cells[0], cells[1], cells[2])  # [M,27]
    starts = grid.bucket_start[keys]  # O(1) lookup
    # slot ids of every candidate: runs expressed as ELEMENT indices
    # (starts + iota) — XLA's element gather is ~6x faster than the
    # dynamic-slice row gather on TPU
    slots = jnp.minimum(
        starts[:, :, None] + jnp.arange(cap, dtype=jnp.int32)[None, None, :], N
    ).reshape(M, 27 * cap)

    big = jnp.float32(3.0e18)
    xs_p = jnp.concatenate([grid.xs, jnp.full((1,), big)])
    ys_p = jnp.concatenate([grid.ys, jnp.full((1,), big)])
    zs_p = jnp.concatenate([grid.zs, jnp.full((1,), big)])

    # candidate filter: the candidate's true cell must equal the intended
    # cell.  This is strictly stronger than a bucket-key check (it also
    # rejects run overflow into the next bucket and hash-aliased cells), so
    # only the 3 coordinate gathers are needed.
    ok = jnp.ones((M, 27 * cap), bool)
    d2 = jnp.zeros((M, 27 * cap), jnp.float32)
    want = [jnp.repeat(cells[d], cap, axis=1) for d in range(3)]  # [M,27*cap]
    for d, arr in enumerate((xs_p, ys_p, zs_p)):
        cvals = arr[slots]
        ok = ok & (_cell_coords_1d(cvals, grid.origin[d], inv) == want[d])
        dd = cvals - q[:, d][:, None]
        d2 = d2 + dd * dd

    ok = ok & qvalid[:, None] & (d2 <= radius * radius)
    BIG = jnp.float32(3.0e38)
    if not include_self:
        # self-exclusion by zero distance: exact duplicates are removed at
        # load time (common.cpp:417-427), so only the query itself sits at 0
        ok = ok & (d2 > 0.0)
    d2m = jnp.where(ok, d2, BIG)
    neg, sel = jax.lax.top_k(-d2m, k)  # [M,k]
    dist = jnp.sqrt(jnp.maximum(-neg, 0.0))
    # gather original ids ONLY for the k winners (tiny gather)
    sel_slots = jnp.take_along_axis(slots, sel, axis=1)
    ord_p = jnp.concatenate([grid.order, jnp.zeros((1,), jnp.int32)])
    idx = ord_p[sel_slots]
    mask = jnp.take_along_axis(ok, sel, axis=1)
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
        budget_slots = 300_000_000  # ~1.2GB f32 per live candidate array
        slots = M * 27 * cap
        if slots > budget_slots:
            n_chunks = -(-slots // budget_slots)
            chunk = -(-M // n_chunks)
            chunk = max(128, ((chunk + 127) // 128) * 128)
    if chunk is None or chunk >= M:
        return _radius_neighbors_chunk(
            grid, queries, qvalid, query_index, radius, k, cap, include_self
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
            _radius_neighbors_chunk(grid, qq, vv, ii, radius, k, cap, include_self)
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
    )
