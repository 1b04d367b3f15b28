"""Grid-hash fixed-radius neighbor lists: the TPU replacement for kd-trees.

The reference uses pcl::KdTreeFLANN everywhere (radius + kNN search,
include/common.h, matching.h).  Recursive trees are hostile to XLA; instead
we bucket points into a uniform grid keyed by a spatial hash, sort once, and
answer queries by scanning the 27 neighboring cells with a *fixed* per-cell
candidate cap and masking.  This trades exactness at the cap boundary for
static shapes and pure gather/sort ops — the same trade the reference makes
when it caps ISS radius searches at `max_neighbors_`
(src/pcl/iss_debug.cpp:47-54).

All functions are jit-friendly with static K / cap / chunk sizes.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

INT32_MAX = jnp.iinfo(jnp.int32).max
_COORD_CLIP = 1 << 20  # cell coordinates clipped here before hashing


def _hash_cells(cx, cy, cz):
    """Classic 3-prime spatial hash onto int32 (collisions only add
    distance-filtered candidates; they never drop true neighbors of a cell
    unless two colliding cells overflow the shared candidate budget)."""
    h = (
        cx * jnp.int32(73856093)
        ^ cy * jnp.int32(19349663)
        ^ cz * jnp.int32(83492791)
    )
    # Reserve INT32_MAX for invalid entries.
    return jnp.where(h == INT32_MAX, jnp.int32(INT32_MAX - 1), h)


def _cell_coords(xyz, origin, inv_cell):
    c = jnp.floor((xyz - origin) * inv_cell)
    c = jnp.clip(c, -_COORD_CLIP, _COORD_CLIP).astype(jnp.int32)
    return c


@jax.tree_util.register_dataclass
@dataclass
class HashGrid:
    """Sorted spatial hash over a padded point set."""

    xyz: jax.Array  # f32[N,3] original points (padding = huge sentinel)
    valid: jax.Array  # bool[N]
    origin: jax.Array  # f32[3]
    cell_size: jax.Array  # f32[]
    keys_sorted: jax.Array  # i32[N] sorted hash keys (invalid -> INT32_MAX)
    order: jax.Array  # i32[N] point index per sorted slot


def build_grid(xyz: jax.Array, valid: jax.Array, cell_size) -> HashGrid:
    cell_size = jnp.asarray(cell_size, jnp.float32)
    big = jnp.float32(3.0e37)
    masked = jnp.where(valid[:, None], xyz, big)
    origin = jnp.min(masked, axis=0)
    origin = jnp.where(jnp.isfinite(origin), origin, 0.0) - 0.5 * cell_size
    inv = 1.0 / jnp.maximum(cell_size, 1e-30)
    c = _cell_coords(xyz, origin, inv)
    keys = _hash_cells(c[:, 0], c[:, 1], c[:, 2])
    keys = jnp.where(valid, keys, INT32_MAX)
    order = jnp.argsort(keys).astype(jnp.int32)
    keys_sorted = keys[order]
    return HashGrid(
        xyz=xyz,
        valid=valid,
        origin=origin,
        cell_size=cell_size,
        keys_sorted=keys_sorted,
        order=order,
    )


_OFFSETS = jnp.array(
    [[i, j, k] for i in (-1, 0, 1) for j in (-1, 0, 1) for k in (-1, 0, 1)],
    jnp.int32,
)  # [27, 3]


def _candidates_for(grid: HashGrid, q: jax.Array, cap: int):
    """Candidate point indices from the 27 cells around each query.

    q: f32[M,3].  Returns (cand i32[M, 27*cap], ok bool[M, 27*cap]).
    """
    inv = 1.0 / jnp.maximum(grid.cell_size, 1e-30)
    cq = _cell_coords(q, grid.origin, inv)  # [M,3]
    cells = cq[:, None, :] + _OFFSETS[None, :, :]  # [M,27,3]
    keys = _hash_cells(cells[..., 0], cells[..., 1], cells[..., 2])  # [M,27]
    start = jnp.searchsorted(grid.keys_sorted, keys, side="left").astype(jnp.int32)
    N = grid.keys_sorted.shape[0]
    slots = start[..., None] + jnp.arange(cap, dtype=jnp.int32)  # [M,27,cap]
    in_range = slots < N
    slots_c = jnp.minimum(slots, N - 1)
    slot_keys = grid.keys_sorted[slots_c]
    ok = in_range & (slot_keys == keys[..., None])
    cand = grid.order[slots_c]
    M = q.shape[0]
    cand = cand.reshape(M, -1)
    ok = ok.reshape(M, -1)
    # Hash collisions can alias two of the 27 offset cells onto one sorted
    # segment, duplicating candidates; require the candidate's true cell to
    # equal the intended cell.  Gather PER COORDINATE: a [M, 27*cap, 3]
    # intermediate would tile its 3-wide last dim to 128 lanes on TPU (42x
    # memory blowup — a 64k-query pass compiles to a >20GB buffer).
    for d in range(3):
        cd = jnp.floor((grid.xyz[:, d][cand] - grid.origin[d]) * inv)
        cd = jnp.clip(cd, -_COORD_CLIP, _COORD_CLIP).astype(jnp.int32)
        want_d = jnp.repeat(cells[..., d], cap, axis=1)
        ok = ok & (cd == want_d)
    return cand, ok


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
    cand, ok = _candidates_for(grid, q, cap)  # [m, 27*cap]
    # per-coordinate distance accumulation (see the layout note above)
    d2 = jnp.zeros(cand.shape, jnp.float32)
    for d in range(3):
        dd = grid.xyz[:, d][cand] - q[:, d][:, None]
        d2 = d2 + dd * dd
    ok = ok & (d2 <= radius * radius) & qvalid[:, None]
    if not include_self:
        ok = ok & (cand != qidx[:, None])
    big = jnp.float32(3.0e38)
    d2m = jnp.where(ok, d2, big)
    # k nearest among candidates
    neg, sel = jax.lax.top_k(-d2m, k)  # [m,k]
    dist = jnp.sqrt(jnp.maximum(-neg, 0.0))
    idx = jnp.take_along_axis(cand, sel, axis=1)
    mask = jnp.take_along_axis(ok, sel, axis=1)
    idx = jnp.where(mask, idx, 0)
    dist = jnp.where(mask, dist, big)
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
    if chunk is None or chunk >= M:
        return _radius_neighbors_chunk(
            grid, queries, qvalid, query_index, radius, k, cap, include_self
        )
    pad = (-M) % chunk
    if pad:
        queries = jnp.concatenate(
            [queries, jnp.full((pad, 3), 3.0e18, queries.dtype)], axis=0
        )
        qvalid = jnp.concatenate([qvalid, jnp.zeros((pad,), bool)], axis=0)
        query_index = jnp.concatenate(
            [query_index, jnp.full((pad,), -1, jnp.int32)], axis=0
        )
    qs = queries.reshape(-1, chunk, 3)
    vs = qvalid.reshape(-1, chunk)
    ix = query_index.reshape(-1, chunk)

    def body(args):
        qq, vv, ii = args
        return _radius_neighbors_chunk(grid, qq, vv, ii, radius, k, cap, include_self)

    idx, dist, mask = jax.lax.map(body, (qs, vs, ix))
    return (
        idx.reshape(-1, k)[:M],
        dist.reshape(-1, k)[:M],
        mask.reshape(-1, k)[:M],
    )


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
