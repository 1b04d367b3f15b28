"""Weighted voxel-grid downsampling as sort + segment-sum.

Behavioral match of the reference accumulator (include/downsample.h:6-30,
src/downsample.cpp:5-41): each voxel averages weight-scaled positions and
normals, the accumulated weight is stored back per point and *compounds*
across repeated downsampling.  The reference's unordered_map becomes a
lexicographic sort over integer voxel coordinates followed by segment sums —
deterministic, O(N log N), and entirely on-device.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from lidar_global_registration_tpu.types import Cloud

_COORD_CLIP = (1 << 24) - 1


def _centroids_sorted(xyz, valid, voxel_size, fill):
    """Shared body of voxel_centroids / voxel_centroids_map: lexsorted
    voxel segments + per-segment xyz average.  Returns
    (out_xyz, out_valid, order, seg) — callers discard order/seg or build
    the row map from them."""
    voxel = jnp.asarray(voxel_size, jnp.float32)
    N = xyz.shape[0]
    big = jnp.float32(3.0e37)
    masked = jnp.where(valid[:, None], xyz, big)
    minb = jnp.min(masked, axis=0)
    minb = jnp.where(jnp.isfinite(minb), minb, 0.0)
    origin = minb - 0.5 * voxel
    ref = (xyz - origin) / jnp.maximum(voxel, 1e-30)
    c = jnp.clip(jnp.floor(ref), 0, _COORD_CLIP).astype(jnp.int32)
    cx = jnp.where(valid, c[:, 0], _COORD_CLIP + 1)
    cy = jnp.where(valid, c[:, 1], _COORD_CLIP + 1)
    cz = jnp.where(valid, c[:, 2], _COORD_CLIP + 1)
    order = jnp.lexsort((cx, cy, cz)).astype(jnp.int32)
    sx, sy, sz = cx[order], cy[order], cz[order]
    svalid = valid[order]
    first = jnp.concatenate(
        [
            jnp.ones((1,), bool),
            (sx[1:] != sx[:-1]) | (sy[1:] != sy[:-1]) | (sz[1:] != sz[:-1]),
        ]
    )
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1
    w = svalid.astype(jnp.float32)
    xyz_s = xyz[order] * w[:, None]
    acc_w = jax.ops.segment_sum(w, seg, num_segments=N)
    acc_xyz = jax.ops.segment_sum(xyz_s, seg, num_segments=N)
    out_valid = acc_w > 0
    out_xyz = jnp.where(
        out_valid[:, None],
        acc_xyz / jnp.maximum(acc_w, 1e-30)[:, None],
        fill,
    )
    return out_xyz, out_valid, order, seg


@jax.jit
def voxel_centroids(xyz, valid, voxel_size):
    """xyz-only voxel average (the loader's fine pre-downsample shape:
    fresh clouds, unit weights, no normals yet — downsample.cpp:5-41
    semantics minus the weight/normal accumulators the result never
    reads).  Returns (xyz [N,3], valid [N], count i32[]) in segment
    order; ~40% less gather/segment work than voxel_downsample on
    clouds whose normals are all zero."""
    out_xyz, out_valid, _, _ = _centroids_sorted(
        xyz, valid, voxel_size, Cloud.PAD_COORD
    )
    return out_xyz, out_valid, jnp.sum(out_valid.astype(jnp.int32))


@jax.jit
def voxel_centroids_map(xyz, valid, voxel_size):
    """voxel_centroids + an input-row -> output-row map.

    Returns (out_xyz f32[N,3], out_valid bool[N], row_of i32[N],
    n_valid i32[]).  `row_of[i]` is the output row holding the centroid
    of input row i's voxel (only meaningful where valid[i]); output rows
    are the voxel segments compacted to the front in key order.  Invalid
    output rows hold 0.0 (NOT Cloud.PAD_COORD: the cell-grid planner
    masks by `valid`, and a 1e18 sentinel would not survive intermediate
    arithmetic everywhere).

    This is the per-scale descriptor surface of the reference's pyramid
    (matching.h:229-261: downsample to voxel = sqrt(pi r^2/n), recompute
    normals, compute descriptors there); `row_of` snaps each keypoint to
    its voxel's centroid row so descriptors can be gathered per keypoint
    without a neighbor search."""
    out_xyz, out_valid, order, seg = _centroids_sorted(
        xyz, valid, voxel_size, 0.0
    )
    N = xyz.shape[0]
    row_of = jnp.zeros((N,), jnp.int32).at[order].set(seg)
    return out_xyz, out_valid, row_of, jnp.sum(out_valid.astype(jnp.int32))


def _suffix_reduce_runs(ks, arrays, cap: int = 64, live=None):
    """Segmented suffix-sum over sorted equal-key runs by prefix doubling:
    after the d-th doubling each row holds the sum of its run's elements in
    [i, i + 2^d); at a run's FIRST row that is the run total once 2^d
    reaches the run length.  The static unroll is capped at `cap` levels —
    fine-voxel occupancy is ~4-30 in practice, so the deeper levels are
    pure dead bandwidth (measured 2x: 122 -> 62 ms at 10.5M rows on a
    v5e, tools/profile_predown.py) — with a lax.cond tail that runs the
    remaining levels only when some run is actually longer than `cap`
    (the predicate is exact: any row `cap` apart with an equal key).

    `live` (bool[N], optional) marks rows whose run totals the caller will
    actually read; runs of dead rows never trigger the tail.  This matters
    on padded clouds: every invalid row shares ONE sentinel-key run that is
    always deeper than `cap`, but its contributions are zero — without the
    mask the tail would fire on every padded input.  Cross-run adds are
    impossible at any depth (keys differ at run boundaries), so skipping
    levels for dead runs never corrupts live ones.
    """
    N = ks.shape[0]

    def level(args, d):
        same = jnp.concatenate([ks[d:] == ks[:-d], jnp.zeros((d,), bool)])

        def _sh(a, d=d):
            return jnp.concatenate([a[d:], jnp.zeros((d,), a.dtype)])

        return tuple(
            a + jnp.where(same, _sh(a), jnp.zeros((), a.dtype))
            for a in args
        )

    args = tuple(arrays)
    d = 1
    while d < min(N, cap):
        args = level(args, d)
        d *= 2
    if d < N:
        same_d = ks[d:] == ks[:-d]
        if live is not None:
            same_d = same_d & live[:-d]
        deeper = jnp.any(same_d)

        def tail(a, d0=d):
            dd = d0
            while dd < N:
                a = level(a, dd)
                dd *= 2
            return a

        args = jax.lax.cond(deeper, tail, lambda a: a, args)
    return args


@partial(jax.jit, static_argnames=("bits",))
def voxel_centroids_map_packed(xyz, valid, voxel_size, bits):
    """voxel_centroids_map semantics at voxel_centroids_packed speed.

    Same contract as voxel_centroids_map — (out_xyz f32[N,3], out_valid
    bool[N], row_of i32[N], n_valid i32[]) with centroid rows compacted to
    the front in z-major key order and invalid rows holding 0.0 — but the
    voxel coordinate is packed into ONE int32 sort key (static per-axis
    `bits`, host-derived from a scene AABB upper bound) and each run is
    reduced with the occupancy-capped segmented suffix-sum instead of the
    3-key lexsort + segment_sum formulation (measured 1.83 s -> ~0.06 s at
    10.5M rows on a v5e, tools/profile_predown.py).

    The grid ORIGIN is still the cloud's own masked min - voxel/2, exactly
    like voxel_centroids_map / the reference's VoxelGrid anchor
    (downsample.cpp:5-41) — `bits` only has to be an upper bound on the
    per-axis cell counts, so sizing it from a larger enclosing AABB (the
    raw pair bounds pre_downsample_pair already pulled) is safe: the
    working cloud's extent from its own min never exceeds the raw extent.
    """
    bx, by, bz = bits
    voxel = jnp.asarray(voxel_size, jnp.float32)
    N = xyz.shape[0]
    big = jnp.float32(3.0e37)
    masked = jnp.where(valid[:, None], xyz, big)
    minb = jnp.min(masked, axis=0)
    minb = jnp.where(jnp.isfinite(minb), minb, 0.0)
    origin = minb - 0.5 * voxel
    ref = (xyz - origin[None, :]) / jnp.maximum(voxel, 1e-30)
    cf = jnp.floor(ref)
    cx = jnp.clip(cf[:, 0], 0, (1 << bx) - 1).astype(jnp.int32)
    cy = jnp.clip(cf[:, 1], 0, (1 << by) - 1).astype(jnp.int32)
    cz = jnp.clip(cf[:, 2], 0, (1 << bz) - 1).astype(jnp.int32)
    # z-major like voxel_centroids' lexsort((cx, cy, cz)) (last key is
    # primary), so both map paths emit voxels in the SAME order
    key = (cz << (by + bx)) | (cy << bx) | cx
    key = jnp.where(valid, key, jnp.int32(1 << 30))
    iota = jnp.arange(N, dtype=jnp.int32)
    ks, sx, sy, sz, sid = jax.lax.sort(
        (key, xyz[:, 0], xyz[:, 1], xyz[:, 2], iota), num_keys=1)
    svalid = ks < (1 << 30)
    kxf = (ks & ((1 << bx) - 1)).astype(jnp.float32)
    kyf = ((ks >> bx) & ((1 << by) - 1)).astype(jnp.float32)
    kzf = ((ks >> (bx + by)) & ((1 << bz) - 1)).astype(jnp.float32)
    bxr = origin[0] + kxf * voxel
    byr = origin[1] + kyf * voxel
    bzr = origin[2] + kzf * voxel
    w = svalid.astype(jnp.float32)
    rx = (sx - bxr) * w
    ry = (sy - byr) * w
    rz = (sz - bzr) * w
    w, rx, ry, rz = _suffix_reduce_runs(ks, (w, rx, ry, rz), live=svalid)
    first = jnp.concatenate([jnp.ones((1,), bool), ks[1:] != ks[:-1]])
    # the invalid sentinel run sorts LAST, so valid runs' seg ids are the
    # contiguous front 0..n-1 — exactly voxel_centroids_map's compaction
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1
    outv_runs = first & svalid
    n_out = jnp.sum(outv_runs.astype(jnp.int32))
    inv = 1.0 / jnp.maximum(w, 1e-30)
    cent = jnp.stack([bxr + rx * inv, byr + ry * inv, bzr + rz * inv], -1)
    dest = jnp.where(outv_runs, seg, N)
    out_xyz = jnp.zeros((N, 3), jnp.float32).at[dest].set(cent, mode="drop")
    out_valid = iota < n_out
    row_of = jnp.zeros((N,), jnp.int32).at[
        jnp.where(svalid, sid, N)
    ].set(seg, mode="drop")
    return out_xyz, out_valid, row_of, n_out


@partial(jax.jit, static_argnames=("bits",))
def voxel_centroids_packed(xyz, valid, voxel_size, origin, bits):
    """voxel_centroids with the voxel coordinate packed into ONE int32
    sort key (static per-axis bit widths, like the cell-grid planner's
    _lex_keys), carrying x/y/z through the sort as payload and reducing
    each voxel's run with a segmented suffix-sum by prefix doubling —
    no gather-by-order, no scatter.  Measured on a v5e at 10.5M rows the
    old sort+(order gather)+segment_sum formulation cost 1.22 s of which
    the sort itself was only 0.05 s; the doubling reduce is ~log2(N)
    fused elementwise passes (tools/profile_predown.py).

    `origin` is the precomputed `min - voxel/2` bound (host-derived from
    a pulled AABB, which also sized `bits`).  Coordinates are summed as
    residuals against the voxel base decoded from the sort key, so the
    summation error is ~ulp(voxel), independent of scene extent.

    Output rows sit at each voxel run's FIRST sorted position (key
    order, NOT compacted to the front); `out_valid` marks them and the
    caller compacts (flagship._compact_xyz).  Ref: downsample.cpp:5-41.
    """
    bx, by, bz = bits
    voxel = jnp.asarray(voxel_size, jnp.float32)
    N = xyz.shape[0]
    ref = (xyz - origin[None, :]) / jnp.maximum(voxel, 1e-30)
    cf = jnp.floor(ref)
    cx = jnp.clip(cf[:, 0], 0, (1 << bx) - 1).astype(jnp.int32)
    cy = jnp.clip(cf[:, 1], 0, (1 << by) - 1).astype(jnp.int32)
    cz = jnp.clip(cf[:, 2], 0, (1 << bz) - 1).astype(jnp.int32)
    # z-major like voxel_centroids' lexsort((cx, cy, cz)) (last key is
    # primary), so both paths emit voxels in the SAME order
    key = (cz << (by + bx)) | (cy << bx) | cx
    key = jnp.where(valid, key, jnp.int32(1 << 30))
    ks, sx, sy, sz = jax.lax.sort(
        (key, xyz[:, 0], xyz[:, 1], xyz[:, 2]), num_keys=1)
    svalid = ks < (1 << 30)
    # voxel base from the key: residuals live in [0, voxel)
    kx = (ks & ((1 << bx) - 1)).astype(jnp.float32)
    ky = ((ks >> bx) & ((1 << by) - 1)).astype(jnp.float32)
    kz = ((ks >> (bx + by)) & ((1 << bz) - 1)).astype(jnp.float32)
    bxr = origin[0] + kx * voxel
    byr = origin[1] + ky * voxel
    bzr = origin[2] + kz * voxel
    w = svalid.astype(jnp.float32)
    rx = (sx - bxr) * w
    ry = (sy - byr) * w
    rz = (sz - bzr) * w
    # segmented suffix-sum: s_i += s_{i+d} while key[i+d]==key[i]; at a
    # run's first row that is the run total (runs are contiguous
    # equal-key spans).  Invalid rows share one tail run with w=0
    # contributions.  Doubling depth is occupancy-capped (see helper).
    w, rx, ry, rz = _suffix_reduce_runs(ks, (w, rx, ry, rz), live=svalid)
    first = jnp.concatenate([jnp.ones((1,), bool), ks[1:] != ks[:-1]])
    out_valid = first & svalid
    inv = 1.0 / jnp.maximum(w, 1e-30)
    out_xyz = jnp.where(
        out_valid[:, None],
        jnp.stack([bxr + rx * inv, byr + ry * inv, bzr + rz * inv], -1),
        Cloud.PAD_COORD,
    )
    return out_xyz, out_valid, jnp.sum(out_valid.astype(jnp.int32))


@partial(jax.jit, static_argnames=())
def voxel_downsample(cloud: Cloud, voxel_size) -> Cloud:
    """Downsample into the same capacity (valid mask shrinks).

    Matches downsample.cpp:5-41: voxel_min_bound = min - voxel/2,
    voxel index = floor((p - voxel_min_bound) / voxel); per-voxel averages are
    weighted by the accumulated point weights.
    """
    voxel = jnp.asarray(voxel_size, jnp.float32)
    N = cloud.capacity
    big = jnp.float32(3.0e37)
    masked = jnp.where(cloud.valid[:, None], cloud.xyz, big)
    minb = jnp.min(masked, axis=0)
    minb = jnp.where(jnp.isfinite(minb), minb, 0.0)
    origin = minb - 0.5 * voxel

    ref = (cloud.xyz - origin) / jnp.maximum(voxel, 1e-30)
    c = jnp.clip(jnp.floor(ref), 0, _COORD_CLIP).astype(jnp.int32)
    # Invalid points sort last.
    cx = jnp.where(cloud.valid, c[:, 0], _COORD_CLIP + 1)
    cy = jnp.where(cloud.valid, c[:, 1], _COORD_CLIP + 1)
    cz = jnp.where(cloud.valid, c[:, 2], _COORD_CLIP + 1)

    order = jnp.lexsort((cx, cy, cz)).astype(jnp.int32)
    sx, sy, sz = cx[order], cy[order], cz[order]
    svalid = cloud.valid[order]

    first = jnp.concatenate(
        [
            jnp.ones((1,), bool),
            (sx[1:] != sx[:-1]) | (sy[1:] != sy[:-1]) | (sz[1:] != sz[:-1]),
        ]
    )
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1  # [N] segment id per sorted slot
    # Segments made of invalid points must not produce output.
    seg_valid_contrib = svalid

    w = cloud.weight[order] * seg_valid_contrib
    xyz_s = cloud.xyz[order] * w[:, None]
    nrm_s = cloud.normal[order] * w[:, None]

    acc_w = jax.ops.segment_sum(w, seg, num_segments=N)
    acc_xyz = jax.ops.segment_sum(xyz_s, seg, num_segments=N)
    acc_nrm = jax.ops.segment_sum(nrm_s, seg, num_segments=N)
    # A segment is a real voxel iff its first sorted member is valid.
    seg_is_valid = jax.ops.segment_max(
        seg_valid_contrib.astype(jnp.int32), seg, num_segments=N
    ).astype(bool)

    wsafe = jnp.maximum(acc_w, 1e-30)
    out_xyz = acc_xyz / wsafe[:, None]
    out_nrm = acc_nrm / wsafe[:, None]
    # Reference GetAveragePoint: normalize unless the norm is ~0
    # (downsample.h:21-24: norm < 1e-5 -> divide by 1).
    nn = jnp.sqrt(jnp.sum(out_nrm * out_nrm, axis=-1, keepdims=True))
    out_nrm = out_nrm / jnp.where(nn < 1e-5, 1.0, nn)

    out_valid = seg_is_valid & (acc_w > 0)
    out_xyz = jnp.where(out_valid[:, None], out_xyz, Cloud.PAD_COORD)
    return Cloud(
        xyz=out_xyz,
        normal=jnp.where(out_valid[:, None], out_nrm, 0.0),
        weight=jnp.where(out_valid, acc_w, 0.0),
        curvature=jnp.zeros((N,), jnp.float32),
        valid=out_valid,
    )


def filter_duplicate_points(cloud: Cloud) -> Cloud:
    """Exact-duplicate removal (reference: common.cpp:417-427).

    Keeps the first occurrence of each exact xyz triple.  Sort-based; the
    output is re-packed to the front (host-free, same capacity).
    """
    N = cloud.capacity
    x, y, z = cloud.xyz[:, 0], cloud.xyz[:, 1], cloud.xyz[:, 2]
    # Sort by (z, y, x, original index) so the first occurrence wins.
    idx0 = jnp.arange(N, dtype=jnp.int32)
    xk = jnp.where(cloud.valid, x, jnp.float32(jnp.inf))
    yk = jnp.where(cloud.valid, y, jnp.float32(jnp.inf))
    zk = jnp.where(cloud.valid, z, jnp.float32(jnp.inf))
    order = jnp.lexsort((idx0, xk, yk, zk)).astype(jnp.int32)
    sx, sy, sz = xk[order], yk[order], zk[order]
    sv = cloud.valid[order]
    first = jnp.concatenate(
        [
            jnp.ones((1,), bool),
            (sx[1:] != sx[:-1]) | (sy[1:] != sy[:-1]) | (sz[1:] != sz[:-1]),
        ]
    )
    keep = first & sv
    # Stable re-pack of kept entries to the front.
    pos = jnp.cumsum(keep.astype(jnp.int32)) - 1
    dest = jnp.where(keep, pos, N - 1)
    gather = jnp.zeros((N,), jnp.int32).at[dest].set(order, mode="drop")
    n_keep = jnp.sum(keep.astype(jnp.int32))
    out_valid = jnp.arange(N, dtype=jnp.int32) < n_keep

    def take(a, fill):
        g = a[gather]
        if a.ndim == 1:
            return jnp.where(out_valid, g, fill)
        return jnp.where(out_valid[:, None], g, fill)

    return Cloud(
        xyz=take(cloud.xyz, Cloud.PAD_COORD),
        normal=take(cloud.normal, 0.0),
        weight=take(cloud.weight, 0.0),
        curvature=take(cloud.curvature, 0.0),
        valid=out_valid,
    )


def aabb(cloud: Cloud):
    """Masked axis-aligned bounding box (reference: common.h:266-286)."""
    big = jnp.float32(3.0e37)
    lo = jnp.min(jnp.where(cloud.valid[:, None], cloud.xyz, big), axis=0)
    hi = jnp.max(jnp.where(cloud.valid[:, None], cloud.xyz, -big), axis=0)
    return lo, hi


def aabb_diagonal(cloud: Cloud):
    lo, hi = aabb(cloud)
    return jnp.sqrt(jnp.sum((hi - lo) ** 2))


def replace(cloud: Cloud, **kw) -> Cloud:
    return dataclasses.replace(cloud, **kw)
