"""Measure candidate formulations of the 10.5M-point loader pre-downsample.

The sort-based voxel_centroids_packed costs ~1.2 s/side at 10.5M rows on a
v5e; this script times the primitive alternatives so the choice is
measured, not guessed:

  sort    — current: single-key lax.sort (key, iota) + gather + segment_sum
  scatter — scatter-add xyz/w into a dense [H] voxel table (H = packed key
            space capped by a column-local z offset), then compact
  seg     — segment_sum keyed directly by the packed key into H segments

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/profile_predown.py [N]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_485_760

rng = np.random.default_rng(0)
extent = 30.0 * np.sqrt(N / 2**20)
xyz_h = np.empty((N, 3), np.float32)
xyz_h[:, 0] = rng.uniform(0, extent, N)
xyz_h[:, 1] = rng.uniform(0, extent, N)
xyz_h[:, 2] = rng.uniform(0, 3.0, N)  # 2.5D terrain-like
voxel = 0.177
bx = by = int(np.ceil(np.log2(extent / voxel + 3)))
bz = int(np.ceil(np.log2(3.0 / voxel + 3)))
print(f"N={N} extent={extent:.1f} bits=({bx},{by},{bz}) "
      f"keyspace=2^{bx+by+bz}")

xyz = jnp.asarray(xyz_h)
valid = jnp.ones((N,), bool)


def _pull(out):
    # axon's block_until_ready returns early; force a host transfer of one
    # scalar derived from every output leaf so the timing is honest
    leaves = jax.tree_util.tree_leaves(out)
    s = sum(jnp.sum(jnp.ravel(leaf)[-3:].astype(jnp.float32))
            for leaf in leaves)
    return float(s)


def timeit(label, fn, *args):
    out = _pull(fn(*args))  # compile
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = _pull(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{label:28s} {min(ts)*1e3:9.1f} ms")
    return out


@jax.jit
def keys_of(xyz, valid):
    cf = jnp.floor(xyz / voxel)
    cx = jnp.clip(cf[:, 0], 0, (1 << bx) - 1).astype(jnp.int32)
    cy = jnp.clip(cf[:, 1], 0, (1 << by) - 1).astype(jnp.int32)
    cz = jnp.clip(cf[:, 2], 0, (1 << bz) - 1).astype(jnp.int32)
    key = (cz << (by + bx)) | (cy << bx) | cx
    return jnp.where(valid, key, jnp.int32(1 << 30))


@jax.jit
def sort_based(xyz, valid):
    key = keys_of(xyz, valid)
    iota = jnp.arange(N, dtype=jnp.int32)
    ks, order = jax.lax.sort((key, iota), num_keys=1)
    svalid = ks < (1 << 30)
    first = jnp.concatenate([jnp.ones((1,), bool), ks[1:] != ks[:-1]])
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1
    w = svalid.astype(jnp.float32)
    xyz_s = xyz[order] * w[:, None]
    acc_w = jax.ops.segment_sum(w, seg, num_segments=N)
    acc_xyz = jax.ops.segment_sum(xyz_s, seg, num_segments=N)
    return acc_xyz, acc_w


@jax.jit
def sort_only(xyz, valid):
    key = keys_of(xyz, valid)
    iota = jnp.arange(N, dtype=jnp.int32)
    return jax.lax.sort((key, iota), num_keys=1)


H = 1 << (bx + by + bz)


@jax.jit
def scatter_based(xyz, valid):
    key = keys_of(xyz, valid)
    k = jnp.where(valid, key, H - 1)
    w = valid.astype(jnp.float32)
    acc_w = jnp.zeros((H,), jnp.float32).at[k].add(w, mode="drop")
    acc_x = jnp.zeros((H,), jnp.float32).at[k].add(xyz[:, 0] * w, mode="drop")
    acc_y = jnp.zeros((H,), jnp.float32).at[k].add(xyz[:, 1] * w, mode="drop")
    acc_z = jnp.zeros((H,), jnp.float32).at[k].add(xyz[:, 2] * w, mode="drop")
    return acc_x, acc_y, acc_z, acc_w


@jax.jit
def seg_based(xyz, valid):
    key = keys_of(xyz, valid)
    k = jnp.where(valid, key, H - 1)
    w = valid.astype(jnp.float32)
    acc_w = jax.ops.segment_sum(w, k, num_segments=H)
    acc_xyz = jax.ops.segment_sum(xyz * w[:, None], k, num_segments=H)
    return acc_xyz, acc_w


@jax.jit
def sort4_only(xyz, valid):
    key = keys_of(xyz, valid)
    return jax.lax.sort(
        (key, xyz[:, 0], xyz[:, 1], xyz[:, 2]), num_keys=1)


@jax.jit
def sort4_cumsum(xyz, valid):
    """Sort carrying xyz as payload, then per-voxel means via cumsum +
    boundary differencing (no gather-by-order, no scatter)."""
    key = keys_of(xyz, valid)
    ks, sx, sy, sz = jax.lax.sort(
        (key, xyz[:, 0], xyz[:, 1], xyz[:, 2]), num_keys=1)
    svalid = ks < (1 << 30)
    first = jnp.concatenate([jnp.ones((1,), bool), ks[1:] != ks[:-1]])
    last = jnp.concatenate([ks[1:] != ks[:-1], jnp.ones((1,), bool)])
    w = svalid.astype(jnp.float32)
    cw = jnp.cumsum(w)
    cx = jnp.cumsum(sx * w)
    cy = jnp.cumsum(sy * w)
    cz = jnp.cumsum(sz * w)
    n = ks.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    # index of my segment's last row: reverse cummin of (i at last rows)
    endi = jnp.where(last, iota, n - 1)
    endi = jax.lax.cummin(endi, reverse=True)
    # total over my segment, evaluated at first rows
    prev = jnp.where(iota > 0, iota - 1, 0)
    base_w = jnp.where(iota > 0, cw[prev], 0.0)
    base_x = jnp.where(iota > 0, cx[prev], 0.0)
    base_y = jnp.where(iota > 0, cy[prev], 0.0)
    base_z = jnp.where(iota > 0, cz[prev], 0.0)
    tw = cw[endi] - base_w
    tx = cx[endi] - base_x
    ty = cy[endi] - base_y
    tz = cz[endi] - base_z
    outv = first & svalid
    inv = 1.0 / jnp.maximum(tw, 1e-30)
    ox = jnp.where(outv, tx * inv, 3.0e37)
    oy = jnp.where(outv, ty * inv, 3.0e37)
    oz = jnp.where(outv, tz * inv, 3.0e37)
    return ox, oy, oz, outv, jnp.sum(outv.astype(jnp.int32))


_ONLY = os.environ.get("LGR_PROF_ONLY", "")


def _want(name):
    return not _ONLY or name in _ONLY.split(",")


print(f"scatter table H=2^{bx+by+bz} = {H/1e6:.1f}M slots "
      f"({H*16/2**30:.2f} GiB f32 x4)")
if _want("keys"):
    timeit("keys only", keys_of, xyz, valid)
if _want("sort"):
    timeit("sort only (key,iota)", sort_only, xyz, valid)
if _want("sort4"):
    timeit("sort4 (key,x,y,z)", sort4_only, xyz, valid)
if _want("cumsum"):
    timeit("sort4 + cumsum bounds", sort4_cumsum, xyz, valid)
if _want("segsum"):
    timeit("sort + gather + segsum", sort_based, xyz, valid)
if _want("dense"):
    if H * 16 <= 256 * 2**20:
        # [H,3] f32 pads (8,128)-tiles 42.7x on TPU: only worth it tiny
        timeit("scatter-add dense table", scatter_based, xyz, valid)
        timeit("segment_sum dense table", seg_based, xyz, valid)
    else:
        print("dense table too big, skipping scatter/seg variants")

if _want("cumsum") and _want("segsum"):
    # correctness cross-check of the cumsum variant vs the segsum reference
    ox, oy, oz, outv, cnt = jax.jit(sort4_cumsum)(xyz, valid)
    axyz, aw = jax.jit(sort_based)(xyz, valid)
    ref_v = np.asarray(aw > 0)
    ref_c = np.asarray(axyz)[ref_v] / np.asarray(aw)[ref_v, None]
    got_v = np.asarray(outv)
    got = np.stack(
        [np.asarray(ox), np.asarray(oy), np.asarray(oz)], -1)[got_v]
    assert got.shape == ref_c.shape, (got.shape, ref_c.shape)
    # both orders are key-sorted, so rows align
    err = np.abs(np.sort(got, axis=0) - np.sort(ref_c, axis=0)).max()
    print(f"cumsum-vs-segsum centroid max |err| = {err:.2e} "
          f"over {len(got)} voxels")


# production path: the real voxel_centroids_packed at this N
from lidar_global_registration_tpu.ops.downsample import (  # noqa: E402
    voxel_centroids_packed,
)

origin = jnp.asarray([-voxel / 2, -voxel / 2, -voxel / 2], jnp.float32)
prod = jax.jit(lambda x, v: voxel_centroids_packed(
    x, v, jnp.float32(voxel), origin, (bx, by, bz)))
if _want("packed"):
    timeit("voxel_centroids_packed", prod, xyz, valid)


@jax.jit
def packed_capped(xyz, valid):
    """voxel_centroids_packed with the suffix-doubling capped at 64 and a
    lax.cond tail for the (rare) deeper runs: typical fine-voxel occupancy
    is ~16, so levels 64..N are dead bandwidth in the static unroll."""
    key = keys_of(xyz, valid)
    ks, sx, sy, sz = jax.lax.sort(
        (key, xyz[:, 0], xyz[:, 1], xyz[:, 2]), num_keys=1)
    svalid = ks < (1 << 30)
    kx = (ks & ((1 << bx) - 1)).astype(jnp.float32)
    ky = ((ks >> bx) & ((1 << by) - 1)).astype(jnp.float32)
    kz = ((ks >> (bx + by)) & ((1 << bz) - 1)).astype(jnp.float32)
    bxr = kx * voxel - voxel / 2
    byr = ky * voxel - voxel / 2
    bzr = kz * voxel - voxel / 2
    w = svalid.astype(jnp.float32)
    rx = (sx - bxr) * w
    ry = (sy - byr) * w
    rz = (sz - bzr) * w

    def level(args, d):
        w, rx, ry, rz = args
        same = jnp.concatenate([ks[d:] == ks[:-d], jnp.zeros((d,), bool)])

        def _sh(a, d=d):
            return jnp.concatenate([a[d:], jnp.zeros((d,), a.dtype)])

        return (w + jnp.where(same, _sh(w), 0.0),
                rx + jnp.where(same, _sh(rx), 0.0),
                ry + jnp.where(same, _sh(ry), 0.0),
                rz + jnp.where(same, _sh(rz), 0.0))

    args = (w, rx, ry, rz)
    d = 1
    while d < min(N, 64):
        args = level(args, d)
        d *= 2
    if d < N:
        deeper = jnp.concatenate(
            [ks[d:] == ks[:-d], jnp.zeros((d,), bool)]).any()

        def tail(args):
            dd = d
            while dd < N:
                args = level(args, dd)
                dd *= 2
            return args

        args = jax.lax.cond(deeper, tail, lambda a: a, args)
    w, rx, ry, rz = args
    first = jnp.concatenate([jnp.ones((1,), bool), ks[1:] != ks[:-1]])
    outv = first & svalid
    inv = 1.0 / jnp.maximum(w, 1e-30)
    ox = jnp.where(outv, bxr + rx * inv, 3.0e37)
    return ox, outv, jnp.sum(outv.astype(jnp.int32))


if _want("capped"):
    timeit("packed + capped doubling", packed_capped, xyz, valid)

# the fs_maps path: 3-key lexsort voxel_centroids_map vs the packed key
from lidar_global_registration_tpu.ops.downsample import (  # noqa: E402
    voxel_centroids_map,
)

vmap_f = jax.jit(lambda x, v: voxel_centroids_map(x, v, jnp.float32(voxel)))
if _want("lexmap"):
    timeit("voxel_centroids_map (lexsort)", vmap_f, xyz, valid)
