"""FPFH-33 descriptors over grid-hash radius neighborhoods.

Reference: estimateFeatures<FPFH> delegates to pcl::FPFHEstimationOMP with a
radius search (include/common.h:322-332).  The PCL algorithm:

  SPFH(p): for each radius neighbor j != p, Darboux-frame pair features
    (f1=alpha, f2=phi, f3=theta') binned into 3 x 11 histograms with
    increment 100/#neighbors; source/target roles swap so the smaller
    normal-to-line angle leads.
  FPFH(p) = SPFH(p) + (1/k) sum_j SPFH(j) / dist2(p, j), each of the three
    11-bin blocks renormalized to sum 100.

TPU re-design: SPFH is computed densely for EVERY surface point (uniform
work, one big batched kernel) and the keypoint FPFH is a masked weighted
gather-sum — no kd-tree, no per-point dynamic neighbor sets.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from lidar_global_registration_tpu.ops import grid as gridmod

NR_BINS = 11
DIM = 3 * NR_BINS


def pair_features(p1, n1, p2, n2):
    """pcl::computePairFeatures for broadcast arrays of shape [..., 3].

    Returns (f1, f2, f3, ok): alpha = atan2(w.n_t, n_s.n_t), phi = v.n_t,
    theta' = cos(angle of n_s with the connecting line)."""
    dp = p2 - p1
    d = jnp.sqrt(jnp.maximum(jnp.sum(dp * dp, axis=-1), 0.0))
    dsafe = jnp.maximum(d, 1e-30)
    a1 = jnp.sum(n1 * dp, axis=-1) / dsafe
    a2 = jnp.sum(n2 * dp, axis=-1) / dsafe
    # swap so the normal with the SMALLER angle to the line is the source
    swap = jnp.arccos(jnp.clip(jnp.abs(a1), 0, 1)) > jnp.arccos(jnp.clip(jnp.abs(a2), 0, 1))
    ns = jnp.where(swap[..., None], n2, n1)
    nt = jnp.where(swap[..., None], n1, n2)
    dps = jnp.where(swap[..., None], -dp, dp)
    f3 = jnp.where(swap, a2, a1)
    v = jnp.cross(dps, ns)
    vn = jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1), 0.0))
    ok = (d > 0) & (vn > 1e-12)
    v = v / jnp.maximum(vn, 1e-30)[..., None]
    w = jnp.cross(ns, v)
    f2 = jnp.sum(v * nt, axis=-1)
    f1 = jnp.arctan2(jnp.sum(w * nt, axis=-1), jnp.sum(ns * nt, axis=-1))
    return f1, f2, f3, ok


def _bin_idx(f1, f2, f3):
    b1 = jnp.clip(
        jnp.floor(NR_BINS * (f1 + jnp.pi) / (2.0 * jnp.pi)), 0, NR_BINS - 1
    ).astype(jnp.int32)
    b2 = jnp.clip(jnp.floor(NR_BINS * (f2 + 1.0) / 2.0), 0, NR_BINS - 1).astype(jnp.int32)
    b3 = jnp.clip(jnp.floor(NR_BINS * (f3 + 1.0) / 2.0), 0, NR_BINS - 1).astype(jnp.int32)
    return b1, b2, b3


@partial(jax.jit, static_argnames=())
def spfh(xyz, normal, idx, mask):
    """Simplified point feature histograms for all points.

    xyz/normal f32[N,3]; idx i32[N,K] radius neighbors (self excluded);
    mask bool[N,K].  Returns f32[N,33]."""
    N, K = idx.shape
    p1 = xyz[:, None, :]
    n1 = normal[:, None, :]
    p2 = xyz[idx]
    n2 = normal[idx]
    f1, f2, f3, ok = pair_features(p1, n1, p2, n2)
    ok = ok & mask
    # also require finite normals on both sides (zero-norm marks invalid)
    ok = ok & (jnp.sum(n1 * n1, axis=-1) > 0.5) & (jnp.sum(n2 * n2, axis=-1) > 0.5)
    b1, b2, b3 = _bin_idx(f1, f2, f3)
    cnt = jnp.sum(ok, axis=1)
    incr = jnp.where(cnt > 0, 100.0 / jnp.maximum(cnt, 1), 0.0)  # [N]

    rows = jnp.arange(N, dtype=jnp.int32)[:, None]
    val = jnp.where(ok, incr[:, None], 0.0).reshape(-1)

    def hist(b, offset):
        tgt = rows * DIM + offset + b
        return jax.ops.segment_sum(val, tgt.reshape(-1), num_segments=N * DIM)

    h = hist(b1, 0) + hist(b2, NR_BINS) + hist(b3, 2 * NR_BINS)
    return h.reshape(N, DIM)


def fpfh(
    kp_xyz,
    kp_valid,
    surface_xyz,
    surface_normal,
    surface_valid,
    radius,
    kp_normal=None,
    k_neighbors: int = 384,
    cap: int = 128,
    chunk: int | None = 2048,
):
    """Full FPFH pipeline for keypoints against a surface cloud.

    Returns (features f32[M,33], feat_valid bool[M])."""
    g = gridmod.build_grid(surface_xyz, surface_valid, radius)
    n_surface = surface_xyz.shape[0]
    sidx = jnp.arange(n_surface, dtype=jnp.int32)
    # SPFH for every surface point (dense, uniform work).
    idx, _dist, mask = gridmod.radius_neighbors(
        g,
        surface_xyz,
        surface_valid,
        radius,
        k=k_neighbors,
        cap=cap,
        include_self=False,
        query_index=sidx,
        chunk=chunk,
    )
    spfh_all = spfh(surface_xyz, surface_normal, idx, mask)

    # Keypoint neighborhoods (keypoints are usually a subset of the surface at
    # the same scale, but the pyramid recomputes them on a downsampled
    # surface, so query independently).
    kidx, kdist, kmask = gridmod.radius_neighbors(
        g, kp_xyz, kp_valid, radius, k=k_neighbors, cap=cap, chunk=chunk
    )
    # Exclude exact self-matches (distance == 0) from the weighted sum.
    nonself = kdist > 1e-12
    m = kmask & nonself
    nb = spfh_all[kidx]  # [M,K,33]
    w = jnp.where(m, 1.0 / jnp.maximum(kdist * kdist, 1e-30), 0.0)
    k_cnt = jnp.sum(m, axis=1)
    wsum = jnp.einsum("mk,mkd->md", w, nb) / jnp.maximum(k_cnt, 1)[:, None]

    # Own SPFH: PCL computes SPFH at the query itself over the same
    # neighborhood.  Compute directly from the keypoint's neighbors.
    if kp_normal is None:
        kp_normal = _nearest_normal(kp_xyz, kidx, kdist, kmask, surface_normal)
    f1, f2, f3, ok = pair_features(
        kp_xyz[:, None, :], kp_normal[:, None, :], surface_xyz[kidx], surface_normal[kidx]
    )
    ok = ok & m & (jnp.sum(surface_normal[kidx] ** 2, axis=-1) > 0.5)
    ok = ok & (jnp.sum(kp_normal * kp_normal, axis=-1) > 0.5)[:, None]
    b1, b2, b3 = _bin_idx(f1, f2, f3)
    Mq, K = kidx.shape
    cnt = jnp.sum(ok, axis=1)
    incr = jnp.where(cnt > 0, 100.0 / jnp.maximum(cnt, 1), 0.0)
    rows = jnp.arange(Mq, dtype=jnp.int32)[:, None]
    val = jnp.where(ok, incr[:, None], 0.0).reshape(-1)

    def hist(b, offset):
        tgt = rows * DIM + offset + b
        return jax.ops.segment_sum(val, tgt.reshape(-1), num_segments=Mq * DIM)

    own = (hist(b1, 0) + hist(b2, NR_BINS) + hist(b3, 2 * NR_BINS)).reshape(Mq, DIM)

    feat = own + wsum
    # renormalize each block to sum 100 (PCL weightPointSPFHSignature tail)
    out = []
    for blk in range(3):
        f = feat[:, blk * NR_BINS : (blk + 1) * NR_BINS]
        s = jnp.sum(f, axis=1, keepdims=True)
        out.append(jnp.where(s > 0, 100.0 * f / jnp.maximum(s, 1e-30), f))
    feat = jnp.concatenate(out, axis=1)
    feat_valid = kp_valid & (k_cnt > 0)
    feat = jnp.where(feat_valid[:, None], feat, 0.0)
    return feat, feat_valid


def _nearest_normal(kp_xyz, kidx, kdist, kmask, surface_normal):
    """Normal at the keypoint: nearest surface point's normal (keypoints are
    re-estimated cloud members in the pipeline; this covers standalone use)."""
    first = jnp.argmin(jnp.where(kmask, kdist, jnp.float32(3.0e38)), axis=1)
    nn = jnp.take_along_axis(kidx, first[:, None], axis=1)[:, 0]
    return surface_normal[nn]
