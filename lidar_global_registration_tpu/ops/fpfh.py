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
gather-sum.  All neighbor gathers are structure-of-arrays ([M,K] per
coordinate — [M,K,3] would pad its last dim to 128 lanes), and the
33-channel SPFH gather of the combination phase runs in lax.map chunks.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from lidar_global_registration_tpu.ops import grid as gridmod

NR_BINS = 11
DIM = 3 * NR_BINS


def pair_features(p1, n1, p2, n2):
    """pcl::computePairFeatures for [..., 3] arrays (AoS reference form,
    used by tests; the compute path uses pair_features_soa)."""
    dp = [p2[..., c] - p1[..., c] for c in range(3)]
    n1c = [n1[..., c] for c in range(3)]
    n2c = [n2[..., c] for c in range(3)]
    return pair_features_soa(dp, n1c, n2c)


def pair_features_soa(dp, n1, n2):
    """Darboux pair features from per-coordinate components.

    dp/n1/n2: length-3 lists of broadcastable arrays (dp = p2 - p1).
    Returns (f1, f2, f3, ok)."""
    d2 = dp[0] ** 2 + dp[1] ** 2 + dp[2] ** 2
    d = jnp.sqrt(jnp.maximum(d2, 0.0))
    dsafe = jnp.maximum(d, 1e-30)
    a1 = (n1[0] * dp[0] + n1[1] * dp[1] + n1[2] * dp[2]) / dsafe
    a2 = (n2[0] * dp[0] + n2[1] * dp[1] + n2[2] * dp[2]) / dsafe
    # swap so the normal with the SMALLER angle to the line is the source
    swap = jnp.arccos(jnp.clip(jnp.abs(a1), 0, 1)) > jnp.arccos(
        jnp.clip(jnp.abs(a2), 0, 1)
    )
    ns = [jnp.where(swap, b, a) for a, b in zip(n1, n2)]
    nt = [jnp.where(swap, a, b) for a, b in zip(n1, n2)]
    dps = [jnp.where(swap, -c, c) for c in dp]
    f3 = jnp.where(swap, a2, a1)
    # v = cross(dps, ns)
    v = [
        dps[1] * ns[2] - dps[2] * ns[1],
        dps[2] * ns[0] - dps[0] * ns[2],
        dps[0] * ns[1] - dps[1] * ns[0],
    ]
    vn = jnp.sqrt(jnp.maximum(v[0] ** 2 + v[1] ** 2 + v[2] ** 2, 0.0))
    ok = (d > 0) & (vn > 1e-12)
    vs = jnp.maximum(vn, 1e-30)
    v = [c / vs for c in v]
    # w = cross(ns, v)
    w = [
        ns[1] * v[2] - ns[2] * v[1],
        ns[2] * v[0] - ns[0] * v[2],
        ns[0] * v[1] - ns[1] * v[0],
    ]
    f2 = v[0] * nt[0] + v[1] * nt[1] + v[2] * nt[2]
    f1 = jnp.arctan2(
        w[0] * nt[0] + w[1] * nt[1] + w[2] * nt[2],
        ns[0] * nt[0] + ns[1] * nt[1] + ns[2] * nt[2],
    )
    return f1, f2, f3, ok


def _bin_idx(f1, f2, f3):
    b1 = jnp.clip(
        jnp.floor(NR_BINS * (f1 + jnp.pi) / (2.0 * jnp.pi)), 0, NR_BINS - 1
    ).astype(jnp.int32)
    b2 = jnp.clip(jnp.floor(NR_BINS * (f2 + 1.0) / 2.0), 0, NR_BINS - 1).astype(jnp.int32)
    b3 = jnp.clip(jnp.floor(NR_BINS * (f3 + 1.0) / 2.0), 0, NR_BINS - 1).astype(jnp.int32)
    return b1, b2, b3


def _spfh_histogram(f1, f2, f3, ok):
    """3 x 11 histograms with increment 100/#pairs -> f32[M, 33].

    Histogramming as 33 masked reductions over K (fused one-hot) instead of
    scatter-adds: TPU scatters serialize, while compare+select+reduce rides
    the VPU."""
    b1, b2, b3 = _bin_idx(f1, f2, f3)
    cnt = jnp.sum(ok, axis=1)
    incr = jnp.where(cnt > 0, 100.0 / jnp.maximum(cnt, 1), 0.0)
    val = jnp.where(ok, incr[:, None], 0.0)
    cols = []
    for b in (b1, b2, b3):
        for d in range(NR_BINS):
            cols.append(jnp.sum(jnp.where(b == d, val, 0.0), axis=1))
    return jnp.stack(cols, axis=1)


@partial(jax.jit, static_argnames=())
def spfh(xyz, normal, idx, mask, query_xyz=None, query_normal=None):
    """Simplified point feature histograms for all points (SoA gathers).

    xyz/normal f32[N,3]; idx i32[Q,K] radius neighbors (self excluded);
    mask bool[Q,K].  Returns f32[Q,33].  query_xyz/query_normal decouple
    the query rows from the cloud for row-sharded (tp) execution."""
    if query_xyz is None:
        query_xyz = xyz
    if query_normal is None:
        query_normal = normal
    dp = [xyz[:, c][idx] - query_xyz[:, c][:, None] for c in range(3)]
    n1 = [query_normal[:, c][:, None] for c in range(3)]
    n2 = [normal[:, c][idx] for c in range(3)]
    f1, f2, f3, ok = pair_features_soa(dp, n1, n2)
    ok = ok & mask
    n1_ok = (n1[0] ** 2 + n1[1] ** 2 + n1[2] ** 2) > 0.5
    n2_ok = (n2[0] ** 2 + n2[1] ** 2 + n2[2] ** 2) > 0.5
    ok = ok & n1_ok & n2_ok
    return _spfh_histogram(f1, f2, f3, ok)


@partial(jax.jit, static_argnames=())
def combine_spfh(
    kp_xyz, kp_normal, surface_xyz, surface_normal, spfh_all, kidx, kdist, kmask
):
    """Keypoint FPFH from neighbor SPFHs + the keypoint's own SPFH
    (PCL weightPointSPFHSignature)."""
    nonself = kdist > 1e-12
    m = kmask & nonself
    w = jnp.where(m, 1.0 / jnp.maximum(kdist * kdist, 1e-30), 0.0)
    k_cnt = jnp.sum(m, axis=1)
    # [m, K, 33] ROW gather: each row fetches 33 contiguous channel values
    # (measured faster than 33 per-channel element gathers despite the
    # 33 -> 128 lane padding).  The table is gathered in bf16 — SPFH bins
    # are 0..100 histograms, the 1/d^2 weighted mean tolerates 0.4% mantissa
    # noise, and halving the gather bytes matters more (the einsum itself
    # runs at default bf16-input precision for the same reason)
    nb = spfh_all.astype(jnp.bfloat16)[kidx]
    wsum = jnp.einsum(
        "mk,mkd->md", w.astype(jnp.bfloat16), nb,
        preferred_element_type=jnp.float32,
    ) / jnp.maximum(k_cnt, 1)[:, None]

    dp = [surface_xyz[:, c][kidx] - kp_xyz[:, c][:, None] for c in range(3)]
    n1 = [kp_normal[:, c][:, None] for c in range(3)]
    n2 = [surface_normal[:, c][kidx] for c in range(3)]
    f1, f2, f3, ok = pair_features_soa(dp, n1, n2)
    ok = ok & m
    ok = ok & ((n2[0] ** 2 + n2[1] ** 2 + n2[2] ** 2) > 0.5)
    ok = ok & ((n1[0] ** 2 + n1[1] ** 2 + n1[2] ** 2) > 0.5)
    own = _spfh_histogram(f1, f2, f3, ok)

    feat = own + wsum
    out = []
    for blk in range(3):
        f = feat[:, blk * NR_BINS : (blk + 1) * NR_BINS]
        s = jnp.sum(f, axis=1, keepdims=True)
        out.append(jnp.where(s > 0, 100.0 * f / jnp.maximum(s, 1e-30), f))
    return jnp.concatenate(out, axis=1), k_cnt


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
    chunk: int | None = None,
    approx: bool | None = None,
):
    """Full FPFH pipeline for keypoints against a surface cloud.

    Returns (features f32[M,33], feat_valid bool[M])."""
    if approx is None:
        approx = gridmod.approx_topk_default()
    g = gridmod.build_grid(surface_xyz, surface_valid, radius, cell_cap=cap)
    n_surface = surface_xyz.shape[0]
    sidx = jnp.arange(n_surface, dtype=jnp.int32)
    idx, sdist, mask = gridmod.radius_neighbors(
        g,
        surface_xyz,
        surface_valid,
        radius,
        k=k_neighbors,
        cap=cap,
        include_self=False,
        query_index=sidx,
        chunk=chunk,
        approx=approx,
    )
    spfh_all = spfh(surface_xyz, surface_normal, idx, mask)

    if kp_xyz is surface_xyz:
        # keypoints ARE the surface (keypoint=any / flagship path): reuse the
        # surface neighbor pass instead of a second full radius query.  The
        # surface pass excluded self, matching the nonself filter below.
        kidx, kdist, kmask = idx, sdist, mask
    else:
        kidx, kdist, kmask = gridmod.radius_neighbors(
            g, kp_xyz, kp_valid, radius, k=k_neighbors, cap=cap, chunk=chunk,
            approx=approx,
        )
    if kp_normal is None:
        kp_normal = _nearest_normal(kp_xyz, kidx, kdist, kmask, surface_normal)

    M = kp_xyz.shape[0]
    K = kidx.shape[1]
    if chunk is None:
        # the [m, K, 33] SPFH gather pads 33 -> 128 lanes; budget ~1.2GB
        slots = M * K * 128
        if slots > 300_000_000:
            n_chunks = -(-slots // 300_000_000)
            chunk = max(128, ((-(-M // n_chunks) + 127) // 128) * 128)
    if chunk is None or chunk >= M:
        feat, k_cnt = combine_spfh(
            kp_xyz, kp_normal, surface_xyz, surface_normal, spfh_all, kidx, kdist, kmask
        )
    else:
        # UNROLLED chunk loop (lax.map serializes and defeats fusion)
        feats, cnts = [], []
        for st in range(0, M, chunk):
            en = min(st + chunk, M)
            f, c = combine_spfh(
                kp_xyz[st:en], kp_normal[st:en], surface_xyz, surface_normal,
                spfh_all, kidx[st:en], kdist[st:en], kmask[st:en],
            )
            feats.append(f)
            cnts.append(c)
        feat = jnp.concatenate(feats, axis=0)
        k_cnt = jnp.concatenate(cnts, axis=0)

    feat_valid = kp_valid & (k_cnt > 0)
    feat = jnp.where(feat_valid[:, None], feat, 0.0)
    return feat, feat_valid


def _nearest_normal(kp_xyz, kidx, kdist, kmask, surface_normal):
    """Normal at the keypoint: nearest surface point's normal (keypoints are
    re-estimated cloud members in the pipeline; this covers standalone use)."""
    first = jnp.argmin(jnp.where(kmask, kdist, jnp.float32(3.0e38)), axis=1)
    nn = jnp.take_along_axis(kidx, first[:, None], axis=1)[:, 0]
    return surface_normal[nn]
