"""RANSAC metric estimators, batched over a hypothesis axis.

Reference: include/metric.h + src/metric.cpp.  Every estimator maps a rigid
transform to (inliers, rmse, metric); RANSAC calls it inside the hot loop
(sac_prerejective_omp.cpp:222).  On TPU the hypothesis loop becomes a leading
batch axis B: one call scores B transforms at once — inlier tests are a B x M
broadcast, the uniformity entropy becomes a batched segment-sum histogram,
and closest-plane scoring queries the target grid for B x S transformed
sample points in one shot.

Score functions match src/metric.cpp:55-81 exactly (values relative to the
*per-correspondence* adaptive threshold).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from lidar_global_registration_tpu.ops import grid as gridmod
from lidar_global_registration_tpu.types import (
    DIST_TO_PLANE_COEFFICIENT,
    METRIC_CLOSEST_PLANE,
    METRIC_COMBINATION,
    METRIC_CORRESPONDENCES,
    METRIC_SCORE_CONSTANT,
    METRIC_SCORE_EXP,
    METRIC_SCORE_MAE,
    METRIC_SCORE_MSE,
    METRIC_UNIFORMITY,
    METRIC_WEIGHTED_CLOSEST_PLANE,
    SPARSE_POINTS_FRACTION,
)

N_BINS = 100  # uniformity histogram resolution (src/analysis.cpp:15)
BIG = jnp.float32(3.0e38)


def score_values(dist, thr, score_id: str):
    """Per-inlier score (src/metric.cpp:55-81)."""
    if score_id == METRIC_SCORE_MAE:
        return jnp.abs(dist - thr) / thr
    if score_id == METRIC_SCORE_MSE:
        return (dist - thr) * (dist - thr) / (thr * thr)
    if score_id == METRIC_SCORE_EXP:
        return jnp.exp(-dist * dist / (2.0 * thr * thr))
    if score_id != METRIC_SCORE_CONSTANT:
        raise ValueError(f"unknown score function {score_id!r}")
    return jnp.ones_like(dist)


# ---------------------------------------------------------------------------
# Correspondence-based inliers (CorrespondencesMetricEstimator, metric.cpp:125)
# ---------------------------------------------------------------------------
def transform_points_soa(R, t, p):
    """Apply batched rigid transforms to points in SoA form.

    R f32[B,3,3], t f32[B,3], p f32[M,3] -> 3 arrays f32[B,M].
    Explicit VPU arithmetic: exact f32 without the 6-pass MXU cost a
    HIGHEST-precision dim-3 einsum pays, and no [B,M,3] materialization
    (whose 3-wide minor dim pads to 128 lanes)."""
    px, py, pz = p[:, 0][None, :], p[:, 1][None, :], p[:, 2][None, :]
    out = []
    for i in range(3):
        out.append(
            R[:, i, 0][:, None] * px
            + R[:, i, 1][:, None] * py
            + R[:, i, 2][:, None] * pz
            + t[:, i][:, None]
        )
    return out[0], out[1], out[2]


def corr_inlier_mask(R, t, p, q, thr, cvalid):
    """R,t batched [B,...]; p,q f32[M,3]; -> (mask bool[B,M], dist f32[B,M])."""
    tx, ty, tz = transform_points_soa(R, t, p)
    d2 = (
        (tx - q[:, 0][None]) ** 2
        + (ty - q[:, 1][None]) ** 2
        + (tz - q[:, 2][None]) ** 2
    )
    dist = jnp.sqrt(jnp.maximum(d2, 0.0))
    mask = (dist < thr[None]) & cvalid[None]
    return mask, dist


def corr_metric(R, t, p, q, thr, cvalid, score_id: str):
    """metric = score(inliers)/n_corrs; also returns inlier count and rmse."""
    mask, dist = corr_inlier_mask(R, t, p, q, thr, cvalid)
    sv = score_values(dist, thr[None], score_id)
    score = jnp.sum(jnp.where(mask, sv, 0.0), axis=1)
    n_corr = jnp.maximum(jnp.sum(cvalid.astype(jnp.float32)), 1.0)
    cnt = jnp.sum(mask, axis=1)
    sq = jnp.sum(jnp.where(mask, dist * dist, 0.0), axis=1)
    rmse = jnp.where(cnt > 0, jnp.sqrt(sq / jnp.maximum(cnt, 1)), BIG)
    return score / n_corr, cnt, rmse, mask, dist


# ---------------------------------------------------------------------------
# Uniformity (UniformityMetricEstimator, metric.cpp:167 + analysis.cpp:90-130)
# ---------------------------------------------------------------------------
def uniformity_bins(p_src, bbox_lo, bbox_hi):
    """Static per-correspondence 2D bin ids for the three projections.

    Binning depends only on source positions (analysis.cpp:104-115), so it is
    computed once; only the inlier mask varies with the hypothesis."""
    rng = jnp.maximum(bbox_hi - bbox_lo, 1e-30)
    b = jnp.minimum(
        jnp.floor((p_src - bbox_lo) / rng * N_BINS), N_BINS - 1.0
    ).astype(jnp.int32)
    b = jnp.maximum(b, 0)
    # projections: k=0 -> (y,z), k=1 -> (z,x), k=2 -> (x,y)
    b0 = b[:, 1] * N_BINS + b[:, 2]
    b1 = b[:, 2] * N_BINS + b[:, 0]
    b2 = b[:, 0] * N_BINS + b[:, 1]
    return jnp.stack([b0, b1, b2], axis=0)  # i32[3, M]


def uniformity_entropy(mask, bins3):
    """Batched 3-axis projected entropy (analysis.cpp:96-130).

    mask: bool[B, M]; bins3: i32[3, M].  Returns f32[B]."""
    B, M = mask.shape
    w = mask.astype(jnp.float32)
    n = jnp.sum(w, axis=1)  # [B]

    def one_proj(bins):
        # batched bincount: offset bins per batch row, one segment_sum
        offs = bins[None, :] + (jnp.arange(B, dtype=jnp.int32) * (N_BINS * N_BINS))[:, None]
        cnt = jax.ops.segment_sum(
            w.reshape(-1), offs.reshape(-1), num_segments=B * N_BINS * N_BINS
        ).reshape(B, N_BINS * N_BINS)
        p = cnt / jnp.maximum(n, 1.0)[:, None]
        h = -jnp.sum(jnp.where(p > 0, p * jnp.log(jnp.maximum(p, 1e-30)), 0.0), axis=1)
        return h / jnp.log(float(N_BINS * N_BINS))

    e0 = one_proj(bins3[0])
    e1 = one_proj(bins3[1])
    e2 = one_proj(bins3[2])
    ent = jnp.cbrt(jnp.maximum(e0 * e1 * e2, 0.0))
    return jnp.where(n > 0, ent, 0.0)


# ---------------------------------------------------------------------------
# Closest-plane inliers (buildClosestPlaneInliers, metric.cpp:10-53)
# ---------------------------------------------------------------------------
def closest_plane_metric(
    R,
    t,
    sample_xyz,
    sample_valid,
    tgt_grid: gridmod.HashGrid,
    tgt_normal,
    inlier_threshold,
    score_id: str,
    denom,
    weights=None,
    cap: int = 32,
):
    """Point-to-nearest-neighbor-plane scoring for B transforms x S samples.

    sample_xyz f32[S,3] are (possibly sparse-sampled) source points; for each
    transformed sample we take the nearest target point within
    2*inlier_threshold and test |n . (nn - p)| < inlier_threshold
    (metric.cpp:25-46).  Returns (metric[B], count[B], rmse[B]).
    """
    B = R.shape[0]
    S = sample_xyz.shape[0]
    tx, ty, tz = transform_points_soa(R, t, sample_xyz)  # [B,S] x3
    tp = jnp.stack([tx, ty, tz], axis=-1)  # [B,S,3] (consumed by grid query)
    flat = tp.reshape(B * S, 3)
    fvalid = jnp.broadcast_to(sample_valid[None], (B, S)).reshape(-1)
    radius = DIST_TO_PLANE_COEFFICIENT * inlier_threshold
    idx, dist, mask = gridmod.radius_neighbors(
        tgt_grid, flat, fvalid, radius, k=1, cap=cap
    )
    nn = idx[:, 0].reshape(B, S)
    found = mask[:, 0].reshape(B, S)
    npt = tgt_grid.xyz[nn]  # [B,S,3]
    nnm = tgt_normal[nn]  # [B,S,3]
    d2p = jnp.abs(jnp.sum(nnm * (npt - tp), axis=-1))
    # invalid normals -> fall back to squared NN distance (metric.cpp:40-41
    # mirrors common.cpp:580: dist_to_plane = nn_sqr_dists[0])
    nn_ok = jnp.sum(nnm * nnm, axis=-1) > 0.5
    d1 = dist[:, 0].reshape(B, S)
    d2p = jnp.where(nn_ok, d2p, d1 * d1)
    inlier = found & (d2p < inlier_threshold)
    sv = score_values(d2p, jnp.full_like(d2p, inlier_threshold), score_id)
    if weights is not None:
        sv = sv * weights[None, :]
    score = jnp.sum(jnp.where(inlier, sv, 0.0), axis=1)
    cnt = jnp.sum(inlier, axis=1)
    sq = jnp.sum(jnp.where(inlier, d2p * d2p, 0.0), axis=1)
    rmse = jnp.where(cnt > 0, jnp.sqrt(sq / jnp.maximum(cnt, 1)), BIG)
    return score / jnp.maximum(denom, 1e-30), cnt, rmse


# ---------------------------------------------------------------------------
# Estimator bundle
# ---------------------------------------------------------------------------
@partial(
    jax.tree_util.register_dataclass,
    meta_fields=("metric_id", "score_id", "sparse"),
    data_fields=(
        "p",
        "q",
        "thr",
        "cvalid",
        "bins3",
        "tgt_grid",
        "tgt_normal",
        "cp_threshold",
        "sample_xyz",
        "sample_valid",
        "cp_denom",
        "cp_weights",
    ),
)
@dataclass
class MetricContext:
    """Precomputed device state for a (src, tgt, correspondences) triple.

    A pytree: the string ids are static (they select the compiled metric),
    everything else is device data so one jit specialization serves every
    scan pair with the same parameter set."""

    metric_id: str
    score_id: str
    # correspondence arrays (compacted)
    p: jax.Array  # f32[M,3] src xyz per corr
    q: jax.Array  # f32[M,3] tgt xyz per corr
    thr: jax.Array  # f32[M]
    cvalid: jax.Array  # bool[M]
    # uniformity
    bins3: Optional[jax.Array] = None
    # closest-plane
    tgt_grid: Optional[gridmod.HashGrid] = None
    tgt_normal: Optional[jax.Array] = None
    cp_threshold: jax.Array | float = 0.0
    sample_xyz: Optional[jax.Array] = None
    sample_valid: Optional[jax.Array] = None
    cp_denom: jax.Array | float = 1.0
    cp_weights: Optional[jax.Array] = None
    sparse: bool = False

    def min_tolerable_metric(self) -> float:
        # metric.h: uniformity -> 0.3, all others -> 0.0
        return 0.3 if self.metric_id == METRIC_UNIFORMITY else 0.0

    def initial_metric(self) -> float:
        return 0.0


def evaluate(ctx: MetricContext, R, t):
    """Score B hypotheses.  Returns dict with metric[B], inliers[B] (count),
    support[B] (correspondence-supporting count for the iteration formula),
    rmse[B], and corr inlier mask [B,M]."""
    metric_c, cnt_c, rmse_c, mask_c, _dist = corr_metric(
        R, t, ctx.p, ctx.q, ctx.thr, ctx.cvalid, ctx.score_id
    )
    out = {"support": cnt_c, "corr_mask": mask_c}
    mid = ctx.metric_id
    if mid == METRIC_CORRESPONDENCES:
        out.update(metric=metric_c, inliers=cnt_c, rmse=rmse_c)
    elif mid == METRIC_UNIFORMITY:
        ent = uniformity_entropy(mask_c, ctx.bins3)
        ent = jnp.where(cnt_c > 0, ent, 0.0)
        out.update(metric=ent, inliers=cnt_c, rmse=rmse_c)
    elif mid in (METRIC_CLOSEST_PLANE, METRIC_WEIGHTED_CLOSEST_PLANE):
        m, cnt, rmse = closest_plane_metric(
            R,
            t,
            ctx.sample_xyz,
            ctx.sample_valid,
            ctx.tgt_grid,
            ctx.tgt_normal,
            ctx.cp_threshold,
            ctx.score_id,
            ctx.cp_denom,
            ctx.cp_weights,
        )
        out.update(metric=m, inliers=cnt, rmse=rmse)
    elif mid == METRIC_COMBINATION:
        m, _cnt, _rmse = closest_plane_metric(
            R,
            t,
            ctx.sample_xyz,
            ctx.sample_valid,
            ctx.tgt_grid,
            ctx.tgt_normal,
            ctx.cp_threshold,
            ctx.score_id,
            ctx.cp_denom,
        )
        # combination inliers come from the correspondence estimator
        # (metric.cpp:233-246)
        out.update(metric=metric_c * m, inliers=cnt_c, rmse=rmse_c)
    else:
        # reference falls back to correspondences with a warning
        out.update(metric=metric_c, inliers=cnt_c, rmse=rmse_c)
    return out


def estimate_max_iterations(support, n_corr, confidence: float, n_samples: int):
    """Adaptive RANSAC budget (metric.cpp:103-123): supporting fraction / 4,
    iterations = log(1-conf)/log(1-frac^n).  Returns f32[B] (or scalar)."""
    frac = support.astype(jnp.float32) / jnp.maximum(n_corr, 1.0) / 4.0
    fn = frac**n_samples
    bad = (frac <= 0.0) | (fn >= 1.0)
    denom = jnp.log(jnp.maximum(1.0 - fn, 1e-38))
    iters = jnp.log(1.0 - confidence) / jnp.minimum(denom, -1e-38)
    return jnp.where(bad, jnp.float32(2**31 - 1), iters)
