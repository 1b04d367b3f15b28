"""Batched prerejective RANSAC over correspondences.

Reference: src/sac_prerejective_omp.cpp (SampleConsensusPrerejectiveOMP) —
an OpenMP loop drawing 3 unique correspondences per iteration, polygonal
edge-length prerejection, 3-point SVD pose, metric scoring with per-pair
thresholds, per-thread best + adaptive iteration shrink, final Kabsch re-fit
and convergence gates.

TPU re-design: iterations become a HYPOTHESIS BATCH axis of size B.  Each
round draws B x 3 samples with jax.random.fold_in, prerejects with one
vectorized edge test, solves B closed-form Kabsch poses, scores all B with
the batched metric estimator, and reduces with argmax.  The adaptive
iteration formula runs between rounds ON DEVICE (lax.while_loop over
shrinking iters_local).  Determinism: a fixed base seed replaces per-thread
mt19937 streams (utils.h:13-26, sac:192).
"""
from __future__ import annotations

import math
import time
from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from lidar_global_registration_tpu.ops import grid as gridmod
from lidar_global_registration_tpu.ops import metrics as metricsmod
from lidar_global_registration_tpu.ops.density import cloud_density
from lidar_global_registration_tpu.ops.downsample import aabb
from lidar_global_registration_tpu.ops.metrics import MetricContext
from lidar_global_registration_tpu.ops.transform import kabsch, to_matrix4
from lidar_global_registration_tpu.types import (
    AlignmentParameters,
    AlignmentResult,
    Cloud,
    Correspondences,
    DIST_TO_PLANE_COEFFICIENT,
    METRIC_CLOSEST_PLANE,
    METRIC_COMBINATION,
    METRIC_UNIFORMITY,
    METRIC_WEIGHTED_CLOSEST_PLANE,
    SPARSE_POINTS_FRACTION,
)

MIN_NR_INLIERS = 10  # sac_prerejective_omp.cpp:8
MIN_NR_FINAL_INLIERS = 20  # :9
MIN_INLIER_RATE = 0.15  # :10


def combinations_or_max(n: int, k: int) -> int:
    """calculateCombinationOrMax (utils.h:467-475)."""
    result = 1.0
    for i in range(k):
        result *= (n - i) / (i + 1)
    return int(min(result, 2**31 - 1))


def build_metric_context(
    src: Cloud,
    tgt: Cloud,
    corrs: Correspondences,
    params: AlignmentParameters,
    sparse: bool,
    rng: Optional[np.random.Generator] = None,
) -> MetricContext:
    """Device-side precomputation shared by every hypothesis evaluation.

    Mirrors the setSourceCloud/setTargetCloud/setCorrespondences triple of
    the reference estimators (metric.cpp)."""
    p = src.xyz[corrs.query]
    q = tgt.xyz[corrs.match]
    ctx = MetricContext(
        metric_id=params.metric_id,
        score_id=params.score_id,
        p=p,
        q=q,
        thr=corrs.threshold,
        cvalid=corrs.valid,
    )
    if params.metric_id == METRIC_UNIFORMITY:
        lo, hi = aabb(src)
        ctx.bins3 = metricsmod.uniformity_bins(p, lo, hi)
    if params.metric_id in (
        METRIC_CLOSEST_PLANE,
        METRIC_WEIGHTED_CLOSEST_PLANE,
        METRIC_COMBINATION,
    ):
        # inlier threshold = density of the target cloud (metric.cpp:181-186)
        cp_thr = cloud_density(tgt)
        ctx.cp_threshold = cp_thr
        radius = DIST_TO_PLANE_COEFFICIENT * cp_thr
        ctx.tgt_grid = gridmod.build_grid(tgt.xyz, tgt.valid, max(radius, 1e-12), cell_cap=32)
        ctx.tgt_normal = tgt.normal
        n_src = int(np.asarray(src.count()))
        valid_idx = np.nonzero(np.asarray(src.valid))[0]
        if sparse:
            s = max(int(SPARSE_POINTS_FRACTION * n_src), 1)
            rng = rng or np.random.default_rng(params.seed)
            sel = rng.choice(valid_idx, size=min(s, len(valid_idx)), replace=False)
        else:
            sel = valid_idx
        pad = max(128, 1 << (len(sel) - 1).bit_length()) if len(sel) else 128
        sel_p = np.zeros((pad,), np.int64)
        sel_p[: len(sel)] = sel
        ctx.sample_xyz = src.xyz[jnp.asarray(sel_p)]
        ctx.sample_valid = jnp.asarray(np.arange(pad) < len(sel))
        frac = SPARSE_POINTS_FRACTION if sparse else 1.0
        if params.metric_id == METRIC_WEIGHTED_CLOSEST_PLANE:
            from lidar_global_registration_tpu.ops.weights import weight_function

            w_full = weight_function(params.weight_id, params.normal_nr_points, src)
            w_np = np.asarray(w_full)
            wsum = float(w_np[np.asarray(src.valid)].sum())
            ctx.cp_weights = jnp.asarray(w_np[sel_p])
            ctx.cp_denom = frac * max(wsum, 1e-30)
        else:
            ctx.cp_denom = frac * max(n_src, 1)
        ctx.sparse = sparse
    return ctx


def draw_hypotheses(p, q, rkey, nvalid_i, B: int, S: int, edge_thr: float,
                    order=None):
    """THE shared hypothesis body: draw B sample S-tuples from the valid
    prefix, reject duplicate draws (instead of the reference's shift dance,
    sac_prerejective_omp.cpp:33-77), prereject by polygonal edge-length
    similarity (pcl::registration::CorrespondenceRejectorPoly,
    sac:105-108,214-217) and solve B closed-form Kabsch poses.

    Used by BOTH the host align_ransac round and flagship.ransac_solve
    (staged/mesh paths) so the two cannot drift.  `order` optionally maps
    sampled slots to correspondence rows (valid-first permutation); when
    None the arrays are already valid-prefix-compacted.

    Returns (R [B,3,3], t [B,3], ok [B])."""
    samp = jax.random.randint(rkey, (B, S), 0, nvalid_i)
    rows = samp if order is None else order[samp]
    ok = jnp.ones((B,), bool)
    for a in range(S):
        for b in range(a + 1, S):
            ok = ok & (rows[:, a] != rows[:, b])
    p3, q3 = p[rows], q[rows]
    for a in range(S):
        b = (a + 1) % S
        ds = jnp.sum((p3[:, a] - p3[:, b]) ** 2, axis=-1)
        dt = jnp.sum((q3[:, a] - q3[:, b]) ** 2, axis=-1)
        ok = ok & (jnp.minimum(ds, dt) >= (edge_thr ** 2) * jnp.maximum(ds, dt))
        ok = ok & (jnp.maximum(ds, dt) > 0)
    R, t = kabsch(p3, q3)
    return R, t, ok


@partial(jax.jit, static_argnames=("B", "n_samples", "edge_thr"))
def _ransac_round(ctx: MetricContext, key, n_corr, B: int, n_samples: int, edge_thr: float):
    """One batch of B hypotheses -> per-round best + max supporting count."""
    R, t, ok = draw_hypotheses(
        ctx.p, ctx.q, key, jnp.maximum(n_corr, 1), B, n_samples, edge_thr
    )
    ev = metricsmod.evaluate(ctx, R, t)

    alive = ok & (ev["inliers"] >= MIN_NR_INLIERS)
    metric = jnp.where(alive, ev["metric"], -jnp.inf)
    best = jnp.argmax(metric)
    support_max = jnp.max(jnp.where(alive, ev["support"], 0))
    return (
        metric[best],
        R[best],
        t[best],
        support_max,
        jnp.sum(ok),  # non-prerejected count (debug)
    )


@partial(jax.jit, static_argnames=("B", "n_samples", "edge_thr", "confidence"))
def _ransac_adaptive(
    ctx: MetricContext,
    base_key,
    n_corr,
    max_iter,
    max_rounds,
    init_metric,
    init_R,
    init_t,
    B: int,
    n_samples: int,
    edge_thr: float,
    confidence: float,
):
    """The full adaptive round loop ON DEVICE (lax.while_loop): draw B
    hypotheses per round, keep the best, shrink the iteration estimate
    (metric.cpp:103-123) from the best supporting count, stop when the
    round budget crosses min(estimate, max_iter).  One host pull per
    align_ransac call instead of one per round (each pull is a full
    round-trip on tunneled runtimes)."""
    n_corr_f = n_corr.astype(jnp.float32)

    def cond(c):
        i, iters, est, _bm, _bR, _bt = c
        return (i < max_rounds) & (iters < jnp.minimum(est, max_iter))

    def body(c):
        i, iters, est, bm, bR, bt = c
        key = jax.random.fold_in(base_key, i)
        m, R, t, support, _nok = _ransac_round.__wrapped__(
            ctx, key, n_corr, B, n_samples, edge_thr
        )
        better = m > bm
        bm = jnp.where(better, m, bm)
        bR = jnp.where(better, R, bR)
        bt = jnp.where(better, t, bt)
        est_new = metricsmod.estimate_max_iterations(
            support, n_corr_f, confidence, n_samples
        )
        est = jnp.minimum(est, est_new)
        return (i + 1, iters + jnp.float32(B), est, bm, bR, bt)

    init = (
        jnp.int32(0),
        jnp.float32(0.0),
        jnp.float32(2.0**31 - 1),
        init_metric,
        init_R,
        init_t,
    )
    i, iters, _est, bm, bR, bt = jax.lax.while_loop(cond, body, init)
    return bm, to_matrix4(bR, bt), iters


@partial(jax.jit, static_argnames=())
def _evaluate_one(ctx: MetricContext, T):
    R = T[None, :3, :3]
    t = T[None, :3, 3]
    ev = metricsmod.evaluate(ctx, R, t)
    return (
        ev["metric"][0],
        ev["inliers"][0],
        ev["rmse"][0],
        ev["corr_mask"][0],
        ev["support"][0],
    )


@partial(jax.jit, static_argnames=())
def _refit(ctx: MetricContext, mask):
    """Kabsch re-fit on correspondence inliers (sac:282,
    transformation.cpp:4-38).  mask bool[M] over correspondences."""
    w = mask.astype(jnp.float32) * ctx.cvalid.astype(jnp.float32)
    R, t = kabsch(ctx.p[None], ctx.q[None], w[None])
    return to_matrix4(R[0], t[0])


def _closest_plane_refit(ctx: MetricContext, T, iterations: int = 3):
    """For (weighted_)closest_plane metrics the reference re-fits once on
    (sample point -> nearest target point) pairs (metric.cpp:25-46 inliers
    feeding transformation.cpp).  We iterate the NN re-association +
    point-to-PLANE projection a few times (mini-ICP): each round projects
    the sample onto its nearest target plane, which removes the in-plane
    drift a single point-to-point fit picks up on structured scans."""
    Tcur = jnp.asarray(T)
    radius = DIST_TO_PLANE_COEFFICIENT * ctx.cp_threshold
    for _ in range(iterations):
        R = Tcur[:3, :3]
        t = Tcur[:3, 3]
        tp = jnp.einsum("ij,nj->ni", R, ctx.sample_xyz,
                        precision=jax.lax.Precision.HIGHEST) + t
        idx, dist, mask = gridmod.radius_neighbors(
            ctx.tgt_grid, tp, ctx.sample_valid, radius, k=1, cap=32
        )
        nn = idx[:, 0]
        found = mask[:, 0]
        npt = ctx.tgt_grid.xyz[nn]
        nnm = ctx.tgt_normal[nn]
        off = jnp.sum(nnm * (tp - npt), axis=-1)
        nn_ok = jnp.sum(nnm * nnm, axis=-1) > 0.5
        d2p = jnp.where(nn_ok, jnp.abs(off), dist[:, 0] ** 2)
        inlier = found & (d2p < ctx.cp_threshold)
        # target = projection of the transformed sample onto the NN plane
        # (falls back to the NN point when the normal is invalid)
        proj = tp - off[:, None] * nnm
        target = jnp.where(nn_ok[:, None], proj, npt)
        w = inlier.astype(jnp.float32)
        Rn, tn = kabsch(ctx.sample_xyz[None], target[None], w[None])
        Tcur = to_matrix4(Rn[0], tn[0])
    return Tcur


@dataclass
class RansacDebug:
    iterations: int = 0
    estimated_iters: int = 0
    rounds: int = 0


def align_ransac(
    src: Cloud,
    tgt: Cloud,
    corrs: Correspondences,
    params: AlignmentParameters,
) -> AlignmentResult:
    """Full RANSAC alignment (SampleConsensusPrerejectiveOMP::align,
    sac_prerejective_omp.cpp:115-314)."""
    t0 = time.time()
    corrs = corrs.compact()
    n = int(np.asarray(corrs.count()))
    identity = np.eye(4, dtype=np.float32)
    if n < params.n_samples:
        return AlignmentResult(
            src=src,
            tgt=tgt,
            transformation=identity,
            correspondences=corrs,
            iterations=0,
            converged=False,
            time_te=time.time() - t0,
        )

    ctx = build_metric_context(src, tgt, corrs, params, sparse=True)

    max_iter = min(combinations_or_max(n, params.n_samples), params.max_iterations)
    B = int(params.hypothesis_batch)
    seed = params.seed if params.fix_seed else np.random.SeedSequence().entropy % (2**31)
    base_key = jax.random.PRNGKey(seed)

    # guess hypothesis first (sac:133-150)
    init_metric = jnp.float32(-jnp.inf)
    init_R = jnp.eye(3)
    init_t = jnp.zeros(3)
    if params.guess is not None:
        Tg = jnp.asarray(np.asarray(params.guess, np.float32))
        m, _inl, _rmse, _mask, _sup = _evaluate_one(ctx, Tg)
        init_metric = m
        init_R = Tg[:3, :3]
        init_t = Tg[:3, 3]

    max_rounds = -(-max_iter // B)
    bm, bT, iters = _ransac_adaptive(
        ctx,
        base_key,
        jnp.int32(n),
        jnp.float32(max_iter),
        jnp.int32(max_rounds),
        init_metric,
        init_R,
        init_t,
        B,
        params.n_samples,
        params.edge_thr_coef,
        params.confidence,
    )
    best_metric = float(np.asarray(bm))  # the ONE host pull of the loop
    best_T = np.asarray(bT)
    iters_done = int(np.asarray(iters))
    if not np.isfinite(best_metric):
        best_T = identity

    # final: rebuild inliers, convergence gates, Kabsch re-fit, re-evaluate
    # (sac:265-296)
    Tj = jnp.asarray(best_T.astype(np.float32))
    metric0, inliers0, _rmse0, mask0, _sup0 = _evaluate_one(ctx, Tj)
    n_inl = int(np.asarray(inliers0))
    converged = bool(
        (n_inl > MIN_NR_FINAL_INLIERS or n_inl > MIN_INLIER_RATE * n)
        and float(np.asarray(metric0)) > ctx.min_tolerable_metric()
    )
    if n_inl >= 3:
        if params.metric_id in (METRIC_CLOSEST_PLANE, METRIC_WEIGHTED_CLOSEST_PLANE):
            T_refit = _closest_plane_refit(ctx, Tj)
        else:
            T_refit = _refit(ctx, mask0)
        metric1, _i1, _r1, _m1, _s1 = _evaluate_one(ctx, T_refit)
        final_T = np.asarray(T_refit)
        final_metric = float(np.asarray(metric1))
    else:
        final_T = best_T
        final_metric = float(np.asarray(metric0))

    return AlignmentResult(
        src=src,
        tgt=tgt,
        transformation=final_T.astype(np.float32),
        correspondences=corrs,
        iterations=iters_done,
        converged=converged,
        time_te=time.time() - t0,
        metric=final_metric,
    )
