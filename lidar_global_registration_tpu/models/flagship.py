"""The flagship fully-jittable registration step.

One XLA computation registering a padded scan pair end-to-end: normals ->
ISS keypoints -> FPFH descriptors -> mutual brute-force matching -> batched
prerejective RANSAC -> Kabsch refit.  No host round-trips: grid cell sizes
and radii are data arguments, every stage is masked, and the RANSAC round
loop is a lax.scan over a fixed hypothesis budget.

This is the serving path for production registration (and the unit the
parallel layer shards over a device mesh): the host-orchestrated pipeline
in models/pipeline.py exposes the reference's full multi-scale/sweep
semantics, while this step trades the data-dependent pyramid for a fixed
feature radius to stay inside one compiled graph.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from lidar_global_registration_tpu.ops.metrics import (
    estimate_max_iterations,
    transform_points_soa,
)
from lidar_global_registration_tpu.ops import grid as gridmod
from lidar_global_registration_tpu.ops import matchers
from lidar_global_registration_tpu.ops.iss import _iss_saliency, _nms
from lidar_global_registration_tpu.ops.normals import normals_from_neighbors
from lidar_global_registration_tpu.ops.transform import kabsch, to_matrix4

MIN_NR_INLIERS = 10

# LGR_PYRAMID_DEBUG=1: the staged pyramid records its level ranges,
# per-keypoint buckets and vote winners here for parity tests against the
# host pyramid (models/pyramid.py PYRAMID_DEBUG).  Test-only.
PYRAMID_DEBUG: dict = {}
MIN_NR_FINAL_INLIERS = 20
MIN_INLIER_RATE = 0.15


@dataclass(frozen=True)
class FlagshipConfig:
    """Static shape/iteration configuration (one jit specialization)."""

    normal_k: int = 16
    neighbor_cap: int = 32
    feature_neighbors: int = 128
    feature_cap: int = 96
    iss_neighbors: int = 48
    rounds: int = 8
    hypothesis_batch: int = 512
    n_samples: int = 3
    edge_thr: float = 0.95
    confidence: float = 0.999
    use_iss: bool = True
    bf16_matching: bool = False
    match_tile: int = 2048
    query_chunk: int | None = None  # chunk large neighbor queries (memory)
    density_cap: int = 8  # per-cell cap for the k=1 density search
    use_cell_fpfh: bool = True  # staged path: fused cell kernels on TPU
    masked_features: bool = True  # ISS mode: run normals/SPFH only on cell
    # blocks near keypoints and the FPFH combine only on keypoint blocks —
    # descriptors are only consumed at keypoint rows (the reference computes
    # features on keypoint clouds only, feature_analysis.cpp); parity:
    # tests/test_cell_masked.py
    feature_scale: bool = True  # staged ISS+FPFH path: compute descriptors on
    # a per-scale voxel surface (voxel = sqrt(pi r^2 / FEATURE_NR), so a
    # feature disk holds ~FEATURE_NR points) with normals re-estimated at
    # that scale — the reference pyramid's per-level semantics
    # (matching.h:229-261) instead of the raw working cloud.  Each
    # keypoint's descriptor is snapped to its voxel centroid row (<=
    # voxel/2 offset, correspondence POSITIONS stay exact); engages only
    # when the voxel surface actually shrinks the cloud (see the gate in
    # register_pair_staged).  LGR_FEATURE_SCALE=0 disables.
    cluster_matching: bool = True  # staged ISS path: spatial-consensus filter
    cluster_k: int = 40  # MATCHING_CLUSTER_K (common.h:49)
    cluster_threshold: float = 0.95  # MATCHING_CLUSTER_THRESHOLD
    cluster_approx_knn: bool = True  # keypoint kNN via per-tile approx_max_k
    # (recall ~0.95 per tile): the consensus VOTE tolerates a slightly
    # approximate neighbor set; the exact merge's per-row sort was the
    # dominant term of the 10M match stage (56 s of 126 s)
    cluster_knn_tile: int = 32768  # train-tile for the consensus kNN scan:
    # the per-step overhead dominates at 147k keypoints (measured 5.0 s at
    # tile 4096 vs 0.76 s at 32768; XLA fuses the distance tile into the
    # partial reduce, so the big tile never materializes)
    max_correspondences: int = 1024  # keep the most cluster-consistent
    metric: str = "correspondences"  # hypothesis score: correspondences|uniformity
    descriptor: str = "fpfh"  # staged path: fpfh | shot (the reference's
    # shipped sweep is `descriptor: shot`, data/tests.yaml)
    lrf: str = "gravity"  # SHOT frames: gravity (+SHOT-LRF fallback) | default
    shot_k: int = 512  # SHOT neighbor budget per keypoint
    shot_cap: int = 128  # per-cell candidate cap for the SHOT radius query
    uniformity_top: int = 64  # uniformity: rescore this many count-ranked
    # hypotheses per round (the 3-axis entropy over all B would be
    # scatter-bound; the reference subsamples points for its expensive
    # metrics (SPARSE_POINTS_FRACTION), we subsample hypotheses)
    degree_top: int = 800  # GROR-style node-reliability prefilter before
    # RANSAC: keep the correspondences with the most pairwise-length-
    # consistent partners (K_optimal=800, ia_gror.hpp:126-194); 0 = off
    ransac_compact: int = 4096  # staged path: compact correspondences to this
    # many rows before the RANSAC stage (0 = off); the adaptive threshold
    # arrays stay per-correspondence
    alignment: str = "ransac"  # staged-path pose solver: ransac
    # (sac_prerejective_omp.cpp) | gror (ia_gror.hpp via gror.gror_solve) —
    # the reference's alignment.cpp:72-110 dispatcher choices, minus the
    # teaser stub (host pipeline.py keeps the faithful throw)
    pyramid: bool = False  # staged ISS path: the reference's MULTI-SCALE
    # feature pyramid at TPU speed — per-keypoint log2-bucketed feature
    # radii from local density (disk holds ~FEATURE_NR points,
    # matching.h:177-208), one voxel surface + normals + descriptors per
    # occupied bucket (matching.h:229-261), cross-level candidate concat +
    # spatial-consensus vote (matching.h:264-354).  Off = the single
    # feature-scale surface from the derived feature_radius (the fixed-
    # radius collapse of the pyramid, matching.h:209-212).
    scale_factor: float = 2.0  # pyramid level base (config `scale`, 2.0)
    pyramid_randomness: int = 1  # k-NN candidates per level entering the
    # cross-scale consensus vote (config `randomness`)


def _knn_fixed(xyz, valid, queries, qvalid, cell, k, cap, include_self, qidx=None,
               chunk=None):
    g = gridmod.build_grid(xyz, valid, cell, cell_cap=cap)
    return gridmod.radius_neighbors(
        g,
        queries,
        qvalid,
        cell,  # envelope-complete radius
        k=k,
        cap=cap,
        include_self=include_self,
        query_index=qidx,
        chunk=chunk,
    )


def _smoothed_density(xyz, valid, cell, cap, chunk=None):
    """k=2 smoothed densities (common.cpp:531-547) with a fixed cell."""
    qidx = jnp.arange(xyz.shape[0], dtype=jnp.int32)
    idx, dist, mask = _knn_fixed(xyz, valid, xyz, valid, cell, 1, cap, False, qidx, chunk=chunk)
    big = jnp.float32(3.0e38)
    d_raw = jnp.where(mask[:, 0], dist[:, 0], big)
    nn = idx[:, 0]
    d_nn = jnp.where(mask[:, 0], d_raw[nn], big)
    out = jnp.minimum(d_raw, d_nn)
    return jnp.where(valid & (out < big), out, 0.0)


def _density_from_knn(idx, dist, mask, valid, gather_rows=None):
    """k=2 smoothed density (common.cpp:531-547) reusing the normals
    neighbor pass: d = dist to nearest non-self neighbor, smoothed by min
    with that neighbor's value.  Avoids the two extra grid builds of a
    dedicated density query (the search radius is the normal cell rather
    than the reference's 2x-density cell — a superset, so the NN distance
    is identical wherever the smaller search finds a neighbor).

    gather_rows: for row-sharded callers (parallel/batch.py) — maps the
    local d_raw shard to the full row space so the smoothing neighbor
    (a GLOBAL index) can live on another peer's shard."""
    big = jnp.float32(3.0e38)
    seen = mask & (dist > 1e-12)
    dmat = jnp.where(seen, dist, big)
    a = jnp.argmin(dmat, axis=1)
    d_raw = jnp.take_along_axis(dmat, a[:, None], axis=1)[:, 0]
    nn = jnp.take_along_axis(idx, a[:, None], axis=1)[:, 0]
    # rows with NO in-radius neighbor must stay 0: their argmin lane (and
    # thus nn) is garbage, and the smoothing min would otherwise inherit
    # that arbitrary row's density
    has = jnp.any(seen, axis=1)
    d_all = d_raw if gather_rows is None else gather_rows(d_raw)
    d_nn = d_all[nn]
    out = jnp.minimum(d_raw, jnp.where(d_nn < big, d_nn, d_raw))
    return jnp.where(valid & has & (out < big), out, 0.0)


def _fpfh_fixed(xyz, normal, valid, kp_mask, radius, cfg: FlagshipConfig):
    """FPFH over all points; rows where kp_mask holds are the keypoints.
    Delegates to the shared SoA/chunked implementation."""
    from lidar_global_registration_tpu.ops.fpfh import fpfh as fpfh_full

    return fpfh_full(
        xyz,
        valid & kp_mask,
        xyz,
        normal,
        valid,
        radius,
        kp_normal=normal,
        k_neighbors=cfg.feature_neighbors,
        cap=cfg.feature_cap,
        chunk=cfg.query_chunk,
    )


def _subset_sel(cvalid, M: int):
    """Row selection compacting a masked correspondence set to M rows:
    valid rows first in stable (ascending-row) order; when MORE than M are
    valid, an evenly-strided systematic sample over row order — scan-line
    clouds are spatially coherent in row order, so a plain prefix would
    keep one spatial corner of the overlap and bias the pose.  Shared by
    the RANSAC and GROR solver stages so they sample the SAME subset."""
    sel = jnp.argsort(~cvalid)  # stable: valid rows first, row order kept
    K = jnp.sum(cvalid.astype(jnp.int32))
    ar = jnp.arange(M, dtype=jnp.int32)
    # floor(ar * K / M) without int32 overflow (K can be millions)
    strided = ar * (K // M) + (ar * (K % M)) // M
    return sel[jnp.where(K > M, strided, ar)]


def ransac_solve(p, q, thr, cvalid, key, cfg: FlagshipConfig):
    """Batched prerejective RANSAC over masked correspondence arrays —
    THE shared round body used by register_pair_step, _ransac_stage and
    parallel.batch._pair_step_tp, so the single-chip and mesh-sharded paths
    cannot drift.

    Each round draws B sample triples from the valid prefix, prerejects by
    polygon edge-length similarity (sac_prerejective_omp.cpp:105-108,
    214-217), solves B closed-form Kabsch poses, counts supporting
    correspondences against per-pair thresholds and keeps the argmax.  The
    adaptive iteration estimate (metric.cpp:103-123) is carried ON DEVICE in
    a lax.while_loop — zero host round-trips, early exit once the confidence
    budget is met.  Ref: sac_prerejective_omp.cpp:115-314.

    cfg.metric selects the hypothesis score: "correspondences" (count/n,
    metric.cpp:125) or "uniformity" (3-axis projected entropy of the inlier
    source points, metric.cpp:167-179 — the reference's SHIPPED sweep
    metric, data/tests.yaml) with its min-tolerable 0.3 convergence gate
    (metric.h:98).  The entropy is evaluated for the cfg.uniformity_top
    count-ranked hypotheses per round."""
    if cfg.ransac_compact and cfg.ransac_compact < p.shape[0]:
        # compact the correspondence set to a static budget: every round's
        # [B, M] inlier test (and the entropy scatter) shrinks from the
        # padded cloud length to the correspondence budget.  When MORE
        # valid rows exist than the budget (keypoint=any mutual matching
        # at 64k+), take an evenly-strided systematic sample over row
        # order — scan-line-ordered clouds are spatially coherent in row
        # order, so a plain prefix would keep one spatial corner of the
        # overlap and bias the pose.  The cluster path's consensus-ranked
        # cap (<= 1024 rows) always fits the budget, so its ranking is
        # never subsampled.
        sel = _subset_sel(cvalid, cfg.ransac_compact)
        p, q, thr, cvalid = p[sel], q[sel], thr[sel], cvalid[sel]
    if cfg.degree_top and cfg.degree_top < p.shape[0] <= 8192:
        # (the shape bound keeps the [M, M] consistency matrix to compacted
        # correspondence sets — without ransac_compact, M is the padded
        # cloud length and a dense pairwise pass would be O(N^2))
        # GROR-style node-reliability prefilter (ia_gror.hpp:126-194, the
        # reference keeps the K_optimal=800 most reliable nodes): a
        # correspondence's degree counts partners whose source and target
        # pairwise distances agree within 2x the (per-pair adaptive)
        # threshold.  Spatial-consensus filtering upstream cannot reject
        # repetitive-structure ALIASING — a neighborhood coherently matched
        # to the wrong one of many identical structures has perfect local
        # consensus; pairwise length consistency against the whole set is
        # what kills it (measured at 4M pts/side: aliased box matches
        # flooded the consensus cap and left 0 true inliers).
        pv = cvalid.astype(jnp.float32)
        nv = jnp.maximum(jnp.sum(pv), 1.0)
        # center before the Gram trick: f32 cancellation loses geometry
        # for georeferenced coordinates far from the origin
        pc = (p - jnp.sum(p * pv[:, None], axis=0) / nv) * pv[:, None]
        qc = (q - jnp.sum(q * pv[:, None], axis=0) / nv) * pv[:, None]

        def _pdist(a):
            g = jnp.matmul(a, a.T, precision=jax.lax.Precision.HIGH)
            n2 = jnp.diagonal(g)
            return jnp.sqrt(jnp.maximum(n2[:, None] + n2[None, :] - 2.0 * g, 0.0))

        eps_ij = 2.0 * jnp.maximum(thr[:, None], thr[None, :])
        consistent = (
            (jnp.abs(_pdist(pc) - _pdist(qc)) < eps_ij)
            & cvalid[None, :]
            & cvalid[:, None]
        )
        deg = jnp.sum(consistent, axis=1)
        kth = jnp.sort(deg)[-cfg.degree_top]
        cvalid = cvalid & (deg >= jnp.maximum(kth, 3))
    uniformity = cfg.metric == "uniformity"
    if uniformity:
        from lidar_global_registration_tpu.ops.metrics import (
            uniformity_bins,
            uniformity_entropy,
        )

        big = jnp.float32(3.0e37)
        lo = jnp.min(jnp.where(cvalid[:, None], p, big), axis=0)
        hi = jnp.max(jnp.where(cvalid[:, None], p, -big), axis=0)
        ok_bb = lo <= hi
        lo = jnp.where(ok_bb, lo, 0.0)
        hi = jnp.where(ok_bb, hi, 1.0)
        bins3 = uniformity_bins(p, lo, hi)
    min_tolerable = jnp.float32(0.3 if uniformity else 0.0)
    n_corr = jnp.sum(cvalid.astype(jnp.float32))
    order = jnp.argsort(~cvalid)  # valid rows first
    nvalid_i = jnp.maximum(n_corr.astype(jnp.int32), 1)
    B, S = cfg.hypothesis_batch, cfg.n_samples

    def score(alive, cnt, inl_mask):
        """Hypothesis metric [B] (-1 for dead rows)."""
        if not uniformity:
            return jnp.where(
                alive, cnt.astype(jnp.float32) / jnp.maximum(n_corr, 1.0), -1.0
            )
        T = min(cfg.uniformity_top, B)
        cnt_r = jnp.where(alive, cnt, -1)
        _v, top = jax.lax.top_k(cnt_r, T)
        ent = uniformity_entropy(inl_mask[top], bins3)  # [T]
        metric = jnp.full((B,), -1.0, jnp.float32)
        metric = metric.at[top].set(jnp.where(alive[top], ent, -1.0))
        return metric

    def one_round(rkey, best_metric, best_R, best_t):
        # THE shared draw/prereject/solve body (models/ransac.py) — the
        # host align_ransac round and this staged/mesh round cannot drift
        from lidar_global_registration_tpu.models.ransac import draw_hypotheses

        R, t, ok = draw_hypotheses(
            p, q, rkey, nvalid_i, B, S, cfg.edge_thr, order=order
        )
        tx, ty, tz = transform_points_soa(R, t, p)
        d2 = (
            (tx - q[:, 0][None]) ** 2
            + (ty - q[:, 1][None]) ** 2
            + (tz - q[:, 2][None]) ** 2
        )
        d = jnp.sqrt(jnp.maximum(d2, 0.0))
        inl_mask = (d < thr[None]) & cvalid[None]
        cnt = jnp.sum(inl_mask, axis=1)
        alive = ok & (cnt >= MIN_NR_INLIERS)
        metric = score(alive, cnt, inl_mask)
        bi = jnp.argmax(metric)
        better = metric[bi] > best_metric
        support = jnp.max(jnp.where(alive, cnt, 0))
        return (
            jnp.where(better, metric[bi], best_metric),
            jnp.where(better, R[bi], best_R),
            jnp.where(better, t[bi], best_t),
            support,
        )

    budget = jnp.float32(cfg.rounds * B)

    def cond(c):
        i, iters, est, _bm, _bR, _bt = c
        return (i < cfg.rounds) & (iters < jnp.minimum(est, budget))

    def body(c):
        i, iters, est, bm, bR, bt = c
        bm, bR, bt, support = one_round(jax.random.fold_in(key, i), bm, bR, bt)
        est_new = estimate_max_iterations(
            support, n_corr, cfg.confidence, cfg.n_samples
        )
        return (i + 1, iters + jnp.float32(B), jnp.minimum(est, est_new), bm, bR, bt)

    init = (
        jnp.int32(0),
        jnp.float32(0),
        jnp.float32(2**31 - 1),
        jnp.float32(-1.0),
        jnp.eye(3),
        jnp.zeros(3),
    )
    _i, iters_done, _est, best_metric, best_R, best_t = jax.lax.while_loop(
        cond, body, init
    )

    # final: rebuild inliers, Kabsch re-fit, convergence gates (sac:265-296)
    tx, ty, tz = transform_points_soa(best_R[None], best_t[None], p)
    tp = jnp.stack([tx[0], ty[0], tz[0]], axis=-1)
    d = jnp.sqrt(jnp.maximum(jnp.sum((tp - q) ** 2, axis=-1), 0.0))
    inl = (d < thr) & cvalid
    n_inl = jnp.sum(inl)
    w = inl.astype(jnp.float32)
    Rf, tf = kabsch(p[None], q[None], w[None])
    T = to_matrix4(Rf[0], tf[0])
    t2x, t2y, t2z = transform_points_soa(Rf, tf, p)
    tp2 = jnp.stack([t2x[0], t2y[0], t2z[0]], axis=-1)
    d2 = jnp.sqrt(jnp.maximum(jnp.sum((tp2 - q) ** 2, axis=-1), 0.0))
    inl2_mask = (d2 < thr) & cvalid
    inl2 = jnp.sum(inl2_mask)
    if uniformity:
        metric = uniformity_entropy(inl2_mask[None], bins3)[0]
    else:
        metric = inl2.astype(jnp.float32) / jnp.maximum(n_corr, 1.0)
    # DELIBERATE: the convergence gate is evaluated on the PRE-refit pose's
    # inliers/metric while the returned transformation/inliers/metric come
    # from the refit — exactly the reference's order (sac:276-282 tests
    # enough_inliers + min_tolerable on the rebuilt inliers of final_tn,
    # THEN refits and re-scores the returned pose)
    converged = (
        (n_inl > MIN_NR_FINAL_INLIERS)
        | (n_inl.astype(jnp.float32) > MIN_INLIER_RATE * n_corr)
    ) & (best_metric > min_tolerable)
    T = jnp.where(best_metric > min_tolerable, T, jnp.eye(4))
    return {
        "transformation": T,
        "metric": metric,
        "inliers": inl2,
        "converged": converged,
        "n_correspondences": n_corr,
        "iterations": iters_done,
    }


@partial(jax.jit, static_argnames=("cfg",))
def register_pair_step(
    src_xyz,
    src_valid,
    tgt_xyz,
    tgt_valid,
    key,
    normal_cell,
    density_cell_src,
    density_cell_tgt,
    iss_radius_src,
    iss_radius_tgt,
    feature_radius,
    distance_thr,
    vp_src=None,
    vp_tgt=None,
    cfg: FlagshipConfig = FlagshipConfig(),
):
    """Register one padded pair.  Returns dict with transformation [4,4],
    metric, inliers, converged, n_correspondences.  vp_src/vp_tgt: scanner
    viewpoints for frame-consistent normal orientation (viewpoints.csv in
    the reference; defaults to the origin like PCL).  density_cell_src/tgt
    are accepted for interface stability but the k=2 smoothed density is
    derived from the normal-cell neighbor pass (see _density_from_knn)."""

    def side(xyz, valid, iss_radius, viewpoint):
        qidx = jnp.arange(xyz.shape[0], dtype=jnp.int32)
        idx, dist, mask = _knn_fixed(
            xyz, valid, xyz, valid, normal_cell, cfg.normal_k, cfg.neighbor_cap, True,
            chunk=cfg.query_chunk,
        )
        normal, _curv, _ok = normals_from_neighbors(xyz, xyz, idx, mask, viewpoint)
        if cfg.use_iss:
            g = gridmod.build_grid(xyz, valid, iss_radius)
            iidx, _idist, imask = gridmod.radius_neighbors(
                g, xyz, valid, iss_radius, k=cfg.iss_neighbors, cap=cfg.neighbor_cap,
                include_self=False, query_index=qidx, chunk=cfg.query_chunk,
            )
            counts = jnp.sum(imask, axis=1).astype(jnp.int32) + 1
            sal, ok = _iss_saliency(xyz, valid, iidx, imask, counts)
            kp_mask = _nms(sal, ok, iidx, imask)
        else:
            kp_mask = valid
        density = _density_from_knn(idx, dist, mask, valid)
        return normal, kp_mask, density

    src_normal, src_kp, dens_s = side(src_xyz, src_valid, iss_radius_src, vp_src)
    tgt_normal, tgt_kp, dens_t = side(tgt_xyz, tgt_valid, iss_radius_tgt, vp_tgt)

    if cfg.descriptor == "shot":
        # the reference's SHIPPED descriptor (data/tests.yaml: shot +
        # gravity LRF): SHOT-352 at keypoint rows over full-cloud support
        from lidar_global_registration_tpu.ops import lrf as lrfmod
        from lidar_global_registration_tpu.ops.shot import shot as shot_full

        def shot_side(xyz, normal, valid, kp):
            frames = needs_fb = None
            if cfg.lrf == "gravity":
                frames, needs_fb = lrfmod.gravity_lrf(normal)
            return shot_full(
                xyz, valid & kp, xyz, normal, valid, feature_radius,
                frames=frames, fallback_mask=needs_fb,
                k_neighbors=cfg.shot_k, cap=cfg.shot_cap,
                chunk=cfg.query_chunk,
            )

        fq, fq_valid = shot_side(src_xyz, src_normal, src_valid, src_kp)
        ft, ft_valid = shot_side(tgt_xyz, tgt_normal, tgt_valid, tgt_kp)
    else:
        fq, fq_valid = _fpfh_fixed(src_xyz, src_normal, src_valid, src_kp, feature_radius, cfg)
        ft, ft_valid = _fpfh_fixed(tgt_xyz, tgt_normal, tgt_valid, tgt_kp, feature_radius, cfg)

    # 1-NN matching both directions (lr mutual strategy, matching.h:418-458,
    # or the inputs of the cluster consensus filter, matching.h:480-551)
    idx_st, dist_st, mask_st = matchers.match_bf(
        fq, ft, fq_valid, ft_valid, k=1, tile=cfg.match_tile, bf16=cfg.bf16_matching
    )
    idx_ts, _dist_ts, mask_ts = matchers.match_bf(
        ft, fq, ft_valid, fq_valid, k=1, tile=cfg.match_tile, bf16=cfg.bf16_matching
    )
    clustered = bool(cfg.use_iss and cfg.cluster_matching)
    if clustered:
        # the reference's DEFAULT matching strategy: spatial-consensus
        # filter on both sides, one-sided survivors
        def knn_self(pts, v, k, approx):
            return matchers.match_bf(
                pts, pts, v, v, k=k, tile=cfg.cluster_knn_tile,
                approx=approx, exclude_diag=True,
            )

        mask_st, dens_s, dens_t = _cluster_filter_rows(
            src_xyz, fq_valid, tgt_xyz, ft_valid,
            idx_st, mask_st, idx_ts, mask_ts, dens_s, dens_t, cfg, knn_self,
        )
    # correspondences as masked parallel arrays (query = row index); ONE
    # body shared with the staged/front paths so they cannot drift
    j, mutual, thr = _correspondence_stage.__wrapped__(
        idx_st, mask_st, idx_ts, mask_ts, dens_s, dens_t, distance_thr,
        require_mutual=not clustered,
    )
    return ransac_solve(src_xyz, tgt_xyz[j], thr, mutual, key, cfg)


# ---------------------------------------------------------------------------
# Staged execution: the same pipeline as register_pair_step but split into
# stage-level jits.  Compiling the whole 8-stage graph as one XLA program
# works at small N but strains the compiler at cloud scale (and the axon
# remote-compile path has failed outright on the monolithic 64k graph);
# the staged path compiles each stage in seconds and keeps all intermediates
# on device.  Use this for serving large pairs; register_pair_step remains
# the single-graph unit the mesh layer shards.
# ---------------------------------------------------------------------------
@partial(jax.jit, static_argnames=("cfg",))
def _side_stage(xyz, valid, normal_cell, iss_radius, cfg: FlagshipConfig, viewpoint=None):
    qidx = jnp.arange(xyz.shape[0], dtype=jnp.int32)
    idx, dist, mask = _knn_fixed(
        xyz, valid, xyz, valid, normal_cell, cfg.normal_k, cfg.neighbor_cap, True,
        chunk=cfg.query_chunk,
    )
    normal, _curv, _ok = normals_from_neighbors(xyz, xyz, idx, mask, viewpoint)
    density = _density_from_knn(idx, dist, mask, valid)
    if cfg.use_iss:
        g = gridmod.build_grid(xyz, valid, iss_radius)
        iidx, _idist, imask = gridmod.radius_neighbors(
            g, xyz, valid, iss_radius, k=cfg.iss_neighbors, cap=cfg.neighbor_cap,
            include_self=False, query_index=qidx, chunk=cfg.query_chunk,
        )
        counts = jnp.sum(imask, axis=1).astype(jnp.int32) + 1
        sal, ok = _iss_saliency(xyz, valid, iidx, imask, counts)
        kp_mask = _nms(sal, ok, iidx, imask)
    else:
        kp_mask = valid
    return normal, kp_mask, density


@partial(jax.jit, static_argnames=("require_mutual",))
def _correspondence_stage(idx_st, mask_st, idx_ts, mask_ts, dens_s, dens_t,
                          distance_thr, require_mutual: bool = True):
    N = idx_st.shape[0]
    j = idx_st[:, 0]
    keep = mask_st[:, 0]
    if require_mutual:
        # lr strategy (matching.h:418-458); the cluster strategy keeps
        # one-sided matches that pass the consensus test (matching.h:480-551)
        keep = keep & mask_ts[j, 0] & (idx_ts[j, 0] == jnp.arange(N, dtype=jnp.int32))
    thr = jnp.minimum(jnp.maximum(dens_s, dens_t[j]), distance_thr)
    thr = jnp.where(thr > 0, thr, distance_thr)
    return j, keep, thr


def _consensus_keep(i_st0, m_st0, i_ts0, m_ts0, kq, kt, cfg: FlagshipConfig):
    """ONE body for the cluster gate (ClusterMatcher, matching.h:480-551),
    shared by the staged compacted path and _cluster_filter_rows so the two
    cannot drift: the two-sided consensus-distance threshold followed by the
    consensus-ranked top-max_correspondences cap.  kq/kt = (idx, dist, mask)
    self-excluded keypoint kNN per side; i/m_*0 are the 1-NN match columns.
    Returns keep_q over source-direction rows."""
    from lidar_global_registration_tpu.models.pyramid import _cluster_distances

    kq_idx, _d1, kq_m = kq
    kt_idx, _d2, kt_m = kt
    d_i = _cluster_distances(i_st0, m_st0, kq_idx, kq_m, kt_idx, kt_m)
    d_j = _cluster_distances(i_ts0, m_ts0, kt_idx, kt_m, kq_idx, kq_m)
    thr_c = jnp.float32(cfg.cluster_threshold)
    # only the SOURCE-direction survivors are consumed (the clustered
    # correspondence stage is one-sided, matching.h:524-550); d_j — the
    # target-direction consensus distances — still gates keep_q
    score_q = jnp.maximum(d_i, d_j[i_st0])
    keep_q = (d_i < thr_c) & (d_j[i_st0] < thr_c) & m_st0
    # the reference keeps every survivor of the 0.95 gate; at high keypoint
    # counts that floods RANSAC with low-precision matches (3-point sampling
    # needs ~1/f^3 draws at inlier fraction f).  Rank survivors by consensus
    # strength (the same cluster distance the reference stores per
    # correspondence) and keep the most consistent max_correspondences.
    K = cfg.max_correspondences
    if K > 0 and K < score_q.shape[0]:
        sq_scores = jnp.where(keep_q, score_q, jnp.inf)
        kth_q = jnp.sort(sq_scores)[K - 1]
        keep_q = keep_q & (sq_scores <= kth_q)
    return keep_q


def _kp_density_nearest(kn_idx, kn_d, kn_m):
    """k=2-smoothed keypoint-cloud density from a self-excluded 1-NN
    (column 0 = nearest NON-SELF keypoint): calculateSmoothedDensities over
    the keypoint cloud, matching.h:396-397 — keypoint localization error
    scales with keypoint spacing, not raw point spacing."""
    d_raw = jnp.where(kn_m[:, 0], kn_d[:, 0], 0.0)
    nn = kn_idx[:, 0]
    d_nn = jnp.where(kn_m[:, 0], d_raw[nn], d_raw)
    return jnp.minimum(d_raw, jnp.where(d_nn > 0, d_nn, d_raw))


def _cluster_filter_rows(xyz_s, kpv_s, xyz_t, kpv_t,
                         idx_st, mask_st, idx_ts, mask_ts,
                         dens_s, dens_t, cfg, knn_self):
    """Spatial-consensus (cluster) filter over FULL-row arrays — the
    reference's default ClusterMatcher (matching.h:480-551) for the
    uncompacted monolithic/tensor-parallel paths; semantics mirror the
    staged compacted path (one-sided survivors, self-excluded consensus
    sets, consensus-ranked max_correspondences cap, thresholds at
    keypoint-cloud density).

    knn_self(points, valid, k, approx) -> (idx, dist, mask): same-set kNN
    with self excluded BY ID — single-device match_bf(exclude_diag) or the
    tensor-parallel shard merge.  Returns (mask_st', dens_s', dens_t')."""
    N_s, N_t = xyz_s.shape[0], xyz_t.shape[0]
    kc = max(2, min(cfg.cluster_k, min(N_s, N_t) - 1))

    def centered(x, v):
        w = v.astype(jnp.float32)[:, None]
        return x - jnp.sum(x * w, axis=0) / jnp.maximum(jnp.sum(w), 1e-9)

    ksq = centered(xyz_s, kpv_s)
    kst = centered(xyz_t, kpv_t)
    kq = knn_self(ksq, kpv_s, kc, cfg.cluster_approx_knn)
    kt = knn_self(kst, kpv_t, kc, cfg.cluster_approx_knn)
    keep_q = _consensus_keep(idx_st[:, 0], mask_st[:, 0],
                             idx_ts[:, 0], mask_ts[:, 0], kq, kt, cfg)
    if cfg.cluster_approx_knn:
        # per-pair thresholds need the EXACT nearest keypoint (see the
        # staged path): one exact 1-NN per side
        kq1 = knn_self(ksq, kpv_s, 1, False)
        kt1 = knn_self(kst, kpv_t, 1, False)
    else:
        kq1, kt1 = kq, kt
    dens_s2 = jnp.where(kpv_s, _kp_density_nearest(*kq1), dens_s)
    dens_t2 = jnp.where(kpv_t, _kp_density_nearest(*kt1), dens_t)
    return mask_st & keep_q[:, None], dens_s2, dens_t2


@partial(jax.jit, static_argnames=("cfg", "kc", "have_cand"))
def _compact_match_corr_stage(fqc, ftc, cand, qv, tv, sqj, stj, sq_g, st_g,
                              src_xyz, tgt_xyz, dens_s, dens_t, distance_thr,
                              cfg: FlagshipConfig, kc: int, have_cand: bool):
    """ONE program for the whole compacted matching region: descriptor 1-NN
    (or the pyramid's cross-level vote winners), the cluster consensus
    filter, per-pair thresholds, full-row scatters and the correspondence
    stage.

    Round-4 ran this as ~8 separate dispatches (two match_bf programs, two
    consensus-kNN programs, two exact 1-NN programs, eager gather/scatter
    glue, then the jitted correspondence stage); each boundary
    materializes intermediates in HBM and pays a launch on the tunneled
    runtime — the same launch-bound regime the SHOT-side fusion fixed
    (BASELINE.md round-5).  All shapes are static given (mq, mt, N_all);
    the only host sync in the whole matching path remains the keypoint
    COUNT pull before compaction."""
    N_all = src_xyz.shape[0]
    if have_cand:
        ic_st, mc_st, ic_ts, mc_ts = cand
    else:
        ic_st, _dc1, mc_st = matchers.match_bf(
            fqc, ftc, qv, tv, k=1, tile=cfg.match_tile,
            bf16=cfg.bf16_matching,
        )
        ic_ts, _dc2, mc_ts = matchers.match_bf(
            ftc, fqc, tv, qv, k=1, tile=cfg.match_tile,
            bf16=cfg.bf16_matching,
        )
    clustered = bool(cfg.use_iss and cfg.cluster_matching)
    if clustered:
        # spatial-consensus (cluster) filter — the reference's DEFAULT
        # matching strategy (ClusterMatcher, matching.h:480-551): a match
        # survives only if >= 1 - threshold of its cluster_k nearest
        # keypoints' matches land inside the counterpart's keypoint
        # neighborhood, on BOTH sides.  Pure mutual 1-NN has no defense
        # against repetitive structure; this is what disambiguates it.
        # Keypoint kNN reuses the descriptor matcher with xyz as a 3-d
        # "descriptor" (exact L2 k-NN on the MXU).  DELIBERATE deviation
        # from PCL's nearestKSearch (and the reference-faithful pyramid
        # path): the SELF neighbor is excluded from the consensus sets —
        # with self included every match gets one consistent pair for
        # free, which floods the 0.95 gate at high keypoint density
        # (measured at 1M: 4305 survivors with 0 usable inliers vs 197
        # survivors and a correct pose without self).  Exclusion is BY ID
        # (exclude_diag): positional "column 0 is self" breaks under the
        # approximate per-tile merge and under exact distance ties.
        # center per side before the matmul-kNN: |q|^2+|t|^2-2q.t in f32
        # loses inter-keypoint geometry for georeferenced coordinates far
        # from the origin
        ksq = src_xyz[sq_g]
        kst = tgt_xyz[st_g]
        ksq = ksq - jnp.mean(jnp.where(qv[:, None], ksq, 0.0), axis=0) / jnp.maximum(jnp.mean(qv.astype(jnp.float32)), 1e-9)
        kst = kst - jnp.mean(jnp.where(tv[:, None], kst, 0.0), axis=0) / jnp.maximum(jnp.mean(tv.astype(jnp.float32)), 1e-9)
        kq_idx, kq_d, kq_m = matchers.match_bf(
            ksq, ksq, qv, qv, k=kc, tile=cfg.cluster_knn_tile,
            approx=cfg.cluster_approx_knn, exclude_diag=True,
        )
        kt_idx, kt_d, kt_m = matchers.match_bf(
            kst, kst, tv, tv, k=kc, tile=cfg.cluster_knn_tile,
            approx=cfg.cluster_approx_knn, exclude_diag=True,
        )
        keep_q = _consensus_keep(
            ic_st[:, 0], mc_st[:, 0], ic_ts[:, 0], mc_ts[:, 0],
            (kq_idx, kq_d, kq_m), (kt_idx, kt_d, kt_m), cfg,
        )
        mc_st = mc_st & keep_q[:, None]
        if cfg.cluster_approx_knn:
            # the consensus sets tolerate the ~0.95-recall per-tile
            # approximation, but the per-pair THRESHOLDS do not: a missed
            # true nearest keypoint loosens thr exactly on the rows where
            # the estimate failed.  One exact 1-NN per side is cheap (D=3
            # MXU pass) next to the k=cluster_k consensus kNN above.
            kq1_i, kq1_d, kq1_m = matchers.match_bf(
                ksq, ksq, qv, qv, k=1, tile=cfg.cluster_knn_tile,
                approx=False, exclude_diag=True,
            )
            kt1_i, kt1_d, kt1_m = matchers.match_bf(
                kst, kst, tv, tv, k=1, tile=cfg.cluster_knn_tile,
                approx=False, exclude_diag=True,
            )
        else:
            kq1_i, kq1_d, kq1_m = kq_idx, kq_d, kq_m
            kt1_i, kt1_d, kt1_m = kt_idx, kt_d, kt_m
        dens_s = dens_s.at[sqj].set(
            _kp_density_nearest(kq1_i, kq1_d, kq1_m), mode="drop"
        )
        dens_t = dens_t.at[stj].set(
            _kp_density_nearest(kt1_i, kt1_d, kt1_m), mode="drop"
        )
    # scatter back to full rows, mapping compact train ids to originals
    zi = jnp.zeros((N_all, 1), jnp.int32)
    zm = jnp.zeros((N_all, 1), bool)
    idx_st = zi.at[sqj].set(
        st_g[ic_st[:, 0]].astype(jnp.int32)[:, None], mode="drop"
    )
    mask_st = zm.at[sqj].set((mc_st[:, 0] & qv)[:, None], mode="drop")
    if clustered:
        # one-sided stage: the target-direction scatters would never be
        # read (require_mutual=False) — skip the two full-N scatters
        idx_ts, mask_ts = zi, zm
    else:
        idx_ts = zi.at[stj].set(
            sq_g[ic_ts[:, 0]].astype(jnp.int32)[:, None], mode="drop"
        )
        mask_ts = zm.at[stj].set((mc_ts[:, 0] & tv)[:, None], mode="drop")
    return _correspondence_stage.__wrapped__(
        idx_st, mask_st, idx_ts, mask_ts, dens_s, dens_t, distance_thr,
        require_mutual=not clustered,
    )


@partial(jax.jit, static_argnames=("k_neighbors", "cap", "chunk", "approx",
                                   "gravity"))
def _shot_side_fused(kp_xyz, kp_normal, kpv, surf_xyz, surf_normal,
                     surf_valid, radius, k_neighbors: int, cap: int, chunk,
                     approx: bool, gravity: bool):
    """ONE XLA program for a whole SHOT side: gravity frames + grid build +
    radius query + SHOT-LRF fallback + quadrilinear histogram.

    Round-4 ran build_grid/radius_neighbors as EAGER op dispatches (dozens
    of individual launches per side over the tunneled runtime) with only
    the core jitted; sub-second rows were launch-latency bound on exactly
    this (BASELINE.md round-4 close-out).  Fusing the side into one program
    brings the SHOT stage's launch count down to the FPFH stage's
    (VERDICT r4 #3) and lets XLA fuse the query's distance math into the
    histogram gathers."""
    from lidar_global_registration_tpu.ops import lrf as lrfmod
    from lidar_global_registration_tpu.ops.shot import shot as shot_full

    frames = needs_fb = None
    if gravity:
        frames, needs_fb = lrfmod.gravity_lrf(kp_normal)
    return shot_full(
        kp_xyz, kpv, surf_xyz, surf_normal, surf_valid, radius,
        frames=frames, fallback_mask=needs_fb, k_neighbors=k_neighbors,
        cap=cap, chunk=chunk, approx=approx,
    )


@partial(jax.jit, static_argnames=("cfg",))
def _ransac_stage(p, q, thr, cvalid, key, cfg: FlagshipConfig):
    return ransac_solve(p, q, thr, cvalid, key, cfg)


@partial(jax.jit, static_argnames=("M",))
def _corr_subset(p, q, cvalid, M: int):
    """ransac_solve's compaction, standalone for the GROR solver stage."""
    sel = _subset_sel(cvalid, M)
    return p[sel], q[sel], cvalid[sel]


@partial(jax.jit, static_argnames=("M",))
def _corr_export(j, mutual, thr, M: int):
    """Compacted (query, match, threshold, valid) arrays of the surviving
    correspondence set — the staged path's export for the CLI/measure
    harness, which persists the reference's correspondence CSV cache
    (query_idx, match_idx, threshold; alignment.cpp:87,
    common.cpp:1223-1266).  Valid rows first, row order kept."""
    sel = _subset_sel(mutual, M)
    return sel.astype(jnp.int32), j[sel].astype(jnp.int32), thr[sel], mutual[sel]


def _gror_stage(p, q, cvalid, distance_thr: float, cfg: FlagshipConfig):
    """Staged-path GROR solver (alignment: gror, alignment.cpp:21-35):
    graph-reliability optimal search over the compacted correspondence set
    with resolution = distance_thr, returning the same result dict as
    _ransac_stage (host values — the solver is host-orchestrated around
    fixed-shape jitted kernels, see gror.gror_solve)."""
    import numpy as np_

    from lidar_global_registration_tpu.models.gror import gror_solve

    # Compact to the FULL realized correspondence count (quantum-padded for
    # compile-bucket stability), never a silent subsample: the reference
    # ranks its top-800 nodes over ALL correspondences
    # (ia_gror.hpp:126-194); round 3 pre-capped at ransac_compact=4096
    # rows, which dropped real correspondences whenever the matcher
    # produced more (VERDICT r3 weak #6).  gror_solve's degree pass is
    # row-chunked, so the full set costs only the O(n) degree scan.
    n = int(np_.asarray(jnp.sum(cvalid.astype(jnp.int32))))
    M = min(_pad_quantum(max(n, 1)), p.shape[0])
    if M < p.shape[0]:
        p, q, cvalid = _corr_subset(p, q, cvalid, M)
    dump = os.environ.get("LGR_GROR_DUMP")
    if dump:
        # debug hook: capture the exact correspondence set entering the
        # solver (offline re-runs of hard cases, tools/debug workflows)
        np_.savez(dump, p=np_.asarray(p), q=np_.asarray(q),
                  valid=np_.asarray(cvalid), thr=float(distance_thr))
    return gror_solve(p, q, cvalid, float(distance_thr))


@jax.jit
def _kp_counts(a, b):
    return jnp.stack([jnp.sum(a.astype(jnp.int32)), jnp.sum(b.astype(jnp.int32))])


def _pad_quantum(a: int) -> int:
    """Pad a keypoint count to a ~12.5%-granularity bucket: a fixed
    quantum put bucket boundaries every 1024 rows, so run-to-run count
    jitter (e.g. 13.3k vs 13.4k at 1M) could cross a boundary and
    recompile the match/RANSAC programs (~30 s remote) mid-benchmark."""
    a = max(a, 1)
    m = max(1024, 1 << max(a.bit_length() - 3, 0))
    return int(-(-a // m) * m)


@partial(jax.jit, static_argnames=("m",))
def _compact_rows(v, n, m: int):
    """First m row ids of the valid prefix (stable: ascending original
    order, like np.nonzero); padding entries get the out-of-bounds sentinel
    v.shape[0] so scatters with mode='drop' ignore them.  Total in m: a pad
    quantum larger than the array itself (tiny clouds hit the 1024-row
    floor; low-shrink downsamples overshoot the 12.5% bucket) yields pure
    sentinel rows past v.shape[0] instead of a broadcast error."""
    n0 = v.shape[0]
    idx = jnp.argsort(~v)[:m]
    if m > n0:
        idx = jnp.concatenate(
            [idx, jnp.full((m - n0,), n0, idx.dtype)]
        )
    return jnp.where(jnp.arange(m) < n, idx, n0)


@jax.jit
def _pre_downsample_full(xyz, valid, voxel):
    from lidar_global_registration_tpu.ops.downsample import voxel_centroids

    return voxel_centroids(xyz, valid, voxel)


@jax.jit
def _aabb_pair(src_xyz, src_valid, tgt_xyz, tgt_valid):
    big = jnp.float32(3.0e37)

    def one(xyz, valid):
        m = jnp.where(valid[:, None], xyz, big)
        mm = jnp.where(valid[:, None], xyz, -big)
        lo = jnp.min(m, axis=0)
        hi = jnp.max(mm, axis=0)
        lo = jnp.where(jnp.isfinite(lo), lo, 0.0)
        hi = jnp.where(jnp.isfinite(hi), hi, 0.0)
        return jnp.stack([lo, hi])

    return jnp.stack([one(src_xyz, src_valid), one(tgt_xyz, tgt_valid)])


def _voxel_bits(lo, hi, voxel):
    """Per-axis key bits for voxel_centroids_packed, quantized to even
    widths so run-to-run extent jitter does not recompile; None when the
    packed key would not fit 30 bits."""
    bits = []
    for ax in range(3):
        if not (hi[ax] >= lo[ax]):  # empty cloud: _aabb_pair's +-3e37
            return None  # sentinels (or NaN) — packed path undefined
        ncells = int(np.floor((hi[ax] - lo[ax]) / voxel + 0.5)) + 3
        b = max(1, int(np.ceil(np.log2(ncells))))
        bits.append(b + (b & 1))  # round up to even
    if sum(bits) > 30:
        return None
    return tuple(bits)


@partial(jax.jit, static_argnames=("m",))
def _compact_xyz(xyz, valid, n, m: int):
    n0 = xyz.shape[0]
    sj = _compact_rows(valid, n, m)
    g = jnp.minimum(sj, n0 - 1)
    return xyz[g], valid[g] & (sj < n0)


def pre_downsample_pair(src_xyz, src_valid, tgt_xyz, tgt_valid,
                        voxel_src, voxel_tgt, aabb=None):
    """Loader-equivalent fine pre-downsample for the staged path: the
    reference ALWAYS voxel-downsamples each scan at
    FINE_VOXEL_SIZE_COEFFICIENT (=2) x density before alignment
    (loadPointClouds, common.cpp:444-464; pipeline.preprocess_cloud is
    the host-path equivalent).  Returns compacted (xyz, valid) per side,
    padded to a ~12.5% count quantum (ONE stacked count pull total).

    At 10M points/side this is ALSO the dominant scale lever: a 2.5D
    scan at spacing d keeps ~(d/voxel)^2 = 1/4 of its points, and every
    downstream pass cost scales with the valid count."""
    import numpy as np_

    from lidar_global_registration_tpu.ops.downsample import (
        voxel_centroids_packed,
    )

    # one pulled AABB sizes the packed single-key sort (measured ~2x over
    # the 3-key lexsort at 10.5M points/side); oversize grids fall back.
    # Callers that know the scene bounds (a measure loop re-running the
    # same pair) can pass `aabb` ([2, 2, 3] lo/hi per side) to skip the
    # per-call pull, as the reference derives per-test params once.
    if aabb is None:
        aabb = np_.asarray(_aabb_pair(src_xyz, src_valid, tgt_xyz, tgt_valid))
    else:
        aabb = np_.asarray(aabb)
    bits_s = _voxel_bits(aabb[0, 0], aabb[0, 1], voxel_src)
    bits_t = _voxel_bits(aabb[1, 0], aabb[1, 1], voxel_tgt)

    def _down(xyz, valid, voxel, lo, bits):
        if bits is None:
            return _pre_downsample_full(xyz, valid, jnp.float32(voxel))
        origin = jnp.asarray(lo - 0.5 * voxel, jnp.float32)
        return voxel_centroids_packed(xyz, valid, jnp.float32(voxel),
                                      origin, bits)

    dx_s, dv_s, n_s_dev = _down(src_xyz, src_valid, voxel_src,
                                aabb[0, 0], bits_s)
    dx_t, dv_t, n_t_dev = _down(tgt_xyz, tgt_valid, voxel_tgt,
                                aabb[1, 0], bits_t)
    n_s, n_t = (int(x) for x in np_.asarray(jnp.stack([n_s_dev, n_t_dev])))
    # one shared capacity: the staged path's compaction clamps assume
    # equal row counts on both sides.  Clamped to the input capacity: a
    # low-shrink cloud (spacing already >= the fine voxel) can keep enough
    # rows that the 12.5% pad quantum overshoots the array itself.  The
    # equal-capacity precondition is load-bearing: with unequal inputs the
    # clamp could drop the larger side's valid rows as a spatially
    # coherent prefix (a pose-biasing truncation) — fail loudly instead.
    if int(dx_s.shape[0]) != int(dx_t.shape[0]):
        raise ValueError(
            f"pre_downsample_pair requires equal padded capacities "
            f"(got {dx_s.shape[0]} vs {dx_t.shape[0]}); pad both sides "
            "to one shared capacity first"
        )
    m = min(max(_pad_quantum(n_s), _pad_quantum(n_t)), int(dx_s.shape[0]))
    sx, sv = _compact_xyz(dx_s, dv_s, n_s, m)
    tx, tv = _compact_xyz(dx_t, dv_t, n_t, m)
    return sx, sv, tx, tv


def register_pair_staged(
    src_xyz, src_valid, tgt_xyz, tgt_valid, key,
    normal_cell, density_cell_src, density_cell_tgt,
    iss_radius_src, iss_radius_tgt, feature_radius, distance_thr,
    vp_src=None,
    vp_tgt=None,
    cfg: FlagshipConfig = FlagshipConfig(),
    return_correspondences: bool = False,
    aabb=None,
):
    """Stage-jitted registration path — the benched/shipped configuration.

    `aabb` (host [2, 2, 3]: per side lo/hi, e.g. the array
    pre_downsample_pair pulled) is an optional scene-bounds upper bound;
    when present the feature-scale voxel surfaces use the packed
    single-key downsample (voxel_centroids_map_packed, ~30x the lexsort
    map at 10M) with key bits sized from it.  Absent or oversized bounds
    fall back to the lexsort map — identical voxel partition either way
    (the grid anchors at each cloud's own min in both paths).

    Shares register_pair_step's kernels and RANSAC body, but is NOT
    semantically identical under the default config: this path honors
    cluster_matching (spatial-consensus filter + consensus-ranked cap),
    feature_scale (per-scale descriptor surface), descriptor='shot' and
    alignment='gror', none of which the monolithic single-graph
    register_pair_step executes (it always runs mutual 1-NN over raw-cloud
    FPFH + RANSAC — the minimum slice kept for the mesh-sharded and
    compile-check paths).

    Set LGR_STAGE_TIMING=1 to print per-stage wall times (adds blocking
    between stages)."""
    import os
    import time as _time

    from lidar_global_registration_tpu.ops.fpfh import fpfh as fpfh_full

    timing = os.environ.get("LGR_STAGE_TIMING") == "1"

    def _t(label, out):
        if timing:
            # force a host transfer: block_until_ready returns early on some
            # tunneled runtimes
            import numpy as _np

            for leaf in jax.tree_util.tree_leaves(out):
                if not hasattr(leaf, "ndim"):
                    continue  # host scalar (the gror stage returns those)
                # flat [1] slice: forces the whole buffer to compute but
                # transfers 4 B — leaf[..., :1] of an [N, 1] output moved
                # the ENTIRE array over the tunnel (~40 s at 10M), charging
                # transfer time to whatever stage produced a 2-D output
                _np.asarray(leaf if leaf.ndim == 0 else leaf.reshape(-1)[:1])
            now = _time.perf_counter()
            print(f"#   stage {label}: {now - _t.last:.3f}s", flush=True)
            _t.last = now
        return out

    _t.last = _time.perf_counter()

    # the staged path sizes target-side scatter buffers and compaction
    # clamps with the SOURCE capacity — unequal capacities would silently
    # drop or misroute target rows, so fail loudly up front
    if src_xyz.shape[0] != tgt_xyz.shape[0]:
        raise ValueError(
            f"register_pair_staged requires equal padded capacities "
            f"(got src {src_xyz.shape[0]} vs tgt {tgt_xyz.shape[0]})"
        )

    # The host orchestration below makes cell-size decisions from the
    # scalar radii.  Host scalars (python/numpy) convert for free; device
    # scalars need a pull, batched into ONE stacked transfer (each pull is
    # a full round-trip on tunneled runtimes).  The floats are passed
    # straight back into the stage jits (a Python float is a traced f32
    # argument, not a baked constant — no per-value recompiles).
    import numpy as _np0

    _rvals = (normal_cell, density_cell_src, density_cell_tgt,
              iss_radius_src, iss_radius_tgt, feature_radius, distance_thr)
    if any(isinstance(v, jax.Array) for v in _rvals):
        _rvals = tuple(_np0.asarray(jnp.stack([
            jnp.asarray(v, jnp.float32) for v in _rvals
        ])))
    (normal_cell, density_cell_src, density_cell_tgt, iss_radius_src,
     iss_radius_tgt, feature_radius, distance_thr) = (
        float(v) for v in _rvals
    )

    def _fs_map(xyz, valid, voxel, which):
        """Feature-scale voxel surface + row map for one side: the packed
        single-key path when `aabb` gives a host bit bound for this side
        (which: 'src'/'tgt'), else the lexsort voxel_centroids_map.  Both
        anchor the grid at the cloud's own min — same voxel partition."""
        from lidar_global_registration_tpu.ops.downsample import (
            voxel_centroids_map,
            voxel_centroids_map_packed,
        )

        if aabb is not None:
            import numpy as _np1

            side = 0 if which == "src" else 1
            lo = _np1.asarray(aabb[side][0], _np1.float64)
            hi = _np1.asarray(aabb[side][1], _np1.float64)
            bits = _voxel_bits(lo, hi, float(voxel))
            if bits is not None:
                return voxel_centroids_map_packed(
                    xyz, valid, jnp.float32(voxel), bits
                )
        return voxel_centroids_map(xyz, valid, voxel)

    cells_env = os.environ.get("LGR_CELL_FPFH", "1")
    use_cells = (
        cfg.use_cell_fpfh
        and cells_env != "0"
        # "force": run the Pallas cell path in interpret mode off-TPU (tests)
        and (cells_env == "force" or jax.default_backend() in ("tpu", "axon"))
    )

    def _side_stage_host(xyz, valid, iss_radius, vp):
        if use_cells:
          try:
            # fused Pallas passes (normals + curvature + density + ISS,
            # ops/pallas/cellgrid.py, parity tests in tests/test_cell_*.py);
            # surface and ISS share ONE sorted grid (cell = max radius)
            from lidar_global_registration_tpu.ops.pallas.cellgrid import (
                surface_cells,
                surface_iss_cells,
            )

            if cfg.use_iss:
                out = surface_iss_cells(xyz, valid, normal_cell, iss_radius, vp)
                return out["normal"], out["kp"], out["density"]
            normal, _curv, density, _eig, _ok = surface_cells(
                xyz, valid, normal_cell, vp
            )
            return normal, valid, density
          except ValueError as e:  # cell occupancy beyond the kernel cap
            print(f"# cell side pass -> XLA fallback: {e}", flush=True)
        return _side_stage(xyz, valid, normal_cell, iss_radius, cfg, vp)

    def _side_stage_masked(plan_n, plan_f, iss_radius, vp, shot: bool):
        """Keypoint-regime fast path: ISS first (positions only), then the
        surface pass ONLY on cell blocks whose normals/density a later
        stage reads — SPFH support (2 feature cells of a keypoint cell) for
        FPFH, 1 cell for SHOT.  Identical values at every consumed row
        (tests/test_cell_masked.py); the reference likewise computes
        features on keypoint clouds only (feature_analysis.cpp).  Returns
        (normal, kp, density)."""
        from lidar_global_registration_tpu.ops.pallas.cellgrid import (
            surface_iss_masked,
        )

        # fused ISS + need-masked surface: one packed build, one program
        normal, kp, density, _sal = surface_iss_masked(
            plan_n, plan_f, normal_cell, iss_radius, viewpoint=vp, shot=shot
        )
        return normal, kp, density

    def _shot_stage(kp_xyz, kp_normal, kpv, surf_xyz, surf_normal,
                    surf_valid, spacing, radius=None):
        """SHOT-352 at (compacted) keypoints over the full-cloud support
        (shot_debug.cpp:24-219).  cfg.lrf='gravity': z = keypoint normal,
        y = gravity x z (common.cpp:712-734), with the SHOT-LRF fallback for
        normals within 0.04 rad of gravity — on flat ground that is MOST
        keypoints, so the fallback frames are computed unconditionally and
        blended on device (no host sync).  The whole side (frames + grid +
        query + histogram) runs as ONE program (_shot_side_fused)."""
        if radius is None:
            radius = feature_radius
        # degenerate gravity frames fall back to the SHOT-LRF computed over
        # the FULL surface support, reusing shot()'s own neighbor query
        # (keypoint-only support gave sparse, unstable fallback frames).
        # cell_cap must hold a feature-radius cell of the FULL surface:
        # overflow drops points in CLOUD order — a spatially biased,
        # side-asymmetric truncation (nearest-k truncation is fine).  The
        # expected occupancy is (radius / spacing)^2 for a 2.5D scan.
        cap = cfg.shot_cap
        try:
            # `spacing` is the SUPPORT cloud's point spacing — callers pass
            # the side's own density (the pair max would underestimate the
            # denser side's cell occupancy on heterogeneous pairs and
            # trigger the biased cloud-order truncation described above).
            # 2.5x margin over the flat-scan estimate (slopes up to ~66 deg
            # keep full cells), rounded up to a lane multiple of 128 —
            # pow2 rounding doubled the candidate slots whenever the
            # estimate crossed a power of two (the query cost is linear in
            # cap: 4.69 s at cap=512 vs 3.68 s at 256 for 98k queries,
            # tools/profile_shot_query.py).
            occ = 2.5 * (float(radius) / max(float(spacing), 1e-9)) ** 2
            cap = int(min(2048, max(cfg.shot_cap,
                                    128 * int(np.ceil(occ / 128.0)))))
        except (TypeError, jax.errors.TracerArrayConversionError):
            pass  # traced radii: keep the static default
        return _shot_side_fused(
            kp_xyz, kp_normal, kpv, surf_xyz, surf_normal, surf_valid,
            jnp.float32(radius), k_neighbors=cfg.shot_k, cap=cap,
            chunk=cfg.query_chunk, approx=gridmod.approx_topk_default(),
            gravity=cfg.lrf == "gravity",
        )

    def _fpfh_stage(xyz, normal, valid, kp_mask):
        if use_cells:
          try:
            # fused Pallas cell kernel: uncapped radius neighborhoods like
            # pcl::FPFHEstimationOMP's radiusSearch (common.h:322-332),
            # parity-tested vs fpfh_full in tests/test_cell_fpfh.py
            # (ops/pallas/cellgrid.py)
            from lidar_global_registration_tpu.ops.pallas.cellgrid import fpfh_cells

            feat, fv = fpfh_cells(xyz, normal, valid, feature_radius)
            return feat, fv & kp_mask
          except ValueError as e:
            print(f"# cell FPFH -> XLA fallback: {e}", flush=True)
        return fpfh_full(
            xyz, valid & kp_mask, xyz, normal, valid, feature_radius,
            kp_normal=normal, k_neighbors=cfg.feature_neighbors,
            cap=cfg.feature_cap, chunk=cfg.query_chunk,
        )

    shot_mode = cfg.descriptor == "shot"
    masked = use_cells and cfg.use_iss and cfg.masked_features
    from lidar_global_registration_tpu.types import FEATURE_NR_POINTS as _FNR

    _voxel_f = float(np.sqrt(np.pi * feature_radius**2 / _FNR))
    fs_mode = (
        masked
        and cfg.cluster_matching
        and cfg.feature_scale
        # cheap host pre-gate: when the per-scale voxel is below the k=2
        # density quantile the downsample merges almost nothing (density
        # overestimates spacing 2-3x on real scans, so derived radii pass
        # comfortably); the exact n_small gate below still decides
        and _voxel_f >= 0.9 * max(density_cell_src, density_cell_tgt)
        and os.environ.get("LGR_FEATURE_SCALE", "1") != "0"
    )
    fs_done = False
    pyr_match = None
    if fs_mode and cfg.pyramid:
        # ------------------------------------------------------------------
        # TPU-speed MULTI-SCALE pyramid (matching.h:163-354): per-keypoint
        # log2-bucketed feature radii from local density, one voxel surface
        # + per-scale normals + descriptors per occupied bucket, cross-level
        # candidate concat + spatial-consensus vote.  TPU-first shape
        # design: descriptors are evaluated for the FULL compacted keypoint
        # set at every level with a per-level bucket VALIDITY mask
        # (levels are cumulative, matching.h:222-227, so the top level
        # holds every keypoint anyway) — one compiled program per stage
        # reused across levels, instead of per-level dynamic gathers.
        try:
            from lidar_global_registration_tpu.models.pyramid import (
                _consensus_vote,
            )
            from lidar_global_registration_tpu.ops.downsample import (
                voxel_centroids_map,
            )
            from lidar_global_registration_tpu.ops.pallas.cellgrid import (
                fpfh_pass,
                iss_pass,
                plan_grid_many,
                set_normals,
                surface_pass,
            )
            from lidar_global_registration_tpu.types import (
                FEATURE_NR_POINTS,
                NORMAL_NR_POINTS,
            )

            import numpy as np_

            N_all_ = src_valid.shape[0]
            B_LO, B_HI = -24, 24  # absolute log2-bucket window of the
            # histogram pull (radii from 6e-8 to 1.7e7 m cover any scan)
            n_bins = B_HI - B_LO + 1
            ls = float(np.log2(cfg.scale_factor))

            z_s = jnp.zeros_like(src_xyz)
            z_t = jnp.zeros_like(tgt_xyz)
            pi_s, pi_t = plan_grid_many([
                (src_xyz, z_s, src_valid, iss_radius_src),
                (tgt_xyz, z_t, tgt_valid, iss_radius_tgt),
            ])
            src_kp, _sal_s = _t("side_src", iss_pass(pi_s, iss_radius_src))
            tgt_kp, _sal_t = _t("side_tgt", iss_pass(pi_t, iss_radius_tgt))

            def _bucket_rows(xyz, valid, kp, dcell):
                """Per-row log2 bucket of the density-derived feature radius
                (matching.h:177-208: d = dist to the 5th self-inclusive NN,
                r = sqrt(feature_nr d^2 / pi)) + the keypoint-row bucket
                histogram for the host pull."""
                _i4, d4m, m4 = _knn_fixed(
                    xyz, valid, xyz, valid, 4.0 * dcell, 5, 64, True,
                    chunk=cfg.query_chunk,
                )
                # rows whose 5th NN lies beyond the 4*dcell window are the
                # SPARSE far-field tail — the rows the pyramid exists to
                # serve.  Falling back to the global mean cell (round-4
                # behavior) under-estimated their radii and dropped them
                # into too-low buckets; instead use the per-row
                # radius-bounded estimate: c self-inclusive points in the
                # window disk => local 5-NN distance ~ window * sqrt(5/c)
                # (uniform-disk occupancy), a lower bound that still scales
                # with the row's true sparsity.
                cnt4 = jnp.sum(m4, axis=1).astype(jnp.float32)
                est = 4.0 * dcell * jnp.sqrt(5.0 / jnp.maximum(cnt4, 1.0))
                d4 = jnp.where(m4[:, 4], d4m[:, 4], est)
                found = m4[:, 4]  # exact 5-NN (vs windowed estimate) rows
                r_row = jnp.sqrt(FEATURE_NR_POINTS * d4 * d4 / np.pi)
                li = jnp.clip(
                    jnp.floor(
                        jnp.log2(jnp.maximum(r_row, 1e-7)) / ls
                    ).astype(jnp.int32),
                    B_LO, B_HI,
                )
                hist = jnp.zeros((n_bins,), jnp.int32).at[li - B_LO].add(
                    (kp & valid).astype(jnp.int32)
                )
                return li, hist, found

            li_s, hist_s, fnd_s = _bucket_rows(src_xyz, src_valid, src_kp,
                                               density_cell_src)
            li_t, hist_t, fnd_t = _bucket_rows(tgt_xyz, tgt_valid, tgt_kp,
                                               density_cell_tgt)
            cnt = np_.asarray(jnp.concatenate([
                jnp.stack([jnp.sum(src_kp.astype(jnp.int32)),
                           jnp.sum(tgt_kp.astype(jnp.int32))]),
                hist_s, hist_t,
            ]))
            n_kp_s, n_kp_t = int(cnt[0]), int(cnt[1])
            if not (0 < n_kp_s <= N_all_ // 2 and 0 < n_kp_t <= N_all_ // 2):
                raise ValueError(
                    f"kp counts {n_kp_s}/{n_kp_t} of {N_all_} rows outside "
                    "the compaction precondition"
                )

            def _prune(counts_abs):
                """Sparse-level pruning (matching.h:196-204): drop bottom
                levels holding <10% of the peak, top levels <0.1%."""
                nz = np_.nonzero(counts_abs)[0]
                if len(nz) == 0:
                    raise ValueError("no occupied pyramid buckets")
                lo, hi = int(nz[0]), int(nz[-1])
                counts = counts_abs[lo:hi + 1].astype(np_.int64)
                maxc = int(counts.max())
                while 10 * counts[0] < maxc:
                    counts = counts[1:]
                    lo += 1
                while 1000 * counts[-1] < maxc:
                    counts = counts[:-1]
                    hi -= 1
                return lo + B_LO, hi + B_LO

            min_s, max_s = _prune(cnt[2:2 + n_bins])
            min_t, max_t = _prune(cnt[2 + n_bins:2 + 2 * n_bins])
            lo_m = max(min_s, min_t)
            hi_m = min(max_s, max_t)
            if hi_m < lo_m:
                raise ValueError(
                    f"pyramid ranges disjoint: src [{min_s},{max_s}] vs "
                    f"tgt [{min_t},{max_t}]"
                )
            if max(max_s - min_s, max_t - min_t) + 1 > 6:
                raise ValueError(
                    f"pyramid would need >6 levels (src [{min_s},{max_s}], "
                    f"tgt [{min_t},{max_t}])"
                )
            if os.environ.get("LGR_STAGE_TIMING", "0") == "1":
                print(
                    f"#   pyramid: kp {n_kp_s}/{n_kp_t}, levels src "
                    f"[{min_s},{max_s}] tgt [{min_t},{max_t}] match "
                    f"[{lo_m},{hi_m}]",
                    flush=True,
                )

            def _pyr_side(kp, n_kp, li_row, lmin, lmax, vp, xyz, valid,
                          which):
                """Per-level surfaces + normals + descriptors for ONE side.
                Returns (n_kp, sj, g, kpv, kp_xyz_c, per-level
                [(feat, valid_mask)] for levels lmin..lmax)."""
                m = _pad_quantum(n_kp)
                sj = _compact_rows(kp, n_kp, m)
                g = jnp.minimum(sj, N_all_ - 1)
                kpv = jnp.arange(m) < n_kp
                kp_xyz_c = xyz[g]
                li_kp = jnp.clip(li_row[g], lmin, lmax)
                levels = []
                surf_specs = []
                maps = []
                for l in range(lmin, lmax + 1):
                    r_l = float(cfg.scale_factor) ** l
                    voxel_l = float(
                        np.sqrt(np.pi * r_l * r_l / FEATURE_NR_POINTS)
                    )
                    normal_l = float(np.sqrt(NORMAL_NR_POINTS / np.pi)) * voxel_l
                    sm_xyz, sm_v, row_of, n_sm_dev = _fs_map(
                        xyz, valid, voxel_l, which
                    )
                    maps.append((r_l, voxel_l, normal_l, sm_xyz, sm_v,
                                 row_of, n_sm_dev))
                    zs = jnp.zeros_like(sm_xyz)
                    surf_specs.append((sm_xyz, zs, sm_v, normal_l))
                    if not shot_mode:
                        surf_specs.append((sm_xyz, zs, sm_v, r_l))
                plans = plan_grid_many(surf_specs)
                n_sms = np_.asarray(
                    jnp.stack([mp[6] for mp in maps])
                )  # ONE pull: every level's surface size
                per_plan = 1 if shot_mode else 2
                for i, (r_l, voxel_l, normal_l, sm_xyz, sm_v, row_of,
                        _nd) in enumerate(maps):
                    l = lmin + i
                    pns = plans[per_plan * i]
                    normal_sm = surface_pass(pns, normal_l, viewpoint=vp)[0]
                    mask_l = kpv & (li_kp <= l)
                    rows_small = jnp.where(
                        sj < N_all_,
                        row_of[jnp.minimum(sj, N_all_ - 1)],
                        N_all_,
                    )
                    if shot_mode:
                        ms_rows = min(_pad_quantum(int(n_sms[i])), N_all_)
                        sm_xyz_c = sm_xyz[:ms_rows]
                        sm_v_c = sm_v[:ms_rows]
                        normal_sm_c = normal_sm[:ms_rows]
                        rs_g = jnp.minimum(rows_small, ms_rows - 1)
                        featc, fvc = _t(f"shot_{which}_l{l}", _shot_stage(
                            kp_xyz_c, normal_sm_c[rs_g], mask_l,
                            sm_xyz_c, normal_sm_c, sm_v_c,
                            spacing=voxel_l, radius=r_l,
                        ))
                    else:
                        pfs = plans[per_plan * i + 1]
                        kp_small = (
                            jnp.zeros((N_all_,), bool)
                            .at[jnp.where(mask_l, rows_small, N_all_)]
                            .set(True, mode="drop")
                        )
                        featc, fvc = _t(f"fpfh_{which}_l{l}", fpfh_pass(
                            set_normals(pfs, normal_sm), r_l,
                            kp=kp_small, kp_rows=rows_small,
                        ))
                    levels.append((featc, mask_l & fvc))
                return n_kp, sj, g, kpv, kp_xyz_c, levels

            side_q = _pyr_side(src_kp, n_kp_s, li_s, min_s, max_s, vp_src,
                               src_xyz, src_valid, "src")
            side_t_ = _pyr_side(tgt_kp, n_kp_t, li_t, min_t, max_t, vp_tgt,
                                tgt_xyz, tgt_valid, "tgt")
            (_, sj_s, g_s, kpv_s, kpx_s, levels_s) = side_q
            (_, sj_t, g_t, kpv_t, kpx_t, levels_t) = side_t_

            def _vote(levels_a, min_a, levels_b, min_b, train_xyz, iss_r):
                """Cross-level candidates + consensus vote, one direction
                (match_multiscale, matching.h:264-354).  Candidate rows are
                already in the counterpart's compacted-kp space."""
                k = max(1, cfg.pyramid_randomness)
                ci, cd, cm = [], [], []
                for l in range(lo_m, hi_m + 1):
                    fa, va = levels_a[l - min_a]
                    fb, vb = levels_b[l - min_b]
                    idx, dist, mask = matchers.match_bf(
                        fa, fb, va, vb, k=k, tile=cfg.match_tile,
                        bf16=cfg.bf16_matching,
                    )
                    ci.append(idx)
                    cd.append(dist)
                    cm.append(mask)
                ci = jnp.concatenate(ci, axis=1)
                cd = jnp.concatenate(cd, axis=1)
                cm = jnp.concatenate(cm, axis=1)
                b_idx, b_dist, b_mask, _sd, _sm2 = _consensus_vote(
                    ci.astype(jnp.int32), cd, cm, train_xyz,
                    jnp.float32(iss_r),
                )
                return b_idx[:, None], b_mask[:, None]

            ic_st_p, mc_st_p = _vote(levels_s, min_s, levels_t, min_t,
                                     kpx_t, iss_radius_tgt)
            ic_ts_p, mc_ts_p = _vote(levels_t, min_t, levels_s, min_s,
                                     kpx_s, iss_radius_src)
            _t("match_pyramid", (ic_st_p, mc_st_p, ic_ts_p, mc_ts_p))
            if os.environ.get("LGR_PYRAMID_DEBUG") == "1":
                mt = kpv_t.shape[0]
                w_rows = np_.asarray(sj_t)[
                    np_.clip(np_.asarray(ic_st_p[:, 0]), 0, mt - 1)
                ]
                PYRAMID_DEBUG.clear()
                PYRAMID_DEBUG.update(
                    side_src=dict(
                        min_log2=min_s, max_log2=max_s,
                        kp_indices=np_.asarray(sj_s)[:n_kp_s],
                        log2_radii=np_.asarray(
                            jnp.clip(li_s, min_s, max_s)
                        )[np_.asarray(sj_s)[:n_kp_s]],
                        exact_5nn=np_.asarray(fnd_s)[
                            np_.asarray(sj_s)[:n_kp_s]
                        ],
                    ),
                    side_tgt=dict(
                        min_log2=min_t, max_log2=max_t,
                        kp_indices=np_.asarray(sj_t)[:n_kp_t],
                        log2_radii=np_.asarray(
                            jnp.clip(li_t, min_t, max_t)
                        )[np_.asarray(sj_t)[:n_kp_t]],
                        exact_5nn=np_.asarray(fnd_t)[
                            np_.asarray(sj_t)[:n_kp_t]
                        ],
                    ),
                    winners_st=dict(
                        query=np_.asarray(sj_s)[
                            np_.asarray(mc_st_p[:, 0] & kpv_s)
                        ],
                        match=w_rows[np_.asarray(mc_st_p[:, 0] & kpv_s)],
                    ),
                )
            v_any_s = kpv_s & jnp.any(
                jnp.stack([v for _f, v in levels_s]), axis=0
            )
            v_any_t = kpv_t & jnp.any(
                jnp.stack([v for _f, v in levels_t]), axis=0
            )
            pyr_match = (ic_st_p, mc_st_p, ic_ts_p, mc_ts_p)
            ec_q = (n_kp_s, sj_s, g_s, v_any_s, None)
            ec_t = (n_kp_t, sj_t, g_t, v_any_t, None)
            dens_s = jnp.zeros((N_all_,), jnp.float32)
            dens_t = jnp.zeros((N_all_,), jnp.float32)
            src_normal = tgt_normal = None
            fq = ft = None
            fq_valid, ft_valid = src_kp, tgt_kp
            fs_done = True
        except ValueError as e:
            print(f"# staged pyramid -> single feature-scale path: {e}",
                  flush=True)
    if fs_mode and not fs_done:
        # Feature-scale descriptors: the reference pyramid computes each level's
        # descriptors on a cloud DOWNSAMPLED to voxel = sqrt(pi r^2 / n)
        # with normals re-estimated at that scale, so a feature disk holds
        # ~n = FEATURE_NR points (matching.h:229-261, common.h:56).  The
        # raw working cloud at the derived feature radius holds many times
        # that (the radius formula assumes spacing = density, a 2-3x
        # overestimate on real scans), so the SPFH pass pays an
        # occupancy^2-shaped pair product for no extra recall.  Pipeline:
        #   ISS on the working cloud (exact keypoint positions)
        #   -> voxel surface per side + ONE stacked 6-grid plan pull
        #   -> normals at the feature scale (NORMAL_NR-point disks)
        #   -> FPFH at each keypoint's voxel centroid row (kp_rows).
        # Correspondence positions stay the exact keypoints; only the
        # descriptor is evaluated <= voxel/2 away, like the reference's
        # per-level voxel snap of the search surface.
        try:
            from lidar_global_registration_tpu.ops.downsample import (
                voxel_centroids_map,
            )
            from lidar_global_registration_tpu.ops.pallas.cellgrid import (
                fpfh_pass,
                iss_pass,
                plan_grid_many,
                set_normals,
                surface_pass,
            )
            from lidar_global_registration_tpu.types import (
                FEATURE_NR_POINTS,
                NORMAL_NR_POINTS,
            )

            import numpy as np_

            N_all_ = src_valid.shape[0]
            voxel_f = float(
                np.sqrt(np.pi * feature_radius**2 / FEATURE_NR_POINTS)
            )
            # NORMAL_NR-point disks on a grid of spacing voxel_f
            normal_f = float(np.sqrt(NORMAL_NR_POINTS / np.pi)) * voxel_f
            sm_xyz_s, sm_v_s, row_of_s, n_sm_s_dev = _fs_map(
                src_xyz, src_valid, voxel_f, "src"
            )
            sm_xyz_t, sm_v_t, row_of_t, n_sm_t_dev = _fs_map(
                tgt_xyz, tgt_valid, voxel_f, "tgt"
            )
            _t("fs_maps", (sm_xyz_s, sm_xyz_t))
            z_s = jnp.zeros_like(src_xyz)
            z_t = jnp.zeros_like(tgt_xyz)
            zs_s = jnp.zeros_like(sm_xyz_s)
            zs_t = jnp.zeros_like(sm_xyz_t)
            if shot_mode:
                # SHOT does its own radius query over the raw small-surface
                # arrays (ops/shot.py): no feature-radius cell plan needed
                pi_s, pi_t, pns_s, pns_t = plan_grid_many([
                    (src_xyz, z_s, src_valid, iss_radius_src),
                    (tgt_xyz, z_t, tgt_valid, iss_radius_tgt),
                    (sm_xyz_s, zs_s, sm_v_s, normal_f),
                    (sm_xyz_t, zs_t, sm_v_t, normal_f),
                ])
                _t("plan", ())
                pfs_s = pfs_t = None
            else:
                pi_s, pi_t, pns_s, pfs_s, pns_t, pfs_t = plan_grid_many([
                    (src_xyz, z_s, src_valid, iss_radius_src),
                    (tgt_xyz, z_t, tgt_valid, iss_radius_tgt),
                    (sm_xyz_s, zs_s, sm_v_s, normal_f),
                    (sm_xyz_s, zs_s, sm_v_s, feature_radius),
                    (sm_xyz_t, zs_t, sm_v_t, normal_f),
                    (sm_xyz_t, zs_t, sm_v_t, feature_radius),
                ])
            # plan_grid_many pulls its stats internally, so the host wall
            # since fs_maps IS the planning cost (6 stats programs + sync)
            _t("plan", ())
            src_kp, _sal_s = _t("side_src", iss_pass(pi_s, iss_radius_src))
            tgt_kp, _sal_t = _t("side_tgt", iss_pass(pi_t, iss_radius_tgt))
            # ONE stacked pull: both keypoint counts + both surface sizes
            cnt = np_.asarray(jnp.stack([
                jnp.sum(src_kp.astype(jnp.int32)),
                jnp.sum(tgt_kp.astype(jnp.int32)),
                n_sm_s_dev,
                n_sm_t_dev,
            ]))
            n_kp_s, n_kp_t, n_sm_s, n_sm_t = (int(x) for x in cnt)
            if os.environ.get("LGR_STAGE_TIMING", "0") == "1":
                print(
                    f"#   fs sizes: kp {n_kp_s}/{n_kp_t}, surface "
                    f"{n_sm_s}/{n_sm_t} of {N_all_}",
                    flush=True,
                )
            if not (0 < n_kp_s <= N_all_ // 2 and 0 < n_kp_t <= N_all_ // 2):
                raise ValueError(
                    f"kp counts {n_kp_s}/{n_kp_t} of {N_all_} rows outside "
                    "the compaction precondition"
                )
            # per-side shrink gate: each side's voxel surface must actually
            # shrink ITS cloud (a cross-side max would let one huge side
            # mask the other's no-shrink surface, or reject both when only
            # one fails)
            if n_sm_s > 0.8 * pi_s.n_valid or n_sm_t > 0.8 * pi_t.n_valid:
                raise ValueError(
                    f"voxel surfaces {n_sm_s}/{n_sm_t} rows would not "
                    f"shrink the {pi_s.n_valid}/{pi_t.n_valid}-row clouds"
                )

            def _fs_side(kp, n_kp, row_of, pns, pfs, vp, xyz, sm_xyz,
                         sm_v, which):
                m = _pad_quantum(n_kp)
                sj = _compact_rows(kp, n_kp, m)
                rows_small = jnp.where(
                    sj < N_all_,
                    row_of[jnp.minimum(sj, N_all_ - 1)],
                    N_all_,
                )
                g = jnp.minimum(sj, N_all_ - 1)
                normal_sm = surface_pass(pns, normal_f, viewpoint=vp)[0]
                if shot_mode:
                    # SHOT-352 at the EXACT keypoint positions over the
                    # per-scale surface support with per-scale normals —
                    # the reference pyramid computes SHOT on each level's
                    # downsampled cloud the same way (matching.h:229-261).
                    # The surface rows are front-compacted in the padded
                    # [N_all] arrays (voxel_centroids_map), so slicing to a
                    # quantum-padded n_sm shrinks the SHOT grid build +
                    # candidate gathers by the 4-6x pad factor.
                    n_sm = n_sm_s if which == "src" else n_sm_t
                    ms_rows = min(_pad_quantum(n_sm), N_all_)
                    sm_xyz_c = sm_xyz[:ms_rows]
                    sm_v_c = sm_v[:ms_rows]
                    normal_sm_c = normal_sm[:ms_rows]
                    rs_g = jnp.minimum(rows_small, ms_rows - 1)
                    kpv = jnp.arange(m) < n_kp
                    featc, fvc = _t(f"shot_{which}", _shot_stage(
                        xyz[g], normal_sm_c[rs_g], kpv,
                        sm_xyz_c, normal_sm_c, sm_v_c, spacing=voxel_f,
                    ))
                    return n_kp, sj, g, kpv & fvc, featc
                kp_small = (
                    jnp.zeros((N_all_,), bool)
                    .at[rows_small]
                    .set(True, mode="drop")
                )
                featc, fvc = _t(f"fpfh_{which}", fpfh_pass(
                    set_normals(pfs, normal_sm), feature_radius,
                    kp=kp_small, kp_rows=rows_small,
                ))
                v = (jnp.arange(m) < n_kp) & fvc
                return n_kp, sj, g, v, featc

            ec_q = _fs_side(src_kp, n_kp_s, row_of_s, pns_s, pfs_s,
                            vp_src, src_xyz, sm_xyz_s, sm_v_s, "src")
            ec_t = _fs_side(tgt_kp, n_kp_t, row_of_t, pns_t, pfs_t,
                            vp_tgt, tgt_xyz, sm_xyz_t, sm_v_t, "tgt")
            # thresholds: cluster mode (guaranteed by the fs_mode gate)
            # overwrites density at every keypoint row with the
            # keypoint-cloud density below; rows outside keypoints are
            # never read, and a zero density falls back to distance_thr
            # in _correspondence_stage
            dens_s = jnp.zeros((N_all_,), jnp.float32)
            dens_t = jnp.zeros((N_all_,), jnp.float32)
            src_normal = tgt_normal = None
            fq = ft = None
            fq_valid, ft_valid = src_kp, tgt_kp
            fs_done = True
        except ValueError as e:
            print(f"# feature-scale surface -> classic masked path: {e}",
                  flush=True)
    if masked and not fs_done:
        # Per-side side+descriptor sequencing: the BIG per-pass buffers
        # (packed lanes + block outputs, ~0.7 KB/point) live only inside
        # each pass's jit, so finishing a side's FPFH before starting the
        # other side keeps peak HBM to one side's working set — at 10M
        # points/side both sides' pass buffers alive at once would exceed
        # a v5e's 16 GB.  The sorted STATES (~44 B/point/grid) are cheap,
        # so all FOUR grids are planned with ONE host sync up front
        # (plan_grid_many) instead of one sync per side.
        def _masked_side_full(plan_n, plan_f, iss_radius, vp, which):
            normal, kp, dens = _side_stage_masked(
                plan_n, plan_f, iss_radius, vp, shot_mode
            )
            _t(f"side_{which}", (normal, kp, dens))
            if shot_mode:
                # SHOT runs later at the compacted keypoint rows only; the
                # feature grid (used for the need mask) frees right here
                return normal, kp, dens, None, kp, None
            from lidar_global_registration_tpu.ops.pallas.cellgrid import (
                fpfh_pass,
                set_normals,
            )

            if big_n:
                # pull the keypoint COUNT before the descriptor pass (the
                # same one-per-side sync _early_compact paid after it) so
                # FPFH emits compacted [M, 33] rows directly: no [N, 33]
                # materialization, and no full-N per-channel element
                # gathers in the memory-constrained tposed output layout
                # (measured +5.1 s per side at 4M points)
                import numpy as np_

                n = int(np_.asarray(jnp.sum(kp.astype(jnp.int32))))
                if 0 < n <= kp.shape[0] // 2:
                    m = _pad_quantum(n)
                    sj = _compact_rows(kp, n, m)
                    featc, fvc = _t(f"fpfh_{which}", fpfh_pass(
                        set_normals(plan_f, normal), feature_radius,
                        kp=kp, kp_rows=sj,
                    ))
                    g = jnp.minimum(sj, kp.shape[0] - 1)
                    v = (jnp.arange(m) < n) & fvc
                    return normal, kp, dens, None, None, (n, sj, g, v, featc)
            feat, fv = _t(f"fpfh_{which}", fpfh_pass(
                set_normals(plan_f, normal), feature_radius, kp=kp
            ))
            return normal, kp, dens, feat, fv & kp, None

        def _early_compact(feat, fvalid):
            """Compact a side's descriptors to its keypoint rows right after
            the side finishes (one count pull), so the full [N, DIM] array
            and the side's plan states can free BEFORE the other side's
            descriptor pass allocates its streaming buffers — at 10M
            points/side the two overlapping would exceed a v5e's HBM.
            Returns (n, sj, g, v, fc) or None when compaction can't apply."""
            import numpy as np_

            n = int(np_.asarray(jnp.sum(fvalid.astype(jnp.int32))))
            if not (0 < n <= fvalid.shape[0] // 2):
                return None
            m = _pad_quantum(n)
            sj = _compact_rows(fvalid, n, m)
            g = jnp.minimum(sj, fvalid.shape[0] - 1)
            v = jnp.arange(m) < n
            return n, sj, g, v, feat[g]

        try:
            from lidar_global_registration_tpu.ops.pallas.cellgrid import (
                plan_grid_many,
            )

            z_s = jnp.zeros_like(src_xyz)
            z_t = jnp.zeros_like(tgt_xyz)
            pn_s, pf_s, pn_t, pf_t = plan_grid_many([
                (src_xyz, z_s, src_valid, max(normal_cell, iss_radius_src)),
                (src_xyz, z_s, src_valid, feature_radius),
                (tgt_xyz, z_t, tgt_valid, max(normal_cell, iss_radius_tgt)),
                (tgt_xyz, z_t, tgt_valid, feature_radius),
            ])
            ec_q = ec_t = None
            # the extra per-side count pull pays for itself >= 4M points
            big_n = src_xyz.shape[0] >= int(
                os.environ.get("LGR_EARLY_COMPACT_N", str(1 << 22))
            )
            src_normal, src_kp, dens_s, fq, fq_valid, ec_q = _masked_side_full(
                pn_s, pf_s, iss_radius_src, vp_src, "src"
            )
            if big_n and not shot_mode and ec_q is None and fq is not None:
                # in-pass compaction declined (degenerate counts): the
                # post-hoc path still bounds memory when fv qualifies
                ec_q = _early_compact(fq, fq_valid)
                if ec_q is not None:
                    fq = None  # the [N, DIM] array frees here
            del pn_s, pf_s  # src plan states (~1 GB at 10M) free here
            tgt_normal, tgt_kp, dens_t, ft, ft_valid, ec_t = _masked_side_full(
                pn_t, pf_t, iss_radius_tgt, vp_tgt, "tgt"
            )
            if ec_q is not None and ec_t is None and ft is not None:
                ec_t = _early_compact(ft, ft_valid)
                if ec_t is not None:
                    ft = None

            def _restore_rows(ec, n_side):
                # degenerate counterpart: restore full-row arrays for the
                # uncompacted path (rare; correctness over memory)
                f = jnp.zeros((n_side, ec[4].shape[1]), ec[4].dtype)
                f = f.at[ec[1]].set(ec[4], mode="drop")
                v = jnp.zeros((n_side,), bool).at[ec[1]].set(ec[3], mode="drop")
                return f, v

            if ec_q is not None and ec_t is None:
                fq, fq_valid = _restore_rows(ec_q, src_kp.shape[0])
                ec_q = None
            elif ec_t is not None and ec_q is None:
                ft, ft_valid = _restore_rows(ec_t, tgt_kp.shape[0])
                ec_t = None
            del pn_t, pf_t
        except ValueError as e:  # cloud does not fit the kernel format
            print(f"# masked side pass -> unmasked fallback: {e}", flush=True)
            masked = False
            ec_q = ec_t = None
    elif not fs_done:
        ec_q = ec_t = None
    fused_any = False
    if not masked and use_cells and not cfg.use_iss and not shot_mode:
        # keypoint=any cell path: ALL FOUR grids planned with ONE host
        # sync, surface + FPFH sequenced per side (same memory argument
        # as the masked branch above — only the cheap sorted states span
        # both sides)
        def _side_fpfh_cells(plan_n, plan_f, valid, vp, which):
            from lidar_global_registration_tpu.ops.pallas.cellgrid import (
                fpfh_pass,
                set_normals,
                surface_pass,
            )

            normal, _c, density, _e, _ok = surface_pass(
                plan_n, normal_cell, viewpoint=vp
            )
            _t(f"side_{which}", (normal, density))
            feat, fv = _t(f"fpfh_{which}", fpfh_pass(
                set_normals(plan_f, normal), feature_radius
            ))
            return normal, density, feat, fv & valid

        try:
            from lidar_global_registration_tpu.ops.pallas.cellgrid import (
                plan_grid_many,
            )

            z_s = jnp.zeros_like(src_xyz)
            z_t = jnp.zeros_like(tgt_xyz)
            pn_s, pf_s, pn_t, pf_t = plan_grid_many([
                (src_xyz, z_s, src_valid, normal_cell),
                (src_xyz, z_s, src_valid, feature_radius),
                (tgt_xyz, z_t, tgt_valid, normal_cell),
                (tgt_xyz, z_t, tgt_valid, feature_radius),
            ])
            src_normal, dens_s, fq, fq_valid = _side_fpfh_cells(
                pn_s, pf_s, src_valid, vp_src, "src"
            )
            tgt_normal, dens_t, ft, ft_valid = _side_fpfh_cells(
                pn_t, pf_t, tgt_valid, vp_tgt, "tgt"
            )
            src_kp, tgt_kp = src_valid, tgt_valid
            fused_any = True
        except ValueError as e:  # cloud does not fit the kernel format
            print(f"# cell side pass -> XLA fallback: {e}", flush=True)
    if not masked and not fused_any:
        src_normal, src_kp, dens_s = _t(
            "side_src", _side_stage_host(src_xyz, src_valid, iss_radius_src, vp_src)
        )
        tgt_normal, tgt_kp, dens_t = _t(
            "side_tgt", _side_stage_host(tgt_xyz, tgt_valid, iss_radius_tgt, vp_tgt)
        )
        if shot_mode:
            # SHOT is computed ONLY at the compacted keypoint rows (below) —
            # the full-row pass FPFH uses would waste 25-100x the work on a
            # descriptor 10x wider.  Validity here is just the keypoint mask.
            fq = ft = None
            fq_valid = src_valid & src_kp
            ft_valid = tgt_valid & tgt_kp
        else:
            fq, fq_valid = _t("fpfh_src", _fpfh_stage(src_xyz, src_normal, src_valid, src_kp))
            ft, ft_valid = _t("fpfh_tgt", _fpfh_stage(tgt_xyz, tgt_normal, tgt_valid, tgt_kp))

    # keypoint compaction: with ISS (or heavy masking) only a fraction of
    # rows carry descriptors; matching the compact rows replaces the full
    # N x N distance matmul with an M x M one (matching keypoints, not
    # points, exactly like the reference matcher operates on keypoint
    # descriptors only).  The only host sync is ONE pull of the two
    # keypoint COUNTS (round 2 pulled the full [N] validity masks — two
    # megabyte-scale transfers per pair on tunneled runtimes); the index
    # layout itself is built on device.
    import numpy as np_

    N_all = src_valid.shape[0]
    if ec_q is not None and ec_t is not None:
        n_q, n_t = ec_q[0], ec_t[0]
    else:
        n_q, n_t = (int(x) for x in np_.asarray(_kp_counts(fq_valid, ft_valid)))
    if min(n_q, n_t) > 0 and max(n_q, n_t) <= N_all // 2:
        if ec_q is not None and ec_t is not None:
            (_, sqj, sq_g, qv, fqc) = ec_q
            (_, stj, st_g, tv, ftc) = ec_t
            mq, mt = qv.shape[0], tv.shape[0]
        else:
            mq, mt = _pad_quantum(n_q), _pad_quantum(n_t)
            # padding rows point at N_all: gathers clamp harmlessly (row
            # is masked), scatters drop them instead of clobbering row 0
            sqj = _compact_rows(fq_valid, n_q, mq)
            stj = _compact_rows(ft_valid, n_t, mt)
            sq_g = jnp.minimum(sqj, N_all - 1)
            st_g = jnp.minimum(stj, N_all - 1)
            qv = jnp.arange(mq) < n_q
            tv = jnp.arange(mt) < n_t
        if shot_mode and (ec_q is None or ec_t is None):
            # fs mode already produced SHOT descriptors in the ec tuples
            fqc, fqc_ok = _t("shot_src", _shot_stage(
                src_xyz[sq_g], src_normal[sq_g], qv,
                src_xyz, src_normal, src_valid,
                spacing=density_cell_src,
            ))
            ftc, ftc_ok = _t("shot_tgt", _shot_stage(
                tgt_xyz[st_g], tgt_normal[st_g], tv,
                tgt_xyz, tgt_normal, tgt_valid,
                spacing=density_cell_tgt,
            ))
            qv = qv & fqc_ok
            tv = tv & ftc_ok
        elif ec_q is None or ec_t is None:
            fqc, ftc = fq[sq_g], ft[st_g]
        # the whole compacted matching region — descriptor 1-NN (or the
        # pyramid's cross-level vote winners), cluster consensus filter,
        # per-pair thresholds, full-row scatters and the correspondence
        # stage — runs as ONE program (_compact_match_corr_stage)
        kc = max(2, min(cfg.cluster_k, n_q - 1, n_t - 1))
        have_cand = pyr_match is not None
        j, mutual, thr = _t("match_corr", _compact_match_corr_stage(
            fqc if not have_cand else None,
            ftc if not have_cand else None,
            pyr_match, qv, tv, sqj, stj, sq_g, st_g,
            src_xyz, tgt_xyz, dens_s, dens_t,
            jnp.float32(distance_thr), cfg, kc, have_cand,
        ))
        matched = True
    else:
        matched = False
        clustered = False
        if cfg.use_iss and cfg.cluster_matching:
            # the compaction precondition failed (too many keypoint rows to
            # compact) — say so instead of silently changing strategy
            print(
                f"# cluster matching -> mutual 1-NN fallback: "
                f"{n_q}/{n_t} keypoints of {N_all} rows exceed the "
                "compaction precondition",
                flush=True,
            )
        if shot_mode:
            # no compaction: SHOT over every masked row (the expensive path;
            # only reachable when keypoints are a majority of the cloud)
            fq, fq_valid = _t("shot_src", _shot_stage(
                src_xyz, src_normal, fq_valid, src_xyz, src_normal, src_valid,
                spacing=density_cell_src,
            ))
            ft, ft_valid = _t("shot_tgt", _shot_stage(
                tgt_xyz, tgt_normal, ft_valid, tgt_xyz, tgt_normal, tgt_valid,
                spacing=density_cell_tgt,
            ))
        idx_st, _d1, mask_st = _t("match_st", matchers.match_bf(
            fq, ft, fq_valid, ft_valid, k=1, tile=cfg.match_tile, bf16=cfg.bf16_matching
        ))
        idx_ts, _d2, mask_ts = _t("match_ts", matchers.match_bf(
            ft, fq, ft_valid, fq_valid, k=1, tile=cfg.match_tile, bf16=cfg.bf16_matching
        ))
    if not matched:
        j, mutual, thr = _t("corr", _correspondence_stage(
            idx_st, mask_st, idx_ts, mask_ts, dens_s, dens_t, distance_thr,
            require_mutual=not clustered,
        ))
    if cfg.alignment == "gror":
        res = _t("gror", dict(_gror_stage(src_xyz, tgt_xyz[j], mutual,
                                          distance_thr, cfg)))
    else:
        res = _t("ransac", dict(
            _ransac_stage(src_xyz, tgt_xyz[j], thr, mutual, key, cfg)
        ))
    if return_correspondences:
        # compact the surviving correspondence set to its realized count
        # (quantum-padded) before export: the CLI/measure path persists the
        # correspondence CSV cache (alignment.cpp:87) and tunneled runtimes
        # move full-[N] arrays at ~0.2 MB/s, so never ship the padding
        n_c = int(np.asarray(jnp.sum(mutual.astype(jnp.int32))))
        M_c = min(_pad_quantum(max(n_c, 1)), int(mutual.shape[0]))
        res["correspondences"] = _corr_export(j, mutual, thr, M_c)
    return res


@partial(jax.jit, static_argnames=("cfg",))
def _front_stage(
    src_xyz, src_valid, tgt_xyz, tgt_valid,
    normal_cell, density_cell_src, density_cell_tgt,
    iss_radius_src, iss_radius_tgt, feature_radius, distance_thr,
    cfg: FlagshipConfig,
    vp_src=None,
    vp_tgt=None,
):
    """Everything up to correspondences as ONE program (normals, ISS, FPFH,
    matching, thresholds).  Two-program execution (front + RANSAC) minimizes
    executable swaps, which cost ~30s each on tunneled TPU runtimes, while
    staying below the compile ceiling that the full monolithic graph hits at
    cloud scale."""
    from lidar_global_registration_tpu.ops.fpfh import fpfh as fpfh_full

    src_normal, src_kp, dens_s = _side_stage.__wrapped__(
        src_xyz, src_valid, normal_cell, iss_radius_src, cfg, vp_src
    )
    tgt_normal, tgt_kp, dens_t = _side_stage.__wrapped__(
        tgt_xyz, tgt_valid, normal_cell, iss_radius_tgt, cfg, vp_tgt
    )
    fq, fq_valid = fpfh_full(
        src_xyz, src_valid & src_kp, src_xyz, src_normal, src_valid, feature_radius,
        kp_normal=src_normal, k_neighbors=cfg.feature_neighbors, cap=cfg.feature_cap,
        chunk=cfg.query_chunk,
    )
    ft, ft_valid = fpfh_full(
        tgt_xyz, tgt_valid & tgt_kp, tgt_xyz, tgt_normal, tgt_valid, feature_radius,
        kp_normal=tgt_normal, k_neighbors=cfg.feature_neighbors, cap=cfg.feature_cap,
        chunk=cfg.query_chunk,
    )
    idx_st, _d1, mask_st = matchers.match_bf(
        fq, ft, fq_valid, ft_valid, k=1, tile=cfg.match_tile, bf16=cfg.bf16_matching
    )
    idx_ts, _d2, mask_ts = matchers.match_bf(
        ft, fq, ft_valid, fq_valid, k=1, tile=cfg.match_tile, bf16=cfg.bf16_matching
    )
    j, mutual, thr = _correspondence_stage.__wrapped__(
        idx_st, mask_st, idx_ts, mask_ts, dens_s, dens_t, distance_thr,
    )
    return j, mutual, thr


def register_pair_two_stage(
    src_xyz, src_valid, tgt_xyz, tgt_valid, key,
    normal_cell, density_cell_src, density_cell_tgt,
    iss_radius_src, iss_radius_tgt, feature_radius, distance_thr,
    vp_src=None,
    vp_tgt=None,
    cfg: FlagshipConfig = FlagshipConfig(),
):
    """Two-program variant: front (features+matching) then RANSAC."""
    j, mutual, thr = _front_stage(
        src_xyz, src_valid, tgt_xyz, tgt_valid,
        normal_cell, density_cell_src, density_cell_tgt,
        iss_radius_src, iss_radius_tgt, feature_radius, distance_thr, cfg,
        vp_src, vp_tgt,
    )
    return _ransac_stage(src_xyz, tgt_xyz[j], thr, mutual, key, cfg)
