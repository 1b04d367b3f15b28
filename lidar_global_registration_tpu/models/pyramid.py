"""Multi-scale feature pyramid + matching strategies.

Reference: FeatureBasedMatcherImpl (include/matching.h:96-362) and the
strategy subclasses OneSided/LeftToRight/Cluster (matching.h:386-551).

Per side:
  - per keypoint, pick the log2(scale)-bucketed feature radius so a disk of
    that radius holds ~feature_nr points of the local density
    (matching.h:177-208); drop sparse buckets (<1/10 resp. <1/1000 of the
    most-populated);
  - per scale: downsample the cloud to voxel = sqrt(pi r^2 / feature_nr)
    (cascaded from the previous level), re-estimate normals, optionally
    re-estimate keypoint normals/LRFs, compute descriptors.

Matching: per overlapping scale, k-NN in descriptor space; candidates are
aggregated across scales and a winner is picked by spatial consensus voting
(matching.h:327-352).  Strategies then build thresholded correspondences.

TPU mapping: levels are host-orchestrated (their count is data dependent);
all per-level compute is jitted with padded shapes; the vote and the cluster
filter are vectorized over padded candidate lists.
"""
from __future__ import annotations

import math
import time
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from lidar_global_registration_tpu.ops import grid as gridmod
from lidar_global_registration_tpu.ops import matchers

# LGR_PYRAMID_DEBUG=1: the host pyramid records its level ranges,
# per-keypoint bucket assignment and vote winners here so the staged TPU
# pyramid can be parity-checked against it (the reference pins its matcher
# variants against each other for exactly this reason,
# tests/flann_bf_matcher.h:70-89).  Test-only; cleared per search.
PYRAMID_DEBUG: dict = {}
from lidar_global_registration_tpu.ops.density import knn_distances, smoothed_densities
from lidar_global_registration_tpu.ops.downsample import voxel_downsample
from lidar_global_registration_tpu.ops.normals import estimate_normals_knn
from lidar_global_registration_tpu.types import (
    AlignmentParameters,
    Cloud,
    Correspondences,
    DESCRIPTOR_FPFH,
    DESCRIPTOR_ROPS,
    DESCRIPTOR_SHOT,
    DESCRIPTOR_USC,
    LRF_GT,
    LRF_GRAVITY,
    MATCHING_CLUSTER,
    MATCHING_CLUSTER_THRESHOLD,
    MATCHING_LEFT_TO_RIGHT,
    MATCHING_ONE_SIDED,
    MATCHING_RATIO,
    MATCHING_RATIO_THRESHOLD,
    round_up,
)


# ---------------------------------------------------------------------------
# Descriptor dispatch
# ---------------------------------------------------------------------------
def _estimate_frames(params: AlignmentParameters, kps: Cloud, surface: Cloud,
                     radius):
    """estimateReferenceFrames (common.cpp:693-755) -> f32[M,3,3] or None."""
    from lidar_global_registration_tpu.ops import lrf as lrfmod

    lrf_id = params.lrf_id.lower()
    if lrf_id == LRF_GT:
        gt = params.ground_truth if params.ground_truth is not None else np.eye(4)
        return np.asarray(
            lrfmod.gt_lrf(kps.capacity, jnp.asarray(np.asarray(gt, np.float32)))
        )
    if lrf_id == LRF_GRAVITY:
        frames, needs_fb = lrfmod.gravity_lrf(kps.normal)
        needs_fb = np.asarray(needs_fb) & np.asarray(kps.valid)
        if needs_fb.any():
            # Fallback SHOT-LRF support: DELIBERATE DEVIATION from the
            # reference, which rebinds the search tree to the full surface
            # (common.cpp:737-747 setSearchSurface via pcl initCompute).
            # The fallback fires exactly where the normal is gravity-
            # degenerate — locally isotropic neighborhoods whose surface-
            # support covariance axes are set by SAMPLING NOISE, which is
            # independent between the two scans: measured on the 13k
            # reference-default e2e fixture, surface-support frames
            # decorrelate across sides and registration fails, while
            # keypoint-support frames anchor to the shared ISS keypoint
            # constellation (co-located across sides by construction) and
            # register.  The staged TPU path (flagship._shot_stage)
            # implements the reference's surface-support semantics.
            g = gridmod.build_grid(kps.xyz, kps.valid, radius, cell_cap=32)
            idx, _d, mask = gridmod.radius_neighbors(
                g, kps.xyz, kps.valid, radius, k=64, cap=32
            )
            fb_frames, _ok = lrfmod.shot_lrf(kps.xyz, radius, kps.xyz,
                                             idx, mask)
            frames = jnp.where(jnp.asarray(needs_fb)[:, None, None], fb_frames, frames)
        return frames
    return None  # default LRF: descriptor's own


def compute_descriptors(
    params: AlignmentParameters,
    kps: Cloud,
    surface: Cloud,
    radius: float,
):
    """estimateFeatures<FeatureT> dispatch (common.h:312-415).

    Returns (features f32[M,D], valid bool[M])."""
    frames = _estimate_frames(params, kps, surface, radius)
    did = params.descriptor_id
    if did == DESCRIPTOR_FPFH:
        from lidar_global_registration_tpu.ops.fpfh import fpfh

        return fpfh(
            kps.xyz,
            kps.valid,
            surface.xyz,
            surface.normal,
            surface.valid,
            radius,
            kp_normal=kps.normal,
        )
    if did == DESCRIPTOR_SHOT:
        from lidar_global_registration_tpu.ops.shot import shot

        return shot(
            kps.xyz,
            kps.valid,
            surface.xyz,
            surface.normal,
            surface.valid,
            radius,
            frames=frames,
        )
    if did == DESCRIPTOR_ROPS:
        from lidar_global_registration_tpu.ops.rops import rops

        return rops(
            kps.xyz, kps.valid, surface.xyz, surface.valid, radius, frames=frames
        )
    if did == DESCRIPTOR_USC:
        from lidar_global_registration_tpu.ops.usc import usc

        return usc(
            kps.xyz,
            kps.valid,
            surface.xyz,
            surface.valid,
            radius,
            frames=frames,
        )
    raise ValueError(f"descriptor {did!r} isn't supported")


# ---------------------------------------------------------------------------
# Per-side pyramid state ("Storage", matching.h:114-126)
# ---------------------------------------------------------------------------
@dataclass
class PyramidSide:
    cloud: Cloud
    kp_indices: np.ndarray  # indices into cloud
    kps: Cloud  # gathered keypoints (original normals)
    iss_radius: float
    min_log2: int = 0
    max_log2: int = 0
    level_kp_rows: list = field(default_factory=list)  # np row ids into kps per level
    level_features: list = field(default_factory=list)  # f32[Mi,D] jnp
    level_feat_valid: list = field(default_factory=list)
    level_kps: list = field(default_factory=list)  # Cloud per level
    level_surfaces: list = field(default_factory=list)
    time_ds_ne: float = 0.0
    time_fe: float = 0.0


def _gather_cloud(cloud: Cloud, rows: np.ndarray, capacity: Optional[int] = None) -> Cloud:
    cap = capacity or round_up(max(len(rows), 1))
    import dataclasses as dc

    pad_rows = np.zeros(cap, np.int64)
    pad_rows[: len(rows)] = rows
    valid = np.zeros(cap, bool)
    valid[: len(rows)] = True
    r = jnp.asarray(pad_rows)
    vm = jnp.asarray(valid)
    return Cloud(
        xyz=jnp.where(vm[:, None], cloud.xyz[r], Cloud.PAD_COORD),
        normal=jnp.where(vm[:, None], cloud.normal[r], 0.0),
        weight=jnp.where(vm, cloud.weight[r], 0.0),
        curvature=jnp.where(vm, cloud.curvature[r], 0.0),
        valid=vm,
    )


def initialize_side(
    cloud: Cloud,
    kp_indices: np.ndarray,
    params: AlignmentParameters,
    viewpoint,
    iss_radius: float,
    is_source: bool = True,
) -> PyramidSide:
    """FeatureBasedMatcherImpl::initialize (matching.h:163-262)."""
    kps = _gather_cloud(cloud, kp_indices)
    side = PyramidSide(cloud=cloud, kp_indices=kp_indices, kps=kps, iss_radius=iss_radius)
    n_kp = len(kp_indices)
    log_scale = math.log2(params.scale_factor)

    if params.feature_radius is not None:
        lr = int(math.floor(math.log2(params.feature_radius) / log_scale))
        side.min_log2 = side.max_log2 = lr
        log2_radii = np.full(n_kp, lr, np.int32)
    else:
        # local density at each keypoint = dist to 5th NN (self-inclusive,
        # matching.h:181-185)
        idx, dist, mask, _cell = knn_distances(cloud, 4)
        d = np.asarray(dist)[kp_indices, 3]
        ok = np.asarray(mask)[kp_indices, 3]
        d = np.where(ok, d, np.median(d[ok]) if ok.any() else 1.0)
        feature_radius = np.sqrt(params.feature_nr_points * d * d / np.pi)
        log2_radii = np.floor(np.log2(np.maximum(feature_radius, 1e-12)) / log_scale).astype(
            np.int32
        )
        side.min_log2 = int(log2_radii.min())
        side.max_log2 = int(log2_radii.max())
        # prune sparse levels (matching.h:196-204)
        counts = np.bincount(log2_radii - side.min_log2)
        max_count = counts.max()
        while 10 * counts[0] < max_count:
            counts = counts[1:]
            side.min_log2 += 1
        while 1000 * counts[-1] < max_count:
            counts = counts[:-1]
            side.max_log2 -= 1
        log2_radii = np.clip(log2_radii, side.min_log2, side.max_log2)

    import os as _os

    if _os.environ.get("LGR_PYRAMID_DEBUG") == "1":
        PYRAMID_DEBUG[f"side_{'src' if is_source else 'tgt'}"] = dict(
            min_log2=side.min_log2,
            max_log2=side.max_log2,
            kp_indices=np.asarray(kp_indices).copy(),
            log2_radii=np.asarray(log2_radii).copy(),
        )

    n_levels = side.max_log2 - side.min_log2 + 1
    # level i serves keypoints whose bucket is <= that level
    # (matching.h:222-227: kp i appears on levels log2_radii[i]..max)
    for i in range(n_levels):
        rows = np.nonzero(log2_radii <= side.min_log2 + i)[0].astype(np.int64)
        side.level_kp_rows.append(rows)

    prev_surface = cloud
    for i in range(n_levels):
        search_radius = float(params.scale_factor ** (side.min_log2 + i))
        voxel = math.sqrt(math.pi * search_radius * search_radius / params.feature_nr_points)
        t1 = time.time()
        surface = voxel_downsample(prev_surface, voxel)
        surface = estimate_normals_knn(
            surface,
            k=params.normal_nr_points,
            viewpoint=viewpoint,
            normals_available=params.normals_available,
        )
        surface = surface.compact()
        t2 = time.time()
        side.time_ds_ne += t2 - t1
        prev_surface = surface

        level_kps = _gather_cloud(side.kps, side.level_kp_rows[i])
        if params.reestimate_frames:
            # re-estimate keypoint normals from the level surface, oriented by
            # the existing keypoint normals (matching.h:243-246 passes
            # normals_available=true)
            level_kps = estimate_normals_knn(
                level_kps,
                surface=surface,
                k=params.normal_nr_points,
                viewpoint=viewpoint,
                normals_available=True,
            )
        feats, fvalid = compute_descriptors(params, level_kps, surface, search_radius)
        side.time_fe += time.time() - t2
        if params.save_features:
            # per-scale descriptor histogram dump (saveFeatures,
            # feature_analysis.h:11-27; called from matching.h:273-279)
            from lidar_global_registration_tpu.utils.debug_viz import save_features_csv
            from lidar_global_registration_tpu.utils.naming import construct_path

            scale = "" if params.feature_radius is not None else str(side.min_log2 + i)
            suffix = "_src" if is_source else "_tgt"
            save_features_csv(
                feats,
                fvalid,
                side.level_kp_rows[i],
                construct_path(params, f"histograms{scale}{suffix}", "csv"),
            )
        side.level_kps.append(level_kps)
        side.level_surfaces.append(surface)
        side.level_features.append(feats)
        side.level_feat_valid.append(fvalid)
    return side


# ---------------------------------------------------------------------------
# Cross-scale matching + consensus vote (matching.h:264-354)
# ---------------------------------------------------------------------------
@jax.jit
def _consensus_vote(cand_idx, cand_dist, cand_mask, train_xyz, iss_radius):
    """Winner per query among cross-level candidates by spatial consensus.

    cand_* : [M, L] (L = levels * randomness).  Score of candidate m1 =
    sum over m2 >= m1 of iss_r / max(d3(m1,m2), iss_r) for pairs within
    32*iss_r (reference keeps the asymmetric m2 >= m1 loop,
    matching.h:330-340); winner = highest count, ties by descriptor dist."""
    pos = train_xyz[cand_idx]  # [M,L,3]
    d3 = jnp.sqrt(
        jnp.maximum(
            jnp.sum((pos[:, :, None, :] - pos[:, None, :, :]) ** 2, axis=-1), 0.0
        )
    )  # [M,L,L]
    L = cand_idx.shape[1]
    pair_ok = (
        cand_mask[:, :, None]
        & cand_mask[:, None, :]
        & (d3 < 32.0 * iss_radius)
        & (jnp.arange(L)[None, :, None] <= jnp.arange(L)[None, None, :])
    )
    contrib = iss_radius / jnp.maximum(d3, iss_radius)
    counts = jnp.sum(jnp.where(pair_ok, contrib, 0.0), axis=2)  # [M,L]
    counts = jnp.where(cand_mask, counts, -jnp.inf)
    # winner: max count, ties by smaller descriptor distance
    key = counts - 1e-6 * cand_dist
    best = jnp.argmax(key, axis=1)
    take = lambda a: jnp.take_along_axis(a, best[:, None], axis=1)[:, 0]
    b_idx, b_dist, b_mask = take(cand_idx), take(cand_dist), take(cand_mask)
    # runner-up with a DIFFERENT train index (for the ratio matcher)
    key2 = jnp.where(cand_idx == b_idx[:, None], -jnp.inf, key)
    second = jnp.argmax(key2, axis=1)
    take2 = lambda a: jnp.take_along_axis(a, second[:, None], axis=1)[:, 0]
    s_dist = take2(cand_dist)
    s_mask = take2(cand_mask) & (take2(cand_idx) != b_idx)
    return b_idx, b_dist, b_mask, s_dist, s_mask


def match_multiscale(
    side_q: PyramidSide,
    side_t: PyramidSide,
    params: AlignmentParameters,
    inverse_tn: bool = False,
):
    """Returns per-query-kp best match into train kps:
    (match_row i32[Mq], distance f32[Mq], has bool[Mq]) padded to kps cap."""
    Mq = side_q.kps.capacity
    lo = max(side_q.min_log2, side_t.min_log2)
    hi = min(side_q.max_log2, side_t.max_log2)
    k = params.randomness
    cand_i, cand_d, cand_m = [], [], []
    guess = params.guess
    if guess is not None and inverse_tn:
        guess = np.linalg.inv(guess)
    for log2_r in range(lo, hi + 1):
        iq = log2_r - side_q.min_log2
        it = log2_r - side_t.min_log2
        fq = side_q.level_features[iq]
        ft = side_t.level_features[it]
        vq = side_q.level_feat_valid[iq]
        vt = side_t.level_feat_valid[it]
        if guess is not None:
            idx, dist, mask = matchers.match_local(
                side_q.level_kps[iq].xyz,
                side_q.level_kps[iq].valid & vq,
                fq,
                side_t.level_kps[it].xyz,
                side_t.level_kps[it].valid & vt,
                ft,
                jnp.asarray(np.asarray(guess, np.float32)),
                params.match_search_radius,
                k=k,
            )
        else:
            # BF and FLANN collapse to the same exact kernel on TPU; the
            # reference's bf block_size knob maps onto the train tile
            tile = max(512, min(8192, 1 << (params.bf_block_size - 1).bit_length()))
            idx, dist, mask = matchers.match_bf(
                fq, ft, vq, vt, k=k, tile=tile, bf16=params.bf16_matching
            )
        # map level-local rows to global kp rows, scatter into [Mq, k] ON
        # DEVICE: round 2 pulled idx/dist/mask to host per level per
        # direction (3 tunnel round-trips each); the only transfer now is
        # the single pull of the voted winner below
        rows_q = side_q.level_kp_rows[iq]
        rows_t = side_t.level_kp_rows[it]
        nq = len(rows_q)
        m_ok = mask[:nq]
        rq = jnp.asarray(rows_q.astype(np.int32))
        if len(rows_t):
            tloc = jnp.clip(idx[:nq], 0, len(rows_t) - 1)
            tglob = jnp.asarray(rows_t.astype(np.int32))[tloc]
        else:
            tglob = jnp.zeros((nq, k), jnp.int32)
        big = jnp.float32(3.0e38)
        gi = jnp.zeros((Mq, k), jnp.int32).at[rq].set(jnp.where(m_ok, tglob, 0))
        gd = jnp.full((Mq, k), big, jnp.float32).at[rq].set(
            jnp.where(m_ok, dist[:nq], big)
        )
        gm = jnp.zeros((Mq, k), bool).at[rq].set(m_ok)
        cand_i.append(gi)
        cand_d.append(gd)
        cand_m.append(gm)

    if not cand_i:
        big = np.full((Mq,), np.float32(3.0e38), np.float32)
        return (
            np.zeros((Mq,), np.int64),
            big,
            np.zeros((Mq,), bool),
            big.copy(),
            np.zeros((Mq,), bool),
        )
    ci = jnp.concatenate(cand_i, axis=1)
    cd = jnp.concatenate(cand_d, axis=1)
    cm = jnp.concatenate(cand_m, axis=1)
    bi, bd, bm, sd, sm = _consensus_vote(
        ci.astype(jnp.int32), cd, cm, side_t.kps.xyz, jnp.float32(side_t.iss_radius)
    )
    return np.asarray(bi), np.asarray(bd), np.asarray(bm), np.asarray(sd), np.asarray(sm)


# ---------------------------------------------------------------------------
# Matching strategies (matching.h:386-551)
# ---------------------------------------------------------------------------
def _kp_thresholds(side: PyramidSide):
    """Per-keypoint adaptive densities (calculateSmoothedDensities(kps),
    matching.h:396-397) -> np f32[Mcap]."""
    dens, _ = smoothed_densities(side.kps, k=2)
    return np.asarray(dens)


@jax.jit
def _cluster_distances(
    match_of_q,  # i32[Mq] best train row per query row
    has_q,  # bool[Mq]
    nbq_idx,  # i32[Mq,Kc] kNN of query kps among query kps
    nbq_mask,
    nbt_idx,  # i32[Mt,Kc] kNN of train kps among train kps
    nbt_mask,
):
    """1 - (consistent pairs / total pairs) per (i, match(i)) pair
    (ClusterMatcher::calculateCorrespondenceDistance, matching.h:524-550)."""
    j = match_of_q  # [Mq]
    jn = nbt_idx[j]  # [Mq,Kc] neighbors of the matched train kp
    jn_mask = nbt_mask[j]
    # matches of i's neighbors
    nb_match = match_of_q[nbq_idx]  # [Mq,Kc]
    nb_has = has_q[nbq_idx] & nbq_mask
    member = jnp.any(
        (nb_match[:, :, None] == jn[:, None, :]) & jn_mask[:, None, :], axis=2
    )
    cc = jnp.sum((nb_has & member).astype(jnp.float32), axis=1)
    cp = jnp.sum(nb_has.astype(jnp.float32), axis=1)
    return jnp.where(cp > 0, 1.0 - cc / jnp.maximum(cp, 1.0), 0.0)


def _kps_knn(side: PyramidSide, k: int):
    """kNN among the keypoints themselves (the kps_tree of matching.h:118)."""
    from lidar_global_registration_tpu.ops.density import _auto_cell_size

    cell = _auto_cell_size(side.kps, k)
    n_valid = max(int(np.asarray(side.kps.count())), 1)
    k_eff = min(k, max(n_valid - 1, 1))
    for _ in range(8):
        g = gridmod.build_grid(side.kps.xyz, side.kps.valid, cell, cell_cap=64)
        idx, d, mask = gridmod.knn(g, side.kps.xyz, side.kps.valid, k, cap=64)
        big = jnp.float32(1.0e38)
        kth = jnp.where(mask[:, k_eff - 1], d[:, k_eff - 1], big)
        covered = int(
            np.asarray(
                jnp.sum(
                    (jnp.sum(mask, axis=1) >= k_eff) & (kth <= cell) & side.kps.valid
                )
            )
        )
        if covered >= 0.999 * n_valid:
            break
        cell *= 2.0
    return idx, mask


def _build_correspondences(
    rows_q, rows_m, dists, thr_q, thr_m, distance_thr, kp_idx_q, kp_idx_t
) -> Correspondences:
    """Assemble global-index correspondences with the per-pair adaptive
    threshold min(max(dens_q, dens_t), distance_thr) (matching.h:404-407)."""
    thr = np.minimum(np.maximum(thr_q[rows_q], thr_m[rows_m]), distance_thr)
    n = len(rows_q)
    cap = round_up(max(n, 1))
    out = Correspondences.empty(cap)
    q = np.zeros(cap, np.int32)
    m = np.zeros(cap, np.int32)
    d = np.zeros(cap, np.float32)
    t = np.full(cap, 1.0, np.float32)
    v = np.zeros(cap, bool)
    q[:n] = kp_idx_q[rows_q]
    m[:n] = kp_idx_t[rows_m]
    d[:n] = dists
    t[:n] = thr
    v[:n] = True
    return Correspondences(
        query=jnp.asarray(q),
        match=jnp.asarray(m),
        distance=jnp.asarray(d),
        threshold=jnp.asarray(t),
        valid=jnp.asarray(v),
    )


def match_sides(
    side_src: PyramidSide, side_tgt: PyramidSide, params: AlignmentParameters
) -> Correspondences:
    """Strategy dispatch: one_sided / lr (default fallback) / cluster."""
    # timing split print (matching.h:156-157)
    print(
        "Downsampling and normal estimation took "
        f"{1000.0 * (side_src.time_ds_ne + side_tgt.time_ds_ne):.1f}ms."
    )
    print(f"Feature estimation took {1000.0 * (side_src.time_fe + side_tgt.time_fe):.1f}ms.")
    thr_src = _kp_thresholds(side_src)
    thr_tgt = _kp_thresholds(side_tgt)
    n_src = len(side_src.kp_indices)
    n_tgt = len(side_tgt.kp_indices)

    mi_ij, md_ij, mm_ij, sd_ij, sm_ij = match_multiscale(side_src, side_tgt, params)
    matching_id = params.matching_id

    import os as _os

    if _os.environ.get("LGR_PYRAMID_DEBUG") == "1":
        # source-direction consensus-vote winners in ORIGINAL cloud indices
        rows = np.nonzero(mm_ij[:n_src])[0]
        PYRAMID_DEBUG["winners_st"] = dict(
            query=side_src.kp_indices[rows],
            match=side_tgt.kp_indices[
                np.clip(mi_ij[rows], 0, max(n_tgt - 1, 0))
            ],
        )

    if matching_id == MATCHING_RATIO:
        # The reference's RatioMatcher is an unimplemented stub
        # (matching.h:460-478); we complete it: accept a match when the
        # runner-up candidate is at least ratio_threshold (1.1) farther in
        # descriptor space (MATCHING_RATIO_THRESHOLD, common.h:50).
        passes = mm_ij[:n_src] & (
            ~sm_ij[:n_src] | (sd_ij[:n_src] > MATCHING_RATIO_THRESHOLD * md_ij[:n_src])
        )
        rows = np.nonzero(passes)[0]
        return _build_correspondences(
            rows,
            mi_ij[rows],
            md_ij[rows],
            thr_src,
            thr_tgt,
            params.distance_thr,
            side_src.kp_indices,
            side_tgt.kp_indices,
        )

    if matching_id == MATCHING_ONE_SIDED:
        rows = np.nonzero(mm_ij[:n_src])[0]
        return _build_correspondences(
            rows,
            mi_ij[rows],
            md_ij[rows],
            thr_src,
            thr_tgt,
            params.distance_thr,
            side_src.kp_indices,
            side_tgt.kp_indices,
        )

    mi_ji, md_ji, mm_ji, _sd_ji, _sm_ji = match_multiscale(
        side_tgt, side_src, params, inverse_tn=True
    )

    if matching_id == MATCHING_CLUSTER:
        kc = params.cluster_k
        nbq_idx, nbq_mask = _kps_knn(side_src, kc)
        nbt_idx, nbt_mask = _kps_knn(side_tgt, kc)
        d_i = np.asarray(
            _cluster_distances(
                jnp.asarray(mi_ij.astype(np.int32)),
                jnp.asarray(mm_ij),
                nbq_idx,
                nbq_mask,
                nbt_idx,
                nbt_mask,
            )
        )
        d_j_all = np.asarray(
            _cluster_distances(
                jnp.asarray(mi_ji.astype(np.int32)),
                jnp.asarray(mm_ji),
                nbt_idx,
                nbt_mask,
                nbq_idx,
                nbq_mask,
            )
        )
        j = mi_ij
        d_j = d_j_all[j]
        keep = (
            mm_ij[:n_src]
            & (d_i[:n_src] < MATCHING_CLUSTER_THRESHOLD)
            & (d_j[:n_src] < MATCHING_CLUSTER_THRESHOLD)
        )
        rows = np.nonzero(keep)[0]
        return _build_correspondences(
            rows,
            mi_ij[rows],
            np.maximum(d_i[rows], d_j[rows]).astype(np.float32),
            thr_src,
            thr_tgt,
            params.distance_thr,
            side_src.kp_indices,
            side_tgt.kp_indices,
        )

    # left-to-right mutual filter (default fallback, matching.h:418-458)
    if matching_id != MATCHING_LEFT_TO_RIGHT:
        import warnings

        warnings.warn(
            f"feature matcher {matching_id!r} isn't supported, lr will be used"
        )
    j = mi_ij[:n_src]
    mutual = mm_ij[:n_src] & mm_ji[j] & (mi_ji[j] == np.arange(n_src))
    rows = np.nonzero(mutual)[0]
    return _build_correspondences(
        rows,
        mi_ij[rows],
        md_ji[mi_ij[rows]],
        thr_src,
        thr_tgt,
        params.distance_thr,
        side_src.kp_indices,
        side_tgt.kp_indices,
    )


def feature_based_correspondence_search(
    src: Cloud, tgt: Cloud, params: AlignmentParameters
) -> Correspondences:
    """FeatureBasedCorrespondenceSearch::calculateCorrespondences
    (correspondence_search.cpp:4-16): keypoints -> pyramid -> strategy."""
    from lidar_global_registration_tpu.ops.iss import detect_keypoints

    idx_src = detect_keypoints(src, params.keypoint_id, params.iss_radius_src)
    idx_tgt = detect_keypoints(tgt, params.keypoint_id, params.iss_radius_tgt)

    side_src = initialize_side(
        src, idx_src, params, params.vp_src, params.iss_radius_src, is_source=True
    )
    # lrf == 'gt' must use identity on the target side (matching.h:153-155)
    params_tgt = params
    if params.lrf_id.lower() == LRF_GT:
        params_tgt = params.replace(ground_truth=np.eye(4, dtype=np.float32))
    side_tgt = initialize_side(
        tgt, idx_tgt, params_tgt, params.vp_tgt, params.iss_radius_tgt, is_source=False
    )
    return match_sides(side_src, side_tgt, params)
