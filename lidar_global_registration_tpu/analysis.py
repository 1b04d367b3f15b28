"""Alignment analysis vs ground truth + CSV reporting.

Reference: src/analysis.cpp — rotation/translation errors, point-cloud RMSE
under inv(T) @ T_gt, overlap RMSE over the GT-overlap region (the primary
success criterion), median normal difference, correct correspondences /
inliers, 3-axis uniformity entropy, overlap ratio/area; all appended to
data/debug/test_results.csv (39-column schema, analysis.cpp:295-328).

TPU mapping: per-point kd-tree loops become grid-hash NN queries batched
over the whole cloud; medians/quantiles are host-side on masked arrays.
"""
from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from lidar_global_registration_tpu.ops import grid as gridmod
from lidar_global_registration_tpu.ops import metrics as metricsmod
from lidar_global_registration_tpu.ops.density import smoothed_densities
from lidar_global_registration_tpu.ops.downsample import aabb
from lidar_global_registration_tpu.ops.transform import rotation_translation_error
from lidar_global_registration_tpu.models.ransac import build_metric_context, _evaluate_one
from lidar_global_registration_tpu.types import (
    AlignmentParameters,
    AlignmentResult,
    Cloud,
    Correspondences,
    DIST_TO_PLANE_COEFFICIENT,
    MATCHING_RATIO,
)
from lidar_global_registration_tpu.utils.naming import construct_path_simple, VERSION


def transform_cloud_xyz(xyz, valid, T):
    R, t = T[:3, :3], T[:3, 3]
    return jnp.where(valid[:, None], xyz @ R.T + t, xyz)


def pointcloud_rmse(src: Cloud, T, T_gt) -> float:
    """calculatePointCloudRmse (analysis.cpp:30-43): rmse between the cloud
    and itself transformed by inv(T) @ T_gt."""
    D = jnp.asarray(np.linalg.inv(T) @ T_gt)
    moved = transform_cloud_xyz(src.xyz, src.valid, D)
    d2 = jnp.sum((moved - src.xyz) ** 2, axis=-1)
    d2 = jnp.where(src.valid, d2, 0.0)
    n = jnp.maximum(src.count(), 1)
    return float(np.sqrt(np.asarray(jnp.sum(d2)) / np.asarray(n)))


def overlap_rmse(src: Cloud, tgt: Cloud, T, T_gt, inlier_threshold: float) -> float:
    """calculateOverlapRmse (analysis.cpp:45-88): for src points whose
    GT-aligned position lies within `inlier_threshold` of the target's
    nearest-neighbor plane, RMSE of || T-aligned point - its projection on
    that plane ||."""
    Tj = jnp.asarray(np.asarray(T, np.float32))
    Tg = jnp.asarray(np.asarray(T_gt, np.float32))
    aligned = transform_cloud_xyz(src.xyz, src.valid, Tj)
    aligned_gt = transform_cloud_xyz(src.xyz, src.valid, Tg)
    radius = DIST_TO_PLANE_COEFFICIENT * inlier_threshold
    g = gridmod.build_grid(tgt.xyz, tgt.valid, max(radius, 1e-12), cell_cap=64)
    idx, dist, mask = gridmod.radius_neighbors(g, aligned_gt, src.valid, radius, k=1, cap=64)
    nn = idx[:, 0]
    found = mask[:, 0]
    npt = tgt.xyz[nn]
    nrm = tgt.normal[nn]
    nrm_ok = jnp.sum(nrm * nrm, axis=-1) > 0.5
    off = jnp.sum((aligned_gt - npt) * nrm, axis=-1)
    plane_pt = aligned_gt - off[:, None] * nrm
    in_ov = found & nrm_ok & (jnp.abs(off) <= inlier_threshold)
    d = jnp.sqrt(jnp.maximum(jnp.sum((aligned - plane_pt) ** 2, axis=-1), 0.0))
    cnt = jnp.sum(in_ov)
    s = jnp.sum(jnp.where(in_ov, d * d, 0.0))
    cnt_h = int(np.asarray(cnt))
    if cnt_h == 0:
        return float("nan")
    return float(np.sqrt(np.asarray(s) / cnt_h))


def normal_difference(src: Cloud, tgt: Cloud, distance_thr: float, T_gt) -> float:
    """calculateNormalDifference (analysis.cpp:141-185): median |angle|
    between src (GT aligned) normals and nearest tgt normals within thr."""
    Tg = np.asarray(T_gt, np.float32)
    aligned = transform_cloud_xyz(src.xyz, src.valid, jnp.asarray(Tg))
    Rn = jnp.asarray(Tg[:3, :3])
    srcn = src.normal @ Rn.T
    g = gridmod.build_grid(tgt.xyz, tgt.valid, max(distance_thr, 1e-12), cell_cap=64)
    idx, dist, mask = gridmod.radius_neighbors(
        g, aligned, src.valid, distance_thr, k=1, cap=64
    )
    nn = idx[:, 0]
    ok = (
        mask[:, 0]
        & (jnp.sum(srcn * srcn, axis=-1) > 0.5)
        & (jnp.sum(tgt.normal[nn] ** 2, axis=-1) > 0.5)
    )
    cos = jnp.clip(jnp.sum(srcn * tgt.normal[nn], axis=-1), -1.0, 1.0)
    ang = jnp.abs(jnp.arccos(cos))
    a = np.asarray(ang)[np.asarray(ok)]
    if len(a) == 0:
        return float(np.pi)
    return float(np.partition(a, len(a) // 2)[len(a) // 2])


def merge_overlaps(pcd1: Cloud, pcd2: Cloud, distance_thr: float):
    """mergeOverlaps (common.cpp:558-591): symmetric point-to-NN-plane test;
    returns a boolean mask per side (in-overlap points)."""
    out = []
    radius = DIST_TO_PLANE_COEFFICIENT * distance_thr
    for compared, reference in ((pcd1, pcd2), (pcd2, pcd1)):
        g = gridmod.build_grid(reference.xyz, reference.valid, max(radius, 1e-12), cell_cap=64)
        idx, dist, mask = gridmod.radius_neighbors(
            g, compared.xyz, compared.valid, radius, k=1, cap=64
        )
        nn = idx[:, 0]
        found = mask[:, 0]
        npt = reference.xyz[nn]
        nrm = reference.normal[nn]
        d2p = jnp.abs(jnp.sum(nrm * (npt - compared.xyz), axis=-1))
        nrm_ok = jnp.sum(nrm * nrm, axis=-1) > 0.5
        d2p = jnp.where(nrm_ok, d2p, dist[:, 0] ** 2)
        out.append(found & (d2p < distance_thr) & compared.valid)
    return out[0], out[1]


def correct_correspondences(
    src: Cloud, tgt: Cloud, corrs: Correspondences, T_gt
) -> np.ndarray:
    """buildCorrectCorrespondences (analysis.cpp:187-206): GT-aligned src
    point within the pair's own threshold of its match."""
    Tg = jnp.asarray(np.asarray(T_gt, np.float32))
    p = transform_cloud_xyz(src.xyz, src.valid, Tg)[corrs.query]
    q = tgt.xyz[corrs.match]
    d = jnp.sqrt(jnp.maximum(jnp.sum((p - q) ** 2, axis=-1), 0.0))
    return np.asarray((d < corrs.threshold) & corrs.valid)


def correspondence_uniformity(src: Cloud, corrs: Correspondences, sel_mask) -> float:
    """calculateCorrespondenceUniformity over a subset of correspondences."""
    lo, hi = aabb(src)
    p = src.xyz[corrs.query]
    bins3 = metricsmod.uniformity_bins(p, lo, hi)
    mask = jnp.asarray(sel_mask)[None, :]
    ent = metricsmod.uniformity_entropy(mask, bins3)
    return float(np.asarray(ent[0]))


@dataclass
class AlignmentAnalysis:
    """AlignmentAnalysis (analysis.cpp:208-328 + analysis.h:36-98)."""

    result: AlignmentResult
    parameters: AlignmentParameters
    metric: float = 0.0
    rmse: float = 0.0
    n_inliers: int = 0
    n_correct_inliers: int = 0
    n_correspondences: int = 0
    n_correct_correspondences: int = 0
    r_error: float = float("nan")
    t_error: float = float("nan")
    pcd_error: float = float("nan")
    overlap_error: float = float("nan")
    normal_diff: float = float("nan")
    corr_uniformity: float = float("nan")
    overlap: float = float("nan")
    overlap_area: float = float("nan")

    def has_converged(self) -> bool:
        return self.result.converged

    def running_time(self) -> float:
        return self.result.time_cs + self.result.time_te

    def start(self, transformation_gt, testname: str, save: bool = True):
        t0 = time.time()
        src, tgt = self.result.src, self.result.tgt
        params = self.parameters
        corrs = self.result.correspondences
        T = self.result.transformation

        ctx = build_metric_context(src, tgt, corrs, params, sparse=False)
        m, inl, rmse, mask, _sup = _evaluate_one(ctx, jnp.asarray(T))
        self.metric = float(np.asarray(m))
        self.rmse = float(np.asarray(rmse))
        self.n_inliers = int(np.asarray(inl))
        self.n_correspondences = int(np.asarray(corrs.count()))

        if transformation_gt is not None:
            T_gt = np.asarray(transformation_gt, np.float32)
            thr = params.distance_thr
            # overlap ratio/area over GT alignment (analysis.cpp:226-234)
            src_gt = src.transformed(jnp.asarray(T_gt))
            ov_src, ov_tgt = merge_overlaps(src_gt, tgt, thr)
            n_ov = int(np.asarray(jnp.sum(ov_src))) + int(np.asarray(jnp.sum(ov_tgt)))
            n_total = int(np.asarray(src.count())) + int(np.asarray(tgt.count()))
            self.overlap = n_ov / max(n_total, 1)
            self.overlap_area = self._overlap_area(src_gt, tgt, ov_src, ov_tgt, src)

            cc = correct_correspondences(src, tgt, corrs, T_gt)
            self.n_correct_correspondences = int(cc.sum())
            # correct inliers: inlier mask AND GT-check (metric.cpp:83-101)
            ci = np.asarray(mask) & cc
            self.n_correct_inliers = int(ci.sum())
            self.pcd_error = pointcloud_rmse(src, T, T_gt)
            self.overlap_error = overlap_rmse(src, tgt, T, T_gt, thr)
            self.normal_diff = normal_difference(src, tgt, thr, T_gt)
            self.corr_uniformity = correspondence_uniformity(src, corrs, cc)
            r, t = rotation_translation_error(
                jnp.asarray(np.asarray(T, np.float32)), jnp.asarray(T_gt)
            )
            self.r_error = float(np.asarray(r))
            self.t_error = float(np.asarray(t))

        self.print_report(transformation_gt)
        if save:
            self.save(testname)
        return self

    def _overlap_area(self, src_gt, tgt, ov_src, ov_tgt, src) -> float:
        """Density-squared sums ratio (analysis.cpp:229-234)."""
        ov1 = np.asarray(ov_src)
        ov2 = np.asarray(ov_tgt)
        xyz = np.concatenate(
            [np.asarray(src_gt.xyz)[ov1], np.asarray(tgt.xyz)[ov2]], axis=0
        )
        if len(xyz) < 2:
            return 0.0
        ov_cloud = Cloud.from_numpy(xyz)
        ds_ov, _ = smoothed_densities(ov_cloud)
        ds_src, _ = smoothed_densities(src)
        num = float(np.sum(np.asarray(ds_ov)[np.asarray(ov_cloud.valid)] ** 2))
        den = float(np.sum(np.asarray(ds_src)[np.asarray(src.valid)] ** 2))
        return num / max(den, 1e-30)

    def print_report(self, transformation_gt):
        T = self.result.transformation
        print("\n Estimated transformation:")
        print(np.array_str(np.asarray(T), precision=3, suppress_small=True))
        if transformation_gt is not None:
            print(" Ground truth transformation:")
            print(np.array_str(np.asarray(transformation_gt), precision=3, suppress_small=True))
        print(f"converged: {str(self.result.converged).lower()}")
        print(f"metric: {self.metric:.7f}")
        print(f"inliers_rmse: {self.rmse:.7f}")
        if transformation_gt is not None:
            print(f"correct inliers: {self.n_correct_inliers}/{self.n_inliers}")
            print(
                "correct correspondences: "
                f"{self.n_correct_correspondences}/{self.n_correspondences}"
            )
            print(f"rotation error (deg): {np.degrees(self.r_error):.7f}")
            print(f"translation error: {self.t_error:.7f}")
            print(f"point cloud error: {self.pcd_error:.7f}")
            print(f"median of normal differences (deg): {np.degrees(self.normal_diff):.7f}")
            print(
                "uniformity of correct correspondences' distribution: "
                f"{self.corr_uniformity:.7f}"
            )
        else:
            print(f"inliers: {self.n_inliers}")
            print(f"correspondences: {self.n_correspondences}")

    HEADER = (
        "version,descriptor,testname,metric,rmse,correspondences,"
        "correct_correspondences,inliers,correct_inliers,nr_points,"
        "distance_thr,edge_thr,iteration,matching_type,randomness,r_err,"
        "t_err,pcd_err,normal_diff,corr_uniformity,lrf_type,metric_type,"
        "overlap_rmse,alignment_type,keypoint_type,time_cs,time_te,"
        "score_type,iss_radius_src,iss_radius_tgt,normal_nr_points,"
        "reestimate,scale,cluster_k,feature_radius,overlap,overlap_area,"
        "converged\n"
    )

    def save(self, testname: str, dir_path: Optional[str] = None):
        """Append a row to test_results.csv (analysis.cpp:274-328)."""
        p = self.parameters
        filepath = construct_path_simple(
            "test", "results", "csv", with_version=False,
            dir_path=dir_path or p.dir_path,
        )
        exists = os.path.exists(filepath)
        matching_id = p.matching_id
        if matching_id == MATCHING_RATIO:
            matching_id += str(p.ratio_k)
        with open(filepath, "a") as f:
            if not exists:
                f.write(self.HEADER)
            row = [
                VERSION,
                p.descriptor_id,
                testname,
                f"{self.metric:g}",
                f"{self.rmse:g}",
                str(self.n_correspondences),
                str(self.n_correct_correspondences),
                str(self.n_inliers),
                str(self.n_correct_inliers),
                str(p.feature_nr_points),
                f"{p.distance_thr:g}",
                f"{p.edge_thr_coef:g}",
                str(self.result.iterations),
                matching_id,
                str(p.randomness),
                f"{self.r_error:g}",
                f"{self.t_error:g}",
                f"{self.pcd_error:g}",
                f"{self.normal_diff:g}",
                f"{self.corr_uniformity:g}",
                p.lrf_id,
                p.metric_id,
                f"{self.overlap_error:g}",
                p.alignment_id,
                p.keypoint_id,
                f"{self.result.time_cs:g}",
                f"{self.result.time_te:g}",
                p.score_id,
                f"{p.iss_radius_src:g}",
                f"{p.iss_radius_tgt:g}",
                str(p.normal_nr_points),
                str(int(p.reestimate_frames)),
                f"{p.scale_factor:g}",
                str(p.cluster_k),
                "" if p.feature_radius is None else f"{p.feature_radius:g}",
                f"{self.overlap:g}",
                f"{self.overlap_area:g}",
                str(int(self.result.converged)),
            ]
            f.write(",".join(row) + "\n")

def surface_area(cloud: Cloud, k: int = 8) -> float:
    """Mesh-free surface-area estimate of a scanned cloud.

    The reference's calculateSurfaceArea (src/main.cpp:118-150, dead code —
    its caller is commented out) triangulates with GreedyProjection and sums
    triangle areas.  TPU re-design: each point claims the disk spanned by
    its k nearest neighbors, so its area share is pi * d_k^2 / k; summing
    shares integrates the sampled surface without building a mesh (the
    estimator is exact in expectation for uniform sampling of a smooth
    surface).  Returns the estimate in squared input units."""
    n_valid = max(int(np.asarray(cloud.count())), 1)
    k_eff = min(k, max(n_valid - 1, 1))
    from lidar_global_registration_tpu.ops.density import _auto_cell_size

    cell = _auto_cell_size(cloud, k_eff + 1)
    for _ in range(8):
        g = gridmod.build_grid(cloud.xyz, cloud.valid, cell, cell_cap=64)
        idx, d, mask = gridmod.knn(
            g, cloud.xyz, cloud.valid, k_eff + 1, cap=64, include_self=False
        )
        kth = jnp.where(mask[:, k_eff - 1], d[:, k_eff - 1], jnp.float32(1e38))
        covered = int(
            np.asarray(
                jnp.sum((jnp.sum(mask, axis=1) >= k_eff) & (kth <= cell) & cloud.valid)
            )
        )
        if covered >= 0.999 * n_valid:
            break
        cell *= 2.0
    dk = np.asarray(d)[:, k_eff - 1]
    ok = np.asarray(mask)[:, k_eff - 1] & np.asarray(cloud.valid)
    return float(np.sum(np.pi * dk[ok] ** 2 / k_eff))
