"""Multi-hypothesis pool + inlier-uniformity hypothesis selection.

Reference: src/hypotheses.cpp (compile-time-gated by
SAVE_MULTIPLE_HYPOTHESES in sac_prerejective_omp.cpp:11): RANSAC keeps a
deduplicated pool of dissimilar transforms (similar = rotation < 20 deg AND
translation < 20 x distance_thr apart; prune anything < 0.1 x best metric)
and the winner is chosen by the entropy-uniformity of its inliers.

TPU re-design: the pool stays tiny (tens of entries) so it is maintained
host-side between batched rounds; the expensive part — scoring every pooled
hypothesis — is one batched metric evaluation.
"""
from __future__ import annotations

import os
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from lidar_global_registration_tpu.ops import metrics as metricsmod
from lidar_global_registration_tpu.ops.downsample import aabb
from lidar_global_registration_tpu.ops.transform import rotation_translation_error
from lidar_global_registration_tpu.types import (
    AlignmentParameters,
    Cloud,
    Correspondences,
)
from lidar_global_registration_tpu.utils.naming import construct_path_simple

MIN_ANGLE = np.pi / 9  # hypotheses.cpp:8
MIN_DISTANCE_COEF = 20
MIN_METRIC_COEF = 0.1


def update_hypotheses(
    transformations: List[np.ndarray],
    metrics: List[float],
    new_transformation: np.ndarray,
    new_metric: float,
    params: AlignmentParameters,
) -> None:
    """updateHypotheses (hypotheses.cpp:14-48), in place."""
    assert len(transformations) == len(metrics)
    best = max(metrics) if metrics else 0.0
    if new_metric < MIN_METRIC_COEF * best:
        return
    similar_desc = []
    for i in range(len(transformations) - 1, -1, -1):
        r, t = rotation_translation_error(
            jnp.asarray(np.asarray(new_transformation, np.float32)),
            jnp.asarray(np.asarray(transformations[i], np.float32)),
        )
        is_similar = float(r) < MIN_ANGLE and float(t) < MIN_DISTANCE_COEF * params.distance_thr
        if is_similar:
            if metrics[i] > new_metric:
                return  # a better similar hypothesis already exists
            similar_desc.append(i)
    for i in similar_desc:  # already descending
        del transformations[i]
        del metrics[i]
    transformations.append(np.asarray(new_transformation))
    metrics.append(float(new_metric))
    if new_metric > best:
        for i in range(len(transformations) - 1, -1, -1):
            if metrics[i] < MIN_METRIC_COEF * new_metric:
                del transformations[i]
                del metrics[i]


def choose_best_hypothesis(
    src: Cloud,
    tgt: Cloud,
    corrs: Correspondences,
    params: AlignmentParameters,
    tns: List[np.ndarray],
    save_csv: bool = True,
) -> np.ndarray:
    """chooseBestHypothesis (hypotheses.cpp:50-130): winner by the
    3-axis entropy uniformity of each hypothesis's correspondence inliers.
    Appends a row per hypothesis to test_hypotheses.csv."""
    from lidar_global_registration_tpu.analysis import merge_overlaps
    from lidar_global_registration_tpu.ops.density import smoothed_densities

    if not tns:
        return np.eye(4, dtype=np.float32)
    p = src.xyz[corrs.query]
    q = tgt.xyz[corrs.match]
    lo, hi = aabb(src)
    bins3 = metricsmod.uniformity_bins(p, lo, hi)

    analyzed = []
    ids = []
    if params.ground_truth is not None:
        analyzed.append(np.asarray(params.ground_truth, np.float32))
        ids.append("gt")
    analyzed += [np.asarray(t, np.float32) for t in tns]
    ids += [str(i + 1) for i in range(len(tns))]

    T = jnp.asarray(np.stack(analyzed))
    R = T[:, :3, :3]
    t = T[:, :3, 3]
    metric, cnt, _rmse, mask, _d = metricsmod.corr_metric(
        R, t, p, q, corrs.threshold, corrs.valid, "mse"
    )
    unif = metricsmod.uniformity_entropy(mask, bins3)

    rows = []
    best_u = 0.0
    best_T = np.eye(4, dtype=np.float32)
    mask_np = np.asarray(mask)
    for i, label in enumerate(ids):
        r_err = t_err = ""
        if params.ground_truth is not None:
            r, tt = rotation_translation_error(
                jnp.asarray(analyzed[i]),
                jnp.asarray(np.asarray(params.ground_truth, np.float32)),
            )
            r_err, t_err = f"{float(r):g}", f"{float(tt):g}"
        inlier_xyz = np.asarray(p)[mask_np[i]]
        inl_area = 0.0
        ov_count = 0
        ov_area = 0.0
        if len(inlier_xyz) > 1:
            inl_cloud = Cloud.from_numpy(inlier_xyz)
            ds, _ = smoothed_densities(inl_cloud)
            inl_area = float(np.sum(np.asarray(ds)[np.asarray(inl_cloud.valid)] ** 2))
        moved = src.transformed(jnp.asarray(analyzed[i]))
        ovs, ovt = merge_overlaps(moved, tgt, params.distance_thr)
        xyz_ov = np.concatenate(
            [np.asarray(moved.xyz)[np.asarray(ovs)], np.asarray(tgt.xyz)[np.asarray(ovt)]]
        )
        ov_count = len(xyz_ov)
        if ov_count > 1:
            ovc = Cloud.from_numpy(xyz_ov)
            ds, _ = smoothed_densities(ovc)
            ov_area = float(np.sum(np.asarray(ds)[np.asarray(ovc.valid)] ** 2))
        u = float(np.asarray(unif[i]))
        rows.append(
            f"{params.testname},{label},{r_err},{t_err},{int(cnt[i])},"
            f"{float(metric[i]):g},{inl_area:g},{u:g},{ov_count},{ov_area:g}\n"
        )
        if label != "gt" and u > best_u:
            best_u = u
            best_T = analyzed[i]

    if save_csv:
        filepath = construct_path_simple("test", "hypotheses", "csv", with_version=False)
        exists = os.path.exists(filepath)
        with open(filepath, "a") as f:
            if not exists:
                f.write(
                    "testname,id,r_err,t_err,inliers,mse,inliers_area,"
                    "uniformity,overlap,overlap_area\n"
                )
            f.writelines(rows)
    return best_T
