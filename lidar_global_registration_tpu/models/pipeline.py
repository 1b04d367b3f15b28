"""End-to-end registration pipeline: load -> preprocess -> correspondences
-> pose solve -> persist.

Reference call stack (SURVEY.md section 3.1): loadPointClouds
(common.cpp:429-470) -> getParametersFromConfig -> alignPointClouds
(alignment.cpp:72-110) dispatching ransac | gror | teaser, persisting the
correspondence CSV cache and transformations.csv.
"""
from __future__ import annotations

import os
import time
from typing import Optional

import numpy as np
import jax.numpy as jnp

from lidar_global_registration_tpu.ops.density import cloud_density
from lidar_global_registration_tpu.ops.downsample import voxel_downsample
from lidar_global_registration_tpu.ops.normals import estimate_normals_knn
from lidar_global_registration_tpu.types import (
    ALIGNMENT_GROR,
    ALIGNMENT_RANSAC,
    ALIGNMENT_TEASER,
    AlignmentParameters,
    AlignmentResult,
    Cloud,
    Correspondences,
    FINE_VOXEL_SIZE_COEFFICIENT,
    NORMAL_NR_POINTS,
)
from lidar_global_registration_tpu.utils import io as iomod
from lidar_global_registration_tpu.utils.config import Config, expand_parameters
from lidar_global_registration_tpu.utils.naming import (
    DATA_DEBUG_PATH,
    TRANSFORMATIONS_CSV,
    construct_name,
    construct_path,
)


def cloud_from_ply(path: str):
    """Load one scan: returns (Cloud, field_names)."""
    from lidar_global_registration_tpu.utils import native

    fields, names = iomod.read_ply(path)
    xyz = np.stack([fields["x"], fields["y"], fields["z"]], axis=1).astype(np.float32)
    normal = None
    if iomod.cloud_has_normals(names):
        normal = np.stack(
            [fields["normal_x"], fields["normal_y"], fields["normal_z"]], axis=1
        ).astype(np.float32)
    # exact-duplicate removal (common.cpp:417-427), native hash set
    keep = native.dedup_points(xyz)
    xyz = xyz[keep]
    if normal is not None:
        normal = normal[keep]
    return Cloud.from_numpy(xyz, normal=normal), names


def preprocess_cloud(
    cloud: Cloud,
    viewpoint=None,
    normals_available: bool = False,
    normal_nr_points: int = NORMAL_NR_POINTS,
):
    """Fine pre-downsample at 2x density + normal estimation
    (loadPointClouds, common.cpp:444-464).  Returns (cloud, density)."""
    density = cloud_density(cloud)
    voxel = FINE_VOXEL_SIZE_COEFFICIENT * density
    if voxel > 0:
        cloud = voxel_downsample(cloud, voxel).compact()
    cloud = estimate_normals_knn(
        cloud,
        k=normal_nr_points,
        viewpoint=viewpoint,
        normals_available=normals_available,
    )
    return cloud


def load_point_clouds(config: Config):
    """loadPointClouds equivalent.  Returns (testname, src, tgt,
    fields_src, fields_tgt, density_src, density_tgt)."""
    src_path = config.get("source")
    tgt_path = config.get("target")
    src, fields_src = cloud_from_ply(src_path)
    tgt, fields_tgt = cloud_from_ply(tgt_path)
    normals_available = iomod.cloud_has_normals(fields_src) and iomod.cloud_has_normals(
        fields_tgt
    )
    vp_src = iomod.load_viewpoint(config.get("viewpoints"), src_path)
    vp_tgt = iomod.load_viewpoint(config.get("viewpoints"), tgt_path)
    src = preprocess_cloud(src, vp_src, normals_available)
    tgt = preprocess_cloud(tgt, vp_tgt, normals_available)
    density_src = cloud_density(src)
    density_tgt = cloud_density(tgt)
    sb = os.path.basename(src_path)
    tb = os.path.basename(tgt_path)
    testname = sb[: sb.rfind(".")] + "_" + tb[: tb.rfind(".")]
    return (
        testname,
        src,
        tgt,
        fields_src,
        fields_tgt,
        density_src,
        density_tgt,
        normals_available,
        vp_src,
        vp_tgt,
    )


def parameters_from_config(config: Config, density_src, density_tgt, normals_available,
                           vp_src=None, vp_tgt=None):
    return expand_parameters(
        config, density_src, density_tgt, normals_available, vp_src, vp_tgt
    )


def align_point_clouds(
    src: Cloud,
    tgt: Cloud,
    params: AlignmentParameters,
    save_artifacts: bool = True,
    correspondences: Optional[Correspondences] = None,
) -> AlignmentResult:
    """alignPointClouds (alignment.cpp:72-110)."""
    from lidar_global_registration_tpu.models.pyramid import (
        feature_based_correspondence_search,
    )
    from lidar_global_registration_tpu.models.ransac import align_ransac
    from lidar_global_registration_tpu.models.gror import align_gror

    time_cs = 0.0
    if correspondences is None:
        t0 = time.time()
        correspondences = feature_based_correspondence_search(src, tgt, params)
        time_cs = time.time() - t0
        if save_artifacts:
            filepath = construct_path(
                params, "correspondences", "csv", True, False, False
            )
            iomod.save_correspondences_csv(
                filepath, np.asarray(src.xyz), np.asarray(tgt.xyz), correspondences
            )

    if params.alignment_id == ALIGNMENT_GROR:
        result = align_gror(src, tgt, correspondences, params)
    elif params.alignment_id == ALIGNMENT_TEASER:
        raise NotImplementedError("Not implemented: support TEASER")
    else:
        if params.alignment_id != ALIGNMENT_RANSAC:
            import warnings

            warnings.warn(
                f"alignment {params.alignment_id!r} isn't supported, RANSAC used"
            )
        result = align_ransac(src, tgt, correspondences, params)
    result.time_cs = time_cs

    if save_artifacts:
        csv = os.path.join(DATA_DEBUG_PATH, TRANSFORMATIONS_CSV)
        os.makedirs(DATA_DEBUG_PATH, exist_ok=True)
        if params.ground_truth is not None:
            iomod.save_transformation(
                csv, construct_name(params, "transformation_gt"), params.ground_truth
            )
        iomod.save_transformation(
            csv, construct_name(params, "transformation"), result.transformation
        )
    return result


def run_test(config: Config, save_artifacts: bool = True):
    """runTest (main.cpp:21-39): load, expand, align, analyze each."""
    from lidar_global_registration_tpu.analysis import AlignmentAnalysis

    (
        testname,
        src,
        tgt,
        _fs,
        _ft,
        density_src,
        density_tgt,
        normals_available,
        vp_src,
        vp_tgt,
    ) = load_point_clouds(config)
    gt = None
    gt_csv = config.get("ground_truth")
    if gt_csv:
        gt = iomod.get_transformation_gt(
            gt_csv,
            os.path.basename(config.get("source")),
            os.path.basename(config.get("target")),
        )
    analyses = []
    for params in parameters_from_config(
        config, density_src, density_tgt, normals_available, vp_src, vp_tgt
    ):
        params = params.replace(
            testname=testname, ground_truth=None if gt is None else np.asarray(gt)
        )
        print("Starting alignment...")
        result = align_point_clouds(src, tgt, params, save_artifacts)
        analysis = AlignmentAnalysis(result, params).start(gt, testname, save_artifacts)
        analyses.append(analysis)
    return analyses
