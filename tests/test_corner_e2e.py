"""Synthetic-corner end-to-end test.

Port of the reference's only self-contained e2e test
(tests/point2plane_distance.cpp): two shifted 3-plane "corner" clouds under
a known GT transform, full pipeline with the closest_plane metric; asserts
inlier ratio ~ 1, metric error < 2/3, overlap RMSE < 0.72.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from lidar_global_registration_tpu.types import AlignmentParameters, Cloud
from lidar_global_registration_tpu.ops.normals import estimate_normals_knn
from lidar_global_registration_tpu.ops.transform import rotation_translation_error
from lidar_global_registration_tpu.models.pipeline import align_point_clouds
from lidar_global_registration_tpu.models.ransac import build_metric_context, _evaluate_one
from lidar_global_registration_tpu.analysis import overlap_rmse

CORNER = 40  # fast variant; the reference fixture (100, SHIFT 5) runs as slow
SHIFT = 2.0  # scaled with CORNER to keep the reference's shift/span ratio

T_GT = np.array(
    [
        [0.0803703, -0.996763, -0.00201846, 1.2143],
        [0.996758, 0.080377, -0.00349969, -6.13404],
        [0.00365057, -0.00173067, 0.999992, -1.17221],
        [0, 0, 0, 1],
    ],
    np.float32,
)


def build_corner_pair(corner=None, shift=None):
    corner = CORNER if corner is None else corner
    shift = SHIFT if shift is None else shift
    src_rows, tgt_rows = [], []
    for i in range(corner):
        for j in range(corner):
            src_rows.append([0 * shift + 2.0 * i, 0 * shift + 2.0 * j, 0.0])
            src_rows.append([1 * shift + 2.0 * i, 0.0, 1 * shift + 2.0 * j])
            src_rows.append([0.0, 2 * shift + 2.0 * i, 2 * shift + 2.0 * j])
            tgt_rows.append([0 * shift + 2.0 * i + 1.0, 0 * shift + 2.0 * j, 0.0])
            tgt_rows.append([1 * shift + 2.0 * i, 0.0, 1 * shift + 2.0 * j + 1.0])
            tgt_rows.append([0.0, 2 * shift + 2.0 * i + 1.0, 2 * shift + 2.0 * j])
    src_pts = np.array(src_rows, np.float32)
    tgt_pts = np.array(tgt_rows, np.float32)
    # src is expressed in its own frame: apply inv(T_GT)
    inv = np.linalg.inv(T_GT)
    src_pts = src_pts @ inv[:3, :3].T + inv[:3, 3]
    return src_pts.astype(np.float32), tgt_pts


@pytest.mark.slow
def test_corner_end_to_end():
    src_pts, tgt_pts = build_corner_pair()
    vp_tgt = np.array([2.0 * CORNER] * 3, np.float32)
    vp_src = T_GT[:3, :3].T @ (vp_tgt - T_GT[:3, 3])

    src = Cloud.from_numpy(src_pts)
    tgt = Cloud.from_numpy(tgt_pts)
    src = estimate_normals_knn(src, k=30, viewpoint=vp_src)
    tgt = estimate_normals_knn(tgt, k=30, viewpoint=vp_tgt)

    params = AlignmentParameters(
        distance_thr=1.0,
        iss_radius_src=1.0,
        iss_radius_tgt=1.0,
        keypoint_id="any",
        metric_id="closest_plane",
        max_iterations=10000,
        ground_truth=T_GT,
        vp_src=vp_src,
        vp_tgt=vp_tgt,
        testname="corners",
        hypothesis_batch=256,
    )
    res = align_point_clouds(src, tgt, params, save_artifacts=False)
    assert res.converged

    # non-sparse closest-plane inlier ratio ~ 1 (point2plane_distance.cpp:97)
    ctx = build_metric_context(src, tgt, res.correspondences, params, sparse=False)
    metric, inliers, rmse, _mask, _sup = _evaluate_one(
        ctx, jnp.asarray(res.transformation)
    )
    n_src = int(np.asarray(src.count()))
    ratio = float(np.asarray(inliers)) / n_src
    assert abs(ratio - 1.0) < 1e-2, ratio
    assert float(np.asarray(rmse)) < 2.0 / 3.0

    # Reference asserts < 0.72 at CORNER=100; at the reduced CORNER=40 the
    # in-plane +1 shifts pull the point-to-point refit slightly harder
    # (boundary fraction is larger), landing ~0.77.  The success criterion
    # of the measure harness is overlap_error < distance_thr (main.cpp:356).
    ov = overlap_rmse(src, tgt, res.transformation, T_GT, params.distance_thr)
    assert ov < 0.8, ov
    assert ov < params.distance_thr

    r_err, _t_err = rotation_translation_error(
        jnp.asarray(res.transformation), jnp.asarray(T_GT)
    )
    assert float(r_err) < 2e-2


@pytest.mark.slow
def test_corner_end_to_end_reference_size():
    """The reference fixture verbatim: CORNER_SIZE=100, SHIFT=5, overlap
    RMSE < 0.72 (tests/point2plane_distance.cpp:10-11,94-96)."""
    corner = 100
    src_pts, tgt_pts = build_corner_pair(corner=corner, shift=5.0)
    vp_tgt = np.array([2.0 * corner] * 3, np.float32)
    vp_src = T_GT[:3, :3].T @ (vp_tgt - T_GT[:3, 3])

    src = Cloud.from_numpy(src_pts)
    tgt = Cloud.from_numpy(tgt_pts)
    src = estimate_normals_knn(src, k=30, viewpoint=vp_src)
    tgt = estimate_normals_knn(tgt, k=30, viewpoint=vp_tgt)

    params = AlignmentParameters(
        distance_thr=1.0,
        iss_radius_src=1.0,
        iss_radius_tgt=1.0,
        keypoint_id="any",
        metric_id="closest_plane",
        max_iterations=10000,
        ground_truth=T_GT,
        vp_src=vp_src,
        vp_tgt=vp_tgt,
        testname="corners",
        hypothesis_batch=256,
    )
    res = align_point_clouds(src, tgt, params, save_artifacts=False)
    assert res.converged

    ctx = build_metric_context(src, tgt, res.correspondences, params, sparse=False)
    _metric, inliers, rmse, _mask, _sup = _evaluate_one(
        ctx, jnp.asarray(res.transformation)
    )
    n_src = int(np.asarray(src.count()))
    ratio = float(np.asarray(inliers)) / n_src
    assert abs(ratio - 1.0) < 1e-2, ratio
    assert float(np.asarray(rmse)) < 2.0 / 3.0

    ov = overlap_rmse(src, tgt, res.transformation, T_GT, params.distance_thr)
    assert ov < 0.72, ov
