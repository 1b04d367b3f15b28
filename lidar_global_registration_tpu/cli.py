"""CLI / experiment driver.

Reference: src/main.cpp — `registration <alignment|metric|debug> config.yaml`
with multi-test dispatch over the `tests:` list; test types: test / compare /
keypoint / measure (main.cpp:384-431).

Usage:  python -m lidar_global_registration_tpu <command> config.yaml
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

from lidar_global_registration_tpu.types import (
    ALIGNMENT_RANSAC,
    METRIC_SCORE_CONSTANT,
    METRIC_WEIGHTED_CLOSEST_PLANE,
    Correspondences,
    round_up,
)
from lidar_global_registration_tpu.utils import io as iomod
from lidar_global_registration_tpu.utils.config import Config
from lidar_global_registration_tpu.utils.naming import (
    DATA_DEBUG_PATH,
    TRANSFORMATIONS_CSV,
    construct_name,
    construct_path,
    construct_path_simple,
)

ALIGNMENT = "alignment"
METRIC_ANALYSIS = "metric"
DEBUG = "debug"


def _load_common(config: Config):
    from lidar_global_registration_tpu.models.pipeline import (
        load_point_clouds,
        parameters_from_config,
    )

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
    if config.get("ground_truth"):
        gt = iomod.get_transformation_gt(
            config.get("ground_truth"),
            os.path.basename(config.get("source")),
            os.path.basename(config.get("target")),
        )
    params_list = parameters_from_config(
        config, density_src, density_tgt, normals_available, vp_src, vp_tgt
    )
    params_list = [
        p.replace(testname=testname, ground_truth=None if gt is None else np.asarray(gt))
        for p in params_list
    ]
    return testname, src, tgt, gt, params_list


def _read_cached_correspondences(params):
    path = construct_path(params, "correspondences", "csv", True, False, False)
    data = iomod.read_correspondences_csv(path)
    if data is None:
        print(f"Failed to read correspondences for {params.testname} ({path})")
        sys.exit(1)
    q, m, d, t = data
    import jax.numpy as jnp

    cap = round_up(max(len(q), 1))
    c = Correspondences.empty(cap)
    qq = np.zeros(cap, np.int32)
    mm = np.zeros(cap, np.int32)
    dd = np.zeros(cap, np.float32)
    tt = np.full(cap, 1.0, np.float32)
    vv = np.zeros(cap, bool)
    qq[: len(q)], mm[: len(q)], dd[: len(q)], tt[: len(q)], vv[: len(q)] = (
        q, m, d, t, True,
    )
    return Correspondences(
        query=jnp.asarray(qq), match=jnp.asarray(mm), distance=jnp.asarray(dd),
        threshold=jnp.asarray(tt), valid=jnp.asarray(vv),
    )


def estimate_test_metric(config: Config):
    """`metric` command (main.cpp:41-116): re-score cached transformation +
    cached correspondences with corr & closest-plane metrics vs GT."""
    import jax.numpy as jnp

    from lidar_global_registration_tpu.models.ransac import (
        _evaluate_one,
        build_metric_context,
    )

    testname, src, tgt, gt, params_list = _load_common(config)
    if gt is None:
        print(f"Failed to read ground truth for {testname}!")
        sys.exit(1)
    filepath = construct_path_simple("test", "metrics", "csv", with_version=False)
    exists = os.path.exists(filepath)
    with open(filepath, "a") as fout:
        if not exists:
            fout.write(
                "testname,metric_corr,metric_icp,inliers_corr,inliers_icp,"
                "metric_corr_gt,metric_icp_gt,inliers_corr_gt,inliers_icp_gt\n"
            )
        for params in params_list:
            tn_name = config.get("transformation", construct_name(params, "transformation"))
            tn = iomod.get_transformation(
                os.path.join(DATA_DEBUG_PATH, TRANSFORMATIONS_CSV), tn_name
            )
            corrs = _read_cached_correspondences(params)
            ctx_corr = build_metric_context(
                src, tgt, corrs, params.replace(metric_id="correspondences"), False
            )
            ctx_icp = build_metric_context(
                src, tgt, corrs, params.replace(metric_id="closest_plane"), False
            )
            row = [construct_name(params, "metric", True, True, False)]
            for T in (tn, gt):
                Tj = jnp.asarray(np.asarray(T, np.float32))
                mc, ic, _r, _m, _s = _evaluate_one(ctx_corr, Tj)
                mi, ii, _r2, _m2, _s2 = _evaluate_one(ctx_icp, Tj)
                row += [f"{float(mc):g}", f"{float(mi):g}", str(int(ic)), str(int(ii))]
            fout.write(",".join(row) + "\n")
    print(f"appended {filepath}")


def generate_debug_files(config: Config):
    """`debug` command (main.cpp:229-284): regenerate debug artifacts from
    the correspondence / transformation caches."""
    import jax.numpy as jnp

    from lidar_global_registration_tpu.analysis import correct_correspondences
    from lidar_global_registration_tpu.models.ransac import (
        _evaluate_one,
        build_metric_context,
    )
    from lidar_global_registration_tpu.ops.iss import detect_keypoints
    from lidar_global_registration_tpu.ops.weights import weight_function
    from lidar_global_registration_tpu.utils import debug_viz

    testname, src, tgt, gt, params_list = _load_common(config)
    for params in params_list:
        corrs = _read_cached_correspondences(params)
        tn = iomod.get_transformation(
            os.path.join(DATA_DEBUG_PATH, TRANSFORMATIONS_CSV),
            construct_name(params, "transformation"),
        )
        idx_src = detect_keypoints(src, params.keypoint_id, params.iss_radius_src)
        idx_tgt = detect_keypoints(tgt, params.keypoint_id, params.iss_radius_tgt)
        if params.keypoint_id == "iss":
            # ISS third-eigenvalue saliency dump (ISSKeypoint3DDebug::
            # saveEigenValues, src/pcl/iss_debug.cpp:4-12; triggered from
            # detectKeyPoints under debug, common.cpp:678).  Named
            # iss_saliency rather than the reference's "weights" tag so it
            # cannot collide with the weight-function dump below.
            from lidar_global_registration_tpu.ops.iss import iss_keypoints

            _kp, sal_src = iss_keypoints(src, params.iss_radius_src)
            _kp2, sal_tgt = iss_keypoints(tgt, params.iss_radius_tgt)
            debug_viz.save_colorized_weights(
                src, np.asarray(sal_src), "iss_saliency_src", params, np.eye(4)
            )
            debug_viz.save_colorized_weights(
                tgt, np.asarray(sal_tgt), "iss_saliency_tgt", params, np.eye(4)
            )
        ctx = build_metric_context(src, tgt, corrs, params, sparse=False)
        _m, _i, _r, inlier_mask, _s = _evaluate_one(ctx, jnp.asarray(np.asarray(tn, np.float32)))
        inlier_np = np.asarray(inlier_mask)[np.asarray(corrs.valid)]
        cc = None
        if gt is not None:
            cc_full = correct_correspondences(src, tgt, corrs, gt)
            cc = cc_full[np.asarray(corrs.valid)]
            debug_viz.save_cloud_with_correspondences(
                src, idx_src, corrs, cc, inlier_np, params, gt, True
            )
        debug_viz.save_cloud_with_correspondences(
            tgt, idx_tgt, corrs, cc, inlier_np, params, np.eye(4), False
        )
        if params.metric_id == METRIC_WEIGHTED_CLOSEST_PLANE:
            w = np.asarray(weight_function(params.weight_id, params.normal_nr_points, src))
            debug_viz.save_colorized_weights(src, w, "weights", params, tn)
        debug_viz.save_temperature_maps(src, tgt, "temperature", params, params.distance_thr, tn)
    print("debug artifacts written")


def compare_hypotheses(config: Config):
    """`compare` test type (main.cpp:152-227): temperature maps + weighted
    overlap counts for estimated vs GT transforms."""
    from lidar_global_registration_tpu.analysis import merge_overlaps
    from lidar_global_registration_tpu.ops.density import smoothed_densities
    from lidar_global_registration_tpu.types import Cloud
    from lidar_global_registration_tpu.utils import debug_viz
    import jax.numpy as jnp

    testname, src, tgt, gt, params_list = _load_common(config)
    if gt is None:
        print(f"Failed to read ground truth for {testname}!")
        sys.exit(1)
    for params in params_list:
        tn = iomod.get_transformation(
            os.path.join(DATA_DEBUG_PATH, TRANSFORMATIONS_CSV),
            construct_name(params, "transformation"),
        )
        debug_viz.save_temperature_maps(
            src, tgt, "temperature_gt", params, params.distance_thr, gt
        )
        debug_viz.save_temperature_maps(
            src, tgt, "temperature", params, params.distance_thr, tn
        )
        for label, T in (("incorrect", tn), ("correct", gt)):
            moved = src.transformed(jnp.asarray(np.asarray(T, np.float32)))
            ov_s, ov_t = merge_overlaps(moved, tgt, params.distance_thr)
            ovs = np.asarray(ov_s)
            ovt = np.asarray(ov_t)
            xyz = np.concatenate(
                [np.asarray(moved.xyz)[ovs], np.asarray(tgt.xyz)[ovt]], axis=0
            )
            count = len(xyz)
            wcount = 0.0
            if count > 1:
                ov_cloud = Cloud.from_numpy(xyz)
                ds, _ = smoothed_densities(ov_cloud)
                wcount = float(np.sum(np.asarray(ds)[np.asarray(ov_cloud.valid)] ** 2))
            print(f"\t{label} hypothesis: {count} points, {wcount} weighted points")


def analyze_keypoints(config: Config):
    """`keypoint` test type (main.cpp:286-310): dump colored keypoint PLYs."""
    from lidar_global_registration_tpu.ops.iss import detect_keypoints
    from lidar_global_registration_tpu.utils import debug_viz

    from lidar_global_registration_tpu.ops.iss import subvoxel_iss_keypoints
    from lidar_global_registration_tpu.types import Cloud

    testname, src, tgt, gt, params_list = _load_common(config)
    for params in params_list:
        idx_src = detect_keypoints(src, params.keypoint_id, params.iss_radius_src)
        idx_tgt = detect_keypoints(tgt, params.keypoint_id, params.iss_radius_tgt)
        # sub-voxel keypoint refinement dumps (main.cpp:302-306)
        sv_src, _i1, _o1 = subvoxel_iss_keypoints(src, params.iss_radius_src)
        sv_tgt, _i2, _o2 = subvoxel_iss_keypoints(tgt, params.iss_radius_tgt)
        from lidar_global_registration_tpu.utils.naming import construct_path

        if len(sv_src):
            debug_viz.save_colorized_cloud(
                Cloud.from_numpy(sv_src),
                gt if gt is not None else np.eye(4),
                debug_viz.COLOR_RED,
                construct_path(params, "subvoxel_kps_src"),
            )
        if len(sv_tgt):
            debug_viz.save_colorized_cloud(
                Cloud.from_numpy(sv_tgt),
                np.eye(4),
                debug_viz.COLOR_RED,
                construct_path(params, "subvoxel_kps_tgt"),
            )
        debug_viz.save_cloud_with_correspondences(
            src, idx_src, None, None, None, params,
            gt if gt is not None else np.eye(4), True,
        )
        debug_viz.save_cloud_with_correspondences(
            tgt, idx_tgt, None, None, None, params, np.eye(4), False
        )
        print(f"{len(idx_src)} src / {len(idx_tgt)} tgt keypoints")


def measure_test_results(config: Config):
    """`measure` test type — the benchmark harness (main.cpp:312-382):
    run alignment n_times with reseeding; success = converged AND
    overlap_error < distance_thr; append test_measurements.csv."""
    from lidar_global_registration_tpu.analysis import AlignmentAnalysis
    from lidar_global_registration_tpu.models.pipeline import align_point_clouds

    testname, src, tgt, gt, params_list = _load_common(config)
    n_times_cfg = int(config.get("n_times", 10))
    filepath = construct_path_simple("test", "measurements", "csv", with_version=False)
    exists = os.path.exists(filepath)
    with open(filepath, "a") as fout:
        if not exists:
            fout.write("testname,success_rate,mae,sae,mte,ste,mrmse,srmse,mtime,stime\n")
        for params in params_list:
            params = params.replace(fix_seed=False)
            if params.save_features and gt is not None:
                # main.cpp:342-344: dump nearest-point id mapping of the
                # target cloud under GT for offline feature analysis
                from lidar_global_registration_tpu.utils.debug_viz import (
                    save_extracted_point_ids,
                )

                save_extracted_point_ids(
                    src, tgt, gt, params,
                    np.asarray(tgt.xyz)[np.asarray(tgt.valid)],
                )
            n_times = n_times_cfg if params.alignment_id == ALIGNMENT_RANSAC else 1
            r_errs, t_errs, ov_errs, times = [], [], [], []
            n_success = 0
            for i in range(n_times):
                print("Starting alignment...")
                result = align_point_clouds(src, tgt, params)
                analysis = AlignmentAnalysis(result, params).start(gt, testname)
                ok = (
                    analysis.has_converged()
                    and analysis.overlap_error < params.distance_thr
                )
                if ok:
                    n_success += 1
                    r_errs.append(analysis.r_error)
                    t_errs.append(analysis.t_error)
                    ov_errs.append(analysis.overlap_error)
                times.append(analysis.running_time())

            def mean(v):
                return float(np.mean(v)) if v else float("nan")

            def std(v):
                return float(np.std(v)) if v else float("nan")

            fout.write(
                ",".join(
                    [
                        construct_name(params, "measure"),
                        f"{n_success / n_times:g}",
                        f"{mean(r_errs):g}", f"{std(r_errs):g}",
                        f"{mean(t_errs):g}", f"{std(t_errs):g}",
                        f"{mean(ov_errs):g}", f"{std(ov_errs):g}",
                        f"{mean(times):g}", f"{std(times):g}",
                    ]
                )
                + "\n"
            )
    print(f"appended {filepath}")


def process_tests(tests, command: str):
    from lidar_global_registration_tpu.models.pipeline import run_test

    for test_type, cfg in tests:
        if test_type == "test":
            if command == ALIGNMENT:
                run_test(cfg)
            elif command == METRIC_ANALYSIS:
                estimate_test_metric(cfg)
            elif command == DEBUG:
                generate_debug_files(cfg)
        elif test_type == "compare":
            compare_hypotheses(cfg)
        elif test_type == "keypoint":
            analyze_keypoints(cfg)
        elif test_type == "measure":
            measure_test_results(cfg)
        else:
            print(f"Test type {test_type} isn't supported!")


def main(argv=None):
    # Honor JAX_PLATFORMS even when a site plugin force-registered another
    # backend after reading the env (e.g. images that pin a TPU platform in
    # sitecustomize): re-assert the user's choice on the live config.
    plat = os.environ.get("JAX_PLATFORMS")
    import jax

    if plat:
        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass
    try:
        # persistent compile cache: first TPU compile of each kernel is slow
        # (remote-compiled); later runs of the CLI reuse the executables.
        # TPU-only: CPU AOT entries are machine-feature specific and loading
        # them on a different host risks SIGILL.
        if jax.default_backend() in ("tpu", "axon"):
            jax.config.update(
                "jax_compilation_cache_dir",
                os.environ.get(
                    "LGR_COMPILE_CACHE", os.path.expanduser("~/.lgr_jax_cache")
                ),
            )
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) != 2 or argv[0] not in (ALIGNMENT, METRIC_ANALYSIS, DEBUG):
        print(
            f"Syntax is: python -m lidar_global_registration_tpu "
            f"[{ALIGNMENT}, {METRIC_ANALYSIS}, {DEBUG}] config.yaml"
        )
        sys.exit(1)
    command, config_path = argv
    config = Config.load(config_path)
    from lidar_global_registration_tpu.utils.profiling import maybe_jax_profile
    tests = config.tests()
    from lidar_global_registration_tpu.models.pipeline import run_test

    with maybe_jax_profile():
        if tests is not None:
            process_tests(tests, command)
        elif command == ALIGNMENT:
            run_test(config)
        elif command == METRIC_ANALYSIS:
            estimate_test_metric(config)
        elif command == DEBUG:
            generate_debug_files(config)


if __name__ == "__main__":
    main()
