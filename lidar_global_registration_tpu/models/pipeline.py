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


def staged_envelope(params: AlignmentParameters):
    """Decide whether an expanded parameter set falls inside the staged TPU
    path's capability envelope (flagship.register_pair_staged): fpfh/shot x
    ransac/gror x fixed-radius or AUTO pyramid x cluster/lr matching x
    correspondences/uniformity metric.  Returns (FlagshipConfig | None,
    reason) — reason says which field forced the host pyramid path.

    The staged path is the reference-performance path (the <2 s/10M-pair
    configuration, BASELINE.md); the reference delivers ALL its performance
    through the same `registration alignment config.yaml` interface
    (main.cpp:409-431), so the CLI must reach it whenever semantics allow.
    """
    from lidar_global_registration_tpu.models.flagship import FlagshipConfig
    from lidar_global_registration_tpu.types import (
        DESCRIPTOR_FPFH,
        DESCRIPTOR_SHOT,
        FEATURE_NR_POINTS,
        FEATURES_REESTIMATE_FRAMES,
        KEYPOINT_ANY,
        KEYPOINT_ISS,
        LRF_GRAVITY,
        DEFAULT_LRF,
        MATCHING_CLUSTER,
        MATCHING_LEFT_TO_RIGHT,
        METRIC_CORRESPONDENCES,
        METRIC_UNIFORMITY,
        NORMAL_NR_POINTS,
    )

    gates = [
        (params.alignment_id in (ALIGNMENT_RANSAC, ALIGNMENT_GROR),
         f"alignment {params.alignment_id!r}"),
        (params.descriptor_id in (DESCRIPTOR_FPFH, DESCRIPTOR_SHOT),
         f"descriptor {params.descriptor_id!r}"),
        (params.keypoint_id in (KEYPOINT_ISS, KEYPOINT_ANY),
         f"keypoint {params.keypoint_id!r}"),
        # cluster consensus is defined over ISS keypoints; dense (any) mode
        # matches mutually (lr).  one_sided/ratio keep the host strategies.
        (params.matching_id == MATCHING_LEFT_TO_RIGHT
         or (params.matching_id == MATCHING_CLUSTER
             and params.keypoint_id == KEYPOINT_ISS),
         f"matching {params.matching_id!r} with keypoint {params.keypoint_id!r}"),
        (params.descriptor_id != DESCRIPTOR_SHOT
         or params.lrf_id in (LRF_GRAVITY, DEFAULT_LRF),
         f"lrf {params.lrf_id!r}"),
        (params.metric_id in (METRIC_CORRESPONDENCES, METRIC_UNIFORMITY),
         f"metric {params.metric_id!r}"),
        (not params.save_features, "save_features"),
        (params.guess is None, "initial guess (matchLocal is host-side)"),
        # file normals: the host path post-processes estimated normals
        # against them (common.cpp:593-628); the staged kernels re-estimate
        # from positions only
        (not params.normals_available, "file normals present"),
        (params.feature_nr_points == FEATURE_NR_POINTS,
         f"feature_nr {params.feature_nr_points}"),
        (params.normal_nr_points == NORMAL_NR_POINTS,
         f"normal_nr {params.normal_nr_points}"),
        (params.reestimate_frames == FEATURES_REESTIMATE_FRAMES,
         f"reestimate {params.reestimate_frames}"),
    ]
    for ok, reason in gates:
        if not ok:
            return None, reason
    if params.feature_radius is None:
        # AUTO radius = the multi-scale pyramid.  The staged pyramid runs on
        # the fused cell kernels (fs_mode preconditions in
        # flagship.register_pair_staged): cell backend + iss + cluster +
        # feature_scale enabled.  Anything else must keep the host pyramid's
        # faithful multi-scale semantics rather than silently collapsing to
        # a single derived scale.
        import jax

        cells_env = os.environ.get("LGR_CELL_FPFH", "1")
        cells_ok = cells_env == "force" or (
            cells_env != "0" and jax.default_backend() in ("tpu", "axon")
        )
        if not (
            cells_ok
            and params.keypoint_id == KEYPOINT_ISS
            and params.matching_id == MATCHING_CLUSTER
            and os.environ.get("LGR_FEATURE_SCALE", "1") != "0"
        ):
            return None, (
                "AUTO feature radius (multi-scale pyramid) needs the "
                "cell-kernel backend with iss+cluster"
            )
    use_iss = params.keypoint_id == KEYPOINT_ISS
    cfg = FlagshipConfig(
        rounds=64 if use_iss else 8,
        hypothesis_batch=params.hypothesis_batch,
        use_iss=use_iss,
        match_tile=4096,
        metric=params.metric_id,
        descriptor=params.descriptor_id,
        lrf=params.lrf_id if params.descriptor_id == DESCRIPTOR_SHOT
        else LRF_GRAVITY,
        alignment=params.alignment_id,
        pyramid=params.feature_radius is None,
        scale_factor=params.scale_factor,
        pyramid_randomness=params.randomness,
        cluster_matching=params.matching_id == MATCHING_CLUSTER,
        cluster_k=params.cluster_k,
        n_samples=params.n_samples,
        edge_thr=params.edge_thr_coef,
        confidence=params.confidence,
        bf16_matching=params.bf16_matching,
    )
    return cfg, ""


def _align_staged(
    src: Cloud,
    tgt: Cloud,
    params: AlignmentParameters,
    cfg,
    density_src: Optional[float] = None,
    density_tgt: Optional[float] = None,
) -> AlignmentResult:
    """Run the staged TPU path and repackage its result as AlignmentResult.

    Radii come from the params record (already auto-derived by
    expand_parameters when the YAML left them unset, common.cpp:268,
    327-333); the feature radius for the pyramid gate / fixed-scale surface
    follows the same FEATURE_NR_POINTS-disk derivation as the host pyramid
    (matching.h:177-208)."""
    import jax
    import jax.numpy as jnp

    from lidar_global_registration_tpu.models.flagship import (
        _aabb_pair,
        register_pair_staged,
    )
    from lidar_global_registration_tpu.types import FEATURE_NR_POINTS

    density_src = float(
        cloud_density(src) if density_src is None else density_src
    )
    density_tgt = float(
        cloud_density(tgt) if density_tgt is None else density_tgt
    )
    d = max(density_src, density_tgt)
    normal_cell = float(np.sqrt(params.normal_nr_points * d * d / np.pi))
    feature_radius = (
        float(params.feature_radius)
        if params.feature_radius is not None
        else float(np.sqrt(FEATURE_NR_POINTS * d * d / np.pi))
    )
    # the staged path sizes target buffers with the source capacity: pad
    # both sides to one shared capacity
    cap = max(src.capacity, tgt.capacity)

    def _pad(c: Cloud):
        if c.capacity == cap:
            return c.xyz, c.valid
        xyz = jnp.full((cap, 3), Cloud.PAD_COORD, jnp.float32)
        xyz = xyz.at[: c.capacity].set(c.xyz)
        valid = jnp.zeros((cap,), bool).at[: c.capacity].set(c.valid)
        return xyz, valid

    sx, sv = _pad(src)
    tx, tv = _pad(tgt)
    if params.fix_seed:
        key = jax.random.PRNGKey(params.seed)
    else:
        key = jax.random.PRNGKey(int(np.random.default_rng().integers(2**31)))
    kwargs = {}
    if params.vp_src is not None:
        kwargs["vp_src"] = jnp.asarray(np.asarray(params.vp_src, np.float32))
    if params.vp_tgt is not None:
        kwargs["vp_tgt"] = jnp.asarray(np.asarray(params.vp_tgt, np.float32))
    # one pulled AABB lets the feature-scale surfaces take the packed
    # single-key downsample (host bit sizing) — ~2x60 ms at 1M+ for one
    # ~30 ms pull
    pair_aabb = np.asarray(_aabb_pair(sx, sv, tx, tv))
    t0 = time.time()
    out = register_pair_staged(
        sx, sv, tx, tv, key,
        normal_cell, density_src, density_tgt,
        float(params.iss_radius_src), float(params.iss_radius_tgt),
        feature_radius, float(params.distance_thr),
        cfg=cfg,
        return_correspondences=True,
        aabb=pair_aabb,
        **kwargs,
    )
    T = np.asarray(out["transformation"])
    q_idx, m_idx, thr, valid = (np.asarray(x) for x in out["correspondences"])
    elapsed = time.time() - t0
    corrs = Correspondences(
        query=jnp.asarray(q_idx),
        match=jnp.asarray(m_idx),
        # descriptor distances are not exported by the staged path (the
        # correspondence stage consumes them on device); 0.0 placeholder in
        # the CSV cache's distance column
        distance=jnp.zeros((q_idx.shape[0],), jnp.float32),
        threshold=jnp.asarray(thr),
        valid=jnp.asarray(valid),
    )
    return AlignmentResult(
        src=src,
        tgt=tgt,
        transformation=T.astype(np.float32),
        correspondences=corrs,
        iterations=int(np.asarray(out["iterations"])),
        converged=bool(np.asarray(out["converged"])),
        time_te=elapsed,
        time_cs=0.0,  # the staged path fuses search+solve into one timed run
        metric=float(np.asarray(out["metric"])),
    )


def align_point_clouds(
    src: Cloud,
    tgt: Cloud,
    params: AlignmentParameters,
    save_artifacts: bool = True,
    correspondences: Optional[Correspondences] = None,
    density_src: Optional[float] = None,
    density_tgt: Optional[float] = None,
) -> AlignmentResult:
    """alignPointClouds (alignment.cpp:72-110).

    Routing: parameter sets inside the staged TPU envelope run
    flagship.register_pair_staged (the benched fast path); everything else
    (pre-loaded correspondences, one_sided/ratio matching, rops/usc
    descriptors, closest-plane metrics, guess-local search, file normals)
    takes the host-orchestrated pyramid — loudly.  LGR_STAGED_CLI=0 forces
    the host path."""
    from lidar_global_registration_tpu.models.pyramid import (
        feature_based_correspondence_search,
    )
    from lidar_global_registration_tpu.models.ransac import align_ransac
    from lidar_global_registration_tpu.models.gror import align_gror

    if correspondences is None and os.environ.get("LGR_STAGED_CLI", "1") != "0":
        cfg, reason = staged_envelope(params)
        if cfg is not None:
            result = _align_staged(src, tgt, params, cfg, density_src,
                                   density_tgt)
            if save_artifacts:
                _persist_alignment_artifacts(src, tgt, params, result)
            return result
        print(f"# staged TPU path unavailable ({reason}); "
              "host pyramid path used", flush=True)

    time_cs = 0.0
    if correspondences is None:
        t0 = time.time()
        correspondences = feature_based_correspondence_search(src, tgt, params)
        time_cs = time.time() - t0

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
        _persist_alignment_artifacts(src, tgt, params, result)
    return result


def _persist_alignment_artifacts(src, tgt, params, result):
    """The correspondence CSV cache (alignment.cpp:87) + transformations.csv
    append (main.cpp caches results keyed by constructName) — shared by the
    staged and host paths."""
    filepath = construct_path(params, "correspondences", "csv", True, False, False)
    iomod.save_correspondences_csv(
        filepath, np.asarray(src.xyz), np.asarray(tgt.xyz), result.correspondences
    )
    csv = os.path.join(DATA_DEBUG_PATH, TRANSFORMATIONS_CSV)
    os.makedirs(DATA_DEBUG_PATH, exist_ok=True)
    if params.ground_truth is not None:
        iomod.save_transformation(
            csv, construct_name(params, "transformation_gt"), params.ground_truth
        )
    iomod.save_transformation(
        csv, construct_name(params, "transformation"), result.transformation
    )


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
        result = align_point_clouds(
            src, tgt, params, save_artifacts,
            density_src=density_src, density_tgt=density_tgt,
        )
        analysis = AlignmentAnalysis(result, params).start(gt, testname, save_artifacts)
        analyses.append(analysis)
    return analyses
