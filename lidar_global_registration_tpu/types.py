"""Core data model: padded-array point clouds, correspondences, parameters.

Reference equivalents (see /root/reference):
  - Cloud            <-> pcl::PointCloud<PointN> (include/common.h:62-76); the
                         per-point weight lives in `weight` (reference stores it
                         in the PCL `intensity` field, src/common.cpp:444-451).
  - Correspondences  <-> Correspondences vector with per-pair adaptive
                         `threshold` (include/common.h:120-131).
  - AlignmentParameters <-> include/common.h:135-163 (defaults common.h:38-60).
  - AlignmentResult  <-> include/common.h:165-174.

TPU-first design: a cloud is a struct-of-arrays pytree with a *static* padded
size and an explicit `valid` mask.  All ops are masked; nothing ever depends on
the dynamic number of valid points inside a jitted function.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# String ids (reference: src/common.cpp:29-59)
# ---------------------------------------------------------------------------
ALIGNMENT_RANSAC = "ransac"
ALIGNMENT_GROR = "gror"
ALIGNMENT_TEASER = "teaser"
KEYPOINT_ANY = "any"
KEYPOINT_ISS = "iss"
DESCRIPTOR_FPFH = "fpfh"
DESCRIPTOR_SHOT = "shot"
DESCRIPTOR_ROPS = "rops"
DESCRIPTOR_USC = "usc"
DEFAULT_LRF = "default"
LRF_GRAVITY = "gravity"
LRF_GT = "gt"
METRIC_CORRESPONDENCES = "correspondences"
METRIC_UNIFORMITY = "uniformity"
METRIC_CLOSEST_PLANE = "closest_plane"
METRIC_WEIGHTED_CLOSEST_PLANE = "weighted_closest_plane"
METRIC_COMBINATION = "combination"
MATCHING_LEFT_TO_RIGHT = "lr"
MATCHING_RATIO = "ratio"
MATCHING_CLUSTER = "cluster"
MATCHING_ONE_SIDED = "one_sided"
METRIC_WEIGHT_CONSTANT = "constant"
METRIC_WEIGHT_EXP_CURVATURE = "exp_curvature"
METRIC_WEIGHT_CURVEDNESS = "curvedness"
METRIC_WEIGHT_HARRIS = "harris"
METRIC_WEIGHT_TOMASI = "tomasi"
METRIC_WEIGHT_CURVATURE = "curvature"
METRIC_WEIGHT_NSS = "nss"
METRIC_SCORE_CONSTANT = "constant"
METRIC_SCORE_MAE = "mae"
METRIC_SCORE_MSE = "mse"
METRIC_SCORE_EXP = "exp"

# Defaults (reference: include/common.h:38-60)
ALIGNMENT_EDGE_THR = 0.95
ALIGNMENT_CONFIDENCE = 0.999
ALIGNMENT_USE_BFMATCHER = True
ALIGNMENT_RANDOMNESS = 1
ALIGNMENT_N_SAMPLES = 3
ALIGNMENT_BLOCK_SIZE = 10000
FEATURES_SCALE_FACTOR = 2.0
FEATURES_REESTIMATE_FRAMES = True
MATCHING_CLUSTER_THRESHOLD = 0.95
MATCHING_CLUSTER_K = 40
MATCHING_RATIO_K = 2
MATCHING_RATIO_THRESHOLD = 1.1  # common.h:49
SPARSE_POINTS_FRACTION = 0.01
FEATURE_NR_POINTS = 352
NORMAL_NR_POINTS = 30
FINE_VOXEL_SIZE_COEFFICIENT = 2.0
DIST_TO_PLANE_COEFFICIENT = 2.0

DESCRIPTOR_DIMS = {
    DESCRIPTOR_FPFH: 33,
    DESCRIPTOR_SHOT: 352,
    DESCRIPTOR_ROPS: 135,
    DESCRIPTOR_USC: 1960,
}


def round_up(n: int, m: int = 128) -> int:
    """Round ``n`` up to a multiple of ``m`` (TPU lane alignment)."""
    return max(m, ((int(n) + m - 1) // m) * m)


# ---------------------------------------------------------------------------
# Cloud
# ---------------------------------------------------------------------------
@jax.tree_util.register_dataclass
@dataclass
class Cloud:
    """Padded struct-of-arrays point cloud.

    xyz:      f32[N, 3]    positions (padding rows hold a far-away sentinel)
    normal:   f32[N, 3]    unit normals (NaN/zero where unknown)
    weight:   f32[N]       accumulated downsample weight (ref `intensity`)
    curvature:f32[N]       surface-variation curvature from normal PCA
    valid:    bool[N]      mask of real points
    """

    xyz: jax.Array
    normal: jax.Array
    weight: jax.Array
    curvature: jax.Array
    valid: jax.Array

    # Large coordinate sentinel used for padding so padded points never enter
    # any radius neighborhood.  Kept finite to avoid NaN propagation.
    PAD_COORD = 1.0e18

    @property
    def capacity(self) -> int:
        return int(self.xyz.shape[0])

    def count(self) -> jax.Array:
        return jnp.sum(self.valid.astype(jnp.int32))

    @staticmethod
    def from_numpy(
        xyz: np.ndarray,
        normal: Optional[np.ndarray] = None,
        weight: Optional[np.ndarray] = None,
        capacity: Optional[int] = None,
        pad_multiple: int = 128,
    ) -> "Cloud":
        xyz = np.asarray(xyz, np.float32)
        n = xyz.shape[0]
        cap = capacity if capacity is not None else round_up(n, pad_multiple)
        assert cap >= n, (cap, n)
        pxyz = np.full((cap, 3), Cloud.PAD_COORD, np.float32)
        pxyz[:n] = xyz
        pnormal = np.zeros((cap, 3), np.float32)
        if normal is not None:
            pnormal[:n] = np.asarray(normal, np.float32)
        pweight = np.zeros((cap,), np.float32)
        pweight[:n] = 1.0 if weight is None else np.asarray(weight, np.float32)
        pcurv = np.zeros((cap,), np.float32)
        pvalid = np.zeros((cap,), bool)
        pvalid[:n] = True
        return Cloud(
            xyz=jnp.asarray(pxyz),
            normal=jnp.asarray(pnormal),
            weight=jnp.asarray(pweight),
            curvature=jnp.asarray(pcurv),
            valid=jnp.asarray(pvalid),
        )

    def compact(self, capacity: Optional[int] = None, pad_multiple: int = 128) -> "Cloud":
        """Host-side compaction: drop padding rows, re-pad to a fresh capacity.

        Pulls to host; only call between jitted stages (pyramid levels are
        orchestrated on host anyway, mirroring matching.h:229-261).
        """
        valid = np.asarray(self.valid)
        idx = np.nonzero(valid)[0]
        xyz = np.asarray(self.xyz)[idx]
        normal = np.asarray(self.normal)[idx]
        weight = np.asarray(self.weight)[idx]
        curvature = np.asarray(self.curvature)[idx]
        cloud = Cloud.from_numpy(xyz, normal, weight, capacity, pad_multiple)
        pcurv = np.zeros((cloud.capacity,), np.float32)
        pcurv[: len(idx)] = curvature
        return dataclasses.replace(cloud, curvature=jnp.asarray(pcurv))

    def transformed(self, T: jax.Array) -> "Cloud":
        """Apply a rigid 4x4 transform to positions and normals (masked)."""
        R, t = T[:3, :3], T[:3, 3]
        xyz = jnp.where(self.valid[:, None], self.xyz @ R.T + t, self.xyz)
        normal = self.normal @ R.T
        return dataclasses.replace(self, xyz=xyz, normal=normal)


# ---------------------------------------------------------------------------
# Correspondences
# ---------------------------------------------------------------------------
@jax.tree_util.register_dataclass
@dataclass
class Correspondences:
    """Padded correspondence set with per-pair adaptive inlier threshold.

    Reference: include/common.h:120-131 - each surviving correspondence keeps
    `threshold = min(max(density_src_i, density_tgt_j), distance_thr)`
    (matching.h:404-407) and every inlier test downstream is per-pair.
    """

    query: jax.Array  # i32[M] index into src cloud
    match: jax.Array  # i32[M] index into tgt cloud
    distance: jax.Array  # f32[M] descriptor distance
    threshold: jax.Array  # f32[M] adaptive inlier threshold
    valid: jax.Array  # bool[M]

    @property
    def capacity(self) -> int:
        return int(self.query.shape[0])

    def count(self) -> jax.Array:
        return jnp.sum(self.valid.astype(jnp.int32))

    @staticmethod
    def empty(capacity: int) -> "Correspondences":
        return Correspondences(
            query=jnp.zeros((capacity,), jnp.int32),
            match=jnp.zeros((capacity,), jnp.int32),
            distance=jnp.zeros((capacity,), jnp.float32),
            threshold=jnp.full((capacity,), 1.0, jnp.float32),
            valid=jnp.zeros((capacity,), bool),
        )

    def to_numpy(self) -> dict:
        m = np.asarray(self.valid)
        return {
            "query": np.asarray(self.query)[m],
            "match": np.asarray(self.match)[m],
            "distance": np.asarray(self.distance)[m],
            "threshold": np.asarray(self.threshold)[m],
        }

    def compact(self, capacity: Optional[int] = None, pad_multiple: int = 128) -> "Correspondences":
        d = self.to_numpy()
        n = len(d["query"])
        cap = capacity if capacity is not None else round_up(max(n, 1), pad_multiple)
        out = Correspondences.empty(cap)
        q = np.zeros((cap,), np.int32)
        mt = np.zeros((cap,), np.int32)
        ds = np.zeros((cap,), np.float32)
        th = np.full((cap,), 1.0, np.float32)
        vl = np.zeros((cap,), bool)
        q[:n], mt[:n], ds[:n], th[:n], vl[:n] = (
            d["query"],
            d["match"],
            d["distance"],
            d["threshold"],
            True,
        )
        return Correspondences(
            query=jnp.asarray(q),
            match=jnp.asarray(mt),
            distance=jnp.asarray(ds),
            threshold=jnp.asarray(th),
            valid=jnp.asarray(vl),
        )


# ---------------------------------------------------------------------------
# Parameters / result records (host-side, static)
# ---------------------------------------------------------------------------
@dataclass
class AlignmentParameters:
    """The single parameter record threaded through every layer.

    Field-for-field behavioral match of include/common.h:135-163; numeric
    defaults from common.h:38-60.  These are *static* (hashable) so a set of
    parameters keys one jit specialization.
    """

    reestimate_frames: bool = FEATURES_REESTIMATE_FRAMES
    feature_nr_points: int = FEATURE_NR_POINTS
    normal_nr_points: int = NORMAL_NR_POINTS
    edge_thr_coef: float = ALIGNMENT_EDGE_THR
    distance_thr: float = 0.0
    iss_radius_src: float = 0.0
    iss_radius_tgt: float = 0.0
    feature_radius: Optional[float] = None  # None => multi-scale pyramid
    scale_factor: float = FEATURES_SCALE_FACTOR
    confidence: float = ALIGNMENT_CONFIDENCE
    use_bfmatcher: bool = ALIGNMENT_USE_BFMATCHER
    bf_block_size: int = ALIGNMENT_BLOCK_SIZE
    ratio_k: int = MATCHING_RATIO_K
    cluster_k: int = MATCHING_CLUSTER_K
    randomness: int = ALIGNMENT_RANDOMNESS
    n_samples: int = ALIGNMENT_N_SAMPLES
    alignment_id: str = ALIGNMENT_RANSAC
    descriptor_id: str = DESCRIPTOR_SHOT
    keypoint_id: str = KEYPOINT_ISS
    metric_id: str = METRIC_COMBINATION
    matching_id: str = MATCHING_CLUSTER
    lrf_id: str = DEFAULT_LRF
    weight_id: str = METRIC_WEIGHT_CONSTANT
    score_id: str = METRIC_SCORE_MSE
    max_iterations: int = 2**31 - 1
    save_features: bool = False
    testname: str = ""
    ground_truth: Optional[np.ndarray] = None  # 4x4
    # runtime-only fields (common.h:156-162)
    fix_seed: bool = True
    normals_available: bool = False
    match_search_radius: float = 0.0
    guess: Optional[np.ndarray] = None  # 4x4
    dir_path: str = "data/debug"
    vp_src: Optional[np.ndarray] = None  # 3
    vp_tgt: Optional[np.ndarray] = None  # 3
    # TPU-framework knobs (no reference counterpart)
    hypothesis_batch: int = 512
    seed: int = 566
    bf16_matching: bool = False

    def replace(self, **kw) -> "AlignmentParameters":
        return dataclasses.replace(self, **kw)


@dataclass
class AlignmentResult:
    """Reference: include/common.h:165-174."""

    src: Cloud
    tgt: Cloud
    transformation: np.ndarray  # 4x4 float32
    correspondences: Correspondences
    iterations: int
    converged: bool
    time_te: float = 0.0  # transformation estimation time
    time_cs: float = 0.0  # correspondence search time
    metric: float = 0.0


_UNSET = object()
field  # silence lint about unused import kept for dataclass ergonomics
