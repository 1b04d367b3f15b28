"""CLI end-to-end regression: synthetic scan pair through the real command
surface (`alignment` + `metric`), asserting convergence and artifact files.
Mirrors the manual verification recipe in .claude/skills/verify/SKILL.md."""
import os

import numpy as np
import pytest

from lidar_global_registration_tpu.utils.io import (
    get_transformation_gt,
    save_transformation,
    write_ply,
)


def make_scan_pair(dirpath, n=8000, seed=7):
    rng = np.random.default_rng(seed)
    centers = rng.uniform([0, 0], [55, 40], size=(40, 2))
    widths = rng.uniform(1.0, 4.0, size=40)
    heights = rng.uniform(-3, 3, size=40)

    def terrain(x0, x1, m):
        xy = rng.uniform([x0, 0], [x1, 40], size=(m, 2))
        z = np.zeros(m)
        for c, w, h in zip(centers, widths, heights):
            z += h * np.exp(-np.sum((xy - c) ** 2, axis=1) / (2 * w * w))
        z += 0.02 * rng.normal(size=m)
        return np.column_stack([xy, z]).astype(np.float32)

    cloud_a = terrain(0, 40, n)
    cloud_b = terrain(15, 55, n)
    ang = 0.6
    R = np.array(
        [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]],
        np.float32,
    )
    t = np.array([5.0, -3.0, 1.0], np.float32)
    pose_a = np.eye(4, dtype=np.float32)
    pose_b = np.eye(4, dtype=np.float32)
    pose_b[:3, :3] = R
    pose_b[:3, 3] = t
    loc_b = (cloud_b - t) @ R
    write_ply(os.path.join(dirpath, "scanA.ply"), cloud_a)
    write_ply(os.path.join(dirpath, "scanB.ply"), loc_b.astype(np.float32))
    gt_csv = os.path.join(dirpath, "ground_truth.csv")
    save_transformation(gt_csv, "scanA.ply", pose_a)
    save_transformation(gt_csv, "scanB.ply", pose_b)
    # scanner viewpoints (consistent normal orientation across frames, like
    # the reference's viewpoints.csv)
    vp_a = np.array([27.5, 20.0, 150.0])
    vp_b = R.T @ (vp_a - t)
    with open(os.path.join(dirpath, "viewpoints.csv"), "w") as f:
        f.write("reading,x,y,z\n")
        f.write(f"scanA.ply,{vp_a[0]},{vp_a[1]},{vp_a[2]}\n")
        f.write(f"scanB.ply,{vp_b[0]},{vp_b[1]},{vp_b[2]}\n")
    return gt_csv


@pytest.mark.slow
def test_cli_alignment_and_metric(tmp_path, monkeypatch):
    from lidar_global_registration_tpu.cli import main

    make_scan_pair(str(tmp_path))
    cfg = tmp_path / "config.yaml"
    cfg.write_text(
        "source: scanA.ply\n"
        "target: scanB.ply\n"
        "ground_truth: ground_truth.csv\n"
        "viewpoints: viewpoints.csv\n"
        "descriptor: fpfh\n"
        "keypoint: any\n"
        "matching: cluster\n"
        "metric: correspondences\n"
        "iteration: 50000\n"
    )
    monkeypatch.chdir(tmp_path)
    main(["alignment", "config.yaml"])

    results = tmp_path / "data" / "debug" / "test_results.csv"
    assert results.exists()
    lines = results.read_text().strip().splitlines()
    assert len(lines) == 2  # header + one run
    row = dict(zip(lines[0].split(","), lines[1].split(",")))
    assert row["converged"] == "1"
    assert float(row["r_err"]) < np.deg2rad(3.0)
    assert float(row["t_err"]) < 1.0

    # transformation + correspondence caches feed the `metric` command
    assert (tmp_path / "data" / "debug" / "transformations.csv").exists()
    main(["metric", "config.yaml"])
    metrics = tmp_path / "data" / "debug" / "test_metrics.csv"
    assert metrics.exists()
    gt = get_transformation_gt("ground_truth.csv", "scanA.ply", "scanB.ply")
    assert gt is not None


@pytest.mark.slow
def test_cli_debug_keypoint_compare_measure(tmp_path, monkeypatch):
    """Exercise the remaining command surface: debug artifacts from caches,
    keypoint analysis, hypothesis comparison, and the measure harness."""
    from lidar_global_registration_tpu.cli import main

    make_scan_pair(str(tmp_path), n=5000)
    base = (
        "source: scanA.ply\n"
        "target: scanB.ply\n"
        "ground_truth: ground_truth.csv\n"
        "viewpoints: viewpoints.csv\n"
        "descriptor: fpfh\n"
        "keypoint: any\n"
        "matching: cluster\n"
        "metric: correspondences\n"
        "iteration: 30000\n"
    )
    (tmp_path / "config.yaml").write_text(base)
    monkeypatch.chdir(tmp_path)
    main(["alignment", "config.yaml"])  # populate caches

    main(["debug", "config.yaml"])
    debug_dir = tmp_path / "data" / "debug" / "scanA_scanB"
    plys = list(debug_dir.glob("*.ply"))
    assert any("downsampled_src" in p.name for p in plys)
    assert any("temperature_dists" in p.name for p in plys)

    (tmp_path / "multi.yaml").write_text(
        "tests:\n"
        + "    - keypoint:\n"
        + "".join(f"        {line}\n" for line in base.strip().splitlines())
        + "    - compare:\n"
        + "".join(f"        {line}\n" for line in base.strip().splitlines())
        + "    - measure:\n"
        + "".join(f"        {line}\n" for line in base.strip().splitlines())
        + "        n_times: 2\n"
    )
    main(["alignment", "multi.yaml"])
    meas = tmp_path / "data" / "debug" / "test_measurements.csv"
    assert meas.exists()
    lines = meas.read_text().strip().splitlines()
    assert len(lines) == 2
    row = lines[1].split(",")
    assert float(row[1]) > 0.49  # success_rate with 2 reseeded runs


@pytest.mark.slow
def test_cli_gror_alignment(tmp_path, monkeypatch):
    from lidar_global_registration_tpu.cli import main

    make_scan_pair(str(tmp_path), n=5000)
    (tmp_path / "config.yaml").write_text(
        "source: scanA.ply\n"
        "target: scanB.ply\n"
        "ground_truth: ground_truth.csv\n"
        "viewpoints: viewpoints.csv\n"
        "descriptor: fpfh\n"
        "keypoint: any\n"
        "matching: cluster\n"
        "alignment: gror\n"
        "distance_thr: 1.0\n"  # GROR resolution; the auto value (4x density
                                # ~ 5.4) makes the 2x-resolution consistency
                                # band swamp this 40-unit scene
    )
    monkeypatch.chdir(tmp_path)
    main(["alignment", "config.yaml"])
    results = tmp_path / "data" / "debug" / "test_results.csv"
    lines = results.read_text().strip().splitlines()
    row = dict(zip(lines[0].split(","), lines[1].split(",")))
    assert row["alignment_type"] == "gror"
    assert float(row["r_err"]) < np.deg2rad(3.0)
    assert float(row["t_err"]) < 1.0
