"""Config Cartesian expansion (common.cpp:210-415) + artifact naming
(common.cpp:1168-1221) behavior."""
import numpy as np

from lidar_global_registration_tpu.utils.config import Config, expand_parameters
from lidar_global_registration_tpu.utils.naming import construct_name


def test_cartesian_expansion_counts():
    cfg = Config(
        {
            "descriptor": ["fpfh", "shot"],
            "metric": ["correspondences", "uniformity", "combination"],
            "lrf": "gravity",
            "scale": [1.5, 2.0],
        }
    )
    ps = expand_parameters(cfg, 0.1, 0.2, False)
    assert len(ps) == 2 * 3 * 2
    assert {p.descriptor_id for p in ps} == {"fpfh", "shot"}
    assert all(p.lrf_id == "gravity" for p in ps)


def test_auto_derivations():
    cfg = Config({})
    (p,) = expand_parameters(cfg, 0.1, 0.25, True)
    # distance_thr = 4 * max(density) (common.cpp:268)
    assert abs(p.distance_thr - 1.0) < 1e-6
    # iss_radius = 2 * density per side (common.cpp:327-333)
    assert abs(p.iss_radius_src - 0.2) < 1e-6
    assert abs(p.iss_radius_tgt - 0.5) < 1e-6
    assert p.normals_available is True
    assert p.feature_radius is None  # multi-scale by default


def test_explicit_overrides():
    cfg = Config(
        {"distance_thr": 0.7, "iss_radius": 0.3, "feature_radius": 0.5, "bf": False}
    )
    (p,) = expand_parameters(cfg, 0.1, 0.2, False)
    assert p.distance_thr == 0.7
    assert p.iss_radius_src == p.iss_radius_tgt == 0.3
    assert p.feature_radius == 0.5
    assert p.use_bfmatcher is False


def test_construct_name_format():
    cfg = Config({})
    (p,) = expand_parameters(cfg, 0.1, 0.1, False)
    p = p.replace(testname="bun000_bun045")
    name = construct_name(p, "transformation")
    parts = name.split("_")
    assert parts[0] == "bun000" and parts[1] == "bun045"
    assert "shot" in parts  # default descriptor
    assert "bf" in parts
    assert name.endswith("_15")  # VERSION
    # metric/weights toggles
    n2 = construct_name(p, "correspondences", True, False, False)
    assert "ransac" not in n2.split("_")
    # weight id appears only for weighted_closest_plane + non-constant weight
    p3 = p.replace(metric_id="weighted_closest_plane", weight_id="harris")
    assert "harris" in construct_name(p3, "x").split("_")
    p4 = p.replace(metric_id="uniformity", weight_id="harris")
    assert "harris" not in construct_name(p4, "x").split("_")


def test_multi_test_dispatch():
    cfg = Config(
        {
            "tests": [
                {"test": {"source": "a.ply", "target": "b.ply"}},
                {"measure": {"source": "c.ply", "target": "d.ply", "n_times": 3}},
            ]
        }
    )
    tests = cfg.tests()
    assert [t for t, _ in tests] == ["test", "measure"]
    assert tests[1][1].get("n_times") == 3
