"""Offline tooling: LAS reader/converter and ETH CSV cloud converter
(reference: process_datasets.py las/eth commands)."""
import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from lidar_global_registration_tpu.utils import io as iomod


def _write_las(path, xyz, scale=(0.001, 0.001, 0.001), offset=(10.0, -5.0, 2.0),
               version=(1, 2), point_format=1, record_len=28):
    """Craft a minimal valid LAS file: public header + raw point records."""
    n = len(xyz)
    header_size = 227 if version < (1, 4) else 375
    header = bytearray(header_size)
    header[0:4] = b"LASF"
    header[24] = version[0]
    header[25] = version[1]
    struct.pack_into("<H", header, 94, header_size)
    struct.pack_into("<I", header, 96, header_size)  # point data offset
    header[104] = point_format
    struct.pack_into("<H", header, 105, record_len)
    if version < (1, 4):
        struct.pack_into("<I", header, 107, n)
    else:
        struct.pack_into("<Q", header, 247, n)
    struct.pack_into("<3d", header, 131, *scale)
    struct.pack_into("<3d", header, 155, *offset)

    raw_xyz = np.round((xyz - np.asarray(offset)) / np.asarray(scale)).astype("<i4")
    records = np.zeros((n, record_len), np.uint8)
    records[:, :12] = raw_xyz.view(np.uint8).reshape(n, 12)
    intens = (np.arange(n) % 7).astype("<u2")
    records[:, 12:14] = intens.view(np.uint8).reshape(n, 2)
    with open(path, "wb") as f:
        f.write(bytes(header))
        f.write(records.tobytes())


def test_las_roundtrip(tmp_path, rng):
    from datasets import read_las

    xyz = rng.uniform(-50, 80, size=(257, 3))
    for version in [(1, 2), (1, 4)]:
        p = str(tmp_path / f"scan_{version[1]}.las")
        _write_las(p, xyz, version=version)
        got, intens = read_las(p)
        np.testing.assert_allclose(got, xyz, atol=1e-3)
        np.testing.assert_array_equal(intens, np.arange(257) % 7)


def test_las_command_writes_ply(tmp_path, rng):
    import argparse

    from datasets import cmd_las

    xyz = rng.uniform(0, 10, size=(64, 3))
    _write_las(str(tmp_path / "a.las"), xyz)
    cmd_las(argparse.Namespace(las_path=str(tmp_path)))
    fields, _names = iomod.read_ply(str(tmp_path / "a.ply"))
    got = np.stack([fields["x"], fields["y"], fields["z"]], axis=1)
    np.testing.assert_allclose(got, xyz, atol=1e-2)


def test_eth_converter(tmp_path, rng):
    import argparse

    from datasets import cmd_eth

    src_dir = tmp_path / "raw"
    src_dir.mkdir()
    gt = ["reading," + ",".join(f"gT{i}{j}" for i in range(4) for j in range(4))]
    for k in range(2):
        pts = rng.uniform(-1, 1, size=(50, 3))
        with open(src_dir / f"cloud{k}.csv", "w") as f:
            f.write("x,y,z\n")
            for p in pts:
                f.write(f"{p[0]},{p[1]},{p[2]}\n")
        gt.append(f"cloud{k}.csv," + ",".join(map(str, np.eye(4).reshape(-1))))
    with open(src_dir / "ground_truth.csv", "w") as f:
        f.write("\n".join(gt) + "\n")
    out_dir = str(tmp_path / "out")
    cmd_eth(argparse.Namespace(input_dir=str(src_dir), output_dir=out_dir))
    assert os.path.exists(os.path.join(out_dir, "cloud0.ply"))
    assert os.path.exists(os.path.join(out_dir, "cloud1.ply"))
    with open(os.path.join(out_dir, "ground_truth.csv")) as f:
        lines = f.read().splitlines()
    assert lines[1].startswith("cloud0.ply,")
