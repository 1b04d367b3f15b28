"""Generate `tests:` sweep configs from a difficulty-level table.

Reference: config_generation.py — reads data/test_levels.csv
(source,target,testname,helpful,level,gror_iss_coef,feature_radius,
selected,with_vp) and emits one `- test:` node per pair at/above the
requested difficulty, pointing at whichever dataset directory contains the
source scan.

Usage: python tools/config_generation.py out.yaml [--selected] [-l LEVEL]
       [--levels data/test_levels.csv] [--dirs data/kizhi data/...]
"""
from __future__ import annotations

import argparse
import csv
import os

DEFAULT_DIRS = [
    "data/kizhi", "data/office", "data/arch", "data/trees",
    "data/1-SubwayStation", "data/2-HighSpeedRailway", "data/3-Mountain",
    "data/5-Park", "data/6-Campus", "data/7-Residence", "data/8-RiverBank",
    "data/9-HeritageBuilding", "data/10-UndergroundExcavation", "data/11-Tunnel",
]

PARAMETERS = """\
        iteration: 1000000
        metric: uniformity
        lrf: gravity
        bf: true
        matching: cluster
        alignment: ransac
        block_size: 200000
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config_path")
    ap.add_argument("--selected", action="store_true")
    ap.add_argument("-l", "--level", type=int, default=2)
    ap.add_argument("--levels", default="data/test_levels.csv")
    ap.add_argument("--dirs", nargs="*", default=DEFAULT_DIRS)
    args = ap.parse_args()

    with open(args.levels) as f:
        rows = list(csv.DictReader(f))
    with open(args.config_path, "a") as out:
        out.write("tests:\n")
        n = 0
        for row in rows:
            if int(float(row["level"] or 0)) < args.level:
                continue
            if args.selected and not int(float(row.get("selected") or 0)):
                continue
            f1, f2 = row["source"], row["target"]
            for d in args.dirs:
                if os.path.exists(os.path.join(d, f1)):
                    out.write("    - test:\n")
                    out.write(PARAMETERS)
                    out.write(f"        ground_truth: {os.path.join(d, 'ground_truth.csv')}\n")
                    out.write(f"        source: {os.path.join(d, f1)}\n")
                    out.write(f"        target: {os.path.join(d, f2)}\n")
                    if int(float(row.get("with_vp") or 0)) == 1:
                        out.write(f"        viewpoints: {os.path.join(d, 'viewpoints.csv')}\n")
                    n += 1
                    break
        print(f"emitted {n} tests")


if __name__ == "__main__":
    main()
