"""Sequential benchmark sweep driver (one TPU process at a time).

Runs bench.py across the round's measurement grid — 64k/256k/1M any+ISS
modes, 4M/10M ISS, SHOT rows — each as its own subprocess so a crash or
tunnel drop loses only that row.  Appends one JSON line per row to
BENCH_SWEEP.jsonl plus the raw stderr transcript to BENCH_SWEEP.log.

Usage:  PYTHONPATH=/root/repo:$PYTHONPATH python tools/bench_sweep.py [row ...]
Rows default to the full grid; pass names (e.g. `iss1m 4m`) to subset.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
AXON_SITE = "/root/.axon_site"


def _row_env(over):
    """Build the row subprocess env, APPENDING to PYTHONPATH, never
    overwriting: the axon TPU plugin registers via sitecustomize.py in
    /root/.axon_site at interpreter start, and an env that drops that dir
    fails with "Backend 'axon' is not in the list of known backends"
    (the round-3 close-out lost its last three rows to this)."""
    env = dict(os.environ)
    env.update(over)
    parts = [p for p in env.get("PYTHONPATH", "").split(os.pathsep) if p]
    for need in (ROOT, AXON_SITE):
        if os.path.isdir(need) and need not in parts:
            parts.append(need)
    env["PYTHONPATH"] = os.pathsep.join(parts)
    return env

ROWS = {
    # name: (env overrides, timeout seconds)
    "any64k": ({"LGR_BENCH_N": "65536", "LGR_BENCH_REPEATS": "5"}, 3600),
    "any256k": ({"LGR_BENCH_N": "262144", "LGR_BENCH_REPEATS": "3"}, 3600),
    "iss256k": ({"LGR_BENCH_N": "262144", "LGR_BENCH_REPEATS": "3",
                 "LGR_BENCH_ISS": "1"}, 3600),
    "iss1m": ({"LGR_BENCH_N": "1048576", "LGR_BENCH_REPEATS": "3",
               "LGR_BENCH_ISS": "1"}, 5400),
    "iss4m": ({"LGR_BENCH_N": "4194304", "LGR_BENCH_REPEATS": "3",
               "LGR_BENCH_ISS": "1"}, 7200),
    "iss10m": ({"LGR_BENCH_N": "10485760", "LGR_BENCH_REPEATS": "2",
                "LGR_BENCH_ISS": "1"}, 18000),
    "shot256k": ({"LGR_BENCH_N": "262144", "LGR_BENCH_REPEATS": "3",
                  "LGR_BENCH_ISS": "1", "LGR_BENCH_DESC": "shot"}, 5400),
    "shot1m": ({"LGR_BENCH_N": "1048576", "LGR_BENCH_REPEATS": "3",
                "LGR_BENCH_ISS": "1", "LGR_BENCH_DESC": "shot"}, 7200),
    "shot4m": ({"LGR_BENCH_N": "4194304", "LGR_BENCH_REPEATS": "3",
                "LGR_BENCH_ISS": "1", "LGR_BENCH_DESC": "shot"}, 7200),
    "shot10m": ({"LGR_BENCH_N": "10485760", "LGR_BENCH_REPEATS": "2",
                 "LGR_BENCH_ISS": "1", "LGR_BENCH_DESC": "shot"}, 18000),
    "gror256k": ({"LGR_BENCH_N": "262144", "LGR_BENCH_REPEATS": "3",
                  "LGR_BENCH_ISS": "1", "LGR_BENCH_ALIGN": "gror"}, 5400),
    "gror1m": ({"LGR_BENCH_N": "1048576", "LGR_BENCH_REPEATS": "3",
                "LGR_BENCH_ISS": "1", "LGR_BENCH_ALIGN": "gror"}, 5400),
    "gror4m": ({"LGR_BENCH_N": "4194304", "LGR_BENCH_REPEATS": "3",
                "LGR_BENCH_ISS": "1", "LGR_BENCH_ALIGN": "gror"}, 7200),
    "gror10m": ({"LGR_BENCH_N": "10485760", "LGR_BENCH_REPEATS": "2",
                 "LGR_BENCH_ISS": "1", "LGR_BENCH_ALIGN": "gror"}, 18000),
    # multi-scale pyramid regime (matching.h:163-354): graded-density scene
    # so per-keypoint radii span several octaves; pyramid + SHOT + cluster
    # is the reference-default AUTO configuration
    "pyr1m": ({"LGR_BENCH_N": "1048576", "LGR_BENCH_REPEATS": "3",
               "LGR_BENCH_ISS": "1", "LGR_BENCH_DESC": "shot",
               "LGR_BENCH_PYRAMID": "1", "LGR_BENCH_GRADED": "1"}, 7200),
    "pyr1m_fpfh": ({"LGR_BENCH_N": "1048576", "LGR_BENCH_REPEATS": "3",
                    "LGR_BENCH_ISS": "1", "LGR_BENCH_PYRAMID": "1",
                    "LGR_BENCH_GRADED": "1"}, 7200),
    # reference-default AUTO regime above 1M (VERDICT r4 missing #4) and
    # the GROR 10M row (BASELINE config #3 at full scale, r4 weak #5)
    "pyr4m": ({"LGR_BENCH_N": "4194304", "LGR_BENCH_REPEATS": "3",
               "LGR_BENCH_ISS": "1", "LGR_BENCH_DESC": "shot",
               "LGR_BENCH_PYRAMID": "1", "LGR_BENCH_GRADED": "1"}, 10800),
    "pyr10m": ({"LGR_BENCH_N": "10485760", "LGR_BENCH_REPEATS": "2",
                "LGR_BENCH_ISS": "1", "LGR_BENCH_DESC": "shot",
                "LGR_BENCH_PYRAMID": "1", "LGR_BENCH_GRADED": "1"}, 18000),
    "pyr4m_fpfh": ({"LGR_BENCH_N": "4194304", "LGR_BENCH_REPEATS": "3",
                    "LGR_BENCH_ISS": "1", "LGR_BENCH_PYRAMID": "1",
                    "LGR_BENCH_GRADED": "1"}, 10800),
    # per-stage budgets (LGR_STAGE_TIMING blocks between stages: the stage
    # columns over-count vs e2e; never quote them as end-to-end)
    "prof1m": ({"LGR_BENCH_N": "1048576", "LGR_BENCH_REPEATS": "1",
                "LGR_BENCH_ISS": "1", "LGR_STAGE_TIMING": "1"}, 5400),
    "prof10m": ({"LGR_BENCH_N": "10485760", "LGR_BENCH_REPEATS": "1",
                 "LGR_BENCH_ISS": "1", "LGR_STAGE_TIMING": "1"}, 10800),
}
DEFAULT = ["any64k", "iss256k", "iss1m", "iss4m", "iss10m", "shot256k",
           "shot1m", "any256k"]


def main(names):
    out_jsonl = os.path.join(ROOT, "BENCH_SWEEP.jsonl")
    out_log = os.path.join(ROOT, "BENCH_SWEEP.log")
    for name in names:
        env_over, tmo = ROWS[name]
        env = _row_env(env_over)
        t0 = time.time()
        print(f"== {name} start {time.strftime('%H:%M:%S')}", flush=True)
        for attempt in range(2):
            try:
                p = subprocess.run(
                    [sys.executable, os.path.join(ROOT, "bench.py")],
                    env=env, capture_output=True, text=True, timeout=tmo,
                )
                rc, out, err = p.returncode, p.stdout, p.stderr
            except subprocess.TimeoutExpired as e:
                rc, out = -9, ""
                err = (e.stderr or "") + f"\n== TIMEOUT {tmo}s"
            # environment-loss rows (backend deregistered) are retried once
            # rather than recorded as if the workload itself failed
            if rc != 0 and "not in the list of known backends" in err:
                print(f"== {name} lost the TPU backend (env); retrying",
                      flush=True)
                continue
            break
        dt = time.time() - t0
        with open(out_log, "a") as f:
            f.write(f"\n==== {name} rc={rc} wall={dt:.0f}s ====\n{err}\n{out}\n")
        row = {"row": name, "rc": rc, "wall_s": round(dt, 1)}
        for line in out.splitlines():
            line = line.strip()
            if line.startswith("{"):
                try:
                    row["result"] = json.loads(line)
                except Exception:
                    pass
        with open(out_jsonl, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(f"== {name} done rc={rc} {dt:.0f}s: {row.get('result')}",
              flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or DEFAULT)
