"""Results exploration (reference: notebook.ipynb cells 3-11).

Aggregates data/debug/test_results.csv: per-parameter comparisons
(descriptor / metric / lrf / matching), success summaries, and optional
rotation-translation error scatter plots.

Usage: python tools/results_analysis.py [results.csv] [--plots out_dir]
"""
from __future__ import annotations

import argparse
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("results", nargs="?", default="data/debug/test_results.csv")
    ap.add_argument("--plots", default=None)
    ap.add_argument(
        "--success-thr",
        type=float,
        default=None,
        help="overlap_rmse success threshold (default: per-row distance_thr)",
    )
    args = ap.parse_args()

    import pandas as pd

    df = pd.read_csv(args.results)
    df["r_err_deg"] = df["r_err"] * 180.0 / 3.141592653589793
    thr = args.success_thr if args.success_thr is not None else df["distance_thr"]
    df["success"] = (df["converged"] == 1) & (df["overlap_rmse"] < thr)

    print(f"{len(df)} runs, {df['testname'].nunique()} test pairs")
    print(f"overall success rate: {df['success'].mean():.3f}\n")

    for key in ("descriptor", "metric_type", "lrf_type", "matching_type",
                "alignment_type", "keypoint_type"):
        if df[key].nunique() > 1:
            g = df.groupby(key).agg(
                runs=("success", "size"),
                success=("success", "mean"),
                r_err_deg=("r_err_deg", "median"),
                t_err=("t_err", "median"),
                overlap_rmse=("overlap_rmse", "median"),
                time=("time_te", "median"),
            )
            print(f"--- by {key} ---")
            print(g.to_string(float_format=lambda v: f"{v:.4f}"))
            print()

    worst = df.nlargest(min(10, len(df)), "overlap_rmse")[
        ["testname", "descriptor", "metric_type", "r_err_deg", "t_err", "overlap_rmse"]
    ]
    print("--- worst pairs by overlap_rmse ---")
    print(worst.to_string(index=False, float_format=lambda v: f"{v:.4f}"))

    if args.plots:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        os.makedirs(args.plots, exist_ok=True)
        fig, ax = plt.subplots(figsize=(5, 4))
        ok = df["success"]
        ax.scatter(df.loc[ok, "r_err_deg"], df.loc[ok, "t_err"], s=8, label="success")
        ax.scatter(df.loc[~ok, "r_err_deg"], df.loc[~ok, "t_err"], s=8, label="failure")
        ax.set_xlabel("rotation error (deg)")
        ax.set_ylabel("translation error")
        ax.set_xscale("symlog", linthresh=0.1)
        ax.set_yscale("symlog", linthresh=0.01)
        ax.legend()
        fig.savefig(os.path.join(args.plots, "errors.png"), bbox_inches="tight", dpi=150)
        fig, ax = plt.subplots(figsize=(5, 4))
        ax.hist(df["overlap_rmse"].clip(upper=df["distance_thr"].max() * 2), bins=40)
        ax.set_xlabel("overlap RMSE")
        fig.savefig(os.path.join(args.plots, "overlap_rmse.png"), bbox_inches="tight", dpi=150)
        print(f"\nwrote plots to {args.plots}")


if __name__ == "__main__":
    main()
