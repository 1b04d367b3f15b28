"""Histogram plotter (reference: plots.py, invoked from the temperature-map
writer).  The framework renders histograms in-process (utils/debug_viz.py);
this CLI stays for manual use.

Usage: python tools/plots.py histogram values.csv out.png
"""
import sys


def main():
    if len(sys.argv) != 4 or sys.argv[1] != "histogram":
        print("usage: python tools/plots.py histogram values.csv out.png")
        sys.exit(1)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    values = np.loadtxt(sys.argv[2], skiprows=1)
    plt.grid(linestyle="--")
    plt.hist(values, bins=256)
    plt.savefig(sys.argv[3], bbox_inches="tight", dpi=200)


if __name__ == "__main__":
    main()
