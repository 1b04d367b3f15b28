"""Tracing / profiling utilities.

Reference (SURVEY.md section 5): wall-clock pcl::ScopeTime blocks around
alignment, correspondence search, keypoints, RANSAC, GROR, analysis, plus a
manual split of downsample+normals vs feature-estimation time inside the
pyramid; timings flow into the results CSV as time_cs / time_te.

TPU equivalents: `scope_time` (host wall clock around block_until_ready
boundaries) and an env-gated `jax.profiler` trace
(LGR_PROFILE=<dir> wraps the whole CLI run; view with TensorBoard or
xprof)."""
from __future__ import annotations

import contextlib
import os
import time


@contextlib.contextmanager
def scope_time(label: str, sink: dict | None = None, key: str | None = None,
               verbose: bool = True):
    """pcl::ScopeTime equivalent: prints '<label> took NNNms.'"""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        if verbose:
            print(f"[{label}] took {1000.0 * dt:.1f}ms.")
        if sink is not None and key is not None:
            sink[key] = sink.get(key, 0.0) + dt


@contextlib.contextmanager
def maybe_jax_profile():
    """Wrap a region in a jax.profiler trace when LGR_PROFILE=<dir> is set."""
    trace_dir = os.environ.get("LGR_PROFILE")
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield
    print(f"[profiler] trace written to {trace_dir}")
