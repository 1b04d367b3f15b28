"""Mesh construction helpers.

Axes:
  dp - data parallel over scan pairs (the reference's `tests:` loop,
       main.cpp:384-407, becomes a sharded leading batch axis);
  tp - tensor parallel over the target descriptor database inside one pair
       (the block-tiled BF matmul, matching.h:594-634, splits its train
       axis across chips and min-combines top-k over ICI).
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, tp: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    assert n <= len(devs), (n, len(devs))
    if tp is None:
        tp = 2 if n % 2 == 0 and n >= 2 else 1
    dp = n // tp
    assert dp * tp == n, (n, dp, tp)
    arr = np.array(devs[:n]).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def pair_sharding(mesh: Mesh):
    """Sharding for a [B, N, ...] batch of per-pair arrays: B over dp."""
    return NamedSharding(mesh, P("dp"))


__all__ = ["Mesh", "NamedSharding", "P", "make_mesh", "pair_sharding"]
