"""USC-1960 (Unique Shape Context) descriptors.

Reference: estimateFeatures<USC> -> pcl::UniqueShapeContext with
minimal_radius = r/10, point_density_radius = r/5, local_radius = r
(include/common.h:334-346).  A 3D shape context on log-spaced radial shells
x elevation x azimuth bins in the LRF frame, each neighbor weighted by
1 / (local point density * cbrt(bin volume)); "unique" = one deterministic
LRF instead of azimuth marginalization.

Bin layout chosen as radial 10 x elevation 14 x azimuth 14 = 1960 to match
the descriptor width of pcl::UniqueShapeContext1960.  Per-coordinate (SoA)
gathers throughout.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from lidar_global_registration_tpu.ops import grid as gridmod
from lidar_global_registration_tpu.ops import lrf as lrfmod

N_RAD = 10
N_ELEV = 14
N_AZIM = 14
DIM = N_RAD * N_ELEV * N_AZIM  # 1960


@partial(jax.jit, static_argnames=())
def usc_from_neighbors(kp_xyz, frames, surface_xyz, idx, mask, nb_density, radius):
    M, K = mask.shape
    r_min = radius / 10.0
    d = [surface_xyz[:, c][idx] - kp_xyz[:, c][:, None] for c in range(3)]  # [M,K]
    loc = [
        d[0] * frames[:, j, 0:1] + d[1] * frames[:, j, 1:2] + d[2] * frames[:, j, 2:3]
        for j in range(3)
    ]
    dist = jnp.sqrt(jnp.maximum(loc[0] ** 2 + loc[1] ** 2 + loc[2] ** 2, 0.0))
    use = mask & (dist > 1e-12) & (dist <= radius)

    logr = jnp.log(jnp.maximum(dist, 1e-30) / r_min) / jnp.log(radius / r_min)
    rb = jnp.clip(jnp.floor(logr * N_RAD), 0, N_RAD - 1).astype(jnp.int32)
    cosel = jnp.clip(loc[2] / jnp.maximum(dist, 1e-30), -1.0, 1.0)
    eb = jnp.clip(jnp.floor(jnp.arccos(cosel) / jnp.pi * N_ELEV), 0, N_ELEV - 1).astype(
        jnp.int32
    )
    az = jnp.mod(jnp.arctan2(loc[1], loc[0]) + 2 * jnp.pi, 2 * jnp.pi)
    ab = jnp.clip(jnp.floor(az / (2 * jnp.pi) * N_AZIM), 0, N_AZIM - 1).astype(jnp.int32)
    cell = (rb * N_ELEV + eb) * N_AZIM + ab

    edges = r_min * (radius / r_min) ** (jnp.arange(N_RAD + 1) / N_RAD)
    el_edges = jnp.arange(N_ELEV + 1) / N_ELEV * jnp.pi
    shell_vol = (edges[1:] ** 3 - edges[:-1] ** 3) / 3.0
    band = jnp.cos(el_edges[:-1]) - jnp.cos(el_edges[1:])
    vol = (
        shell_vol[:, None, None]
        * band[None, :, None]
        * (2 * jnp.pi / N_AZIM)
        * jnp.ones((1, 1, N_AZIM))
    ).reshape(-1)
    w = 1.0 / (jnp.maximum(nb_density, 1e-30) * jnp.cbrt(jnp.maximum(vol[cell], 1e-30)))
    w = jnp.where(use, w, 0.0)

    rows = jnp.arange(M, dtype=jnp.int32)[:, None]
    desc = jax.ops.segment_sum(
        w.reshape(-1), (rows * DIM + cell).reshape(-1), num_segments=M * DIM
    ).reshape(M, DIM)
    norm = jnp.sqrt(jnp.maximum(jnp.sum(desc * desc, axis=1, keepdims=True), 1e-30))
    return desc / norm


def usc(
    kp_xyz,
    kp_valid,
    surface_xyz,
    surface_valid,
    radius,
    frames=None,
    k_neighbors: int = 384,
    cap: int = 128,
    density_k: int = 48,
    chunk: int | None = None,
    approx: bool | None = None,
):
    if approx is None:
        approx = gridmod.approx_topk_default()
    g = gridmod.build_grid(surface_xyz, surface_valid, radius, cell_cap=cap)
    idx, dist, mask = gridmod.radius_neighbors(
        g, kp_xyz, kp_valid, radius, k=k_neighbors, cap=cap, chunk=chunk, approx=approx
    )
    if frames is None:
        frames, _ok = lrfmod.shot_lrf(kp_xyz, radius, surface_xyz, idx, mask)
    # PCL weights each neighbor by the point density around the NEIGHBOR
    # itself (pcl::UniqueShapeContext::computePoint: radiusSearch of
    # point_density_radius = r/5 at every neighbor).  One surface self-join
    # within r/5 gives every surface point its own count; a [M,K] gather
    # then yields the per-neighbor densities.
    density_r = radius / 5.0
    n_surface = surface_xyz.shape[0]
    g5 = gridmod.build_grid(surface_xyz, surface_valid, density_r, cell_cap=cap)
    sidx = jnp.arange(n_surface, dtype=jnp.int32)
    _i5, _d5, m5 = gridmod.radius_neighbors(
        g5, surface_xyz, surface_valid, density_r, k=density_k, cap=cap,
        include_self=False, query_index=sidx, chunk=chunk, approx=approx,
    )
    surface_counts = jnp.sum(m5, axis=1).astype(jnp.float32) + 1.0  # incl self
    nb_density = jnp.maximum(surface_counts[idx], 1.0)
    desc = usc_from_neighbors(
        kp_xyz, jnp.asarray(frames), surface_xyz, idx, mask, nb_density, radius
    )
    n_nb = jnp.sum(mask, axis=1)
    ok = kp_valid & (n_nb >= 5)
    return jnp.where(ok[:, None], desc, 0.0), ok
