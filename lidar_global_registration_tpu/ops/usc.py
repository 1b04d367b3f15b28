"""USC-1960 (Unique Shape Context) descriptors, PCL-layout faithful.

Reference: estimateFeatures<USC> -> pcl::UniqueShapeContext1960 with
minimal_radius = r/10, point_density_radius = r/5, local_radius = r
(include/common.h:334-346).

PCL semantics reproduced here (pcl::UniqueShapeContext::initCompute /
computePointDescriptor, features/impl/usc.hpp):

- Bin counts: radius_bins=10, elevation_bins=14, azimuth_bins=14.
  10*14*14 = 1960 is not the unique factorization of the
  pcl::UniqueShapeContext1960 width (5*14*28, 7*14*20, ... also
  factor); it is the PCL-convention-consistent layout: azimuth >=
  elevation >= radius as in the 3DSC sibling (15, 11, 12) =
  ShapeContext1980, with equal elevation/azimuth counts matching the
  Tombari USC paper's grid.  Unverifiable against PCL's usc.h source
  offline — re-check the constants the instant it is reachable.
- Radial edges: logarithmic, radii_interval[j] =
  exp(log(r_min) + j/R * log(r_max/r_min)); neighbors closer than r_min
  land in the first shell (PCL's edge scan starts at interval[1]).
- Elevation: theta = angle(neighbor-origin, LRF z) in [0, 180] deg,
  linear bins.  Azimuth: angle of the tangent-plane projection vs the
  LRF x axis, signed into [0, 360) by cross.dot(normal) — identical to
  atan2(local_y, local_x) mod 360 — linear bins.
- Weight per neighbor: 1 / (local_point_density * cbrt(bin_volume)),
  where local density counts surface points within r/5 of the NEIGHBOR
  (self included) and bin_volume = (2pi/A) * (cos th_k - cos th_{k+1})
  * (r_{j+1}^3 - r_j^3)/3 (the Frome formula PCL tabulates in
  volume_lut_).
- Memory order: azimuth-major, desc[(l*E*R) + (k*R) + j] — PCL's
  v_index — so a descriptor dump is bin-for-bin comparable to PCL's.
- No normalization: PCL accumulates raw weights and never L2-normalizes
  USC (unlike SHOT); matching runs on the raw histogram.

Per-coordinate (SoA) gathers throughout.
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


def bin_index(rb, eb, ab):
    """PCL v_index: azimuth-major, then elevation, then radius."""
    return (ab * N_ELEV + eb) * N_RAD + rb


@partial(jax.jit, static_argnames=())
def usc_from_neighbors(kp_xyz, frames, surface_xyz, idx, mask, nb_density, radius):
    """[M,K] neighbor lists -> [M,1960] raw USC descriptors.

    frames: [M,3,3] with rows = (x, y, z=normal) axes of the LRF.
    nb_density: [M,K] point count within radius/5 of each neighbor.
    """
    M, K = mask.shape
    r_min = radius / 10.0
    d = [surface_xyz[:, c][idx] - kp_xyz[:, c][:, None] for c in range(3)]  # [M,K]
    loc = [
        d[0] * frames[:, j, 0:1] + d[1] * frames[:, j, 1:2] + d[2] * frames[:, j, 2:3]
        for j in range(3)
    ]
    dist = jnp.sqrt(jnp.maximum(loc[0] ** 2 + loc[1] ** 2 + loc[2] ** 2, 0.0))
    use = mask & (dist > 1e-12) & (dist <= radius)

    # radial bin: log-spaced shells from r_min; r < r_min falls in shell 0
    logr = jnp.log(jnp.maximum(dist, 1e-30) / r_min) / jnp.log(radius / r_min)
    rb = jnp.clip(jnp.floor(logr * N_RAD), 0, N_RAD - 1).astype(jnp.int32)
    # elevation bin: angle vs LRF z in [0, pi], linear
    cosel = jnp.clip(loc[2] / jnp.maximum(dist, 1e-30), -1.0, 1.0)
    eb = jnp.clip(jnp.floor(jnp.arccos(cosel) / jnp.pi * N_ELEV), 0, N_ELEV - 1).astype(
        jnp.int32
    )
    # azimuth bin: tangent-plane angle vs LRF x in [0, 2pi), linear
    az = jnp.mod(jnp.arctan2(loc[1], loc[0]) + 2 * jnp.pi, 2 * jnp.pi)
    ab = jnp.clip(jnp.floor(az / (2 * jnp.pi) * N_AZIM), 0, N_AZIM - 1).astype(jnp.int32)
    cell = bin_index(rb, eb, ab)

    # Frome bin-volume integral, tabulated per (j, k) and broadcast over l
    edges = r_min * (radius / r_min) ** (jnp.arange(N_RAD + 1) / N_RAD)
    el_edges = jnp.arange(N_ELEV + 1) / N_ELEV * jnp.pi
    shell_vol = (edges[1:] ** 3 - edges[:-1] ** 3) / 3.0  # [R]
    band = jnp.cos(el_edges[:-1]) - jnp.cos(el_edges[1:])  # [E]
    vol_ker = shell_vol[None, :] * band[:, None] * (2 * jnp.pi / N_AZIM)  # [E,R]
    vol = jnp.tile(vol_ker.reshape(-1), (N_AZIM,))  # [A*E*R] in PCL order
    # PCL zeroes the contribution when the local point density is 0
    # (computePointDescriptor guard) — unreachable from usc() (densities
    # are self-inclusive counts >= 1) but matched here for direct callers
    # with arbitrary nb_density.
    w = jnp.where(
        nb_density > 0,
        1.0 / (jnp.maximum(nb_density, 1e-30) * jnp.cbrt(jnp.maximum(vol[cell], 1e-30))),
        0.0,
    )
    w = jnp.where(use, w, 0.0)

    rows = jnp.arange(M, dtype=jnp.int32)[:, None]
    desc = jax.ops.segment_sum(
        w.reshape(-1), (rows * DIM + cell).reshape(-1), num_segments=M * DIM
    ).reshape(M, DIM)
    return desc


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
    # itself (pcl::UniqueShapeContext::computePointDescriptor: radiusSearch
    # of point_density_radius = r/5 at every neighbor, self included).  One
    # surface self-join within r/5 gives every surface point its own count;
    # a [M,K] gather then yields the per-neighbor densities.
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
