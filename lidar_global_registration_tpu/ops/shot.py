"""SHOT-352 descriptors with quadrilinear interpolation.

Reference: fork of pcl::SHOTEstimationOMP (src/pcl/shot_debug.cpp:24-219,
include/common.h:394-415).  Per keypoint with LRF (x,y,z rows):
  - binDistance = (1 + n_j . z) * nr_bins / 2 over the neighbor's normal;
  - volume index packs azimuth sector (8), elevation half (2), radial shell
    (2) into desc_index in {0..31}; descriptor has 32 * (10+1) = 352 slots;
  - each neighbor votes into its (volume, shape-bin) slot with quadrilinear
    interpolation toward the adjacent shape bin, shell, elevation, azimuth;
  - neighborhoods smaller than 5 points produce an invalid (NaN) descriptor;
  - final histogram is L2-normalized.

TPU re-design: neighbors come as padded [M, K] lists; every vote becomes 5
(index, value) contributions scattered with one segment-sum into the [M,352]
output.  All the PCL branches are rewritten as masked arithmetic.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from lidar_global_registration_tpu.ops import grid as gridmod
from lidar_global_registration_tpu.ops import lrf as lrfmod

NR_BINS = 10  # shape bins per volume
NR_VOLUMES = 32
DIM = NR_VOLUMES * (NR_BINS + 1)  # 352
MAX_ANGULAR = 32
MIN_NEIGHBORS = 5


@partial(jax.jit, static_argnames=())
def shot_from_neighbors(kp_xyz, kp_frames, nb_xyz, nb_normal, nb_mask, radius):
    """kp_xyz f32[M,3]; kp_frames f32[M,3,3] rows (x,y,z); nb_* f32[M,K,...].

    Returns (desc f32[M,352], ok bool[M])."""
    M, K = nb_mask.shape
    x_ax = kp_frames[:, 0, :][:, None, :]
    y_ax = kp_frames[:, 1, :][:, None, :]
    z_ax = kp_frames[:, 2, :][:, None, :]

    delta = nb_xyz - kp_xyz[:, None, :]
    dist = jnp.sqrt(jnp.maximum(jnp.sum(delta * delta, axis=-1), 0.0))

    nrm_ok = jnp.sum(nb_normal * nb_normal, axis=-1) > 0.5
    cos_desc = jnp.clip(jnp.sum(nb_normal * z_ax, axis=-1), -1.0, 1.0)
    bin_dist = (1.0 + cos_desc) * NR_BINS / 2.0

    use = nb_mask & (dist > 1e-12) & nrm_ok

    xr = jnp.sum(delta * x_ax, axis=-1)
    yr = jnp.sum(delta * y_ax, axis=-1)
    zr = jnp.sum(delta * z_ax, axis=-1)
    # PCL zeroes tiny components before the sign logic
    xr = jnp.where(jnp.abs(xr) < 1e-30, 0.0, xr)
    yr = jnp.where(jnp.abs(yr) < 1e-30, 0.0, yr)
    zr = jnp.where(jnp.abs(zr) < 1e-30, 0.0, zr)

    bit4 = ((yr > 0) | ((yr == 0.0) & (xr < 0))).astype(jnp.int32)
    bit3_cond = (xr > 0) | ((xr == 0.0) & (yr > 0))
    bit3 = jnp.where(bit3_cond, 1 - bit4, bit4)
    desc_index = (bit4 << 3) + (bit3 << 2)
    desc_index = desc_index << 1
    quad = jnp.where(
        (xr * yr > 0) | (xr == 0.0),
        jnp.where(jnp.abs(xr) >= jnp.abs(yr), 0, 4),
        jnp.where(jnp.abs(xr) > jnp.abs(yr), 4, 0),
    )
    desc_index = desc_index + quad
    desc_index = desc_index + (zr > 0).astype(jnp.int32)
    radius1_2 = radius / 2.0
    radius3_4 = radius * 3.0 / 4.0
    radius1_4 = radius / 4.0
    outer = dist > radius1_2
    desc_index = desc_index + jnp.where(outer, 2, 0)

    step_index = jnp.floor(bin_dist + 0.5).astype(jnp.int32)
    frac = bin_dist - step_index
    volume_index = desc_index * (NR_BINS + 1)

    int_weight = 1.0 - jnp.abs(frac)

    # ---- shape-bin interpolation (adjacent bins, modular) ----
    bin_up = volume_index + (step_index + 1) % NR_BINS
    bin_dn = volume_index + (step_index - 1 + NR_BINS) % NR_BINS
    binterp_idx = jnp.where(frac > 0, bin_up, bin_dn)
    binterp_val = jnp.abs(frac)

    # ---- radial (shell) interpolation ----
    rd_out = (dist - radius3_4) / radius1_2
    rd_in = (dist - radius1_4) / radius1_2
    # outer shell
    w_out = jnp.where(dist > radius3_4, 1.0 - rd_out, 1.0 + rd_out)
    r_nb_out = (desc_index - 2) * (NR_BINS + 1) + step_index
    rv_out = -rd_out  # subtracted in reference
    r_has_nb_out = ~(dist > radius3_4)
    # inner shell
    w_in = jnp.where(dist < radius1_4, 1.0 + rd_in, 1.0 - rd_in)
    r_nb_in = (desc_index + 2) * (NR_BINS + 1) + step_index
    rv_in = rd_in
    r_has_nb_in = ~(dist < radius1_4)
    int_weight = int_weight + jnp.where(outer, w_out, w_in)
    rinterp_idx = jnp.where(outer, r_nb_out, r_nb_in)
    rinterp_val = jnp.where(outer, rv_out, rv_in)
    rinterp_val = jnp.where(jnp.where(outer, r_has_nb_out, r_has_nb_in), rinterp_val, 0.0)

    # ---- elevation interpolation ----
    incl_cos = jnp.clip(zr / jnp.maximum(dist, 1e-30), -1.0, 1.0)
    incl = jnp.arccos(incl_cos)
    lower = (incl > jnp.pi / 2) | (
        (jnp.abs(incl - jnp.pi / 2) < 1e-30) & (zr <= 0)
    )
    id_lo = (incl - 3.0 * jnp.pi / 4.0) / (jnp.pi / 2.0)
    id_hi = (incl - jnp.pi / 4.0) / (jnp.pi / 2.0)
    w_lo = jnp.where(incl > 3.0 * jnp.pi / 4.0, 1.0 - id_lo, 1.0 + id_lo)
    w_hi = jnp.where(incl < jnp.pi / 4.0, 1.0 + id_hi, 1.0 - id_hi)
    e_nb_lo = (desc_index + 1) * (NR_BINS + 1) + step_index
    e_nb_hi = (desc_index - 1) * (NR_BINS + 1) + step_index
    ev_lo = -id_lo
    ev_hi = id_hi
    e_has_lo = ~(incl > 3.0 * jnp.pi / 4.0)
    e_has_hi = ~(incl < jnp.pi / 4.0)
    int_weight = int_weight + jnp.where(lower, w_lo, w_hi)
    einterp_idx = jnp.where(lower, e_nb_lo, e_nb_hi)
    einterp_val = jnp.where(lower, ev_lo, ev_hi)
    einterp_val = jnp.where(jnp.where(lower, e_has_lo, e_has_hi), einterp_val, 0.0)

    # ---- azimuth interpolation ----
    has_az = (yr != 0.0) | (xr != 0.0)
    azimuth = jnp.arctan2(yr, xr)
    sel = desc_index >> 2
    sector_start = -jnp.pi * 7.0 / 8.0
    sector_span = jnp.pi / 4.0
    az_d = (azimuth - (sector_start + sector_span * sel)) / sector_span
    az_d = jnp.clip(az_d, -0.5, 0.5)
    az_pos = az_d > 0
    a_nb = jnp.where(
        az_pos,
        (desc_index + 4) % MAX_ANGULAR,
        (desc_index - 4 + MAX_ANGULAR) % MAX_ANGULAR,
    )
    ainterp_idx = a_nb * (NR_BINS + 1) + step_index
    ainterp_val = jnp.where(az_pos, az_d, -az_d)
    int_weight = int_weight + jnp.where(has_az, 1.0 - jnp.abs(az_d), 0.0)
    ainterp_val = jnp.where(has_az, ainterp_val, 0.0)

    main_idx = volume_index + step_index
    main_val = int_weight

    idxs = jnp.stack([main_idx, binterp_idx, rinterp_idx, einterp_idx, ainterp_idx], -1)
    vals = jnp.stack([main_val, binterp_val, rinterp_val, einterp_val, ainterp_val], -1)
    vals = jnp.where(use[..., None], vals, 0.0)
    idxs = jnp.clip(idxs, 0, DIM - 1)

    rows = jnp.arange(M, dtype=jnp.int32)[:, None, None]
    flat_idx = (rows * DIM + idxs).reshape(-1)
    desc = jax.ops.segment_sum(vals.reshape(-1), flat_idx, num_segments=M * DIM)
    desc = desc.reshape(M, DIM)

    n_nb = jnp.sum(nb_mask & (dist > 1e-12), axis=1)
    ok = n_nb >= MIN_NEIGHBORS
    norm = jnp.sqrt(jnp.maximum(jnp.sum(desc * desc, axis=1, keepdims=True), 1e-30))
    desc = jnp.where(ok[:, None], desc / norm, 0.0)
    return desc, ok


def shot(
    kp_xyz,
    kp_valid,
    surface_xyz,
    surface_normal,
    surface_valid,
    radius,
    frames=None,
    k_neighbors: int = 512,
    cap: int = 128,
    chunk: int | None = 2048,
):
    """Full SHOT pipeline: neighbors + (optional external) LRFs + histogram.

    frames: optional f32[M,3,3] precomputed LRFs (gravity / gt modes,
    common.h:394-415 setInputReferenceFrames); default = SHOT LRF."""
    g = gridmod.build_grid(surface_xyz, surface_valid, radius)
    idx, _dist, mask = gridmod.radius_neighbors(
        g, kp_xyz, kp_valid, radius, k=k_neighbors, cap=cap, chunk=chunk
    )
    nb_xyz = surface_xyz[idx]
    nb_nrm = surface_normal[idx]
    if frames is None:
        frames, frames_ok = lrfmod.shot_lrf(kp_xyz, radius, nb_xyz, mask)
    else:
        frames_ok = jnp.ones((kp_xyz.shape[0],), bool)
    desc, ok = shot_from_neighbors(kp_xyz, frames, nb_xyz, nb_nrm, mask, radius)
    ok = ok & frames_ok & kp_valid
    return jnp.where(ok[:, None], desc, 0.0), ok
