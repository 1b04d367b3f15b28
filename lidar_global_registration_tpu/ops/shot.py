"""SHOT-352 descriptors with quadrilinear interpolation.

Reference: fork of pcl::SHOTEstimationOMP (src/pcl/shot_debug.cpp:24-219,
include/common.h:394-415).  Per keypoint with LRF (x,y,z rows):
  - binDistance = (1 + n_j . z) * nr_bins / 2 over the neighbor's normal;
  - volume index packs azimuth sector (8), elevation half (2), radial shell
    (2) into desc_index in {0..31}; descriptor has 32 * (10+1) = 352 slots;
  - each neighbor votes into its (volume, shape-bin) slot with quadrilinear
    interpolation toward the adjacent shape bin, shell, elevation, azimuth;
  - neighborhoods smaller than 5 points produce an invalid descriptor;
  - final histogram is L2-normalized.

TPU re-design: neighbors come as padded [M, K] index lists; every gathered
quantity is a PER-COORDINATE [M, K] array (structure-of-arrays — a
materialized [M, K, 3] gather pads its last dim to 128 lanes, a 42x memory
blowup), and each of the 5 interpolation contributions is its own
segment-sum into the [M, 352] output.
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


@partial(jax.jit, static_argnames=("use_scatter",))
def shot_from_neighbors(kp_xyz, kp_frames, surface_xyz, surface_normal, idx, mask,
                        radius, use_scatter: bool = True):
    """kp_xyz f32[M,3]; kp_frames f32[M,3,3] rows (x,y,z); idx i32[M,K] into
    the surface arrays.  Returns (desc f32[M,352], ok bool[M]).

    use_scatter selects the accumulation lowering: segment-sum scatters are
    fast on CPU but serialize on TPU; the TPU path (use_scatter=False)
    histograms via a factored one-hot MXU contraction instead."""
    # per-coordinate gathers (SoA)
    d = [surface_xyz[:, c][idx] - kp_xyz[:, c][:, None] for c in range(3)]  # [M,K]
    nn = [surface_normal[:, c][idx] for c in range(3)]
    dist2 = d[0] ** 2 + d[1] ** 2 + d[2] ** 2
    dist = jnp.sqrt(jnp.maximum(dist2, 0.0))
    return _shot_hist(kp_frames, d, nn, dist, mask, radius, use_scatter)


@partial(jax.jit, static_argnames=("use_scatter",))
def _shot_hist(kp_frames, d, nn, dist, mask, radius, use_scatter: bool):
    """Quadrilinear SHOT histogram from pre-gathered neighbor offsets.

    d / nn are 3-lists of f32[M,K] per-coordinate neighbor offsets and
    normals (SoA); sharing them with the LRF pass halves the element-gather
    traffic of the full SHOT stage."""
    M, K = mask.shape

    def proj(axis_row):
        ax = kp_frames[:, axis_row, :]
        return d[0] * ax[:, 0:1] + d[1] * ax[:, 1:2] + d[2] * ax[:, 2:3]

    xr = proj(0)
    yr = proj(1)
    zr = proj(2)
    zax = kp_frames[:, 2, :]
    cos_desc = jnp.clip(
        nn[0] * zax[:, 0:1] + nn[1] * zax[:, 1:2] + nn[2] * zax[:, 2:3], -1.0, 1.0
    )
    nrm_ok = (nn[0] ** 2 + nn[1] ** 2 + nn[2] ** 2) > 0.5
    bin_dist = (1.0 + cos_desc) * NR_BINS / 2.0
    use = mask & (dist > 1e-12) & nrm_ok

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
    w_out = jnp.where(dist > radius3_4, 1.0 - rd_out, 1.0 + rd_out)
    r_nb_out = (desc_index - 2) * (NR_BINS + 1) + step_index
    r_has_nb_out = ~(dist > radius3_4)
    w_in = jnp.where(dist < radius1_4, 1.0 + rd_in, 1.0 - rd_in)
    r_nb_in = (desc_index + 2) * (NR_BINS + 1) + step_index
    r_has_nb_in = ~(dist < radius1_4)
    int_weight = int_weight + jnp.where(outer, w_out, w_in)
    rinterp_idx = jnp.where(outer, r_nb_out, r_nb_in)
    rinterp_val = jnp.where(outer, -rd_out, rd_in)
    rinterp_val = jnp.where(jnp.where(outer, r_has_nb_out, r_has_nb_in), rinterp_val, 0.0)

    # ---- elevation interpolation ----
    incl_cos = jnp.clip(zr / jnp.maximum(dist, 1e-30), -1.0, 1.0)
    incl = jnp.arccos(incl_cos)
    lower = (incl > jnp.pi / 2) | ((jnp.abs(incl - jnp.pi / 2) < 1e-30) & (zr <= 0))
    id_lo = (incl - 3.0 * jnp.pi / 4.0) / (jnp.pi / 2.0)
    id_hi = (incl - jnp.pi / 4.0) / (jnp.pi / 2.0)
    w_lo = jnp.where(incl > 3.0 * jnp.pi / 4.0, 1.0 - id_lo, 1.0 + id_lo)
    w_hi = jnp.where(incl < jnp.pi / 4.0, 1.0 + id_hi, 1.0 - id_hi)
    e_nb_lo = (desc_index + 1) * (NR_BINS + 1) + step_index
    e_nb_hi = (desc_index - 1) * (NR_BINS + 1) + step_index
    e_has_lo = ~(incl > 3.0 * jnp.pi / 4.0)
    e_has_hi = ~(incl < jnp.pi / 4.0)
    int_weight = int_weight + jnp.where(lower, w_lo, w_hi)
    einterp_idx = jnp.where(lower, e_nb_lo, e_nb_hi)
    einterp_val = jnp.where(lower, -id_lo, id_hi)
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

    ways = (
        (main_idx, int_weight),
        (binterp_idx, binterp_val),
        (rinterp_idx, rinterp_val),
        (einterp_idx, einterp_val),
        (ainterp_idx, ainterp_val),
    )
    if use_scatter:
        rows = jnp.arange(M, dtype=jnp.int32)[:, None]
        desc = jnp.zeros((M * DIM,), jnp.float32)
        # 5 contributions, each its own [M,K] segment-sum (no [M,K,5] stack)
        for tgt_idx, val in ways:
            flat = rows * DIM + jnp.clip(tgt_idx, 0, DIM - 1)
            v = jnp.where(use, val, 0.0)
            desc = desc + jax.ops.segment_sum(
                v.reshape(-1), flat.reshape(-1), num_segments=M * DIM
            )
        desc = desc.reshape(M, DIM)
    else:
        # Scatter-free FACTORED one-hot reduction.  Every slot index is
        # volume * 11 + shape_bin with volume in [0,32) and bin in [0,11),
        # so the naive [M, 5K, 352] compare-select tensor (352 VPU
        # compare+select+add per contribution) factors into two small
        # one-hots and a per-row MXU contraction:
        #   desc[m, v*11+b] = sum_k val[m,k] * (vol[m,k]==v) * (bin[m,k]==b)
        # i.e. a batched [32, 5K] @ [5K, 11] matmul — 43 compares per
        # contribution plus MXU FLOPs instead of 352 VPU lane ops.  Rows are
        # processed in fixed blocks so the materialized one-hots stay
        # bounded ([blk, 32+11, 5K] with the contraction dim in lanes).
        idx_all = jnp.concatenate(
            [jnp.clip(ti, 0, DIM - 1) for ti, _ in ways], axis=1
        )  # [M, 5K]
        val_all = jnp.concatenate(
            [jnp.where(use, v, 0.0) for _, v in ways], axis=1
        )
        vol = idx_all // (NR_BINS + 1)  # [M,5K] in [0,32)
        sbin = idx_all - vol * (NR_BINS + 1)  # [M,5K] in [0,11)
        blk = 512
        n_blk = -(-M // blk)
        pad = n_blk * blk - M
        vol_p = jnp.pad(vol, ((0, pad), (0, 0))).reshape(n_blk, blk, -1)
        bin_p = jnp.pad(sbin, ((0, pad), (0, 0))).reshape(n_blk, blk, -1)
        val_p = jnp.pad(val_all, ((0, pad), (0, 0))).reshape(n_blk, blk, -1)
        vols = jnp.arange(NR_VOLUMES, dtype=vol.dtype)
        bins = jnp.arange(NR_BINS + 1, dtype=vol.dtype)

        def _blk(args):
            v, b, w = args  # [blk, 5K]
            # one-hots with the 5K contraction dim LAST (lane dim): the
            # [blk, 32, 5K] layout keeps sublane=32 / lane=5K tiling tight
            voh = jnp.where(v[:, None, :] == vols[None, :, None], w[:, None, :], 0.0)
            boh = (b[:, None, :] == bins[None, :, None]).astype(jnp.float32)
            return jax.lax.dot_general(
                voh,
                boh,
                (((2,), (2,)), ((0,), (0,))),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )  # [blk, 32, 11]

        desc = jax.lax.map(_blk, (vol_p, bin_p, val_p))
        desc = desc.reshape(n_blk * blk, DIM)[:M]

    n_nb = jnp.sum(mask & (dist > 1e-12), axis=1)
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
    chunk: int | None = None,
    approx: bool | None = None,
    use_scatter: bool | None = None,
    fallback_mask=None,
):
    """Full SHOT pipeline: neighbors + (optional external) LRFs + histogram.

    frames: optional f32[M,3,3] precomputed LRFs (gravity / gt modes,
    common.h:394-415 setInputReferenceFrames); default = SHOT LRF.
    fallback_mask: optional bool[M] — rows where the precomputed frame is
    degenerate (e.g. gravity parallel to the normal) take the SHOT-LRF
    computed over the FULL surface support instead, reusing this call's
    own neighbor query (shot_lrf.hpp fallback semantics)."""
    if approx is None:
        approx = gridmod.approx_topk_default()
    if use_scatter is None:
        use_scatter = jax.default_backend() not in ("tpu", "axon")
    g = gridmod.build_grid(surface_xyz, surface_valid, radius, cell_cap=cap)
    idx, _dist, mask = gridmod.radius_neighbors(
        g, kp_xyz, kp_valid, radius, k=k_neighbors, cap=cap, chunk=chunk, approx=approx
    )
    M = kp_xyz.shape[0]
    frames_mode = (
        "lrf" if frames is None
        else ("blend" if fallback_mask is not None else "given")
    )
    if frames is None:
        frames = jnp.zeros((M, 3, 3), jnp.float32)
    if fallback_mask is None:
        fallback_mask = jnp.zeros((M,), bool)
    return _shot_core(
        kp_xyz, kp_valid, surface_xyz, surface_normal, idx, mask,
        jnp.asarray(radius, jnp.float32), jnp.asarray(frames), fallback_mask,
        use_scatter, frames_mode,
    )


@partial(jax.jit, static_argnames=("use_scatter", "frames_mode"))
def _shot_core(kp_xyz, kp_valid, surface_xyz, surface_normal, idx, mask,
               radius, frames, fallback_mask, use_scatter: bool,
               frames_mode: str):
    """One program for LRF + histogram: the [M,K] per-coordinate neighbor
    gathers (the dominant memory traffic of the stage) are computed once
    and shared between the LRF covariance/sign pass and the histogram."""
    d = [surface_xyz[:, c][idx] - kp_xyz[:, c][:, None] for c in range(3)]
    nn = [surface_normal[:, c][idx] for c in range(3)]
    dist = jnp.sqrt(jnp.maximum(d[0] ** 2 + d[1] ** 2 + d[2] ** 2, 0.0))
    if frames_mode == "lrf":
        frames, frames_ok = lrfmod.shot_lrf(
            kp_xyz, radius, surface_xyz, idx, mask, diffs=d, dist=dist
        )
    elif frames_mode == "blend":
        fb, fb_ok = lrfmod.shot_lrf(
            kp_xyz, radius, surface_xyz, idx, mask, diffs=d, dist=dist
        )
        frames = jnp.where(fallback_mask[:, None, None], fb, frames)
        frames_ok = jnp.where(fallback_mask, fb_ok, True)
    else:
        frames_ok = jnp.ones((kp_xyz.shape[0],), bool)
    desc, ok = _shot_hist(frames, d, nn, dist, mask, radius, use_scatter)
    ok = ok & frames_ok & kp_valid
    return jnp.where(ok[:, None], desc, 0.0), ok
