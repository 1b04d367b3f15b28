"""Sharded batched registration: many scan pairs across a device mesh.

register_batch shard_maps the flagship step over a ('dp','tp') mesh:
  - the pair batch axis is split across dp;
  - inside each pair, the brute-force descriptor matching (the dominant
    O(Nq*Nt*D) matmul) splits its train axis across tp; each tp peer
    computes a local top-1 and the winners are min-combined with an
    all_gather over ICI.

This is the BASELINE.json config-5 shape: "many scan pairs pipelined
concurrently with batched RANSAC on v5e".
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lidar_global_registration_tpu.models.flagship import FlagshipConfig
from lidar_global_registration_tpu.ops import matchers

try:  # jax >= 0.6 top-level export
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map


def match_bf_tp(fq, ft, fq_valid, ft_valid, k: int, tile: int, bf16: bool,
                axis: str, approx: bool = False, exclude_self: bool = False):
    """Tensor-parallel exact 1-NN: each device matches against its shard of
    the train set, then the global best is picked across the axis.

    exclude_self: same-set kNN with the train side sharded — a train row is
    the query's own row when its GLOBAL id (shard offset + local id) equals
    the query row index (match_bf exclude_ids semantics)."""
    nt_local = ft.shape[0]
    offset = jax.lax.axis_index(axis) * nt_local
    exclude_ids = (
        jnp.arange(fq.shape[0], dtype=jnp.int32) if exclude_self else None
    )
    idx, dist, mask = matchers.match_bf(
        fq, ft, fq_valid, ft_valid, k=k, tile=tile, bf16=bf16, approx=approx,
        exclude_ids=exclude_ids, id_offset=offset,
    )
    gidx = idx + offset
    big = jnp.float32(3.0e38)
    d = jnp.where(mask, dist, big)
    all_d = jax.lax.all_gather(d, axis)  # [tp, Nq, k]
    all_i = jax.lax.all_gather(gidx, axis)
    all_m = jax.lax.all_gather(mask, axis)
    # merge the tp * k candidates per query
    T, Nq, K = all_d.shape
    flat_d = jnp.moveaxis(all_d, 0, 1).reshape(Nq, T * K)
    flat_i = jnp.moveaxis(all_i, 0, 1).reshape(Nq, T * K)
    flat_m = jnp.moveaxis(all_m, 0, 1).reshape(Nq, T * K)
    neg, sel = jax.lax.top_k(-flat_d, k)
    out_d = -neg
    out_i = jnp.take_along_axis(flat_i, sel, axis=1)
    out_m = jnp.take_along_axis(flat_m, sel, axis=1) & (out_d < big)
    return out_i, out_d, out_m


def _pair_step_tp(src_xyz, src_valid, tgt_xyz, tgt_valid, key, scalars, vps,
                  cfg):
    """Flagship step with every heavy stage tp-sharded; runs INSIDE
    shard_map with axis 'tp' live.

    The cloud arrays are replicated across tp (the grid build is cheap and
    every query needs the full neighbor structure), but the QUERY ROWS of
    normals, density, ISS and FPFH are split across the axis — each peer
    computes N/tp rows and the per-point products are re-assembled with an
    all_gather over ICI.  Matching then splits the train side as before.
    This is the 'shard one pair across chips' lever: at 10M points the
    feature stages dominate, and they are embarrassingly parallel in the
    query rows (SURVEY §2.12)."""
    from lidar_global_registration_tpu.models import flagship as fs
    from lidar_global_registration_tpu.ops import fpfh as fpfh_mod
    from lidar_global_registration_tpu.ops import grid as gridmod
    from lidar_global_registration_tpu.ops.normals import normals_from_neighbors

    (
        normal_cell,
        density_cell_src,
        density_cell_tgt,
        iss_radius_src,
        iss_radius_tgt,
        feature_radius,
        distance_thr,
    ) = scalars
    N = src_xyz.shape[0]
    tp_size = jax.lax.axis_size("tp")
    ti = jax.lax.axis_index("tp")
    assert N % tp_size == 0, f"pad N={N} to a multiple of tp={tp_size}"
    shard = N // tp_size

    def shard_rows(x):
        return jax.lax.dynamic_slice_in_dim(x, ti * shard, shard, axis=0)

    def gather_rows(x_l):
        g = jax.lax.all_gather(x_l, "tp")  # [tp, shard, ...]
        return g.reshape((N,) + x_l.shape[1:])

    def side(xyz, valid, iss_radius, viewpoint):
        xyz_l, valid_l = shard_rows(xyz), shard_rows(valid)
        qidx_l = ti * shard + jnp.arange(shard, dtype=jnp.int32)
        g = gridmod.build_grid(xyz, valid, normal_cell, cell_cap=cfg.neighbor_cap)
        idx, dist, mask = gridmod.radius_neighbors(
            g, xyz_l, valid_l, normal_cell, k=cfg.normal_k, cap=cfg.neighbor_cap,
            include_self=True,
        )
        # viewpoint-consistent normal orientation (viewpoints.csv in the
        # reference): orientation flips between the two sides otherwise,
        # which flips SHOT's cos(normal, frame z) bins and gravity frames
        normal_l, _c, _o = normals_from_neighbors(xyz_l, xyz, idx, mask,
                                                  viewpoint)
        normal = gather_rows(normal_l)
        # k=2 smoothed density (common.cpp:531-547): the smoothing neighbor
        # may live on another peer's row shard -> the shared helper gathers
        # the raw distances across peers
        density_l = fs._density_from_knn(idx, dist, mask, valid_l,
                                         gather_rows=gather_rows)
        density = gather_rows(density_l)
        if cfg.use_iss:
            gi = gridmod.build_grid(xyz, valid, iss_radius, cell_cap=cfg.neighbor_cap)
            iidx, _d, imask = gridmod.radius_neighbors(
                gi, xyz_l, valid_l, iss_radius, k=cfg.iss_neighbors,
                cap=cfg.neighbor_cap, include_self=False, query_index=qidx_l,
            )
            counts_l = jnp.sum(imask, axis=1).astype(jnp.int32) + 1
            counts = gather_rows(counts_l)  # saliency weighs by NEIGHBOR counts
            sal_l, ok_l = fs._iss_saliency(
                xyz, valid, iidx, imask, counts,
                query_xyz=xyz_l, query_valid=valid_l,
            )
            sal = gather_rows(sal_l)  # NMS compares against NEIGHBOR saliency
            kp_l = fs._nms(sal, ok_l, iidx, imask, query_saliency=sal_l)
            kp = gather_rows(kp_l)
        else:
            kp = valid
        return normal, kp, density

    def fpfh_side(xyz, normal, valid, kp_mask):
        xyz_l, valid_l = shard_rows(xyz), shard_rows(valid)
        normal_l = shard_rows(normal)
        qidx_l = ti * shard + jnp.arange(shard, dtype=jnp.int32)
        g = gridmod.build_grid(xyz, valid, feature_radius, cell_cap=cfg.feature_cap)
        idx, dist, mask = gridmod.radius_neighbors(
            g, xyz_l, valid_l, feature_radius, k=cfg.feature_neighbors,
            cap=cfg.feature_cap, include_self=False, query_index=qidx_l,
            approx=gridmod.approx_topk_default(),
        )
        spfh_l = fpfh_mod.spfh(
            xyz, normal, idx, mask, query_xyz=xyz_l, query_normal=normal_l
        )
        spfh_all = gather_rows(spfh_l)  # the combine needs NEIGHBOR SPFHs
        feat_l, k_cnt_l = fpfh_mod.combine_spfh(
            xyz_l, normal_l, xyz, normal, spfh_all, idx, dist, mask
        )
        fv_l = valid_l & shard_rows(kp_mask) & (k_cnt_l > 0)
        feat_l = jnp.where(fv_l[:, None], feat_l, 0.0)
        return gather_rows(feat_l), gather_rows(fv_l)

    def shot_side(xyz, normal, valid, kp_mask):
        """SHOT-352 (shipped descriptor) with the QUERY rows tp-sharded:
        frames + neighbor query + histogram on the local row shard, then
        an all_gather — identical math to the single-device shot_side in
        register_pair_step (the grid is built over the replicated cloud,
        so per-row results do not depend on the shard split)."""
        from lidar_global_registration_tpu.ops import lrf as lrfmod
        from lidar_global_registration_tpu.ops.shot import shot as shot_full

        xyz_l, valid_l = shard_rows(xyz), shard_rows(valid)
        normal_l, kp_l = shard_rows(normal), shard_rows(kp_mask)
        frames_l = fb_l = None
        if cfg.lrf == "gravity":
            frames_l, fb_l = lrfmod.gravity_lrf(normal_l)
        feat_l, fv_l = shot_full(
            xyz_l, valid_l & kp_l, xyz, normal, valid, feature_radius,
            frames=frames_l, fallback_mask=fb_l,
            k_neighbors=cfg.shot_k, cap=cfg.shot_cap, chunk=cfg.query_chunk,
        )
        return gather_rows(feat_l), gather_rows(fv_l)

    src_normal, src_kp, dens_s = side(src_xyz, src_valid, iss_radius_src,
                                      vps[0])
    tgt_normal, tgt_kp, dens_t = side(tgt_xyz, tgt_valid, iss_radius_tgt,
                                      vps[1])
    if cfg.descriptor == "shot":
        fq, fqv = shot_side(src_xyz, src_normal, src_valid, src_kp)
        ft, ftv = shot_side(tgt_xyz, tgt_normal, tgt_valid, tgt_kp)
    else:
        fq, fqv = fpfh_side(src_xyz, src_normal, src_valid, src_kp)
        ft, ftv = fpfh_side(tgt_xyz, tgt_normal, tgt_valid, tgt_kp)

    # ---- tp split of the train side for matching ----
    ft_l = jax.lax.dynamic_slice_in_dim(ft, ti * shard, shard, axis=0)
    ftv_l = jax.lax.dynamic_slice_in_dim(ftv, ti * shard, shard, axis=0)
    fq_l = jax.lax.dynamic_slice_in_dim(fq, ti * shard, shard, axis=0)
    fqv_l = jax.lax.dynamic_slice_in_dim(fqv, ti * shard, shard, axis=0)

    idx_st, dist_st, mask_st = match_bf_tp(
        fq, ft_l, fqv, ftv_l, 1, cfg.match_tile, cfg.bf16_matching, "tp"
    )
    idx_ts, _d, mask_ts = match_bf_tp(
        ft, fq_l, ftv, fqv_l, 1, cfg.match_tile, cfg.bf16_matching, "tp"
    )
    clustered = bool(cfg.use_iss and cfg.cluster_matching)
    if clustered:
        # the reference's default spatial-consensus filter, with the
        # keypoint self-kNNs tp-sharded over the train rows; the filter
        # body is shared with the single-device step (_cluster_filter_rows)
        def knn_self(pts, v, k, approx):
            pts_l, v_l = shard_rows(pts), shard_rows(v)
            return match_bf_tp(
                pts, pts_l, v, v_l, k, cfg.cluster_knn_tile,
                False, "tp", approx=approx, exclude_self=True,
            )

        mask_st, dens_s, dens_t = fs._cluster_filter_rows(
            src_xyz, fqv, tgt_xyz, ftv,
            idx_st, mask_st, idx_ts, mask_ts, dens_s, dens_t, cfg, knn_self,
        )
    j = idx_st[:, 0]
    mutual = mask_st[:, 0]
    if not clustered:
        mutual = mutual & mask_ts[j, 0] & (
            idx_ts[j, 0] == jnp.arange(N, dtype=jnp.int32)
        )

    thr = jnp.minimum(jnp.maximum(dens_s, dens_t[j]), distance_thr)
    thr = jnp.where(thr > 0, thr, distance_thr)

    # shared solver: identical round body + normalized metric as the
    # single-chip paths (models/flagship.py:ransac_solve)
    out = fs.ransac_solve(src_xyz, tgt_xyz[j], thr, mutual, key, cfg)
    return out["transformation"], out["inliers"], out["n_correspondences"]


def make_register_batch(mesh: Mesh, cfg: FlagshipConfig = FlagshipConfig()):
    """Build the jitted sharded batch-registration step.

    Inputs: src/tgt [B, N, 3] + valid [B, N] sharded over dp; scalars [B, 7]
    per-pair (normal_cell, density cells, iss radii, feature_radius,
    distance_thr); keys [B, 2] u32; vps [B, 2, 3] scanner viewpoints
    (src, tgt) for frame-consistent normal orientation.
    Returns (T [B,4,4], inliers [B], n_corr [B])."""

    def shard_fn(sx, sv, tx, tv, keys, scalars, vps):
        def one(args):
            sxi, svi, txi, tvi, ki, sci, vpi = args
            return _pair_step_tp(sxi, svi, txi, tvi, ki, tuple(sci), vpi, cfg)

        return jax.lax.map(one, (sx, sv, tx, tv, keys, scalars, vps))

    spec_b = P("dp")
    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(spec_b, spec_b, spec_b, spec_b, spec_b, spec_b, spec_b),
        out_specs=(spec_b, spec_b, spec_b),
        check_vma=False,
    )
    return jax.jit(fn)
