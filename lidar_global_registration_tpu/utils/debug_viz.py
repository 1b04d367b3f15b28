"""Debug PLY/CSV artifact writers.

Reference: the debug-save half of src/common.cpp (757-1266): colorized
clouds, keypoint/correspondence/inlier coloring, GT-aligned side-by-side
correspondence clouds with edge faces, distance / normal-difference
temperature maps with histograms, colorized weights.  Histogram PNGs are
emitted through matplotlib when available instead of shelling out to
plots.py (common.cpp:852-857).
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax.numpy as jnp

from lidar_global_registration_tpu.ops import grid as gridmod
from lidar_global_registration_tpu.types import (
    AlignmentParameters,
    Cloud,
    Correspondences,
    DIST_TO_PLANE_COEFFICIENT,
)
from lidar_global_registration_tpu.utils import io as iomod
from lidar_global_registration_tpu.utils.naming import construct_path

COLOR_BEIGE = 0xF8C471
COLOR_PURPLE = 0xAF7AC5
COLOR_RED = 0xFF0000
COLOR_PARAKEET = 0x03C04A
COLOR_ROSE = 0xE3242B
COLOR_BLUE = 0x0000FF
COLOR_WHITE = 0xFFFFFF


def _rgb(color: int) -> np.ndarray:
    return np.array(
        [(color >> 16) & 0xFF, (color >> 8) & 0xFF, color & 0xFF], np.uint8
    )


def _cloud_np(cloud: Cloud):
    v = np.asarray(cloud.valid)
    return np.asarray(cloud.xyz)[v], np.asarray(cloud.normal)[v], v


def temperature_color(v, vmin, vmax):
    """getColor blue->green->red ramp (common.cpp:818-835), vectorized."""
    v = np.clip(v, vmin, vmax)
    dv = max(vmax - vmin, 1e-30)
    r = np.ones_like(v)
    g = np.ones_like(v)
    b = np.ones_like(v)
    s1 = v < (vmin + dv / 3)
    s2 = (~s1) & (v < vmin + 2 * dv / 3)
    s3 = ~(s1 | s2)
    b = np.where(s1, 1 - 3 * (v - vmin) / dv, np.where(s2, 0.0, 0.0))
    g = np.where(s2, 2 - 3 * (v - vmin) / dv, np.where(s3, 0.0, g))
    r = np.where(s3, 3 - 3 * (v - vmin) / dv, r)
    return np.stack([r, g, b], axis=1) * 255.0


def save_colorized_cloud(cloud: Cloud, transformation_gt, color: int, filepath: str):
    """saveColorizedPointCloud (common.cpp:757-769)."""
    moved = cloud.transformed(jnp.asarray(np.asarray(transformation_gt, np.float32)))
    xyz, nrm, _ = _cloud_np(moved)
    col = np.tile(_rgb(color), (len(xyz), 1))
    iomod.write_ply(filepath, xyz, normal=nrm, color=col)


def save_cloud_with_correspondences(
    cloud: Cloud,
    key_point_indices: Optional[np.ndarray],
    correspondences: Optional[Correspondences],
    correct_mask: Optional[np.ndarray],
    inlier_mask: Optional[np.ndarray],
    params: AlignmentParameters,
    transformation_gt,
    is_source: bool,
):
    """savePointCloudWithCorrespondences (common.cpp:771-816)."""
    moved = cloud.transformed(jnp.asarray(np.asarray(transformation_gt, np.float32)))
    xyz = np.asarray(moved.xyz)
    nrm = np.asarray(moved.normal)
    valid = np.asarray(moved.valid)
    n = len(xyz)
    col = np.tile(_rgb(COLOR_PARAKEET if key_point_indices is not None else COLOR_BEIGE), (n, 1))
    if key_point_indices is not None:
        col[key_point_indices] = _rgb(COLOR_BEIGE)
    if correspondences is not None:
        d = correspondences.to_numpy()
        ids = d["query"] if is_source else d["match"]
        col[ids] = _rgb(COLOR_RED)
        if inlier_mask is not None:
            col[ids[inlier_mask[: len(ids)]]] = _rgb(COLOR_BLUE)
        if correct_mask is not None:
            sel = ids[correct_mask[: len(ids)]]
            col[sel] = col[sel] // 2 + _rgb(COLOR_WHITE) // 2
    path = construct_path(
        params, "downsampled_" + ("src" if is_source else "tgt"), "ply",
        True, True, True, True,
    )
    iomod.write_ply(path, xyz[valid], normal=nrm[valid], color=col[valid])
    return path


def save_colorized_weights(cloud: Cloud, weights: np.ndarray, name: str,
                           params: AlignmentParameters, transformation):
    """saveColorizedWeights (common.cpp:837-850), 1%/99% quantile ramp."""
    from lidar_global_registration_tpu.ops.weights import _quantile

    moved = cloud.transformed(jnp.asarray(np.asarray(transformation, np.float32)))
    xyz, nrm, v = _cloud_np(moved)
    w = np.asarray(weights)[v]
    lo = _quantile(w, 0.01)
    hi = _quantile(w, 0.99)
    col = temperature_color(w, lo, hi).astype(np.uint8)
    path = construct_path(params, name, "ply", True, True, True, True)
    iomod.write_ply(path, xyz, normal=nrm, color=col)
    return path


def save_correspondence_edges(
    src: Cloud,
    tgt: Cloud,
    corrs: Correspondences,
    transformation_gt,
    params: AlignmentParameters,
    sparse: bool = False,
    max_edges: int = 100,
):
    """saveCorrespondences (common.cpp:1019-1060): GT-aligned src and
    x-offset tgt side by side, one triangle face per correspondence edge."""
    from lidar_global_registration_tpu.ops.downsample import aabb_diagonal

    moved = src.transformed(jnp.asarray(np.asarray(transformation_gt, np.float32)))
    sxyz = np.asarray(moved.xyz)
    snrm = np.asarray(moved.normal)
    sv = np.asarray(moved.valid)
    txyz = np.asarray(tgt.xyz).copy()
    tnrm = np.asarray(tgt.normal)
    tv = np.asarray(tgt.valid)
    diag = float(np.asarray(aabb_diagonal(moved)))
    txyz[:, 0] += diag

    d = corrs.to_numpy()
    rng = np.random.default_rng(566)
    order = np.arange(len(d["query"]))
    if sparse and len(order) > max_edges:
        order = rng.permutation(order)[:max_edges]

    xyz = np.concatenate([sxyz[sv], txyz[tv]], axis=0)
    nrm = np.concatenate([snrm[sv], tnrm[tv]], axis=0)
    col = np.concatenate(
        [
            np.tile(_rgb(COLOR_BEIGE), (sv.sum(), 1)),
            np.tile(_rgb(COLOR_PURPLE), (tv.sum(), 1)),
        ]
    )
    # remap indices into the compacted concatenation
    smap = np.cumsum(sv) - 1
    tmap = np.cumsum(tv) - 1 + sv.sum()
    edge_colors = rng.integers(0, 256, size=(len(order), 3))
    faces = []
    # midpoints appended as extra vertices so each edge is a degenerate tri
    mids = []
    for e, o in enumerate(order):
        qi, mi = d["query"][o], d["match"][o]
        a = int(smap[qi])
        b = int(tmap[mi])
        col[a] = edge_colors[e]
        col[b] = edge_colors[e]
        mids.append((xyz[a] + xyz[b]) / 2)
        faces.append([a, b, len(xyz) + len(mids) - 1])
    if mids:
        xyz = np.concatenate([xyz, np.array(mids, np.float32)], axis=0)
        nrm = np.concatenate([nrm, np.zeros((len(mids), 3), np.float32)], axis=0)
        col = np.concatenate([col, np.full((len(mids), 3), 255, np.uint8)], axis=0)
    name = "correspondences_sparse" if sparse else "correspondences"
    path = construct_path(params, name)
    iomod.write_ply(
        path, xyz, normal=nrm, color=col, binary=False,
        faces=np.array(faces, np.int64) if faces else None,
    )
    return path


def save_temperature_maps(
    src: Cloud,
    tgt: Cloud,
    name: str,
    params: AlignmentParameters,
    distance_thr: float,
    transformation,
):
    """saveTemperatureMaps (common.cpp:859-963): distance and
    normal-difference temperature maps both directions + histograms."""
    moved = src.transformed(jnp.asarray(np.asarray(transformation, np.float32)))
    outputs = []
    radius = DIST_TO_PLANE_COEFFICIENT * distance_thr
    for tag, compared, reference in (("src", moved, tgt), ("tgt", tgt, moved)):
        g = gridmod.build_grid(reference.xyz, reference.valid, max(radius, 1e-12), cell_cap=64)
        idx, dist, mask = gridmod.radius_neighbors(
            g, compared.xyz, compared.valid, radius, k=1, cap=64
        )
        nn = np.asarray(idx[:, 0])
        found = np.asarray(mask[:, 0])
        cxyz = np.asarray(compared.xyz)
        cnrm = np.asarray(compared.normal)
        rxyz = np.asarray(reference.xyz)[nn]
        rnrm = np.asarray(reference.normal)[nn]
        d2p = np.abs(np.sum(rnrm * (rxyz - cxyz), axis=-1))
        nrm_ok = np.sum(rnrm * rnrm, axis=-1) > 0.5
        # degenerate-normal fallback: plain NN distance; not-found rows carry
        # a BIG sentinel, so substitute before use (no overflow, same units)
        d_nn = np.where(found, np.asarray(dist[:, 0]), distance_thr)
        d2p = np.where(nrm_ok, d2p, d_nn)
        temp = np.where(found & (d2p < distance_thr), d2p, distance_thr)

        v = np.asarray(compared.valid)
        col = temperature_color(temp, 0.0, distance_thr).astype(np.uint8)
        p1 = construct_path(params, f"{name}_dists_{tag}")
        iomod.write_ply(p1, cxyz[v], normal=cnrm[v], color=col[v])
        outputs.append(p1)

        # distances csv + histogram png
        dists_in = temp[v & (temp < distance_thr)]
        csvp = construct_path(params, f"{name}_distances_{tag}", "csv")
        with open(csvp, "w") as f:
            f.write("value\n")
            for x in dists_in:
                f.write(f"{x:g}\n")
        _histogram_png(dists_in, construct_path(params, f"{name}_histogram_{tag}", "png"))

        # normal difference map
        cos = np.clip(np.sum(cnrm * rnrm, axis=-1), -1, 1)
        nd = np.abs(np.arccos(cos))
        nd = np.where(found & (d2p < distance_thr) & nrm_ok, nd, np.pi / 2)
        nd = np.minimum(nd, np.pi / 2)
        coln = temperature_color(nd, 0.0, np.pi / 2).astype(np.uint8)
        p2 = construct_path(params, f"{name}_normal_diffs_{tag}")
        iomod.write_ply(p2, cxyz[v], normal=cnrm[v], color=coln[v])
        outputs.append(p2)
    return outputs


def _histogram_png(values, path):
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(4, 3))
        if len(values):
            ax.hist(values, bins=50)
        fig.savefig(path)
        plt.close(fig)
    except Exception:
        pass  # plotting is best-effort, like the reference's system() call


def save_features_csv(features, feat_valid, indices, filepath):
    """saveFeatures (include/feature_analysis.h:11-27): one row per
    descriptor: index,val0,...,valD."""
    f32 = np.asarray(features)
    v = np.asarray(feat_valid)
    os.makedirs(os.path.dirname(filepath) or ".", exist_ok=True)
    with open(filepath, "w") as f:
        for i in range(len(f32)):
            if not v[i]:
                continue
            row = [str(indices[i] if indices is not None else i)]
            row += [f"{x:g}" for x in f32[i]]
            f.write(",".join(row) + "\n")


def save_vector_csv(values, filepath):
    with open(filepath, "w") as f:
        f.write("value\n")
        for x in values:
            f.write(f"{x:g}\n")


def save_normals(cloud: Cloud, transformation_gt, is_source: bool,
                 params: AlignmentParameters):
    """saveNormals (feature_analysis.cpp:11-18): GT-aligned cloud with
    normals as a binary PLY."""
    moved = cloud.transformed(jnp.asarray(np.asarray(transformation_gt, np.float32)))
    xyz, nrm, _ = _cloud_np(moved)
    path = construct_path(params, "normals_" + ("src" if is_source else "tgt"))
    iomod.write_ply(path, xyz, normal=nrm)
    return path


def save_extracted_point_ids(src: Cloud, tgt: Cloud, transformation_gt,
                             params: AlignmentParameters, extracted_xyz):
    """saveExtractedPointIds (feature_analysis.cpp:20-56): nearest point ids
    of `extracted_xyz` in the GT-aligned src and in tgt, with coordinates."""
    moved = src.transformed(jnp.asarray(np.asarray(transformation_gt, np.float32)))
    q = jnp.asarray(np.asarray(extracted_xyz, np.float32))
    qv = jnp.ones((len(extracted_xyz),), bool)

    def nn_ids(cloud):
        from lidar_global_registration_tpu.ops.density import _auto_cell_size

        cell = _auto_cell_size(cloud, 2)
        for _ in range(10):
            g = gridmod.build_grid(cloud.xyz, cloud.valid, cell, cell_cap=64)
            idx, _d, mask = gridmod.knn(g, q, qv, 1, cap=64)
            if bool(np.asarray(mask).all()):
                break
            cell *= 2.0
        return np.asarray(idx[:, 0])

    src_ids = nn_ids(moved)
    tgt_ids = nn_ids(tgt)
    path = construct_path(params, "ids", "csv")
    sxyz = np.asarray(moved.xyz)
    txyz = np.asarray(tgt.xyz)
    with open(path, "w") as f:
        f.write("id_src,id_tgt,x_src,x_tgt,y_src,y_tgt,z_src,z_tgt\n")
        for i in range(len(extracted_xyz)):
            s, t = src_ids[i], tgt_ids[i]
            f.write(
                f"{s},{t},{sxyz[s,0]:g},{txyz[t,0]:g},{sxyz[s,1]:g},"
                f"{txyz[t,1]:g},{sxyz[s,2]:g},{txyz[t,2]:g}\n"
            )
    return path
