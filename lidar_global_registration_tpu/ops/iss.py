"""ISS keypoint detection on neighbor lists.

Reference: common.cpp:657-691 configures pcl::ISSKeypoint3D (via the
ISSKeypoint3DDebug subclass, src/pcl/iss_debug.cpp) with
salient = non-max radius = iss_radius, gamma21 = gamma32 = 0.975,
min_neighbors = 4.  The PCL algorithm per point p:
  scatter = sum_j w_j (p_j - p)(p_j - p)^T / sum_j w_j over the salient
  neighborhood, w_j = 1 / |neighborhood(j)|; eigenvalues l1>=l2>=l3;
  saliency = l3 kept iff l2/l1 < g21 and l3/l2 < g32 and l3 > 0;
  keypoint iff saliency is a strict local max over the non-max radius with at
  least min_neighbors neighbors.

TPU re-design: one radius-neighbor pass feeds a batched scatter-matrix
einsum + closed-form eigenvalues; non-max suppression is a masked gather-max
over the same neighbor lists.  Neighbor counts are capped (the reference
itself caps via max_neighbors_, iss_debug.cpp:47-54).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from lidar_global_registration_tpu.ops import grid as gridmod
from lidar_global_registration_tpu.ops.eigen3 import eigvals_sym3
from lidar_global_registration_tpu.types import Cloud


@partial(jax.jit, static_argnames=("gamma21", "gamma32", "min_neighbors"))
def _iss_saliency(
    xyz, valid, idx, mask, counts, gamma21=0.975, gamma32=0.975, min_neighbors=4,
    query_xyz=None, query_valid=None,
):
    """Third-eigenvalue saliency per point given salient-radius neighbors.

    Per-coordinate gathers (SoA): [N,K,3] intermediates pad their last dim
    to 128 lanes on TPU.  query_xyz/query_valid decouple the query rows from
    the full cloud (the tp-sharded path computes a row shard per device:
    idx/mask are then [shard, K] while xyz/counts stay full-length)."""
    if query_xyz is None:
        query_xyz = xyz
    if query_valid is None:
        query_valid = valid
    valid = query_valid
    w = jnp.where(mask, 1.0 / jnp.maximum(counts[idx].astype(jnp.float32), 1.0), 0.0)
    wsum = jnp.sum(w, axis=1)
    diffs = [xyz[:, d][idx] - query_xyz[:, d][:, None] for d in range(3)]  # [Q,K] x3
    rows = []
    for i in range(3):
        row = []
        for j in range(3):
            if j < i:
                row.append(rows[j][i])
            else:
                row.append(jnp.sum(w * diffs[i] * diffs[j], axis=1))
        rows.append(row)
    cov = jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)
    cov = cov / jnp.maximum(wsum, 1e-30)[:, None, None]
    eig = eigvals_sym3(cov)  # ascending
    l3, l2, l1 = eig[:, 0], eig[:, 1], eig[:, 2]
    ok = (
        valid
        & (wsum > 0)
        & (l2 / jnp.maximum(l1, 1e-30) < gamma21)
        & (l3 / jnp.maximum(l2, 1e-30) < gamma32)
        & (l3 > 0)
    )
    return jnp.where(ok, l3, 0.0), ok


@partial(jax.jit, static_argnames=("min_neighbors",))
def _nms(saliency, ok, idx, mask, min_neighbors=4, query_saliency=None):
    """query_saliency: per-query-row saliency when idx covers only a row
    shard (tp path); `saliency` stays the full-length array for the
    neighbor gather."""
    if query_saliency is None:
        query_saliency = saliency
    nb_sal = jnp.where(mask, saliency[idx], -jnp.inf)
    nb_max = jnp.max(nb_sal, axis=1)
    n_nb = jnp.sum(mask, axis=1)
    # strict local max over the non-max neighborhood (self excluded from idx)
    is_kp = ok & (n_nb >= min_neighbors) & (query_saliency > nb_max)
    return is_kp


def iss_keypoints(
    cloud: Cloud,
    iss_radius: float,
    gamma21: float = 0.975,
    gamma32: float = 0.975,
    min_neighbors: int = 4,
    cap_per_cell: int = 32,
    k_neighbors: int = 64,
    chunk: int | None = None,
):
    """Returns (is_keypoint bool[N], saliency f32[N]).

    Keypoint *indices* (sorted, as the reference does under fix_seed,
    common.cpp:674-676) are recovered host-side by np.nonzero.  On TPU
    backends the fused cell-list kernels (ops/pallas/cellgrid.py) replace
    the XLA grid queries (parity tests: tests/test_cell_iss.py); set
    LGR_CELL_ISS=0 to force the XLA path."""
    import os

    try:
        on_tpu = jax.default_backend() in ("tpu", "axon")
    except Exception:
        on_tpu = False
    if on_tpu and os.environ.get("LGR_CELL_ISS", "1") != "0":
        from lidar_global_registration_tpu.ops.pallas.cellgrid import iss_cells

        try:
            return iss_cells(
                cloud.xyz, cloud.valid, iss_radius,
                gamma21=gamma21, gamma32=gamma32, min_neighbors=min_neighbors,
            )
        except ValueError:
            pass  # occupancy beyond the kernel cap: XLA fallback below
    g = gridmod.build_grid(cloud.xyz, cloud.valid, iss_radius, cell_cap=cap_per_cell)
    qidx = jnp.arange(cloud.capacity, dtype=jnp.int32)
    idx, _dist, mask = gridmod.radius_neighbors(
        g,
        cloud.xyz,
        cloud.valid,
        iss_radius,
        k=k_neighbors,
        cap=cap_per_cell,
        include_self=False,
        query_index=qidx,
        chunk=chunk,
    )
    counts = jnp.sum(mask, axis=1).astype(jnp.int32) + 1  # |neighborhood| incl self
    saliency, ok = _iss_saliency(
        cloud.xyz, cloud.valid, idx, mask, counts, gamma21, gamma32, min_neighbors
    )
    is_kp = _nms(saliency, ok, idx, mask, min_neighbors)
    return is_kp, saliency


def detect_keypoints(cloud: Cloud, keypoint_id: str, iss_radius: float, **kw):
    """detectKeyPoints equivalent (common.cpp:657-691): 'iss' or 'any'.

    Returns sorted keypoint indices as a host numpy array."""
    valid = np.asarray(cloud.valid)
    if keypoint_id == "iss":
        is_kp, _ = iss_keypoints(cloud, iss_radius, **kw)
        return np.nonzero(np.asarray(is_kp) & valid)[0].astype(np.int32)
    return np.nonzero(valid)[0].astype(np.int32)


def subvoxel_iss_keypoints(
    cloud: Cloud,
    iss_radius: float,
    max_keypoints: int = 10,
    **kw,
):
    """ISS keypoints refined to sub-voxel positions via quadric saliency
    fitting (iss_debug.cpp:171-219 + quadric.cpp; the reference refines the
    first 10 sorted keypoints with their 6 nearest neighbors).

    Returns (refined f32[n,3], indices i32[n], ok bool[n])."""
    import jax.numpy as jnp

    from lidar_global_registration_tpu.ops.quadric import subvoxel_keypoints

    g = gridmod.build_grid(
        cloud.xyz, cloud.valid, iss_radius, cell_cap=kw.get("cap_per_cell", 32)
    )
    qidx = jnp.arange(cloud.capacity, dtype=jnp.int32)
    idx, _dist, mask = gridmod.radius_neighbors(
        g,
        cloud.xyz,
        cloud.valid,
        iss_radius,
        k=kw.get("k_neighbors", 64),
        cap=kw.get("cap_per_cell", 32),
        include_self=False,
        query_index=qidx,
    )
    counts = jnp.sum(mask, axis=1).astype(jnp.int32) + 1
    saliency, ok = _iss_saliency(cloud.xyz, cloud.valid, idx, mask, counts)
    is_kp = _nms(saliency, ok, idx, mask)
    kp_idx = np.nonzero(np.asarray(is_kp) & np.asarray(cloud.valid))[0]
    kp_idx = np.sort(kp_idx)[:max_keypoints].astype(np.int32)
    if len(kp_idx) == 0:
        return np.zeros((0, 3), np.float32), kp_idx, np.zeros((0,), bool)

    # 6 nearest neighbors (including self) for the quadric fit
    nidx, ndist, nmask = gridmod.knn(
        g, cloud.xyz[jnp.asarray(kp_idx)], jnp.ones((len(kp_idx),), bool), 6,
        cap=kw.get("cap_per_cell", 32), include_self=True,
    )
    # normals from a small PCA over the same neighbors
    from lidar_global_registration_tpu.ops.normals import normals_from_neighbors

    kp_xyz = cloud.xyz[jnp.asarray(kp_idx)]
    normal, _c, _o = normals_from_neighbors(kp_xyz, cloud.xyz, nidx, nmask)
    refined, rok = subvoxel_keypoints(
        kp_xyz,
        normal,
        cloud.xyz[nidx],
        saliency[nidx],
        nmask,
        iss_radius,
    )
    return np.asarray(refined), kp_idx, np.asarray(rok)
