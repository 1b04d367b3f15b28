"""Descriptor-space k-NN matching: tiled distance matmul + running top-k.

Reference kernels (include/matching.h:562-678):
  - matchBF:    OpenCV BFMatcher(NORM_L2) over block_size x block_size tiles,
                merged with an insertion-sorted k-list.
  - matchFLANN: kd-tree k-NN per query in descriptor space.
  - matchLocal: guess-guided 3D radius search re-ranked by descriptor L2.

TPU re-design: descriptor k-NN is a dense problem — ||q - t||^2 =
|q|^2 + |t|^2 - 2 q.t, where q.t is an MXU matmul.  One kernel replaces both
BF and FLANN (they must agree index-for-index; the reference's own
flann_bf_matcher test demands it).  The block merge
(updateMultivaluedCorrespondence, common.cpp:517-529) becomes a running
top-k carried through a lax.scan over train tiles.  matchLocal keeps the 3D
grid query but ranks candidates with one batched gather + top-k.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from lidar_global_registration_tpu.ops import grid as gridmod

BIG = 3.0e38  # plain float: module import must not initialize a backend


def _pad_rows(x, mult):
    n = x.shape[0]
    pad = (-n) % mult
    if pad == 0:
        return x
    return jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)


def _use_pallas() -> bool:
    """Fused Pallas 1-NN on TPU backends (default ON; LGR_PALLAS=0 to force
    the XLA scan path).  Measured 8.7x over the XLA path at 256k x 256k x 33
    (0.23s vs 1.96s on v5e) with exact index agreement — the XLA path
    streams the [Nq, tile] distance matrix through HBM, the kernel keeps it
    in VMEM."""
    import os

    if os.environ.get("LGR_PALLAS", "1") == "0":
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


@partial(jax.jit, static_argnames=("k", "tile", "bf16", "approx",
                                   "exclude_diag"))
def match_bf(
    query: jax.Array,
    train: jax.Array,
    qvalid: jax.Array,
    tvalid: jax.Array,
    k: int = 1,
    tile: int = 4096,
    bf16: bool = False,
    approx: bool = False,
    exclude_diag: bool = False,
    exclude_ids: jax.Array | None = None,
    id_offset=0,
):
    """Exact k-NN in descriptor space (L2), tiled over the train set.

    query f32[Nq,D], train f32[Nt,D] -> (idx i32[Nq,k], dist f32[Nq,k],
    mask bool[Nq,k]); distances are euclidean (sqrt), matching the reference's
    BF (NORM_L2) and FLANN (sqrt'd) conventions (matching.h:586-588,612).

    exclude_ids i32[Nq] + id_offset: self-match exclusion when `train` is a
    SHARD of the query set (tensor-parallel same-set kNN) — a train row is
    excluded for query q when id_offset + its local id == exclude_ids[q].
    exclude_diag is the same-set single-shard sugar (ids == row index).

    With LGR_PALLAS=1 on TPU the k=1 hot path uses the fused Pallas kernel
    (ops/pallas/topk_l2.py): the distance tile never leaves VMEM.
    """
    # D cap: at 1024-row tiles a 1960-d USC tile alone is 8MB of VMEM;
    # wide descriptors stay on the XLA path
    if (k == 1 and not bf16 and not exclude_diag and exclude_ids is None
            and query.shape[1] <= 512 and _use_pallas()):
        from lidar_global_registration_tpu.ops.pallas.topk_l2 import nn_l2_pallas

        i1, d1, m1 = nn_l2_pallas(
            query, train, qvalid, tvalid, tile_q=1024, tile_t=1024
        )
        return i1[:, None], d1[:, None], m1[:, None]
    Nq, D = query.shape
    Nt = train.shape[0]
    trainp = _pad_rows(train, tile)
    tvalidp = _pad_rows(tvalid.astype(jnp.int32), tile).astype(bool)
    n_tiles = trainp.shape[0] // tile

    qn = jnp.sum(query * query, axis=1)  # [Nq]
    qm = query.astype(jnp.bfloat16) if bf16 else query

    def step(carry, it):
        best_d, best_i = carry
        tb = jax.lax.dynamic_slice_in_dim(trainp, it * tile, tile, axis=0)
        vb = jax.lax.dynamic_slice_in_dim(tvalidp, it * tile, tile, axis=0)
        tn = jnp.sum(tb * tb, axis=1)
        tm = tb.astype(jnp.bfloat16) if bf16 else tb
        dots = jnp.dot(qm, tm.T, preferred_element_type=jnp.float32)
        d2 = qn[:, None] + tn[None, :] - 2.0 * dots
        d2 = jnp.maximum(d2, 0.0)
        d2 = jnp.where(vb[None, :], d2, BIG)
        ids = it * tile + jnp.arange(tile, dtype=jnp.int32)
        if exclude_diag or exclude_ids is not None:
            # self-match exclusion BY ID for same-set kNN (query is train):
            # positional "column 0 is self" breaks under approximate
            # merges and under exact ties
            self_ids = (
                jnp.arange(Nq, dtype=jnp.int32) if exclude_ids is None
                else exclude_ids
            )
            d2 = jnp.where(
                (jnp.asarray(id_offset, jnp.int32) + ids)[None, :]
                == self_ids[:, None],
                BIG, d2,
            )
        if approx and k > 1 and tile > 4 * k:
            # per-tile TPU PartialReduce (approx_max_k, recall ~0.95 within
            # the tile) then an EXACT 2k merge: lax.top_k over the raw
            # [Nq, k + tile] concat lowers to a full per-row sort on TPU —
            # measured as the dominant term of the 10M cluster kNN (36
            # scan steps x sort(4137) per row).  Opt-in: consensus votes
            # tolerate a ~0.95-recall neighbor set, parity paths do not.
            tneg, tsel = jax.lax.approx_max_k(-d2, k)
            cat_d = jnp.concatenate([best_d, -tneg], axis=1)
            cat_i = jnp.concatenate([best_i, ids[tsel]], axis=1)
        else:
            # merge with running best
            cat_d = jnp.concatenate([best_d, d2], axis=1)
            cat_i = jnp.concatenate(
                [best_i, jnp.broadcast_to(ids[None], d2.shape)], axis=1
            )
        neg, sel = jax.lax.top_k(-cat_d, k)
        return (-neg, jnp.take_along_axis(cat_i, sel, axis=1)), None

    init = (jnp.full((Nq, k), BIG), jnp.zeros((Nq, k), jnp.int32))
    (best_d, best_i), _ = jax.lax.scan(step, init, jnp.arange(n_tiles, dtype=jnp.int32))
    mask = (best_d < BIG) & qvalid[:, None]
    best_i = jnp.where(best_i < Nt, best_i, 0)
    dist = jnp.sqrt(jnp.maximum(jnp.where(mask, best_d, BIG), 0.0))
    return jnp.where(mask, best_i, 0), dist, mask


def match_local(
    query_xyz: jax.Array,
    qvalid: jax.Array,
    query_feats: jax.Array,
    train_xyz: jax.Array,
    tvalid: jax.Array,
    train_feats: jax.Array,
    guess: jax.Array,
    search_radius,
    k: int = 1,
    cand: int = 64,
    cap: int = 32,
):
    """Guess-guided local matching (matching.h:637-678).

    Transforms queries by `guess`, takes 3D candidates within `search_radius`
    around each transformed query from the train cloud, and ranks them by
    descriptor L2.  Returns (idx, dist, mask) like match_bf."""
    R, t = guess[:3, :3], guess[:3, 3]
    tq = jnp.einsum("ij,nj->ni", R, query_xyz,
                    precision=jax.lax.Precision.HIGHEST) + t
    g = gridmod.build_grid(train_xyz, tvalid, jnp.maximum(search_radius, 1e-12), cell_cap=cap)
    cidx, _cdist, cmask = gridmod.radius_neighbors(
        g, tq, qvalid, search_radius, k=cand, cap=cap
    )
    cf = train_feats[cidx]  # [Nq, cand, D]
    d2 = jnp.sum((cf - query_feats[:, None, :]) ** 2, axis=-1)
    d2 = jnp.where(cmask, d2, BIG)
    neg, sel = jax.lax.top_k(-d2, k)
    dist2 = -neg
    idx = jnp.take_along_axis(cidx, sel, axis=1)
    mask = jnp.take_along_axis(cmask, sel, axis=1) & (dist2 < BIG)
    return jnp.where(mask, idx, 0), jnp.sqrt(jnp.maximum(dist2, 0.0)), mask
