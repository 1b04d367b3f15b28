"""Pallas TPU kernel: fused L2 nearest-neighbor over a descriptor database.

The descendant of the reference's block-tiled OpenCV BFMatcher
(matching.h:594-634): distances ||q - t||^2 = |q|^2 + |t|^2 - 2 q.t where
q.t rides the MXU; the running argmin lives in VMEM scratch so the [Nq, Nt]
distance matrix never touches HBM.  Grid = query tiles; the train set is
streamed tile-by-tile inside the kernel (Pallas pipelines the HBM->VMEM
copies across grid steps via the BlockSpec index maps).

k = 1 specialization (`randomness: 1` is the only value the reference
supports end-to-end); general k falls back to the XLA scan path in
ops.matchers.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 3.0e38


def _nn_kernel(q_ref, t_ref, qn_ref, tn_ref, dist_ref, idx_ref, best_d, best_i):
    """One (query-tile, train-tile) grid step: update the running argmin."""
    ti = pl.program_id(1)
    n_t = pl.num_programs(1)

    @pl.when(ti == 0)
    def _init():
        best_d[:] = jnp.full_like(best_d, BIG)
        best_i[:] = jnp.zeros_like(best_i)

    dots = jnp.dot(q_ref[:], t_ref[:].T, preferred_element_type=jnp.float32)
    d2 = qn_ref[:] + tn_ref[:].reshape(1, -1) - 2.0 * dots  # [TQ, TT]
    tt = d2.shape[1]
    cols = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1) + ti * tt
    tile_min = jnp.min(d2, axis=1, keepdims=True)
    tile_arg = jnp.min(jnp.where(d2 == tile_min, cols, jnp.int32(2**31 - 1)), axis=1, keepdims=True)
    better = tile_min[:, 0] < best_d[:, 0]
    best_i[:, 0] = jnp.where(better, tile_arg[:, 0], best_i[:, 0])
    best_d[:, 0] = jnp.where(better, tile_min[:, 0], best_d[:, 0])

    @pl.when(ti == n_t - 1)
    def _emit():
        dist_ref[:] = best_d[:]
        idx_ref[:] = best_i[:]


@partial(jax.jit, static_argnames=("tile_q", "tile_t", "interpret"))
def nn_l2_pallas(
    query: jax.Array,
    train: jax.Array,
    qvalid: jax.Array,
    tvalid: jax.Array,
    tile_q: int = 256,
    tile_t: int = 1024,
    interpret: bool = False,
):
    """Exact 1-NN (squared-L2 argmin) of each query against the train set.

    query f32[Nq,D], train f32[Nt,D] (padded to tile multiples internally).
    Returns (idx i32[Nq], dist f32[Nq] euclidean, mask bool[Nq])."""
    Nq, D = query.shape
    Nt = train.shape[0]
    pad_q = (-Nq) % tile_q
    pad_t = (-Nt) % tile_t
    qp = jnp.pad(query, ((0, pad_q), (0, 0)))
    tp = jnp.pad(train, ((0, pad_t), (0, 0)))
    qv = jnp.pad(qvalid, (0, pad_q))
    tv = jnp.pad(tvalid, (0, pad_t))
    qn = jnp.sum(qp * qp, axis=1, keepdims=True)  # [Nq,1]
    tn = jnp.sum(tp * tp, axis=1, keepdims=True)
    tn = jnp.where(tv[:, None], tn, BIG)  # invalid train rows never win

    nq, nt = qp.shape[0] // tile_q, tp.shape[0] // tile_t
    dist2, idx = pl.pallas_call(
        _nn_kernel,
        grid=(nq, nt),
        in_specs=[
            pl.BlockSpec((tile_q, D), lambda qi, ti: (qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_t, D), lambda qi, ti: (ti, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, 1), lambda qi, ti: (qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_t, 1), lambda qi, ti: (ti, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_q, 1), lambda qi, ti: (qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, 1), lambda qi, ti: (qi, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((qp.shape[0], 1), jnp.float32),
            jax.ShapeDtypeStruct((qp.shape[0], 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_q, 1), jnp.float32),
            pltpu.VMEM((tile_q, 1), jnp.int32),
        ],
        interpret=interpret,
    )(qp, tp, qn, tn)
    dist2 = dist2[:Nq, 0]
    idx = idx[:Nq, 0]
    mask = qv[:Nq] & (dist2 < BIG / 2) & (idx < Nt)
    dist = jnp.sqrt(jnp.maximum(jnp.where(mask, dist2, BIG), 0.0))
    return jnp.where(mask, idx, 0), dist, mask
