"""Pallas TPU kernel: batched contiguous-run gather.

The grid-hash neighbor search reads, for every query, 27 CONTIGUOUS runs of
`cap` slots from cell-sorted point arrays.  XLA lowers that to a scalar
element gather (~400 MB/s effective — it cannot exploit run contiguity);
this kernel issues one dynamic-slice VECTOR load per run instead, which is
the difference between scalar and vector memory on TPU.

Tables must fit VMEM per program invocation; the caller keeps them whole
(point arrays up to ~2M f32 values) and Pallas streams the `starts` tiles.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(starts_ref, table_ref, out_ref):
    rt = out_ref.shape[0]

    def body(i, _):
        s = starts_ref[i, 0]
        out_ref[i, :] = table_ref[0, pl.ds(s, out_ref.shape[1])]
        return 0

    jax.lax.fori_loop(0, rt, body, 0)


@partial(jax.jit, static_argnames=("cap", "run_tile", "interpret"))
def gather_runs_pallas(
    table: jax.Array,
    starts: jax.Array,
    cap: int,
    run_tile: int = 2048,
    interpret: bool = False,
):
    """table f32/i32[NP]; starts i32[R] -> out [R, cap] with
    out[r, j] = table[starts[r] + j].

    `table` must already be padded so starts + cap stays in bounds; reads are
    done in 128-lane-aligned windows internally."""
    R = starts.shape[0]
    capk = max(128, ((cap + 127) // 128) * 128)
    NP = table.shape[0]
    # pad table so any start + capk is in range
    tpad = jnp.concatenate([table, jnp.zeros((capk,), table.dtype)])
    pad_r = (-R) % run_tile
    sp = jnp.pad(starts, (0, pad_r))
    grid = (sp.shape[0] // run_tile,)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((run_tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NP + capk), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((run_tile, capk), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((sp.shape[0], capk), table.dtype),
        interpret=interpret,
    )(sp[:, None], tpad[None, :])
    return out[:R, :cap]
