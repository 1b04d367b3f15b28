"""A/B the SHOT histogram accumulation formulations at bench shapes.

_shot_hist's TPU path builds per-block one-hots and a BATCHED
[blk,32,5K] @ [blk,5K,11] dot (lax.map over row blocks) — measured
0.42 s at 16k x 512 (tools/profile_shot.py), far off the one-hot traffic
bound.  Candidates:
  mapped   — current lax.map-over-blocks batched dot
  onedot   — single batched dot_general, no lax.map
  binwide  — unweighted volume one-hot + weight on the bin side
             ([blk,32,5K] 0/1 @ [blk,5K,11] weighted)
Usage: python tools/profile_shot_hist.py [M] [K]
"""
from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

NRB = 11
NRV = 32


def t(label, fn):
    out = jax.block_until_ready(fn())
    np.asarray(jax.device_get(out.ravel()[:1]))
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn())
    np.asarray(jax.device_get(out.ravel()[:1]))
    print(f"  {label}: {time.perf_counter() - t0:.3f}s", flush=True)
    return out


@partial(jax.jit, static_argnames=("mode", "blk"))
def hist(vol, sbin, val, mode: str, blk: int = 512):
    M, K5 = vol.shape
    n_blk = -(-M // blk)
    pad = n_blk * blk - M
    vol_p = jnp.pad(vol, ((0, pad), (0, 0))).reshape(n_blk, blk, -1)
    bin_p = jnp.pad(sbin, ((0, pad), (0, 0))).reshape(n_blk, blk, -1)
    val_p = jnp.pad(val, ((0, pad), (0, 0))).reshape(n_blk, blk, -1)
    vols = jnp.arange(NRV, dtype=vol.dtype)
    bins = jnp.arange(NRB, dtype=vol.dtype)

    def _blk(args):
        v, b, w = args
        if mode == "binwide":
            voh = (v[:, None, :] == vols[None, :, None]).astype(jnp.float32)
            boh = jnp.where(b[:, :, None] == bins[None, None, :], w[:, :, None], 0.0)
        else:
            voh = jnp.where(v[:, None, :] == vols[None, :, None], w[:, None, :], 0.0)
            boh = (b[:, :, None] == bins[None, None, :]).astype(jnp.float32)
        return jax.lax.dot_general(
            voh, boh, (((2,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )

    if mode == "onedot":
        voh = jnp.where(
            vol_p[:, :, None, :].reshape(n_blk * blk, 1, K5)
            == vols[None, :, None], val_p.reshape(n_blk * blk, 1, K5), 0.0
        )
        boh = (
            bin_p.reshape(n_blk * blk, K5)[:, :, None] == bins[None, None, :]
        ).astype(jnp.float32)
        out = jax.lax.dot_general(
            voh, boh, (((2,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        return out.reshape(n_blk * blk, NRV * NRB)[:M]
    out = jax.lax.map(_blk, (vol_p, bin_p, val_p))
    return out.reshape(n_blk * blk, NRV * NRB)[:M]


def main():
    M = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    K5 = 5 * K
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.integers(0, NRV, (M, K5)), jnp.int32)
    sbin = jnp.asarray(rng.integers(0, NRB, (M, K5)), jnp.int32)
    val = jnp.asarray(rng.uniform(0, 1, (M, K5)), jnp.float32)
    print(f"# M={M} K5={K5}")
    ref = None
    for mode in ("mapped", "onedot", "binwide"):
        try:
            out = t(mode, lambda mode=mode: hist(vol, sbin, val, mode))
        except Exception as e:
            print(f"  {mode}: FAILED {type(e).__name__}: {e}")
            continue
        if ref is None:
            ref = np.asarray(out)
        else:
            err = np.abs(np.asarray(out) - ref).max()
            print(f"    maxerr vs mapped: {err:.2e}")
    for blk in (128, 2048):
        t(f"mapped blk={blk}", lambda blk=blk: hist(vol, sbin, val, "mapped", blk))


if __name__ == "__main__":
    main()
