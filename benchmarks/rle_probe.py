"""Micro-profile of device-side RLE formulations for the walk op stream.

The round-4 rle_pack_ops uses .at[].min/max scatters over the (B, T) op
matrix; this probe times it against scatter-free alternatives (top_k
boundary compaction) on the production walk shape, to decide whether the
RLE drain can ever beat the plain packed fetch (VERDICT r4 item 1).

Usage: python benchmarks/rle_probe.py
"""

from __future__ import annotations

import os as _os
import sys as _sys
import time

import numpy as np

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from sequencealigning_tpu.utils.compilecache import enable as _enable

_enable()

import jax
import jax.numpy as jnp

from sequencealigning_tpu.ops import traceback_device as tbd


def rle_pack_ops_scatter(packed, cap: int = tbd.RLE_CAP):
    """The round-4 .at[].min/max scatter formulation, kept here as the
    probe baseline (ops.traceback_device.rle_pack_ops is now the top_k
    compaction this probe proved 6-7.5x faster with equal outputs)."""
    B, W = packed.shape
    T = W * 16
    shift = (jnp.arange(16, dtype=jnp.uint32) * 2)[None, None, :]
    ops = ((packed[:, :, None] >> shift) & 3).reshape(B, T).astype(jnp.uint8)
    bnd = jnp.concatenate(
        [jnp.ones((B, 1), bool), ops[:, 1:] != ops[:, :-1]], axis=1
    )
    rid = jnp.cumsum(bnd.astype(jnp.int32), axis=1) - 1
    n_runs = rid[:, -1] + 1
    ridc = jnp.minimum(rid, cap - 1)
    rows = jnp.broadcast_to(jnp.arange(B)[:, None], (B, T))
    tv = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))
    starts = jnp.full((B, cap), T, jnp.int32).at[rows, ridc].min(tv)
    vals = jnp.zeros((B, cap), jnp.uint8).at[rows, ridc].max(ops)
    ends = jnp.concatenate(
        [starts[:, 1:], jnp.full((B, 1), T, jnp.int32)], axis=1
    )
    ends = jnp.minimum(ends, T)
    lens = jnp.clip(ends - starts, 0, T).astype(jnp.uint16)
    return vals, lens, n_runs


def _mk_packed(B, T, n_edits=20, seed=0):
    """Realistic walk op stream: long M runs split by single edits."""
    rng = np.random.default_rng(seed)
    ops = np.zeros((B, T), np.uint8)
    n_live = T // 2  # typical walk uses ~half of t_steps
    ops[:, :n_live] = 1  # M
    for b in range(B):
        cols = rng.integers(0, n_live, n_edits)
        ops[b, cols] = rng.integers(2, 4, n_edits)
    shifts = (np.arange(16, dtype=np.uint32) * 2)[None, None, :]
    return (ops.reshape(B, T // 16, 16).astype(np.uint32) << shifts).sum(
        axis=2, dtype=np.uint32
    )


def bench(fn, packed, name, reps=5):
    f = jax.jit(fn)
    out = f(packed)
    res = tuple(np.asarray(o) for o in out)  # force + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = f(packed)
        np.asarray(r[2])  # force a tiny read (n_runs) to sync
        ts.append(time.perf_counter() - t0)
    print(f"  {name}: {min(ts)*1e3:.1f} ms (min of {reps})")
    return res, min(ts)


def main():
    print(f"backend={jax.default_backend()}")
    for B, T in ((2048, 4096), (3072, 4096)):
        print(f"shape B={B} T={T}:")
        packed = jnp.asarray(_mk_packed(B, T))
        a, ta = bench(rle_pack_ops_scatter, packed, "scatter (.at[])")
        b, tb = bench(tbd.rle_pack_ops, packed, "top_k compaction")
        for i, nm in enumerate(("vals", "lens", "n_runs")):
            assert np.array_equal(a[i], b[i]), (nm, a[i], b[i])
        print(f"  equal outputs; top_k speedup {ta/tb:.1f}x")
    return 0


if __name__ == "__main__":
    _sys.exit(main())
