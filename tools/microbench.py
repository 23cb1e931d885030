#!/usr/bin/env python
"""Microbenchmarks of candidate device primitives on the real TPU.

Times, per op: lax.sort with various key counts/dtypes, gather, scatter-add,
scatter-min, H2D/D2H over the tunnel, and the current stage1_batch.  Guides
the choice between sort-based and hash-based dedup designs.
"""
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


D2H_LAT = 0.0


def _sync(r):
    """Force real completion: fetch one element to host (block_until_ready
    does not actually block on the axon tunnel platform)."""
    leaf = jax.tree_util.tree_leaves(r)[0]
    np.asarray(jax.device_get(leaf.ravel()[0] if leaf.ndim else leaf))


def timeit(fn, *args, n=5, warmup=2):
    for _ in range(warmup):
        _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    _sync(r)
    return max(0.0, (time.perf_counter() - t0) - D2H_LAT) / n


def main():
    global D2H_LAT
    dev = jax.devices()[0]
    print("device:", dev)
    rng = np.random.default_rng(0)

    # D2H latency on a ready scalar — also the per-sync overhead to subtract
    ready = jnp.zeros((), jnp.int32)
    _sync(ready)
    t0 = time.perf_counter()
    for _ in range(5):
        _sync(ready)
    D2H_LAT = (time.perf_counter() - t0) / 5
    print(f"D2H latency (ready scalar): {D2H_LAT*1e3:8.1f} ms")

    N = 1 << 22  # 4M
    T = 1 << 26  # 64M table

    a32 = jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint32))
    b32 = jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint32))
    c32 = jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint32))
    a64 = jnp.asarray(rng.integers(0, 2**63, N, dtype=np.uint64))

    sort1 = jax.jit(lambda x: jax.lax.sort([x], num_keys=1))
    sort2 = jax.jit(lambda x, y: jax.lax.sort([x, y], num_keys=2))
    sort3 = jax.jit(lambda x, y, z: jax.lax.sort([x, y, z], num_keys=3))
    sort1v2 = jax.jit(lambda x, y, z: jax.lax.sort([x, y, z], num_keys=1))
    print(f"sort 4M u32 x1key:          {timeit(sort1, a32)*1e3:8.1f} ms")
    print(f"sort 4M u32 x2key:          {timeit(sort2, a32, b32)*1e3:8.1f} ms")
    print(f"sort 4M u32 x3key:          {timeit(sort3, a32, b32, c32)*1e3:8.1f} ms")
    print(f"sort 4M u32 1key+2payload:  {timeit(sort1v2, a32, b32, c32)*1e3:8.1f} ms")
    try:
        sort64 = jax.jit(lambda x: jax.lax.sort([x], num_keys=1))
        print(f"sort 4M u64 x1key:          {timeit(sort64, a64)*1e3:8.1f} ms")
    except Exception as e:
        print("sort u64 failed:", e)

    N16 = 1 << 24  # 16M
    a16 = jnp.asarray(rng.integers(0, 2**32, N16, dtype=np.uint32))
    print(f"sort 16M u32 x1key:         {timeit(sort1, a16)*1e3:8.1f} ms")

    # argsort-style: sort u32 key + u32 index payload then gathers
    table = jnp.asarray(rng.integers(0, 2**32, T, dtype=np.uint32))
    idx = jnp.asarray(rng.integers(0, T, N, dtype=np.int32))
    gather = jax.jit(lambda t, i: t[i])
    print(f"gather 4M from 64M u32:     {timeit(gather, table, idx)*1e3:8.1f} ms")

    upd = jnp.asarray(rng.integers(0, 100, N, dtype=np.uint32))
    scat_add = jax.jit(lambda t, i, u: t.at[i].add(u))
    print(f"scatter-add 4M into 64M:    {timeit(scat_add, table, idx, upd)*1e3:8.1f} ms")
    scat_min = jax.jit(lambda t, i, u: t.at[i].min(u))
    print(f"scatter-min 4M into 64M:    {timeit(scat_min, table, idx, upd)*1e3:8.1f} ms")
    scat_set = jax.jit(lambda t, i, u: t.at[i].set(u))
    print(f"scatter-set 4M into 64M:    {timeit(scat_set, table, idx, upd)*1e3:8.1f} ms")

    # binning-style ops used in stage1
    cumsum = jax.jit(lambda x: jnp.cumsum(x))
    print(f"cumsum 4M u32:              {timeit(cumsum, a32)*1e3:8.1f} ms")

    # transfers over the tunnel
    h = np.empty(1 << 22, np.uint8)  # 4MB
    t0 = time.perf_counter()
    for _ in range(5):
        jax.block_until_ready(jax.device_put(h, dev))
    print(f"H2D 4MB:                    {(time.perf_counter()-t0)/5*1e3:8.1f} ms")
    big = jnp.zeros((1 << 24,), jnp.uint8)  # 16MB D2H
    _sync(big)
    t0 = time.perf_counter()
    np.asarray(big)
    print(f"D2H 16MB:                   {(time.perf_counter()-t0)*1e3:8.1f} ms")

    # current stage1 kernel
    from kmc_tpu.ops.extract import stage1_batch, batch_len

    s, k = 1 << 22, 27
    codes = jnp.asarray(rng.integers(0, 4, batch_len(s, k)).astype(np.uint8))
    f = functools.partial(stage1_batch, s=s, k=k, sig_len=9, both_strands=True)
    print(f"stage1_batch 4M k=27:       {timeit(f, codes, n=3)*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
