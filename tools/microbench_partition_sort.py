#!/usr/bin/env python
"""The 256-way MSD-partition attack on the grouping sort (VERDICT r4 next
#8): RADULS partitions on the top byte, then sorts shorter keys per
partition (raduls_impl.h:546-700).  On this toolchain the route costs

    partition-key argsort (1 u32 key + 1 u32 src payload)
  + W row gathers by src          (measured 3,966 ms/pass at 2^28,
                                   docs/PERFORMANCE.md roofline)
  + 256 batched shorter-key sorts (dimension=1 lax.sort)

This harness measures the two terms the roofline table does not already
pin — the cheap-key argsort pass and the batched-small vs flat-big sort —
on the real chip, then prints the composed route cost next to the
single flat `lax.sort` it would replace.

Usage: python tools/microbench_partition_sort.py [log2_rows...]
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    # block_until_ready does not block on the dev tunnel; a scalar fetch
    # does (same workaround as ops/store.py's finalize timers)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[:1])


def timed(fn, *args, iters=3):
    fn_j = jax.jit(fn)
    _sync(fn_j(*args))
    best = None
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(fn_j(*args))
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    return best


def main():
    logs = [int(a) for a in sys.argv[1:]] or [26, 27]
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}",
          flush=True)
    for lg in logs:
        n = 1 << lg
        key = jax.random.bits(jax.random.key(0), (n,), jnp.uint32)
        key1 = jax.random.bits(jax.random.key(1), (n,), jnp.uint32)

        # baseline: the actual grouping sort (2 u32 key columns)
        t_flat2 = timed(lambda a, b: jax.lax.sort([a, b], num_keys=2),
                        key, key1)

        # partition pass: 1 u32 key + 1 u32 payload (src indices)
        src = jnp.arange(n, dtype=jnp.uint32)
        t_part = timed(lambda a, s: jax.lax.sort([a, s], num_keys=1),
                       key, src)

        # one full-row gather by src at this size (the reorder each of the
        # W columns pays); the roofline's 2^28 figure is 3.97 s
        perm = np.random.default_rng(0).permutation(n).astype(np.int32)
        t_gather = timed(lambda a, p: a[p], key, jnp.asarray(perm))

        # batched shorter sorts: 256 partitions padded to n/256 rows,
        # 2 key columns (the fused key stays 2 lanes after an 8-bit MSD)
        m = n // 256
        k2a = key.reshape(256, m)
        k2b = key1.reshape(256, m)
        t_batch = timed(
            lambda a, b: jax.lax.sort([a, b], dimension=1, num_keys=2),
            k2a, k2b)

        route = t_part + 2 * t_gather + t_batch
        print(f"2^{lg} rows: flat 2-key sort {t_flat2*1e3:8.1f} ms | "
              f"partition argsort {t_part*1e3:8.1f} ms | "
              f"row gather {t_gather*1e3:8.1f} ms x2 | "
              f"256x batched 2-key sort {t_batch*1e3:8.1f} ms | "
              f"MSD route total {route*1e3:8.1f} ms "
              f"({route/t_flat2:4.1f}x the flat sort)", flush=True)


if __name__ == "__main__":
    main()
