#!/usr/bin/env python
"""Measure device->host transfer strategies for the sharded finalize
outputs (TPU_SHARDED finalize_d2h_s).

The sharded store pulls (bins, words, counts) with three blocking
np.asarray calls on NamedSharding arrays; a single blocking pull runs
~25 MB/s on this dev-tunnel while the single-chip chunked finalize
reaches ~90 MB/s.  Each strategy here gets FRESH arrays (jax caches the
host copy on the Array after the first np.asarray, so reusing arrays
measures the cache):

  a) sequential blocking np.asarray per array (current sharded path)
  b) copy_to_host_async on all three arrays, then np.asarray
  c) row-chunked: slice each array into C row chunks on device, start
     async copies on ALL chunks, consume in order (the single-chip
     recipe)

Usage: python tools/microbench_d2h.py [log2_rows ...]   (default 24)
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

_seed = 0


def make_arrays(mesh, n):
    """Fresh (bins, words, counts) at finalize-output shapes; a new seed
    every call so no Array ever has a cached host copy."""
    global _seed
    _seed += 16
    sh2 = NamedSharding(mesh, P("d", None))
    sh3 = NamedSharding(mesh, P("d", None, None))
    D = mesh.devices.size

    def fill(s):
        b = jax.random.bits(jax.random.key(s), (D, n), jnp.uint32) >> 20
        w = jax.random.bits(jax.random.key(s + 1), (D, n, 2), jnp.uint32)
        c = jax.random.bits(jax.random.key(s + 2), (D, n), jnp.uint32)
        return b.astype(jnp.int32), w, c

    arrs = jax.jit(fill, out_shardings=(sh2, sh3, sh2))(_seed)
    jax.block_until_ready(arrs)
    return arrs


def total_mb(arrs):
    return sum(a.size * a.dtype.itemsize for a in arrs) / 1e6


def t_seq_asarray(arrs):
    t0 = time.perf_counter()
    outs = [np.asarray(a) for a in arrs]
    return time.perf_counter() - t0, outs


def t_async_then_asarray(arrs):
    t0 = time.perf_counter()
    for a in arrs:
        a.copy_to_host_async()
    outs = [np.asarray(a) for a in arrs]
    return time.perf_counter() - t0, outs


def t_chunked_async(arrs, n_chunks=8):
    t0 = time.perf_counter()
    pieces = []
    for a in arrs:
        n = a.shape[1]
        step = -(-n // n_chunks)
        chunks = [a[:, i : i + step] for i in range(0, n, step)]
        for c in chunks:
            c.copy_to_host_async()
        pieces.append(chunks)
    outs = [np.concatenate([np.asarray(c) for c in chunks], axis=1)
            for chunks in pieces]
    return time.perf_counter() - t0, outs


def main():
    from kmc_tpu.parallel.distributed import make_mesh

    logs = [int(a) for a in sys.argv[1:]] or [24]
    mesh = make_mesh(1)
    dev = mesh.devices.flat[0]
    print(f"mesh: 1 x {dev.device_kind} ({dev.platform})", flush=True)
    strategies = [("seq_asarray", t_seq_asarray),
                  ("async_then_asarray", t_async_then_asarray),
                  ("chunked_async_8", t_chunked_async),
                  ("chunked_async_32",
                   lambda a: t_chunked_async(a, n_chunks=32))]
    for lg in logs:
        n = 1 << lg
        # tunnel warmup: one throwaway transfer
        np.asarray(make_arrays(mesh, max(n >> 4, 1))[2])
        print(f"\nrows/device 2^{lg}:")
        ref = None
        for name, fn in strategies:
            arrs = make_arrays(mesh, n)
            mb = total_mb(arrs)
            dt, outs = fn(arrs)
            chk = int(sum(np.asarray(o, dtype=np.uint64).sum() & 0xFFFF
                          for o in outs) & 0xFFFF)
            print(f"  {name:22s} {dt:7.3f} s  {mb / dt:7.1f} MB/s  "
                  f"(payload {mb:.0f} MB, chk {chk})", flush=True)


if __name__ == "__main__":
    main()
