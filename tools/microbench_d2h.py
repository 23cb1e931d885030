#!/usr/bin/env python
"""Measure device->host transfer strategies for the sharded finalize
outputs (VERDICT r3 weak #4 / TPU_SHARDED finalize_d2h_s).

The sharded store pulls (bins, words, counts) with three blocking
np.asarray calls on NamedSharding arrays; the single-chip store reaches
~300 MB/s on this tunnel with per-chunk copy_to_host_async.  This bench
times, at finalize-output shapes on a 1-device TPU mesh:

  a) sequential np.asarray per array (the current sharded path)
  b) copy_to_host_async on all arrays first, then np.asarray
  c) jax.device_get of the tuple
  d) per-shard np.asarray(shard.data) after async start

Usage: python tools/microbench_d2h.py [log2_rows ...]   (default 24 26)
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


def make_arrays(mesh, n):
    sh2 = NamedSharding(mesh, P("d", None))
    sh3 = NamedSharding(mesh, P("d", None, None))
    D = mesh.devices.size

    def fill():
        b = jax.random.bits(jax.random.key(0), (D, n), jnp.uint32) >> 20
        w = jax.random.bits(jax.random.key(1), (D, n, 2), jnp.uint32)
        c = jax.random.bits(jax.random.key(2), (D, n), jnp.uint32)
        return b.astype(jnp.int32), w, c

    bins, words, counts = jax.jit(
        fill, out_shardings=(sh2, sh3, sh2))()
    jax.block_until_ready((bins, words, counts))
    return bins, words, counts


def total_mb(arrs):
    return sum(a.size * a.dtype.itemsize for a in arrs) / 1e6


def t_seq_asarray(arrs):
    t0 = time.perf_counter()
    outs = [np.asarray(a) for a in arrs]
    dt = time.perf_counter() - t0
    return dt, outs


def t_async_then_asarray(arrs):
    t0 = time.perf_counter()
    for a in arrs:
        try:
            a.copy_to_host_async()
        except AttributeError:
            pass
    outs = [np.asarray(a) for a in arrs]
    dt = time.perf_counter() - t0
    return dt, outs


def t_device_get(arrs):
    t0 = time.perf_counter()
    outs = jax.device_get(tuple(arrs))
    dt = time.perf_counter() - t0
    return dt, outs


def t_shard_data(arrs):
    t0 = time.perf_counter()
    for a in arrs:
        try:
            a.copy_to_host_async()
        except AttributeError:
            pass
    outs = []
    for a in arrs:
        parts = [np.asarray(s.data) for s in a.addressable_shards]
        outs.append(parts[0] if len(parts) == 1 else np.concatenate(parts))
    dt = time.perf_counter() - t0
    return dt, outs


def main():
    from kmc_tpu.parallel.distributed import make_mesh

    logs = [int(a) for a in sys.argv[1:]] or [24, 26]
    mesh = make_mesh(1)
    dev = mesh.devices.flat[0]
    print(f"mesh: 1 x {dev.device_kind} ({dev.platform})", flush=True)
    strategies = [("seq_asarray", t_seq_asarray),
                  ("async_then_asarray", t_async_then_asarray),
                  ("device_get", t_device_get),
                  ("shard_data", t_shard_data)]
    for lg in logs:
        n = 1 << lg
        arrs = make_arrays(mesh, n)
        mb = total_mb(arrs)
        print(f"\nrows/device 2^{lg}: payload {mb:.0f} MB")
        ref = None
        for name, fn in strategies:
            best = 1e9
            for _ in range(2):
                dt, outs = fn(arrs)
                best = min(best, dt)
            if ref is None:
                ref = [np.asarray(o) for o in outs]
            else:
                for r, o in zip(ref, outs):
                    assert np.array_equal(r, np.asarray(o)), name
            print(f"  {name:22s} {best:7.3f} s  {mb / best:7.1f} MB/s",
                  flush=True)


if __name__ == "__main__":
    main()
