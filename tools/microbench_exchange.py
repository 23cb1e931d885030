#!/usr/bin/env python
"""Microbench of the multi-chip exchange's segment construction on the
real TPU chip (VERDICT r2 weak #4 / next #6): the owner-sorted rows must
be laid into (D, capacity) per-owner send segments before the ragged
all_to_all.  Round 2 routed this through a full-width XLA scatter
(`out.at[slot].set`) — the exact primitive docs/PERFORMANCE.md measured
at 2.19 s/pass at 2^28 rows; round 3 replaces it with D contiguous
dynamic slices + a tail mask over the already-owner-sorted rows
(parallel/multihost.py::_exchange_shard).

Usage: python tools/microbench_exchange.py [log2_rows ...]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

D = 16  # owner count (v5e-16 north star)


def seg_scatter(col, owner_s, owner_start, capacity, fill):
    """Round-2 formulation: full-width scatter into segment slots."""
    X = col.shape[0]
    idx = jnp.arange(X, dtype=jnp.int32)
    pos_in_owner = idx - owner_start[jnp.minimum(owner_s, D).astype(jnp.int32)]
    in_cap = (pos_in_owner < capacity) & (owner_s < D)
    out = jnp.full((D * capacity + 1,), fill, col.dtype)
    slot = jnp.where(in_cap, owner_s.astype(jnp.int32) * capacity + pos_in_owner,
                     D * capacity)
    out = out.at[slot].set(jnp.where(in_cap, col, fill))
    return out[: D * capacity].reshape(D, capacity)


def seg_slices(col, owner_start, n_per_owner, capacity, fill):
    """Round-3 formulation: D contiguous dynamic slices + tail mask."""
    starts = owner_start[:D].astype(jnp.int32)
    pos = jnp.arange(capacity, dtype=jnp.int32)
    seg_valid = pos[None, :] < jnp.minimum(n_per_owner, capacity)[:, None]
    pad = jnp.full((capacity,), fill, col.dtype)
    col_pad = jnp.concatenate([col, pad])
    rows = jnp.stack([
        jax.lax.dynamic_slice(col_pad, (starts[d],), (capacity,))
        for d in range(D)
    ])
    return jnp.where(seg_valid, rows, fill)


def bench(fn, args, n_iter=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n_iter


def main():
    logs = [int(a) for a in sys.argv[1:]] or [24, 26, 27]
    print(f"device: {jax.devices()[0]}  D={D}")
    rng = np.random.default_rng(0)
    for lg in logs:
        n = 1 << lg
        capacity = (n // D) * 2
        owner_np = np.sort(rng.integers(0, D, n).astype(np.uint32))
        col_np = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
        owner_s = jnp.asarray(owner_np)
        col = jnp.asarray(col_np)
        owner_start = jnp.searchsorted(
            owner_s, jnp.arange(D + 1, dtype=jnp.uint32)).astype(jnp.int32)
        n_per_owner = owner_start[1:] - owner_start[:-1]

        f_sc = jax.jit(lambda c, o, st: seg_scatter(c, o, st, capacity,
                                                    jnp.uint32(0xFFFFFFFF)))
        f_sl = jax.jit(lambda c, st, np_: seg_slices(c, st, np_, capacity,
                                                     jnp.uint32(0xFFFFFFFF)))
        a = np.asarray(f_sc(col, owner_s, owner_start))
        b = np.asarray(f_sl(col, owner_start, n_per_owner))
        assert np.array_equal(a, b), "formulations disagree"
        t_sc = bench(f_sc, (col, owner_s, owner_start))
        t_sl = bench(f_sl, (col, owner_start, n_per_owner))
        gb = n * 4 / 1e9
        print(f"2^{lg} rows (cap {capacity}): scatter {t_sc*1e3:8.2f} ms"
              f"  slices {t_sl*1e3:8.2f} ms  speedup {t_sc/t_sl:5.1f}x"
              f"  ({2*gb/t_sl:.0f} GB/s eff. slice bw)")


if __name__ == "__main__":
    main()
