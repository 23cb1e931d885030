#!/usr/bin/env python
"""On-chip A/B: ops/pallas_sort.pallas_bitonic_sort vs jax.lax.sort.

The grouping sort in the finalize is lax.sort over 2 fused u32 key
columns (+1 count payload on recount paths) at up to 2^28 rows — 1.39 s
measured, ~65% of finalize exec (docs/PERFORMANCE.md).

MEASURED VERDICT (v5e, 2026-08-17): the blocked bitonic LOSES ~3x —
2^26 2key 0.820s vs 0.301s, 2^26 2key+pay 1.224s vs 0.379s, 2^28 2key
3.915s vs 1.387s (bit-exact everywhere).  XLA's SortOp is internally
fused near the HBM floor (~0.75 ms/stage) while the blocked schedule
pays ~5.6 ms per discrete HBM pass.  lax.sort stays the production
grouping sort; see docs/PERFORMANCE.md for the full accounting.
(2^28 with 3 columns exhausts HBM in this A/B harness — input + output
+ lax reference copies ~9.6 GB — not a kernel limit.)

Run on the real chip:

    timeout 1800 python tools/microbench_bitonic.py [--sizes 26,28]

Prints one line per (variant, size): pallas_s, laxsort_s, speedup.
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(x):
    # jax.block_until_ready does not block over the axon tunnel
    return np.asarray(x[0].ravel()[:1] if isinstance(x, (list, tuple)) else x.ravel()[:1])


def best_of(fn, n=3):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        _sync(fn())
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="26,28")
    ap.add_argument("--interpret", action="store_true",
                    help="CPU interpret mode (correctness smoke only)")
    args = ap.parse_args()

    import jax
    if args.interpret:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from kmc_tpu.ops.pallas_sort import pallas_bitonic_sort

    print(f"backend={jax.default_backend()}", flush=True)
    lax_sort = jax.jit(lambda cols: jax.lax.sort(cols, num_keys=2))

    for log_n in [int(s) for s in args.sizes.split(",")]:
        n = 1 << log_n
        rng = np.random.default_rng(log_n)
        for name, nc in [("2key", 2), ("2key+pay", 3)]:
            cols = [jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint32))
                    for _ in range(nc)]
            _sync(cols)

            def run_pallas():
                return pallas_bitonic_sort(cols, n_keys=2,
                                           interpret=args.interpret)

            def run_lax():
                return lax_sort(cols)

            # warm (compile) then measure
            _sync(run_pallas()); _sync(run_lax())
            tp = best_of(run_pallas)
            tl = best_of(run_lax)
            # spot-check agreement on the key columns
            a = run_pallas(); b = run_lax()
            idx = rng.integers(0, n, 4096)
            ok = all(np.array_equal(np.asarray(a[i])[idx],
                                    np.asarray(b[i])[idx])
                     for i in range(2))
            print(f"2^{log_n} {name}: pallas={tp:.3f}s lax={tl:.3f}s "
                  f"speedup={tl / tp:.2f}x match={ok}", flush=True)
            if not ok:
                print("MISMATCH — do not wire", file=sys.stderr)
                sys.exit(1)


if __name__ == "__main__":
    main()
