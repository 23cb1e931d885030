#!/usr/bin/env python
"""Isolate the fused-ingest dispatch cost: pre-packed batches, loop, one sync."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def sync():
    np.asarray(jnp.zeros((), jnp.int32))


def main():
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    slog = int(sys.argv[2]) if len(sys.argv) > 2 else 22
    s, k, m = 1 << slog, 27, 9

    from kmc_tpu.io.native import pack_codes
    from kmc_tpu.ops.extract import batch_len
    from kmc_tpu.ops.store import DeviceKmerStore

    rng = np.random.default_rng(0)
    L = batch_len(s, k)
    batches = []
    for i in range(n_batches):
        codes = rng.integers(0, 4, L).astype(np.uint8)
        batches.append(pack_codes(codes))

    W = (k + 15) // 16
    cap = 1 << int(sys.argv[3]) if len(sys.argv) > 3 else 1 << 26

    def run(tag):
        store = DeviceKmerStore(cap, k=k, sig_len=m, both_strands=True,
                                n_bins=512, initial_rows=cap)
        store.ingest_packed(*batches[0], s=s)
        sync()  # compile
        store2 = DeviceKmerStore(cap, k=k, sig_len=m, both_strands=True,
                                 n_bins=512, initial_rows=cap)
        t0 = time.perf_counter()
        for pm in batches:
            store2.ingest_packed(*pm, s=s)
        sync()
        dt = time.perf_counter() - t0
        print(f"{tag}: {dt:.2f}s total, {dt/n_batches*1e3:.0f} ms/batch, "
              f"{n_batches*s/dt/1e6:.1f} M pos/s")
        return store2

    st = run(f"ingest s=2^{slog}")

    # compaction cost at full store
    t0 = time.perf_counter()
    st.compact()
    sync()
    print(f"compact @{cap} rows: {time.perf_counter()-t0:.2f}s")

    # H2D alone for one batch (packed+mask)
    p, msk = batches[0]
    t0 = time.perf_counter()
    for _ in range(5):
        jax.device_put(p)
        d = jax.device_put(msk)
    sync()
    print(f"H2D packed batch x5: {(time.perf_counter()-t0)/5*1e3:.0f} ms each "
          f"({(p.nbytes+msk.nbytes)/1e6:.1f} MB)")


if __name__ == "__main__":
    main()
