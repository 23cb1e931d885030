#!/usr/bin/env python
"""Break down stage-2 (finalize + D2H + DB write) on the real TPU."""
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
    X = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 26
    W = 2
    rng = np.random.default_rng(0)
    n_real = X // 2
    sig = np.full(X, 0xFFFFFFFF, np.uint32)
    sig[:n_real] = rng.integers(0, 1 << 18, n_real, dtype=np.uint32)
    words = np.full((X, W), 0xFFFFFFFF, np.uint32)
    words[:n_real] = rng.integers(0, 1 << 32, (n_real, W), dtype=np.uint32)
    counts = np.zeros(X, np.uint32)
    counts[:n_real] = 1
    sig_map = rng.integers(0, 512, (1 << 18) + 1, dtype=np.int32)

    from kmc_tpu.ops.store import _finalize

    d_sig = jax.device_put(jnp.asarray(sig))
    d_words = jax.device_put(jnp.asarray(words))
    d_counts = jax.device_put(jnp.asarray(counts))
    d_map = jax.device_put(jnp.asarray(sig_map))
    sync()

    t0 = time.perf_counter()
    out = _finalize(d_sig, d_words, d_counts, jnp.int32(n_real), d_map,
                    cutoff_min=2, cutoff_max=10**9, counter_max=255)
    sync()
    t_compile_exec = time.perf_counter() - t0
    print(f"finalize compile+exec X={X}: {t_compile_exec:.2f}s")

    # second run (copies needed; buffers were donated)
    d_sig = jax.device_put(jnp.asarray(sig))
    d_words = jax.device_put(jnp.asarray(words))
    d_counts = jax.device_put(jnp.asarray(counts))
    sync()
    t0 = time.perf_counter()
    out = _finalize(d_sig, d_words, d_counts, jnp.int32(n_real), d_map,
                    cutoff_min=2, cutoff_max=10**9, counter_max=255)
    sync()
    t_exec = time.perf_counter() - t0
    print(f"finalize exec X={X}: {t_exec:.2f}s")

    kept_bins, kept_words, kept_counts, n_kept, stats = out
    n = int(n_kept)
    t0 = time.perf_counter()
    b = np.asarray(kept_bins[:n])
    w = np.asarray(kept_words[:n])
    c = np.asarray(kept_counts[:n])
    t_d2h = time.perf_counter() - t0
    mb = (b.nbytes + w.nbytes + c.nbytes) / 1e6
    print(f"D2H {mb:.0f}MB ({n} rows): {t_d2h:.2f}s ({mb/t_d2h:.0f} MB/s)")


if __name__ == "__main__":
    main()
