#!/usr/bin/env python
"""Phase-level profiling of the counting pipeline on a real input slice."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

FQ = Path("/tmp/kmc_tpu_bench/reads_8388608_30.fastq")
MB = int(sys.argv[1]) if len(sys.argv) > 1 else 64


def sync():
    np.asarray(jnp.zeros((), jnp.int32))


def main():
    # truncate input to MB megabytes on a record boundary
    raw = FQ.read_bytes()[: MB << 20]
    cut = raw.rfind(b"\n@")
    sliced = Path(f"/tmp/profile_{MB}.fastq")
    sliced.write_bytes(raw[: cut + 1] if cut > 0 else raw)
    del raw

    from kmc_tpu.io.readers import BatchStream, ParseState, file_code_stream
    from kmc_tpu.ops.extract import stage1_batch
    from kmc_tpu.io.native import pack_codes
    from kmc_tpu.ops.store import DeviceKmerStore

    k, m, s = 27, 9, 1 << 22
    W = (k + 15) // 16

    # phase A: host parse only
    t0 = time.perf_counter()
    state = ParseState()
    chunks = list(file_code_stream([str(sliced)], "fastq", state))
    t_parse = time.perf_counter() - t0
    n_codes = sum(len(c) for c in chunks)
    print(f"parse: {t_parse:.2f}s  ({n_codes/1e6:.0f}M codes, "
          f"{n_codes/t_parse/1e6:.0f} M codes/s)")

    # phase B: batch assembly only
    t0 = time.perf_counter()
    bs = BatchStream(s, k)
    batches = list(bs.batches(iter(chunks)))
    t_batch = time.perf_counter() - t0
    print(f"batch assembly: {t_batch:.2f}s  ({len(batches)} batches)")

    # phase C: H2D only
    t0 = time.perf_counter()
    dev_batches = [jax.device_put(b) for b in batches]
    sync()
    t_h2d = time.perf_counter() - t0
    print(f"H2D: {t_h2d:.2f}s  ({len(batches)*(s+43)/t_h2d/1e6:.0f} MB/s)")

    # phase D: stage1 kernel on pre-uploaded batches (compile excluded)
    r = stage1_batch(dev_batches[0], s=s, k=k, sig_len=m, both_strands=True)
    sync()
    t0 = time.perf_counter()
    outs = []
    for b in dev_batches:
        outs.append(stage1_batch(b, s=s, k=k, sig_len=m, both_strands=True))
    sync()
    t_k1 = time.perf_counter() - t0
    print(f"stage1 kernel: {t_k1:.2f}s  ({t_k1/len(batches)*1e3:.0f} ms/batch)")

    # phase E: fused ingest (extract + bin + append)
    store = DeviceKmerStore(1 << 26, k=k, sig_len=m, both_strands=True,
                            n_bins=512, initial_rows=2 * s)
    pm0 = pack_codes(np.asarray(batches[0]))
    store.ingest_packed(*pm0, s=s)  # compile
    sync()
    store2 = DeviceKmerStore(1 << 26, k=k, sig_len=m, both_strands=True,
                             n_bins=512, initial_rows=2 * s)
    t0 = time.perf_counter()
    for b in batches:
        store2.ingest_packed(*pack_codes(np.asarray(b)), s=s)
    sync()
    t_app = time.perf_counter() - t0
    print(f"fused ingest: {t_app:.2f}s  ({t_app/len(batches)*1e3:.0f} ms/batch)")

    # phase F: finalize
    sig_map = store2.host_sig_map()
    n_bins_used = store2.n_used_bins
    t0 = time.perf_counter()
    bins, words, counts, stats = store2.finalize(
        cutoff_min=2, cutoff_max=10**9, counter_max=255
    )
    t_fin = time.perf_counter() - t0
    print(f"finalize(+D2H): {t_fin:.2f}s  ({len(bins)} kept rows)")

    # phase G: DB write
    from kmc_tpu.formats.kmc_db import DbInfo, Kmc2DbWriter, pick_lut_prefix_len
    from kmc_tpu.runner import words_to_kmer_bytes
    t0 = time.perf_counter()
    info = DbInfo(kmer_len=k, counter_size=1,
                  lut_prefix_len=pick_lut_prefix_len(k, n_bins_used, len(bins)),
                  signature_len=m, cutoff_min=2, cutoff_max=10**9,
                  both_strands=True, n_bins=n_bins_used)
    writer = Kmc2DbWriter("/tmp/profile_out", info, sig_map)
    bounds = np.searchsorted(bins, np.arange(n_bins_used + 1))
    kb = words_to_kmer_bytes(words, k)
    for b in range(n_bins_used):
        lo, hi = bounds[b], bounds[b + 1]
        if lo < hi:
            writer.put_bin(b, kb[lo:hi], counts[lo:hi])
    writer.close()
    t_db = time.perf_counter() - t0
    print(f"db write: {t_db:.2f}s")

    total = t_parse + t_batch + t_h2d + t_k1 + t_app + t_fin + t_db
    print(f"TOTAL: {total:.2f}s for {MB}MB input")


if __name__ == "__main__":
    main()
