#!/usr/bin/env python
"""Benchmark: end-to-end k-mer counting throughput on the real TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload (the reference's default operating point, k=27 variant of
BASELINE.json config #1): synthetic 30x-coverage 150bp reads over a random
genome, FASTQ on local disk -> full pipeline (host parse + device count +
KMC2 database write).  vs_baseline compares against reference KMC3
throughput measured on this host if BASELINE_MEASURED.json exists
(see tools/measure_reference.py), else 1.0.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

GENOME_LEN = int(os.environ.get("KMC_TPU_BENCH_GENOME", 1 << 23))  # 8 Mbp
COVERAGE = int(os.environ.get("KMC_TPU_BENCH_COVERAGE", 30))
READ_LEN = 150
K = 27
CACHE = Path(os.environ.get("KMC_TPU_BENCH_CACHE", "/tmp/kmc_tpu_bench"))


def prepare_input() -> Path:
    CACHE.mkdir(parents=True, exist_ok=True)
    fq = CACHE / f"reads_{GENOME_LEN}_{COVERAGE}.fastq"
    if fq.exists():
        return fq
    rng = np.random.default_rng(0)
    genome = rng.integers(0, 4, GENOME_LEN).astype(np.uint8)
    acgt = np.frombuffer(b"ACGT", dtype=np.uint8)
    n_reads = GENOME_LEN * COVERAGE // READ_LEN
    starts = rng.integers(0, GENOME_LEN - READ_LEN, n_reads)
    qual = b"I" * READ_LEN
    with open(fq, "wb") as f:
        # vectorized record assembly in blocks
        block = 1 << 16
        for lo in range(0, n_reads, block):
            hi = min(lo + block, n_reads)
            idx = starts[lo:hi, None] + np.arange(READ_LEN)[None, :]
            seqs = acgt[genome[idx]]
            out = []
            for i, s in enumerate(seqs, start=lo):
                out.append(b"@r%d\n%s\n+\n%s\n" % (i, s.tobytes(), qual))
            f.write(b"".join(out))
    return fq


def main():
    fq = prepare_input()
    from kmc_tpu.runner import count

    out_db = str(CACHE / "bench_out")
    # TPU operating point: big batches amortize the per-dispatch tunnel
    # latency; 2^28 store rows hold the whole run's positions (8 B/row) so
    # no mid-run compaction happens and finalize's sorts ride the
    # unit-count fast path
    tuned = dict(
        batch_positions=1 << 23,
        device_store_rows=1 << 28,
    )
    # warm-up: compile all kernels on a tiny slice so the measured run is
    # steady-state (first XLA compile is ~30-90s per kernel on this setup;
    # compiles persist in the on-disk cache across runs)
    warm = CACHE / "warm.fastq"
    if not warm.exists():
        with open(fq, "rb") as f:
            head = f.read(1 << 20)
        head = head[: head.rfind(b"\n@")] if b"\n@" in head else head
        warm.write_bytes(head + b"\n")
    count([str(warm)], str(CACHE / "warm_out"), k=K, cutoff_min=2, **tuned)
    # pre-compile the exact kernel variants the measured run hits: the
    # full-capacity ingest and the unit-count finalize at the real
    # (capacity, k, lpl, n_bins) statics (the warm run's tiny input picks a
    # different lut_prefix_len, hence a different finalize executable)
    from kmc_tpu.formats.kmc_db import pick_lut_prefix_len
    from kmc_tpu.io.native import pack_codes_boundaries
    from kmc_tpu.ops.extract import batch_len
    from kmc_tpu.ops.store import DeviceKmerStore

    s = tuned["batch_positions"]
    st = DeviceKmerStore(
        tuned["device_store_rows"],
        k=K, sig_len=9, both_strands=True, n_bins=512,
        initial_rows=tuned["device_store_rows"],
    )
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 4, batch_len(s, K)).astype(np.uint8)
    codes[150::151] = 4  # read separators so the boundary variant compiles
    buf, ts = pack_codes_boundaries(codes)
    st.ingest_boundaries(buf, ts, s=s)
    n_reads_est = GENOME_LEN * COVERAGE // READ_LEN
    lpl = pick_lut_prefix_len(K, st.n_used_bins, 4 * n_reads_est)
    st.finalize_records(
        cutoff_min=2, cutoff_max=10**9, counter_max=255,
        lut_prefix_len=lpl, counter_size=1,
    )
    del st

    # best of 3: the dev-tunnel link and the single host core swing >2x
    # between runs, so a single sample badly misrepresents the pipeline
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        res1, res2 = count([str(fq)], out_db, k=K, cutoff_min=2, **tuned)
        elapsed = time.perf_counter() - t0
        if best is None or elapsed < best[0]:
            best = (elapsed, res1, res2)
    elapsed, res1, res2 = best

    kmers_per_sec = res2.n_total_kmers / elapsed

    # greedy-policy row (VERDICT r4 next #10): the same workload through
    # the reference's sampled greedy signature map (stage-0 sampling +
    # per-batch gather) — tracks the slow-policy regression explicitly
    g_best = None
    for _ in range(2):
        t0 = time.perf_counter()
        _, g2 = count([str(fq)], out_db + "_greedy", k=K, cutoff_min=2,
                      signature_map_policy="greedy", **tuned)
        g_el = time.perf_counter() - t0
        if g_best is None or g_el < g_best[0]:
            g_best = (g_el, g2)
    g_elapsed, g2 = g_best
    greedy_kmers_per_sec = g2.n_total_kmers / g_elapsed

    vs_baseline = 1.0
    baseline_file = Path(__file__).parent / "BASELINE_MEASURED.json"
    if baseline_file.exists():
        ref = json.loads(baseline_file.read_text())
        ref_rate = ref.get("ref_kmers_per_sec")
        if ref_rate:
            vs_baseline = kmers_per_sec / ref_rate

    print(
        json.dumps(
            {
                "metric": "kmer_count_throughput_k27_30x",
                "value": round(kmers_per_sec, 1),
                "unit": "kmers/sec",
                "vs_baseline": round(vs_baseline, 3),
                # device-only split (tracks the machine, not the tunnel
                # weather): finalize execution on-chip vs the D2H payload
                # transfer; wall minus these is host parse + link time
                "finalize_exec_s": round(res2.time_finalize_exec, 3),
                "finalize_d2h_s": round(res2.time_finalize_d2h, 3),
                # greedy signature-map policy on the same workload
                "greedy_kmers_per_sec": round(greedy_kmers_per_sec, 1),
                "greedy_vs_prefix": round(
                    greedy_kmers_per_sec / kmers_per_sec, 3),
            }
        )
    )
    print(
        f"# total_kmers={res2.n_total_kmers} unique={res2.n_unique_kmers} "
        f"elapsed={elapsed:.2f}s stage1={res1.time:.2f}s stage2={res2.time:.2f}s "
        f"finalize_exec={res2.time_finalize_exec:.2f}s "
        f"finalize_d2h={res2.time_finalize_d2h:.2f}s",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
