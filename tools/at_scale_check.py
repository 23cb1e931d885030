#!/usr/bin/env python
"""At-scale differential: a multi-GB workload through the full TPU pipeline
(mid-run compactions + counted finalize included) byte-compared against the
reference binary's sorted dump.

Usage: python tools/at_scale_check.py [genome_log2=25] [coverage=30]
Default workload: 32 Mbp genome x 30x 150 bp reads = 2.1 GB FASTQ,
~832 M k-mers, ~33.5 M unique — 4x the bench.py workload, exceeding the
2^28-row store so the compaction machinery runs on real hardware.
"""
from __future__ import annotations

import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    glog = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    cov = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    os.environ["KMC_TPU_BENCH_GENOME"] = str(1 << glog)
    os.environ["KMC_TPU_BENCH_COVERAGE"] = str(cov)
    import bench

    t0 = time.perf_counter()
    fq = bench.prepare_input()
    print(f"input: {fq} ({fq.stat().st_size / 1e6:.0f} MB, "
          f"gen {time.perf_counter() - t0:.0f}s)", flush=True)

    from tools.measure_reference import build_reference

    kmc = build_reference(Path("/tmp"))
    kmc_tools = kmc.parent / "kmc_tools"
    work = Path("/tmp/kmc_at_scale")
    work.mkdir(exist_ok=True)

    # reference
    t0 = time.perf_counter()
    subprocess.run(
        [str(kmc), "-k27", "-ci2", "-t1", "-hp", str(fq),
         str(work / "refdb"), str(work)],
        check=True, capture_output=True)
    t_ref = time.perf_counter() - t0
    print(f"reference count: {t_ref:.1f}s", flush=True)
    subprocess.run(
        [str(kmc_tools), "transform", str(work / "refdb"), "sort",
         str(work / "refdb.s")], check=True, capture_output=True)
    subprocess.run(
        [str(kmc_tools), "transform", str(work / "refdb.s"), "dump",
         str(work / "ref.dump")], check=True, capture_output=True)

    # kmc_tpu (same capacity policy as bench.py)
    from kmc_tpu.runner import count

    t0 = time.perf_counter()
    res1, res2 = count([str(fq)], str(work / "tpudb"), k=27, cutoff_min=2,
                       batch_positions=1 << 23, device_store_rows=1 << 28,
                       verbose=True)
    t_tpu = time.perf_counter() - t0
    print(f"kmc_tpu count: {t_tpu:.1f}s "
          f"({res2.n_total_kmers / t_tpu / 1e6:.1f} M k-mers/s, "
          f"{res2.n_unique_kmers} unique, speedup {t_ref / t_tpu:.2f}x)",
          flush=True)

    from kmc_tpu.formats.dump import dump_db_file

    dump_db_file(str(work / "tpudb"), str(work / "tpu.dump"), sorted_output=True)
    eq = subprocess.run(
        ["cmp", "-s", str(work / "ref.dump"), str(work / "tpu.dump")]
    ).returncode == 0
    n_lines = sum(1 for _ in open(work / "ref.dump"))
    print(f"at-scale dump byte-compare ({n_lines} k-mers): "
          f"{'MATCH' if eq else 'MISMATCH'}")
    sys.exit(0 if eq else 1)


if __name__ == "__main__":
    main()
