#!/usr/bin/env python
"""End-to-end timing of kmc_tpu count() on a bench-input slice (real TPU).

Usage: profile_e2e.py [MB] [batch_positions_log2]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

FQ = Path("/tmp/kmc_tpu_bench/reads_8388608_30.fastq")
MB = int(sys.argv[1]) if len(sys.argv) > 1 else 64
SLOG = int(sys.argv[2]) if len(sys.argv) > 2 else 22


def main():
    raw = FQ.read_bytes()[: MB << 20]
    cut = raw.rfind(b"\n@")
    sliced = Path(f"/tmp/profile_{MB}.fastq")
    sliced.write_bytes(raw[: cut + 1] if cut > 0 else raw)
    del raw

    from kmc_tpu.runner import count

    # warm: tiny run to compile everything at this batch size
    warm = Path("/tmp/profile_warm.fastq")
    if not warm.exists():
        with open(sliced, "rb") as f:
            head = f.read(1 << 20)
        warm.write_bytes(head[: head.rfind(b"\n@") + 1])
    rows = int(sys.argv[3]) if len(sys.argv) > 3 else 28
    t0 = time.perf_counter()
    count([str(warm)], "/tmp/profile_warm_out", k=27, cutoff_min=2,
          batch_positions=1 << SLOG, device_store_rows=1 << rows)
    t_warm = time.perf_counter() - t0

    t0 = time.perf_counter()
    r1, r2 = count([str(sliced)], "/tmp/profile_out", k=27, cutoff_min=2,
                   batch_positions=1 << SLOG, device_store_rows=1 << rows,
                   verbose=True)
    dt = time.perf_counter() - t0
    print(f"warm(compile): {t_warm:.1f}s")
    print(f"e2e {MB}MB s=2^{SLOG}: {dt:.2f}s  stage1={r1.time:.2f}s "
          f"stage2={r2.time:.2f}s  {r2.n_total_kmers/dt/1e6:.2f} M kmers/s "
          f"(total={r2.n_total_kmers} unique={r2.n_unique_kmers})")


if __name__ == "__main__":
    main()
