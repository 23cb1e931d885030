#!/usr/bin/env python
"""Measure host parse throughput: serial vs N-thread parallel_code_stream.

    python tools/profile_parse.py <fastq files...> [--threads N]

On a multi-core host the parallel stream should scale with threads (the C
parsers release the GIL); on the 1-core bench host the two should match.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def drain(gen):
    n = 0
    for c in gen:
        n += len(c)
    return n


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    threads = 4
    for a in sys.argv[1:]:
        if a.startswith("--threads"):
            threads = int(a.split("=")[1])
    fmt = "fasta" if args[0].endswith((".fa", ".fasta", ".fa.gz")) else "fastq"

    from kmc_tpu.io import readers

    t0 = time.perf_counter()
    st = readers.ParseState()
    n = drain(readers.file_code_stream(args, fmt, st))
    t_serial = time.perf_counter() - t0
    print(f"serial:   {n/1e6:8.1f} M codes  {t_serial:6.2f}s  "
          f"{n/t_serial/1e6:7.1f} M codes/s  ({st.n_reads} reads)")

    for nt in (2, threads):
        t0 = time.perf_counter()
        st2 = readers.ParseState()
        n2 = drain(readers.parallel_code_stream(args, fmt, st2,
                                                n_threads=nt))
        t_par = time.perf_counter() - t0
        assert n2 == n and st2.n_reads == st.n_reads, "stream mismatch!"
        print(f"{nt}-thread: {n2/1e6:8.1f} M codes  {t_par:6.2f}s  "
              f"{n2/t_par/1e6:7.1f} M codes/s  ({t_serial/t_par:.2f}x)")


if __name__ == "__main__":
    main()
