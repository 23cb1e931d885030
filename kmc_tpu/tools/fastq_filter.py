"""kmc_tools `filter`: filter FASTQ/FASTA reads by k-mer presence in a DB.

Reference: kmc_tools/fastq_filter.{h,cpp} + kmc_tools.cpp:226-345.  A read
passes when the number of its k-mers present in the database (within the
database's counter filter) falls inside [min, max]; bounds <= 1.0 are
interpreted as fractions of the read's k-mer count, larger values as
absolute counts.  `trim` keeps the longest prefix of consecutive present
k-mers; `hard_mask` replaces bases of absent k-mers with 'N'.
"""
from __future__ import annotations

import gzip
from pathlib import Path

import numpy as np

from ..api import KMCFile


def _open(path, mode):
    if str(path).endswith(".gz"):
        return gzip.open(path, mode)
    return open(path, mode)


def filter_fastq(
    db_path: str,
    input_path: str,
    output_path: str,
    min_fraction: float = 0.0,
    max_fraction: float = 1.0,
    trim: bool = False,
    hard_mask: bool = False,
):
    db = KMCFile()
    if not db.OpenForRA(db_path):
        raise FileNotFoundError(f"cannot open database {db_path}")
    k = db.KmerLength()

    is_fasta = None
    n_kept = 0
    n_total = 0
    with _open(input_path, "rt") as fin, _open(output_path, "wt") as fout:
        while True:
            header = fin.readline()
            if not header:
                break
            if is_fasta is None:
                is_fasta = header.startswith(">")
            seq = fin.readline().rstrip("\n")
            if is_fasta:
                plus = qual = None
            else:
                plus = fin.readline()
                qual = fin.readline().rstrip("\n")
            n_total += 1
            _, counters = db.GetCountersForRead(seq)
            counters = np.asarray(counters)
            n_kmers = len(counters)
            if n_kmers == 0:
                continue
            present = counters > 0
            n_present = int(present.sum())
            lo = min_fraction * n_kmers if min_fraction <= 1.0 else min_fraction
            hi = max_fraction * n_kmers if max_fraction <= 1.0 else max_fraction
            if trim:
                # longest prefix of consecutive present k-mers -> keep
                # prefix_len + k - 1 bases (fastq_filter.h trim semantics)
                if not present[0]:
                    continue
                run = int(np.argmin(present)) if not present.all() else n_kmers
                seq = seq[: run + k - 1]
                if qual is not None:
                    qual = qual[: run + k - 1]
            elif hard_mask:
                mask = np.ones(len(seq), dtype=bool)
                absent = ~present
                for i in np.flatnonzero(absent):
                    mask[i : i + k] = False
                seq = "".join(c if m else "N" for c, m in zip(seq, mask))
            elif not (lo <= n_present <= hi):
                continue
            n_kept += 1
            if is_fasta:
                fout.write(f"{header.rstrip()}\n{seq}\n")
            else:
                fout.write(f"{header.rstrip()}\n{seq}\n+\n{qual}\n")
    return n_kept, n_total
