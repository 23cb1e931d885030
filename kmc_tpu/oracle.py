"""Trivial, obviously-correct k-mer counter used as the test oracle.

Models the reference's differential-test oracle
(/root/reference/tests/kmc_CLI/trivial-k-mer-counter/main.cpp): a hash-map
counter with canonicalization and ci/cx/cs handling.  Pure Python — slow, but
independent of every other module in this package.
"""
from __future__ import annotations

import gzip
from collections import Counter
from pathlib import Path

_COMP = str.maketrans("ACGT", "TGCA")
_CODE = {"A": 0, "C": 1, "G": 2, "T": 3}


def revcomp(s: str) -> str:
    return s.translate(_COMP)[::-1]


def kmer_to_int(s: str) -> int:
    v = 0
    for ch in s:
        v = (v << 2) | _CODE[ch]
    return v


def int_to_kmer(v: int, k: int) -> str:
    out = []
    for i in range(k):
        out.append("ACGT"[(v >> (2 * (k - 1 - i))) & 3])
    return "".join(out)


def homopolymer_compress(seq: str) -> str:
    if not seq:
        return seq
    out = [seq[0]]
    for ch in seq[1:]:
        if ch != out[-1]:
            out.append(ch)
    return "".join(out)


def count_kmers(
    seqs,
    k: int,
    both_strands: bool = True,
    homopolymer_compressed: bool = False,
) -> Counter:
    """Count (canonical) k-mers of every sequence; k-mers containing
    non-ACGT characters are skipped (reference splitter.cpp:566-676)."""
    counts: Counter = Counter()
    for seq in seqs:
        seq = seq.upper()
        if homopolymer_compressed:
            seq = homopolymer_compress(seq)
        n = len(seq)
        for i in range(n - k + 1):
            km = seq[i : i + k]
            if any(c not in _CODE for c in km):
                continue
            if both_strands:
                rc = revcomp(km)
                if rc < km:
                    km = rc
            counts[km] += 1
    return counts


def apply_cutoffs(counts: Counter, cutoff_min: int, cutoff_max: int, counter_max: int):
    """Returns (records, stats): records = sorted [(kmer, clamped_count)],
    stats = dict with n_unique/n_below/n_above/n_total matching the
    reference's Stage2Results semantics (kb_sorter.h:1010-1060)."""
    n_unique = len(counts)
    n_total = sum(counts.values())
    n_below = sum(1 for c in counts.values() if c < cutoff_min)
    n_above = sum(1 for c in counts.values() if c > cutoff_max)
    records = sorted(
        (km, min(c, counter_max))
        for km, c in counts.items()
        if cutoff_min <= c <= cutoff_max
    )
    stats = {
        "n_unique": n_unique,
        "n_below_min": n_below,
        "n_above_max": n_above,
        "n_total": n_total,
    }
    return records, stats


def dump_text(records) -> str:
    """Reference dump format: KMER\\tCOUNT\\n, sorted (dump_writer.h:241)."""
    return "".join(f"{km}\t{c}\n" for km, c in records)


def read_sequences(path, fmt: str = "fastq"):
    """Minimal FASTQ/FASTA reader (gz ok) returning a list of sequences."""
    path = Path(path)
    opener = gzip.open if path.suffix == ".gz" else open
    seqs = []
    with opener(path, "rt") as f:
        if fmt == "fastq":
            while True:
                header = f.readline()
                if not header:
                    break
                seq = f.readline().strip()
                f.readline()
                f.readline()
                seqs.append(seq)
        elif fmt in ("fasta", "multifasta"):
            cur = []
            for line in f:
                line = line.strip()
                if line.startswith(">"):
                    if cur:
                        seqs.append("".join(cur))
                        cur = []
                else:
                    cur.append(line)
            if cur:
                seqs.append("".join(cur))
        else:
            raise ValueError(f"unknown format {fmt}")
    return seqs


def oracle_count_file(
    path,
    k: int,
    fmt: str = "fastq",
    both_strands: bool = True,
    cutoff_min: int = 2,
    cutoff_max: int = 10**9,
    counter_max: int = 255,
    homopolymer_compressed: bool = False,
):
    seqs = read_sequences(path, fmt)
    counts = count_kmers(seqs, k, both_strands, homopolymer_compressed)
    return apply_cutoffs(counts, cutoff_min, cutoff_max, counter_max)
