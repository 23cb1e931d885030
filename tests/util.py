"""Shared test helpers: synthetic read generation and oracle comparison."""
from __future__ import annotations

import random
from pathlib import Path


def random_reads(n_reads: int, read_len: int, seed: int = 0, n_prob: float = 0.0,
                 genome_len: int | None = None):
    """Reads sampled from a random genome (so k-mers repeat across reads)."""
    rng = random.Random(seed)
    if genome_len is None:
        genome_len = max(read_len * 4, n_reads * read_len // 8)
    genome = "".join(rng.choice("ACGT") for _ in range(genome_len))
    reads = []
    for _ in range(n_reads):
        start = rng.randrange(0, genome_len - read_len + 1)
        read = genome[start : start + read_len]
        if n_prob > 0:
            read = "".join(
                "N" if rng.random() < n_prob else ch for ch in read
            )
        reads.append(read)
    return reads


def write_fastq(path, reads):
    with open(path, "w") as f:
        for i, r in enumerate(reads):
            f.write(f"@read{i}\n{r}\n+\n{'I' * len(r)}\n")
    return str(path)


def write_fasta(path, reads, line_width: int | None = None):
    with open(path, "w") as f:
        for i, r in enumerate(reads):
            f.write(f">read{i}\n")
            if line_width:
                for j in range(0, len(r), line_width):
                    f.write(r[j : j + line_width] + "\n")
            else:
                f.write(r + "\n")
    return str(path)


def write_fastq_gz(path, reads):
    import gzip

    with gzip.open(path, "wt") as f:
        for i, r in enumerate(reads):
            f.write(f"@read{i}\n{r}\n+\n{'I' * len(r)}\n")
    return str(path)
