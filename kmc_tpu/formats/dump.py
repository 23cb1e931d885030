"""Text dump of a KMC database (kmc_tools transform dump equivalent).

Format: one `KMER\\tCOUNT\\n` line per stored k-mer, in ascending k-mer order
(reference: kmc_tools/dump_writer.h:120-160,241).
"""
from __future__ import annotations

import numpy as np

from .kmc_db import KmcDb, kmers_bytes_to_strings, read_db, sorted_records


def dump_records(kmers: np.ndarray, counts: np.ndarray, k: int) -> str:
    strs = kmers_bytes_to_strings(kmers, k)
    counts = np.asarray(counts)
    return "".join(f"{s}\t{int(c)}\n" for s, c in zip(strs, counts))


def dump_db(db: KmcDb, sorted_output: bool = True) -> str:
    kmers, counts = sorted_records(db)
    return dump_records(kmers, counts, db.info.kmer_len)


def dump_db_file(path_prefix: str, out_path: str | None = None, sorted_output: bool = True) -> str:
    text = dump_db(read_db(path_prefix), sorted_output)
    if out_path is not None:
        with open(out_path, "w") as f:
            f.write(text)
    return text
