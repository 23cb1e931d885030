#!/usr/bin/env python
"""API usage example: dump a KMC database as text via the listing API.

Mirrors the reference's py_kmc_api/py_kmc_dump.py (and the C++
kmc_dump_sample): open for listing, iterate ReadNextKmer, print
"KMER\tCOUNT" lines.

    python examples/py_kmc_dump.py <kmc_database> [output_file]
"""
import sys

from kmc_tpu.api import KMCFile, KmerAPI


def main(argv):
    if not argv:
        print(__doc__)
        return 1
    db_path = argv[0]
    out = open(argv[1], "w") if len(argv) > 1 else sys.stdout

    kmer_db = KMCFile()
    if not kmer_db.OpenForListing(db_path):
        print(f"ERROR: cannot open {db_path}", file=sys.stderr)
        return 1
    info = kmer_db.Info()
    print(
        f"# k={info.kmer_length} counter_size={info.counter_size} "
        f"total_kmers={info.total_kmers}",
        file=sys.stderr,
    )
    kmer = KmerAPI(info.kmer_length)
    while True:
        ok, count = kmer_db.ReadNextKmer(kmer)
        if not ok:
            break
        out.write(f"{kmer}\t{count}\n")
    kmer_db.Close()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
