"""Drop-in compatibility surfaces: py_kmc_api shim, KFF in/out for tools."""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from kmc_tpu import oracle
from kmc_tpu.runner import count


def _make_db(tmp_path, seed=5, k=21):
    rng = np.random.default_rng(seed)
    reads = tmp_path / "r.fastq"
    with open(reads, "w") as f:
        for i in range(100):
            seq = "".join("ACGT"[c] for c in rng.integers(0, 4, 120))
            f.write(f"@r{i}\n{seq}\n+\n{'I' * 120}\n")
    out = str(tmp_path / "db")
    count([str(reads)], out, k=k, cutoff_min=1, batch_positions=1 << 12)
    return str(reads), out, k


def test_py_kmc_api_shim(tmp_path):
    import py_kmc_api as pka

    reads, db, k = _make_db(tmp_path)
    f = pka.KMCFile()
    assert f.OpenForListing(db)
    info = f.Info()
    assert info.kmer_length == k
    kmer = pka.KmerAPI(k)
    cnt = pka.Count()
    n = 0
    first = None
    while f.ReadNextKmer(kmer, cnt):
        if first is None:
            first = str(kmer)
        assert cnt.value >= 1
        n += 1
    assert n == info.total_kmers
    # out-param CheckKmer
    assert f.OpenForRA(db)
    k2 = pka.KmerAPI(k)
    assert k2.from_string(first)
    assert f.CheckKmer(k2, cnt)
    assert cnt.value >= 1
    # CountVec GetCountersForRead
    vec = pka.CountVec()
    read_seq = first + "ACGT"
    assert f.GetCountersForRead(read_seq, vec)
    assert len(vec.value) == len(read_seq) - k + 1


def test_tools_kff_roundtrip(tmp_path):
    from kmc_tpu.tools import db_ops

    reads, db, k = _make_db(tmp_path, seed=6)
    kff_out = str(tmp_path / "out.kff")
    db_ops.transform_sort(db, kff_out)  # KMC db -> sorted KFF output
    info, kmers, counts = db_ops.load_sorted(kff_out)  # KFF input
    info2, kmers2, counts2 = db_ops.load_sorted(db)
    assert np.array_equal(kmers, kmers2)
    assert np.array_equal(counts, counts2)
    # info on a KFF file
    text = db_ops.db_info_text(kff_out)
    assert "KFF" in text and f"k                 : {k}" in text
