"""KMCFile / KmerAPI random-access and listing (mirrors the reference's
py_kmc_api pytest strategy, tests/py_kmc_api/test_py_kmc_file.py)."""
import numpy as np
import pytest

from kmc_tpu import oracle
from kmc_tpu.api import KMCFile, KmerAPI
from kmc_tpu.runner import count

from util import random_reads, write_fastq


@pytest.fixture(scope="module")
def db(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("api")
    reads = random_reads(80, 80, seed=3, genome_len=500, n_prob=0.01)
    path = str(tmp / "db")
    count([write_fastq(tmp / "in.fq", reads)], path, k=21, cutoff_min=1,
          batch_positions=1 << 12)
    counts = oracle.count_kmers(reads, 21)
    counts = {km: min(c, 255) for km, c in counts.items()}
    return path, reads, counts


def test_open_info(db):
    path, reads, counts = db
    f = KMCFile()
    assert f.OpenForRA(path)
    info = f.Info()
    assert info.kmer_length == 21
    assert info.total_kmers == len(counts)
    assert info.both_strands
    assert f.KmerCount() == len(counts)
    assert f.Close()


def test_open_missing(tmp_path):
    f = KMCFile()
    assert not f.OpenForRA(str(tmp_path / "nope"))


def test_listing(db):
    path, reads, counts = db
    f = KMCFile()
    assert f.OpenForListing(path)
    kmer = KmerAPI()
    got = {}
    while True:
        ok, c = f.ReadNextKmer(kmer)
        if not ok:
            break
        got[kmer.to_string()] = c
    assert got == counts
    # listing returns sorted order
    assert list(got) == sorted(got)
    # restart works
    assert f.RestartListing()
    ok, _ = f.ReadNextKmer(kmer)
    assert ok


def test_check_kmer(db):
    path, reads, counts = db
    f = KMCFile()
    f.OpenForRA(path)
    for km, c in list(counts.items())[:50]:
        found, got = f.CheckKmer(km)
        assert found and got == c
        # non-canonical form must also be found (both-strands db)
        found, got = f.CheckKmer(oracle.revcomp(km))
        assert found and got == c
    assert f.CheckKmer("A" * 21)[0] == ("A" * 21 in counts or oracle.revcomp("A" * 21) in counts)
    assert not f.CheckKmer("ACGT")[0]  # wrong length
    assert not f.CheckKmer("N" * 21)[0]


def test_counter_filters(db):
    path, reads, counts = db
    f = KMCFile()
    f.OpenForRA(path)
    f.SetMinCount(2)
    expected = sum(1 for c in counts.values() if c >= 2)
    assert f.KmerCount() == expected
    km1 = next(km for km, c in counts.items() if c == 1)
    assert not f.CheckKmer(km1)[0]


def test_get_counters_for_read(db):
    path, reads, counts = db
    f = KMCFile()
    f.OpenForRA(path)
    k = 21
    for read in reads[:20]:
        ok, got = f.GetCountersForRead(read)
        assert ok
        expect = []
        for i in range(len(read) - k + 1):
            km = read[i : i + k]
            if any(ch not in "ACGT" for ch in km):
                expect.append(0)
            else:
                rc = oracle.revcomp(km)
                canon = min(km, rc)
                expect.append(counts.get(canon, 0))
        assert got == expect, read


def test_kmer_api_roundtrip():
    kmer = KmerAPI()
    assert kmer.from_string("ACGTACGTAC")
    assert kmer.to_string() == "ACGTACGTAC"
    kmer.reverse()
    assert kmer.to_string() == oracle.revcomp("ACGTACGTAC")
    assert not kmer.from_string("ACGTN")
