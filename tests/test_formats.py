"""KMC database format round-trip tests."""
import numpy as np
import pytest

from kmc_tpu.formats import (
    DbInfo,
    Kmc2DbWriter,
    dump_db,
    read_db,
    sorted_records,
    write_kmc1_db,
    kmers_bytes_to_strings,
    pick_lut_prefix_len,
)
from kmc_tpu.signatures import map_size


def _random_kmers(n, k, seed=0):
    rng = np.random.default_rng(seed)
    kb = (k + 3) // 4
    km = rng.integers(0, 256, size=(n, kb), dtype=np.uint8).astype(np.uint8)
    # clear padding bits above 2k
    pad_bits = kb * 8 - 2 * k
    if pad_bits:
        km[:, 0] &= (1 << (8 - pad_bits)) - 1
    # unique + sorted
    km = np.unique(km.view([("", np.uint8)] * kb)).view(np.uint8).reshape(-1, kb)
    return km


def test_kmc2_roundtrip():
    k, lpl, sig_len = 27, 7, 9
    n_bins = 8
    info = DbInfo(
        kmer_len=k, counter_size=2, lut_prefix_len=lpl, signature_len=sig_len,
        cutoff_min=1, cutoff_max=1000, both_strands=True, n_bins=n_bins,
    )
    # fake sig map: spread signatures across bins
    smap = (np.arange(map_size(sig_len), dtype=np.int64) % n_bins).astype(np.int32)
    rng = np.random.default_rng(1)
    all_kmers, all_counts = [], []
    w = Kmc2DbWriter("/tmp/test_db2", info, smap)
    for b in range(n_bins):
        km = _random_kmers(rng.integers(5, 50), k, seed=b)
        counts = rng.integers(1, 1000, size=len(km)).astype(np.uint32)
        stats = {"n_unique": len(km), "n_below_min": 0, "n_above_max": 0,
                 "n_total": int(counts.sum())}
        w.put_bin(b, km, counts, stats)
        all_kmers.append(km)
        all_counts.append(counts)
    w.close()

    db = read_db("/tmp/test_db2")
    assert db.info.kmer_len == k
    assert db.info.lut_prefix_len == lpl
    assert db.info.signature_len == sig_len
    assert db.info.counter_size == 2
    assert db.info.both_strands
    assert db.info.n_bins == n_bins
    assert db.info.version == 0x200

    got_k = db.kmers_bytes()
    got_c = db.counters()
    exp_k = np.concatenate(all_kmers)
    exp_c = np.concatenate(all_counts)
    assert got_k.shape == exp_k.shape
    np.testing.assert_array_equal(got_k, exp_k)
    np.testing.assert_array_equal(got_c, exp_c)

    # bin ids reconstruct correctly
    bins = db.bin_ids()
    exp_bins = np.concatenate([np.full(len(kk), b) for b, kk in enumerate(all_kmers)])
    np.testing.assert_array_equal(bins, exp_bins)


def test_kmc2_sorted_dump():
    k, lpl, sig_len = 19, 7, 7
    info = DbInfo(kmer_len=k, counter_size=1, lut_prefix_len=lpl,
                  signature_len=sig_len, n_bins=4)
    smap = (np.arange(map_size(sig_len), dtype=np.int64) % 4).astype(np.int32)
    w = Kmc2DbWriter("/tmp/test_db3", info, smap)
    rng = np.random.default_rng(2)
    all_rows = []
    for b in range(4):
        km = _random_kmers(20, k, seed=10 + b)
        counts = rng.integers(1, 255, size=len(km)).astype(np.uint32)
        w.put_bin(b, km, counts, {"n_unique": len(km), "n_below_min": 0,
                                  "n_above_max": 0, "n_total": int(counts.sum())})
        for row, c in zip(kmers_bytes_to_strings(km, k), counts):
            all_rows.append((row, int(c)))
    w.close()
    db = read_db("/tmp/test_db3")
    text = dump_db(db)
    expect = "".join(f"{s}\t{c}\n" for s, c in sorted(all_rows))
    assert text == expect


def test_kmc1_roundtrip():
    k = 11
    info = DbInfo(kmer_len=k, counter_size=1, lut_prefix_len=3, cutoff_min=1,
                  cutoff_max=255, both_strands=True, version=0)
    km = _random_kmers(100, k, seed=5)
    counts = np.random.default_rng(3).integers(1, 255, size=len(km)).astype(np.uint32)
    write_kmc1_db("/tmp/test_db1", info, km, counts)
    db = read_db("/tmp/test_db1")
    assert db.info.version == 0
    assert db.info.kmer_len == k
    assert db.info.n_unique_stored == len(km)
    np.testing.assert_array_equal(db.kmers_bytes(), km)
    np.testing.assert_array_equal(db.counters(), counts)


def test_kmer_strings():
    k = 6
    km = np.array([[0x01, 0xB1]], dtype=np.uint8)  # 0b0000_0001_1011_0001
    # 12 bits used: 00 01 10 11 00 01 -> ACGTAC
    assert kmers_bytes_to_strings(km, k) == ["ACGTAC"]


def test_pick_lut_prefix_len_suffix_multiple_of_4():
    for k in range(14, 257):
        lpl = pick_lut_prefix_len(k, 512, 1_000_000)
        assert 2 <= lpl <= 15
        assert (k - lpl) % 4 == 0


def test_dump_records_vectorized_matches_fstring():
    """The vectorized dump (fixed-width rows + NUL-gap translate) must be
    char-identical to the naive per-row formatter across digit-count
    boundaries (0, 9/10, 99/100, u32/u64 edge) and chunk boundaries."""
    from kmc_tpu.formats.dump import dump_records

    rng = np.random.default_rng(3)
    for k in (1, 13, 27, 256):
        kb = (k + 3) // 4
        n = 300
        km = rng.integers(0, 256, (n, kb), dtype=np.uint8)
        pad = kb * 4 - k
        if pad:
            km[:, 0] &= (1 << (2 * (4 - pad))) - 1 if pad < 4 else 0
        cnts = np.concatenate([
            np.array([0, 1, 9, 10, 11, 99, 100, 101, 255, 256, 999, 1000,
                      65535, 2**32 - 1, 2**32, 2**63], dtype=np.uint64),
            rng.integers(0, 10**6, n - 16, dtype=np.uint64)])
        strs = kmers_bytes_to_strings(km, k)
        want = "".join(f"{s}\t{int(c)}\n" for s, c in zip(strs, cnts))
        assert dump_records(km, cnts, k) == want
        assert dump_records(km, cnts, k, chunk_rows=7) == want
    assert dump_records(np.zeros((0, 7), np.uint8),
                        np.zeros(0, np.uint64), 27) == ""
