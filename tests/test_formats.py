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


def test_kff_block_sections_roundtrip(tmp_path):
    """KFF max>1 raw-block sections (super-k-mer compaction): written by
    KffWriter.store_block_section, decoded by read_kff — a kmc_tpu
    extension (the reference's KFF reader refuses max>1 files, its own
    TODO at kmc_tools/kff_db_reader.h:16).  Covers block expansion,
    multi-byte counters, scope switching back to max=1 sections in the
    same file, and the unindexed meta walk."""
    from kmc_tpu.formats.kff import (KffWriter, read_kff, read_kff_meta)

    rng = np.random.default_rng(11)
    k, cs = 21, 2
    kb = (k + 3) // 4

    def pack(codes):
        padded = np.zeros(kb * 4 - k, np.uint8)
        p = np.concatenate([padded, codes])
        return ((p[0::4] << 6) | (p[1::4] << 4) | (p[2::4] << 2)
                | p[3::4]).astype(np.uint8)

    # fabricate super-k-mer blocks + the expected expanded records
    blocks, want_rows, want_counts = [], [], []
    for _ in range(40):
        n = int(rng.integers(1, 9))
        codes = rng.integers(0, 4, k + n - 1).astype(np.uint8)
        counts = rng.integers(1, 60000, n).astype(np.uint32)
        blocks.append((codes, counts))
        for t in range(n):
            want_rows.append(pack(codes[t:t + k]))
            want_counts.append(counts[t])
    want_rows = np.array(want_rows)
    want_counts = np.array(want_counts, np.uint32)

    # plain trailing section after the block section (scope switch back)
    tail_rows = np.array([pack(rng.integers(0, 4, k).astype(np.uint8))
                          for _ in range(7)])
    tail_counts = rng.integers(1, 100, 7).astype(np.uint32)

    p = tmp_path / "blocks.kff"
    w = KffWriter(str(p), canonical=True, k=k, counter_size=cs,
                  min_count=1, max_count=1 << 30)
    w.store_block_section(blocks)
    w.store_section(tail_rows, tail_counts)
    w.close()

    kf = read_kff(str(p))
    assert kf.k == k and kf.counter_size == cs
    assert np.array_equal(kf.kmers, np.concatenate([want_rows, tail_rows]))
    assert np.array_equal(kf.counts,
                          np.concatenate([want_counts, tail_counts]))
    meta = read_kff_meta(str(p))
    assert meta.max_in_block >= 2

    # the same records as a plain max=1 file: tools outputs must be
    # byte-identical (block files lexsort through the in-memory path)
    import subprocess, filecmp
    from kmc_tpu import tools_cli

    p1 = tmp_path / "plain.kff"
    all_rows = np.concatenate([want_rows, tail_rows])
    all_counts = np.concatenate([want_counts, tail_counts])
    # store_section's contract is sorted records (ordered=1); the block
    # file stays unsorted and goes through the in-memory lexsort path
    order = np.lexsort(tuple(all_rows[:, j]
                             for j in range(all_rows.shape[1] - 1, -1, -1)))
    w = KffWriter(str(p1), canonical=True, k=k, counter_size=cs,
                  min_count=1, max_count=1 << 30)
    w.store_section(all_rows[order], all_counts[order])
    w.close()
    outs = {}
    for tag, src in (("blk", p), ("plain", p1)):
        o = tmp_path / f"s_{tag}"
        assert tools_cli.main(["transform", str(src), "sort",
                               str(o)]) == 0
        d = tmp_path / f"d_{tag}.txt"
        assert tools_cli.main(["transform", str(src), "dump", "-s",
                               str(d)]) == 0
        outs[tag] = (o, d)
    for suf in (".kmc_pre", ".kmc_suf"):
        assert filecmp.cmp(str(outs["blk"][0]) + suf,
                           str(outs["plain"][0]) + suf, shallow=False)
    assert filecmp.cmp(outs["blk"][1], outs["plain"][1], shallow=False)

    # unindexed file: header + v + r(blocks) + KFF, no index/footer
    import struct as st
    body = bytearray()
    body += b"KFF" + bytes([1, 0, 0b00011011, 1, 1]) + st.pack(">I", 0)
    body += b"v" + st.pack(">Q", 4)
    for name, val in ((b"k", k), (b"max", 8), (b"data_size", cs),
                      (b"ordered", 0)):
        body += name + b"\x00" + st.pack(">Q", val)
    body += b"r" + st.pack(">Q", len(blocks))
    for codes, counts in blocks:
        n = len(counts)
        s = len(codes)
        body += int(n).to_bytes(1, "big")
        sb = (s + 3) // 4
        padded = np.zeros(sb * 4, np.uint8)
        padded[sb * 4 - s:] = codes
        body += ((padded[0::4] << 6) | (padded[1::4] << 4)
                 | (padded[2::4] << 2) | padded[3::4]).astype(
                     np.uint8).tobytes()
        for c in counts:
            body += int(c).to_bytes(cs, "big")
    body += b"KFF"
    p2 = tmp_path / "unindexed.kff"
    p2.write_bytes(bytes(body))
    kf2 = read_kff(str(p2))
    assert np.array_equal(kf2.kmers, want_rows)
    assert np.array_equal(kf2.counts, want_counts)
    meta2 = read_kff_meta(str(p2))  # unindexed walk skips blocks
    assert meta2.max_in_block == 8 and meta2.k == k


def test_kff_block_file_random_access(tmp_path):
    """OpenForRA on a max>1 block KFF equals RA on the same records as a
    plain max=1 file (GetCountersForRead through the wide/sorted path)."""
    from kmc_tpu.formats.kff import KffWriter, read_kff
    from kmc_tpu.api import KMCFile

    rng = np.random.default_rng(13)
    k, cs = 33, 2
    kb = (k + 3) // 4
    blocks = []
    for _ in range(30):
        n = int(rng.integers(1, 7))
        blocks.append((rng.integers(0, 4, k + n - 1).astype(np.uint8),
                       rng.integers(1, 5000, n).astype(np.uint32)))
    pb = tmp_path / "b.kff"
    w = KffWriter(str(pb), canonical=False, k=k, counter_size=cs,
                  min_count=1, max_count=1 << 30)
    w.store_block_section(blocks)
    w.close()
    kf = read_kff(str(pb))
    order = np.lexsort(tuple(kf.kmers[:, j]
                             for j in range(kb - 1, -1, -1)))
    pp = tmp_path / "p.kff"
    w = KffWriter(str(pp), canonical=False, k=k, counter_size=cs,
                  min_count=1, max_count=1 << 30)
    w.store_section(kf.kmers[order], kf.counts[order])
    w.close()
    fb, fp = KMCFile(), KMCFile()
    assert fb.OpenForRA(str(pb)) and fp.OpenForRA(str(pp))
    # queries: each block's own sequence (guaranteed hits) + random
    for codes, _ in blocks[:10]:
        q = "".join("ACGT"[c] for c in codes)
        _, a = fb.counters_for_read_array(q)
        _, b = fp.counters_for_read_array(q)
        assert np.array_equal(np.asarray(a), np.asarray(b))
        assert (np.asarray(a) > 0).all()  # every window is a member


def test_kff_block_sections_malformed(tmp_path):
    """Malformed block sections fail with ValueError (the CLI error
    contract), never a crash or silent truncation: n=0, n>max, and a
    truncated payload."""
    import struct as st
    from kmc_tpu.formats.kff import read_kff, read_kff_meta

    k, cs = 21, 1

    def build(n_field, blocks_declared=1, payload=b"\x00" * 6,
              data=b"\x05"):
        body = bytearray()
        body += b"KFF" + bytes([1, 0, 0b00011011, 1, 1]) + st.pack(">I", 0)
        body += b"v" + st.pack(">Q", 4)
        for name, val in ((b"k", k), (b"max", 8), (b"data_size", cs),
                          (b"ordered", 0)):
            body += name + b"\x00" + st.pack(">Q", val)
        body += b"r" + st.pack(">Q", blocks_declared)
        body += bytes([n_field]) + payload + data
        body += b"KFF"
        return body

    p = tmp_path / "bad.kff"
    # n = 0 (below 1)
    p.write_bytes(bytes(build(0)))
    for fn in (read_kff, read_kff_meta):
        with pytest.raises(ValueError):
            fn(str(p))
    # n = 9 > max = 8
    p.write_bytes(bytes(build(9)))
    for fn in (read_kff, read_kff_meta):
        with pytest.raises(ValueError):
            fn(str(p))
    # truncated: block claims 8 k-mers but payload is short
    p.write_bytes(bytes(build(8)))
    with pytest.raises(ValueError):
        read_kff(str(p))
