"""Drop-in compatibility surfaces: py_kmc_api shim, KFF in/out for tools."""
import sys
from pathlib import Path

import numpy as np
import pytest

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
    # info on a KFF file (the reference's exact layout,
    # kmc_tools.cpp:158-220)
    text = db_ops.db_info_text(kff_out)
    assert "This is KFF file, summary:" in text
    assert f"k             :  {k}" in text
    assert "footer values:" in text and "tot_nb_blocks :  " in text


def test_kff_minimizer_sections_display_but_refuse_data(tmp_path):
    """Parity with the reference on KFF minimizer sections: `info` lists
    them (kmc_tools.cpp:174-210) via the footer/index walk, while every
    k-mer data path refuses them (the reference's KFF db reader cannot
    consume them either, kff_db_reader.h:16)."""
    import struct

    from kmc_tpu.formats.kff import read_kff_meta
    from kmc_tpu.formats.streaming import DbStreamReader
    from kmc_tpu.tools import db_ops

    k, m = 21, 7
    path = str(tmp_path / "mini.kff")
    buf = bytearray()

    def be(x):
        return struct.pack(">Q", x)

    index = []
    buf += b"KFF" + bytes([1, 0, 0b00011011, 1, 1]) + struct.pack(">I", 0)
    index.append(len(buf))
    pairs = [(b"k", k), (b"m", m), (b"max", 1), (b"data_size", 1),
             (b"ordered", 1)]
    buf += b"v" + be(len(pairs))
    for name, val in pairs:
        buf += name + b"\x00" + be(val)
    # one minimizer section: packed minimizer, nb_blocks, then opaque
    # block payload (the walker must not need to understand it)
    index.append(len(buf))
    buf += b"m" + bytes([0xAB, 0xCD]) + be(3) + b"\x00" * 17
    # index + footer exactly like KffWriter.close()
    nb_sections = len(index) + 1
    index_start = len(buf)
    index_end = index_start + 1 + 8 + nb_sections * 9 + 8
    buf += b"i" + be(nb_sections)
    buf += b"v" + struct.pack(">q", index[0] - index_end)
    buf += b"m" + struct.pack(">q", index[1] - index_end)
    buf += b"v" + struct.pack(">q", 0)
    buf += struct.pack(">q", 0)  # next_index
    footer = [(b"first_index", index_start), (b"min_count", 1),
              (b"max_count", 255), (b"counter_size", 1)]
    footer_size = 1 + 8 + sum(len(n) + 1 + 8 for n, _ in footer)
    footer_size += len(b"footer_size") + 1 + 8
    footer.append((b"footer_size", footer_size))
    buf += b"v" + be(len(footer))
    for name, val in footer:
        buf += name + b"\x00" + be(val)
    buf += b"KFF"
    open(path, "wb").write(bytes(buf))

    meta = read_kff_meta(path)
    assert meta.k == k and meta.minimizer_size == m
    assert len(meta.m_sections) == 1
    off, nb, mini = meta.m_sections[0]
    assert nb == 3 and mini == bytes([0xAB, 0xCD])

    text = db_ops.db_info_text(path)
    # the reference labels every data section "raw" (its minimizer info
    # reader sets type RAW too, kff_info_reader.cpp:289) and prints the
    # minimizer hex bytes after it
    assert "minimizer (HEX) :  ab cd" in text
    assert f"m             :  {m}" in text

    with pytest.raises(NotImplementedError):
        DbStreamReader(path)


def test_kff_meta_mutation_fuzz(tmp_path):
    """Single-byte corruptions of a valid KFF must make read_kff_meta
    either parse or raise cleanly — never hang or exhaust memory (the
    index walk guards cycles/absurd counts, variable names fail fast at
    EOF)."""
    from kmc_tpu.formats.kff import KffWriter, read_kff_meta

    path = str(tmp_path / "seed.kff")
    w = KffWriter(path, canonical=True, k=9, counter_size=1,
                  min_count=1, max_count=255)
    kmers = np.arange(12, dtype=np.uint64)
    kb = (9 + 3) // 4
    arr = np.zeros((12, kb), np.uint8)
    arr[:, -1] = kmers.astype(np.uint8)
    w.store_section(arr, np.full(12, 2, np.uint32))
    w.close()
    seed = bytearray(open(path, "rb").read())

    rng = np.random.default_rng(0)
    mpath = str(tmp_path / "mut.kff")
    for _ in range(300):
        buf = bytearray(seed)
        pos = int(rng.integers(0, len(buf)))
        buf[pos] ^= int(rng.integers(1, 256))
        open(mpath, "wb").write(bytes(buf))
        try:
            read_kff_meta(mpath)
        except Exception:
            pass  # clean failure is fine; hangs/OOM are the bug


def test_kff_meta_truncation_raises_valueerror(tmp_path):
    """Truncated KFF files must raise ValueError from read_kff_meta — not
    struct.error (which escapes the OSError/ValueError contract callers
    catch), and never parse as a valid empty database (the 13-byte
    header+free_size+'v' stub used to return KffMeta(k=0, sections=[]))."""
    from kmc_tpu.formats.kff import KffWriter, read_kff_meta

    path = str(tmp_path / "seed.kff")
    w = KffWriter(path, canonical=True, k=9, counter_size=1,
                  min_count=1, max_count=255)
    kb = (9 + 3) // 4
    arr = np.zeros((12, kb), np.uint8)
    arr[:, -1] = np.arange(12, dtype=np.uint8)
    w.store_section(arr, np.full(12, 2, np.uint32))
    w.close()
    seed = open(path, "rb").read()

    tpath = str(tmp_path / "trunc.kff")
    for cut in (5, 13, 60, len(seed) - 5):
        open(tpath, "wb").write(seed[:cut])
        with pytest.raises(ValueError):
            read_kff_meta(tpath)


def test_kff_meta_zeroed_first_index_falls_back(tmp_path):
    """A footer whose first_index is zeroed (single-byte corruption) must
    not read as an empty database: the indexed walk yields no positions,
    and the meta walk falls back to the sequential scan."""
    from kmc_tpu.formats.kff import KffWriter, read_kff_meta

    path = str(tmp_path / "seed.kff")
    w = KffWriter(path, canonical=True, k=9, counter_size=1,
                  min_count=1, max_count=255)
    kb = (9 + 3) // 4
    arr = np.zeros((12, kb), np.uint8)
    arr[:, -1] = np.arange(12, dtype=np.uint8)
    w.store_section(arr, np.full(12, 2, np.uint32))
    w.close()
    good = read_kff_meta(path)

    raw = bytearray(open(path, "rb").read())
    i = raw.rindex(b"first_index\x00") + len(b"first_index\x00")
    raw[i : i + 8] = (0).to_bytes(8, "big")
    zpath = str(tmp_path / "zero_idx.kff")
    open(zpath, "wb").write(bytes(raw))

    meta = read_kff_meta(zpath)
    assert meta.k == good.k == 9
    assert [n for _, n in meta.sections] == [n for _, n in good.sections]


@pytest.mark.parametrize("k", [13, 21])  # 13 → KMC1 header, 21 → KMC2
def test_kmc_pre_mutation_fuzz(tmp_path, k):
    """Single-byte corruptions of a valid .kmc_pre must make read_pre_meta /
    read_db either parse or raise cleanly — never hang or allocate absurd
    buffers (header range checks bound every size the way the reference's
    parameter validation does, kmc_runner.cpp:189-258)."""
    from kmc_tpu.formats.kmc_db import read_db, read_pre_meta

    _, db, _ = _make_db(tmp_path, seed=11, k=k)
    seed = bytearray(open(db + ".kmc_pre", "rb").read())

    rng = np.random.default_rng(1)
    for _ in range(300):
        buf = bytearray(seed)
        pos = int(rng.integers(0, len(buf)))
        buf[pos] ^= int(rng.integers(1, 256))
        open(db + ".kmc_pre", "wb").write(bytes(buf))
        try:
            read_pre_meta(db)
            read_db(db)
        except Exception:
            pass  # clean failure is fine; hangs/OOM are the bug
    open(db + ".kmc_pre", "wb").write(bytes(seed))
    read_db(db)  # seed must still parse


def test_kmc_pre_truncation_and_suf_mismatch(tmp_path):
    """Truncated .kmc_pre raises ValueError (not struct.error), and a
    .kmc_suf whose size disagrees with the header's record count is
    rejected instead of silently reading fewer records."""
    from kmc_tpu.formats.kmc_db import read_db, read_pre_meta

    _, db, _ = _make_db(tmp_path, seed=12, k=13)
    pre = open(db + ".kmc_pre", "rb").read()
    suf = open(db + ".kmc_suf", "rb").read()

    for cut in (0, 3, 8, 40, len(pre) - 5):
        open(db + ".kmc_pre", "wb").write(pre[:cut])
        with pytest.raises((ValueError, OSError)):
            read_pre_meta(db)
    open(db + ".kmc_pre", "wb").write(pre)

    open(db + ".kmc_suf", "wb").write(suf[: len(suf) - 8])
    with pytest.raises(ValueError):
        read_db(db)
    open(db + ".kmc_suf", "wb").write(suf)
    read_db(db)
