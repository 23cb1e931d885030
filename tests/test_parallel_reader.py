"""Multi-threaded host ingest (io/readers.py::parallel_code_stream): the
parallel chunk stream must be a boundary refinement of the serial stream —
identical concatenated codes, identical read counts, identical DBs.
Reference analogue: the reader/splitter thread pool (kmc.h:234-294)."""
import gzip

import numpy as np
import pytest

from kmc_tpu.io import readers
from kmc_tpu.io.native import get_lib

from util import random_reads, write_fasta, write_fastq

pytestmark = pytest.mark.skipif(
    get_lib() is None, reason="native parser unavailable")


def _cat(gen):
    chunks = list(gen)
    return (np.concatenate(chunks) if chunks
            else np.zeros(0, np.uint8))


def _assert_streams_match(paths, fmt, n_threads=3):
    s1 = readers.ParseState()
    serial = _cat(readers.file_code_stream(paths, fmt, s1))
    s2 = readers.ParseState()
    par = _cat(readers.parallel_code_stream(paths, fmt, s2,
                                            n_threads=n_threads))
    assert np.array_equal(serial, par)
    assert s1.n_reads == s2.n_reads


def test_multi_file_fastq(tmp_path):
    paths = []
    for i in range(5):
        reads = random_reads(40, 90, seed=i)
        paths.append(write_fastq(tmp_path / f"in{i}.fastq", reads))
    _assert_streams_match(paths, "fastq")


def test_single_big_fastq_byte_range_split(tmp_path, monkeypatch):
    # force byte-range sharding on a small file
    monkeypatch.setattr(readers, "CHUNK_BYTES", 1 << 12)
    reads = random_reads(4000, 120, seed=3)
    path = write_fastq(tmp_path / "big.fastq", reads)
    import os
    size = os.path.getsize(path)
    shards = readers._file_shards(str(path), "fastq", 4,
                                  min_shard_bytes=size // 6)
    assert len(shards) > 1, "file did not split"
    _assert_streams_match([path], "fastq")


def test_fastq_quality_at_sign_ambiguity(tmp_path, monkeypatch):
    """Quality strings starting with '@' and '+' must not fool the
    record-boundary scanner."""
    rng = np.random.default_rng(9)
    path = tmp_path / "tricky.fastq"
    with open(path, "w") as f:
        for i in range(3000):
            seq = "".join("ACGT"[c] for c in rng.integers(0, 4, 80))
            # qualities deliberately start with '@' or '+' and contain both
            qual = (("@" if i % 2 else "+") + "@+II" * 20)[: len(seq)]
            f.write(f"@r{i} desc\n{seq}\n+\n{qual}\n")
    import os
    size = os.path.getsize(path)
    shards = readers._file_shards(str(path), "fastq", 4,
                                  min_shard_bytes=size // 6)
    assert len(shards) > 1
    # every shard boundary must land on a true record start ('@r...')
    data = open(path, "rb").read()
    for start, _ in shards[1:]:
        assert data[start : start + 2] == b"@r", data[start : start + 8]
    _assert_streams_match([path], "fastq")


def test_single_big_fasta_split(tmp_path):
    reads = random_reads(3000, 150, seed=5)
    path = write_fasta(tmp_path / "big.fa", reads)
    import os
    size = os.path.getsize(path)
    shards = readers._file_shards(str(path), "fasta", 4,
                                  min_shard_bytes=size // 6)
    assert len(shards) > 1
    _assert_streams_match([path], "fasta")


def test_gz_files_one_shard_each(tmp_path):
    paths = []
    for i in range(3):
        reads = random_reads(60, 100, seed=10 + i)
        raw = "".join(
            f"@r{j}\n{r}\n+\n{'I' * len(r)}\n" for j, r in enumerate(reads))
        p = tmp_path / f"in{i}.fastq.gz"
        with gzip.open(p, "wt") as f:
            f.write(raw)
        paths.append(str(p))
    for p in paths:
        assert readers._file_shards(p, "fastq", 4) == [(0, -1)]
    _assert_streams_match(paths, "fastq")


def test_runner_parallel_ingest_db_identical(tmp_path):
    """End-to-end: n_threads>1 produces a byte-identical DB."""
    from kmc_tpu.formats import dump_db_file
    from kmc_tpu.runner import Stage1Params, count

    paths = []
    for i in range(4):
        reads = random_reads(200, 110, seed=20 + i, genome_len=9000)
        paths.append(write_fastq(tmp_path / f"r{i}.fastq", reads))

    out1 = str(tmp_path / "serial")
    out2 = str(tmp_path / "parallel")
    count(paths, out1, k=25, cutoff_min=1, batch_positions=1 << 12,
          n_threads=1)
    count(paths, out2, k=25, cutoff_min=1, batch_positions=1 << 12,
          n_threads=4)
    for suf in (".kmc_pre", ".kmc_suf"):
        with open(out1 + suf, "rb") as a, open(out2 + suf, "rb") as b:
            assert a.read() == b.read(), suf
    assert dump_db_file(out1) == dump_db_file(out2)


def _assert_process_shards_cover(paths, fmt, n_parts, min_shard=2048):
    """Concatenating the per-process shard streams in part order must
    reproduce the serial stream exactly (shards split at record starts, so
    no codes are lost, duplicated, or reordered)."""
    s1 = readers.ParseState()
    serial = _cat(readers.file_code_stream(paths, fmt, s1))
    parts = readers.process_input_shards(paths, fmt, n_parts,
                                         min_shard_bytes=min_shard)
    assert len(parts) == n_parts
    chunks, n_reads = [], 0
    for shard_list in parts:
        st = readers.ParseState()
        chunks.append(_cat(readers.shard_code_stream(shard_list, fmt, st,
                                                     n_threads=2)))
        n_reads += st.n_reads
    merged = np.concatenate(chunks) if chunks else np.zeros(0, np.uint8)
    assert np.array_equal(serial, merged)
    assert n_reads == s1.n_reads
    return parts


def test_process_shards_single_fastq(tmp_path):
    reads = random_reads(400, 120, seed=7)
    path = write_fastq(tmp_path / "big.fastq", reads)
    parts = _assert_process_shards_cover([path], "fastq", 3)
    # the split must be real: every part parses something
    assert all(parts)


def test_process_shards_fasta_and_gz(tmp_path):
    reads = random_reads(300, 100, seed=8)
    p1 = write_fasta(tmp_path / "a.fasta", reads)
    p2 = tmp_path / "b.fastq.gz"
    lines = []
    for i, r in enumerate(random_reads(100, 80, seed=9)):
        lines.append(f"@g{i}\n{r}\n+\n{'I' * len(r)}\n")
    with gzip.open(p2, "wt") as f:
        f.write("".join(lines))
    # fasta file shards; the gz file stays one atomic unit
    _assert_process_shards_cover([str(p1)], "fasta", 2)
    _assert_process_shards_cover([str(p2)], "fastq", 2)


def test_process_shards_numpy_fallback(tmp_path, monkeypatch):
    """shard_code_stream must fall back to the NumPy range parser when the
    native library is unavailable, with identical codes."""
    reads = random_reads(200, 110, seed=10)
    path = write_fastq(tmp_path / "fb.fastq", reads)
    parts = readers.process_input_shards([path], "fastq", 2,
                                         min_shard_bytes=2048)
    native_chunks = [
        _cat(readers.shard_code_stream(p, "fastq", readers.ParseState()))
        for p in parts
    ]
    import kmc_tpu.io.native as native_mod

    def boom(fmt):
        raise RuntimeError("forced fallback")

    monkeypatch.setattr(native_mod, "NativeParser", boom)
    st_total = 0
    for p, want in zip(parts, native_chunks):
        st = readers.ParseState()
        got = _cat(readers.shard_code_stream(p, "fastq", st))
        assert np.array_equal(want, got)
        st_total += st.n_reads
    assert st_total == 200


def _write_bgzf_gz(path, payload: bytes, block_bytes=4096):
    """bgzip-style .gz: a chain of BGZF members (BC extra field)."""
    import struct
    import zlib

    def block(p):
        co = zlib.compressobj(6, zlib.DEFLATED, -15)
        comp = co.compress(p) + co.flush()
        bsize = len(comp) + 25 + 1
        header = (b"\x1f\x8b\x08\x04" + b"\x00" * 6 + b"\x06\x00"
                  + b"BC\x02\x00" + struct.pack("<H", bsize - 1))
        return (header + comp + struct.pack("<I", zlib.crc32(p))
                + struct.pack("<I", len(p) & 0xFFFFFFFF))

    with open(path, "wb") as f:
        for lo in range(0, len(payload), block_bytes):
            f.write(block(payload[lo : lo + block_bytes]))
    return str(path)


@pytest.mark.parametrize("fmt", ["fastq", "fasta"])
def test_bgzf_gz_shards_record_aligned(tmp_path, fmt):
    """BGZF .gz inputs split at block boundaries into record-aligned
    GzShard ranges (VERDICT r4 missing #2: intra-file parallel
    decompression); the sharded stream is byte-identical to the serial
    inflate and the shard readers reproduce the decompressed stream."""
    reads = random_reads(3000, 110, seed=21)
    if fmt == "fastq":
        plain = tmp_path / "in.fastq"
        write_fastq(plain, reads)
    else:
        plain = tmp_path / "in.fasta"
        write_fasta(plain, reads)
    payload = plain.read_bytes()
    gz = _write_bgzf_gz(tmp_path / (plain.name + ".gz"), payload)

    shards = readers._file_shards(gz, fmt, 8, min_shard_bytes=1 << 14)
    assert len(shards) > 1, "BGZF file did not split"
    assert all(isinstance(a, readers.GzShard) for a, _ in shards)

    # shard readers concatenate to the exact decompressed payload
    got = []
    for a, _ in shards:
        r = readers.BgzfShardReader(gz, a)
        buf = np.empty(1 << 14, np.uint8)
        while True:
            n = r.read_into(buf)
            if not n:
                break
            got.append(buf[:n].tobytes())
        r.close()
    assert b"".join(got) == payload

    # native threaded stream over the shards == serial gz stream
    s1 = readers.ParseState()
    serial = _cat(readers.file_code_stream([gz], fmt, s1))
    s2 = readers.ParseState()
    par = _cat(readers.shard_code_stream(
        [(gz, a, b, i == len(shards) - 1)
         for i, (a, b) in enumerate(shards)], fmt, s2, n_threads=3))
    assert np.array_equal(serial, par)
    assert s1.n_reads == s2.n_reads


def test_plain_gz_stays_serial(tmp_path):
    """Non-BGZF gz (no BC field) must collapse to one serial range."""
    reads = random_reads(500, 100, seed=5)
    plain = tmp_path / "in.fastq"
    write_fastq(plain, reads)
    gz = tmp_path / "in.fastq.gz"
    gz.write_bytes(gzip.compress(plain.read_bytes()))
    shards = readers._file_shards(str(gz), "fastq", 8,
                                  min_shard_bytes=1 << 12)
    assert shards == [(0, -1)]
    _assert_streams_match([str(gz)], "fastq")


def test_bgzf_gz_crlf_and_long_reads(tmp_path):
    """BGZF sharding with CRLF line endings and reads longer than one
    BGZF block (records spanning many blocks): splits stay record-aligned
    and the stream matches the serial inflate byte-for-byte."""
    rng = np.random.default_rng(31)
    acgt = "ACGT"
    recs = []
    for i in range(60):
        seq = "".join(acgt[c] for c in rng.integers(0, 4, 9000))
        recs.append(f"@long{i}\r\n{seq}\r\n+\r\n{'I' * len(seq)}\r\n")
    payload = "".join(recs).encode()
    gz = _write_bgzf_gz(tmp_path / "long.fastq.gz", payload,
                        block_bytes=2048)
    shards = readers._file_shards(gz, "fastq", 8, min_shard_bytes=1 << 12)
    assert len(shards) > 1
    s1 = readers.ParseState()
    serial = _cat(readers.file_code_stream([gz], "fastq", s1))
    s2 = readers.ParseState()
    par = _cat(readers.shard_code_stream(
        [(gz, a, b, i == len(shards) - 1)
         for i, (a, b) in enumerate(shards)], "fastq", s2, n_threads=3))
    assert np.array_equal(serial, par)
    assert s1.n_reads == s2.n_reads == 60


def test_truncated_bgzf_gz_errors(tmp_path):
    """A BGZF gz cut mid-block must raise during sharding or streaming,
    not silently truncate (same contract as the plain-gz inflater)."""
    reads = random_reads(500, 100, seed=8)
    plain = tmp_path / "t.fastq"
    write_fastq(plain, reads)
    blob = _write_bgzf_gz(tmp_path / "t.fastq.gz", plain.read_bytes())
    raw = open(blob, "rb").read()
    cut = tmp_path / "cut.fastq.gz"
    cut.write_bytes(raw[: len(raw) - 37])  # inside the last block
    import pytest as _pytest

    with _pytest.raises(Exception):
        shards = readers._file_shards(str(cut), "fastq", 8,
                                      min_shard_bytes=1 << 12)
        s = readers.ParseState()
        for _ in readers.shard_code_stream(
                [(str(cut), a, b, i == len(shards) - 1)
                 for i, (a, b) in enumerate(shards)], "fastq", s,
                n_threads=2):
            pass


def test_batchstream_tail_interval_no_window_loss():
    """Regression (round 5): a stream whose total length lands in
    (s + k - 1, batch_len) hit BatchStream's pad-and-break tail path and
    silently DROPPED the window starts at >= s — up to batch_len-(s+k-1)
    occurrences per stream end (found via a 3-process byte-identity
    check).  Sweep every tail length across two batch boundaries and
    assert the batched window count equals the stream's true count."""
    from kmc_tpu.io.readers import BatchStream
    from kmc_tpu.ops.extract import batch_len

    k, s = 25, 64
    L = batch_len(s, k)
    for n in range(k, 2 * L + 9):
        codes = (np.arange(n, dtype=np.uint8) % 4)  # all valid
        bs = BatchStream(s, k)
        got = 0
        for batch in bs.batches(iter([codes])):
            assert len(batch) == L
            good = batch < 4
            runs = np.zeros(len(batch), np.int64)
            r = 0
            for j, g in enumerate(good):
                r = r + 1 if g else 0
                runs[j] = r
            starts = np.flatnonzero(runs >= k) - (k - 1)
            got += int(((starts >= 0) & (starts < s)).sum())
        assert got == n - k + 1, (n, got, n - k + 1)
