"""Bounded-memory streaming readers/ops (formats/streaming.py) must match
the in-memory tools (tools/db_ops.py) exactly — same strategy as the
reference's CKMC2DbReader merge (kmc_tools/kmc2_db_reader.h:400-560)."""
import numpy as np
import pytest

from kmc_tpu import oracle
from kmc_tpu.formats import dump_db_file
from kmc_tpu.formats.streaming import (
    DbStreamReader,
    stream_dump,
    stream_simple_op,
)
from kmc_tpu.runner import count
from kmc_tpu.tools import db_ops

from util import random_reads, write_fastq


@pytest.fixture(scope="module")
def dbs(tmp_path_factory):
    """Two KMC2 DBs + their read sets."""
    d = tmp_path_factory.mktemp("sdbs")
    out = []
    for i, seed in enumerate((3, 4)):
        reads = random_reads(300, 100, seed=seed, genome_len=4000)
        inp = write_fastq(d / f"in{i}.fastq", reads)
        db = str(d / f"db{i}")
        count([inp], db, k=21, cutoff_min=1, batch_positions=1 << 12)
        out.append((db, reads))
    return out


def test_stream_blocks_match_sorted_records(dbs):
    db, _ = dbs[0]
    info, kmers, counts = db_ops.load_sorted(db)
    for block in (64, 1 << 20):
        r = DbStreamReader(db, block_records=block)
        parts = list(r.blocks())
        got_k = np.concatenate([p[0] for p in parts])
        got_c = np.concatenate([p[1] for p in parts])
        assert np.array_equal(got_k, kmers)
        assert np.array_equal(got_c, counts)
        r.close()


def test_stream_blocks_small_blocks_are_bounded(dbs):
    db, _ = dbs[0]
    r = DbStreamReader(db, block_records=64)
    sizes = [len(c) for _, c in r.blocks()]
    assert sum(sizes) == r.info.n_unique_stored
    r.close()


@pytest.mark.parametrize("op,mode", [
    ("union", "sum"), ("union", "min"), ("union", "max"),
    ("intersect", "min"), ("intersect", "sum"),
    ("kmers_subtract", None), ("counters_subtract", "diff"),
    ("reverse_kmers_subtract", None),
])
def test_stream_ops_match_inmemory(dbs, tmp_path, op, mode):
    (db1, _), (db2, _) = dbs
    out_m = str(tmp_path / f"m_{op}_{mode}")
    out_s = str(tmp_path / f"s_{op}_{mode}")
    db_ops.run_simple_op(op, db1, db2, out_m, mode=mode)
    stream_simple_op(op, db1, db2, out_s, mode=mode, block_records=97)
    for suf in (".kmc_pre", ".kmc_suf"):
        with open(out_m + suf, "rb") as a, open(out_s + suf, "rb") as b:
            assert a.read() == b.read(), (op, mode, suf)


def test_stream_dump_matches(dbs, tmp_path):
    db, _ = dbs[0]
    p = tmp_path / "dump.txt"
    stream_dump(db, str(p), block_records=50)
    assert p.read_text() == dump_db_file(db)


def test_stream_kff(dbs, tmp_path):
    """KFF section cursors merge identically."""
    from kmc_tpu.tools.db_ops import OutputParams, transform_sort

    db, _ = dbs[0]
    # produce a KFF file from the DB
    info, kmers, counts = db_ops.load_sorted(db)
    from kmc_tpu.formats.kff import KffWriter

    kf = str(tmp_path / "x.kff")
    w = KffWriter(kf, canonical=True, k=info.kmer_len, counter_size=2,
                  min_count=1, max_count=255)
    # two sections to force a merge
    h = len(kmers) // 2
    w.store_section(kmers[:h], counts[:h])
    w.store_section(kmers[h:], counts[h:])
    w.close()
    r = DbStreamReader(kf, block_records=64)
    parts = list(r.blocks())
    got_k = np.concatenate([p[0] for p in parts])
    got_c = np.concatenate([p[1] for p in parts])
    assert np.array_equal(got_k, kmers)
    assert np.array_equal(got_c, counts)


def test_streaming_union_bounded_rss(tmp_path):
    """The VERDICT r1 criterion: union of DBs much bigger than the working
    budget in a capped-RSS subprocess, byte-identical to the in-memory
    union.  The subprocess avoids jax (streaming is pure NumPy) and runs
    under an address-space limit that the materialized DBs would blow."""
    import subprocess
    import sys

    # build two ~40 MB DBs (~7.4M records total) from synthetic records:
    # write KMC1-format DBs directly (the streaming path reads both formats)
    from kmc_tpu.defs import calc_counter_size
    from kmc_tpu.formats.kmc_db import DbInfo, write_kmc1_db

    k = 25
    kb = (k + 3) // 4
    rng = np.random.default_rng(0)
    paths = []
    for i in range(2):
        n = 12_000_000
        kmers = rng.integers(0, 256, size=(n, kb), dtype=np.uint8)
        kmers[:, 0] &= 0x03  # top base in range for k=25
        order = np.lexsort(tuple(kmers[:, j] for j in range(kb - 1, -1, -1)))
        kmers = kmers[order]
        dup = np.ones(n, bool)
        dup[1:] = (kmers[1:] != kmers[:-1]).any(axis=1)
        kmers = kmers[dup]
        counts = rng.integers(1, 200, size=len(kmers)).astype(np.uint32)
        info = DbInfo(kmer_len=k, counter_size=1, lut_prefix_len=5,
                      cutoff_min=1, cutoff_max=10**9)
        p = str(tmp_path / f"big{i}")
        write_kmc1_db(p, info, kmers, counts)
        paths.append(p)
        del kmers, counts

    out = str(tmp_path / "u_stream")
    script = f"""
import resource, sys
resource.setrlimit(resource.RLIMIT_AS, (450 << 20, 450 << 20))
sys.path.insert(0, {str(tmp_path.parent)!r})
import os
os.environ["KMC_TPU_NO_JAX"] = "1"
sys.path.insert(0, "/root/repo")
from kmc_tpu.formats.streaming import stream_simple_op
n = stream_simple_op("union", {paths[0]!r}, {paths[1]!r}, {out!r},
                     block_records=1 << 15)
print("records:", n)
# jax may be preloaded by the environment; what NO_JAX controls is that
# kmc_tpu itself stays host-only (no runner/device machinery)
assert "kmc_tpu.runner" not in sys.modules, "streaming pulled the runner"
"""
    r = subprocess.run([sys.executable, "-c", script],
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr

    # the cap must be binding: the in-memory path must NOT fit under it
    script_mem = f"""
import resource, sys
resource.setrlimit(resource.RLIMIT_AS, (450 << 20, 450 << 20))
import os
os.environ["KMC_TPU_NO_JAX"] = "1"
os.environ["KMC_TPU_STREAM_THRESHOLD"] = str(1 << 60)  # force in-memory
os.environ["KMC_TPU_NATIVE_TOOLS"] = "0"  # the native core is also bounded
sys.path.insert(0, "/root/repo")
from kmc_tpu.tools.db_ops import run_simple_op
try:
    run_simple_op("union", {paths[0]!r}, {paths[1]!r}, {out!r} + "_m")
except MemoryError:
    print("OOM as expected")
    sys.exit(0)
sys.exit(3)
"""
    r2 = subprocess.run([sys.executable, "-c", script_mem],
                        capture_output=True, text=True, timeout=600)
    assert r2.returncode == 0, (
        "in-memory union fit under the cap — test not binding\n"
        + r2.stdout + r2.stderr)

    # in-memory union for comparison (this process, no RSS cap)
    out_m = str(tmp_path / "u_mem")
    db_ops.run_simple_op("union", paths[0], paths[1], out_m)
    for suf in (".kmc_pre", ".kmc_suf"):
        with open(out_m + suf, "rb") as a, open(out + suf, "rb") as b:
            assert a.read() == b.read(), suf


def test_run_simple_op_delegates_to_streaming(dbs, tmp_path, monkeypatch):
    """Above the threshold (forced to 0 here) the in-memory entry points
    stream — and produce the identical database."""
    (db1, _), (db2, _) = dbs
    out_m = str(tmp_path / "deleg_m")
    db_ops.run_simple_op("union", db1, db2, out_m)
    monkeypatch.setenv("KMC_TPU_STREAM_THRESHOLD", "0")
    # the native core would intercept first; this test pins the NumPy
    # streaming delegation specifically
    monkeypatch.setenv("KMC_TPU_NATIVE_TOOLS", "0")
    called = []
    import kmc_tpu.formats.streaming as streaming_mod
    orig = streaming_mod.stream_simple_op

    def spy(*a, **k):
        called.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(streaming_mod, "stream_simple_op", spy)
    out_s = str(tmp_path / "deleg_s")
    db_ops.run_simple_op("union", db1, db2, out_s)
    assert called, "streaming path not taken"
    for suf in (".kmc_pre", ".kmc_suf"):
        with open(out_m + suf, "rb") as a, open(out_s + suf, "rb") as b:
            assert a.read() == b.read()


def test_transform_dump_delegates_to_streaming(dbs, tmp_path, monkeypatch):
    (db1, _), _ = dbs
    p_m = tmp_path / "d_m.txt"
    db_ops.transform_dump(db1, str(p_m))
    monkeypatch.setenv("KMC_TPU_STREAM_THRESHOLD", "0")
    p_s = tmp_path / "d_s.txt"
    db_ops.transform_dump(db1, str(p_s))
    assert p_m.read_text() == p_s.read_text()


def test_listing_bounded_rss(tmp_path):
    """VERDICT r1 item 9: OpenForListing must work on a database whose
    materialization blows the memory budget (streaming blocks + demand-
    paged LUT), while OpenForRA on the same database OOMs under the cap."""
    import subprocess
    import sys

    from kmc_tpu.formats.kmc_db import DbInfo, write_kmc1_db

    k = 25
    kb = (k + 3) // 4
    rng = np.random.default_rng(1)
    n = 12_000_000
    kmers = rng.integers(0, 256, size=(n, kb), dtype=np.uint8)
    kmers[:, 0] &= 0x03
    order = np.lexsort(tuple(kmers[:, j] for j in range(kb - 1, -1, -1)))
    kmers = kmers[order]
    dup = np.ones(n, bool)
    dup[1:] = (kmers[1:] != kmers[:-1]).any(axis=1)
    kmers = kmers[dup]
    counts = rng.integers(1, 200, size=len(kmers)).astype(np.uint32)
    info = DbInfo(kmer_len=k, counter_size=1, lut_prefix_len=5,
                  cutoff_min=1, cutoff_max=10**9)
    p = str(tmp_path / "bigdb")
    write_kmc1_db(p, info, kmers, counts)
    first = bytes(kmers[0])
    del kmers, counts

    script = f"""
import resource, sys, os
# RLIMIT_AS counts mapped ADDRESS SPACE, so the cap must leave room for
# the on-disk modes' memmaps (~76 MB) on top of the interpreter baseline;
# the in-memory RA materialization (~480 MB of real allocations) still
# cannot fit
resource.setrlimit(resource.RLIMIT_AS, (500 << 20, 500 << 20))
os.environ["KMC_TPU_NO_JAX"] = "1"
sys.path.insert(0, "/root/repo")
from kmc_tpu.api import KMCFile, KmerAPI
f = KMCFile()
assert f.OpenForListing({p!r})
assert not f.Eof()
km = KmerAPI()
seen = 0
prev = None
while seen < 50000:
    ok, c = f.ReadNextKmer(km)
    assert ok and c >= 1
    s = km.to_string()
    assert prev is None or s > prev, (prev, s)
    prev = s
    seen += 1
assert not f.Eof()
f.Close()
# the cap must be binding: RA row materialization must NOT fit.  Open
# itself is lazy (memmap-backed) since round 4; the in-memory arrays
# build on first ROW access, so that is where the MemoryError surfaces
g = KMCFile()
try:
    g.OpenForRA({p!r})
    g.CheckKmer("A" * 25)
except MemoryError:
    pass
else:
    sys.exit(3)
del g  # drop the partially materialized arrays before the on-disk open
import gc
gc.collect()
# ...while the ON-DISK RA mode answers membership queries under the cap
os.environ["KMC_TPU_RA_THRESHOLD"] = "0"
h = KMCFile()
assert h.OpenForRA({p!r}) and h._is_file_ra()
found, c = h.CheckKmer("".join("ACGT"[b % 4] for b in {first!r}[-25:]))
ok2, per = h.GetCountersForRead("A" * 40)
assert ok2 and len(per) == 16
print("LISTING-OK-RA-OOM")
sys.exit(0)
"""
    r = subprocess.run([sys.executable, "-c", script],
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "LISTING-OK-RA-OOM" in r.stdout


@pytest.mark.parametrize("which", ["sort", "compact", "set_counts",
                                   "histogram", "compare"])
def test_stream_transforms_match_inmemory(dbs, tmp_path, monkeypatch, which):
    (db1, _), (db2, _) = dbs
    out_m = str(tmp_path / f"tm_{which}")
    out_s = str(tmp_path / f"ts_{which}")

    def run(out):
        if which == "sort":
            db_ops.transform_sort(db1, out)
        elif which == "compact":
            db_ops.transform_compact(db1, out)
        elif which == "set_counts":
            db_ops.transform_set_counts(db1, out, 9)
        elif which == "histogram":
            db_ops.transform_histogram(db1, out + ".txt")
        elif which == "compare":
            return (db_ops.db_compare(db1, db1), db_ops.db_compare(db1, db2))

    r_m = run(out_m)
    monkeypatch.setenv("KMC_TPU_STREAM_THRESHOLD", "0")
    r_s = run(out_s)
    if which == "compare":
        assert r_m == r_s == (True, False)
    elif which == "histogram":
        assert (open(out_m + ".txt").read() == open(out_s + ".txt").read())
    else:
        for suf in (".kmc_pre", ".kmc_suf"):
            with open(out_m + suf, "rb") as a, open(out_s + suf, "rb") as b:
                assert a.read() == b.read(), (which, suf)


def test_simple_op_preserves_both_strands(tmp_path, monkeypatch):
    """Review finding r2: the in-memory simple-op path must carry the
    input's both_strands flag into the output header, matching streaming."""
    from kmc_tpu.formats.kmc_db import read_pre_meta

    reads = random_reads(60, 80, seed=50)
    inp = write_fastq(tmp_path / "ss.fastq", reads)
    db1 = str(tmp_path / "ss1")
    db2 = str(tmp_path / "ss2")
    count([inp], db1, k=21, cutoff_min=1, batch_positions=1 << 12,
          canonical_kmers=False)
    count([inp], db2, k=21, cutoff_min=1, batch_positions=1 << 12,
          canonical_kmers=False)
    for thr, tag in (("99999999999", "mem"), ("0", "stream")):
        monkeypatch.setenv("KMC_TPU_STREAM_THRESHOLD", thr)
        out = str(tmp_path / f"ss_u_{tag}")
        db_ops.run_simple_op("union", db1, db2, out)
        assert read_pre_meta(out)[0].both_strands is False, tag


def test_stream_set_counts_zero_matches_inmemory(dbs, tmp_path, monkeypatch):
    """Review finding r2: set_counts 0 must not drop records on the
    streaming path (counters are overwritten verbatim, no cutoff filter)."""
    (db1, _), _ = dbs
    out_m = str(tmp_path / "sc0_m")
    out_s = str(tmp_path / "sc0_s")
    db_ops.transform_set_counts(db1, out_m, 0)
    monkeypatch.setenv("KMC_TPU_STREAM_THRESHOLD", "0")
    db_ops.transform_set_counts(db1, out_s, 0)
    for suf in (".kmc_pre", ".kmc_suf"):
        with open(out_m + suf, "rb") as a, open(out_s + suf, "rb") as b:
            assert a.read() == b.read(), suf


def test_unsorted_kff_streams_via_external_sort(dbs, tmp_path, monkeypatch):
    """A KFF file with ordered=0 streams through the bounded-memory
    external-sort path (expand+sort into temp-file runs, then the same
    windowed merge) — previously a NotImplementedError refusal."""
    from kmc_tpu.formats.kff import KffWriter, read_kff_meta
    from kmc_tpu.formats.streaming import DbStreamReader

    (db1, _), _ = dbs
    info, kmers, counts = db_ops.load_sorted(db1)
    kf = str(tmp_path / "unsorted.kff")
    w = KffWriter(kf, canonical=True, k=info.kmer_len, counter_size=2,
                  min_count=1, max_count=255)
    w.store_section(kmers[::-1], counts[::-1])  # deliberately reversed
    w.close()
    # flip the ordered variable in place (our writer always writes 1)
    raw = bytearray(open(kf, "rb").read())
    i = raw.index(b"ordered\x00")
    assert raw[i + 8 : i + 16] == (1).to_bytes(8, "big")
    raw[i + 8 : i + 16] = (0).to_bytes(8, "big")
    open(kf, "wb").write(bytes(raw))
    assert read_kff_meta(kf).ordered is False

    # tiny block size: many runs + many merge windows
    with DbStreamReader(kf, block_records=64) as r:
        got_k, got_c = [], []
        for kb_, cb in r.blocks():
            got_k.append(kb_)
            got_c.append(cb)
    assert np.array_equal(np.concatenate(got_k), kmers)
    assert np.array_equal(np.concatenate(got_c), counts)

    # delegating entry points produce the same answers either way
    monkeypatch.setenv("KMC_TPU_STREAM_THRESHOLD", "0")
    assert db_ops.db_compare(kf, db1) is True
    out = str(tmp_path / "unsorted_union")
    db_ops.run_simple_op("union", kf, db1, out, mode="max")
    info_u, k_u, c_u = db_ops.load_sorted(out)
    assert np.array_equal(k_u, kmers)
    assert np.array_equal(c_u, counts)


def test_block_kff_streams_via_external_sort(tmp_path):
    """max>1 raw-block KFF sections (super-k-mer compaction) stream in
    bounded memory: expanded rows external-sorted to temp runs, merged
    record-for-record equal to the in-memory read_kff + stable-lexsort
    path (duplicate k-mers keep file order) — VERDICT r4 missing #4."""
    from kmc_tpu.formats.kff import KffWriter, read_kff
    from kmc_tpu.formats.streaming import DbStreamReader

    rng = np.random.default_rng(5)
    k, cs = 21, 2
    kb = (k + 3) // 4

    def pack(codes):
        p = np.concatenate([np.zeros(kb * 4 - k, np.uint8), codes])
        return ((p[0::4] << 6) | (p[1::4] << 4) | (p[2::4] << 2)
                | p[3::4]).astype(np.uint8)

    blocks = []
    for _ in range(200):
        n = int(rng.integers(1, 9))
        codes = rng.integers(0, 4, k + n - 1).astype(np.uint8)
        cnts = rng.integers(1, 60000, n).astype(np.uint32)
        blocks.append((codes, cnts))
    tail_rows = np.array([pack(rng.integers(0, 4, k).astype(np.uint8))
                          for _ in range(9)])
    tail_counts = rng.integers(1, 100, 9).astype(np.uint32)

    p = str(tmp_path / "blocks.kff")
    w = KffWriter(p, canonical=True, k=k, counter_size=cs,
                  min_count=1, max_count=1 << 30)
    w.store_block_section(blocks)
    w.store_section(tail_rows, tail_counts)
    w.close()

    kf = read_kff(p)
    order = np.lexsort(tuple(kf.kmers[:, j]
                             for j in range(kb - 1, -1, -1)))
    want_k, want_c = kf.kmers[order], kf.counts[order]

    # stream with a tiny block budget: multiple runs, multiple windows
    with DbStreamReader(p, block_records=128) as r:
        assert r.info.n_unique_stored == len(want_k)
        got_k, got_c = [], []
        for kb_, cb in r.blocks():
            got_k.append(kb_)
            got_c.append(cb)
    assert np.array_equal(np.concatenate(got_k), want_k)
    assert np.array_equal(np.concatenate(got_c), want_c)


def test_block_kff_union_bounded_rss(tmp_path):
    """VERDICT r4 missing #4 acceptance: a big block-section KFF flows
    through a union in a capped-RSS subprocess (external-sorted runs +
    windowed merge), byte-identical to the in-memory path."""
    import subprocess
    import sys

    from kmc_tpu.defs import calc_counter_size  # noqa: F401 (env check)
    from kmc_tpu.formats.kff import KffWriter

    rng = np.random.default_rng(1)
    k, cs = 25, 1
    # ~2.6M expanded k-mers from 400k super-k-mer blocks, written in
    # bounded batches
    p_kff = str(tmp_path / "big_blocks.kff")
    w = KffWriter(p_kff, canonical=True, k=k, counter_size=cs,
                  min_count=1, max_count=255)
    for _ in range(40):
        blocks = []
        for _ in range(10_000):
            n = int(rng.integers(2, 12))
            codes = rng.integers(0, 4, k + n - 1).astype(np.uint8)
            cnts = rng.integers(1, 200, n).astype(np.uint32)
            blocks.append((codes, cnts))
        w.store_block_section(blocks)
    w.close()

    # a small second input
    from kmc_tpu.formats.kmc_db import DbInfo, write_kmc1_db

    kb = (k + 3) // 4
    kmers2 = rng.integers(0, 256, size=(50_000, kb), dtype=np.uint8)
    kmers2[:, 0] &= 0x03
    order = np.lexsort(tuple(kmers2[:, j] for j in range(kb - 1, -1, -1)))
    kmers2 = kmers2[order]
    dup = np.ones(len(kmers2), bool)
    dup[1:] = (kmers2[1:] != kmers2[:-1]).any(axis=1)
    kmers2 = kmers2[dup]
    counts2 = rng.integers(1, 200, size=len(kmers2)).astype(np.uint32)
    info2 = DbInfo(kmer_len=k, counter_size=1, lut_prefix_len=5,
                   cutoff_min=1, cutoff_max=10**9)
    p_db = str(tmp_path / "small")
    write_kmc1_db(p_db, info2, kmers2, counts2)

    out = str(tmp_path / "u_stream")
    script = f"""
import resource, sys, os
resource.setrlimit(resource.RLIMIT_AS, (500 << 20, 500 << 20))
os.environ["KMC_TPU_NO_JAX"] = "1"
sys.path.insert(0, "/root/repo")
from kmc_tpu.formats.streaming import stream_simple_op
n = stream_simple_op("union", {p_kff!r}, {p_db!r}, {out!r},
                     block_records=1 << 15)
print("records:", n)
assert "kmc_tpu.runner" not in sys.modules
"""
    r = subprocess.run([sys.executable, "-c", script],
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr

    out_m = str(tmp_path / "u_mem")
    db_ops.run_simple_op("union", p_kff, p_db, out_m)
    for suf in (".kmc_pre", ".kmc_suf"):
        with open(out_m + suf, "rb") as a, open(out + suf, "rb") as b:
            assert a.read() == b.read(), suf
