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


def test_counters_for_read_bytes_input(db, monkeypatch):
    """counters_for_read_array accepts ascii bytes; non-ASCII bytes act
    as invalid bases (same as 'N') with offsets preserved — on both the
    native path and the NumPy fallback."""
    path, reads, counts = db
    import numpy as np

    f = KMCFile()
    f.OpenForRA(path)
    read = reads[0]
    _, a = f.counters_for_read_array(read)
    _, b = f.counters_for_read_array(read.encode("ascii"))
    assert np.array_equal(np.asarray(a), np.asarray(b))
    # 0xFF mid-read == 'N' mid-read, same counter vector length
    raw = read.encode("ascii")
    bad = raw[:10] + b"\xff" + raw[11:]
    subbed = read[:10] + "N" + read[11:]
    _, c = f.counters_for_read_array(bad)
    _, d = f.counters_for_read_array(subbed)
    assert np.array_equal(np.asarray(c), np.asarray(d))
    # same equivalences with the native lookup disabled
    monkeypatch.setenv("KMC_TPU_NATIVE_TOOLS", "0")
    _, a2 = f.counters_for_read_array(raw)
    _, c2 = f.counters_for_read_array(bad)
    assert np.array_equal(np.asarray(a), np.asarray(a2))
    assert np.array_equal(np.asarray(c), np.asarray(c2))


def test_counters_for_read_numpy_sliced_long_read(db):
    """The NumPy fallback slices reads beyond its SLICE bound (bounded
    transients for chunk-joined queries); the stitched counter vector
    must equal the native lookup's over several slice boundaries."""
    path, reads, counts = db
    import numpy as np

    f = KMCFile()
    f.OpenForRA(path)
    base = "N".join(reads)
    long_read = "N".join([base] * (((1 << 18) // len(base)) + 2))
    assert len(long_read) > (1 << 18)  # > 2 slices
    _, nat = f.counters_for_read_array(long_read)
    _, sliced = f._counters_for_read_numpy(long_read)
    assert np.array_equal(np.asarray(nat), np.asarray(sliced))


def test_kmer_api_roundtrip():
    kmer = KmerAPI()
    assert kmer.from_string("ACGTACGTAC")
    assert kmer.to_string() == "ACGTACGTAC"
    kmer.reverse()
    assert kmer.to_string() == oracle.revcomp("ACGTACGTAC")
    assert not kmer.from_string("ACGTN")


def test_reference_py_kmc_dump_script_runs_on_shim(tmp_path):
    """The reference's own py_kmc_dump.py example must run unmodified against
    our py_kmc_api shim (drop-in compatibility: OpenForListing / Info /
    KmerAPI / Count / ReadNextKmer / SetMinCount surfaces)."""
    import os
    import subprocess
    import sys
    from pathlib import Path

    script = Path("/root/reference/py_kmc_api/py_kmc_dump.py")
    if not script.exists():
        pytest.skip("reference checkout not available")

    reads = random_reads(40, 80, seed=77)
    inp = write_fastq(tmp_path / "in.fastq", reads)
    db = str(tmp_path / "db")
    count([inp], db, k=21, cutoff_min=1, batch_positions=1 << 12)

    out = tmp_path / "pydump.txt"
    repo_root = str(Path(__file__).resolve().parent.parent)
    env = dict(os.environ, PYTHONPATH=repo_root, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, str(script), db, str(out)],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-500:]
    got = sorted(out.read_text().splitlines())
    counts = oracle.count_kmers(reads, 21)
    expect = sorted(f"{km}\t{c}" for km, c in counts.items())
    assert got == expect

    # -ci filter path (SetMinCount)
    out2 = tmp_path / "pydump2.txt"
    r = subprocess.run(
        [sys.executable, str(script), "-ci", "2", db, str(out2)],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-500:]
    got2 = sorted(out2.read_text().splitlines())
    expect2 = sorted(f"{km}\t{c}" for km, c in counts.items() if c >= 2)
    assert got2 == expect2


def test_api_full_pybind_surface(tmp_path):
    """Every method the reference pybind module exposes exists and behaves
    (py_kmc_api.cpp:27-98): Eof / GetBothStrands / ResetMinMaxCounts /
    IsKMC2 on KMCFile; to_long / get_signature / symbols / compare on
    KmerAPI."""
    reads = random_reads(20, 60, seed=80)
    inp = write_fastq(tmp_path / "in.fastq", reads)
    db = str(tmp_path / "db")
    count([inp], db, k=21, cutoff_min=1, batch_positions=1 << 12)

    f = KMCFile()
    assert f.OpenForListing(db)
    assert f.GetBothStrands() is True
    assert f.IsKMC2() is True
    assert not f.Eof()
    f.SetMinCount(5)
    assert f.GetMinCount() == 5
    f.ResetMinMaxCounts()
    assert f.GetMinCount() == 1
    n = 0
    km = KmerAPI(21)
    while f.ReadNextKmer(km)[0]:
        n += 1
    assert f.Eof()
    assert n == f.KmerCount()

    ka = KmerAPI(8)
    assert ka.from_string("ACGTACGT")
    assert ka.get_asci_symbol(1) == "C" and ka.get_num_symbol(3) == 3
    # to_long: the right-aligned big-integer value (kmer_api.h:452-470)
    (w,) = ka.to_long()
    assert w == 0b0001101100011011  # ACGTACGT == 0x1B1B
    kb = KmerAPI(8)
    kb.assign(ka)
    assert kb == ka and not (kb < ka)
    # different lengths are incomparable, like the reference operator<
    assert not (KmerAPI(4) < ka) and not (ka < KmerAPI(4))
    kb.reverse()
    assert kb.to_string() == "ACGTACGT"  # palindromic k-mer
    # signature of the canonical k-mer matches the signatures module
    from kmc_tpu.signatures import kmer_signatures_numpy

    sig = ka.get_signature(5)
    assert sig == int(kmer_signatures_numpy(ka.codes, 8, 5)[0])


def test_py_kmc_api_shim_to_long():
    import py_kmc_api as pka

    ka = pka.KmerAPI(4)
    assert ka.from_string("ACGT")
    res = pka.LongKmerRepresentation()
    ka.to_long(res)
    assert res.value == [0b00011011]  # ACGT == 27, right-aligned


def test_kff_random_access(tmp_path):
    """KFF random access (the reference's CKffAndKMCRandomAccess,
    kmc_tools/kff_random_access.h): OpenForRA on a .kff file supports
    CheckKmer / GetCountersForRead / listing."""
    from kmc_tpu.runner import OutputFileType, count

    reads = random_reads(40, 80, seed=91)
    inp = write_fastq(tmp_path / "in.fastq", reads)
    out = str(tmp_path / "x")
    count([inp], out, k=21, cutoff_min=1, batch_positions=1 << 12,
          output_file_type=OutputFileType.KFF)
    counts = oracle.count_kmers(reads, 21)

    f = KMCFile()
    assert f.OpenForRA(out + ".kff")
    assert f.KmerLength() == 21
    assert f.KmerCount() == len(counts)
    for i, (km, c) in enumerate(sorted(counts.items())):
        if i % 5:
            continue
        found, got = f.CheckKmer(km)
        assert found and got == c, (km, got, c)
    assert not f.CheckKmer("A" * 21)[0] or counts.get("A" * 21)
    ok, per_read = f.GetCountersForRead(reads[0])
    assert ok and len(per_read) == len(reads[0]) - 20
    assert all(c >= 1 for c in per_read)


def test_reuse_across_wide_k_databases(tmp_path):
    """Regression (round-5 ADVICE): Close() then OpenForRA on a SECOND
    k>32 database must not feed the first DB's cached jump table /
    keys0 into counters_for_seq_wide (stale _rows_idx16_cache /
    _rows_keys0_cache returned all-zero counters for the second DB)."""
    from kmc_tpu.runner import OutputFileType, count

    k = 45
    f = KMCFile()
    for seed in (11, 12):
        reads = random_reads(40, 80, seed=seed)
        inp = write_fastq(tmp_path / f"in{seed}.fastq", reads)
        out = str(tmp_path / f"w{seed}")
        count([inp], out, k=k, cutoff_min=1, batch_positions=1 << 12,
              output_file_type=OutputFileType.KFF)
        counts = oracle.count_kmers(reads, k)
        assert f.OpenForRA(out + ".kff")
        ok, per_read = f.GetCountersForRead(reads[0])
        assert ok and len(per_read) == len(reads[0]) - k + 1
        expect = [counts[min(reads[0][i:i + k],
                             oracle.revcomp(reads[0][i:i + k]))]
                  for i in range(len(per_read))]
        assert [int(c) for c in per_read] == expect, seed
        assert f.Close()


def test_listing_filter_change_mid_stream(tmp_path):
    """SetMinCount during listing must apply to the already-buffered block
    (review finding r2): listing and RA modes yield the same sequence."""
    reads = random_reads(80, 80, seed=95, genome_len=400)  # heavy repeats
    inp = write_fastq(tmp_path / "in.fastq", reads)
    out = str(tmp_path / "db")
    count([inp], out, k=21, cutoff_min=1, batch_positions=1 << 12)

    def walk(open_mode):
        f = KMCFile()
        assert getattr(f, open_mode)(out)
        km = KmerAPI()
        got = []
        ok, c = f.ReadNextKmer(km)
        assert ok
        got.append((km.to_string(), c))
        f.SetMinCount(3)
        while True:
            ok, c = f.ReadNextKmer(km)
            if not ok:
                break
            assert c >= 3
            got.append((km.to_string(), c))
        return got

    assert walk("OpenForListing") == walk("OpenForRA")


def test_file_ra_matches_inmemory(tmp_path, monkeypatch):
    """The on-disk RA mode (sig_map -> bin -> LUT range -> suffix-file
    binary search, the reference CheckKmer algorithm) must agree with the
    in-memory RA on every query — present, absent, non-canonical,
    filtered — for KMC2 (both signature-map policies) and KMC1 DBs."""
    configs = [
        dict(k=25, cutoff_min=1),                      # KMC2 prefix map
        dict(k=25, cutoff_min=1, signature_map_policy="greedy"),
        dict(k=9, cutoff_min=1),                       # small-k => KMC1
    ]
    for ci, cfg in enumerate(configs):
        reads = random_reads(120, 90, seed=300 + ci, genome_len=1500)
        inp = write_fastq(tmp_path / f"fr{ci}.fastq", reads)
        db = str(tmp_path / f"fr_db{ci}")
        count([inp], db, batch_positions=1 << 12, **cfg)
        counts = oracle.count_kmers(reads, cfg["k"])

        mem = KMCFile()
        assert mem.OpenForRA(db)
        monkeypatch.setenv("KMC_TPU_RA_THRESHOLD", "0")
        fra = KMCFile()
        assert fra.OpenForRA(db)
        assert fra._is_file_ra()

        queries = list(counts)[:60]
        queries += [oracle.revcomp(q) for q in queries[:10]]
        rng = np.random.default_rng(ci)
        queries += ["".join("ACGT"[c] for c in rng.integers(0, 4, cfg["k"]))
                    for _ in range(30)]  # mostly absent
        for q in queries:
            assert mem.CheckKmer(q) == fra.CheckKmer(q), (cfg, q)

        # counter refiltering applies identically
        mem.SetMinCount(3)
        fra.SetMinCount(3)
        for q in queries[:30]:
            assert mem.CheckKmer(q) == fra.CheckKmer(q), (cfg, q)
        mem.ResetMinMaxCounts()
        fra.ResetMinMaxCounts()

        probe_reads = list(reads[:8])
        probe_reads.append(reads[0][:10] + "N" + reads[0][11:])  # broken kmers
        probe_reads.append("N" * len(reads[0]))                  # all invalid
        probe_reads.append(reads[0][: cfg["k"] - 1])             # too short
        probe_reads.append(reads[0][: cfg["k"]])                 # exactly one
        for rd in probe_reads:
            ok_m, per_m = mem.GetCountersForRead(rd)
            ok_f, per_f = fra.GetCountersForRead(rd)
            assert ok_m and ok_f and list(per_m) == list(per_f), (cfg, rd)
        assert fra.KmerCount() == mem.KmerCount()
        # RA mode does not list (reference semantics)
        km = KmerAPI(cfg["k"])
        assert fra.ReadNextKmer(km) == (False, 0)
        assert fra.Eof()
        monkeypatch.delenv("KMC_TPU_RA_THRESHOLD")
