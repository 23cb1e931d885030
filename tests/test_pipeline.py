"""End-to-end differential tests: full pipeline vs the trivial oracle
(mirrors the reference's golden-dump strategy, SURVEY.md §4)."""
import numpy as np
import pytest

from kmc_tpu import oracle
from kmc_tpu.formats import dump_db_file, read_db
from kmc_tpu.runner import InputFileType, count

from util import random_reads, write_fasta, write_fastq, write_fastq_gz


def run_and_compare(tmp_path, reads, k, fmt="fastq", write=None, **kwargs):
    write = write or write_fastq
    inp = write(tmp_path / "in.fastq", reads)
    out = str(tmp_path / "out")
    oracle_kwargs = dict(
        both_strands=kwargs.get("canonical_kmers", True),
        cutoff_min=kwargs.get("cutoff_min", 2),
        cutoff_max=kwargs.get("cutoff_max", 10**9),
        counter_max=kwargs.get("counter_max", 255),
        homopolymer_compressed=kwargs.get("homopolymer_compressed", False),
    )
    res1, res2 = count([inp], out, k=k, batch_positions=1 << 12, **kwargs)
    counts = oracle.count_kmers(
        reads, k, oracle_kwargs["both_strands"], oracle_kwargs["homopolymer_compressed"]
    )
    records, stats = oracle.apply_cutoffs(
        counts, oracle_kwargs["cutoff_min"], oracle_kwargs["cutoff_max"],
        oracle_kwargs["counter_max"],
    )
    expect = oracle.dump_text(records)
    got = dump_db_file(out)
    assert got == expect
    assert res2.n_unique_kmers == stats["n_unique"]
    assert res2.n_below_cutoff_min == stats["n_below_min"]
    assert res2.n_above_cutoff_max == stats["n_above_max"]
    assert res2.n_total_kmers == stats["n_total"]
    return res1, res2


@pytest.mark.parametrize("k", [15, 16, 17, 27, 31, 32, 33])
@pytest.mark.parametrize("device_store", [True, False])
def test_basic_k_sweep(tmp_path, k, device_store):
    reads = random_reads(60, 80, seed=k)
    run_and_compare(tmp_path, reads, k, cutoff_min=1, device_store=device_store)


def test_device_store_compaction_and_spill(tmp_path):
    # store sized far below the batch flow forces compactions and spills
    reads = random_reads(300, 100, seed=99, genome_len=700)
    inp = write_fastq(tmp_path / "in.fastq", reads)
    out = str(tmp_path / "out")
    count([inp], out, k=21, cutoff_min=1, batch_positions=512,
          device_store_rows=2048)
    counts = oracle.count_kmers(reads, 21)
    records, _ = oracle.apply_cutoffs(counts, 1, 10**9, 255)
    assert dump_db_file(out) == oracle.dump_text(records)


@pytest.mark.parametrize("k", [63, 64, 65, 127, 128, 255, 256])
def test_large_k(tmp_path, k):
    reads = random_reads(20, 300, seed=k, genome_len=2000)
    run_and_compare(tmp_path, reads, k, cutoff_min=1)


@pytest.mark.parametrize("device_store", [True, False])
def test_cutoffs_and_counter_max(tmp_path, device_store):
    reads = random_reads(200, 60, seed=7, genome_len=500)
    run_and_compare(tmp_path, reads, 21, cutoff_min=2, cutoff_max=50,
                    counter_max=10, device_store=device_store)


def test_counter_max_one_no_counters(tmp_path):
    # cs=1 -> counter_size 0, existence-only db (reference defs.h:154-158)
    reads = random_reads(50, 60, seed=8)
    inp = write_fastq(tmp_path / "in.fastq", reads)
    out = str(tmp_path / "out")
    count([inp], out, k=21, cutoff_min=1, counter_max=1, batch_positions=1 << 12)
    db = read_db(out)
    assert db.info.counter_size == 0
    counts = oracle.count_kmers(reads, 21)
    assert db.info.n_unique_stored == len(counts)
    got = dump_db_file(out)
    expect = oracle.dump_text(sorted((km, 1) for km in counts))
    assert got == expect


def test_single_strand_mode(tmp_path):
    reads = random_reads(60, 70, seed=9)
    run_and_compare(tmp_path, reads, 25, cutoff_min=1, canonical_kmers=False)


def test_reads_with_n(tmp_path):
    reads = random_reads(80, 70, seed=10, n_prob=0.05)
    run_and_compare(tmp_path, reads, 21, cutoff_min=1)


def test_fasta_input(tmp_path):
    reads = random_reads(40, 90, seed=11)
    run_and_compare(
        tmp_path, reads, 25, cutoff_min=1,
        write=write_fasta, input_file_type=InputFileType.FASTA,
    )


def test_multiline_fasta_input(tmp_path):
    reads = random_reads(20, 200, seed=12)
    run_and_compare(
        tmp_path, reads, 25, cutoff_min=1,
        write=lambda p, r: write_fasta(p, r, line_width=60),
        input_file_type=InputFileType.MULTILINE_FASTA,
    )


def test_gzip_input(tmp_path):
    reads = random_reads(50, 80, seed=13)
    run_and_compare(
        tmp_path, reads, 25, cutoff_min=1,
        write=lambda p, r: write_fastq_gz(str(p) + ".gz", r),
    )


def test_multiple_input_files(tmp_path):
    reads1 = random_reads(30, 70, seed=14)
    reads2 = random_reads(30, 70, seed=15)
    inp1 = write_fastq(tmp_path / "a.fastq", reads1)
    inp2 = write_fastq(tmp_path / "b.fastq", reads2)
    out = str(tmp_path / "out")
    _, res2 = count([inp1, inp2], out, k=21, cutoff_min=1, batch_positions=1 << 12)
    counts = oracle.count_kmers(reads1 + reads2, 21)
    records, stats = oracle.apply_cutoffs(counts, 1, 10**9, 255)
    assert dump_db_file(out) == oracle.dump_text(records)
    assert res2.n_unique_kmers == stats["n_unique"]


@pytest.mark.parametrize("k", [1, 2, 5, 9, 13])
def test_small_k(tmp_path, k):
    reads = random_reads(50, 50, seed=16 + k, genome_len=300)
    res1, _ = run_and_compare(tmp_path, reads, k, cutoff_min=1)
    assert res1.was_small_k_opt_used


def test_small_k_single_strand(tmp_path):
    reads = random_reads(40, 50, seed=30)
    run_and_compare(tmp_path, reads, 7, cutoff_min=1, canonical_kmers=False)


def test_homopolymer_compression(tmp_path):
    reads = ["AAACCCGGGTTTAAACGT" * 5, "ACGTACGT" * 10, "AAAAAAAAAAAAAAAAAAAACGT"]
    run_and_compare(tmp_path, reads, 15, cutoff_min=1, homopolymer_compressed=True)


def test_batch_boundary_exactness(tmp_path):
    # reads crossing many small batch boundaries are still counted once
    reads = random_reads(200, 120, seed=17, genome_len=800)
    inp = write_fastq(tmp_path / "in.fastq", reads)
    out = str(tmp_path / "out")
    count([inp], out, k=31, cutoff_min=1, batch_positions=256)
    counts = oracle.count_kmers(reads, 31)
    records, _ = oracle.apply_cutoffs(counts, 1, 10**9, 255)
    assert dump_db_file(out) == oracle.dump_text(records)


def test_n_reads_counting(tmp_path):
    reads = random_reads(37, 60, seed=18)
    inp = write_fastq(tmp_path / "in.fastq", reads)
    out = str(tmp_path / "out")
    res1, _ = count([inp], out, k=21, cutoff_min=1, batch_positions=1 << 12)
    assert res1.n_sequences == 37


@pytest.mark.parametrize("policy", ["prefix", "greedy"])
@pytest.mark.parametrize("k", [21, 27, 32])
def test_signature_map_policies(tmp_path, policy, k):
    """Both signature->bin policies produce identical k-mer/count content
    (the bin layout differs; dumps are canonical)."""
    reads = random_reads(80, 90, seed=k + 1000)
    run_and_compare(tmp_path, reads, k, cutoff_min=1,
                    signature_map_policy=policy)


def test_prefix_policy_random_access(tmp_path):
    """CheckKmer through the file's own sig_map must work for prefix-policy
    DBs (exercises the in-file map round trip)."""
    from kmc_tpu.api import KMCFile, KmerAPI

    reads = random_reads(50, 70, seed=5)
    inp = write_fastq(tmp_path / "in.fastq", reads)
    out = str(tmp_path / "out")
    count([inp], out, k=25, cutoff_min=1, batch_positions=1 << 12)
    counts = oracle.count_kmers(reads, 25)

    f = KMCFile()
    assert f.OpenForRA(out)
    for i, (kmer, cnt) in enumerate(sorted(counts.items())):
        if i % 7:
            continue  # sample
        ka = KmerAPI(25)
        ka.from_string(kmer)
        found, got = f.CheckKmer(ka)
        assert found and got == cnt, (kmer, found, got, cnt)


def test_unique_set_exceeds_device_store(tmp_path):
    """Unique k-mers >> device capacity: spills overflow the replay and
    finalize falls back to the host external merge (the reference's
    strict-memory big-bin pipeline analogue, bkb_merger.h)."""
    reads = random_reads(120, 100, seed=41, genome_len=6000)
    inp = write_fastq(tmp_path / "in.fastq", reads)
    out = str(tmp_path / "out")
    _, res2 = count([inp], out, k=21, cutoff_min=1, batch_positions=512,
                    device_store_rows=2048)
    counts = oracle.count_kmers(reads, 21)
    records, stats = oracle.apply_cutoffs(counts, 1, 10**9, 255)
    assert len(counts) > 4096  # actually overflowed the store
    assert dump_db_file(out) == oracle.dump_text(records)
    assert res2.n_unique_kmers == stats["n_unique"]
    assert res2.n_total_kmers == stats["n_total"]


def test_spill_with_slack_region(tmp_path, monkeypatch):
    """Regression (ADVICE round 1): spill() must reallocate capacity+slack
    rows — with KMC_TPU_STORE_SLACK_DIV set, deferred-compaction appends
    after a spill target the slack region, and a short allocation would
    make dynamic_update_slice clamp them over the store's tail rows
    (silent count corruption)."""
    monkeypatch.setenv("KMC_TPU_STORE_SLACK_DIV", "4")
    reads = random_reads(120, 100, seed=43, genome_len=6000)
    inp = write_fastq(tmp_path / "in.fastq", reads)
    out = str(tmp_path / "out")
    _, res2 = count([inp], out, k=21, cutoff_min=1, batch_positions=512,
                    device_store_rows=2048)
    counts = oracle.count_kmers(reads, 21)
    records, stats = oracle.apply_cutoffs(counts, 1, 10**9, 255)
    assert dump_db_file(out) == oracle.dump_text(records)
    assert res2.n_unique_kmers == stats["n_unique"]


def test_unique_set_exceeds_device_store_kff(tmp_path):
    """Same overflow through the words-path finalize (KFF output)."""
    from kmc_tpu.formats.kff import read_kff

    reads = random_reads(120, 100, seed=42, genome_len=6000)
    inp = write_fastq(tmp_path / "in.fastq", reads)
    out = str(tmp_path / "out")
    from kmc_tpu.runner import OutputFileType

    count([inp], out, k=21, cutoff_min=1, batch_positions=512,
          device_store_rows=2048, output_file_type=OutputFileType.KFF)
    counts = oracle.count_kmers(reads, 21)
    kff = read_kff(out + ".kff")
    assert len(kff.counts) == len(counts)
    assert int(kff.counts.sum()) == sum(counts.values())
    assert len(np.unique(kff.kmers, axis=0)) == len(counts)


def test_boundary_feed_matches_masked(tmp_path):
    """The boundary-delta ingest format produces a byte-identical DB to the
    packed+mask format (exercised through the normal runner path, which
    prefers boundaries; the comparison DB forces the masked path by making
    every batch sentinel-dense... simpler: compare against the oracle with
    reads containing Ns, multi-read batches, and heavy tail padding)."""
    reads = random_reads(90, 55, seed=61, n_prob=0.04)  # short reads, Ns
    run_and_compare(tmp_path, reads, 21, cutoff_min=1)


def test_boundary_feed_dense_fallback(tmp_path):
    """Sentinel-dense input (reads far shorter than the per-64-code delta
    budget) must fall back to the masked feed format and stay exact."""
    from kmc_tpu.io.native import pack_codes_boundaries

    reads = random_reads(300, 20, seed=63, genome_len=500)  # 20bp reads
    # sanity: such batches really do overflow the boundary budget
    codes = np.concatenate(
        [np.append(np.frombuffer(b"0123", np.uint8) % 4, 4)] * 300
    ).astype(np.uint8)[: 1024]
    assert pack_codes_boundaries(codes)[0] is None
    inp = write_fastq(tmp_path / "in2.fastq", reads)
    out = str(tmp_path / "out2")
    count([inp], out, k=15, cutoff_min=1, batch_positions=1 << 12)
    counts = oracle.count_kmers(reads, 15)
    records, _ = oracle.apply_cutoffs(counts, 1, 10**9, 255)
    assert dump_db_file(out) == oracle.dump_text(records)


def test_exact_size_finalize_grain(tmp_path, monkeypatch):
    """Finalize slices the store to a GRAIN-rounded effective shape before
    the big sorts (dead-tail rows cost sort time); a tiny grain must yield
    a byte-identical DB."""
    reads = random_reads(90, 100, seed=77, genome_len=7000)
    inp = write_fastq(tmp_path / "in.fastq", reads)
    out_a = str(tmp_path / "full")
    out_b = str(tmp_path / "grain")
    count([inp], out_a, k=25, cutoff_min=1, batch_positions=1 << 12)
    monkeypatch.setenv("KMC_TPU_FINALIZE_GRAIN", "64")
    count([inp], out_b, k=25, cutoff_min=1, batch_positions=1 << 12)
    for suf in (".kmc_pre", ".kmc_suf"):
        with open(out_a + suf, "rb") as a, open(out_b + suf, "rb") as b:
            assert a.read() == b.read(), suf


def test_tiled_finalize_matches_classic(tmp_path, monkeypatch):
    """The two-dispatch tiled finalize (per-tile compaction + output-sized
    gather) must produce a byte-identical DB to the classic two-full-sort
    group-reduce, on both the unit-count and the counted (post-compaction)
    paths."""
    for seed, store_rows, tag in ((70, 1 << 22, "unit"), (71, 2048, "cnt")):
        reads = random_reads(150, 100, seed=seed, genome_len=800)
        inp = write_fastq(tmp_path / f"in{seed}.fastq", reads)
        out_t = str(tmp_path / f"tiled_{tag}")
        out_c = str(tmp_path / f"classic_{tag}")
        monkeypatch.setenv("KMC_TPU_TILED_FINALIZE", "1")
        monkeypatch.setenv("KMC_TPU_TILED_OUT_GRAIN", "64")
        count([inp], out_t, k=21, cutoff_min=2, batch_positions=512,
              device_store_rows=store_rows)
        monkeypatch.setenv("KMC_TPU_TILED_FINALIZE", "0")
        count([inp], out_c, k=21, cutoff_min=2, batch_positions=512,
              device_store_rows=store_rows)
        for suf in (".kmc_pre", ".kmc_suf"):
            with open(out_t + suf, "rb") as a, open(out_c + suf, "rb") as b:
                assert a.read() == b.read(), (tag, suf)


def test_pipelined_finalize_chunks_match_single_dispatch(tmp_path, monkeypatch):
    """The chunked pipelined-D2H phase B (KMC_TPU_PIPELINE_D2H=<rows>)
    must produce a byte-identical DB to the single phase-B dispatch
    (=0) with MANY chunks engaged — the cross-chunk risks are the group
    straddling a chunk boundary (probe-row src_next), tiles starting
    before the chunk (clipped marks scatter), and the per-chunk LUT and
    stats summation.  Both the unit-count and counted paths."""
    for seed, store_rows, tag in ((74, 1 << 22, "unit"), (75, 2048, "cnt")):
        reads = random_reads(150, 100, seed=seed, genome_len=800)
        inp = write_fastq(tmp_path / f"in{seed}.fastq", reads)
        out_p = str(tmp_path / f"piped_{tag}")
        out_s = str(tmp_path / f"single_{tag}")
        monkeypatch.setenv("KMC_TPU_TILED_FINALIZE", "1")
        monkeypatch.setenv("KMC_TPU_PIPELINE_D2H", "64")
        count([inp], out_p, k=21, cutoff_min=2, batch_positions=512,
              device_store_rows=store_rows)
        monkeypatch.setenv("KMC_TPU_PIPELINE_D2H", "0")
        count([inp], out_s, k=21, cutoff_min=2, batch_positions=512,
              device_store_rows=store_rows)
        for suf in (".kmc_pre", ".kmc_suf"):
            with open(out_p + suf, "rb") as a, open(out_s + suf, "rb") as b:
                assert a.read() == b.read(), (tag, suf)


def test_autocompact_matches_default(tmp_path, monkeypatch):
    """Voluntary mid-run compaction (KMC_TPU_AUTOCOMPACT_ROWS) dedups the
    store while ingest streams; the output DB must be byte-identical to a
    run that defers all merging to the finalize."""
    import kmc_tpu.ops.store as st

    reads = random_reads(400, 100, seed=73, genome_len=2000)
    inp = write_fastq(tmp_path / "in73.fastq", reads)
    out_d = str(tmp_path / "d")
    out_a = str(tmp_path / "a")
    count([inp], out_d, k=21, cutoff_min=2, batch_positions=512)

    calls = []
    orig = st.DeviceKmerStore.compact_effective

    def spy(self):
        calls.append(int(self._since_compact))
        return orig(self)

    monkeypatch.setattr(st.DeviceKmerStore, "compact_effective", spy)
    monkeypatch.setenv("KMC_TPU_AUTOCOMPACT_ROWS", "2048")
    monkeypatch.setenv("KMC_TPU_FINALIZE_GRAIN", "64")
    count([inp], out_a, k=21, cutoff_min=2, batch_positions=512,
          device_store_rows=1 << 15)
    assert len(calls) >= 2, "autocompact never triggered"
    for suf in (".kmc_pre", ".kmc_suf"):
        with open(out_d + suf, "rb") as a, open(out_a + suf, "rb") as b:
            assert a.read() == b.read(), suf


def test_bitonic_grouping_sort_matches_default(tmp_path, monkeypatch):
    """KMC_TPU_BITONIC_SORT swaps the phase-A grouping sort for the
    blocked Pallas bitonic; at an engaging store shape (>= 2^19 rows,
    forced via the finalize grain) the DB must be byte-identical.  A spy
    confirms the kernel actually traced (the gate silently falls back to
    lax.sort below the minimum size)."""
    from kmc_tpu.ops import pallas_sort as ps

    # the bitonic needs a >= 2^19-row sort; on CPU the store allocation
    # grows with appended rows, so ingest ~400k k-mer positions
    reads = random_reads(5000, 100, seed=72, genome_len=40000)
    inp = write_fastq(tmp_path / "in72.fastq", reads)
    out_d = str(tmp_path / "default")
    out_b = str(tmp_path / "bitonic")
    count([inp], out_d, k=21, cutoff_min=2, batch_positions=1 << 12)

    hits = []
    real = ps.pallas_bitonic_sort

    def spy(cols, **kw):
        hits.append(cols[0].shape)
        return real(cols, **kw)

    monkeypatch.setattr(ps, "pallas_bitonic_sort", spy)
    monkeypatch.setenv("KMC_TPU_BITONIC_SORT", "interpret")
    monkeypatch.setenv("KMC_TPU_FINALIZE_GRAIN", str(1 << 19))
    count([inp], out_b, k=21, cutoff_min=2, batch_positions=1 << 12,
          device_store_rows=1 << 19)
    assert hits, "bitonic path never engaged"
    for suf in (".kmc_pre", ".kmc_suf"):
        with open(out_d + suf, "rb") as a, open(out_b + suf, "rb") as b:
            assert a.read() == b.read(), suf
