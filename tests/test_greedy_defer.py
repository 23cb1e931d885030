"""Deferred greedy remap: the store ingests under the prefix-policy key
layout and remaps rows to their greedy bins at finalize (the signature is
recomputed from each stored k-mer's lanes).  These tests pin that the
deferred path is byte-identical to the eager per-batch-gather path and
that the recomputed signature matches the splitter's.

Reference semantics anchored: s_mapper.h:141-235 (greedy map),
mmer.h:81-91 (strand-invariant norm, the fact that makes the deferred
recompute exact).
"""
import numpy as np
import pytest

from kmc_tpu.runner import count
from tests.util import random_reads, write_fastq


def _db_bytes(out):
    with open(out + ".kmc_pre", "rb") as f:
        pre = f.read()
    with open(out + ".kmc_suf", "rb") as f:
        suf = f.read()
    return pre, suf


@pytest.mark.parametrize("k", [21, 27, 33, 64])
def test_defer_bytes_equal_eager(tmp_path, monkeypatch, k):
    """Same input, same greedy map: deferred and eager greedy finalize must
    produce byte-identical databases (record order, LUT, footer)."""
    reads = random_reads(150, 90, seed=k, genome_len=3000)
    inp = write_fastq(tmp_path / "in.fastq", reads)

    monkeypatch.setenv("KMC_TPU_GREEDY_DEFER", "0")
    count([inp], str(tmp_path / "eager"), k=k, cutoff_min=1,
          batch_positions=1 << 12, signature_map_policy="greedy")
    monkeypatch.setenv("KMC_TPU_GREEDY_DEFER", "1")
    count([inp], str(tmp_path / "defer"), k=k, cutoff_min=1,
          batch_positions=1 << 12, signature_map_policy="greedy")

    assert _db_bytes(str(tmp_path / "defer")) == \
        _db_bytes(str(tmp_path / "eager"))


def test_defer_bytes_equal_eager_with_spills(tmp_path, monkeypatch):
    """Tiny store forces compactions + spills: the deferred prefix-layout
    runs must merge and remap to the same bytes as the eager layout."""
    reads = random_reads(120, 100, seed=7, genome_len=6000)
    inp = write_fastq(tmp_path / "in.fastq", reads)
    kw = dict(k=21, cutoff_min=1, batch_positions=512,
              device_store_rows=2048, signature_map_policy="greedy")
    monkeypatch.setenv("KMC_TPU_GREEDY_DEFER", "0")
    count([inp], str(tmp_path / "eager"), **kw)
    monkeypatch.setenv("KMC_TPU_GREEDY_DEFER", "1")
    count([inp], str(tmp_path / "defer"), **kw)
    assert _db_bytes(str(tmp_path / "defer")) == \
        _db_bytes(str(tmp_path / "eager"))


def test_defer_bytes_equal_eager_nontiled(tmp_path, monkeypatch):
    """The non-tiled fallback finalize (capacity-scale remap) matches too."""
    reads = random_reads(60, 80, seed=9)
    inp = write_fastq(tmp_path / "in.fastq", reads)
    kw = dict(k=25, cutoff_min=1, batch_positions=1 << 11,
              signature_map_policy="greedy")
    monkeypatch.setenv("KMC_TPU_TILED_FINALIZE", "0")
    monkeypatch.setenv("KMC_TPU_GREEDY_DEFER", "0")
    count([inp], str(tmp_path / "eager"), **kw)
    monkeypatch.setenv("KMC_TPU_GREEDY_DEFER", "1")
    count([inp], str(tmp_path / "defer"), **kw)
    assert _db_bytes(str(tmp_path / "defer")) == \
        _db_bytes(str(tmp_path / "eager"))


@pytest.mark.parametrize("k,sig_len", [(21, 9), (27, 9), (33, 7), (64, 11)])
def test_sig_recompute_matches_splitter(k, sig_len):
    """sig_of_word_cols(canonical lanes) == the splitter's per-position
    signature (kmer_signatures_numpy) for random valid windows, both
    strands — the exactness claim behind the deferred remap."""
    import jax.numpy as jnp

    from kmc_tpu.ops.extract import sig_of_word_cols
    from kmc_tpu.signatures import (kmer_signatures_numpy,
                                    sig_of_lanes_numpy)

    rng = np.random.default_rng(k * 100 + sig_len)
    n = 500
    W = (k + 15) // 16
    r0 = k - 16 * (W - 1)
    lanes = np.zeros((n, W), np.uint32)
    sigs_ref = np.zeros(n, np.uint32)
    for i in range(n):
        codes = rng.integers(0, 4, k).astype(np.uint8)
        # as-read window (both_strands=False layout): lanes hold the
        # window itself, MSW-first right-aligned
        v = 0
        for c in codes:
            v = (v << 2) | int(c)
        for t in range(W - 1, -1, -1):
            lanes[i, t] = v & 0xFFFFFFFF
            v >>= 32
        sigs_ref[i] = kmer_signatures_numpy(codes, k, sig_len)[0]
    got_dev = np.asarray(sig_of_word_cols(
        [jnp.asarray(lanes[:, t]) for t in range(W)], k=k, sig_len=sig_len))
    got_np = sig_of_lanes_numpy(lanes, k, sig_len)
    np.testing.assert_array_equal(got_dev, sigs_ref)
    np.testing.assert_array_equal(got_np, sigs_ref)


def test_sig_strand_invariance():
    """sig(revcomp(K)) == sig(K): the norm min is strand-symmetric, so the
    canonical representative yields the splitter's signature."""
    from kmc_tpu.signatures import kmer_signatures_numpy

    rng = np.random.default_rng(3)
    k, m = 27, 9
    for _ in range(200):
        codes = rng.integers(0, 4, k).astype(np.uint8)
        rc = (3 - codes)[::-1].astype(np.uint8)
        assert (kmer_signatures_numpy(codes, k, m)[0]
                == kmer_signatures_numpy(rc, k, m)[0])


def test_defer_checkpoint_roundtrip(tmp_path, monkeypatch):
    """A deferred-greedy stage-1 checkpoint restores the prefix layout and
    finalizes to the same bytes as an uninterrupted run, even if the env
    default flips between save and load."""
    from kmc_tpu.runner import Runner, Stage1Params, Stage2Params

    reads = random_reads(80, 90, seed=11)
    inp = write_fastq(tmp_path / "in.fastq", reads)
    kw = dict(kmer_len=23, signature_map_policy="greedy",
              batch_positions=1 << 11)
    monkeypatch.setenv("KMC_TPU_GREEDY_DEFER", "1")
    r = Runner()
    r.run_stage1(Stage1Params(input_files=[inp], **kw))
    ck = str(tmp_path / "ck")
    r.save_stage1_checkpoint(ck)
    monkeypatch.setenv("KMC_TPU_GREEDY_DEFER", "0")  # flag must not matter
    r2 = Runner()
    r2.resume_stage1_checkpoint(ck, Stage1Params(input_files=[inp], **kw))
    r2.run_stage2(Stage2Params(output_file_name=str(tmp_path / "resumed"), cutoff_min=1))

    monkeypatch.setenv("KMC_TPU_GREEDY_DEFER", "0")
    r3 = Runner()
    r3.run_stage1(Stage1Params(input_files=[inp], **kw))
    r3.run_stage2(Stage2Params(output_file_name=str(tmp_path / "direct"), cutoff_min=1))
    assert _db_bytes(str(tmp_path / "resumed")) == \
        _db_bytes(str(tmp_path / "direct"))
