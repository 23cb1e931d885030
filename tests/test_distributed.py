"""Multi-device counting step on the virtual 8-device CPU mesh."""
import numpy as np
import pytest

from kmc_tpu import oracle
from kmc_tpu.io.readers import BatchStream, CODE_LUT
from kmc_tpu.ops.extract import batch_len
from kmc_tpu.parallel.distributed import make_distributed_count_step, make_mesh
from kmc_tpu.runner import words_to_kmer_bytes
from kmc_tpu.formats.kmc_db import kmers_bytes_to_strings
from kmc_tpu.signatures import build_signature_map, map_size

from util import random_reads


def reads_to_code_batches(reads, s, k, n_devices):
    """Pack reads into (n_batches, L) code arrays, n_batches % D == 0."""
    stream = []
    for r in reads:
        stream.append(CODE_LUT[np.frombuffer(r.encode(), dtype=np.uint8)])
        stream.append(np.array([4], dtype=np.uint8))
    bs = BatchStream(s, k)
    batches = list(bs.batches(iter(stream)))
    L = batch_len(s, k)
    while len(batches) % n_devices:
        batches.append(np.full(L, 4, dtype=np.uint8))
    return np.stack(batches)


@pytest.mark.parametrize("k", [21, 33])
def test_distributed_matches_oracle(k):
    import jax

    D = len(jax.devices())
    assert D == 8
    mesh = make_mesh()
    s = 1 << 10
    sig_len = 7
    reads = random_reads(64, 100, seed=42, genome_len=600)

    codes = reads_to_code_batches(reads, s, k, D)
    n_rounds = codes.shape[0] // D

    sig_map = build_signature_map(
        np.zeros(map_size(sig_len), np.uint64), sig_len, 64
    ).astype(np.int32)
    # special/disallowed map to valid bins already; clamp -1 to last bin
    sig_map = np.where(sig_map < 0, sig_map.max(), sig_map).astype(np.int32)

    step, capacity = make_distributed_count_step(
        mesh, s=s, k=k, sig_len=sig_len, both_strands=True, capacity=s
    )

    got = {}
    for r in range(n_rounds):
        words, counts, n_out, n_dropped = step(codes[r * D : (r + 1) * D], sig_map)
        assert int(np.asarray(n_dropped).sum()) == 0
        for d in range(D):
            n = int(n_out[d])
            w = np.asarray(words[d][:n])
            c = np.asarray(counts[d][:n])
            kb = words_to_kmer_bytes(w, k)
            for s_km, cnt in zip(kmers_bytes_to_strings(kb, k), c):
                got[s_km] = got.get(s_km, 0) + int(cnt)

    expect = oracle.count_kmers(reads, k)
    assert got == dict(expect)


def test_owner_partition_consistency():
    """The same k-mer must always land on the same owner device."""
    import jax

    mesh = make_mesh()
    D = 8
    s = 1 << 10
    k, sig_len = 21, 7
    reads = random_reads(48, 90, seed=5, genome_len=400)
    codes = reads_to_code_batches(reads, s, k, D)
    sig_map = build_signature_map(
        np.zeros(map_size(sig_len), np.uint64), sig_len, 64
    )
    sig_map = np.where(sig_map < 0, sig_map.max(), sig_map).astype(np.int32)
    step, _ = make_distributed_count_step(
        mesh, s=s, k=k, sig_len=sig_len, both_strands=True, capacity=s
    )
    owner_of = {}
    for r in range(codes.shape[0] // D):
        words, counts, n_out, _ = step(codes[r * D : (r + 1) * D], sig_map)
        for d in range(D):
            n = int(n_out[d])
            kb = words_to_kmer_bytes(np.asarray(words[d][:n]), k)
            for s_km in kmers_bytes_to_strings(kb, k):
                assert owner_of.setdefault(s_km, d) == d
