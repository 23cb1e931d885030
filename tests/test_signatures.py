"""Signature semantics vs a direct scalar re-derivation of the reference
rules (mmer.h:40-104, s_mapper.h:141-235)."""
import numpy as np
import pytest

from kmc_tpu import signatures as sig


def scalar_is_allowed(mmer: int, length: int) -> bool:
    # direct transcription of the reference rule for cross-checking
    if (mmer & 0x3F) == 0x3F:
        return False
    if (mmer & 0x3F) == 0x3B:
        return False
    if (mmer & 0x3C) == 0x3C:
        return False
    m = mmer
    for _ in range(length - 3):
        if (m & 0xF) == 0:
            return False
        m >>= 2
    if m == 0 or m == 0x04 or (m & 0xF) == 0:
        return False
    return True


@pytest.mark.parametrize("m", [5, 7, 9])
def test_is_allowed_matches_scalar(m):
    vals = np.arange(1 << (2 * m), dtype=np.uint32)
    got = sig.is_allowed(vals, m)
    n_sample = min(2000, len(vals))
    sample = np.random.default_rng(0).choice(len(vals), n_sample, replace=False)
    for v in sample:
        assert got[v] == scalar_is_allowed(int(v), m), v


def test_rev_comp():
    # ACGTT (m=5): A=0 C=1 G=2 T=3 -> rev comp = AACGT
    val = (0 << 8) | (1 << 6) | (2 << 4) | (3 << 2) | 3
    rc = sig.rev_comp_mmer(np.array([val], dtype=np.uint32), 5)[0]
    expect = (0 << 8) | (0 << 6) | (1 << 4) | (2 << 2) | 3
    assert rc == expect


@pytest.mark.parametrize("m", [5, 9])
def test_norm_table_props(m):
    t = sig.norm_table(m)
    special = 1 << (2 * m)
    vals = np.arange(special, dtype=np.uint32)
    rc = sig.rev_comp_mmer(vals, m)
    # strand symmetry: norm[x] == norm[revcomp(x)]
    assert (t[rc] == t).all()
    # norm is either one of the strands or special
    ok = (t == vals) | (t == rc) | (t == special)
    assert ok.all()
    # allowed m-mers have norm <= their own value
    allowed = sig.is_allowed(vals, m)
    assert (t[allowed] <= vals[allowed]).all()


def test_signature_map_covers_all_bins():
    m, n_bins = 7, 64
    rng = np.random.default_rng(1)
    stats = rng.integers(0, 10_000, size=sig.map_size(m)).astype(np.uint64)
    smap = sig.build_signature_map(stats, m, n_bins)
    allowed = sig.is_allowed(np.arange(sig.map_size(m) - 1, dtype=np.uint32), m)
    assert (smap[:-1][allowed] >= 0).all()
    assert (smap[:-1][~allowed] == -1).all()
    n_used = smap.max() + 1
    assert n_used <= n_bins
    assert smap[sig.special_signature(m)] == n_used - 1


def test_signature_map_balance():
    m, n_bins = 9, 512
    rng = np.random.default_rng(2)
    msize = sig.map_size(m)
    stats = rng.integers(0, 1000, size=msize).astype(np.uint64)
    smap = sig.build_signature_map(stats, m, n_bins)
    weights = stats[: msize - 1].astype(np.float64) + 1000.0
    allowed = sig.is_allowed(np.arange(msize - 1, dtype=np.uint32), m)
    loads = np.zeros(int(smap.max()) + 1)
    np.add.at(loads, smap[:-1][allowed], weights[allowed])
    mean = loads[loads > 0].mean()
    assert loads.max() < 3 * mean  # greedy keeps bins near the mean


def test_kmer_signatures_numpy_matches_bruteforce():
    rng = np.random.default_rng(3)
    k, m = 15, 5
    codes = rng.integers(0, 4, 200).astype(np.uint8)
    codes[20] = 4  # an N
    got = sig.kmer_signatures_numpy(codes, k, m)
    table = sig.norm_table(m)
    for i in range(len(codes) - k + 1):
        window = codes[i : i + k]
        if (window >= 4).any():
            assert got[i] == (1 << (2 * m)) + 1
            continue
        norms = []
        for j in range(k - m + 1):
            v = 0
            for c in window[j : j + m]:
                v = (v << 2) | int(c)
            norms.append(int(table[v]))
        assert got[i] == min(norms), i
