"""ntHash closed-form vs a direct transcription of the reference's scalar
recurrence (ntHashWrapper.h:252-304), and ntCard estimation sanity."""
import numpy as np
import pytest

from kmc_tpu.ops.nthash import SEED, NtCardEstimator, nthash_canonical, srol, sror


def _srol_scalar(v):
    v = ((v << 1) | (v >> 63)) & 0xFFFFFFFFFFFFFFFF
    swap = ((v >> 0) ^ (v >> 33)) & 1
    return v ^ (swap * ((1 << 33) | 1))


def _sror_scalar(v):
    swap = ((v >> 0) ^ (v >> 33)) & 1
    v = v ^ (swap * ((1 << 33) | 1))
    return ((v >> 1) | (v << 63)) & 0xFFFFFFFFFFFFFFFF


def scalar_nthash_stream(codes, k):
    """Transcription of CntHashEstimator::Process's rolling recurrence."""
    seed = [int(x) for x in SEED]
    ms = [s for s in seed]
    for _ in range(k):
        ms = [_srol_scalar(x) for x in ms]  # srol^k(seed[c])
    out = []
    fh = rh = 0
    buf = []
    for c in codes:
        c = int(c)
        if c >= 4:
            buf = []
            fh = rh = 0
            out.append(None)
            continue
        if len(buf) == k:
            c_out = buf.pop(0)
            fh = _srol_scalar(fh) ^ ms[c_out] ^ seed[c]
            rh = _sror_scalar(rh ^ ms[3 - c] ^ seed[3 - c_out])
            out.append(min(fh, rh))
        else:
            fh = _srol_scalar(fh) ^ seed[c]
            rh = _sror_scalar(rh ^ ms[3 - c])
            if len(buf) == k - 1:
                out.append(min(fh, rh))
            else:
                out.append(None)
        buf.append(c)
    # out[i] is the hash of the window ENDING at i; align to window starts
    hashes = {}
    for i, h in enumerate(out):
        if h is not None:
            hashes[i - k + 1] = h
    return hashes


def test_srol_sror_inverse():
    rng = np.random.default_rng(0)
    v = rng.integers(0, 1 << 63, 1000, dtype=np.uint64)
    np.testing.assert_array_equal(sror(srol(v)), v)
    np.testing.assert_array_equal(srol(sror(v)), v)


@pytest.mark.parametrize("k", [5, 21, 32, 33, 64])
def test_closed_form_matches_recurrence(k):
    rng = np.random.default_rng(k)
    codes = rng.integers(0, 4, 300).astype(np.uint8)
    codes[50] = 4  # an N resets the recurrence
    expect = scalar_nthash_stream(codes, k)
    got, valid = nthash_canonical(codes, k)
    for i in range(len(got)):
        if valid[i]:
            assert i in expect and int(got[i]) == expect[i], i
        else:
            assert i not in expect


def test_ntcard_estimate_order_of_magnitude():
    # a random genome with known duplication structure: histogram should
    # roughly recover the distinct-kmer count at each abundance
    rng = np.random.default_rng(1)
    genome = rng.integers(0, 4, 200_000).astype(np.uint8)
    k = 25
    est = NtCardEstimator(k, s=11, r=15)
    # 3x coverage: each position appears ~3 times
    stream = np.concatenate([genome, [4], genome, [4], genome])
    est.process_codes(stream.astype(np.uint8))
    hist = est.estimate_histogram()
    total_est = sum(hist[1:])
    n_true_unique = 200_000 - k + 1  # nearly all distinct
    assert 0.5 * n_true_unique < total_est < 2.0 * n_true_unique
    # abundance-3 dominates
    assert hist[3] == max(hist[1:6])
