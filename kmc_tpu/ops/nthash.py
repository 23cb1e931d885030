"""ntHash-based k-mer abundance-histogram estimator (ntCard algorithm).

Semantics mirror the reference's CntHashEstimator
(/root/reference/kmc_core/libs/ntHash/ntHashWrapper.h:97-456): a canonical
rolling ntHash over every read, two hash-prefix-gated sampled counter
arrays, and the ntCard recurrence solving the abundance histogram from
sampled collision statistics (Mohamadi et al., Bioinformatics 2017).

Vectorized reformulation (not a rolling scan): ntHash's "split rotation"
srol is linear over XOR, so the hash of the window at position i is a
closed-form XOR of per-position table lookups:

    fh[i] = XOR_j srol^(k-1-j)(seed[c[i+j]])
    rh[i] = XOR_j srol^(j+1... )          (derived symmetrically)

which is k vectorized 4-entry gathers — no sequential dependence at all.
The standard seeds are the public ntHash constants.
"""
from __future__ import annotations

import numpy as np

# public ntHash seed constants
SEED = np.array(
    [0x3C8BFBB395C60474, 0x3193C18562A02B4C, 0x20323ED082572324, 0x295549F54BE24456],
    dtype=np.uint64,
)

_U1 = np.uint64(1)
_U33 = np.uint64(33)
_U63 = np.uint64(63)


def srol(v):
    """ntHash2 split rotate left: 64-bit rol1 then swap bits 0 and 33,
    equivalent to independent rotations of a 33/31-bit split."""
    v = np.asarray(v, dtype=np.uint64)
    r = (v << _U1) | (v >> _U63)
    swap = ((r >> np.uint64(0)) ^ (r >> _U33)) & _U1
    return r ^ (swap * ((_U1 << _U33) | _U1))


def sror(v):
    """Inverse of srol: swap bits 0/33 then 64-bit ror1."""
    v = np.asarray(v, dtype=np.uint64)
    swap = ((v >> np.uint64(0)) ^ (v >> _U33)) & _U1
    v = v ^ (swap * ((_U1 << _U33) | _U1))
    return (v >> _U1) | (v << _U63)


def _srol_n(x: np.ndarray, n: int) -> np.ndarray:
    for _ in range(n):
        x = srol(x)
    return x


def nthash_canonical(codes: np.ndarray, k: int):
    """Canonical ntHash of every k-mer window of a code stream.

    codes: uint8, 0..3 valid, >=4 breaks windows.  Returns (hashes uint64,
    valid bool) of length len(codes)-k+1.  Matches the reference's
    M_NTC64 incremental values exactly (verified in tests)."""
    n = len(codes) - k + 1
    if n <= 0:
        return np.zeros(0, np.uint64), np.zeros(0, bool)
    c = np.minimum(codes, 3).astype(np.int64)
    bad = codes >= 4
    cs = np.concatenate([[0], np.cumsum(bad)])
    valid = (cs[k:] - cs[:-k]) == 0

    # forward: fh[i] = XOR_j srol^{k-1-j}(seed[c[i+j]])
    fh = np.zeros(n, np.uint64)
    rh = np.zeros(n, np.uint64)
    seed_f = SEED.copy()
    # reverse strand: rh[i] = XOR_j srol^{j}(seed[3 - c[i+j]]) — expanding
    # the reference's M_NTR64 recurrence telescopes to this closed form
    # (verified against the scalar recurrence in tests)
    seed_r = SEED[::-1].copy()  # seed[3 - c]
    tab_f = np.empty((k, 4), np.uint64)
    tab_r = np.empty((k, 4), np.uint64)
    acc_f = seed_f.copy()
    acc_r = seed_r.copy()
    for j in range(k):
        tab_f[k - 1 - j] = acc_f  # srol^j applied to seed
        tab_r[j] = acc_r
        acc_f = srol(acc_f)
        acc_r = srol(acc_r)
    for j in range(k):
        fh ^= tab_f[j][c[j : j + n]]
        rh ^= tab_r[j][c[j : j + n]]
    h = np.minimum(fh, rh)
    return h, valid


class NtCardEstimator:
    """Streaming abundance-histogram estimator (defaults s=11, r=27 as the
    reference ctor; kmc.h:1118-1121 picks r by input size)."""

    def __init__(self, k: int, s: int = 11, r: int = 27):
        self.k = k
        self.s = s
        self.r = r
        self.counters = [
            np.zeros(1 << r, np.uint32),
            np.zeros(1 << r, np.uint32),
        ]
        self._mask = np.uint64((1 << r) - 1)
        self._accept1 = np.uint64((1 << (s - 1)) - 1)
        self.max_occ_value = 65536

    def process_codes(self, codes: np.ndarray):
        """Feed a code stream (uint8; >=4 breaks k-mer windows)."""
        h, valid = nthash_canonical(codes, self.k)
        if len(h) == 0:
            return
        h = h[valid]
        pref = h >> np.uint64(63 - self.s)
        sel0 = pref == np.uint64(1)
        sel1 = (pref >> _U1) == self._accept1
        for sel, ctr in ((sel0, self.counters[0]), (sel1, self.counters[1])):
            idx = (h[sel] & self._mask).astype(np.int64)
            if len(idx):
                np.add.at(ctr, idx, 1)

    def estimate_histogram(self) -> list[int]:
        """ntCard recurrence (ntHashWrapper.h:436-455)."""
        max_occ = int(max(self.counters[0].max(), self.counters[1].max()))
        max_occ = min(max(max_occ, 2), self.max_occ_value)
        r = self.r
        h0 = np.bincount(np.minimum(self.counters[0], self.max_occ_value),
                         minlength=max_occ + 1)[: max_occ + 1]
        h1 = np.bincount(np.minimum(self.counters[1], self.max_occ_value),
                         minlength=max_occ + 1)[: max_occ + 1]
        mean = (h0 + h1) / 2.0
        c_log2 = np.log(2.0)
        if mean[0] <= 0:
            return [0] * (max_occ + 1)
        log_m0 = np.log(mean[0])
        f0_mean = float(np.int64((r * c_log2 - log_m0) * (1 << (self.s + r))))
        denom = mean[0] * (log_m0 - r * c_log2)
        if denom == 0:
            return [0] * (max_occ + 1)
        hist = np.zeros(max_occ + 1)
        hist[1] = -1.0 * mean[1] / denom
        for i in range(2, max_occ + 1):
            ssum = 0.0
            for j in range(1, i):
                ssum += j * mean[i - j] * hist[j]
            hist[i] = -1.0 * mean[i] / denom - ssum / (i * mean[0])
        out = [0] * (max_occ + 1)
        for i in range(1, max_occ + 1):
            out[i] = abs(int(hist[i] * f0_mean))
        return out
