"""Fuzz equivalence of the SIMD-vectorized native host loops vs the pure
NumPy fallbacks (native/kmc_host.cpp translate/pack SSE paths vs
io/readers.py / io/native.py scalar semantics).

The native parsers/packers are the hot stage-1 host path; their SIMD inner
loops (16-byte SSE2 base translation, SSSE3 madd 2-bit packing, movemask
sentinel scan) must be byte-identical to the scalar definitions on
adversarial inputs: mixed case, non-ACGT bytes, chunk-boundary splits, odd
lengths, sentinel-dense batches.
"""
import numpy as np
import pytest

from kmc_tpu.io import native, readers
from kmc_tpu.io.native import get_lib

pytestmark = pytest.mark.skipif(
    get_lib() is None, reason="native library unavailable")


def _numpy_parse(data: bytes, fmt: str) -> np.ndarray:
    st = readers.ParseState()
    fn = readers._PARSERS[fmt]
    buf = np.frombuffer(data, dtype=np.uint8)
    return fn(buf, st), st.n_reads


def _native_parse(data: bytes, fmt: str, chunk: int) -> np.ndarray:
    p = native.NativeParser(fmt)
    outs = []
    for lo in range(0, len(data), chunk):
        outs.append(p.parse(np.frombuffer(data[lo : lo + chunk], np.uint8)))
    return (np.concatenate(outs) if outs else np.zeros(0, np.uint8)), p.n_reads


def _random_fastq(rng, n_reads, weird=False) -> bytes:
    out = []
    alphabet = b"ACGTacgtNnRYKX.-@>+ " if weird else b"ACGTacgt"
    aa = np.frombuffer(alphabet, np.uint8)
    for i in range(n_reads):
        L = int(rng.integers(0, 97 if weird else 151))
        seq = aa[rng.integers(0, len(aa), L)].tobytes()
        out.append(b"@r%d some description\n%s\n+\n%s\n"
                   % (i, seq, b"I" * L))
    return b"".join(out)


def _random_fasta(rng, n_seqs) -> bytes:
    out = []
    aa = np.frombuffer(b"ACGTacgtNn", np.uint8)
    for i in range(n_seqs):
        L = int(rng.integers(0, 300))
        seq = aa[rng.integers(0, len(aa), L)].tobytes()
        # multiline: split at random widths
        w = int(rng.integers(1, 80))
        lines = [seq[j : j + w] for j in range(0, L, w)] or [b""]
        out.append(b">s%d desc\n%s\n" % (i, b"\n".join(lines)))
    return b"".join(out)


@pytest.mark.parametrize("chunk", [7, 64, 1 << 14])
def test_fastq_parse_equivalence(chunk):
    rng = np.random.default_rng(42)
    for weird in (False, True):
        data = _random_fastq(rng, 200, weird=weird)
        want, want_reads = _numpy_parse(data, "fastq")
        got, got_reads = _native_parse(data, "fastq", chunk)
        assert np.array_equal(want, got), (chunk, weird)
        assert want_reads == got_reads


@pytest.mark.parametrize("chunk", [13, 1 << 14])
def test_fasta_parse_equivalence(chunk):
    rng = np.random.default_rng(43)
    data = _random_fasta(rng, 120)
    want, _ = _numpy_parse(data, "fasta")
    got, _ = _native_parse(data, "fasta", chunk)
    assert np.array_equal(want, got)


def test_translate_all_256_bytes():
    """Every byte value must map exactly like the scalar LUT: A/a C/c G/g
    T/t -> 0..3, everything else -> 4 (one long sequence line covers the
    SIMD body and the scalar tail)."""
    seq = bytes(b for b in range(256) if b not in (10, 62))  # no \n or '>'
    data = b">x\n" + seq + b"\n"
    want, _ = _numpy_parse(data, "fasta")
    got, _ = _native_parse(data, "fasta", 1 << 12)
    assert np.array_equal(want, got)
    # and the values themselves match the documented code map
    lut = np.full(256, 4, np.uint8)
    for i, ch in enumerate(b"ACGT"):
        lut[ch] = i
        lut[ch + 32] = i
    expect = lut[np.frombuffer(seq, np.uint8)]
    # parser emits one leading sentinel for the header
    assert np.array_equal(got[1:], expect)


def _pack_codes_numpy(codes):
    c4 = codes & 3
    packed = ((c4[0::4] << 6) | (c4[1::4] << 4) | (c4[2::4] << 2)
              | c4[3::4]).astype(np.uint8)
    mask = np.packbits(codes < 4)
    return packed, mask


@pytest.mark.parametrize("n", [8, 16, 24, 120, 1 << 13])
def test_pack_codes_equivalence(n):
    rng = np.random.default_rng(7)
    for density in (0.0, 0.01, 0.5, 1.0):
        codes = rng.integers(0, 4, n).astype(np.uint8)
        sent = rng.random(n) < density
        codes[sent] = 4
        packed, mask = native.pack_codes(codes)
        wp, wm = _pack_codes_numpy(codes)
        assert np.array_equal(packed, wp), (n, density)
        assert np.array_equal(mask, wm), (n, density)


@pytest.mark.parametrize("n", [64, 1 << 12])
def test_pack_codes_boundaries_equivalence(n):
    """Native boundary-delta encoding == the NumPy fallback on sparse,
    dense, empty, and tail-padding layouts (including the -1 refusal)."""
    rng = np.random.default_rng(11)
    lib = get_lib()
    assert lib is not None

    def numpy_ref(codes):
        max_b = native.boundary_capacity(len(codes))
        ts = len(codes)
        while ts > 0 and codes[ts - 1] >= 4:
            ts -= 1
        sent = np.flatnonzero(codes[:ts] >= 4).astype(np.int64)
        if len(sent) > max_b or (len(sent) and np.diff(
                np.concatenate([[-1], sent])).max() > 65535):
            return None, -1
        deltas = np.diff(np.concatenate([[-1], sent])).astype("<u2")
        buf = np.zeros(len(codes) // 4 + 2 * max_b, np.uint8)
        c4 = codes & 3
        buf[: len(codes) // 4] = ((c4[0::4] << 6) | (c4[1::4] << 4)
                                  | (c4[2::4] << 2) | c4[3::4]).astype(np.uint8)
        buf[len(codes) // 4 : len(codes) // 4 + 2 * len(deltas)] = (
            deltas.view(np.uint8))
        return buf, ts

    for density, pad in ((0.0, 0), (0.005, 0), (0.005, 37), (0.9, 0),
                         (0.0, n)):
        codes = rng.integers(0, 4, n).astype(np.uint8)
        sent = rng.random(n) < density
        codes[sent] = 4
        if pad:
            codes[n - pad :] = 4
        buf, ts = native.pack_codes_boundaries(codes)
        wbuf, wts = numpy_ref(codes)
        assert ts == wts, (density, pad)
        if wbuf is None:
            assert buf is None
        else:
            assert np.array_equal(buf, wbuf), (density, pad)
