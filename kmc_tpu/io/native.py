"""ctypes bindings for the native host runtime (native/kmc_host.cpp).

The shared library is built on first use with g++ (baked into the image) and
cached next to the source; every entry point has a pure-NumPy fallback in
readers.py, so the package works even without a toolchain.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_lock = threading.Lock()
_lib = None
_lib_tried = False

_SRC = Path(__file__).resolve().parent.parent.parent / "native" / "kmc_host.cpp"


def _build(src: Path, out: Path) -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        str(src), "-o", str(out), "-lz",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
        return False


def _cache_dir() -> Path:
    d = os.environ.get("KMC_TPU_NATIVE_CACHE")
    if d:
        return Path(d)
    base = os.environ.get("XDG_CACHE_HOME") or str(Path.home() / ".cache")
    return Path(base) / "kmc_tpu" / "native"


def get_lib():
    """Load (building if needed) the native library; None if unavailable.

    The build cache is keyed on a content hash of the source (git does not
    preserve mtimes, so an mtime check would let a stale — or foreign-
    microarch, since we build -march=native — binary mask source changes)
    and lives in a user cache dir so read-only installs work.
    """
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    with _lock:
        if _lib is not None or _lib_tried:
            return _lib
        _lib_tried = True
        if not _SRC.exists():
            return None
        digest = hashlib.sha256(_SRC.read_bytes()).hexdigest()[:16]
        so = _cache_dir() / f"libkmc_host-{digest}.so"
        if not so.exists():
            try:
                so.parent.mkdir(parents=True, exist_ok=True)
            except OSError:
                return None
            tmp = so.with_suffix(".so.tmp%d" % os.getpid())
            if not _build(_SRC, tmp):
                return None
            os.replace(tmp, so)
        try:
            lib = ctypes.CDLL(str(so))
        except OSError:
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.parse_fastq.restype = ctypes.c_int64
        lib.parse_fastq.argtypes = [u8p, ctypes.c_int64, u8p, i64p]
        lib.parse_fasta.restype = ctypes.c_int64
        lib.parse_fasta.argtypes = [u8p, ctypes.c_int64, u8p, i64p]
        lib.homopolymer_compress.restype = ctypes.c_int64
        lib.homopolymer_compress.argtypes = [u8p, ctypes.c_int64, u8p, i64p]
        lib.gz_open.restype = ctypes.c_void_p
        lib.gz_open.argtypes = [ctypes.c_char_p, ctypes.c_int64]
        lib.gz_read.restype = ctypes.c_int64
        lib.gz_read.argtypes = [ctypes.c_void_p, u8p, ctypes.c_int64]
        lib.gz_close.restype = None
        lib.gz_close.argtypes = [ctypes.c_void_p]
        lib.pack_codes.restype = None
        lib.pack_codes.argtypes = [u8p, ctypes.c_int64, u8p, u8p]
        lib.pack_codes_fused.restype = None
        lib.pack_codes_fused.argtypes = [u8p, ctypes.c_int64, u8p]
        lib.parse_bam.restype = ctypes.c_int64
        lib.parse_bam.argtypes = [u8p, ctypes.c_int64, u8p, i64p, i64p]
        lib.pack_codes_boundaries.restype = ctypes.c_int64
        lib.pack_codes_boundaries.argtypes = [
            u8p, ctypes.c_int64, u8p, ctypes.c_int64, i64p]
        lib.pack_2bit_rows.restype = None
        lib.pack_2bit_rows.argtypes = [u8p, ctypes.c_int64, ctypes.c_int64, u8p]
        lib.unpack_2bit_rows.restype = None
        lib.unpack_2bit_rows.argtypes = [u8p, ctypes.c_int64, ctypes.c_int64, u8p]
        _lib = lib
        return _lib


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


class NativeParser:
    """Resumable FASTQ/FASTA byte->code parser backed by the C library."""

    def __init__(self, fmt: str):
        self.lib = get_lib()
        if self.lib is None:
            raise RuntimeError("native library unavailable")
        if fmt == "fastq":
            self._fn = self.lib.parse_fastq
        elif fmt in ("fasta", "multifasta"):
            self._fn = self.lib.parse_fasta
        else:
            raise ValueError(fmt)
        self.state = np.zeros(2, dtype=np.int64)

    @property
    def n_reads(self) -> int:
        return int(self.state[1])

    def parse(self, buf: np.ndarray) -> np.ndarray:
        out = np.empty(len(buf) + 1, dtype=np.uint8)
        n = self._fn(
            _u8ptr(buf),
            len(buf),
            _u8ptr(out),
            self.state.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        return out[:n]


class NativeGzReader:
    """Streaming gzip reader (multi-member aware) backed by zlib."""

    def __init__(self, path: str, in_buf_bytes: int = 4 << 20):
        self.lib = get_lib()
        if self.lib is None:
            raise RuntimeError("native library unavailable")
        self.handle = self.lib.gz_open(str(path).encode(), in_buf_bytes)
        if not self.handle:
            raise OSError(f"cannot open {path}")

    def read_into(self, out: np.ndarray) -> int:
        n = self.lib.gz_read(self.handle, _u8ptr(out), len(out))
        if n < 0:
            raise OSError("gzip inflate error")
        return int(n)

    def close(self):
        if self.handle:
            self.lib.gz_close(self.handle)
            self.handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def pack_codes(codes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """codes u8[n] (n % 8 == 0) -> (packed u8[n/4], maskbits u8[n/8]).

    Native when available, NumPy otherwise; both use MSB-first bit order
    (np.packbits default) so the device unpack in ops/extract.py matches.
    """
    n = len(codes)
    assert n % 8 == 0
    lib = get_lib()
    if lib is not None:
        if not codes.flags.c_contiguous:
            codes = np.ascontiguousarray(codes)
        packed = np.empty(n // 4, dtype=np.uint8)
        mask = np.empty(n // 8, dtype=np.uint8)
        lib.pack_codes(_u8ptr(codes), n, _u8ptr(packed), _u8ptr(mask))
        return packed, mask
    c4 = codes & 3
    packed = ((c4[0::4] << 6) | (c4[1::4] << 4) | (c4[2::4] << 2) | c4[3::4]).astype(
        np.uint8
    )
    mask = np.packbits(codes < 4)
    return packed, mask


def pack_codes_fused(codes: np.ndarray) -> np.ndarray:
    """codes u8[n] (n % 8 == 0) -> one u8[3n/8] buffer: packed 2-bit codes
    followed by the validity bitmask (split on device; one H2D transfer)."""
    n = len(codes)
    assert n % 8 == 0
    lib = get_lib()
    if lib is not None:
        if not codes.flags.c_contiguous:
            codes = np.ascontiguousarray(codes)
        out = np.empty(n // 4 + n // 8, dtype=np.uint8)
        lib.pack_codes_fused(_u8ptr(codes), n, _u8ptr(out))
        return out
    packed, mask = pack_codes(codes)
    return np.concatenate([packed, mask])


class NativeBamParser:
    """Resumable BAM record parser backed by the C library; feed inflated
    BGZF bytes, get code chunks.  Unconsumed tail bytes (split records) are
    carried internally."""

    def __init__(self, both_strands: bool = True):
        self.lib = get_lib()
        if self.lib is None:
            raise RuntimeError("native library unavailable")
        self.state = np.zeros(5, dtype=np.int64)
        self.state[4] = 1 if both_strands else 0
        self._carry = np.zeros(0, dtype=np.uint8)

    @property
    def n_reads(self) -> int:
        return int(self.state[3])

    def parse(self, chunk: np.ndarray) -> np.ndarray:
        if len(self._carry):
            chunk = np.concatenate([self._carry, chunk])
        n = len(chunk)
        out = np.empty(2 * n + n // 16 + 64, dtype=np.uint8)
        consumed = ctypes.c_int64(0)
        m = self.lib.parse_bam(
            _u8ptr(chunk), n, _u8ptr(out),
            self.state.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ctypes.byref(consumed),
        )
        if m < 0:
            raise ValueError("malformed BAM stream")
        self._carry = chunk[consumed.value :].copy()
        return out[:m]


def boundary_capacity(n: int) -> int:
    """Delta slots reserved per n-code batch (one per <=64-code read)."""
    return n // 64


def pack_codes_boundaries(codes: np.ndarray):
    """codes u8[n] -> (buf u8[n/4 + 2*boundary_capacity(n)], tail_start)
    in the boundary-delta feed format (see native/kmc_host.cpp), or
    (None, -1) when the batch is sentinel-dense and must use the masked
    format.  Codes at [tail_start, n) are a trailing sentinel run (batch
    padding), marked invalid on device from the scalar instead of listed."""
    n = len(codes)
    assert n % 8 == 0
    lib = get_lib()
    max_b = boundary_capacity(n)
    if lib is None:
        ts = n
        while ts > 0 and codes[ts - 1] >= 4:
            ts -= 1
        sent = np.flatnonzero(codes[:ts] >= 4).astype(np.int64)
        if len(sent) > max_b or (len(sent) and
                                 np.diff(np.concatenate([[-1], sent])).max()
                                 > 65535):
            return None, -1
        deltas = np.diff(np.concatenate([[-1], sent])).astype("<u2")
        buf = np.zeros(n // 4 + 2 * max_b, np.uint8)
        c4 = codes & 3
        buf[: n // 4] = ((c4[0::4] << 6) | (c4[1::4] << 4) | (c4[2::4] << 2)
                         | c4[3::4]).astype(np.uint8)
        buf[n // 4 : n // 4 + 2 * len(deltas)] = deltas.view(np.uint8)
        return buf, ts
    if not codes.flags.c_contiguous:
        codes = np.ascontiguousarray(codes)
    buf = np.empty(n // 4 + 2 * max_b, np.uint8)
    ts = ctypes.c_int64(0)
    b = lib.pack_codes_boundaries(_u8ptr(codes), n, _u8ptr(buf), max_b,
                                  ctypes.byref(ts))
    if b < 0:
        return None, -1
    return buf, int(ts.value)


def native_homopolymer_compress(codes: np.ndarray, prev_last: np.ndarray) -> np.ndarray:
    lib = get_lib()
    out = np.empty(len(codes), dtype=np.uint8)
    n = lib.homopolymer_compress(
        _u8ptr(codes), len(codes), _u8ptr(out),
        prev_last.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return out[:n]
