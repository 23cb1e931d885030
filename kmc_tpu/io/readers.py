"""Host-side input: FASTQ/FASTA (plain or gzip) -> flat 2-bit code stream.

TPU-first replacement for the reference's reader/splitter front half
(binary_reader.h, fastq_reader.cpp): instead of per-read record objects, the
whole input becomes ONE flat uint8 code stream (A,C,G,T -> 0..3; every other
byte -> 4) in which read separators and N bases are the same sentinel that
breaks k-mers.  Parsing is vectorized NumPy: line membership is computed
from a newline cumsum, and the per-format byte mask is applied to the raw
buffer — the newline (FASTQ) or the '>' marker ('FASTA') doubles as the
inter-read sentinel, so no per-read Python loop ever runs.

Batches are consecutive stream windows: a batch exposes S candidate k-mer
start positions and carries k+TAIL context codes past them, so k-mers
crossing a batch boundary are evaluated exactly once (no read splitting, no
halo double-counting).
"""
from __future__ import annotations

import gzip
import io
from dataclasses import dataclass
from pathlib import Path
from typing import Iterator

import numpy as np

from ..defs import CODE_INVALID
from ..ops.extract import TAIL

# byte -> code translation: ACGTacgt -> 0..3, everything else -> 4
CODE_LUT = np.full(256, CODE_INVALID, dtype=np.uint8)
for i, ch in enumerate(b"ACGT"):
    CODE_LUT[ch] = i
    CODE_LUT[ord(chr(ch).lower())] = i

CHUNK_BYTES = 64 << 20


def _open_raw(path: str):
    p = Path(path)
    if p.suffix == ".gz":
        return gzip.open(p, "rb")
    return open(p, "rb")


def _line_ids(buf: np.ndarray, first_line_id: int) -> np.ndarray:
    """Per-byte global line index (newline terminates its line)."""
    nl = buf == 10
    ids = np.cumsum(nl)
    ids -= nl  # newline byte belongs to the line it terminates
    return ids + first_line_id


@dataclass
class ParseState:
    line_id: int = 0  # global index of the line containing the next byte
    n_reads: int = 0
    consumed_bytes: int = 0  # raw (compressed) input bytes consumed so far


def _fastq_codes(buf: np.ndarray, state: ParseState) -> np.ndarray:
    """Extract sequence-line bytes (incl. their newline, which maps to the
    sentinel) from a FASTQ buffer ending on a line boundary."""
    ids = _line_ids(buf, state.line_id)
    mask = (ids & 3) == 1
    codes = CODE_LUT[buf[mask]]
    n_lines = int(np.count_nonzero(buf == 10))
    a, b = state.line_id, state.line_id + n_lines
    state.n_reads += (b + 2) // 4 - (a + 2) // 4  # lines with id % 4 == 1
    state.line_id = b
    return codes


def _fasta_codes(buf: np.ndarray, state: ParseState) -> np.ndarray:
    """FASTA (single or multi-line records): header lines contribute only
    their '>' byte (the sentinel); sequence lines contribute bases with
    newlines removed, so records spanning lines stay k-mer contiguous."""
    nl_pos = np.flatnonzero(buf == 10)
    n_lines = len(nl_pos)
    # start byte of each line in this buffer
    starts = np.concatenate([[0], nl_pos[:-1] + 1])
    first_byte = buf[starts]
    is_header = first_byte == ord(">")
    state.n_reads += int(np.count_nonzero(is_header))
    ids = _line_ids(buf, 0)
    hdr_per_byte = is_header[ids]
    keep = (~hdr_per_byte & (buf != 10)) | (hdr_per_byte & (buf == ord(">")))
    # a '>' inside a sequence line would wrongly sentinel; malformed anyway
    codes = CODE_LUT[buf[keep]]
    state.line_id += n_lines
    return codes


_PARSERS = {
    "fastq": _fastq_codes,
    "fasta": _fasta_codes,
    "multifasta": _fasta_codes,
}


def file_code_stream(paths, fmt: str, state: ParseState | None = None,
                     max_bytes: int | None = None) -> Iterator[np.ndarray]:
    """Yield code-array chunks for a list of input files.

    A sentinel separates files implicitly (each chunk parse ends on a line
    boundary; the trailing newline of the last read maps to the sentinel).
    max_bytes limits *consumed input bytes* (for stage-0 sampling,
    reference defs.h:37 STATS_FASTQ_SIZE).

    Uses the native C parser/inflater (native/kmc_host.cpp) when available;
    falls back to the vectorized-NumPy path below.
    """
    if fmt in _PARSERS:
        try:
            from .native import NativeParser  # probe availability

            NativeParser(fmt)
            yield from _native_code_stream(paths, fmt, state, max_bytes)
            return
        except (RuntimeError, OSError, ImportError):
            pass
    parse = _PARSERS[fmt]
    consumed = 0
    own_state = state or ParseState()
    for path in paths:
        st = ParseState(n_reads=own_state.n_reads)
        with _open_raw(path) as f:
            leftover = b""
            while True:
                chunk = f.read(CHUNK_BYTES)
                if not chunk:
                    break
                buf = leftover + chunk
                cut = buf.rfind(b"\n") + 1
                if cut == 0:
                    leftover = buf
                    continue
                leftover = buf[cut:]
                arr = np.frombuffer(buf, dtype=np.uint8, count=cut)
                yield parse(arr, st)
                consumed += cut
                own_state.consumed_bytes += cut
                if max_bytes is not None and consumed >= max_bytes:
                    break
            if leftover and (max_bytes is None or consumed < max_bytes):
                arr = np.frombuffer(leftover + b"\n", dtype=np.uint8)
                yield parse(arr, st)
        own_state.n_reads = st.n_reads
        # file boundary: emit one sentinel (protects k-mers from spanning files)
        yield np.full(1, CODE_INVALID, dtype=np.uint8)
        if max_bytes is not None and consumed >= max_bytes:
            break


def _native_code_stream(paths, fmt: str, state: ParseState | None,
                        max_bytes: int | None) -> Iterator[np.ndarray]:
    """Native-parser driver: resumable mid-line, so chunks need no newline
    alignment and no leftover copies."""
    from .native import NativeGzReader, NativeParser

    own_state = state or ParseState()
    consumed = 0
    buf = np.empty(CHUNK_BYTES, dtype=np.uint8)
    for path in paths:
        parser = NativeParser(fmt)
        p = Path(path)
        gz = p.suffix == ".gz"
        reader = NativeGzReader(path) if gz else open(p, "rb", buffering=0)
        try:
            ended_with_newline = True
            while True:
                if gz:
                    n = reader.read_into(buf)
                else:
                    n = reader.readinto(memoryview(buf))
                if not n:
                    break
                ended_with_newline = buf[n - 1] == 10
                yield parser.parse(buf[:n])
                consumed += n
                own_state.consumed_bytes += n
                if max_bytes is not None and consumed >= max_bytes:
                    break
            if not ended_with_newline and (max_bytes is None or consumed < max_bytes):
                yield parser.parse(np.frombuffer(b"\n", dtype=np.uint8))
        finally:
            reader.close()
        own_state.n_reads += parser.n_reads
        # file boundary sentinel (protects k-mers from spanning files)
        yield np.full(1, CODE_INVALID, dtype=np.uint8)
        if max_bytes is not None and consumed >= max_bytes:
            break


def homopolymer_compress_codes(codes: np.ndarray) -> np.ndarray:
    """Collapse runs of identical bases (reference splitter.cpp:424-435);
    runs of sentinels collapse too, which is harmless."""
    if len(codes) == 0:
        return codes
    keep = np.empty(len(codes), dtype=bool)
    keep[0] = True
    np.not_equal(codes[1:], codes[:-1], out=keep[1:])
    return codes[keep]


class BatchStream:
    """Assemble code chunks into fixed-shape device batches.

    Each batch is a uint8 array of length S + k + TAIL whose first S
    positions are candidate k-mer starts; consecutive batches advance the
    stream cursor by exactly S so every global position is evaluated once.
    """

    def __init__(self, s: int, k: int):
        from ..ops.extract import batch_len

        if s % 8:
            raise ValueError("batch_positions must be a multiple of 8")
        self.s = s
        self.k = k
        self.batch_bytes = batch_len(s, k)

    def batches(self, chunks: Iterator[np.ndarray]) -> Iterator[np.ndarray]:
        s, L = self.s, self.batch_bytes
        carry = np.zeros(0, dtype=np.uint8)
        parts = [carry]
        size = 0
        for chunk in chunks:
            parts.append(chunk)
            size += len(chunk)
            if size >= L:
                buf = np.concatenate(parts)
                pos = 0
                while pos + L <= len(buf):
                    yield buf[pos : pos + L]
                    pos += s
                parts = [buf[pos:]]
                size = len(parts[0])
        tail = np.concatenate(parts)
        while len(tail) > 0:
            if len(tail) < L:
                padded = np.full(L, CODE_INVALID, dtype=np.uint8)
                padded[: len(tail)] = tail
                yield padded
                break
            yield tail[:L]
            tail = tail[self.s :]
