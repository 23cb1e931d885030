"""Stage-1 device kernel: k-mer extraction, canonicalization, signatures.

TPU-first design (not a port of the reference splitter): the input is a flat
2-bit code stream where any value >= 4 (N bases, read separators, padding)
breaks k-mers.  Everything is computed with static-shape vector ops:

  * one shared "packed window" stream p[i]  = 16 bases starting at i,
    big-endian 2-bit packed (and q[i] = the reverse complement packing) —
    after which every k-mer word, every m-mer and every m-mer reverse
    complement is a *static slice* of p/q: zero gathers;
  * the allowed-signature rule and canonical m-mer norm
    (/root/reference/kmc_api/mmer.h:40-104) are evaluated as vector bit math
    instead of the reference's 4^m LUTs;
  * per-k-mer signature = sliding-window minimum of norms (log-step doubling),
    exactly the per-k-mer bin criterion of the reference splitter
    (/root/reference/kmc_core/splitter.cpp:557-677 — its super-k-mer cuts
    group k-mers by this same minimum);
  * batch deduplication = one lexicographic sort over (signature, k-mer
    words) + run-length compaction, replacing the reference's bin-part
    queues and temp files.

K-mer value convention: the 2k-bit big-endian integer (first base most
significant), held in W = ceil(k/16) uint32 lanes, most-significant lane
first, right-aligned (top bits of lane 0 are zero).  This sorts
lexicographically and maps 1:1 onto the on-disk suffix/prefix layout.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

INVALID_SIG = np.uint32(0xFFFFFFFF)
TAIL = 16  # extra codes needed past the last k-mer start for packing windows


def batch_len(s: int, k: int) -> int:
    """Total code-stream length fed to stage1_batch for S candidate starts
    (rounded up to a multiple of 8 so batches 2-bit-pack cleanly; s must be
    a multiple of 8)."""
    return s + ((k + TAIL + 7) // 8) * 8


def _pack_streams(c4: jax.Array, n: int):
    """p[i]: 16 bases at i, big-endian; q[i]: their reverse-complement packing
    (q[i] == revcomp(bases[i:i+16]) as a big-endian 2-bit integer)."""
    p = jnp.zeros((n,), jnp.uint32)
    q = jnp.zeros((n,), jnp.uint32)
    for j in range(16):
        cj = c4[j : j + n]
        p = p | (cj << (2 * (15 - j)))
        q = q | ((jnp.uint32(3) - cj) << (2 * j))
    return p, q


def _is_allowed(m: jax.Array, sig_len: int) -> jax.Array:
    """Vector version of CMmer::is_allowed (mmer.h:40-63)."""
    ok = ~(((m & 0x3F) == 0x3F) | ((m & 0x3F) == 0x3B) | ((m & 0x3C) == 0x3C))
    x = m
    for _ in range(sig_len - 3):
        ok = ok & ((x & 0xF) != 0)
        x = x >> 2
    ok = ok & (x != 0) & (x != 0x04) & ((x & 0xF) != 0)
    return ok


def _norms(p: jax.Array, q: jax.Array, sig_len: int, n: int) -> jax.Array:
    """Canonical norm of the m-mer at every position (mmer.h:81-91):
    min over strands of (value if allowed else 4^m)."""
    special = jnp.uint32(1 << (2 * sig_len))
    fwd = p[:n] >> (2 * (16 - sig_len))
    rev = q[:n] & jnp.uint32((1 << (2 * sig_len)) - 1)
    fv = jnp.where(_is_allowed(fwd, sig_len), fwd, special)
    rv = jnp.where(_is_allowed(rev, sig_len), rev, special)
    return jnp.minimum(fv, rv)


def _sliding_min(x: jax.Array, w: int, out_len: int) -> jax.Array:
    """out[i] = min(x[i:i+w]) for i in [0, out_len). len(x) >= out_len+w-1.

    Log-step doubling: after each round acc[j] = min(x[j:j+covered]), and the
    window is widened by min-ing acc with a shifted copy of *itself*."""
    acc = x
    n = x.shape[0]
    covered = 1
    while covered < w:
        step = min(covered, w - covered)
        acc = jnp.minimum(acc[: n - step], acc[step:])
        n -= step
        covered += step
    return acc[:out_len]


def _kmer_words(p, q, k: int, s: int, both_strands: bool):
    """Canonical k-mer at every start position as W uint32 lanes (MSW first).

    Word offsets are pure static slices of the packed streams:
      fwd lane 0   = p[i] >> 2*(16-r0)          (r0 = k - 16*(W-1) bases)
      fwd lane t>0 = p[i + r0 + 16*(t-1)]
      rc  lane 0   = q[i + k - r0] & mask(2*r0)
      rc  lane t>0 = q[i + k - r0 - 16*t]
    """
    W = (k + 15) // 16
    r0 = k - 16 * (W - 1)
    fwd = []
    rc = []
    w0 = p[0:s]
    if r0 < 16:
        w0 = w0 >> (2 * (16 - r0))
    fwd.append(w0)
    for t in range(1, W):
        off = r0 + 16 * (t - 1)
        fwd.append(p[off : off + s])
    if both_strands:
        m0 = jnp.uint32((1 << (2 * r0)) - 1) if r0 < 16 else jnp.uint32(0xFFFFFFFF)
        off0 = k - r0
        rc.append(q[off0 : off0 + s] & m0)
        for t in range(1, W):
            off = k - r0 - 16 * t
            rc.append(q[off : off + s])
        # lexicographic select of the smaller strand
        use_rc = jnp.zeros((s,), jnp.bool_)
        decided = jnp.zeros((s,), jnp.bool_)
        for t in range(W):
            use_rc = jnp.where(~decided & (rc[t] < fwd[t]), True, use_rc)
            decided = decided | (rc[t] != fwd[t])
        words = [jnp.where(use_rc, rc[t], fwd[t]) for t in range(W)]
    else:
        words = fwd
    return words


def _unpack_device(packed: jax.Array, mask: jax.Array):
    """Invert io/native.py::pack_codes on device with pure vector ops:
    packed u8[L/4], mask u8[L/8] (MSB-first) -> (c4 uint32[L], bad int32[L])."""
    p = packed.astype(jnp.uint32)
    c4 = jnp.stack(
        [(p >> 6) & 3, (p >> 4) & 3, (p >> 2) & 3, p & 3], axis=1
    ).reshape(-1)
    m = mask.astype(jnp.uint32)
    bits = jnp.stack([(m >> (7 - j)) & 1 for j in range(8)], axis=1).reshape(-1)
    bad = (1 - bits).astype(jnp.int32)
    return c4, bad


@functools.partial(jax.jit, static_argnames=("s", "k", "sig_len", "both_strands"))
def stage1_batch(codes: jax.Array, *, s: int, k: int, sig_len: int, both_strands: bool):
    """Process one code-stream batch.

    codes: uint8[batch_len(s, k)]; candidate k-mer starts are [0, s).
    Returns (sigs, words, counts, n_groups):
      sigs   uint32[s]  — signature per unique k-mer (INVALID_SIG marks the
                          trailing garbage group),
      words  uint32[s, W] — unique canonical k-mers (MSW-first lanes),
      counts uint32[s]  — occurrences of each unique k-mer in this batch,
      n_groups int32    — number of valid entries in the three arrays.
    """
    c = codes.astype(jnp.uint32)
    bad = (c >= 4).astype(jnp.int32)
    c4 = jnp.minimum(c, 3)
    return _stage1_core(c4, bad, s=s, k=k, sig_len=sig_len, both_strands=both_strands)


@functools.partial(jax.jit, static_argnames=("s", "k", "sig_len", "both_strands"))
def stage1_batch_packed(
    packed: jax.Array, mask: jax.Array, *, s: int, k: int, sig_len: int, both_strands: bool
):
    """stage1_batch on 2-bit-packed input (see io/native.py::pack_codes):
    the H2D-frugal fast path — 0.375 bytes/code instead of 1."""
    c4, bad = _unpack_device(packed, mask)
    return _stage1_core(c4, bad, s=s, k=k, sig_len=sig_len, both_strands=both_strands)


def position_sigs(c4, bad, *, s: int, k: int, sig_len: int):
    """Per-start-position (validity, signature): sig is INVALID_SIG where the
    k-mer window contains a non-base; also returns the packed streams so
    callers can reuse them (XLA CSEs the shared subgraphs within one jit)."""
    L = c4.shape[0]
    p, q = _pack_streams(c4, L - 15)
    cs = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(bad)])
    valid = (cs[k : k + s] - cs[0:s]) == 0
    n_norm = s + k - sig_len  # m-mer positions needed: [0, s + k - sig_len)
    norms = _norms(p, q, sig_len, n_norm)
    sig = _sliding_min(norms, k - sig_len + 1, s)
    sig = jnp.where(valid, sig, INVALID_SIG)
    return valid, sig, p, q


def _stage1_core(c4, bad, *, s: int, k: int, sig_len: int, both_strands: bool):
    valid, sig, p, q = position_sigs(c4, bad, s=s, k=k, sig_len=sig_len)

    words = _kmer_words(p, q, k, s, both_strands)
    words = [jnp.where(valid, w, jnp.uint32(0xFFFFFFFF)) for w in words]

    # sort by (signature, k-mer); equal k-mers always share a signature so
    # grouping by k-mer is preserved
    ones = jnp.ones((s,), jnp.uint32)
    sorted_ops = jax.lax.sort([sig, *words, ones], num_keys=1 + len(words))
    sig_s = sorted_ops[0]
    words_s = sorted_ops[1 : 1 + len(words)]

    # run-length compaction
    new = jnp.ones((s,), jnp.bool_)
    prev_diff = sig_s[1:] != sig_s[:-1]
    for w in words_s:
        prev_diff = prev_diff | (w[1:] != w[:-1])
    new = new.at[1:].set(prev_diff)
    starts = jnp.nonzero(new, size=s, fill_value=s)[0]
    ends = jnp.concatenate([starts[1:], jnp.full((1,), s, starts.dtype)])
    counts = (ends - starts).astype(jnp.uint32)
    n_groups = jnp.sum(new.astype(jnp.int32))

    gidx = jnp.minimum(starts, s - 1)
    u_sig = sig_s[gidx]
    u_words = jnp.stack([w[gidx] for w in words_s], axis=1)
    return u_sig, u_words, counts, n_groups


def _revcomp_mmer(m: jax.Array, sig_len: int) -> jax.Array:
    """Reverse complement of 2-bit packed m-mers (vector bit math,
    semantics of kmc_api/mmer.h:68-79)."""
    rev = jnp.zeros_like(m)
    x = m
    for _ in range(sig_len):
        rev = (rev << 2) | (jnp.uint32(3) - (x & 3))
        x = x >> 2
    return rev


def sig_of_word_cols(wr, *, k: int, sig_len: int):
    """Signature of each canonical k-mer row, recomputed from its lane
    COLUMNS (a sequence of W uint32 arrays, MSW-first right-aligned 2-bit
    lanes).  Equals the per-position signature the splitter computed (the
    set of canonical m-mer norms of a k-mer and of its reverse complement
    is identical, so the canonical representative gives the same minimum).
    Pure vector bit math — no table, no gather."""
    W = len(wr)
    X = wr[0].shape[0]
    mask_m = jnp.uint32((1 << (2 * sig_len)) - 1)
    special = jnp.uint32(1 << (2 * sig_len))
    best = jnp.full((X,), special, jnp.uint32)
    for j in range(k - sig_len + 1):
        shift = 2 * (k - sig_len - j)  # m-mer j = (kmer >> shift) & mask
        lane = W - 1 - (shift // 32)
        off = shift % 32
        v = wr[lane] >> off
        if off + 2 * sig_len > 32 and lane > 0:
            v = v | (wr[lane - 1] << (32 - off))
        f = v & mask_m
        r = _revcomp_mmer(f, sig_len)
        fv = jnp.where(_is_allowed(f, sig_len), f, special)
        rv = jnp.where(_is_allowed(r, sig_len), r, special)
        best = jnp.minimum(best, jnp.minimum(fv, rv))
    return best


def sig_of_words(words, *, k: int, sig_len: int):
    """sig_of_word_cols over a 2-D uint32[X, W] lane matrix."""
    W = words.shape[1]
    return sig_of_word_cols([words[:, t] for t in range(W)], k=k,
                            sig_len=sig_len)


@functools.partial(jax.jit, static_argnames=("s", "k", "sig_len", "map_len"))
def stage0_stats_batch(codes: jax.Array, *, s: int, k: int, sig_len: int, map_len: int):
    """Stage-0: histogram of per-k-mer signatures over a (sampled) batch
    (reference CalcStats, splitter.cpp:439-533: each k-mer contributes 1 to
    its signature's bin-balancing statistic)."""
    c = codes.astype(jnp.uint32)
    bad = (c >= 4).astype(jnp.int32)
    c4 = jnp.minimum(c, 3)
    return _stage0_core(c4, bad, s=s, k=k, sig_len=sig_len, map_len=map_len)


@functools.partial(jax.jit, static_argnames=("s", "k", "sig_len", "map_len"))
def stage0_stats_batch_packed(
    packed: jax.Array, mask: jax.Array, *, s: int, k: int, sig_len: int, map_len: int
):
    c4, bad = _unpack_device(packed, mask)
    return _stage0_core(c4, bad, s=s, k=k, sig_len=sig_len, map_len=map_len)


@functools.partial(
    jax.jit, static_argnames=("s", "k", "sig_len"), donate_argnums=(2,)
)
def stage0_stats_accum(
    packed: jax.Array, mask: jax.Array, hist: jax.Array, *, s: int, k: int,
    sig_len: int
):
    """Device-accumulated stage-0 histogram: one dispatch per batch, no
    host round-trip until the map is built (D2H sync per batch costs more
    than the kernel on the tunnel)."""
    c4, bad = _unpack_device(packed, mask)
    map_len = hist.shape[0]
    h = _stage0_core(c4, bad, s=s, k=k, sig_len=sig_len, map_len=map_len)
    return hist + h


def _stage0_core(c4, bad, *, s: int, k: int, sig_len: int, map_len: int):
    L = c4.shape[0]
    p, q = _pack_streams(c4, L - 15)
    cs = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(bad)])
    valid = (cs[k : k + s] - cs[0:s]) == 0
    norms = _norms(p, q, sig_len, s + k - sig_len)
    sig = _sliding_min(norms, k - sig_len + 1, s)
    sig = jnp.where(valid, sig, jnp.uint32(map_len))  # overflow slot dropped
    hist = jnp.zeros((map_len + 1,), jnp.uint32).at[sig].add(1)
    return hist[:map_len]
