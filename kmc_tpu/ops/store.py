"""HBM-resident k-mer store: the TPU replacement for KMC's temp-file bins.

The reference spills stage-1 super-k-mers to per-bin temp files and reads
them back for stage 2 (kb_storer.cpp, kb_reader.h).  On TPU the same role is
played by one large device-resident array set:

  ingest   one fused dispatch per 2-bit-packed input batch: unpack +
           signature scan + canonical k-mer lanes + signature->bin + append
           (donated buffers, a dynamic_update_slice — no host round-trip),
           plus the occurrence / super-k-mer accumulators;
  compact  when full, merge duplicate rows (sort+scan only);
  finalize group by (bin, k-mer), merge counts, and emit the exact on-disk
           record bytes + per-(bin, prefix) LUT on device (the reference's
           completer, kb_completer.cpp:59-223, moved into the kernel).

Row layout is LEAN: the bin id and the canonical k-mer lanes, nothing else
(8 bytes/row for k<=27 at 512 bins).  The bin rides the spare top bits of
k-mer lane 0 whenever 2*(k mod 16) + bin_bits <= 32; otherwise it is its own
uint32 column.  Counts are implicitly 1 until a compaction materializes a
counts column, so the hot-path sorts carry no count payload (the unit-count
fast path in _group_reduce).

Signature->bin mapping policy (set per store):
  * "prefix" (default): bin = top bits of the signature — computed with one
    shift, no table.  The reference's greedy balanced map (s_mapper.h:
    141-235) exists to even out DISK bin sizes for its per-bin sort stage;
    this store is flat in HBM and bins only determine output record order,
    so any signature-consistent map yields a valid, reference-readable KMC2
    database (the map is written into the .kmc_pre footer and every reader —
    ours and the reference CKMCFile — routes queries through it).  Dropping
    the table kills the per-batch 4^m-entry gather (~12 ns/row on v5e) and
    the stage-0 histogram pass entirely.
  * "greedy": the reference-faithful sampled-histogram greedy map
    (signatures.build_signature_map), applied with a per-batch gather.

Host transfers happen only at finalize (or on spill past the HBM budget).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .extract import (INVALID_SIG, _kmer_words, _unpack_device, batch_len,
                      position_sigs, sig_of_word_cols)

U32MAX = np.uint32(0xFFFFFFFF)


def _acc64_add(acc, inc_u32):
    """Add a uint32 increment into a 2-lane (lo, hi) uint32 accumulator."""
    lo = acc[0] + inc_u32
    hi = acc[1] + (lo < acc[0]).astype(jnp.uint32)
    return jnp.stack([lo, hi])


def prefix_bin_bits(k: int, sig_len: int, n_bins: int) -> tuple[int, bool]:
    """(prefix bits b, fused) for the "prefix" policy: bins are the top b
    bits of the signature plus one special bin (id 2^b, for k-mers whose
    whole window is disallowed m-mers — the reference routes those to a
    dedicated bin too, s_mapper.h:236-242).  b is capped so the bin id
    (b+1 bits, to cover the special bin) fits lane 0's spare top bits
    whenever possible."""
    W = (k + 15) // 16
    r0 = k - 16 * (W - 1)
    spare = 32 - 2 * r0
    b = min(max(n_bins, 2).bit_length() - 1, 2 * sig_len)
    if b + 1 <= spare:
        return b, True
    return b, False


def prefix_sig_map(sig_len: int, prefix_bits: int) -> np.ndarray:
    """The "prefix" policy's signature->bin map as an explicit array
    (int32[4^sig_len + 1], for the .kmc_pre footer / develop dumps)."""
    msize = (1 << (2 * sig_len)) + 1
    shift = 2 * sig_len - prefix_bits
    return (np.arange(msize, dtype=np.int64) >> shift).astype(np.int32)


def greedy_fuse(k: int, n_used_bins: int) -> bool:
    W = (k + 15) // 16
    r0 = k - 16 * (W - 1)
    return 2 * r0 + int(n_used_bins + 1).bit_length() <= 32


def greedy_defer_default() -> bool:
    """KMC_TPU_GREEDY_DEFER (default ON): greedy stores ingest under the
    prefix-policy layout and remap at finalize (see DeviceKmerStore)."""
    import os as _os

    return _os.environ.get("KMC_TPU_GREEDY_DEFER", "1") not in (
        "0", "false", "no")


def _sig_to_bin(sig_pos, valid, *, sig_len, map_mode, prefix_bits, sig_map,
                n_dead_bin):
    """Per-position bin id (uint32); invalid positions get n_dead_bin.
    The special signature 4^m shifts to exactly 2^prefix_bits — the special
    bin id — with no branch."""
    if map_mode == "prefix":
        bins = (sig_pos >> (2 * sig_len - prefix_bits)).astype(jnp.uint32)
    else:
        map_len = sig_map.shape[0]
        slot = jnp.minimum(sig_pos, jnp.uint32(map_len - 1)).astype(jnp.int32)
        bins = sig_map[slot].astype(jnp.uint32)
    return jnp.where(valid, bins, jnp.uint32(n_dead_bin))


def _key_cols_from(bins, words, valid, *, fuse, r0):
    """Store key columns from per-position bins + lanes.  Fused: bin rides
    lane 0's top bits; dead rows are all-ones in every column and sort after
    every live row (a live fused lane 0 has bin < 2^bin_bits - 1; a live
    unfused bin column is < 2^32 - 1)."""
    W = len(words)
    dead = ~valid
    if fuse:
        fused0 = jnp.where(dead, U32MAX, (bins << (2 * r0)) | words[0])
        return [fused0] + [
            jnp.where(dead, U32MAX, words[t]) for t in range(1, W)
        ]
    bincol = jnp.where(dead, U32MAX, bins)
    return [bincol] + [jnp.where(dead, U32MAX, words[t]) for t in range(W)]


_ING_STATICS = ("s", "k", "sig_len", "both_strands", "map_mode",
                "prefix_bits", "fuse", "n_dead_bin", "extract_mode")


def _ingest_core(packed, mask, key_cols, n_used, occ_acc, skm_acc, prev_sig,
                 sig_map, *, s, k, sig_len, both_strands, map_mode,
                 prefix_bits, fuse, n_dead_bin, extract_mode="xla"):
    c4, bad = _unpack_device(packed, mask)
    return _ingest_from_codes(c4, bad, key_cols, n_used, occ_acc, skm_acc,
                              prev_sig, sig_map, s=s, k=k, sig_len=sig_len,
                              both_strands=both_strands, map_mode=map_mode,
                              prefix_bits=prefix_bits, fuse=fuse,
                              n_dead_bin=n_dead_bin,
                              extract_mode=extract_mode)


def _pallas_extract_mode() -> str:
    """'auto' (kernel on the TPU backend when the batch aligns), 'off', or
    'interpret' (tests: run the kernel through the interpreter on CPU).
    Read at trace time — changing it after a (s, k)-variant has compiled
    requires a fresh variant."""
    import os as _os

    return _os.environ.get("KMC_TPU_PALLAS_EXTRACT", "auto")


def _use_pallas_extract(s: int, k: int) -> str | None:
    from .pallas_extract import pallas2d_align

    mode = _pallas_extract_mode()
    if mode in ("0", "off", "false"):
        return None
    if s % pallas2d_align(k):
        return None
    if mode == "interpret":
        return "interpret"
    if mode in ("auto", "1", "on", "true"):
        import jax as _jax

        # compiled on-chip validation covers the full k range via the
        # W-adaptive tile height (tools/validate_pallas_extract_tpu.py:
        # k=21/27/55 at 1024 rows, k=77/128/200/256 at 512 rows)
        if k > 256:
            return None
        return "compiled" if _jax.default_backend() == "tpu" else None
    return None


def _ingest_from_codes(c4, bad, key_cols, n_used, occ_acc, skm_acc, prev_sig,
                       sig_map, *, s, k, sig_len, both_strands, map_mode,
                       prefix_bits, fuse, n_dead_bin, extract_mode="xla"):
    if extract_mode in ("compiled", "interpret"):
        # fused Pallas splitter scan (2-D sublane layout — bit-exact vs the
        # XLA extract on TPU, tools/validate_pallas_extract_tpu.py; the 1-D variant's lane
        # shifts miscompile, see ops/pallas_extract.py)
        from .pallas_extract import extract_for_ingest

        valid, sig_pos, wl = extract_for_ingest(
            c4, bad, s=s, k=k, sig_len=sig_len, both_strands=both_strands,
            mode=extract_mode)
        return _ingest_binning(valid, sig_pos, wl, key_cols, n_used, occ_acc,
                               skm_acc, prev_sig, sig_map, s=s, k=k,
                               sig_len=sig_len, map_mode=map_mode,
                               prefix_bits=prefix_bits, fuse=fuse,
                               n_dead_bin=n_dead_bin)
    valid, sig_pos, p, q = position_sigs(c4, bad, s=s, k=k, sig_len=sig_len)
    wl = _kmer_words(p, q, k, s, both_strands)
    return _ingest_binning(valid, sig_pos, wl, key_cols, n_used, occ_acc,
                           skm_acc, prev_sig, sig_map, s=s, k=k,
                           sig_len=sig_len, map_mode=map_mode,
                           prefix_bits=prefix_bits, fuse=fuse,
                           n_dead_bin=n_dead_bin)


def _ingest_binning(valid, sig_pos, wl, key_cols, n_used, occ_acc, skm_acc,
                    prev_sig, sig_map, *, s, k, sig_len, map_mode,
                    prefix_bits, fuse, n_dead_bin):
    # exact super-k-mer count: a new super-k-mer starts at every valid
    # position whose signature differs from its predecessor's (the
    # reference's cut rule, splitter.cpp:557-677); prev_sig carries across
    # batches
    prev = jnp.concatenate([prev_sig, sig_pos[:-1]])
    new_skm = (sig_pos != INVALID_SIG) & (sig_pos != prev)
    skm_acc = _acc64_add(skm_acc, jnp.sum(new_skm.astype(jnp.uint32)))

    bins = _sig_to_bin(sig_pos, valid, sig_len=sig_len, map_mode=map_mode,
                       prefix_bits=prefix_bits, sig_map=sig_map,
                       n_dead_bin=n_dead_bin)
    W = (k + 15) // 16
    r0 = k - 16 * (W - 1)
    cols = _key_cols_from(bins, wl, valid, fuse=fuse, r0=r0)

    occ_acc = _acc64_add(occ_acc, jnp.sum(valid.astype(jnp.uint32)))
    out_cols = tuple(
        jax.lax.dynamic_update_slice(sc, c, (n_used,))
        for sc, c in zip(key_cols, cols)
    )
    return out_cols, n_used + s, occ_acc, skm_acc, sig_pos[-1:]


@functools.partial(jax.jit, static_argnames=_ING_STATICS,
                   donate_argnums=(2, 4, 5))
def _ingest_prefix(packed, mask, key_cols, n_used, occ_acc, skm_acc, prev_sig,
                   **statics):
    """Fused stage-1 + append, "prefix" policy: one device dispatch per
    input batch (per-dispatch latency dominates at small batch sizes, so the
    extract kernel and the store update must ride one executable)."""
    return _ingest_core(packed, mask, tuple(key_cols), n_used, occ_acc,
                        skm_acc, prev_sig, None, **statics)


@functools.partial(jax.jit, static_argnames=_ING_STATICS,
                   donate_argnums=(2, 4, 5))
def _ingest_greedy(packed, mask, key_cols, n_used, occ_acc, skm_acc, prev_sig,
                   sig_map, **statics):
    return _ingest_core(packed, mask, tuple(key_cols), n_used, occ_acc,
                        skm_acc, prev_sig, sig_map, **statics)


def _split_fused(buf, s, k):
    L = batch_len(s, k)
    return buf[: L // 4], buf[L // 4 :]


def _unpack_boundaries(buf, tail_start, *, s, k):
    """Decode the boundary-delta feed format (io/native.py::
    pack_codes_boundaries): 2-bit packed codes ++ LE u16 sentinel-position
    deltas.  bad[i] = 1 iff i is a listed sentinel or batch-padding
    (i >= tail_start).  The scatter touches only the ~L/64 boundary slots —
    negligible next to an L-sized mask transfer."""
    L = batch_len(s, k)
    p = buf[: L // 4].astype(jnp.uint32)
    c4 = jnp.stack(
        [(p >> 6) & 3, (p >> 4) & 3, (p >> 2) & 3, p & 3], axis=1
    ).reshape(-1)
    d8 = buf[L // 4 :].astype(jnp.uint32).reshape(-1, 2)
    deltas = d8[:, 0] | (d8[:, 1] << 8)  # little-endian u16
    pos = jnp.cumsum(deltas, dtype=jnp.int32) - 1  # padding repeats the last
    bad = jnp.zeros((L + 1,), jnp.int32).at[
        jnp.where(pos >= 0, pos, jnp.int32(L))
    ].set(1)[:L]
    idx = jnp.arange(L, dtype=jnp.int32)
    bad = bad | (idx >= tail_start).astype(jnp.int32)
    return c4, bad


@functools.partial(jax.jit, static_argnames=_ING_STATICS,
                   donate_argnums=(1, 3, 4))
def _ingest_prefix_fused(buf, key_cols, n_used, occ_acc, skm_acc, prev_sig,
                         **statics):
    """One-buffer variant: buf = packed codes ++ validity mask (a single
    H2D transfer; split is a free static slice on device)."""
    packed, mask = _split_fused(buf, statics["s"], statics["k"])
    return _ingest_core(packed, mask, tuple(key_cols), n_used, occ_acc,
                        skm_acc, prev_sig, None, **statics)


@functools.partial(jax.jit, static_argnames=_ING_STATICS,
                   donate_argnums=(1, 3, 4))
def _ingest_greedy_fused(buf, key_cols, n_used, occ_acc, skm_acc, prev_sig,
                         sig_map, **statics):
    packed, mask = _split_fused(buf, statics["s"], statics["k"])
    return _ingest_core(packed, mask, tuple(key_cols), n_used, occ_acc,
                        skm_acc, prev_sig, sig_map, **statics)


@functools.partial(jax.jit, static_argnames=_ING_STATICS,
                   donate_argnums=(2, 4, 5))
def _ingest_prefix_bounds(buf, tail_start, key_cols, n_used, occ_acc,
                          skm_acc, prev_sig, **statics):
    """Boundary-delta variant (25% fewer H2D bytes than packed+mask)."""
    c4, bad = _unpack_boundaries(buf, tail_start,
                                 s=statics["s"], k=statics["k"])
    return _ingest_from_codes(c4, bad, tuple(key_cols), n_used, occ_acc,
                              skm_acc, prev_sig, None, **statics)


@functools.partial(jax.jit, static_argnames=_ING_STATICS,
                   donate_argnums=(2, 4, 5))
def _ingest_greedy_bounds(buf, tail_start, key_cols, n_used, occ_acc,
                          skm_acc, prev_sig, sig_map, **statics):
    c4, bad = _unpack_boundaries(buf, tail_start,
                                 s=statics["s"], k=statics["k"])
    return _ingest_from_codes(c4, bad, tuple(key_cols), n_used, occ_acc,
                              skm_acc, prev_sig, sig_map, **statics)


# -- stage-0 histogram accumulation on the ingest feed formats: with the
# deferred greedy remap the signature map is not needed until finalize, so
# the sampled per-signature histogram (reference CalcStats,
# splitter.cpp:439-533) rides the SAME device buffers the ingest consumes —
# no separate stage-0 parse pass over the input. --

@functools.partial(jax.jit, static_argnames=("s", "k", "sig_len"),
                   donate_argnums=(1,))
def _stage0_accum_fused(buf, hist, *, s, k, sig_len):
    from .extract import _stage0_core

    packed, mask = _split_fused(buf, s, k)
    c4, bad = _unpack_device(packed, mask)
    return hist + _stage0_core(c4, bad, s=s, k=k, sig_len=sig_len,
                               map_len=hist.shape[0])


@functools.partial(jax.jit, static_argnames=("s", "k", "sig_len"),
                   donate_argnums=(2,))
def _stage0_accum_bounds(buf, tail_start, hist, *, s, k, sig_len):
    from .extract import _stage0_core

    c4, bad = _unpack_boundaries(buf, tail_start, s=s, k=k)
    return hist + _stage0_core(c4, bad, s=s, k=k, sig_len=sig_len,
                               map_len=hist.shape[0])


@functools.partial(jax.jit, donate_argnums=(0, 1, 5))
def _append(key_cols, store_counts, n_used, in_cols, counts, occ_acc):
    """External append (checkpoint resume / spill replay); counts column
    must already exist.  Rows with count 0 are written dead."""
    if len(in_cols) != len(key_cols):
        raise ValueError(
            f"appending {len(in_cols)} key columns into a "
            f"{len(key_cols)}-column store (k/n_bins/fuse mismatch?)")
    dead = counts == 0
    out_cols = tuple(
        jax.lax.dynamic_update_slice(sc, jnp.where(dead, U32MAX, c), (n_used,))
        for sc, c in zip(key_cols, in_cols)
    )
    store_counts = jax.lax.dynamic_update_slice(store_counts, counts, (n_used,))
    occ_acc = _acc64_add(occ_acc, jnp.sum(counts, dtype=jnp.uint32))
    return out_cols, store_counts, n_used + counts.shape[0], occ_acc


def _group_reduce(key_cols, payload_cols, counts=None, n_live=None,
                  wide=False):
    """Sort rows by key_cols, merge equal-key runs, compact group
    representatives to the front — using ONLY sorts and scans (scatter /
    gather / nonzero cost seconds at 10^8 rows; two extra sort passes cost
    ~0.5s).

    The trick: after the grouping sort, each group's total is the difference
    of the running count prefix-sum (B) at consecutive group starts, and a
    second sort keyed on (is-group-start bit | B) pulls the group
    representatives to the front in order — B is strictly increasing across
    starts of nonempty groups, so no stability is needed.

    counts: per-row weights; pass counts=None with n_live=<traced scalar>
    when every live row weighs 1 and live rows sort to a prefix (unit-count
    fast path: the prefix-sum is just min(i+1, n_live) and the sort carries
    one less column).

    Returns (sorted_key_cols_of_reps, sorted_payload_cols_of_reps, totals,
    n_groups); all X-sized, rows [0, n_groups) are the groups in key order,
    the rest is garbage.

    By default counts must sum below 2^31 per call (the flag bit rides bit
    31 of the prefix sum).  wide=True lifts that cap: the compaction sort is
    keyed on (flag | row-index) instead — always < 2^31 since X < 2^31 —
    and the prefix-sum rides as one extra payload column.  Group totals stay
    exact for any occurrence count: they are differences of consecutive
    group-start prefix-sums, which wrap identically mod 2^32 (each single
    group must stay below 2^32; the 64-bit occurrence accumulators track the
    true grand totals).
    """
    X = key_cols[0].shape[0]
    n_keys = len(key_cols)
    idx = jnp.arange(X, dtype=jnp.int32)
    if counts is None:
        ops = jax.lax.sort(list(key_cols) + list(payload_cols), num_keys=n_keys)
        keys_s = ops[:n_keys]
        pays_s = ops[n_keys:]
        # live rows (weight 1) occupy the sorted prefix of length n_live
        cs = jnp.minimum(idx + 1, n_live).astype(jnp.uint32)
    else:
        ops = jax.lax.sort(
            list(key_cols) + list(payload_cols) + [counts], num_keys=n_keys
        )
        keys_s = ops[:n_keys]
        pays_s = ops[n_keys:-1]
        cs = jnp.cumsum(ops[-1], dtype=jnp.uint32)

    new = jnp.ones((X,), jnp.bool_)
    diff = jnp.zeros((X - 1,), jnp.bool_)
    for c in keys_s:
        diff = diff | (c[1:] != c[:-1])
    new = new.at[1:].set(diff)
    before = jnp.concatenate([jnp.zeros((1,), jnp.uint32), cs[:-1]])

    if wide:
        # group-start flag rides bit 31 of the row index; B is payload
        key2 = jnp.where(new, idx.astype(jnp.uint32),
                         idx.astype(jnp.uint32) | jnp.uint32(0x80000000))
        ops2 = jax.lax.sort([key2, before, *keys_s, *pays_s], num_keys=1)
        b2 = ops2[1]
        keys_r = ops2[2 : 2 + n_keys]
        pays_r = ops2[2 + n_keys :]
    else:
        # single sort key: the flag rides bit 31 of the prefix-sum itself
        key2 = jnp.where(new, before, before | jnp.uint32(0x80000000))
        ops2 = jax.lax.sort([key2, *keys_s, *pays_s], num_keys=1)
        b2 = ops2[0] & jnp.uint32(0x7FFFFFFF)
        keys_r = ops2[1 : 1 + n_keys]
        pays_r = ops2[1 + n_keys :]
    total_all = cs[-1]
    b_next = jnp.concatenate([b2[1:], total_all[None]])
    n_groups = jnp.sum(new.astype(jnp.int32))
    in_range = idx < n_groups
    # the row after the last group carries garbage B; patch with grand total
    b_next = jnp.where(idx == n_groups - 1, total_all, b_next)
    totals = jnp.where(in_range, b_next - b2, 0)
    return keys_r, pays_r, totals, n_groups


def _live_mask(key_cols, store_counts, n_used):
    """Row liveness: all-ones key column 0 marks dead rows (fused lane 0 or
    the bin column — live values are always strictly smaller); additionally
    counts>0 when the counts column exists."""
    X = key_cols[0].shape[0]
    idx = jnp.arange(X, dtype=jnp.int32)
    live = (idx < n_used) & (key_cols[0] != U32MAX)
    if store_counts is not None:
        live = live & (store_counts > 0)
    return live


def _compact_core(key_cols, store_counts, n_used, wide=False):
    """Merge duplicate k-mers.  The key columns already group by (bin,
    k-mer) — the bin is a function of the k-mer so groups are exact — and
    dead rows (all-ones) sort to the suffix, enabling the unit-count fast
    path."""
    X = key_cols[0].shape[0]
    idx = jnp.arange(X, dtype=jnp.int32)
    live = _live_mask(key_cols, store_counts, n_used)
    cols = [jnp.where(live, c, U32MAX) for c in key_cols]
    if store_counts is None:
        n_live = jnp.sum(live.astype(jnp.int32))
        keys_r, _, totals, n_groups = _group_reduce(cols, [], None, n_live)
    else:
        counts = jnp.where(live, store_counts, 0)
        keys_r, _, totals, n_groups = _group_reduce(cols, [], counts,
                                                    wide=wide)
    group_valid = (idx < n_groups) & (totals > 0)
    out_cols = tuple(jnp.where(group_valid, c, U32MAX) for c in keys_r)
    out_counts = jnp.where(group_valid, totals, 0).astype(jnp.uint32)
    return out_cols, out_counts, n_groups


@functools.partial(jax.jit, donate_argnums=(0,))
def _compact_unit(key_cols, n_used):
    return _compact_core(tuple(key_cols), None, n_used)


@functools.partial(jax.jit, static_argnames=("wide",), donate_argnums=(0, 1))
def _compact_counted(key_cols, store_counts, n_used, wide=False):
    return _compact_core(tuple(key_cols), store_counts, n_used, wide=wide)


@functools.partial(jax.jit, donate_argnums=(0,))
def _stitch_unit(full_cols, part_cols, part_counts):
    """Write an eff-width compaction result back over the full-width store
    (rows beyond the part are dead by the n_used liveness bound)."""
    X = full_cols[0].shape[0]
    out_cols = tuple(jax.lax.dynamic_update_slice(f, p, (0,))
                     for f, p in zip(full_cols, part_cols))
    counts = jax.lax.dynamic_update_slice(
        jnp.zeros((X,), jnp.uint32), part_counts, (0,))
    return out_cols, counts


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _stitch_counted(full_cols, full_counts, part_cols, part_counts):
    out_cols = tuple(jax.lax.dynamic_update_slice(f, p, (0,))
                     for f, p in zip(full_cols, part_cols))
    counts = jax.lax.dynamic_update_slice(full_counts, part_counts, (0,))
    return out_cols, counts


def _split_bins(keys_r, *, fuse, r0):
    """(bins, kmer lanes) from reduced key columns."""
    if fuse:
        bins_r = keys_r[0] >> (2 * r0)
        wr = [keys_r[0] & jnp.uint32((1 << (2 * r0)) - 1)] + list(keys_r[1:])
    else:
        bins_r = keys_r[0]
        wr = list(keys_r[1:])
    return bins_r, wr


# -- deferred greedy remap: rows ingested under the prefix-policy layout are
# rewritten to their greedy bins at finalize (see __init__ docstring).  The
# signature is recomputed from the stored lanes with pure bit math
# (extract.sig_of_word_cols); only the 4^m map lookup is a gather, and it
# runs at OUTPUT scale in the tiled path instead of per ingested position. --

def _greedy_remap_cols(key_cols, sig_map, *, k, sig_len, ing_fuse, g_fuse,
                       n_ing_bins):
    """Elementwise key rewrite: prefix-layout columns -> greedy-layout
    columns.  Rows whose ingest bin is out of range (dead all-ones rows)
    stay all-ones in every output column."""
    W = (k + 15) // 16
    r0 = k - 16 * (W - 1)
    bins_i, wr = _split_bins(list(key_cols), fuse=ing_fuse, r0=r0)
    valid = bins_i < jnp.uint32(n_ing_bins)
    sig = sig_of_word_cols(wr, k=k, sig_len=sig_len)
    L = sig_map.shape[0]
    slot = jnp.minimum(sig, jnp.uint32(L - 1)).astype(jnp.int32)
    gbin = sig_map[slot].astype(jnp.uint32)
    return _key_cols_from(gbin, wr, valid, fuse=g_fuse, r0=r0)


_G_REMAP_STATICS = ("k", "sig_len", "ing_fuse", "g_fuse", "n_ing_bins")


@functools.partial(jax.jit, static_argnames=_G_REMAP_STATICS,
                   donate_argnums=(0,))
def _greedy_remap_store(key_cols, sig_map, **st):
    """Capacity-scale remap (the non-tiled fallback): counts columns stay
    aligned because the rewrite is row-positional."""
    return tuple(_greedy_remap_cols(tuple(key_cols), sig_map, **st))


@functools.partial(
    jax.jit,
    static_argnames=("out", "has_counts") + _G_REMAP_STATICS,
    donate_argnums=(0, 1, 2),
)
def _greedy_collect(keys_s, before, src_t, offs, n_groups, n_live, sig_map,
                    *, out, has_counts, **st):
    """Tiled-path collect: gather the compacted unique rows (OUTPUT scale),
    remap them to greedy bins, and sort by the greedy key.  Returns
    (greedy key columns, totals) sorted in final record order; rows at
    index >= n_groups (and the dead all-ones group, if present) sort last
    with all-ones keys."""
    keys_r, totals = _tiled_gather_groups(
        tuple(keys_s), before, src_t, offs, n_groups, n_live,
        out=out, has_counts=has_counts)
    idx = jnp.arange(out, dtype=jnp.int32)
    in_range = idx < n_groups
    keys_r = [jnp.where(in_range, c, U32MAX) for c in keys_r]
    g_cols = _greedy_remap_cols(keys_r, sig_map, **st)
    tot = jnp.where(in_range, totals, 0).astype(jnp.uint32)
    ncols = len(g_cols)
    ops = jax.lax.sort(list(g_cols) + [tot], num_keys=ncols)
    return tuple(ops[:ncols]), ops[ncols]


_G_EMIT_STATICS = ("cutoff_min", "cutoff_max", "counter_max", "k",
                   "lut_prefix_len", "counter_size", "n_bins", "fuse")


@functools.partial(jax.jit, static_argnames=("chunk",) + _G_EMIT_STATICS)
def _greedy_emit_chunk(g_cols, g_tot, n_groups, start, *, chunk, **kw):
    """Chunked completer over the collected greedy-sorted rows (the
    deferred-greedy analogue of _tiled_finalize_b_chunk; same traced-start
    single-executable pipelined-D2H contract)."""
    sl = [jax.lax.dynamic_slice(c, (start,), (chunk,)) for c in g_cols]
    tot = jax.lax.dynamic_slice(g_tot, (start,), (chunk,))
    return _finalize_groups_core(sl, tot, n_groups, start=start, **kw)


@functools.partial(jax.jit, static_argnames=_G_EMIT_STATICS,
                   donate_argnums=(0, 1))
def _greedy_emit_full(g_cols, g_tot, n_groups, **kw):
    return _finalize_groups_core(list(g_cols), g_tot, n_groups, **kw)


def _finalize_core(
    key_cols,
    store_counts,
    n_used,
    *,
    cutoff_min: int,
    cutoff_max: int,
    counter_max: int,
    k: int,
    lut_prefix_len: int,
    counter_size: int,
    n_bins: int,
    fuse: bool,
    wide: bool = False,
):
    """Device completer (reference CKmerBinCompleter, kb_completer.cpp:
    59-223): group by (bin, k-mer), merge, and emit the exact on-disk
    suffix+counter record bytes and the per-(bin, prefix) LUT histogram —
    the host only writes buffers.

    Returns (cols: list of big-endian u32 record-byte columns, keep_bits
    u32 words, lut u32[lut_size], n_groups, stats)."""
    X = key_cols[0].shape[0]
    W = (k + 15) // 16
    r0 = k - 16 * (W - 1)
    idx = jnp.arange(X, dtype=jnp.int32)
    live = _live_mask(key_cols, store_counts, n_used)
    cols_in = [jnp.where(live, c, U32MAX) for c in key_cols]

    if store_counts is None:
        n_live = jnp.sum(live.astype(jnp.int32))
        keys_r, _, totals, n_groups = _group_reduce(cols_in, [], None, n_live)
    else:
        counts = jnp.where(live, store_counts, 0)
        keys_r, _, totals, n_groups = _group_reduce(cols_in, [], counts,
                                                    wide=wide)
    bins_r, wr = _split_bins(keys_r, fuse=fuse, r0=r0)
    group_valid = (idx < n_groups) & (totals > 0) & (bins_r < jnp.uint32(n_bins))
    n_unique = jnp.sum(group_valid.astype(jnp.int32))
    below = group_valid & (totals < cutoff_min)
    above = group_valid & (totals > cutoff_max)
    n_below = jnp.sum(below.astype(jnp.int32))
    n_above = jnp.sum(above.astype(jnp.int32))
    keep = group_valid & ~below & ~above

    # --- record bytes, packed 4-per-u32, one 1-D column per u32 ------------
    # (an (X, record_bytes) u8 array would be tile-padded 128/record_bytes x
    # in HBM — 16 GB at X=2^28! — and per-byte u8 columns pay 1 transfer
    # setup each; big-endian u32 columns keep everything 1-D and quarter the
    # transfer count; the host views them as bytes)
    kb = (k + 3) // 4
    suffix_bytes = (k - lut_prefix_len) // 4 if lut_prefix_len else kb
    record_bytes = suffix_bytes + counter_size
    cnt = jnp.minimum(totals, counter_max)

    def rec_byte(j):
        if j < suffix_bytes:
            t = suffix_bytes - 1 - j  # byte index from the right of the k-mer
            lane = W - 1 - (t // 4)
            sh = 8 * (t % 4)
            return (wr[lane] >> sh) & 0xFF
        return (cnt >> (8 * (j - suffix_bytes))) & 0xFF  # LE counter byte

    # tight packing: u32 columns plus a u16/u8 tail column so D2H moves
    # exactly record_bytes per row (no pad bytes)
    cols = []
    c0 = 0
    while c0 < record_bytes:
        rem = record_bytes - c0
        w, dt = ((4, jnp.uint32) if rem >= 4 else
                 (2, jnp.uint16) if rem >= 2 else (1, jnp.uint8))
        col = jnp.zeros((X,), jnp.uint32)
        for j in range(c0, c0 + w):
            col = col | (rec_byte(j) << (8 * (w - 1 - (j - c0))))
        cols.append(col.astype(dt))
        c0 += w

    # --- keep bitmap: u32 words, MSB-first (big-endian byte view is
    # np.unpackbits-compatible).  Packed via reshape + weighted row reduce:
    # the obvious strided 1-D pack (keep[j::8] << ...) costs 5.8s at 260M
    # rows on v5e (strided slices lower to gathers); this is 0.05s.
    keep_w = keep.astype(jnp.uint32).reshape(X // 32, 32)
    wts = jnp.uint32(1) << (31 - jnp.arange(32, dtype=jnp.uint32))
    keep_bits = (keep_w * wts[None, :]).sum(axis=1).astype(jnp.uint32)

    # --- per-(bin, prefix) LUT histogram ----------------------------------
    if lut_prefix_len:
        # prefix = top 2*lpl bits of the k-mer; they always lie within the
        # first two lanes (lpl <= 15 => <= 30 bits; lane0 holds r0 <= 16
        # bases, lane1 the next 16)
        if lut_prefix_len <= r0:
            prefix = wr[0] >> (2 * (r0 - lut_prefix_len))
        else:
            need = lut_prefix_len - r0  # bases from lane 1
            prefix = (wr[0] << (2 * need)) | (wr[1] >> (2 * (16 - need)))
        prefix = prefix & jnp.uint32((1 << (2 * lut_prefix_len)) - 1)
    else:
        prefix = jnp.zeros((X,), jnp.uint32)
    lut_size = n_bins << (2 * lut_prefix_len)
    # rows are sorted by (bin, k-mer), so (bin, prefix) keys are monotone
    # over the group region; invalid/garbage rows form a suffix.  LUT counts
    # are then differences of the kept-row prefix-sum at key boundaries — a
    # searchsorted of lut_size probes instead of an X-sized scatter-add
    # (scatter at 10^8 rows costs seconds on v5e; this is ~ms).
    key_mono = jnp.where(
        (idx < n_groups) & (bins_r < jnp.uint32(n_bins)),
        (bins_r << (2 * lut_prefix_len)) | prefix,
        jnp.uint32(lut_size),
    )
    kept_excl = jnp.concatenate(
        [jnp.zeros((1,), jnp.uint32), jnp.cumsum(keep.astype(jnp.uint32))]
    )
    bounds = jnp.searchsorted(key_mono, jnp.arange(lut_size + 1, dtype=jnp.uint32))
    lut = kept_excl[bounds[1:]] - kept_excl[bounds[:-1]]

    return cols, keep_bits, lut, n_groups, (n_unique, n_below, n_above)


_TILE_T = 128  # compaction tile width (1 VMEM lane row; no minor-dim pad)


def _grouping_sort_mode() -> str:
    """KMC_TPU_BITONIC_SORT selects the phase-A grouping sort:
    "0" (default) = jax.lax.sort; "1" = the blocked Pallas bitonic
    (ops/pallas_sort.py — EXPERIMENTAL: interpret-validated, pending the
    on-chip A/B in tools/microbench_bitonic.py); "interpret" = the same
    bitonic under Pallas interpret mode (CPU identity tests)."""
    import os as _os

    v = _os.environ.get("KMC_TPU_BITONIC_SORT", "0")
    return {"1": "bitonic", "interpret": "interpret"}.get(v, "lax")


def _grouping_sort(cols, n_keys, mode):
    """The phase-A grouping sort over full store columns.

    For the bitonic path the array is padded to a power of two with
    sentinel rows (all-U32MAX keys, zero counts) and sliced back after.
    That is value-identical to sorting unpadded: dead rows already carry
    all-U32MAX keys and zero counts (live fused keys are strictly smaller
    — the bin field never reaches its maximum), and every downstream
    consumer reads group totals as prefix-sum differences at group
    STARTS, which are invariant to payload order within a key group (so
    lax.sort's stability is not load-bearing either)."""
    if mode != "lax":
        from .pallas_sort import BLOCK_R, LANES, pallas_bitonic_sort

        X = cols[0].shape[0]
        P = max(LANES * 2 * BLOCK_R, 1 << (X - 1).bit_length())
        # fall back when padding would exceed 2x (tiny stores) or the
        # fused VMEM ladder would blow the 16 MiB scoped-VMEM budget
        if P <= 2 * X and len(cols) <= 6:
            if P != X:
                cols = [
                    jnp.concatenate([
                        c,
                        jnp.full((P - X,),
                                 U32MAX if i < n_keys else jnp.uint32(0),
                                 jnp.uint32),
                    ])
                    for i, c in enumerate(cols)
                ]
            out = pallas_bitonic_sort(cols, n_keys=n_keys,
                                      interpret=(mode == "interpret"))
            return [c[:X] for c in out]
    return jax.lax.sort(list(cols), num_keys=n_keys)


@functools.partial(jax.jit, static_argnames=("has_counts", "sort_mode"),
                   donate_argnums=(0,))
def _tiled_reduce_a(key_cols, store_counts, n_used, *, has_counts,
                    sort_mode="lax"):
    """Phase A of the tiled group-reduce: the big grouping sort + per-tile
    compaction bookkeeping.  Replaces the second full-width sort of
    _group_reduce (the compaction sort, ~55%% of finalize exec) with a
    TILE-minor-axis sort: a bitonic network over 128 lanes is log2(128)^2/2
    = 24 stages vs ~400 for the full array, and the final gather runs at
    the (much smaller) OUTPUT size in phase B.

    Returns (keys_sorted tuple, before u32[X128+1] or None, src_tiled
    u32[X128], offs i32[nb], n_groups, n_live) — all shapes static."""
    T = _TILE_T
    X = key_cols[0].shape[0]
    X128 = ((X + T - 1) // T) * T
    W = len(key_cols)
    live = _live_mask(key_cols, store_counts if has_counts else None, n_used)
    cols_in = [jnp.where(live, c, U32MAX) for c in key_cols]
    if X128 != X:
        pad = jnp.full((X128 - X,), U32MAX, jnp.uint32)
        cols_in = [jnp.concatenate([c, pad]) for c in cols_in]
    if has_counts:
        counts = jnp.where(live, store_counts, 0)
        if X128 != X:
            counts = jnp.concatenate(
                [counts, jnp.zeros((X128 - X,), jnp.uint32)])
        ops = _grouping_sort(cols_in + [counts], W, sort_mode)
        keys_s = tuple(ops[:W])
        counts_s = ops[W]
        # exclusive prefix with the grand total appended: group totals are
        # differences at group starts (exact mod 2^32 per group, so no
        # wide mode is ever needed on this path)
        cs = jnp.cumsum(counts_s, dtype=jnp.uint32)
        before = jnp.concatenate([jnp.zeros((1,), jnp.uint32), cs])
        n_live = jnp.sum(live.astype(jnp.int32))
    else:
        keys_s = tuple(_grouping_sort(cols_in, W, sort_mode))
        before = None
        n_live = jnp.sum(live.astype(jnp.int32))

    new = jnp.ones((X128,), jnp.bool_)
    diff = jnp.zeros((X128 - 1,), jnp.bool_)
    for c in keys_s:
        diff = diff | (c[1:] != c[:-1])
    new = new.at[1:].set(diff)

    nb = X128 // T
    lane = jnp.arange(T, dtype=jnp.uint32)
    tile_key = jnp.where(new.reshape(nb, T), lane[None, :],
                         lane[None, :] + jnp.uint32(T))
    src = jnp.arange(X128, dtype=jnp.uint32).reshape(nb, T)
    _, src_t = jax.lax.sort([tile_key, src], dimension=1, num_keys=1)
    cnt = jnp.sum(new.reshape(nb, T).astype(jnp.int32), axis=1)
    offs = jnp.cumsum(cnt) - cnt  # exclusive start per tile
    n_groups = offs[-1] + cnt[-1]
    return keys_s, before, src_t.reshape(X128), offs, n_groups, n_live


def _tiled_gather_groups(keys_s, before, src_t, offs, n_groups, n_live, *,
                         out, has_counts, start=None):
    """Phase-B front half: gather the group representatives (OUT-sized) and
    their totals from the phase-A artifacts.  With `start` (a traced i32
    scalar) the gather covers output rows [start, start+out) — the chunked
    pipelined-D2H path; start=None is the classic full-output call."""
    T = _TILE_T
    X128 = src_t.shape[0]
    s0 = jnp.int32(0) if start is None else start.astype(jnp.int32)
    # out+1 rows: the extra probe row yields src_next for the chunk's last
    # row without peeking into the next chunk
    r1 = s0 + jnp.arange(out + 1, dtype=jnp.int32)
    # tile index per output row: searchsorted(offs, r, 'right')-1, but for
    # CONSECUTIVE needles that's a scatter+cumsum (jnp.searchsorted costs
    # ~1.3 s at this scale — a 20-round gather loop; this is ~40 ms).
    # Tiles starting at or before `start` clip to slot 0 and are counted
    # for every row of the chunk, preserving t(r) = #{offs <= r} - 1.
    marks = jnp.zeros((out + 2,), jnp.int32).at[
        jnp.clip(offs - s0, 0, out + 1)].add(1)
    t = jnp.cumsum(marks[:out + 1]) - 1
    t = jnp.clip(t, 0, offs.shape[0] - 1)
    within = jnp.clip(r1 - offs[t], 0, T - 1)
    src1 = src_t[t * T + within].astype(jnp.int32)
    r = r1[:out]
    src = src1[:out]
    valid_r = r < n_groups
    keys_r = [k[src] for k in keys_s]
    src_next = jnp.where(r1[1:] < n_groups, src1[1:], X128)
    if has_counts:
        totals = before[jnp.minimum(src_next, X128)] - before[src]
    else:
        b = jnp.minimum(src, n_live).astype(jnp.uint32)
        b_next = jnp.minimum(src_next, n_live).astype(jnp.uint32)
        totals = b_next - b
    totals = jnp.where(valid_r, totals, 0)
    return keys_r, totals


def _finalize_groups_core(keys_r, totals, n_groups, *, cutoff_min,
                          cutoff_max, counter_max, k, lut_prefix_len,
                          counter_size, n_bins, fuse, start=None):
    """The completer back half of _finalize_core, over already-compacted
    group arrays of any (static) length.  With `start` (traced i32) the
    rows are global output rows [start, start+out): stats and the LUT are
    chunk-local (callers sum them across chunks)."""
    out = keys_r[0].shape[0]
    W = (k + 15) // 16
    r0 = k - 16 * (W - 1)
    idx = jnp.arange(out, dtype=jnp.int32)
    if start is not None:
        idx = start.astype(jnp.int32) + idx
    bins_r, wr = _split_bins(keys_r, fuse=fuse, r0=r0)
    group_valid = (idx < n_groups) & (totals > 0) & (bins_r < jnp.uint32(n_bins))
    n_unique = jnp.sum(group_valid.astype(jnp.int32))
    below = group_valid & (totals < cutoff_min)
    above = group_valid & (totals > cutoff_max)
    n_below = jnp.sum(below.astype(jnp.int32))
    n_above = jnp.sum(above.astype(jnp.int32))
    keep = group_valid & ~below & ~above

    kb = (k + 3) // 4
    suffix_bytes = (k - lut_prefix_len) // 4 if lut_prefix_len else kb
    record_bytes = suffix_bytes + counter_size
    cnt = jnp.minimum(totals, counter_max)

    def rec_byte(j):
        if j < suffix_bytes:
            t = suffix_bytes - 1 - j
            lane = W - 1 - (t // 4)
            sh = 8 * (t % 4)
            return (wr[lane] >> sh) & 0xFF
        return (cnt >> (8 * (j - suffix_bytes))) & 0xFF

    cols = []
    c0 = 0
    while c0 < record_bytes:
        rem = record_bytes - c0
        w, dt = ((4, jnp.uint32) if rem >= 4 else
                 (2, jnp.uint16) if rem >= 2 else (1, jnp.uint8))
        col = jnp.zeros((out,), jnp.uint32)
        for j in range(c0, c0 + w):
            col = col | (rec_byte(j) << (8 * (w - 1 - (j - c0))))
        cols.append(col.astype(dt))
        c0 += w

    keep_w = keep.astype(jnp.uint32).reshape(out // 32, 32)
    wts = jnp.uint32(1) << (31 - jnp.arange(32, dtype=jnp.uint32))
    keep_bits = (keep_w * wts[None, :]).sum(axis=1).astype(jnp.uint32)

    if lut_prefix_len:
        if lut_prefix_len <= r0:
            prefix = wr[0] >> (2 * (r0 - lut_prefix_len))
        else:
            need = lut_prefix_len - r0
            prefix = (wr[0] << (2 * need)) | (wr[1] >> (2 * (16 - need)))
        prefix = prefix & jnp.uint32((1 << (2 * lut_prefix_len)) - 1)
    else:
        prefix = jnp.zeros((out,), jnp.uint32)
    lut_size = n_bins << (2 * lut_prefix_len)
    key_mono = jnp.where(
        (idx < n_groups) & (bins_r < jnp.uint32(n_bins)),
        (bins_r << (2 * lut_prefix_len)) | prefix,
        jnp.uint32(lut_size),
    )
    kept_excl = jnp.concatenate(
        [jnp.zeros((1,), jnp.uint32), jnp.cumsum(keep.astype(jnp.uint32))]
    )
    bounds = jnp.searchsorted(key_mono, jnp.arange(lut_size + 1, dtype=jnp.uint32))
    lut = kept_excl[bounds[1:]] - kept_excl[bounds[:-1]]
    return cols, keep_bits, lut, (n_unique, n_below, n_above)


_TILED_B_STATICS = (
    "out", "has_counts", "cutoff_min", "cutoff_max", "counter_max", "k",
    "lut_prefix_len", "counter_size", "n_bins", "fuse",
)


@functools.partial(jax.jit, static_argnames=_TILED_B_STATICS,
                   donate_argnums=(0, 1, 2))
def _tiled_finalize_b(keys_s, before, src_t, offs, n_groups, n_live, *,
                      out, has_counts, **kw):
    keys_r, totals = _tiled_gather_groups(
        tuple(keys_s), before, src_t, offs, n_groups, n_live,
        out=out, has_counts=has_counts)
    cols, keep_bits, lut, stats = _finalize_groups_core(
        keys_r, totals, n_groups, **kw)
    return cols, keep_bits, lut, stats


_TILED_B_CHUNK_STATICS = (
    "chunk", "has_counts", "cutoff_min", "cutoff_max", "counter_max", "k",
    "lut_prefix_len", "counter_size", "n_bins", "fuse",
)


@functools.partial(jax.jit, static_argnames=_TILED_B_CHUNK_STATICS)
def _tiled_finalize_b_chunk(keys_s, before, src_t, offs, n_groups, n_live,
                            start, *, chunk, has_counts, **kw):
    """Chunked phase B: produce output rows [start, start+chunk).  `start`
    is a TRACED scalar so every chunk reuses one compiled executable, and
    inputs are NOT donated (they feed every chunk).  The driver overlaps
    each chunk's D2H with the next chunk's execution — the transfer of the
    DB payload rides under device compute instead of after it."""
    keys_r, totals = _tiled_gather_groups(
        tuple(keys_s), before, src_t, offs, n_groups, n_live,
        out=chunk, has_counts=has_counts, start=start)
    cols, keep_bits, lut, stats = _finalize_groups_core(
        keys_r, totals, n_groups, start=start, **kw)
    return cols, keep_bits, lut, stats


def _pipeline_chunks() -> int:
    """KMC_TPU_PIPELINE_D2H: 0 disables the chunked finalize (single
    phase-B dispatch); otherwise the chunk row count (default = the
    phase-B output grain, see KMC_TPU_TILED_OUT_GRAIN)."""
    import os as _os

    v = _os.environ.get("KMC_TPU_PIPELINE_D2H", "1")
    if v in ("0", "false", "no"):
        return 0
    if v in ("1", "true", "yes", ""):
        return _out_grain()
    return max(32, (int(v) + 31) & ~31)


def _use_tiled_finalize() -> bool:
    import os as _os

    v = _os.environ.get("KMC_TPU_TILED_FINALIZE", "1")
    return v not in ("0", "false", "no")


def _out_grain() -> int:
    import os as _os

    g = int(_os.environ.get("KMC_TPU_TILED_OUT_GRAIN", 1 << 22))
    return max(32, (g + 31) & ~31)  # keep-bit packing needs out %% 32 == 0


_FIN_STATICS = (
    "cutoff_min", "cutoff_max", "counter_max", "k",
    "lut_prefix_len", "counter_size", "n_bins", "fuse", "wide",
)


@functools.partial(jax.jit, static_argnames=_FIN_STATICS, donate_argnums=(0,))
def _finalize_records_unit(key_cols, n_used, **kw):
    return _finalize_core(tuple(key_cols), None, n_used, **kw)


@functools.partial(jax.jit, static_argnames=_FIN_STATICS, donate_argnums=(0, 1))
def _finalize_records_counted(key_cols, store_counts, n_used, **kw):
    return _finalize_core(tuple(key_cols), store_counts, n_used, **kw)


def _finalize_rows_core(key_cols, store_counts, n_used, *, cutoff_min,
                        cutoff_max, k, n_bins, fuse, wide=False):
    """Words-path finalize (KFF output / without_output): groups in (bin,
    k-mer) order with raw totals; cutoffs applied host-side."""
    X = key_cols[0].shape[0]
    W = (k + 15) // 16
    r0 = k - 16 * (W - 1)
    idx = jnp.arange(X, dtype=jnp.int32)
    live = _live_mask(key_cols, store_counts, n_used)
    cols_in = [jnp.where(live, c, U32MAX) for c in key_cols]
    if store_counts is None:
        n_live = jnp.sum(live.astype(jnp.int32))
        keys_r, _, totals, n_groups = _group_reduce(cols_in, [], None, n_live)
    else:
        counts = jnp.where(live, store_counts, 0)
        keys_r, _, totals, n_groups = _group_reduce(cols_in, [], counts,
                                                    wide=wide)
    bins_r, wr = _split_bins(keys_r, fuse=fuse, r0=r0)
    group_valid = (idx < n_groups) & (totals > 0) & (bins_r < jnp.uint32(n_bins))
    n_unique = jnp.sum(group_valid.astype(jnp.int32))
    n_below = jnp.sum((group_valid & (totals < cutoff_min)).astype(jnp.int32))
    n_above = jnp.sum((group_valid & (totals > cutoff_max)).astype(jnp.int32))
    out_words = jnp.stack(wr, axis=1)
    out_bins = jnp.where(group_valid, bins_r, U32MAX).astype(jnp.int32)
    out_counts = jnp.where(group_valid, totals, 0)
    return out_bins, out_words, out_counts, n_groups, (n_unique, n_below, n_above)


_TILED_ROWS_STATICS = ("out", "has_counts", "cutoff_min", "cutoff_max", "k",
                       "n_bins", "fuse")


@functools.partial(jax.jit, static_argnames=_TILED_ROWS_STATICS,
                   donate_argnums=(0, 1, 2))
def _tiled_rows_b(keys_s, before, src_t, offs, n_groups, n_live, *, out,
                  has_counts, cutoff_min, cutoff_max, k, n_bins, fuse):
    """Words-path phase B: compacted (bins, words, totals) at OUT size."""
    keys_r, totals = _tiled_gather_groups(
        tuple(keys_s), before, src_t, offs, n_groups, n_live,
        out=out, has_counts=has_counts)
    W = (k + 15) // 16
    r0 = k - 16 * (W - 1)
    idx = jnp.arange(out, dtype=jnp.int32)
    bins_r, wr = _split_bins(keys_r, fuse=fuse, r0=r0)
    group_valid = (idx < n_groups) & (totals > 0) & (bins_r < jnp.uint32(n_bins))
    n_unique = jnp.sum(group_valid.astype(jnp.int32))
    n_below = jnp.sum((group_valid & (totals < cutoff_min)).astype(jnp.int32))
    n_above = jnp.sum((group_valid & (totals > cutoff_max)).astype(jnp.int32))
    out_words = jnp.stack(wr, axis=1)
    out_bins = jnp.where(group_valid, bins_r, U32MAX).astype(jnp.int32)
    out_counts = jnp.where(group_valid, totals, 0)
    return out_bins, out_words, out_counts, (n_unique, n_below, n_above)


_ROWS_STATICS = ("cutoff_min", "cutoff_max", "k", "n_bins", "fuse", "wide")


@functools.partial(jax.jit, static_argnames=_ROWS_STATICS, donate_argnums=(0,))
def _finalize_rows_unit(key_cols, n_used, **kw):
    return _finalize_rows_core(tuple(key_cols), None, n_used, **kw)


@functools.partial(jax.jit, static_argnames=_ROWS_STATICS, donate_argnums=(0, 1))
def _finalize_rows_counted(key_cols, store_counts, n_used, **kw):
    return _finalize_rows_core(tuple(key_cols), store_counts, n_used, **kw)


class _SpillOverflow(Exception):
    """Merged unique set exceeds device capacity: finalize must fall back to
    the host-side external merge of the sorted spill runs."""


class DeviceKmerStore:
    """HBM store of ([bin,] k-mer lanes[, counts]) uint32 rows (see module
    docstring)."""

    # finalize timing split (set by finalize/finalize_records; the host-
    # merge fallback paths may return before the device timers run)
    t_finalize_exec = 0.0
    t_finalize_d2h = 0.0

    def __init__(self, capacity_rows: int, *, k: int, sig_len: int,
                 both_strands: bool, n_bins: int,
                 map_mode: str = "prefix", sig_map: np.ndarray | None = None,
                 initial_rows: int | None = None,
                 spill_budget_bytes: int | None = None,
                 greedy_defer: bool | None = None):
        """capacity_rows is the HBM budget cap; the store starts small and
        grows 4x on demand (each growth recompiles the big kernels, 30-90s
        over the tunnel — TPU runs pass initial_rows=capacity to stay
        shape-stable).

        map_mode "prefix": n_bins is rounded down to a power of two and the
        map becomes sig >> shift (plus the special bin).  map_mode "greedy":
        sig_map (int32[4^sig_len+1], from signatures.build_signature_map)
        routes each signature.  In the default DEFERRED greedy mode
        (greedy_defer, env KMC_TPU_GREEDY_DEFER=1) the store INGESTS under
        the prefix-policy key layout (no per-batch 4^m-entry gather — the
        single measured 2.3 s term of greedy mode at bench scale) and
        remaps rows to their greedy bins at FINALIZE, on the compacted
        unique rows: the signature is recomputed from each stored k-mer's
        own lanes (exact — the m-mer norm is strand-invariant, so
        sig(canonical(K)) == sig(window); mmer.h:81-91) and the map gather
        runs at output scale.  The resulting database is byte-identical to
        the eager per-batch-gather path."""
        def _r32(x):  # keep-bit packing needs row counts divisible by 32
            return (int(x) + 31) & ~31

        self.max_capacity = _r32(capacity_rows)
        self.k = int(k)
        self.sig_len = int(sig_len)
        self.both_strands = bool(both_strands)
        self.map_mode = map_mode
        self.W = (self.k + 15) // 16
        self.r0 = self.k - 16 * (self.W - 1)
        if map_mode == "prefix":
            self.prefix_bits, self.fuse = prefix_bin_bits(k, sig_len, n_bins)
            self.n_used_bins = (1 << self.prefix_bits) + 1  # + special bin
            self._sig_map_dev = None
            self._g_defer = False
        elif map_mode == "greedy":
            if greedy_defer is None:
                greedy_defer = greedy_defer_default()
            self._g_defer = bool(greedy_defer)
            self.prefix_bits = 0
            self.n_used_bins = None
            self.fuse = None
            self._sig_map_dev = None
            if sig_map is None:
                # deferred stage 0: the map arrives via set_sig_map() after
                # ingest (its histogram is accumulated from the ingest
                # buffers), before any finalize
                if not self._g_defer:
                    raise ValueError(
                        "eager greedy map_mode requires sig_map upfront")
            else:
                self.set_sig_map(sig_map)
        else:
            raise ValueError(f"unknown map_mode {map_mode!r}")
        # ingest-side (store row) layout: equals the output layout except in
        # deferred-greedy mode, where rows live in the prefix-policy layout
        # until finalize remaps them
        if self._g_defer:
            self._ing_map_mode = "prefix"
            self._ing_prefix_bits, self._ing_fuse = prefix_bin_bits(
                k, sig_len, 512)
            self._ing_n_bins = (1 << self._ing_prefix_bits) + 1
        else:
            self._ing_map_mode = map_mode
            self._ing_prefix_bits = self.prefix_bits
            self._ing_fuse = self.fuse
            self._ing_n_bins = self.n_used_bins
        # the dead-row bin id: sorts after every real bin
        self.n_dead_bin = self._ing_n_bins
        self.n_cols = self.W if self._ing_fuse else self.W + 1

        self.capacity = min(self.max_capacity, _r32(initial_rows or (1 << 20)))
        # slack rows let ingest continue while a compaction's result size is
        # still in flight (the appends are device-ordered after the compact,
        # and land within capacity+slack even in the worst case).  Default 0:
        # the extra rows widen every sort, which measured slightly worse than
        # the overlap gain on the bench workload; set KMC_TPU_STORE_SLACK_DIV
        # (capacity/div rows) to experiment.
        import os as _os

        div = int(_os.environ.get("KMC_TPU_STORE_SLACK_DIV", "0"))
        self._slack = _r32(self.capacity // div) if div else 0
        self._pending_base = None
        self._pending_appends = 0
        self.counts = None  # materialized by the first compaction
        self._alloc(self.capacity + self._slack, with_counts=False)
        self.n_used = jnp.int32(0)
        self.occ_acc = jnp.zeros((2,), jnp.uint32)  # (lo, hi) occurrences
        self.skm_acc = jnp.zeros((2,), jnp.uint32)  # (lo, hi) super-k-mers
        self.prev_sig = jnp.full((1,), INVALID_SIG, jnp.uint32)
        self._since_compact = 0
        self.n_autocompacts = 0
        self.spilled = []  # host-side spilled compacted (cols tuple, counts)
        # -m enforcement (memory.plan_memory): cumulative spilled-run bytes
        # beyond this trigger an in-place re-merge; a single merged run
        # still over budget means the unique set doesn't fit -m
        self.spill_budget_bytes = spill_budget_bytes
        self.total_appended_rows = 0
        # conservative host-side bound on total occurrences (every ingest
        # position contributes at most 1); selects the wide group-reduce
        # when a single call could see >= 2^31 occurrences, with no device
        # sync on the hot path
        self._occ_upper = 0

    def _alloc(self, capacity, with_counts):
        self.key_cols = tuple(
            jnp.full((capacity,), U32MAX, jnp.uint32) for _ in range(self.n_cols)
        )
        self.counts = jnp.zeros((capacity,), jnp.uint32) if with_counts else None

    def _grow(self, needed_rows: int):
        new_cap = self.capacity
        while new_cap < needed_rows:
            new_cap *= 4
        new_cap = min(new_cap, self.max_capacity)
        if new_cap <= self.capacity:
            return False
        old_cols, old_counts, old_n = self.key_cols, self.counts, self.n_used
        self.capacity = new_cap
        self._alloc(new_cap + self._slack, with_counts=old_counts is not None)
        self.key_cols = tuple(
            jax.lax.dynamic_update_slice(sc, oc, (0,))
            for sc, oc in zip(self.key_cols, old_cols)
        )
        if old_counts is not None:
            self.counts = jax.lax.dynamic_update_slice(self.counts, old_counts, (0,))
        self.n_used = old_n
        return True

    def _make_room(self, s: int):
        if self._pending_base is not None:
            # a compaction's result size is still in flight: keep appending
            # into the slack region (device-ordered after the compact) and
            # only block for the size once the slack is spent
            ready = getattr(self._pending_base, "is_ready", lambda: True)()
            if self._pending_appends + s <= self._slack and not ready:
                self._pending_appends += s
                return
            self._resolve_base()
        if self._since_compact + s > self.capacity - self._base_rows():
            if not self._grow(self._base_rows() + self._since_compact + s):
                self.compact_effective()
                if self._pending_base is not None:
                    if self._pending_appends + s <= self._slack:
                        self._pending_appends += s
                        return
                    self._resolve_base()
                if self._since_compact + s > self.capacity - self._base_rows():
                    if not self._grow(self._base_rows() + s):
                        self.spill()

    def _resolve_base(self):
        if self._pending_base is not None:
            self._base = int(self._pending_base)
            self._pending_base = None
            self._pending_appends = 0

    def _materialize_counts(self):
        """Create the counts column (1 for live rows) when a path needs it."""
        if self.counts is not None:
            return
        live = _live_mask(self.key_cols, None, self.n_used)
        self.counts = live.astype(jnp.uint32)

    def _ing_statics(self, s: int) -> dict:
        return dict(
            s=s, k=self.k, sig_len=self.sig_len,
            both_strands=self.both_strands, map_mode=self._ing_map_mode,
            prefix_bits=self._ing_prefix_bits, fuse=self._ing_fuse,
            n_dead_bin=self.n_dead_bin,
            extract_mode=_use_pallas_extract(s, self.k) or "xla",
        )

    # feed format -> (prefix-policy kernel, greedy-policy kernel)
    _INGEST_KERNELS = {
        "packed": (_ingest_prefix, _ingest_greedy),
        "fused": (_ingest_prefix_fused, _ingest_greedy_fused),
        "bounds": (_ingest_prefix_bounds, _ingest_greedy_bounds),
    }

    def _ingest(self, feed: str, feed_args: tuple, s: int):
        """Shared ingest bookkeeping: one dispatch of the (feed, policy)
        kernel plus room management and the occurrence upper bound."""
        self.total_appended_rows += s
        self._occ_upper += s
        self._make_room(s)
        had_counts = self.counts is not None
        kern = self._INGEST_KERNELS[feed][
            0 if self._ing_map_mode == "prefix" else 1]
        map_args = (() if self._ing_map_mode == "prefix"
                    else (self._sig_map_dev,))
        (self.key_cols, self.n_used, self.occ_acc, self.skm_acc,
         self.prev_sig) = kern(
            *feed_args, self.key_cols, self.n_used, self.occ_acc,
            self.skm_acc, self.prev_sig, *map_args, **self._ing_statics(s))
        if had_counts:
            # ingest after a compaction/resume materialized counts —
            # pad the new raw rows with unit counts
            ones = jnp.ones((s,), jnp.uint32)
            start = self.n_used - s
            self.counts = jax.lax.dynamic_update_slice(
                self.counts, ones, (start,))
        self._since_compact += s
        self._maybe_autocompact()

    def ingest_packed(self, packed, mask, *, s: int, k: int | None = None,
                      sig_len: int | None = None,
                      both_strands: bool | None = None):
        """Fused extract+bin+append of one 2-bit-packed batch (one
        dispatch).  k/sig_len/both_strands are fixed at construction; the
        keyword forms are accepted for API compatibility and validated."""
        for name, val, mine in (("k", k, self.k),
                                ("sig_len", sig_len, self.sig_len),
                                ("both_strands", both_strands, self.both_strands)):
            if val is not None and val != mine:
                raise ValueError(f"{name}={val} differs from store's {mine}")
        self._ingest("packed", (packed, mask), s)

    def ingest_fused(self, buf, *, s: int):
        """ingest_packed on one fused (packed ++ mask) buffer — a single
        H2D transfer per batch."""
        self._ingest("fused", (buf,), s)

    def ingest_boundaries(self, buf, tail_start: int, *, s: int):
        """ingest on the boundary-delta feed format (see
        io/native.py::pack_codes_boundaries)."""
        self._ingest("bounds", (buf, jnp.int32(tail_start)), s)

    def append(self, cols, counts, count_occurrences: bool = True):
        """External append of merged (key columns, counts) rows."""
        counts = np.asarray(counts)
        n = counts.shape[0]
        self.total_appended_rows += n
        self._occ_upper += int(counts.astype(np.uint64).sum())
        self._make_room(n)
        self._materialize_counts()
        acc = self.occ_acc if count_occurrences else jnp.zeros((2,), jnp.uint32)
        self.key_cols, self.counts, self.n_used, acc = _append(
            self.key_cols, self.counts, self.n_used,
            tuple(jnp.asarray(c) for c in cols), jnp.asarray(counts), acc)
        if count_occurrences:
            self.occ_acc = acc
        self._since_compact += n

    def total_super_kmers(self) -> int:
        acc = np.asarray(self.skm_acc)
        return int(acc[0]) + (int(acc[1]) << 32)

    def total_occurrences(self) -> int:
        acc = np.asarray(self.occ_acc)
        return int(acc[0]) + (int(acc[1]) << 32)

    def _base_rows(self) -> int:
        return getattr(self, "_base", 0)

    def _wide(self) -> bool:
        return self._occ_upper >= (1 << 31)

    def _autocompact_rows(self) -> int:
        """KMC_TPU_AUTOCOMPACT_ROWS: appended rows between voluntary
        mid-run compactions.  Default 0 (OFF) — measured on the bench
        workload (fast host parse, store fits HBM) compaction strictly
        adds device sort work it cannot hide: off 6.77 s, one compact
        8.77 s, three compacts 10.89 s (finalize exec does drop 2.06 ->
        1.40 s, but the compactions cost more than they save; see
        docs/PERFORMANCE.md).  Enable for slow-parse inputs (gz/BAM on a
        weak host) where device idle during stage 1 dwarfs the sort cost,
        sized so a compact's rows fit the idle window."""
        import os as _os

        return max(0, int(_os.environ.get("KMC_TPU_AUTOCOMPACT_ROWS", "0")))

    def _maybe_autocompact(self):
        if self._pending_base is not None:
            return  # a compaction is already in flight
        thr = self._autocompact_rows()
        if thr and self._since_compact >= thr:
            self.compact_effective()

    def compact_effective(self):
        """Voluntary mid-run compaction at the grain-rounded used width.

        compact() sorts the full allocation (the dead tail costs the same
        ~5 ns/row as live data); this slices to the effective width first
        and stitches the result back, so a half-full 2^28 store dedups in
        half the time.  Like compact() the result-size fetch is deferred
        (appends ride the slack region), so the whole thing queues
        asynchronously behind the last ingest dispatch and overlaps the
        host's parsing of the next batches — the finalize then sorts the
        deduped row count instead of every appended row.  The reference's
        analogue is per-bin stage-1 sorting while readers still run
        (kmc.h:234-294); here the 'bin' is the whole HBM store."""
        eff_cols, eff_counts = self._effective_finalize_cols()
        X = int(self.key_cols[0].shape[0])
        eff = int(eff_cols[0].shape[0])
        if eff >= X:
            return self.compact()
        if eff_counts is None:
            part_cols, part_counts, n = _compact_unit(eff_cols, self.n_used)
            self.key_cols, self.counts = _stitch_unit(
                self.key_cols, part_cols, part_counts)
        else:
            part_cols, part_counts, n = _compact_counted(
                eff_cols, eff_counts, self.n_used, wide=self._wide())
            self.key_cols, self.counts = _stitch_counted(
                self.key_cols, self.counts, part_cols, part_counts)
        self.n_used = n
        self.n_autocompacts += 1
        self._pending_base = n
        self._pending_appends = 0
        self._since_compact = 0

    def compact(self, blocking: bool = False):
        if self.counts is None:
            self.key_cols, self.counts, self.n_used = _compact_unit(
                self.key_cols, self.n_used)
        else:
            self.key_cols, self.counts, self.n_used = _compact_counted(
                self.key_cols, self.counts, self.n_used, wide=self._wide())
        # defer the result-size fetch: ingest keeps streaming into the slack
        # region while the compact executes (see _make_room)
        self._pending_base = self.n_used
        self._pending_appends = 0
        self._since_compact = 0
        if blocking:
            self._resolve_base()

    def spill(self):
        """Move the compacted store to host RAM (sorted unique run)."""
        self.compact(blocking=True)
        n = self._base
        self.spilled.append(
            (tuple(np.asarray(c[:n]) for c in self.key_cols),
             np.asarray(self.counts[:n]))
        )
        self._alloc(self.capacity + self._slack, with_counts=True)
        self.n_used = jnp.int32(0)
        self._base = 0
        self._since_compact = 0
        self._enforce_spill_budget()

    def _spilled_bytes(self) -> int:
        return sum(sum(c.nbytes for c in cols) + cnt.nbytes
                   for cols, cnt in self.spilled)

    def _enforce_spill_budget(self):
        """-m enforcement: re-merge the spilled runs in place when their
        cumulative bytes cross the budget (duplicates across runs
        collapse — the strict-memory analogue of the reference re-planning
        stage-2 pools under pressure, kmc.h:318-367); a single merged run
        still over budget means the unique set genuinely exceeds -m."""
        b = self.spill_budget_bytes
        if b is None or self._spilled_bytes() <= b:
            return
        if len(self.spilled) > 1:
            self._remerge_spilled()
        if self._spilled_bytes() > b:
            raise MemoryError(
                f"unique k-mer set exceeds the -m/max_ram_gb host budget "
                f"({self._spilled_bytes()} spilled bytes > "
                f"{b} budget); raise -m")

    def _remerge_spilled(self):
        """Collapse every spilled run into one sorted unique run (host
        lexsort + reduceat — the same merge finalize's host path runs,
        done early to cap resident spill bytes)."""
        nc = self.n_cols
        cols = [np.concatenate([r[0][j] for r in self.spilled])
                for j in range(nc)]
        counts = np.concatenate([r[1] for r in self.spilled]).astype(np.uint64)
        order = np.lexsort(tuple(cols[::-1]))
        cols = [c[order] for c in cols]
        counts = counts[order]
        n = len(counts)
        if n == 0:
            self.spilled = [(tuple(cols), counts.astype(np.uint32))]
            return
        new = np.zeros(n, bool)
        new[0] = True
        for c in cols:
            new[1:] |= c[1:] != c[:-1]
        starts = np.flatnonzero(new)
        totals = np.add.reduceat(counts, starts)
        # the device group-reduce saturates totals at u32 (ops above merge
        # with that semantics), so the early merge clamps identically
        merged_counts = np.minimum(totals, 0xFFFFFFFF).astype(np.uint32)
        self.spilled = [(tuple(c[starts] for c in cols), merged_counts)]

    def _replay_spills(self):
        if not self.spilled:
            return
        self._materialize_counts()
        while self.spilled:
            cols, counts = self.spilled[0]
            pos = 0
            while pos < len(counts):
                room = self.capacity - max(self._base_rows(), int(self.n_used))
                if room <= 0:
                    self.compact(blocking=True)
                    room = self.capacity - self._base_rows()
                if room <= 0:
                    # trim the consumed prefix so the host-merge fallback
                    # sees every remaining row exactly once (replayed rows
                    # now live in the device store)
                    self.spilled[0] = (
                        tuple(c[pos:] for c in cols), counts[pos:])
                    raise _SpillOverflow()
                take = min(room, len(counts) - pos)
                # occurrences were already accumulated at first append, and
                # _occ_upper must not double-count replays
                prev_upper = self._occ_upper
                self.append(
                    tuple(c[pos : pos + take] for c in cols),
                    counts[pos : pos + take],
                    count_occurrences=False,
                )
                self._occ_upper = prev_upper
                pos += take
            self.spilled.pop(0)

    # -- host external merge: the fallback when the merged unique set
    # exceeds the device store (the reference's strict-memory big-bin
    # pipeline analogue: sorted sub-bin runs k-way merged outside the
    # working memory, bkb_merger.h:20-41) --
    def _host_runs(self):
        """Drain the store to host-side sorted (cols, counts) runs: the
        spilled runs plus the compacted device residue."""
        self.compact(blocking=True)
        n = self._base
        runs = list(self.spilled)
        if n:
            runs.append(
                (tuple(np.asarray(c[:n]) for c in self.key_cols),
                 np.asarray(self.counts[:n]))
            )
        self.spilled = []
        self.key_cols = self.counts = None
        return runs

    def _host_merge(self):
        """Merge the runs by (bin, k-mer) on the host (125 GB RAM vs 16 GB
        HBM).  Returns (bins u32, lanes (n, W) u32, totals u64) for valid
        groups in key order."""
        runs = self._host_runs()
        if not runs:
            return (np.zeros(0, np.uint32), np.zeros((0, self.W), np.uint32),
                    np.zeros(0, np.uint64))
        nc = self.n_cols
        cols = [np.concatenate([r[0][j] for r in runs]) for j in range(nc)]
        counts = np.concatenate([r[1] for r in runs]).astype(np.uint64)
        order = np.lexsort(tuple(cols[::-1]))  # cols[0] is the primary key
        cols = [c[order] for c in cols]
        counts = counts[order]
        n = len(counts)
        if n == 0:
            return (np.zeros(0, np.uint32), np.zeros((0, self.W), np.uint32),
                    np.zeros(0, np.uint64))
        new = np.zeros(n, bool)
        new[0] = True
        for c in cols:
            new[1:] |= c[1:] != c[:-1]
        starts = np.flatnonzero(new)
        totals = np.add.reduceat(counts, starts)
        rep = [c[starts] for c in cols]
        if self._ing_fuse:
            bins = rep[0] >> (2 * self.r0)
            lanes = [rep[0] & np.uint32((1 << (2 * self.r0)) - 1)] + rep[1:]
        else:
            bins = rep[0]
            lanes = rep[1:]
        valid = (bins < self._ing_n_bins) & (totals > 0)
        bins = bins[valid].astype(np.uint32)
        lanes = np.stack([l[valid] for l in lanes], axis=1)
        totals = totals[valid]
        if self._g_defer:
            # deferred greedy: rows merged in prefix-key order; remap each
            # unique k-mer to its greedy bin and re-sort (host mirror of
            # _greedy_collect)
            from ..signatures import sig_of_lanes_numpy

            sig = sig_of_lanes_numpy(lanes, self.k, self.sig_len)
            sm = np.asarray(self._sig_map_dev)
            slot = np.minimum(sig, np.uint32(len(sm) - 1))
            bins = sm[slot].astype(np.uint32)
            order = np.lexsort(tuple(lanes[:, ::-1].T) + (bins,))
            bins, lanes, totals = bins[order], lanes[order], totals[order]
        return bins, lanes, totals

    # -- checkpoint / resume (SURVEY.md §5.4: stage-1 state is the natural
    # checkpoint; the reference's analogue is its tmp bin files + CBinDesc) --
    def save_checkpoint(self, path: str):
        """Compact, then persist the store's valid prefix to an .npz."""
        self._require_sig_map()
        self.compact(blocking=True)
        n = self._base
        np.savez_compressed(
            path,
            cols=np.stack([np.asarray(c[:n]) for c in self.key_cols]),
            counts=np.asarray(self.counts[:n]),
            occ=np.asarray(self.occ_acc),
            skm=np.asarray(self.skm_acc),
            occ_upper=np.asarray(self._occ_upper, dtype=np.uint64),
            k=np.asarray(self.k),
            sig_len=np.asarray(self.sig_len),
            both_strands=np.asarray(self.both_strands),
            n_used_bins=np.asarray(self.n_used_bins),
            prefix_bits=np.asarray(self.prefix_bits),
            map_mode=np.asarray(self.map_mode),
            # deferred-greedy stores hold rows in the prefix-policy layout;
            # the loader must reconstruct the same layout regardless of the
            # env default at load time
            greedy_defer=np.asarray(self._g_defer),
            # store the original -1-for-disallowed form: __init__ rewrites
            # -1 to the dead bin, so round-tripping the rewritten map would
            # inflate n_used_bins by one per save/load cycle
            sig_map=(np.where(np.asarray(self._sig_map_dev) == self.n_used_bins,
                              -1, np.asarray(self._sig_map_dev)).astype(np.int32)
                     if self._sig_map_dev is not None else np.zeros(0, np.int32)),
            spilled=np.asarray(len(self.spilled)),
        )
        for i, (cols, counts) in enumerate(self.spilled):
            np.savez_compressed(f"{path}.spill{i}",
                                cols=np.stack(cols), counts=counts)

    @classmethod
    def load_checkpoint(cls, path: str, capacity_rows: int):
        data = np.load(path if str(path).endswith(".npz") else path + ".npz")
        n = len(data["counts"])
        map_mode = str(data["map_mode"])
        kw = dict(
            k=int(data["k"]), sig_len=int(data["sig_len"]),
            both_strands=bool(data["both_strands"]), map_mode=map_mode,
        )
        if map_mode == "prefix":
            kw["n_bins"] = 1 << int(data["prefix_bits"])
        else:
            kw["n_bins"] = int(data["n_used_bins"])
            kw["sig_map"] = data["sig_map"]
            # checkpoints from before the deferred mode existed hold rows in
            # the eager greedy layout
            kw["greedy_defer"] = bool(data["greedy_defer"]) \
                if "greedy_defer" in data else False
        store = cls(max(capacity_rows, 2 * max(n, 1)),
                    initial_rows=max(2 * n, 1 << 10), **kw)
        store.append(tuple(data["cols"]), data["counts"],
                     count_occurrences=False)
        store.occ_acc = jnp.asarray(data["occ"])
        store.skm_acc = jnp.asarray(data["skm"])
        store._occ_upper = int(data["occ_upper"])
        for i in range(int(data["spilled"])):
            sp = np.load(f"{path}.spill{i}.npz")
            store.spilled.append((tuple(sp["cols"]), sp["counts"]))
        return store

    def set_sig_map(self, sig_map: np.ndarray):
        """Install (or replace) the greedy signature->bin map.  In deferred
        mode this may happen any time before the first finalize — the store
        rows are map-independent (prefix layout) until then."""
        if self.map_mode != "greedy":
            raise ValueError("set_sig_map applies to greedy map_mode only")
        if self._sig_map_dev is not None and not self._g_defer:
            raise ValueError("eager greedy stores cannot change their map")
        self.n_used_bins = int(sig_map.max()) + 1
        self.fuse = greedy_fuse(self.k, self.n_used_bins)
        # disallowed (-1) slots are unreachable; route them to the dead
        # bin defensively
        sm = np.where(sig_map < 0, self.n_used_bins, sig_map)
        self._sig_map_dev = jnp.asarray(sm.astype(np.int32))

    def _require_sig_map(self):
        if self.map_mode == "greedy" and self._sig_map_dev is None:
            raise RuntimeError(
                "deferred greedy store: call set_sig_map() before finalize/"
                "checkpoint (the stage-0 histogram feeds it)")

    def stage0_accum(self, feed: str, feed_args: tuple, hist, *, s: int):
        """Accumulate the stage-0 per-signature histogram from an ingest
        feed buffer already on device (deferred-greedy stage-0 folding; the
        histogram batches ride the ingest stream instead of a separate
        parse pass).  Returns the updated device histogram (donated)."""
        kw = dict(s=s, k=self.k, sig_len=self.sig_len)
        if feed == "bounds":
            buf, ts = feed_args
            return _stage0_accum_bounds(buf, ts, hist, **kw)
        if feed == "fused":
            return _stage0_accum_fused(feed_args[0], hist, **kw)
        raise ValueError(f"unknown stage-0 feed {feed!r}")

    def host_sig_map(self) -> np.ndarray:
        """The active signature->bin map as int32[4^sig_len + 1] (for the
        .kmc_pre footer and the develop dumps)."""
        if self.map_mode == "greedy":
            return np.asarray(self._sig_map_dev)
        return prefix_sig_map(self.sig_len, self.prefix_bits)

    def _effective_finalize_cols(self):
        """Slice the store to the smallest GRAIN-rounded shape covering the
        used rows before the finalize sorts: the big sorts cost ~5 ns/row
        regardless of liveness, so sorting the dead allocation tail (store
        rows are full-capacity for shape stability) wastes up to
        GRAIN/capacity of the dominant finalize term.  GRAIN bounds the
        number of compiled variants (capacity/GRAIN shapes, persistent
        cache).  Returns (key_cols, counts) views."""
        import os as _os

        if self._pending_base is not None:
            self._resolve_base()
        rows = self._base_rows() + self._since_compact
        X = int(self.key_cols[0].shape[0])
        grain = int(_os.environ.get("KMC_TPU_FINALIZE_GRAIN", 1 << 24))
        grain = max(32, (grain + 31) & ~31)  # keep-bit packing needs %32
        eff = min(X, ((max(rows, 1) + grain - 1) // grain) * grain)
        if eff >= X:
            return self.key_cols, self.counts
        cols = tuple(c[:eff] for c in self.key_cols)
        counts = self.counts[:eff] if self.counts is not None else None
        return cols, counts

    def finalize_records(
        self,
        sig_map: np.ndarray | None = None,  # API compat; map fixed at init
        *,
        cutoff_min: int,
        cutoff_max: int,
        counter_max: int,
        lut_prefix_len: int,
        counter_size: int,
        k: int | None = None,
        sig_len: int | None = None,
        n_bins: int | None = None,
    ):
        """Device-completer finalize: returns (rec_bytes (N, RB) u8 in final
        record order already cutoff-filtered, lut uint64[(n_bins<<2*lpl)],
        stats tuple).  See _finalize_core."""
        import time as _time

        self._require_sig_map()

        try:
            self._replay_spills()
        except _SpillOverflow:
            return self._finalize_records_host(
                cutoff_min=cutoff_min, cutoff_max=cutoff_max,
                counter_max=counter_max, lut_prefix_len=lut_prefix_len,
                counter_size=counter_size)
        kw = dict(
            cutoff_min=cutoff_min, cutoff_max=cutoff_max,
            counter_max=counter_max, k=self.k,
            lut_prefix_len=lut_prefix_len, counter_size=counter_size,
            n_bins=self.n_used_bins, fuse=self.fuse,
        )
        t0 = _time.perf_counter()
        eff_cols, eff_counts = self._effective_finalize_cols()
        if _use_tiled_finalize():
            # two-dispatch tiled finalize: phase A does the grouping sort +
            # per-tile compaction; phase B (compiled at the OUTPUT size,
            # grain-rounded) gathers the representatives and runs the
            # completer — the second full-width compaction sort is gone
            has = eff_counts is not None
            keys_s, before, src_t, offs, n_groups_d, n_live = _tiled_reduce_a(
                eff_cols, eff_counts, self.n_used, has_counts=has,
                sort_mode=_grouping_sort_mode())
            n = int(n_groups_d)  # sync point (phase B shape depends on it)
            X128 = int(src_t.shape[0])
            chunk = _pipeline_chunks()
            if self._g_defer:
                # deferred greedy: collect + remap + re-sort at OUTPUT
                # scale, then emit from the greedy-sorted arrays (chunked
                # and pipelined exactly like the classic path)
                grain = _out_grain()
                out = min(X128, ((max(n, 1) + grain - 1) // grain) * grain)
                chunk = min(chunk, out) if chunk else 0
                if chunk:  # emission slices must never clamp
                    out = ((out + chunk - 1) // chunk) * chunk
                g_cols, g_tot = _greedy_collect(
                    keys_s, before, src_t, offs, n_groups_d, n_live,
                    self._sig_map_dev, out=out, has_counts=has,
                    **self._g_remap_statics())
                gkw = dict(kw)
                if chunk:
                    def emit(start):
                        return _greedy_emit_chunk(
                            g_cols, g_tot, n_groups_d, start,
                            chunk=chunk, **gkw)

                    return self._consume_pipelined(
                        emit, n=n, chunk=chunk,
                        lut_prefix_len=lut_prefix_len,
                        counter_size=counter_size, t0=t0)
                cols, keep_bits, lut, stats = _greedy_emit_full(
                    g_cols, g_tot, n_groups_d, **gkw)
                np.asarray(keep_bits[:1])
            elif chunk:
                return self._finalize_records_pipelined(
                    keys_s, before, src_t, offs, n_groups_d, n_live,
                    n=n, chunk=min(chunk, X128), has=has, kw=kw,
                    lut_prefix_len=lut_prefix_len,
                    counter_size=counter_size, t0=t0)
            else:
                grain = _out_grain()
                out = min(X128, ((max(n, 1) + grain - 1) // grain) * grain)
                cols, keep_bits, lut, stats = _tiled_finalize_b(
                    keys_s, before, src_t, offs, n_groups_d, n_live,
                    out=out, has_counts=has, **kw)
                # force phase-B completion so t_finalize_exec is device
                # exec, not dispatch (block_until_ready does not block on
                # the dev tunnel; a scalar fetch does)
                np.asarray(keep_bits[:1])
        else:
            if self._g_defer:
                self.key_cols = _greedy_remap_store(
                    self.key_cols, self._sig_map_dev,
                    **self._g_remap_statics())
                eff_cols, eff_counts = self._effective_finalize_cols()
            if eff_counts is None:
                cols, keep_bits, lut, n_groups, stats = _finalize_records_unit(
                    eff_cols, self.n_used, wide=False, **kw)
            else:
                cols, keep_bits, lut, n_groups, stats = _finalize_records_counted(
                    eff_cols, eff_counts, self.n_used,
                    wide=self._wide(), **kw)
            n = int(n_groups)  # sync point
        self.t_finalize_exec = _time.perf_counter() - t0
        t0 = _time.perf_counter()
        nb = (n + 31) // 32
        # start all D2H copies before consuming any (pipelines the transfers)
        slices = [keep_bits[:nb]] + [c[:n] for c in cols] + [lut]
        for a in slices:
            try:
                a.copy_to_host_async()
            except AttributeError:
                pass
        keep_h = np.unpackbits(
            np.asarray(slices[0]).astype(">u4").view(np.uint8)
        )[:n].astype(bool)
        k_ = self.k
        suffix_bytes = (k_ - lut_prefix_len) // 4 if lut_prefix_len else (k_ + 3) // 4
        record_bytes = suffix_bytes + counter_size
        rec_h = np.empty((n, record_bytes), dtype=np.uint8)
        off = 0
        for c in slices[1:-1]:
            a = np.asarray(c)
            w = a.dtype.itemsize
            rec_h[:, off : off + w] = (
                a.astype(">u%d" % w).view(np.uint8).reshape(n, w)
            )
            off += w
        lut_h = np.asarray(slices[-1]).astype(np.uint64)
        self.t_finalize_d2h = _time.perf_counter() - t0
        self.key_cols = self.counts = None
        return np.ascontiguousarray(rec_h[keep_h]), lut_h, tuple(int(x) for x in stats)

    def _g_remap_statics(self) -> dict:
        return dict(k=self.k, sig_len=self.sig_len, ing_fuse=self._ing_fuse,
                    g_fuse=self.fuse, n_ing_bins=self._ing_n_bins)

    def _finalize_records_pipelined(self, keys_s, before, src_t, offs,
                                    n_groups_d, n_live, *, n, chunk, has,
                                    kw, lut_prefix_len, counter_size, t0):
        """Chunked phase B with D2H/exec overlap (see _consume_pipelined)."""
        def emit(start):
            return _tiled_finalize_b_chunk(
                keys_s, before, src_t, offs, n_groups_d, n_live,
                start, chunk=chunk, has_counts=has, **kw)

        return self._consume_pipelined(
            emit, n=n, chunk=chunk, lut_prefix_len=lut_prefix_len,
            counter_size=counter_size, t0=t0)

    def _consume_pipelined(self, emit, *, n, chunk, lut_prefix_len,
                           counter_size, t0):
        """Chunked phase B with D2H/exec overlap: every chunk is the SAME
        compiled executable (traced start scalar), all chunks are
        dispatched up front with their D2H copies queued async, then
        consumed in order — chunk c's transfer and host assembly run while
        chunk c+1 executes on device.  Byte-identical to the single
        phase-B dispatch (per-chunk stats/LUT sum to the global ones).
        `emit(start)` -> (cols, keep_bits, lut, stats) for output rows
        [start, start+chunk)."""
        import time as _time

        n_eff = max(n, 1)
        n_chunks = -(-n_eff // chunk)
        parts = []
        for c in range(n_chunks):
            cols_c, keep_c, lut_c, st_c = emit(jnp.int32(c * chunk))
            for a in (keep_c, *cols_c, lut_c, *st_c):
                try:
                    a.copy_to_host_async()
                except AttributeError:
                    pass
            parts.append((cols_c, keep_c, lut_c, st_c))
        # chunk-0 completion = the exec side of the timer split (the
        # remaining chunks' exec overlaps the consumption loop below)
        n_unique = int(parts[0][3][0])
        self.t_finalize_exec = _time.perf_counter() - t0
        t0 = _time.perf_counter()
        k_ = self.k
        suffix_bytes = ((k_ - lut_prefix_len) // 4 if lut_prefix_len
                        else (k_ + 3) // 4)
        record_bytes = suffix_bytes + counter_size
        rec_parts = []
        lut_h = None
        n_below = n_above = 0
        for c, (cols_c, keep_c, lut_c, st_c) in enumerate(parts):
            rows_c = min(chunk, n_eff - c * chunk)
            keep_h = np.unpackbits(
                np.asarray(keep_c).astype(">u4").view(np.uint8)
            )[:rows_c].astype(bool)
            rec_h = np.empty((rows_c, record_bytes), dtype=np.uint8)
            off = 0
            for col in cols_c:
                a = np.asarray(col)[:rows_c]
                w = a.dtype.itemsize
                rec_h[:, off : off + w] = (
                    a.astype(">u%d" % w).view(np.uint8).reshape(rows_c, w)
                )
                off += w
            rec_parts.append(rec_h[keep_h])
            lc = np.asarray(lut_c).astype(np.uint64)
            lut_h = lc if lut_h is None else lut_h + lc
            if c:
                n_unique += int(st_c[0])
            n_below += int(st_c[1])
            n_above += int(st_c[2])
        self.t_finalize_d2h = _time.perf_counter() - t0
        self.key_cols = self.counts = None
        rec = (np.concatenate(rec_parts) if len(rec_parts) > 1
               else np.ascontiguousarray(rec_parts[0]))
        return rec, lut_h, (n_unique, n_below, n_above)

    def _finalize_records_host(self, *, cutoff_min, cutoff_max, counter_max,
                               lut_prefix_len, counter_size):
        """Host-side completer over the external merge (same contract as
        finalize_records)."""
        import time as _time

        t0 = _time.perf_counter()
        bins, lanes, totals = self._host_merge()
        n_unique = len(bins)
        below = totals < cutoff_min
        above = totals > cutoff_max
        keep = ~below & ~above
        stats = (n_unique, int(below.sum()), int(above.sum()))
        bins_k = bins[keep]
        lanes_k = lanes[keep]
        cnt = np.minimum(totals[keep], np.uint64(counter_max)).astype(np.uint64)

        k = self.k
        W = self.W
        kb = (k + 3) // 4
        suffix_bytes = (k - lut_prefix_len) // 4 if lut_prefix_len else kb
        record_bytes = suffix_bytes + counter_size
        n = len(bins_k)
        rec = np.empty((n, record_bytes), np.uint8)
        all_bytes = np.ascontiguousarray(lanes_k).astype(">u4").view(
            np.uint8).reshape(n, 4 * W)
        rec[:, :suffix_bytes] = all_bytes[:, 4 * W - suffix_bytes:]
        for j in range(counter_size):  # LE counter bytes
            rec[:, suffix_bytes + j] = (
                (cnt >> np.uint64(8 * j)) & np.uint64(0xFF)).astype(np.uint8)

        r0 = self.r0
        if lut_prefix_len:
            if lut_prefix_len <= r0:
                prefix = lanes_k[:, 0] >> (2 * (r0 - lut_prefix_len))
            else:
                need = lut_prefix_len - r0
                prefix = ((lanes_k[:, 0].astype(np.uint64) << (2 * need))
                          | (lanes_k[:, 1] >> (2 * (16 - need)))).astype(np.uint32)
            prefix &= np.uint32((1 << (2 * lut_prefix_len)) - 1)
        else:
            prefix = np.zeros(n, np.uint32)
        lut_size = self.n_used_bins << (2 * lut_prefix_len)
        keys = (bins_k.astype(np.uint64) << (2 * lut_prefix_len)) | prefix
        lut = np.bincount(keys.astype(np.int64), minlength=lut_size).astype(
            np.uint64)
        self.t_finalize_exec = _time.perf_counter() - t0
        self.t_finalize_d2h = 0.0
        return rec, lut, stats

    def _finalize_rows_from_collected(self, g_cols, g_tot, n, *, cutoff_min,
                                      cutoff_max, counter_max, t0):
        """(bins, words, counts, stats) from the deferred-greedy collected
        arrays (already sorted in final record order; dead rows all-ones)."""
        import time as _time

        np.asarray(g_tot[:1])  # force exec for the timer split
        self.t_finalize_exec = _time.perf_counter() - t0
        t0 = _time.perf_counter()
        cols = [np.asarray(c[:n]) for c in g_cols]
        totals = np.asarray(g_tot[:n]).astype(np.uint64)
        self.t_finalize_d2h = _time.perf_counter() - t0
        if self.fuse:
            bins = cols[0] >> (2 * self.r0)
            lanes = [cols[0] & np.uint32((1 << (2 * self.r0)) - 1)] + cols[1:]
        else:
            bins = cols[0]
            lanes = cols[1:]
        valid = (bins < self.n_used_bins) & (totals > 0)
        below = valid & (totals < cutoff_min)
        above = valid & (totals > cutoff_max)
        stats = (int(valid.sum()), int(below.sum()), int(above.sum()))
        keep = valid & ~below & ~above
        out = (
            bins[keep].astype(np.int32),
            np.stack([l[keep] for l in lanes], axis=1),
            np.minimum(totals[keep], np.uint64(counter_max)).astype(np.uint32),
            stats,
        )
        self.key_cols = self.counts = None
        return out

    def finalize(self, sig_map: np.ndarray | None = None, cutoff_min: int = 1,
                 cutoff_max: int = 10**9, counter_max: int = 255, *,
                 k: int | None = None, sig_len: int | None = None):
        """Returns (bins, words, counts, stats) as host arrays in final DB
        record order (KFF / no-output paths)."""
        import time as _time

        self._require_sig_map()

        try:
            self._replay_spills()
        except _SpillOverflow:
            bins, lanes, totals = self._host_merge()
            n_unique = len(bins)
            below = totals < cutoff_min
            above = totals > cutoff_max
            stats = (n_unique, int(below.sum()), int(above.sum()))
            keep = ~below & ~above
            return (bins[keep].astype(np.int32), lanes[keep],
                    np.minimum(totals[keep],
                               np.uint64(counter_max)).astype(np.uint32),
                    stats)
        kw = dict(cutoff_min=cutoff_min, cutoff_max=cutoff_max, k=self.k,
                  n_bins=self.n_used_bins, fuse=self.fuse)
        t0 = _time.perf_counter()
        eff_cols, eff_counts = self._effective_finalize_cols()
        if _use_tiled_finalize():
            has = eff_counts is not None
            keys_s, before, src_t, offs, n_groups_d, n_live = _tiled_reduce_a(
                eff_cols, eff_counts, self.n_used, has_counts=has,
                sort_mode=_grouping_sort_mode())
            n = int(n_groups_d)  # sync point
            X128 = int(src_t.shape[0])
            grain = _out_grain()
            out = min(X128, ((max(n, 1) + grain - 1) // grain) * grain)
            if self._g_defer:
                g_cols, g_tot = _greedy_collect(
                    keys_s, before, src_t, offs, n_groups_d, n_live,
                    self._sig_map_dev, out=out, has_counts=has,
                    **self._g_remap_statics())
                return self._finalize_rows_from_collected(
                    g_cols, g_tot, n, cutoff_min=cutoff_min,
                    cutoff_max=cutoff_max, counter_max=counter_max, t0=t0)
            g_bins, g_words, g_counts, stats = _tiled_rows_b(
                keys_s, before, src_t, offs, n_groups_d, n_live,
                out=out, has_counts=has, **kw)
            np.asarray(g_bins[:1])  # force exec for the timer split
        else:
            if self._g_defer:
                self.key_cols = _greedy_remap_store(
                    self.key_cols, self._sig_map_dev,
                    **self._g_remap_statics())
                eff_cols, eff_counts = self._effective_finalize_cols()
            if eff_counts is None:
                g_bins, g_words, g_counts, n_groups, stats = _finalize_rows_unit(
                    eff_cols, self.n_used, wide=False, **kw)
            else:
                g_bins, g_words, g_counts, n_groups, stats = _finalize_rows_counted(
                    eff_cols, eff_counts, self.n_used,
                    wide=self._wide(), **kw)
            n = int(n_groups)  # sync point: device queue drains here
        self.t_finalize_exec = _time.perf_counter() - t0
        t0 = _time.perf_counter()
        bins = np.asarray(g_bins[:n])
        words = np.asarray(g_words[:n])
        totals = np.asarray(g_counts[:n])
        self.t_finalize_d2h = _time.perf_counter() - t0
        keep = (bins >= 0) & (totals >= cutoff_min) & (totals <= cutoff_max)
        out = (
            bins[keep],
            words[keep],
            np.minimum(totals[keep], counter_max).astype(np.uint32),
            tuple(int(x) for x in stats),
        )
        self.key_cols = self.counts = None
        return out
