"""HBM-resident k-mer store: the TPU replacement for KMC's temp-file bins.

The reference spills stage-1 super-k-mers to per-bin temp files and reads
them back for stage 2 (kb_storer.cpp, kb_reader.h).  On TPU the same role is
played by one large device-resident array set:

  ingest   one fused dispatch per 2-bit-packed input batch: unpack +
           signature scan + canonical k-mer lanes + append (donated buffers,
           a dynamic_update_slice — no host round-trip), plus the occurrence
           / super-k-mer / signature-histogram accumulators;
  compact  when full, merge duplicate rows (sort+scan only);
  finalize group by (bin, k-mer), merge counts, and emit the exact on-disk
           record bytes + per-(bin, prefix) LUT on device (the reference's
           completer, kb_completer.cpp:59-223, moved into the kernel).

Row layout is LEAN: signature + k-mer lanes (12 bytes/row for k<=32).
Counts are implicitly 1 until a compaction materializes a counts column, so
the hot-path sorts carry no count payload (the unit-count fast path in
_group_reduce).  The signature column doubles as the liveness marker
(INVALID_SIG = dead row) and as the bin key at finalize — recomputing it
from the lanes (ops/extract.py::sig_of_words) was measured slower than
storing it.

Host transfers happen only at finalize (or on spill past the HBM budget).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .extract import INVALID_SIG, _kmer_words, _unpack_device, position_sigs


def _acc64_add(acc, inc_u32):
    """Add a uint32 increment into a 2-lane (lo, hi) uint32 accumulator."""
    lo = acc[0] + inc_u32
    hi = acc[1] + (lo < acc[0]).astype(jnp.uint32)
    return jnp.stack([lo, hi])


@functools.partial(
    jax.jit,
    static_argnames=("s", "k", "sig_len", "both_strands"),
    donate_argnums=(2, 3, 5, 7),
)
def _ingest(packed, mask, store_sig, store_words, n_used, occ_acc, skm_acc,
            prev_sig, sig_hist, *, s, k, sig_len, both_strands):
    """Fused stage-1 + append: one device dispatch per input batch (the
    tunnel's per-dispatch latency dominates at small batch sizes, so the
    extract kernel and the store update must ride one executable)."""
    c4, bad = _unpack_device(packed, mask)
    valid, sig_pos, p, q = position_sigs(c4, bad, s=s, k=k, sig_len=sig_len)

    # exact super-k-mer count: a new super-k-mer starts at every valid
    # position whose signature differs from its predecessor's (the
    # reference's cut rule, splitter.cpp:557-677); prev_sig carries across
    # batches
    prev = jnp.concatenate([prev_sig, sig_pos[:-1]])
    new_skm = (sig_pos != INVALID_SIG) & (sig_pos != prev)
    skm_acc = _acc64_add(skm_acc, jnp.sum(new_skm.astype(jnp.uint32)))

    # signature occurrence histogram for the bin map (replaces the
    # reference's separate stage-0 sampling pass: the map is only needed at
    # finalize here, so it is a side product of ingest over the FULL input)
    map_len = sig_hist.shape[0] - 1
    hslot = jnp.minimum(sig_pos, jnp.uint32(map_len)).astype(jnp.int32)
    sig_hist = sig_hist.at[hslot].add(1)

    wl = _kmer_words(p, q, k, s, both_strands)
    words = jnp.stack(
        [jnp.where(valid, w, jnp.uint32(0xFFFFFFFF)) for w in wl], axis=1
    )
    occ_acc = _acc64_add(occ_acc, jnp.sum(valid.astype(jnp.uint32)))
    store_sig = jax.lax.dynamic_update_slice(store_sig, sig_pos, (n_used,))
    store_words = jax.lax.dynamic_update_slice(store_words, words, (n_used, 0))
    return (store_sig, store_words, n_used + s, occ_acc, skm_acc,
            sig_pos[-1:], sig_hist)


@functools.partial(jax.jit, donate_argnums=(0, 1, 2, 7))
def _append(store_sig, store_words, store_counts, n_used, sig, words, counts,
            occ_acc):
    """External append (checkpoint resume / spill replay); counts column
    must already exist."""
    dead = counts == 0
    sig = jnp.where(dead, INVALID_SIG, sig)
    words = jnp.where(dead[:, None], jnp.uint32(0xFFFFFFFF), words)
    store_sig = jax.lax.dynamic_update_slice(store_sig, sig, (n_used,))
    store_words = jax.lax.dynamic_update_slice(store_words, words, (n_used, 0))
    store_counts = jax.lax.dynamic_update_slice(store_counts, counts, (n_used,))
    occ_acc = _acc64_add(occ_acc, jnp.sum(counts, dtype=jnp.uint32))
    return store_sig, store_words, store_counts, n_used + words.shape[0], occ_acc


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


def _live_mask(store_sig, store_counts, n_used):
    """Row liveness: INVALID_SIG marks dead rows; additionally counts>0 when
    the counts column exists."""
    X = store_sig.shape[0]
    idx = jnp.arange(X, dtype=jnp.int32)
    live = (idx < n_used) & (store_sig != INVALID_SIG)
    if store_counts is not None:
        live = live & (store_counts > 0)
    return live


def _compact_core(store_sig, store_words, store_counts, n_used, wide=False):
    """Merge duplicate k-mers.  Grouping key is (sig, words): sig is a
    function of the k-mer so groups are unchanged, and putting it first
    makes live rows sort to a prefix (dead rows carry INVALID_SIG), enabling
    the unit-count fast path and keeping sig without a payload column."""
    X, W = store_words.shape
    idx = jnp.arange(X, dtype=jnp.int32)
    live = _live_mask(store_sig, store_counts, n_used)
    sig = jnp.where(live, store_sig, INVALID_SIG)
    words = jnp.where(live[:, None], store_words, jnp.uint32(0xFFFFFFFF))
    key_cols = [sig] + [words[:, t] for t in range(W)]
    if store_counts is None:
        n_live = jnp.sum(live.astype(jnp.int32))
        keys_r, _, totals, n_groups = _group_reduce(key_cols, [], None, n_live)
    else:
        counts = jnp.where(live, store_counts, 0)
        keys_r, _, totals, n_groups = _group_reduce(key_cols, [], counts,
                                                    wide=wide)
    group_valid = (idx < n_groups) & (totals > 0)
    out_sig = jnp.where(group_valid, keys_r[0], INVALID_SIG)
    out_words = jnp.where(
        group_valid[:, None], jnp.stack(keys_r[1:], axis=1), jnp.uint32(0xFFFFFFFF)
    )
    out_counts = jnp.where(group_valid, totals, 0).astype(jnp.uint32)
    return out_sig, out_words, out_counts, n_groups


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _compact_unit(store_sig, store_words, n_used):
    return _compact_core(store_sig, store_words, None, n_used)


@functools.partial(jax.jit, static_argnames=("wide",), donate_argnums=(0, 1, 2))
def _compact_counted(store_sig, store_words, store_counts, n_used, wide=False):
    return _compact_core(store_sig, store_words, store_counts, n_used, wide=wide)


def _finalize_core(
    store_sig,
    store_words,
    store_counts,
    n_used,
    sig_map,
    *,
    cutoff_min: int,
    cutoff_max: int,
    counter_max: int,
    k: int,
    lut_prefix_len: int,
    counter_size: int,
    n_bins: int,
    wide: bool = False,
):
    """Device completer (reference CKmerBinCompleter, kb_completer.cpp:
    59-223): group by (bin, k-mer), merge, and emit the exact on-disk
    suffix+counter record bytes and the per-(bin, prefix) LUT histogram —
    the host only writes buffers.

    Returns (cols: list of big-endian u32 record-byte columns, keep_bits,
    lut u32[lut_size], n_groups, stats)."""
    X, W = store_words.shape
    idx = jnp.arange(X, dtype=jnp.int32)
    live = _live_mask(store_sig, store_counts, n_used)
    words = jnp.where(live[:, None], store_words, jnp.uint32(0xFFFFFFFF))
    map_len = sig_map.shape[0]
    sig_idx = jnp.minimum(store_sig, map_len - 1).astype(jnp.int32)
    # clamp dead rows' bin to n_bins: sorts after every real bin and leaves
    # headroom to fuse the bin id into the spare top bits of lane 0
    bins = jnp.where(live, sig_map[sig_idx].astype(jnp.uint32), jnp.uint32(n_bins))

    r0 = k - 16 * (W - 1)  # bases in lane 0
    bin_bits = int(n_bins + 1).bit_length()
    fuse = (2 * r0 + bin_bits) <= 32
    if fuse:
        # (bin, k-mer) order with one fewer sort column: bin rides the
        # spare top bits of lane 0
        fused0 = (bins << (2 * r0)) | jnp.where(
            live, words[:, 0], jnp.uint32((1 << (2 * r0)) - 1)
        )
        key_cols = [fused0] + [words[:, t] for t in range(1, W)]
    else:
        key_cols = [bins] + [words[:, t] for t in range(W)]

    if store_counts is None:
        n_live = jnp.sum(live.astype(jnp.int32))
        keys_r, _, totals, n_groups = _group_reduce(key_cols, [], None, n_live)
    else:
        counts = jnp.where(live, store_counts, 0)
        keys_r, _, totals, n_groups = _group_reduce(key_cols, [], counts,
                                                    wide=wide)
    if fuse:
        bins_r = keys_r[0] >> (2 * r0)
        wr = [keys_r[0] & jnp.uint32((1 << (2 * r0)) - 1)] + list(keys_r[1:])
    else:
        bins_r = keys_r[0]
        wr = list(keys_r[1:])
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

    cols = []
    for c0 in range(0, record_bytes, 4):
        col = jnp.zeros((X,), jnp.uint32)
        for j in range(c0, min(c0 + 4, record_bytes)):
            col = col | (rec_byte(j) << (8 * (3 - (j - c0))))
        cols.append(col)

    # --- keep bitmap (MSB-first, np.unpackbits-compatible), 1-D math ------
    keep_u = keep.astype(jnp.uint32)
    keep_bits = jnp.zeros((X // 8,), jnp.uint32)
    for j in range(8):
        keep_bits = keep_bits | (keep_u[j::8] << (7 - j))
    keep_bits = keep_bits.astype(jnp.uint8)

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


_FIN_STATICS = (
    "cutoff_min", "cutoff_max", "counter_max", "k",
    "lut_prefix_len", "counter_size", "n_bins", "wide",
)


@functools.partial(jax.jit, static_argnames=_FIN_STATICS, donate_argnums=(0, 1))
def _finalize_records_unit(store_sig, store_words, n_used, sig_map, **kw):
    return _finalize_core(store_sig, store_words, None, n_used, sig_map, **kw)


@functools.partial(jax.jit, static_argnames=_FIN_STATICS, donate_argnums=(0, 1, 2))
def _finalize_records_counted(store_sig, store_words, store_counts, n_used,
                              sig_map, **kw):
    return _finalize_core(store_sig, store_words, store_counts, n_used,
                          sig_map, **kw)


def _finalize_rows_core(store_sig, store_words, store_counts, n_used, sig_map,
                        *, cutoff_min, cutoff_max, wide=False):
    """Words-path finalize (KFF output / without_output): groups in (bin,
    k-mer) order with raw totals; cutoffs applied host-side."""
    X, W = store_words.shape
    idx = jnp.arange(X, dtype=jnp.int32)
    live = _live_mask(store_sig, store_counts, n_used)
    words = jnp.where(live[:, None], store_words, jnp.uint32(0xFFFFFFFF))
    map_len = sig_map.shape[0]
    sig_idx = jnp.minimum(store_sig, map_len - 1).astype(jnp.int32)
    bins = jnp.where(live, sig_map[sig_idx].astype(jnp.uint32), jnp.uint32(0xFFFFFFFF))

    key_cols = [bins] + [words[:, t] for t in range(W)]
    if store_counts is None:
        n_live = jnp.sum(live.astype(jnp.int32))
        keys_r, _, totals, n_groups = _group_reduce(key_cols, [], None, n_live)
    else:
        counts = jnp.where(live, store_counts, 0)
        keys_r, _, totals, n_groups = _group_reduce(key_cols, [], counts,
                                                    wide=wide)
    bins_r = keys_r[0]
    group_valid = (idx < n_groups) & (totals > 0) & (bins_r != jnp.uint32(0xFFFFFFFF))
    n_unique = jnp.sum(group_valid.astype(jnp.int32))
    n_below = jnp.sum((group_valid & (totals < cutoff_min)).astype(jnp.int32))
    n_above = jnp.sum((group_valid & (totals > cutoff_max)).astype(jnp.int32))
    out_words = jnp.stack(keys_r[1:], axis=1)
    out_bins = jnp.where(group_valid, bins_r, jnp.uint32(0xFFFFFFFF)).astype(jnp.int32)
    out_counts = jnp.where(group_valid, totals, 0)
    return out_bins, out_words, out_counts, n_groups, (n_unique, n_below, n_above)


_ROWS_STATICS = ("cutoff_min", "cutoff_max", "wide")


@functools.partial(jax.jit, static_argnames=_ROWS_STATICS, donate_argnums=(0, 1))
def _finalize_rows_unit(store_sig, store_words, n_used, sig_map, **kw):
    return _finalize_rows_core(store_sig, store_words, None, n_used, sig_map, **kw)


@functools.partial(jax.jit, static_argnames=_ROWS_STATICS, donate_argnums=(0, 1, 2))
def _finalize_rows_counted(store_sig, store_words, store_counts, n_used,
                           sig_map, **kw):
    return _finalize_rows_core(store_sig, store_words, store_counts, n_used,
                               sig_map, **kw)


class DeviceKmerStore:
    """HBM store of (signature, k-mer lanes[, counts]) rows (see module
    docstring)."""

    def __init__(self, capacity_rows: int, kmer_words: int,
                 initial_rows: int | None = None):
        """capacity_rows is the HBM budget cap; the store starts small and
        grows 4x on demand (each growth recompiles the big kernels, 30-90s
        over the tunnel — TPU runs pass initial_rows=capacity to stay
        shape-stable)."""
        def _r8(x):  # keep-bit packing needs row counts divisible by 8
            return (int(x) + 7) & ~7

        self.max_capacity = _r8(capacity_rows)
        self.W = int(kmer_words)
        self.capacity = min(self.max_capacity, _r8(initial_rows or (1 << 20)))
        # slack rows let ingest continue while a compaction's result size is
        # still in flight (the appends are device-ordered after the compact,
        # and land within capacity+slack even in the worst case).  Default 0:
        # the extra rows widen every sort, which measured slightly worse than
        # the overlap gain on the bench workload; set KMC_TPU_STORE_SLACK_DIV
        # (capacity/div rows) to experiment.
        import os as _os

        div = int(_os.environ.get("KMC_TPU_STORE_SLACK_DIV", "0"))
        self._slack = _r8(self.capacity // div) if div else 0
        self._pending_base = None
        self._pending_appends = 0
        self.counts = None  # materialized by the first compaction
        self._alloc(self.capacity + self._slack, with_counts=False)
        self.n_used = jnp.int32(0)
        self.occ_acc = jnp.zeros((2,), jnp.uint32)  # (lo, hi) occurrences
        self.skm_acc = jnp.zeros((2,), jnp.uint32)  # (lo, hi) super-k-mers
        self.prev_sig = jnp.full((1,), INVALID_SIG, jnp.uint32)
        self._since_compact = 0
        self.spilled = []  # host-side spilled compacted (sig, words, counts)
        self.total_appended_rows = 0
        # conservative host-side bound on total occurrences (every ingest
        # position contributes at most 1); selects the wide group-reduce
        # when a single call could see >= 2^31 occurrences, with no device
        # sync on the hot path
        self._occ_upper = 0
        self.sig_hist = None  # lazily sized from sig_len at first ingest
        self.k = None  # learned at first ingest / append

    def _alloc(self, capacity, with_counts):
        self.sig = jnp.full((capacity,), INVALID_SIG, jnp.uint32)
        self.words = jnp.full((capacity, self.W), 0xFFFFFFFF, jnp.uint32)
        self.counts = jnp.zeros((capacity,), jnp.uint32) if with_counts else None

    def _grow(self, needed_rows: int):
        new_cap = self.capacity
        while new_cap < needed_rows:
            new_cap *= 4
        new_cap = min(new_cap, self.max_capacity)
        if new_cap <= self.capacity:
            return False
        old_sig, old_words, old_counts, old_n = (
            self.sig, self.words, self.counts, self.n_used)
        self.capacity = new_cap
        self._alloc(new_cap + self._slack, with_counts=old_counts is not None)
        self.sig = jax.lax.dynamic_update_slice(self.sig, old_sig, (0,))
        self.words = jax.lax.dynamic_update_slice(self.words, old_words, (0, 0))
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
                self.compact()
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
        live = _live_mask(self.sig, None, self.n_used)
        self.counts = live.astype(jnp.uint32)

    def ingest_packed(self, packed, mask, *, s: int, k: int, sig_len: int,
                      both_strands: bool):
        """Fused extract+append of one 2-bit-packed batch (one dispatch);
        also accumulates the signature histogram for the bin map."""
        self.k = k
        self.total_appended_rows += s
        self._occ_upper += s
        self._make_room(s)
        if self.sig_hist is None:
            from ..signatures import map_size

            self.sig_hist = jnp.zeros((map_size(sig_len) + 1,), jnp.uint32)
        if self.counts is not None:
            # rare: ingest after a compaction/resume materialized counts —
            # pad the new raw rows with unit counts
            self._ingest_into_counted(packed, mask, s=s, k=k, sig_len=sig_len,
                                      both_strands=both_strands)
        else:
            (self.sig, self.words, self.n_used, self.occ_acc, self.skm_acc,
             self.prev_sig, self.sig_hist) = _ingest(
                packed, mask, self.sig, self.words, self.n_used, self.occ_acc,
                self.skm_acc, self.prev_sig, self.sig_hist,
                s=s, k=k, sig_len=sig_len, both_strands=both_strands)
        self._since_compact += s

    def _ingest_into_counted(self, packed, mask, *, s, k, sig_len, both_strands):
        (self.sig, self.words, self.n_used, self.occ_acc, self.skm_acc,
         self.prev_sig, self.sig_hist) = _ingest(
            packed, mask, self.sig, self.words, self.n_used, self.occ_acc,
            self.skm_acc, self.prev_sig, self.sig_hist,
            s=s, k=k, sig_len=sig_len, both_strands=both_strands)
        # unit counts for the fresh rows
        ones = jnp.ones((s,), jnp.uint32)
        start = self.n_used - s
        self.counts = jax.lax.dynamic_update_slice(self.counts, ones, (start,))

    def append(self, sig, words, counts, k: int, count_occurrences: bool = True):
        """External append of merged (sig, words, counts) rows."""
        self.k = k
        n = words.shape[0]
        self.total_appended_rows += n
        self._occ_upper += int(np.asarray(counts, dtype=np.uint64).sum())
        self._make_room(n)
        self._materialize_counts()
        acc = self.occ_acc if count_occurrences else jnp.zeros((2,), jnp.uint32)
        self.sig, self.words, self.counts, self.n_used, acc = _append(
            self.sig, self.words, self.counts, self.n_used,
            jnp.asarray(sig), jnp.asarray(words), jnp.asarray(counts), acc)
        if count_occurrences:
            self.occ_acc = acc
        self._since_compact += n

    def sig_histogram(self) -> np.ndarray:
        """Accumulated per-signature k-mer occurrence counts (map_size
        entries; the trailing invalid slot is dropped)."""
        return np.asarray(self.sig_hist[:-1], dtype=np.uint64)

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

    def compact(self, blocking: bool = False):
        if self.counts is None:
            self.sig, self.words, self.counts, self.n_used = _compact_unit(
                self.sig, self.words, self.n_used)
        else:
            self.sig, self.words, self.counts, self.n_used = _compact_counted(
                self.sig, self.words, self.counts, self.n_used,
                wide=self._wide())
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
            (np.asarray(self.sig[:n]), np.asarray(self.words[:n]),
             np.asarray(self.counts[:n]))
        )
        self._alloc(self.capacity, with_counts=True)
        self.n_used = jnp.int32(0)
        self._base = 0
        self._since_compact = 0

    def _replay_spills(self):
        if not self.spilled:
            return
        self._materialize_counts()
        for sig, words, counts in self.spilled:
            pos = 0
            while pos < len(words):
                room = self.capacity - max(self._base_rows(), int(self.n_used))
                if room <= 0:
                    raise MemoryError(
                        "device store too small for unique k-mer set; "
                        "use the host-staged pipeline (device_store=False)"
                    )
                take = min(room, len(words) - pos)
                # occurrences were already accumulated at first append
                self.sig, self.words, self.counts, self.n_used, _ = _append(
                    self.sig, self.words, self.counts, self.n_used,
                    jnp.asarray(sig[pos : pos + take]),
                    jnp.asarray(words[pos : pos + take]),
                    jnp.asarray(counts[pos : pos + take]),
                    jnp.zeros((2,), jnp.uint32),
                )
                pos += take
        self.spilled = []

    # -- checkpoint / resume (SURVEY.md §5.4: stage-1 state is the natural
    # checkpoint; the reference's analogue is its tmp bin files + CBinDesc) --
    def save_checkpoint(self, path: str):
        """Compact, then persist the store's valid prefix to an .npz."""
        self.compact(blocking=True)
        n = self._base
        np.savez_compressed(
            path,
            sig=np.asarray(self.sig[:n]),
            words=np.asarray(self.words[:n]),
            counts=np.asarray(self.counts[:n]),
            occ=np.asarray(self.occ_acc),
            skm=np.asarray(self.skm_acc),
            sig_hist=(np.asarray(self.sig_hist)
                      if self.sig_hist is not None else np.zeros(0, np.uint32)),
            k=np.asarray(self.k or 0),
            spilled=np.asarray(len(self.spilled)),
        )
        for i, (s_, w_, c_) in enumerate(self.spilled):
            np.savez_compressed(f"{path}.spill{i}", sig=s_, words=w_, counts=c_)

    @classmethod
    def load_checkpoint(cls, path: str, capacity_rows: int):
        data = np.load(path if str(path).endswith(".npz") else path + ".npz")
        n = len(data["words"])
        W = data["words"].shape[1]
        store = cls(max(capacity_rows, 2 * max(n, 1)), W,
                    initial_rows=max(2 * n, 1 << 10))
        store.append(data["sig"], data["words"], data["counts"],
                     k=int(data["k"]), count_occurrences=False)
        store.occ_acc = jnp.asarray(data["occ"])
        store.skm_acc = jnp.asarray(data["skm"])
        if len(data["sig_hist"]):
            store.sig_hist = jnp.asarray(data["sig_hist"])
        for i in range(int(data["spilled"])):
            sp = np.load(f"{path}.spill{i}.npz")
            store.spilled.append((sp["sig"], sp["words"], sp["counts"]))
        return store

    def finalize_records(
        self,
        sig_map: np.ndarray,
        *,
        cutoff_min: int,
        cutoff_max: int,
        counter_max: int,
        k: int,
        lut_prefix_len: int,
        counter_size: int,
        n_bins: int,
        sig_len: int | None = None,  # accepted for API compat; unused
    ):
        """Device-completer finalize: returns (rec_bytes (N, RB) u8 in final
        record order already cutoff-filtered, lut uint64[(n_bins<<2*lpl)],
        stats tuple).  See _finalize_core."""
        import time as _time

        self._replay_spills()
        sm = jnp.asarray(sig_map.astype(np.int32))
        kw = dict(
            cutoff_min=cutoff_min, cutoff_max=cutoff_max,
            counter_max=counter_max, k=k,
            lut_prefix_len=lut_prefix_len, counter_size=counter_size,
            n_bins=n_bins,
        )
        t0 = _time.perf_counter()
        if self.counts is None:
            cols, keep_bits, lut, n_groups, stats = _finalize_records_unit(
                self.sig, self.words, self.n_used, sm, **kw)
        else:
            cols, keep_bits, lut, n_groups, stats = _finalize_records_counted(
                self.sig, self.words, self.counts, self.n_used, sm,
                wide=self._wide(), **kw)
        n = int(n_groups)  # sync point
        self.t_finalize_exec = _time.perf_counter() - t0
        t0 = _time.perf_counter()
        nb = (n + 7) // 8
        # start all D2H copies before consuming any (pipelines the transfers)
        slices = [keep_bits[:nb]] + [c[:n] for c in cols] + [lut]
        for a in slices:
            try:
                a.copy_to_host_async()
            except AttributeError:
                pass
        keep_h = np.unpackbits(np.asarray(slices[0]))[:n].astype(bool)
        suffix_bytes = (k - lut_prefix_len) // 4 if lut_prefix_len else (k + 3) // 4
        record_bytes = suffix_bytes + counter_size
        rec_h = np.empty((n, 4 * len(cols)), dtype=np.uint8)
        for j, c in enumerate(slices[1:-1]):
            rec_h[:, 4 * j : 4 * j + 4] = (
                np.asarray(c).astype(">u4").view(np.uint8).reshape(n, 4)
            )
        rec_h = rec_h[:, :record_bytes]
        lut_h = np.asarray(slices[-1]).astype(np.uint64)
        self.t_finalize_d2h = _time.perf_counter() - t0
        self.sig = self.words = self.counts = None
        return np.ascontiguousarray(rec_h[keep_h]), lut_h, tuple(int(x) for x in stats)

    def finalize(self, sig_map: np.ndarray, cutoff_min: int, cutoff_max: int,
                 counter_max: int, *, k: int | None = None,
                 sig_len: int | None = None):
        """Returns (bins, words, counts, stats) as host arrays in final DB
        record order (KFF / no-output paths)."""
        import time as _time

        self._replay_spills()
        sm = jnp.asarray(sig_map.astype(np.int32))
        kw = dict(cutoff_min=cutoff_min, cutoff_max=cutoff_max)
        t0 = _time.perf_counter()
        if self.counts is None:
            g_bins, g_words, g_counts, n_groups, stats = _finalize_rows_unit(
                self.sig, self.words, self.n_used, sm, **kw)
        else:
            g_bins, g_words, g_counts, n_groups, stats = _finalize_rows_counted(
                self.sig, self.words, self.counts, self.n_used, sm,
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
        self.sig = self.words = self.counts = None
        return out
