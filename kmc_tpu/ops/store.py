"""HBM-resident k-mer store: the TPU replacement for KMC's temp-file bins.

The reference spills stage-1 super-k-mers to per-bin temp files and reads
them back for stage 2 (kb_storer.cpp, kb_reader.h).  On TPU the same role is
played by one large device-resident array set (a log-structured merge store):

  append   stage-1 batch outputs are appended in O(1) (donated buffers, a
           dynamic_update_slice — no host round-trip);
  compact  when full, one sort + run-length merge folds duplicates
           (amortized O(log) passes over the data, entirely in HBM);
  finalize one sort by (bin, k-mer) + segment-sum + cutoff filter produces
           the exact on-disk record order of a KMC2 database in one pass.

Host transfers happen only at finalize (or on spill when the unique set
exceeds the HBM budget), which matters doubly here: the dev tunnel has
~100ms D2H latency per fetch.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .extract import INVALID_SIG, _stage1_core, _unpack_device, position_sigs


def _acc64_add(acc, inc_u32):
    """Add a uint32 increment into a 2-lane (lo, hi) uint32 accumulator."""
    lo = acc[0] + inc_u32
    hi = acc[1] + (lo < acc[0]).astype(jnp.uint32)
    return jnp.stack([lo, hi])


@functools.partial(
    jax.jit,
    static_argnames=("s", "k", "sig_len", "both_strands", "dedup"),
    donate_argnums=(2, 3, 4, 6, 7, 9),
)
def _ingest_packed(
    packed,
    mask,
    store_sig,
    store_words,
    store_counts,
    n_used,
    occ_acc,
    skm_acc,
    prev_sig,
    sig_hist,
    *,
    s: int,
    k: int,
    sig_len: int,
    both_strands: bool,
    dedup: bool = False,
):
    """Fused stage-1 + append: one device dispatch per input batch (the
    tunnel's per-dispatch latency dominates at small batch sizes, so the
    extract kernel and the store update must ride one executable).

    dedup=False appends one raw row per position (counts 1/0) — in-batch
    duplication is low at genome scale, and the store compaction merges
    duplicates anyway, so skipping the per-batch sort/RLE is a large win.
    dedup=True runs the full per-batch sort+RLE (useful for tiny
    high-duplication inputs).

    Also counts super-k-mers exactly: a new super-k-mer starts at every valid
    position whose signature differs from its predecessor's (the reference's
    cut rule, splitter.cpp:557-677); prev_sig carries the last position's
    signature across batches.
    """
    c4, bad = _unpack_device(packed, mask)
    valid, sig_pos, p, q = position_sigs(c4, bad, s=s, k=k, sig_len=sig_len)
    prev = jnp.concatenate([prev_sig, sig_pos[:-1]])
    new_skm = (sig_pos != INVALID_SIG) & (sig_pos != prev)
    skm_acc = _acc64_add(skm_acc, jnp.sum(new_skm.astype(jnp.uint32)))

    # signature occurrence histogram for the bin map (replaces the
    # reference's separate stage-0 sampling pass, splitter.cpp:439-533: the
    # map is only needed at finalize here, so it can be built from the FULL
    # input as a side product of ingest)
    map_len = sig_hist.shape[0] - 1
    hslot = jnp.minimum(sig_pos, jnp.uint32(map_len)).astype(jnp.int32)
    sig_hist = sig_hist.at[hslot].add(1)

    if dedup:
        sig, words, counts, _ = _stage1_core(
            c4, bad, s=s, k=k, sig_len=sig_len, both_strands=both_strands
        )
        counts = jnp.where(sig == INVALID_SIG, 0, counts)
        words = jnp.where((sig == INVALID_SIG)[:, None], jnp.uint32(0xFFFFFFFF), words)
    else:
        from .extract import _kmer_words

        sig = sig_pos
        wl = _kmer_words(p, q, k, s, both_strands)
        words = jnp.stack(
            [jnp.where(valid, w, jnp.uint32(0xFFFFFFFF)) for w in wl], axis=1
        )
        counts = valid.astype(jnp.uint32)
    store_sig = jax.lax.dynamic_update_slice(store_sig, sig, (n_used,))
    store_words = jax.lax.dynamic_update_slice(store_words, words, (n_used, 0))
    store_counts = jax.lax.dynamic_update_slice(store_counts, counts, (n_used,))
    occ_acc = _acc64_add(occ_acc, jnp.sum(counts, dtype=jnp.uint32))
    return (
        store_sig,
        store_words,
        store_counts,
        n_used + sig.shape[0],
        occ_acc,
        skm_acc,
        sig_pos[-1:],
        sig_hist,
    )


@functools.partial(jax.jit, donate_argnums=(0, 1, 2, 7))
def _append(store_sig, store_words, store_counts, n_used, sig, words, counts, occ_acc):
    # garbage-fill rows of a stage-1 batch (beyond its n_groups) and invalid
    # k-mer groups carry INVALID_SIG; zeroing their counts makes them inert
    # (they merge into real groups adding 0, or form zero-total groups)
    counts = jnp.where(sig == INVALID_SIG, 0, counts)
    words = jnp.where((sig == INVALID_SIG)[:, None], jnp.uint32(0xFFFFFFFF), words)
    store_sig = jax.lax.dynamic_update_slice(store_sig, sig, (n_used,))
    store_words = jax.lax.dynamic_update_slice(store_words, words, (n_used, 0))
    store_counts = jax.lax.dynamic_update_slice(store_counts, counts, (n_used,))
    # 64-bit occurrence accumulator in two uint32 lanes (x64 stays off)
    batch_occ = jnp.sum(counts, dtype=jnp.uint32)
    lo = occ_acc[0] + batch_occ
    hi = occ_acc[1] + (lo < occ_acc[0]).astype(jnp.uint32)
    occ_acc = jnp.stack([lo, hi])
    return store_sig, store_words, store_counts, n_used + sig.shape[0], occ_acc


def _group_reduce(key_cols, payload_cols, counts=None, n_live=None):
    """Sort rows by key_cols, merge equal-key runs, compact group
    representatives to the front — using ONLY sorts and scans (scatter /
    gather / nonzero cost seconds at 64M rows on this part; two extra sort
    passes cost ~0.5s).

    The trick: after the grouping sort, each group's total is the difference
    of the running count prefix-sum (B) at consecutive group starts, and a
    second sort on (is-group-start, B) pulls the group representatives to the
    front in order — B is strictly increasing across starts of nonempty
    groups, so no stability is needed.

    counts: per-row weights; pass counts=None with n_live=<traced scalar>
    when every live row weighs 1 and live rows sort to a prefix (unit-count
    fast path: the prefix-sum is just min(i+1, n_live) and the sort carries
    one less column).

    Returns (sorted_key_cols_of_reps, sorted_payload_cols_of_reps, totals,
    n_groups); all X-sized, rows [0, n_groups) are the groups in key order,
    the rest is garbage.  counts must sum below 2^31 per call (the flag bit
    rides bit 31 of the prefix sum); the spill machinery bounds this.
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

    # single sort key: the group-start flag rides bit 31 of the prefix-sum
    # (totals per _group_reduce call are < 2^31, see docstring)
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


@functools.partial(jax.jit, static_argnames=("unit_counts",), donate_argnums=(0, 1, 2))
def _compact(store_sig, store_words, store_counts, n_used, *, unit_counts=False):
    """Merge duplicate k-mers in the store; returns compacted arrays and the
    new row count (valid rows are a prefix; the rest is inert padding).

    Grouping key is (sig, words): sig is a function of the k-mer so groups
    are unchanged, and putting it first makes live rows sort to a prefix
    (dead rows carry INVALID_SIG), enabling the unit-count fast path and
    recovering sig without a payload column."""
    X, W = store_words.shape
    idx = jnp.arange(X, dtype=jnp.int32)
    live = (idx < n_used) & (store_counts > 0)
    sig = jnp.where(live, store_sig, INVALID_SIG)
    words = jnp.where(live[:, None], store_words, jnp.uint32(0xFFFFFFFF))
    key_cols = [sig] + [words[:, t] for t in range(W)]

    if unit_counts:
        n_live = jnp.sum(live.astype(jnp.int32))
        keys_r, _, totals, n_groups = _group_reduce(key_cols, [], None, n_live)
    else:
        counts = jnp.where(live, store_counts, 0)
        keys_r, _, totals, n_groups = _group_reduce(key_cols, [], counts)
    in_range = idx < n_groups
    group_valid = in_range & (totals > 0)
    out_sig = jnp.where(group_valid, keys_r[0], INVALID_SIG)
    out_words = jnp.where(
        group_valid[:, None], jnp.stack(keys_r[1:], axis=1), jnp.uint32(0xFFFFFFFF)
    )
    out_counts = jnp.where(group_valid, totals, 0).astype(jnp.uint32)
    return out_sig, out_words, out_counts, n_groups


@functools.partial(
    jax.jit,
    static_argnames=("cutoff_min", "cutoff_max"),
    donate_argnums=(0, 1, 2),
)
def _finalize(
    store_sig,
    store_words,
    store_counts,
    n_used,
    sig_map,
    *,
    cutoff_min: int,
    cutoff_max: int,
):
    """Produce the exact KMC2 record order: sort by (bin, k-mer), merge
    counts, compact group reps to the front (sort+scan only — see
    _group_reduce).  Cutoff *stats* are computed here; the host drops the
    below/above rows while writing (they are few)."""
    X, W = store_words.shape
    idx = jnp.arange(X, dtype=jnp.int32)
    live = (idx < n_used) & (store_sig != INVALID_SIG) & (store_counts > 0)
    counts = jnp.where(live, store_counts, 0)
    words = jnp.where(live[:, None], store_words, jnp.uint32(0xFFFFFFFF))
    map_len = sig_map.shape[0]
    sig_idx = jnp.minimum(store_sig, map_len - 1).astype(jnp.int32)
    bins = jnp.where(live, sig_map[sig_idx].astype(jnp.uint32), jnp.uint32(0xFFFFFFFF))

    keys_r, _, totals, n_groups = _group_reduce(
        [bins] + [words[:, t] for t in range(W)], [], counts
    )
    bins_r = keys_r[0]
    group_valid = (
        (idx < n_groups) & (totals > 0) & (bins_r != jnp.uint32(0xFFFFFFFF))
    )
    n_unique = jnp.sum(group_valid.astype(jnp.int32))
    n_below = jnp.sum((group_valid & (totals < cutoff_min)).astype(jnp.int32))
    n_above = jnp.sum((group_valid & (totals > cutoff_max)).astype(jnp.int32))
    out_words = jnp.stack(keys_r[1:], axis=1)
    out_bins = jnp.where(group_valid, bins_r, jnp.uint32(0xFFFFFFFF)).astype(jnp.int32)
    out_counts = jnp.where(group_valid, totals, 0)
    return out_bins, out_words, out_counts, n_groups, (n_unique, n_below, n_above)


@functools.partial(
    jax.jit,
    static_argnames=(
        "cutoff_min", "cutoff_max", "counter_max", "k",
        "lut_prefix_len", "counter_size", "n_bins", "unit_counts",
    ),
    donate_argnums=(0, 1, 2),
)
def _finalize_records(
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
    unit_counts: bool = False,
):
    """Device completer: group/merge/cutoff AND emit the exact on-disk byte
    payload (reference CKmerBinCompleter, kb_completer.cpp:59-223) —
    suffix+counter record bytes and the per-(bin, prefix) LUT histogram —
    so the host only writes buffers.  This more than halves D2H bytes vs
    shipping (bins, words, counts) and removes all host-side byte packing.

    Returns (rec u8[X, RB], keep_bits u8[X/8], lut u32[(n_bins << 2*lpl)+1],
    n_groups, (n_unique, n_below, n_above)).  Rows [0, n_groups) of rec are
    the merged groups in (bin, k-mer) order; keep_bits marks (MSB-first)
    which of them survive the cutoffs.  With lut_prefix_len=0 the record
    holds the FULL k-mer bytes (KFF-shaped records).
    """
    X, W = store_words.shape
    idx = jnp.arange(X, dtype=jnp.int32)
    live = (idx < n_used) & (store_sig != INVALID_SIG) & (store_counts > 0)
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
        fused0 = (bins << (2 * r0)) | words[:, 0]
        key_cols = [fused0] + [words[:, t] for t in range(1, W)]
    else:
        key_cols = [bins] + [words[:, t] for t in range(W)]

    if unit_counts:
        n_live = jnp.sum(live.astype(jnp.int32))
        keys_r, _, totals, n_groups = _group_reduce(key_cols, [], None, n_live)
    else:
        counts = jnp.where(live, store_counts, 0)
        keys_r, _, totals, n_groups = _group_reduce(key_cols, [], counts)
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
        r0 = k - 16 * (W - 1)
        if lut_prefix_len <= r0:
            prefix = wr[0] >> (2 * (r0 - lut_prefix_len))
        else:
            need = lut_prefix_len - r0  # bases from lane 1
            prefix = (wr[0] << (2 * need)) | (wr[1] >> (2 * (16 - need)))
        prefix = prefix & jnp.uint32((1 << (2 * lut_prefix_len)) - 1)
    else:
        prefix = jnp.zeros((X,), jnp.uint32)
    lut_size = n_bins << (2 * lut_prefix_len)
    # rows are sorted by (bin, k-mer), so (bin, prefix) keys are monotone over
    # the group region; invalid/garbage rows form a suffix.  LUT counts are
    # then differences of the kept-row prefix-sum at key boundaries — a
    # searchsorted of lut_size probes instead of an X-sized scatter-add
    # (scatter at 2^28 rows costs ~3s on v5e; this is ~ms).
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


@dataclass
class DeviceStoreConfig:
    capacity_rows: int
    kmer_words: int


class DeviceKmerStore:
    """Log-structured HBM store of (signature, k-mer, partial count) rows."""

    def __init__(self, capacity_rows: int, kmer_words: int, initial_rows: int | None = None):
        """capacity_rows is the HBM budget cap; the store starts small and
        doubles on demand (log-structured growth), so tiny inputs never pay
        for a full-size sort."""
        def _r8(x):  # keep-bit packing needs row counts divisible by 8
            return (int(x) + 7) & ~7

        self.max_capacity = _r8(capacity_rows)
        self.W = int(kmer_words)
        self.capacity = min(self.max_capacity, _r8(initial_rows or (1 << 20)))
        self._alloc(self.capacity)
        self.n_used = jnp.int32(0)
        self.occ_acc = jnp.zeros((2,), jnp.uint32)  # (lo, hi) occurrence total
        self.skm_acc = jnp.zeros((2,), jnp.uint32)  # (lo, hi) super-k-mers
        self.prev_sig = jnp.full((1,), INVALID_SIG, jnp.uint32)
        self._since_compact = 0
        self.spilled = []  # host-side spilled compacted runs
        self.total_appended_rows = 0
        # True while every live row still has count 1 (only raw ingests so
        # far): enables the unit-count fast path in compact/finalize
        self._unit = True
        self.sig_hist = None  # lazily sized from sig_len at first ingest

    def _alloc(self, capacity):
        self.sig = jnp.full((capacity,), INVALID_SIG, jnp.uint32)
        self.words = jnp.full((capacity, self.W), 0xFFFFFFFF, jnp.uint32)
        self.counts = jnp.zeros((capacity,), jnp.uint32)

    def _grow(self, needed_rows: int):
        # grow 4x: every growth step recompiles the ingest/compact kernels
        # for the new shapes (30-90s each on this setup), so minimize levels;
        # TPU runs avoid growth entirely by allocating full capacity upfront
        # (see runner._run_stage1_device_store)
        new_cap = self.capacity
        while new_cap < needed_rows:
            new_cap *= 4
        new_cap = min(new_cap, self.max_capacity)
        if new_cap <= self.capacity:
            return False
        old = (self.sig, self.words, self.counts, self.n_used)
        self.capacity = new_cap
        self._alloc(new_cap)
        # splice old contents into the fresh arrays (device-side copy)
        self.sig = jax.lax.dynamic_update_slice(self.sig, old[0], (0,))
        self.words = jax.lax.dynamic_update_slice(self.words, old[1], (0, 0))
        self.counts = jax.lax.dynamic_update_slice(self.counts, old[2], (0,))
        self.n_used = old[3]
        return True

    def _make_room(self, s: int):
        if self._since_compact + s > self.capacity - self._base_rows():
            if not self._grow(self._base_rows() + self._since_compact + s):
                self.compact()
                if self._since_compact + s > self.capacity - self._base_rows():
                    if not self._grow(self._base_rows() + s):
                        self.spill()

    def append(self, sig, words, counts, count_occurrences: bool = True):
        s = sig.shape[0]
        self.total_appended_rows += s
        self._make_room(s)
        acc = self.occ_acc if count_occurrences else jnp.zeros((2,), jnp.uint32)
        self.sig, self.words, self.counts, self.n_used, acc = _append(
            self.sig, self.words, self.counts, self.n_used, sig, words, counts, acc
        )
        if count_occurrences:
            self.occ_acc = acc
        self._unit = False  # externally appended rows may carry any count
        self._since_compact += s

    def ingest_packed(self, packed, mask, *, s: int, k: int, sig_len: int,
                      both_strands: bool, dedup: bool = False):
        """Fused extract+append of one 2-bit-packed batch (one dispatch);
        also accumulates the signature histogram for the bin map."""
        self.total_appended_rows += s
        self._make_room(s)
        if self.sig_hist is None:
            from ..signatures import map_size

            self.sig_hist = jnp.zeros((map_size(sig_len) + 1,), jnp.uint32)
        (self.sig, self.words, self.counts, self.n_used, self.occ_acc,
         self.skm_acc, self.prev_sig, self.sig_hist) = _ingest_packed(
            packed, mask, self.sig, self.words, self.counts, self.n_used,
            self.occ_acc, self.skm_acc, self.prev_sig, self.sig_hist,
            s=s, k=k, sig_len=sig_len, both_strands=both_strands, dedup=dedup,
        )
        self._since_compact += s

    def sig_histogram(self) -> np.ndarray:
        """Accumulated per-signature k-mer occurrence counts (map_size
        entries; the trailing invalid slot is dropped)."""
        return np.asarray(self.sig_hist[:-1], dtype=np.uint64)

    def total_super_kmers(self) -> int:
        acc = np.asarray(self.skm_acc)
        return int(acc[0]) + (int(acc[1]) << 32)

    # -- checkpoint / resume (SURVEY.md §5.4: stage-1 state is the natural
    # checkpoint; the reference's analogue is its tmp bin files + CBinDesc) --
    def save_checkpoint(self, path: str):
        """Compact, then persist the store's valid prefix to an .npz."""
        self.compact()
        n = self._base
        np.savez_compressed(
            path,
            sig=np.asarray(self.sig[:n]),
            words=np.asarray(self.words[:n]),
            counts=np.asarray(self.counts[:n]),
            occ=np.asarray(self.occ_acc),
            skm=np.asarray(self.skm_acc),
            spilled=np.asarray(len(self.spilled)),
        )
        for i, (s_, w_, c_) in enumerate(self.spilled):
            np.savez_compressed(f"{path}.spill{i}", sig=s_, words=w_, counts=c_)

    @classmethod
    def load_checkpoint(cls, path: str, capacity_rows: int):
        data = np.load(path if str(path).endswith(".npz") else path + ".npz")
        n = len(data["sig"])
        W = data["words"].shape[1]
        store = cls(max(capacity_rows, 2 * max(n, 1)), W, initial_rows=max(2 * n, 1 << 10))
        store.append(
            jnp.asarray(data["sig"]),
            jnp.asarray(data["words"]),
            jnp.asarray(data["counts"]),
            count_occurrences=False,
        )
        store.occ_acc = jnp.asarray(data["occ"])
        store.skm_acc = jnp.asarray(data["skm"])
        for i in range(int(data["spilled"])):
            sp = np.load(f"{path}.spill{i}.npz")
            store.spilled.append((sp["sig"], sp["words"], sp["counts"]))
        return store

    def total_occurrences(self) -> int:
        acc = np.asarray(self.occ_acc)
        return int(acc[0]) + (int(acc[1]) << 32)

    def _base_rows(self) -> int:
        return getattr(self, "_base", 0)

    def compact(self):
        self.sig, self.words, self.counts, self.n_used = _compact(
            self.sig, self.words, self.counts, self.n_used,
            unit_counts=self._unit,
        )
        self._unit = False  # merged rows carry real totals now
        self._base = int(self.n_used)  # one D2H scalar per compaction
        self._since_compact = 0

    def spill(self):
        """Move the compacted store to host RAM (sorted unique run)."""
        self.compact()
        n = self._base
        self.spilled.append(
            (
                np.asarray(self.sig[:n]),
                np.asarray(self.words[:n]),
                np.asarray(self.counts[:n]),
            )
        )
        self._alloc(self.capacity)
        self.n_used = jnp.int32(0)
        self._base = 0
        self._since_compact = 0

    def _replay_spills(self):
        if not self.spilled:
            return
        # re-feed spilled runs (each is deduplicated within itself;
        # duplicates across runs merge in the final sort)
        for sig, words, counts in self.spilled:
            pos = 0
            while pos < len(sig):
                room = self.capacity - max(self._base_rows(), int(self.n_used))
                if room <= 0:
                    raise MemoryError(
                        "device store too small for unique k-mer set; "
                        "use the host-staged pipeline (device_store=False)"
                    )
                take = min(room, len(sig) - pos)
                # occurrences were already accumulated at first append
                self.sig, self.words, self.counts, self.n_used, _ = _append(
                    self.sig,
                    self.words,
                    self.counts,
                    self.n_used,
                    jnp.asarray(sig[pos : pos + take]),
                    jnp.asarray(words[pos : pos + take]),
                    jnp.asarray(counts[pos : pos + take]),
                    jnp.zeros((2,), jnp.uint32),
                )
                pos += take
        self.spilled = []

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
    ):
        """Device-completer finalize: returns (rec_bytes (N, RB) u8 in final
        record order already cutoff-filtered, lut uint64[(n_bins<<2*lpl)],
        stats tuple).  See _finalize_records."""
        import time as _time

        self._replay_spills()
        sm = jnp.asarray(sig_map.astype(np.int32))
        t0 = _time.perf_counter()
        cols, keep_bits, lut, n_groups, stats = _finalize_records(
            self.sig,
            self.words,
            self.counts,
            self.n_used,
            sm,
            cutoff_min=cutoff_min,
            cutoff_max=cutoff_max,
            counter_max=counter_max,
            k=k,
            lut_prefix_len=lut_prefix_len,
            counter_size=counter_size,
            n_bins=n_bins,
            unit_counts=self._unit,
        )
        n = int(n_groups)  # sync point
        self.t_finalize_exec = _time.perf_counter() - t0
        t0 = _time.perf_counter()
        nb = (n + 7) // 8
        keep_h = np.unpackbits(np.asarray(keep_bits[:nb]))[:n].astype(bool)
        suffix_bytes = (k - lut_prefix_len) // 4 if lut_prefix_len else (k + 3) // 4
        record_bytes = suffix_bytes + counter_size
        rec_h = np.empty((n, 4 * len(cols)), dtype=np.uint8)
        for j, c in enumerate(cols):
            rec_h[:, 4 * j : 4 * j + 4] = (
                np.asarray(c[:n]).astype(">u4").view(np.uint8).reshape(n, 4)
            )
        rec_h = rec_h[:, :record_bytes]
        lut_h = np.asarray(lut).astype(np.uint64)
        self.t_finalize_d2h = _time.perf_counter() - t0
        self.sig = self.words = self.counts = None
        return np.ascontiguousarray(rec_h[keep_h]), lut_h, tuple(int(x) for x in stats)

    def finalize(self, sig_map: np.ndarray, cutoff_min: int, cutoff_max: int, counter_max: int):
        """Returns (bins, words, counts, stats) as host arrays in final DB
        record order.  Spilled runs are merged back through the device in
        chunks."""
        self._replay_spills()
        import time as _time

        sm = jnp.asarray(sig_map.astype(np.int32))
        t0 = _time.perf_counter()
        g_bins, g_words, g_counts, n_groups, stats = _finalize(
            self.sig,
            self.words,
            self.counts,
            self.n_used,
            sm,
            cutoff_min=cutoff_min,
            cutoff_max=cutoff_max,
        )
        n = int(n_groups)  # sync point: device queue drains here
        self.t_finalize_exec = _time.perf_counter() - t0
        t0 = _time.perf_counter()
        bins = np.asarray(g_bins[:n])
        words = np.asarray(g_words[:n])
        totals = np.asarray(g_counts[:n])
        self.t_finalize_d2h = _time.perf_counter() - t0
        # host-side cutoff filter + clamp (the dropped rows are few; doing
        # this here keeps the device pass gather-free)
        keep = (bins >= 0) & (totals >= cutoff_min) & (totals <= cutoff_max)
        out = (
            bins[keep],
            words[keep],
            np.minimum(totals[keep], counter_max).astype(np.uint32),
            tuple(int(x) for x in stats),
        )
        # store buffers were donated to _finalize; drop handles
        self.sig = self.words = self.counts = None
        return out
