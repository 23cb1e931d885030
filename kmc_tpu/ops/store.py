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
    donate_argnums=(2, 3, 4, 6, 7),
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


def _group_reduce(key_cols, payload_cols, counts):
    """Sort rows by key_cols, merge equal-key runs, compact group
    representatives to the front — using ONLY sorts and scans (scatter /
    gather / nonzero cost seconds at 64M rows on this part; two extra sort
    passes cost ~0.5s).

    The trick: after the grouping sort, each group's total is the difference
    of the running count prefix-sum (B) at consecutive group starts, and a
    second sort on (is-group-start, B) pulls the group representatives to the
    front in order — B is strictly increasing across starts of nonempty
    groups, so no stability is needed.

    Returns (sorted_key_cols_of_reps, sorted_payload_cols_of_reps, totals,
    n_groups); all X-sized, rows [0, n_groups) are the groups in key order,
    the rest is garbage.  counts must sum below 2^32 per call.
    """
    X = counts.shape[0]
    n_keys = len(key_cols)
    ops = jax.lax.sort(list(key_cols) + list(payload_cols) + [counts], num_keys=n_keys)
    keys_s = ops[:n_keys]
    pays_s = ops[n_keys:-1]
    counts_s = ops[-1]

    new = jnp.ones((X,), jnp.bool_)
    diff = jnp.zeros((X - 1,), jnp.bool_)
    for c in keys_s:
        diff = diff | (c[1:] != c[:-1])
    new = new.at[1:].set(diff)
    cs = jnp.cumsum(counts_s, dtype=jnp.uint32)
    before = jnp.concatenate([jnp.zeros((1,), jnp.uint32), cs[:-1]])

    flag = jnp.where(new, jnp.uint32(0), jnp.uint32(1))
    ops2 = jax.lax.sort(
        [flag, before, *keys_s, *pays_s], num_keys=2
    )
    b2 = ops2[1]
    keys_r = ops2[2 : 2 + n_keys]
    pays_r = ops2[2 + n_keys :]
    total_all = cs[-1]
    b_next = jnp.concatenate([b2[1:], total_all[None]])
    n_groups = jnp.sum(new.astype(jnp.int32))
    in_range = jnp.arange(X, dtype=jnp.int32) < n_groups
    # the row after the last group carries garbage B; patch with grand total
    b_next = jnp.where(
        jnp.arange(X, dtype=jnp.int32) == n_groups - 1, total_all, b_next
    )
    totals = jnp.where(in_range, b_next - b2, 0)
    return keys_r, pays_r, totals, n_groups


@functools.partial(jax.jit, donate_argnums=(0, 1, 2))
def _compact(store_sig, store_words, store_counts, n_used):
    """Merge duplicate k-mers in the store; returns compacted arrays and the
    new row count (valid rows are a prefix; the rest is inert padding)."""
    X, W = store_words.shape
    idx = jnp.arange(X, dtype=jnp.int32)
    live = idx < n_used
    sig = jnp.where(live, store_sig, INVALID_SIG)
    counts = jnp.where(live, store_counts, 0)
    words = jnp.where(live[:, None], store_words, jnp.uint32(0xFFFFFFFF))

    keys_r, pays_r, totals, n_groups = _group_reduce(
        [words[:, t] for t in range(W)], [sig], counts
    )
    in_range = idx < n_groups
    group_valid = in_range & (totals > 0)
    n_unique = jnp.sum(group_valid.astype(jnp.int32))
    out_sig = jnp.where(group_valid, pays_r[0], INVALID_SIG)
    out_words = jnp.where(
        group_valid[:, None], jnp.stack(keys_r, axis=1), jnp.uint32(0xFFFFFFFF)
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
        "lut_prefix_len", "counter_size", "n_bins",
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
    counts = jnp.where(live, store_counts, 0)
    words = jnp.where(live[:, None], store_words, jnp.uint32(0xFFFFFFFF))
    map_len = sig_map.shape[0]
    sig_idx = jnp.minimum(store_sig, map_len - 1).astype(jnp.int32)
    bins = jnp.where(live, sig_map[sig_idx].astype(jnp.uint32), jnp.uint32(0xFFFFFFFF))

    keys_r, _, totals, n_groups = _group_reduce(
        [bins] + [words[:, t] for t in range(W)], [], counts
    )
    bins_r = keys_r[0]
    wr = keys_r[1:]
    group_valid = (idx < n_groups) & (totals > 0) & (bins_r != jnp.uint32(0xFFFFFFFF))
    n_unique = jnp.sum(group_valid.astype(jnp.int32))
    below = group_valid & (totals < cutoff_min)
    above = group_valid & (totals > cutoff_max)
    n_below = jnp.sum(below.astype(jnp.int32))
    n_above = jnp.sum(above.astype(jnp.int32))
    keep = group_valid & ~below & ~above

    # --- record bytes -----------------------------------------------------
    kb = (k + 3) // 4
    suffix_bytes = (k - lut_prefix_len) // 4 if lut_prefix_len else kb
    cnt = jnp.minimum(totals, counter_max)
    cols = []
    for j in range(suffix_bytes):
        t = suffix_bytes - 1 - j  # byte index from the right of the k-mer
        lane = W - 1 - (t // 4)
        sh = 8 * (t % 4)
        cols.append(((wr[lane] >> sh) & 0xFF).astype(jnp.uint8))
    for j in range(counter_size):  # little-endian counter
        cols.append(((cnt >> (8 * j)) & 0xFF).astype(jnp.uint8))
    rec = jnp.stack(cols, axis=1) if cols else jnp.zeros((X, 0), jnp.uint8)

    # --- keep bitmap (MSB-first, np.unpackbits-compatible) ----------------
    kb_bits = keep.astype(jnp.uint32).reshape(X // 8, 8)
    weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint32)
    keep_bits = jnp.sum(kb_bits * weights[None, :], axis=1).astype(jnp.uint8)

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
    key = jnp.where(
        keep,
        (bins_r << (2 * lut_prefix_len)) | prefix,
        jnp.uint32(lut_size),
    ).astype(jnp.int32)
    lut = jnp.zeros((lut_size + 1,), jnp.uint32).at[key].add(1)

    return rec, keep_bits, lut, n_groups, (n_unique, n_below, n_above)


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
        self.max_capacity = int(capacity_rows)
        self.W = int(kmer_words)
        self.capacity = min(self.max_capacity, int(initial_rows or (1 << 20)))
        self._alloc(self.capacity)
        self.n_used = jnp.int32(0)
        self.occ_acc = jnp.zeros((2,), jnp.uint32)  # (lo, hi) occurrence total
        self.skm_acc = jnp.zeros((2,), jnp.uint32)  # (lo, hi) super-k-mers
        self.prev_sig = jnp.full((1,), INVALID_SIG, jnp.uint32)
        self._since_compact = 0
        self.spilled = []  # host-side spilled compacted runs
        self.total_appended_rows = 0

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
        self._since_compact += s

    def ingest_packed(self, packed, mask, *, s: int, k: int, sig_len: int,
                      both_strands: bool, dedup: bool = False):
        """Fused extract+append of one 2-bit-packed batch (one dispatch)."""
        self.total_appended_rows += s
        self._make_room(s)
        (self.sig, self.words, self.counts, self.n_used, self.occ_acc,
         self.skm_acc, self.prev_sig) = _ingest_packed(
            packed, mask, self.sig, self.words, self.counts, self.n_used,
            self.occ_acc, self.skm_acc, self.prev_sig,
            s=s, k=k, sig_len=sig_len, both_strands=both_strands, dedup=dedup,
        )
        self._since_compact += s

    def total_super_kmers(self) -> int:
        acc = np.asarray(self.skm_acc)
        return int(acc[0]) + (int(acc[1]) << 32)

    def total_occurrences(self) -> int:
        acc = np.asarray(self.occ_acc)
        return int(acc[0]) + (int(acc[1]) << 32)

    def _base_rows(self) -> int:
        return getattr(self, "_base", 0)

    def compact(self):
        self.sig, self.words, self.counts, self.n_used = _compact(
            self.sig, self.words, self.counts, self.n_used
        )
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
        rec, keep_bits, lut, n_groups, stats = _finalize_records(
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
        )
        n = int(n_groups)  # sync point
        self.t_finalize_exec = _time.perf_counter() - t0
        t0 = _time.perf_counter()
        rec_h = np.asarray(rec[:n])
        nb = (n + 7) // 8
        keep_h = np.unpackbits(np.asarray(keep_bits[:nb]))[:n].astype(bool)
        lut_h = np.asarray(lut[:-1]).astype(np.uint64)
        self.t_finalize_d2h = _time.perf_counter() - t0
        self.sig = self.words = self.counts = None
        return rec_h[keep_h], lut_h, tuple(int(x) for x in stats)

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
