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
    static_argnames=("s", "k", "sig_len", "both_strands"),
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
):
    """Fused stage-1 + append: one device dispatch per input batch (the
    tunnel's per-dispatch latency dominates at small batch sizes, so the
    extract kernel and the store update must ride one executable).

    Also counts super-k-mers exactly: a new super-k-mer starts at every valid
    position whose signature differs from its predecessor's (the reference's
    cut rule, splitter.cpp:557-677); prev_sig carries the last position's
    signature across batches.
    """
    c4, bad = _unpack_device(packed, mask)
    _, sig_pos, _, _ = position_sigs(c4, bad, s=s, k=k, sig_len=sig_len)
    prev = jnp.concatenate([prev_sig, sig_pos[:-1]])
    new_skm = (sig_pos != INVALID_SIG) & (sig_pos != prev)
    skm_acc = _acc64_add(skm_acc, jnp.sum(new_skm.astype(jnp.uint32)))

    sig, words, counts, _ = _stage1_core(
        c4, bad, s=s, k=k, sig_len=sig_len, both_strands=both_strands
    )
    counts = jnp.where(sig == INVALID_SIG, 0, counts)
    words = jnp.where((sig == INVALID_SIG)[:, None], jnp.uint32(0xFFFFFFFF), words)
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

    ops = jax.lax.sort([words[:, t] for t in range(W)] + [sig, counts], num_keys=W)
    ws, sig_s, counts_s = ops[:W], ops[W], ops[W + 1]
    new = jnp.ones((X,), jnp.bool_)
    diff = jnp.zeros((X - 1,), jnp.bool_)
    for w in ws:
        diff = diff | (w[1:] != w[:-1])
    new = new.at[1:].set(diff)
    uid = jnp.cumsum(new.astype(jnp.int32)) - 1
    totals = jax.ops.segment_sum(counts_s, uid, num_segments=X)
    starts = jnp.nonzero(new, size=X, fill_value=X)[0]
    gidx = jnp.minimum(starts, X - 1)
    u_words = jnp.stack([w[gidx] for w in ws], axis=1)
    u_sig = sig_s[gidx]
    group_valid = (starts < X) & (totals > 0)
    n_unique = jnp.sum(group_valid.astype(jnp.int32))
    # valid groups form a prefix (all-0xFF padding sorts last)
    out_sig = jnp.where(group_valid, u_sig, INVALID_SIG)
    out_words = jnp.where(group_valid[:, None], u_words, jnp.uint32(0xFFFFFFFF))
    out_counts = jnp.where(group_valid, totals, 0).astype(jnp.uint32)
    return out_sig, out_words, out_counts, n_unique


@functools.partial(
    jax.jit,
    static_argnames=("cutoff_min", "cutoff_max", "counter_max"),
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
    counter_max: int,
):
    """One pass producing the exact KMC2 record order: sort by (bin, k-mer),
    merge counts, apply cutoffs, clamp, compact survivors to the front."""
    X, W = store_words.shape
    idx = jnp.arange(X, dtype=jnp.int32)
    live = (idx < n_used) & (store_sig != INVALID_SIG) & (store_counts > 0)
    counts = jnp.where(live, store_counts, 0)
    words = jnp.where(live[:, None], store_words, jnp.uint32(0xFFFFFFFF))
    map_len = sig_map.shape[0]
    sig_idx = jnp.minimum(store_sig, map_len - 1).astype(jnp.int32)
    bins = jnp.where(live, sig_map[sig_idx].astype(jnp.uint32), jnp.uint32(0xFFFFFFFF))

    ops = jax.lax.sort(
        [bins] + [words[:, t] for t in range(W)] + [counts], num_keys=1 + W
    )
    bins_s = ops[0]
    ws = ops[1 : 1 + W]
    counts_s = ops[1 + W]
    new = jnp.ones((X,), jnp.bool_)
    diff = bins_s[1:] != bins_s[:-1]
    for w in ws:
        diff = diff | (w[1:] != w[:-1])
    new = new.at[1:].set(diff)
    uid = jnp.cumsum(new.astype(jnp.int32)) - 1
    totals = jax.ops.segment_sum(counts_s, uid, num_segments=X)
    starts = jnp.nonzero(new, size=X, fill_value=X)[0]
    gidx = jnp.minimum(starts, X - 1)
    u_words = jnp.stack([w[gidx] for w in ws], axis=1)
    u_bins = bins_s[gidx]
    group_valid = (starts < X) & (totals > 0) & (u_bins != jnp.uint32(0xFFFFFFFF))

    n_unique = jnp.sum(group_valid.astype(jnp.int32))
    below = group_valid & (totals < cutoff_min)
    above = group_valid & (totals > cutoff_max)
    n_below = jnp.sum(below.astype(jnp.int32))
    n_above = jnp.sum(above.astype(jnp.int32))
    keep = group_valid & ~below & ~above
    kept_idx = jnp.nonzero(keep, size=X, fill_value=X)[0]
    n_kept = jnp.sum(keep.astype(jnp.int32))
    kidx = jnp.minimum(kept_idx, X - 1)
    kept_words = u_words[kidx]
    kept_counts = jnp.minimum(totals[kidx], counter_max).astype(jnp.uint32)
    kept_bins = u_bins[kidx].astype(jnp.int32)
    return kept_bins, kept_words, kept_counts, n_kept, (n_unique, n_below, n_above)


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
                      both_strands: bool):
        """Fused extract+append of one 2-bit-packed batch (one dispatch)."""
        self.total_appended_rows += s
        self._make_room(s)
        (self.sig, self.words, self.counts, self.n_used, self.occ_acc,
         self.skm_acc, self.prev_sig) = _ingest_packed(
            packed, mask, self.sig, self.words, self.counts, self.n_used,
            self.occ_acc, self.skm_acc, self.prev_sig,
            s=s, k=k, sig_len=sig_len, both_strands=both_strands,
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

    def finalize(self, sig_map: np.ndarray, cutoff_min: int, cutoff_max: int, counter_max: int):
        """Returns (bins, words, counts, stats) as host arrays in final DB
        record order.  Spilled runs are merged back through the device in
        chunks."""
        if self.spilled:
            # re-feed spilled runs (they are deduplicated within themselves;
            # duplicates across runs merge in the final sort) — if they don't
            # fit, process in multiple rounds host-merging partials
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
        sm = jnp.asarray(sig_map.astype(np.int32))
        kept_bins, kept_words, kept_counts, n_kept, stats = _finalize(
            self.sig,
            self.words,
            self.counts,
            self.n_used,
            sm,
            cutoff_min=cutoff_min,
            cutoff_max=cutoff_max,
            counter_max=counter_max,
        )
        n = int(n_kept)
        out = (
            np.asarray(kept_bins[:n]),
            np.asarray(kept_words[:n]),
            np.asarray(kept_counts[:n]),
            tuple(int(x) for x in stats),
        )
        # store buffers were donated to _finalize; drop handles
        self.sig = self.words = self.counts = None
        return out
