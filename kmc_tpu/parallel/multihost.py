"""Multi-chip counting pipeline over a jax.sharding.Mesh.

The single-chip design (ops/store.py) scaled out: every device ingests its
own input shard into its own row-partition of the HBM store, and at finalize
the rows move to their bin owners with ONE all_to_all over ICI, after which
each owner runs the same sort+scan group-reduce locally.  Bin ownership is
`bin % n_devices` — the TPU mapping of KMC's "bins are independent after
stage 1" property (/root/reference/kmc_core/kb_completer.cpp:130-222); the
completer's bin-ordered output is reassembled on the host by interleaving
the owners' per-bin runs.

Stages (all shard_map'd over one 'd' mesh axis):
  ingest   codes batches uint8[D, L] -> per-device raw (sig, words, count)
           rows appended to the local store partition (fused, one dispatch)
  finalize per device: map sig->bin, sort rows by owner, fixed-capacity
           all_to_all, then _group_reduce by (bin, k-mer) and cutoff stats

The host driver (distributed_count) feeds D batches per step (data
parallelism over the code stream) and writes a byte-identical KMC2 database.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.extract import INVALID_SIG, _kmer_words, _unpack_device, position_sigs
from ..ops.store import _acc64_add, _group_reduce
from .distributed import make_mesh


def _ingest_shard(packed, mask, st_sig, st_words, st_counts, n_used, occ, skm,
                  prev, *, s, k, sig_len, both_strands, n_devices, axis):
    """Per-device fused extract+append (mirrors ops/store._ingest_packed,
    without the leading device axis: shard_map strips it)."""
    c4, bad = _unpack_device(packed[0], mask[0])
    valid, sig_pos, p, q = position_sigs(c4, bad, s=s, k=k, sig_len=sig_len)
    # exact super-k-mer stats: batches are dealt round-robin, so in stream
    # order device d's batch follows device d-1's batch of the same group
    # (and device 0's follows the previous group's last device).  A ppermute
    # hands every device its predecessor's final signature; device 0 instead
    # uses the carry saved from the previous group, and saves what it
    # receives (this group's last device) as the next group's carry.
    last_sig = sig_pos[-1:]
    recv = jax.lax.ppermute(
        last_sig, axis, [(i, (i + 1) % n_devices) for i in range(n_devices)]
    )
    me = jax.lax.axis_index(axis)
    prev_use = jnp.where(me == 0, prev[0], recv)
    carry_next = recv
    prv = jnp.concatenate([prev_use, sig_pos[:-1]])
    new_skm = (sig_pos != INVALID_SIG) & (sig_pos != prv)
    skm2 = _acc64_add(skm[0], jnp.sum(new_skm.astype(jnp.uint32)))

    wl = _kmer_words(p, q, k, s, both_strands)
    words = jnp.stack(
        [jnp.where(valid, w, jnp.uint32(0xFFFFFFFF)) for w in wl], axis=1
    )
    counts = valid.astype(jnp.uint32)
    sig = sig_pos
    st_sig = jax.lax.dynamic_update_slice(st_sig[0], sig, (n_used[0],))
    st_words = jax.lax.dynamic_update_slice(st_words[0], words, (n_used[0], 0))
    st_counts = jax.lax.dynamic_update_slice(st_counts[0], counts, (n_used[0],))
    occ2 = _acc64_add(occ[0], jnp.sum(counts, dtype=jnp.uint32))
    return (
        st_sig[None],
        st_words[None],
        st_counts[None],
        (n_used[0] + s)[None],
        occ2[None],
        skm2[None],
        carry_next[None],
    )


def _finalize_shard(st_sig, st_words, st_counts, n_used, sig_map, *,
                    cutoff_min, cutoff_max, n_devices, capacity, axis,
                    wide=False):
    """Per-device: route rows to bin owners (one all_to_all), then local
    group-reduce.  Returns per-device (bins, words, totals, n_groups,
    stats, n_dropped)."""
    D = n_devices
    me = jax.lax.axis_index(axis)
    sig = st_sig[0]
    words = st_words[0]
    counts = st_counts[0]
    X, W = words.shape
    idx = jnp.arange(X, dtype=jnp.int32)
    live = (idx < n_used[0]) & (sig != INVALID_SIG) & (counts > 0)
    map_len = sig_map.shape[0]
    sig_idx = jnp.minimum(sig, map_len - 1).astype(jnp.int32)
    bins = jnp.where(live, sig_map[sig_idx].astype(jnp.uint32), jnp.uint32(0xFFFFFFFF))
    owner = jnp.where(live, (bins % D).astype(jnp.uint32), jnp.uint32(D))

    # slot rows into fixed-capacity per-owner segments (the ragged
    # all-to-all of SURVEY.md §2.6, sized like the reference's
    # n_plus_x_recs upper bound, kb_collector.h:66-116)
    ops = jax.lax.sort(
        [owner, bins] + [words[:, t] for t in range(W)] + [counts],
        num_keys=2 + W,
    )
    owner_s, bins_s = ops[0], ops[1]
    words_s = ops[2 : 2 + W]
    counts_s = ops[2 + W]
    owner_start = jnp.searchsorted(owner_s, jnp.arange(D + 1, dtype=jnp.uint32))
    pos_in_owner = idx - owner_start[jnp.minimum(owner_s, D).astype(jnp.int32)]
    in_cap = (pos_in_owner < capacity) & (owner_s < D)
    n_dropped = jnp.sum(((owner_s < D) & ~in_cap).astype(jnp.int32))

    def seg(col, fill):
        out = jnp.full((D * capacity + 1,), fill, col.dtype)
        slot = jnp.where(in_cap, owner_s.astype(jnp.int32) * capacity + pos_in_owner,
                         D * capacity)
        out = out.at[slot].set(jnp.where(in_cap, col, fill))
        return out[: D * capacity].reshape(D, capacity)

    send_bins = seg(bins_s, jnp.uint32(0xFFFFFFFF))
    send_counts = seg(counts_s, jnp.uint32(0))
    send_words = [seg(w, jnp.uint32(0xFFFFFFFF)) for w in words_s]

    # the ragged all-to-all over ICI (Pallas remote-DMA kernel on real
    # multi-chip slices; lax.all_to_all elsewhere — parallel/pallas_a2a.py)
    from .pallas_a2a import pallas_all_to_all

    recv_bins = pallas_all_to_all(send_bins, axis=axis)
    recv_counts = pallas_all_to_all(send_counts, axis=axis)
    recv_words = [pallas_all_to_all(w, axis=axis) for w in send_words]

    P_ = D * capacity
    rb = recv_bins.reshape(P_)
    rc = recv_counts.reshape(P_)
    rw = [w.reshape(P_) for w in recv_words]
    keys_r, _, totals, n_groups = _group_reduce([rb] + rw, [], rc, wide=wide)
    bins_r = keys_r[0]
    gidx = jnp.arange(P_, dtype=jnp.int32)
    group_valid = (gidx < n_groups) & (totals > 0) & (bins_r != jnp.uint32(0xFFFFFFFF))
    n_unique = jnp.sum(group_valid.astype(jnp.int32))
    n_below = jnp.sum((group_valid & (totals < cutoff_min)).astype(jnp.int32))
    n_above = jnp.sum((group_valid & (totals > cutoff_max)).astype(jnp.int32))
    out_words = jnp.stack(keys_r[1:], axis=1)
    out_bins = jnp.where(group_valid, bins_r, jnp.uint32(0xFFFFFFFF)).astype(jnp.int32)
    out_counts = jnp.where(group_valid, totals, 0)
    return (
        out_bins[None],
        out_words[None],
        out_counts[None],
        n_groups[None],
        jnp.stack([n_unique, n_below, n_above])[None],
        n_dropped[None],
    )


class ShardedKmerStore:
    """Row-partitioned HBM store across a device mesh."""

    def __init__(self, mesh: Mesh, capacity_rows_per_device: int, kmer_words: int,
                 axis: str = "d"):
        self.mesh = mesh
        self.axis = axis
        self.D = mesh.devices.size
        self.cap = int(capacity_rows_per_device)
        self.W = int(kmer_words)
        rows = NamedSharding(mesh, P(axis))
        rows2 = NamedSharding(mesh, P(axis, None))
        D, cap = self.D, self.cap
        self.sig = jax.device_put(
            jnp.full((D, cap), INVALID_SIG, jnp.uint32), rows2)
        self.words = jax.device_put(
            jnp.full((D, cap, self.W), 0xFFFFFFFF, jnp.uint32),
            NamedSharding(mesh, P(axis, None, None)))
        self.counts = jax.device_put(jnp.zeros((D, cap), jnp.uint32), rows2)
        self.n_used = jax.device_put(jnp.zeros((D,), jnp.int32), rows)
        self.occ = jax.device_put(jnp.zeros((D, 2), jnp.uint32), rows2)
        self.skm = jax.device_put(jnp.zeros((D, 2), jnp.uint32), rows2)
        self.prev = jax.device_put(
            jnp.full((D, 1), INVALID_SIG, jnp.uint32), rows2)
        self._ingest = None
        self._rows_per_device = 0

    def make_ingest(self, *, s, k, sig_len, both_strands):
        body = functools.partial(
            _ingest_shard, s=s, k=k, sig_len=sig_len, both_strands=both_strands,
            n_devices=self.D, axis=self.axis,
        )
        sharded = jax.shard_map(
            body,
            mesh=self.mesh,
            in_specs=(P(self.axis, None), P(self.axis, None),
                      P(self.axis, None), P(self.axis, None, None),
                      P(self.axis, None), P(self.axis), P(self.axis, None),
                      P(self.axis, None), P(self.axis, None)),
            out_specs=(P(self.axis, None), P(self.axis, None, None),
                       P(self.axis, None), P(self.axis), P(self.axis, None),
                       P(self.axis, None), P(self.axis, None)),
        )
        jitted = jax.jit(sharded, donate_argnums=(2, 3, 4))
        return jitted

    def ingest(self, packed_dm: np.ndarray, mask_dm: np.ndarray, *, s, k,
               sig_len, both_strands):
        """packed_dm/mask_dm: (D, L/4) and (D, L/8) — one batch per device."""
        if self._ingest is None:
            self._ingest = self.make_ingest(
                s=s, k=k, sig_len=sig_len, both_strands=both_strands)
        if self._rows_per_device + s > self.cap:
            raise MemoryError("sharded store full; raise capacity_rows_per_device")
        (self.sig, self.words, self.counts, self.n_used, self.occ, self.skm,
         self.prev) = self._ingest(
            packed_dm, mask_dm, self.sig, self.words, self.counts,
            self.n_used, self.occ, self.skm, self.prev)
        self._rows_per_device += s

    def finalize(self, sig_map: np.ndarray, *, cutoff_min, cutoff_max,
                 counter_max, capacity_per_owner: int | None = None):
        """Exchange + group-reduce; returns host arrays (bins, words, counts)
        in global (bin, k-mer) order plus stats, reassembled across owners."""
        D = self.D
        cap = capacity_per_owner or self.cap
        body = functools.partial(
            _finalize_shard,
            cutoff_min=cutoff_min,
            cutoff_max=cutoff_max,
            n_devices=D,
            capacity=cap,
            axis=self.axis,
            # conservative: total occurrences <= total ingested positions
            wide=self._rows_per_device * D >= (1 << 31),
        )
        sharded = jax.shard_map(
            body,
            mesh=self.mesh,
            in_specs=(P(self.axis, None), P(self.axis, None, None),
                      P(self.axis, None), P(self.axis), P()),
            out_specs=(P(self.axis, None), P(self.axis, None, None),
                       P(self.axis, None), P(self.axis), P(self.axis, None),
                       P(self.axis)),
        )
        jitted = jax.jit(sharded, donate_argnums=(0, 1, 2))
        sm = jnp.asarray(np.where(sig_map < 0, np.iinfo(np.int32).max,
                                  sig_map).astype(np.int32))
        bins_d, words_d, counts_d, n_groups_d, stats_d, dropped_d = jitted(
            self.sig, self.words, self.counts, self.n_used, sm)
        self.sig = self.words = self.counts = None
        n_groups = np.asarray(n_groups_d)
        stats = np.asarray(stats_d).sum(axis=0)
        if int(np.asarray(dropped_d).sum()):
            raise MemoryError("all_to_all capacity exceeded; raise capacity")
        # host reassembly: owners hold disjoint bins; concat then stable
        # sort by bin only (rows within a bin are already k-mer sorted)
        parts_b, parts_w, parts_c = [], [], []
        for d in range(D):
            n = int(n_groups[d])
            b = np.asarray(bins_d[d, :n])
            keep = (b >= 0) & (np.asarray(counts_d[d, :n]) >= cutoff_min) \
                & (np.asarray(counts_d[d, :n]) <= cutoff_max)
            parts_b.append(b[keep])
            parts_w.append(np.asarray(words_d[d, :n])[keep])
            parts_c.append(np.asarray(counts_d[d, :n])[keep])
        bins = np.concatenate(parts_b) if parts_b else np.zeros(0, np.int32)
        words = np.concatenate(parts_w) if parts_w else np.zeros((0, self.W), np.uint32)
        counts = np.concatenate(parts_c) if parts_c else np.zeros(0, np.uint32)
        order = np.argsort(bins, kind="stable")
        return (
            bins[order],
            words[order],
            np.minimum(counts[order], counter_max).astype(np.uint32),
            tuple(int(x) for x in stats),
            self._total64(self.occ_host()),
            self._total64(np.asarray(self.skm)),
        )

    def occ_host(self):
        return np.asarray(self.occ)

    @staticmethod
    def _total64(acc2: np.ndarray) -> int:
        return int(sum(int(lo) + (int(hi) << 32) for lo, hi in acc2))


def distributed_count(
    input_files,
    output_file_name: str,
    *,
    k: int,
    mesh: Mesh | None = None,
    sig_len: int = 9,
    n_bins: int = 512,
    cutoff_min: int = 2,
    cutoff_max: int = 10**9,
    counter_max: int = 255,
    both_strands: bool = True,
    batch_positions: int = 1 << 16,
    capacity_rows_per_device: int = 1 << 22,
    input_file_type: str = "fastq",
):
    """End-to-end multi-chip counting: data-parallel ingest over the mesh,
    owner-partitioned merge, KMC2 database out.  Returns stats dict."""
    from ..defs import calc_counter_size
    from ..formats.kmc_db import DbInfo, Kmc2DbWriter, pick_lut_prefix_len
    from ..io.native import pack_codes
    from ..io.readers import BatchStream, ParseState, file_code_stream
    from ..ops.extract import stage0_stats_batch_packed
    from ..runner import words_to_kmer_bytes
    from ..signatures import build_signature_map, map_size

    mesh = mesh or make_mesh()
    D = mesh.devices.size
    s = batch_positions
    W = (k + 15) // 16

    # stage 0: sampled signature histogram (single-device is fine: sampled)
    msize = map_size(sig_len)
    hist = np.zeros(msize, dtype=np.uint64)
    state = ParseState()
    bs = BatchStream(s, k)
    from ..defs import STATS_SAMPLE_BYTES

    gen = file_code_stream(input_files, input_file_type, state,
                           max_bytes=STATS_SAMPLE_BYTES)
    for batch in bs.batches(gen):
        packed, mask = pack_codes(batch)
        h = stage0_stats_batch_packed(packed, mask, s=s, k=k, sig_len=sig_len,
                                      map_len=msize)
        hist += np.asarray(h, dtype=np.uint64)
    sig_map = build_signature_map(hist, sig_len, n_bins)
    n_used_bins = int(sig_map.max()) + 1

    # stage 1: D batches per dispatch, one shard per device
    store = ShardedKmerStore(mesh, capacity_rows_per_device, W)
    state = ParseState()
    gen = file_code_stream(input_files, input_file_type, state)
    group_p, group_m = [], []
    L = bs.batch_bytes

    def flush():
        while len(group_p) < D:  # pad missing shards with invalid codes
            pad = np.full(L, 4, np.uint8)
            pp, mm = pack_codes(pad)
            group_p.append(pp)
            group_m.append(mm)
        store.ingest(np.stack(group_p), np.stack(group_m), s=s, k=k,
                     sig_len=sig_len, both_strands=both_strands)
        group_p.clear()
        group_m.clear()

    for batch in bs.batches(gen):
        packed, mask = pack_codes(batch)
        group_p.append(packed)
        group_m.append(mask)
        if len(group_p) == D:
            flush()
    if group_p:
        flush()

    bins, words, counts, (n_unique, n_below, n_above), n_total, n_skm = (
        store.finalize(sig_map, cutoff_min=cutoff_min, cutoff_max=cutoff_max,
                       counter_max=counter_max)
    )

    counter_size = calc_counter_size(cutoff_max, counter_max)
    lut_prefix_len = pick_lut_prefix_len(k, n_used_bins, max(len(bins), 1))
    info = DbInfo(
        kmer_len=k,
        counter_size=counter_size,
        lut_prefix_len=lut_prefix_len,
        signature_len=sig_len,
        cutoff_min=cutoff_min,
        cutoff_max=cutoff_max,
        both_strands=both_strands,
        n_bins=n_used_bins,
    )
    writer = Kmc2DbWriter(output_file_name, info, sig_map)
    writer.n_unique = n_unique
    writer.n_below_min = n_below
    writer.n_above_max = n_above
    writer.n_total = n_total
    writer.write_all(bins, words_to_kmer_bytes(words, k), counts)
    writer.close()
    return {
        "n_unique": n_unique,
        "n_below": n_below,
        "n_above": n_above,
        "n_total": n_total,
        "n_super_kmers": n_skm,
        "n_reads": state.n_reads,
        "n_devices": D,
    }
