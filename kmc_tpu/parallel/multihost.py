"""Multi-chip counting pipeline over a jax.sharding.Mesh.

The single-chip design (ops/store.py) scaled out: every device ingests its
own input shard into its own row-partition of the HBM store, and at finalize
the rows move to their bin owners with ONE all_to_all over ICI, after which
each owner runs the same sort+scan group-reduce locally.  Bin ownership is
`bin % n_devices` — the TPU mapping of KMC's "bins are independent after
stage 1" property (/root/reference/kmc_core/kb_completer.cpp:130-222); the
completer's bin-ordered output is reassembled on the host by interleaving
the owners' per-bin runs.

Rows use the binned-store layout (ops/store.py): (bin | k-mer) fused uint32
key columns, bin = prefix-of-signature (one shift, no table — see the
ops/store.py docstring for why any signature-consistent map is valid), and
NO counts column — every ingested row weighs 1 and a received row's weight
is simply its liveness, so the ICI exchange moves exactly the key columns
(8 B/row for k<=27) and nothing else.

Stages (all shard_map'd over one 'd' mesh axis):
  ingest   codes batches uint8[D, L] -> per-device key-column rows appended
           to the local store partition (fused, one dispatch); exact
           super-k-mer stats via a ppermute carry of the previous batch's
           final signature (batches are dealt round-robin, so device d's
           stream predecessor is device d-1's batch of the same group)
  finalize per device: owner = bin % D, sort rows by owner into
           fixed-capacity segments, all_to_all, then _group_reduce by
           (bin, k-mer) and cutoff stats

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
from ..ops.store import (
    U32MAX,
    _acc64_add,
    _group_reduce,
    _key_cols_from,
    _sig_to_bin,
    _split_bins,
    prefix_bin_bits,
    prefix_sig_map,
)
from .distributed import make_mesh


def _ingest_shard(packed, mask, cols, n_used, occ, skm, prev, *, s, k,
                  sig_len, both_strands, prefix_bits, fuse, n_dead_bin,
                  n_devices, axis):
    """Per-device fused extract+bin+append (mirrors ops/store._ingest_prefix,
    without the leading device axis: shard_map strips it)."""
    c4, bad = _unpack_device(packed[0], mask[0])
    valid, sig_pos, p, q = position_sigs(c4, bad, s=s, k=k, sig_len=sig_len)
    # exact super-k-mer stats: a ppermute hands every device its
    # predecessor's final signature; device 0 instead uses the carry saved
    # from the previous group, and saves what it receives (this group's last
    # device) as the next group's carry.
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
    bins = _sig_to_bin(sig_pos, valid, sig_len=sig_len, map_mode="prefix",
                       prefix_bits=prefix_bits, sig_map=None,
                       n_dead_bin=n_dead_bin)
    W = (k + 15) // 16
    r0 = k - 16 * (W - 1)
    new_cols = _key_cols_from(bins, wl, valid, fuse=fuse, r0=r0)

    occ2 = _acc64_add(occ[0], jnp.sum(valid.astype(jnp.uint32)))
    out_cols = tuple(
        jax.lax.dynamic_update_slice(sc[0], c, (n_used[0],))[None]
        for sc, c in zip(cols, new_cols)
    )
    return (
        out_cols,
        (n_used[0] + s)[None],
        occ2[None],
        skm2[None],
        carry_next[None],
    )


def _finalize_shard(cols, n_used, *, cutoff_min, cutoff_max, k, n_bins, fuse,
                    n_devices, capacity, axis):
    """Per-device: route rows to bin owners (one all_to_all of the key
    columns only), then local group-reduce with liveness as the row weight.
    Returns per-device (bins, words, totals, n_groups, stats, n_dropped)."""
    D = n_devices
    W = (k + 15) // 16
    r0 = k - 16 * (W - 1)
    key_cols = [c[0] for c in cols]
    X = key_cols[0].shape[0]
    idx = jnp.arange(X, dtype=jnp.int32)
    live = (idx < n_used[0]) & (key_cols[0] != U32MAX)
    if fuse:
        bins = key_cols[0] >> (2 * r0)
    else:
        bins = key_cols[0]
    owner = jnp.where(live, (bins % D).astype(jnp.uint32), jnp.uint32(D))

    # slot rows into fixed-capacity per-owner segments (the ragged
    # all-to-all of SURVEY.md §2.6, sized like the reference's
    # n_plus_x_recs upper bound, kb_collector.h:66-116)
    ops = jax.lax.sort([owner] + key_cols, num_keys=1 + len(key_cols))
    owner_s = ops[0]
    cols_s = ops[1:]
    owner_start = jnp.searchsorted(owner_s, jnp.arange(D + 1, dtype=jnp.uint32))
    pos_in_owner = idx - owner_start[jnp.minimum(owner_s, D).astype(jnp.int32)]
    in_cap = (pos_in_owner < capacity) & (owner_s < D)
    n_dropped = jnp.sum(((owner_s < D) & ~in_cap).astype(jnp.int32))

    def seg(col):
        out = jnp.full((D * capacity + 1,), U32MAX, col.dtype)
        slot = jnp.where(in_cap, owner_s.astype(jnp.int32) * capacity + pos_in_owner,
                         D * capacity)
        out = out.at[slot].set(jnp.where(in_cap, col, U32MAX))
        return out[: D * capacity].reshape(D, capacity)

    send_cols = [seg(c) for c in cols_s]

    # the ragged all-to-all over ICI (Pallas remote-DMA kernel on real
    # multi-chip slices; lax.all_to_all elsewhere — parallel/pallas_a2a.py)
    from .pallas_a2a import pallas_all_to_all

    recv_cols = [pallas_all_to_all(c, axis=axis) for c in send_cols]

    P_ = D * capacity
    rc_cols = [c.reshape(P_) for c in recv_cols]
    # row weight = liveness: every ingested row is one occurrence, and the
    # exchange pads with all-ones keys
    weights = (rc_cols[0] != U32MAX).astype(jnp.uint32)
    keys_r, _, totals, n_groups = _group_reduce(rc_cols, [], weights)
    bins_r, wr = _split_bins(keys_r, fuse=fuse, r0=r0)
    gidx = jnp.arange(P_, dtype=jnp.int32)
    group_valid = (gidx < n_groups) & (totals > 0) & (bins_r < jnp.uint32(n_bins))
    n_unique = jnp.sum(group_valid.astype(jnp.int32))
    n_below = jnp.sum((group_valid & (totals < cutoff_min)).astype(jnp.int32))
    n_above = jnp.sum((group_valid & (totals > cutoff_max)).astype(jnp.int32))
    out_words = jnp.stack(wr, axis=1)
    out_bins = jnp.where(group_valid, bins_r, U32MAX).astype(jnp.int32)
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
    """Row-partitioned HBM store across a device mesh (binned layout,
    prefix signature->bin policy)."""

    def __init__(self, mesh: Mesh, capacity_rows_per_device: int, *,
                 k: int, sig_len: int = 9, both_strands: bool = True,
                 n_bins: int = 512, axis: str = "d"):
        self.mesh = mesh
        self.axis = axis
        self.D = mesh.devices.size
        self.cap = int(capacity_rows_per_device)
        self.k = int(k)
        self.sig_len = int(sig_len)
        self.both_strands = bool(both_strands)
        self.W = (self.k + 15) // 16
        self.r0 = self.k - 16 * (self.W - 1)
        self.prefix_bits, self.fuse = prefix_bin_bits(k, sig_len, n_bins)
        self.n_used_bins = (1 << self.prefix_bits) + 1
        self.n_dead_bin = self.n_used_bins
        self.n_cols = self.W if self.fuse else self.W + 1
        rows = NamedSharding(mesh, P(axis))
        rows2 = NamedSharding(mesh, P(axis, None))
        D, cap = self.D, self.cap
        self.cols = tuple(
            jax.device_put(jnp.full((D, cap), U32MAX, jnp.uint32), rows2)
            for _ in range(self.n_cols)
        )
        self.n_used = jax.device_put(jnp.zeros((D,), jnp.int32), rows)
        self.occ = jax.device_put(jnp.zeros((D, 2), jnp.uint32), rows2)
        self.skm = jax.device_put(jnp.zeros((D, 2), jnp.uint32), rows2)
        self.prev = jax.device_put(
            jnp.full((D, 1), INVALID_SIG, jnp.uint32), rows2)
        self._ingest = None
        self._rows_per_device = 0

    def host_sig_map(self) -> np.ndarray:
        return prefix_sig_map(self.sig_len, self.prefix_bits)

    def make_ingest(self, *, s):
        body = functools.partial(
            _ingest_shard, s=s, k=self.k, sig_len=self.sig_len,
            both_strands=self.both_strands, prefix_bits=self.prefix_bits,
            fuse=self.fuse, n_dead_bin=self.n_dead_bin,
            n_devices=self.D, axis=self.axis,
        )
        nc = self.n_cols
        col_specs = tuple(P(self.axis, None) for _ in range(nc))
        sharded = jax.shard_map(
            body,
            mesh=self.mesh,
            in_specs=(P(self.axis, None), P(self.axis, None), col_specs,
                      P(self.axis), P(self.axis, None), P(self.axis, None),
                      P(self.axis, None)),
            out_specs=(col_specs, P(self.axis), P(self.axis, None),
                       P(self.axis, None), P(self.axis, None)),
        )
        jitted = jax.jit(sharded, donate_argnums=(2,))
        return jitted

    def ingest(self, packed_dm: np.ndarray, mask_dm: np.ndarray, *, s,
               k=None, sig_len=None, both_strands=None):
        """packed_dm/mask_dm: (D, L/4) and (D, L/8) — one batch per device."""
        if self._ingest is None:
            self._ingest = self.make_ingest(s=s)
        if self._rows_per_device + s > self.cap:
            raise MemoryError("sharded store full; raise capacity_rows_per_device")
        (self.cols, self.n_used, self.occ, self.skm, self.prev) = \
            self._ingest(packed_dm, mask_dm, self.cols, self.n_used,
                         self.occ, self.skm, self.prev)
        self._rows_per_device += s

    def finalize(self, sig_map=None, *, cutoff_min, cutoff_max, counter_max,
                 capacity_per_owner: int | None = None):
        """Exchange + group-reduce; returns host arrays (bins, words, counts)
        in global (bin, k-mer) order plus stats, reassembled across owners."""
        D = self.D
        cap = capacity_per_owner or self.cap
        body = functools.partial(
            _finalize_shard,
            cutoff_min=cutoff_min,
            cutoff_max=cutoff_max,
            k=self.k,
            n_bins=self.n_used_bins,
            fuse=self.fuse,
            n_devices=D,
            capacity=cap,
            axis=self.axis,
        )
        nc = self.n_cols
        sharded = jax.shard_map(
            body,
            mesh=self.mesh,
            in_specs=(tuple(P(self.axis, None) for _ in range(nc)),
                      P(self.axis)),
            out_specs=(P(self.axis, None), P(self.axis, None, None),
                       P(self.axis, None), P(self.axis), P(self.axis, None),
                       P(self.axis)),
        )
        jitted = jax.jit(sharded, donate_argnums=(0,))
        bins_d, words_d, counts_d, n_groups_d, stats_d, dropped_d = jitted(
            self.cols, self.n_used)
        self.cols = None
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
            c = np.asarray(counts_d[d, :n])
            keep = (b >= 0) & (c >= cutoff_min) & (c <= cutoff_max)
            parts_b.append(b[keep])
            parts_w.append(np.asarray(words_d[d, :n])[keep])
            parts_c.append(c[keep])
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
    owner-partitioned merge, KMC2 database out.  Returns stats dict.

    Uses the prefix signature->bin policy: no stage-0 sampling pass is
    needed (the map is a shift; see ops/store.py)."""
    from ..defs import calc_counter_size
    from ..formats.kmc_db import DbInfo, Kmc2DbWriter, pick_lut_prefix_len
    from ..io.native import pack_codes
    from ..io.readers import BatchStream, ParseState, file_code_stream
    from ..runner import words_to_kmer_bytes

    mesh = mesh or make_mesh()
    if jax.process_count() > 1:
        raise NotImplementedError(
            "distributed_count is a single-controller driver: it addresses "
            "every device shard and writes the DB from one process.  On a "
            "multi-host pod, run one controller process (or shard inputs "
            "per host with a host-local mesh and merge the per-host DBs "
            "with kmc_tools union) — see docs/SCALING.md."
        )
    D = mesh.devices.size
    s = batch_positions

    store = ShardedKmerStore(mesh, capacity_rows_per_device, k=k,
                             sig_len=sig_len, both_strands=both_strands,
                             n_bins=n_bins)
    state = ParseState()
    bs = BatchStream(s, k)
    gen = file_code_stream(input_files, input_file_type, state)
    group_p, group_m = [], []
    L = bs.batch_bytes

    def flush():
        while len(group_p) < D:  # pad missing shards with invalid codes
            pad = np.full(L, 4, np.uint8)
            pp, mm = pack_codes(pad)
            group_p.append(pp)
            group_m.append(mm)
        store.ingest(np.stack(group_p), np.stack(group_m), s=s)
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

    sig_map = store.host_sig_map()
    n_used_bins = store.n_used_bins
    bins, words, counts, (n_unique, n_below, n_above), n_total, n_skm = (
        store.finalize(cutoff_min=cutoff_min, cutoff_max=cutoff_max,
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
