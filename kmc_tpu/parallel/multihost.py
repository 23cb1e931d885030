"""Multi-chip / multi-host counting pipeline over a jax.sharding.Mesh.

The single-chip design (ops/store.py) scaled out: every device ingests its
own input shard into its own row-partition of the HBM store, and at finalize
the rows move to their bin owners with ONE all_to_all over ICI, after which
each owner runs the same sort+scan group-reduce locally.  Bin ownership is
CONTIGUOUS: owner o holds bins [bounds[o], bounds[o+1]) with boundaries
picked from a measured per-bin histogram (exact balance) — the TPU mapping
of KMC's "bins are independent after stage 1" property
(/root/reference/kmc_core/kb_completer.cpp:130-222).  Because the bin is
the top bits of the fused key, key order implies owner order: the
pre-exchange pass is a plain key sort whose owner segments are slices, and
the owners' outputs concatenated in device order ARE the completer's
bin-ordered output (host reassembly is plain concatenation).

Rows use the binned-store layout (ops/store.py): (bin | k-mer) fused uint32
key columns, bin = prefix-of-signature (one shift, no table — see the
ops/store.py docstring for why any signature-consistent map is valid).  A
counts column does not exist until the first mid-run compaction
materializes it: before that every ingested row weighs 1 and a received
row's weight is its liveness, so the ICI exchange moves exactly the key
columns (8 B/row for k<=27); after a compaction the counts ride along as
one more uint32 column and are the row weights.

Stages (all shard_map'd over one 'd' mesh axis):
  ingest   codes batches uint8[D, L] -> per-device key-column rows appended
           to the local store partition (fused, one dispatch); exact
           super-k-mer stats via a ppermute carry of the previous batch's
           final signature (batches are dealt round-robin, so device d's
           stream predecessor is device d-1's batch of the same group)
  compact  per-device group-reduce when the partition fills (the sharded
           analogue of DeviceKmerStore.compact); if the unique set still
           exceeds the partition, the compacted run spills to host RAM
           (the strict-memory analogue, kmc.h:1611-1692)
  finalize per device: key-sort rows (owner segments = slices via the
           contiguous bin bounds; capacity measured EXACTLY by a
           pre-pass per-bin histogram — the n_plus_x_recs-style bound of
           kb_collector.h:66-116 made tight), all_to_all over ICI, then
           _group_reduce by (bin, k-mer); spilled runs merge on the host

Multi-host (jax.process_count() > 1): the same single program runs on every
process (multi-controller SPMD).  Each process parses a DISJOINT
record-aligned byte-range shard of the input (io.readers.
process_input_shards; gz/BAM/-fkmc files as atomic units) with N parser
threads and uploads only the batch rows owned by its local devices; global
arrays are assembled with jax.make_array_from_single_device_arrays,
host-side reads go through process_allgather, and only process 0 writes the
database.  Processes stay in lockstep (equal global dispatch counts) with a
per-group flag allgather; the super-k-mer-stat carry rings are per-host.
Wire up with parallel.distributed.init_multihost() before building the
mesh.
"""
from __future__ import annotations

import functools
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.extract import INVALID_SIG, _kmer_words, _unpack_device, position_sigs
from ..ops.store import (
    U32MAX,
    _acc64_add,
    _compact_core,
    _group_reduce,
    _key_cols_from,
    _sig_to_bin,
    _split_bins,
    _tiled_gather_groups,
    _use_tiled_finalize,
    prefix_bin_bits,
    prefix_sig_map,
)
from .distributed import make_mesh


def _ingest_shard(packed, mask, cols, counts, n_used, occ, skm, prev,
                  sig_map, **kw):
    """Per-device fused extract+bin+append over the packed+mask feed
    format (0.375 B/base); see _ingest_shard_core."""
    c4, bad = _unpack_device(packed[0], mask[0])
    return _ingest_shard_core(c4, bad, cols, counts, n_used, occ, skm,
                              prev, sig_map, **kw)


def _ingest_shard_bounds(buf, tail, cols, counts, n_used, occ, skm, prev,
                         sig_map, **kw):
    """Per-device ingest over the boundary-delta feed format (2-bit packed
    codes ++ LE u16 sentinel-position deltas, 0.28 B/base — 25% fewer
    host-pack bytes and H2D bytes than packed+mask; the single-chip
    bench format, io/native.py::pack_codes_boundaries)."""
    from ..ops.store import _unpack_boundaries

    c4, bad = _unpack_boundaries(buf[0], tail[0], s=kw["s"], k=kw["k"])
    return _ingest_shard_core(c4, bad, cols, counts, n_used, occ, skm,
                              prev, sig_map, **kw)


def _ingest_shard_core(c4, bad, cols, counts, n_used, occ, skm, prev,
                       sig_map, *, s, k, sig_len, both_strands, prefix_bits,
                       fuse, n_dead_bin, n_devices, axis, has_counts,
                       map_mode="prefix", extract_mode="xla",
                       chain_perm=None, chain_heads=None):
    """Fused extract+bin+append body (mirrors ops/store._ingest_prefix,
    without the leading device axis: shard_map strips it).

    chain_perm/chain_heads describe the carry chain of the super-k-mer
    stats: consecutive batches of ONE host stream go to consecutive devices
    of that host, so the ppermute rings are per-host when input is sharded
    per process (and one global ring when a single stream feeds every
    device)."""
    if extract_mode in ("compiled", "interpret"):
        from ..ops.pallas_extract import extract_for_ingest

        valid, sig_pos, wl = extract_for_ingest(
            c4, bad, s=s, k=k, sig_len=sig_len, both_strands=both_strands,
            mode=extract_mode)
    else:
        valid, sig_pos, p, q = position_sigs(c4, bad, s=s, k=k,
                                             sig_len=sig_len)
        wl = None
    # exact super-k-mer stats: a ppermute hands every device its
    # predecessor's final signature; device 0 instead uses the carry saved
    # from the previous group, and saves what it receives (this group's last
    # device) as the next group's carry.
    last_sig = sig_pos[-1:]
    if chain_perm is None:
        chain_perm = tuple((i, (i + 1) % n_devices) for i in range(n_devices))
        chain_heads = (True,) + (False,) * (n_devices - 1)
    recv = jax.lax.ppermute(last_sig, axis, list(chain_perm))
    me = jax.lax.axis_index(axis)
    heads = jnp.asarray(np.array(chain_heads, dtype=bool))
    prev_use = jnp.where(heads[me], prev[0], recv)
    carry_next = recv
    prv = jnp.concatenate([prev_use, sig_pos[:-1]])
    new_skm = (sig_pos != INVALID_SIG) & (sig_pos != prv)
    skm2 = _acc64_add(skm[0], jnp.sum(new_skm.astype(jnp.uint32)))

    if wl is None:
        wl = _kmer_words(p, q, k, s, both_strands)
    bins = _sig_to_bin(sig_pos, valid, sig_len=sig_len, map_mode=map_mode,
                       prefix_bits=prefix_bits, sig_map=sig_map,
                       n_dead_bin=n_dead_bin)
    W = (k + 15) // 16
    r0 = k - 16 * (W - 1)
    new_cols = _key_cols_from(bins, wl, valid, fuse=fuse, r0=r0)

    occ2 = _acc64_add(occ[0], jnp.sum(valid.astype(jnp.uint32)))
    out_cols = tuple(
        jax.lax.dynamic_update_slice(sc[0], c, (n_used[0],))[None]
        for sc, c in zip(cols, new_cols)
    )
    if has_counts:
        # fresh rows weigh 1 (dead appended rows stay dead by their U32MAX
        # key, see _live_mask in ops/store.py)
        out_counts = jax.lax.dynamic_update_slice(
            counts[0], jnp.ones((s,), jnp.uint32), (n_used[0],))[None]
    else:
        out_counts = counts
    return (
        out_cols,
        out_counts,
        (n_used[0] + s)[None],
        occ2[None],
        skm2[None],
        carry_next[None],
    )


def _compact_shard(cols, counts, n_used, *, has_counts, wide):
    """Per-device duplicate merge (the sharded DeviceKmerStore.compact):
    materializes/refreshes the counts column."""
    cols_l = tuple(c[0] for c in cols)
    cnts = counts[0] if has_counts else None
    out_cols, out_counts, n_groups = _compact_core(cols_l, cnts, n_used[0],
                                                   wide=wide)
    return (tuple(c[None] for c in out_cols), out_counts[None],
            n_groups[None])


def _bin_hist_shard(cols, counts, n_used, *, fuse, r0, n_hist, has_counts):
    """Per-device histogram of live rows per BIN — the measured load that
    picks the contiguous owner boundaries and sizes the all_to_all
    segments exactly (the tight version of the reference's n_plus_x_recs
    pre-reservation, kb_collector.h:66-116)."""
    key0 = cols[0][0]
    X = key0.shape[0]
    idx = jnp.arange(X, dtype=jnp.int32)
    live = (idx < n_used[0]) & (key0 != U32MAX)
    if has_counts:
        live = live & (counts[0] > 0)
    bins = (key0 >> (2 * r0)) if fuse else key0
    b = jnp.where(live, jnp.minimum(bins, jnp.uint32(n_hist - 1)),
                  jnp.uint32(n_hist))
    hist = jnp.zeros((n_hist + 1,), jnp.int32).at[b].add(1)
    return hist[:n_hist][None]


def _exchange_shard(cols, counts, n_used, bounds, *, k, fuse, n_devices,
                    capacity, axis, has_counts, unit=False):
    """Per-device: route rows to bin owners (one all_to_all of the key
    columns, plus the counts column once it exists).  Returns this owner's
    received (key columns, weights, n_live, n_dropped).  With unit=True
    (requires has_counts=False — every row weighs 1) NO weights column is
    built or sorted downstream: weights comes back None and n_live is the
    received live-row count, enabling the single-chip unit-count trick
    (totals from rank differences, ops/store._tiled_reduce_a) that keeps
    the big grouping sort at key-columns-only width.

    Ownership is CONTIGUOUS in bin id: owner o holds bins
    [bounds[o], bounds[o+1]) with the boundaries picked from the measured
    per-bin histogram (exact balance).  Because the bin is the top bits of
    the fused key, key order implies owner order — so the pre-exchange
    pass is a plain key sort (no owner column), each owner's rows are a
    contiguous slice of it, and the owners' outputs concatenated in device
    order are already in global (bin, k-mer) order, exactly the bin-ordered
    concatenation of the reference completer (kb_completer.cpp:131-222)."""
    D = n_devices
    W = (k + 15) // 16
    r0 = k - 16 * (W - 1)
    key_cols = [c[0] for c in cols]
    X = key_cols[0].shape[0]
    idx = jnp.arange(X, dtype=jnp.int32)
    live = (idx < n_used[0]) & (key_cols[0] != U32MAX)
    if has_counts:
        cnts = jnp.where(live, counts[0], 0)
        live = live & (cnts > 0)
    if D == 1:
        # single owner = self: the key sort, segment slicing and
        # all_to_all are all identities — and by the store layout
        # invariant (rows at/beyond n_used and merged-away rows carry
        # U32MAX keys; _compact_core/_ingest_shard) the key columns need
        # NO masking: dead rows are already U32MAX.  Fit to the capacity
        # shape (capacity >= n_used covers every live row) and mask only
        # the single weights column.  The phase-A grouping sort
        # downstream orders the rows.
        def fit(col, fill):
            if col.shape[0] >= capacity:
                return col[:capacity]
            pad = jnp.full((capacity - col.shape[0],), fill, col.dtype)
            return jnp.concatenate([col, pad])

        rc_keys = [fit(c, U32MAX) for c in key_cols]
        # an explicitly undersized capacity truncates live rows here just
        # like the multi-device segment slicing would — report them so the
        # caller's capacity-exceeded check fires instead of silently
        # losing k-mers
        n_dropped = jnp.sum((live & (idx >= capacity)).astype(jnp.int32))
        if unit:
            n_live = jnp.sum((live & (idx < capacity)).astype(jnp.int32))
            return rc_keys, None, n_live, n_dropped
        w = cnts if has_counts else live.astype(jnp.uint32)
        weights = fit(jnp.where(live, w, jnp.uint32(0)), jnp.uint32(0))
        return rc_keys, weights, jnp.int32(0), n_dropped

    # ONE key sort (dead rows masked to U32MAX keys sort to the end);
    # owner segments fall out as contiguous slices via searchsorted on
    # the sorted bin column against the owner boundaries
    cols_in = [jnp.where(live, c, U32MAX) for c in key_cols]
    pay = [cnts] if has_counts else []
    ops = jax.lax.sort(cols_in + pay, num_keys=len(key_cols))
    cols_s = ops
    bins_s = (cols_s[0] >> (2 * r0)) if fuse else cols_s[0]
    # bounds: uint32[D+1], bounds[0] == 0, bounds[D] <= any dead-row bin
    # value (dead keys are U32MAX, whose bin field exceeds every real bin)
    owner_start = jnp.searchsorted(bins_s, bounds.astype(jnp.uint32))
    n_per_owner = (owner_start[1 : D + 1] - owner_start[:D]).astype(jnp.int32)
    n_dropped = jnp.sum(jnp.maximum(n_per_owner - capacity, 0))
    starts = owner_start[:D].astype(jnp.int32)
    pos = jnp.arange(capacity, dtype=jnp.int32)
    seg_valid = pos[None, :] < jnp.minimum(n_per_owner, capacity)[:, None]

    def seg(col, fill):
        pad = jnp.full((capacity,), fill, col.dtype)
        col_pad = jnp.concatenate([col, pad])
        rows = jnp.stack([
            jax.lax.dynamic_slice(col_pad, (starts[d],), (capacity,))
            for d in range(D)
        ])
        return jnp.where(seg_valid, rows, fill)

    send_cols = [seg(c, U32MAX) for c in cols_s[: len(key_cols)]]
    if has_counts:
        send_cols.append(seg(cols_s[-1], jnp.uint32(0)))

    # the RAGGED all-to-all over ICI: only the live rows of each
    # (sender, owner) segment cross the wire (Pallas remote-DMA kernel on
    # real multi-chip slices; lax.all_to_all elsewhere —
    # parallel/pallas_a2a.py).  Row validity comes from the exchanged
    # counts, NOT from transferred sentinels (the ragged transport leaves
    # segment tails undefined).
    from .pallas_a2a import pallas_ragged_all_to_all

    n_per_dst = jnp.minimum(n_per_owner, capacity)
    chunk = min(512, capacity)
    recv_cols = []
    recv_rows = None
    for ci, c in enumerate(send_cols):
        out, recv_rows = pallas_ragged_all_to_all(
            c, n_per_dst, axis=axis, chunk=chunk, collective_id=8 + ci)
        recv_cols.append(out)

    P_ = D * capacity
    pos = jnp.arange(capacity, dtype=jnp.int32)
    valid = (pos[None, :] < recv_rows[:, None]).reshape(P_)
    rc_cols = [c.reshape(P_) for c in recv_cols]
    rc_keys = [jnp.where(valid, c, U32MAX)
               for c in rc_cols[: len(key_cols)]]
    if has_counts:
        weights = jnp.where(valid, rc_cols[-1], 0)
        return rc_keys, weights, jnp.int32(0), n_dropped
    if unit:
        n_live = jnp.sum(recv_rows.astype(jnp.int32))
        return rc_keys, None, n_live, n_dropped
    # every ingested row is one occurrence
    weights = valid.astype(jnp.uint32)
    return rc_keys, weights, jnp.int32(0), n_dropped


def _finalize_shard(cols, counts, n_used, bounds, *, k, n_bins, fuse,
                    n_devices, capacity, axis, has_counts):
    """Classic single-dispatch finalize: exchange + full group-reduce.
    Returns per-device (bins, words, totals, n_groups, n_dropped)."""
    W = (k + 15) // 16
    r0 = k - 16 * (W - 1)
    rc_keys, weights, _, n_dropped = _exchange_shard(
        cols, counts, n_used, bounds, k=k, fuse=fuse, n_devices=n_devices,
        capacity=capacity, axis=axis, has_counts=has_counts)
    P_ = rc_keys[0].shape[0]
    keys_r, _, totals, n_groups = _group_reduce(rc_keys, [], weights)
    bins_r, wr = _split_bins(keys_r, fuse=fuse, r0=r0)
    gidx = jnp.arange(P_, dtype=jnp.int32)
    group_valid = (gidx < n_groups) & (totals > 0) & (bins_r < jnp.uint32(n_bins))
    out_words = jnp.stack(wr, axis=1)
    out_bins = jnp.where(group_valid, bins_r, U32MAX).astype(jnp.int32)
    out_counts = jnp.where(group_valid, totals, 0)
    return (
        out_bins[None],
        out_words[None],
        out_counts[None],
        n_groups[None],
        n_dropped[None],
    )


def _finalize_shard_a(cols, counts, n_used, bounds, *, k, fuse, n_devices,
                      capacity, axis, has_counts):
    """Tiled finalize phase A per owner: exchange + grouping sort +
    per-tile compaction bookkeeping (ops/store._tiled_reduce_a inlined
    over the received rows).  Counted stores carry an explicit weights
    payload through the sort; unit stores (no counts column yet — the
    common no-compaction run) sort KEY COLUMNS ONLY and phase B derives
    totals from rank differences against n_live, exactly the single-chip
    unit trick."""
    from ..ops.store import _TILE_T

    unit = not has_counts
    rc_keys, weights, n_live, n_dropped = _exchange_shard(
        cols, counts, n_used, bounds, k=k, fuse=fuse, n_devices=n_devices,
        capacity=capacity, axis=axis, has_counts=has_counts, unit=unit)
    T = _TILE_T
    P_ = rc_keys[0].shape[0]
    P128 = ((P_ + T - 1) // T) * T
    W = len(rc_keys)
    if P128 != P_:
        pad = jnp.full((P128 - P_,), U32MAX, jnp.uint32)
        rc_keys = [jnp.concatenate([c, pad]) for c in rc_keys]
        if weights is not None:
            weights = jnp.concatenate(
                [weights, jnp.zeros((P128 - P_,), jnp.uint32)])
    if unit:
        keys_s = jax.lax.sort(list(rc_keys), num_keys=W)
        before = jnp.zeros((1,), jnp.uint32)  # unused in the unit form
    else:
        ops = jax.lax.sort(list(rc_keys) + [weights], num_keys=W)
        keys_s = ops[:W]
        cs = jnp.cumsum(ops[W], dtype=jnp.uint32)
        before = jnp.concatenate([jnp.zeros((1,), jnp.uint32), cs])

    new = jnp.ones((P128,), jnp.bool_)
    diff = jnp.zeros((P128 - 1,), jnp.bool_)
    for c in keys_s:
        diff = diff | (c[1:] != c[:-1])
    new = new.at[1:].set(diff)
    nb = P128 // T
    lane = jnp.arange(T, dtype=jnp.uint32)
    tile_key = jnp.where(new.reshape(nb, T), lane[None, :],
                         lane[None, :] + jnp.uint32(T))
    src = jnp.arange(P128, dtype=jnp.uint32).reshape(nb, T)
    _, src_t = jax.lax.sort([tile_key, src], dimension=1, num_keys=1)
    cnt = jnp.sum(new.reshape(nb, T).astype(jnp.int32), axis=1)
    offs = jnp.cumsum(cnt) - cnt
    n_groups = offs[-1] + cnt[-1]
    return (tuple(c[None] for c in keys_s), before[None],
            src_t.reshape(P128)[None], offs[None], n_groups[None],
            n_live[None], n_dropped[None])


def _finalize_shard_b(keys_s, before, src_t, offs, n_groups, n_live, *,
                      out, k, n_bins, fuse, unit):
    """Tiled finalize phase B per owner: OUT-sized representative gather +
    stats (counted or unit form, matching phase A)."""
    keys_r, totals = _tiled_gather_groups(
        tuple(c[0] for c in keys_s), before[0], src_t[0], offs[0],
        n_groups[0], n_live[0], out=out, has_counts=not unit)
    W = (k + 15) // 16
    r0 = k - 16 * (W - 1)
    idx = jnp.arange(out, dtype=jnp.int32)
    bins_r, wr = _split_bins(keys_r, fuse=fuse, r0=r0)
    group_valid = ((idx < n_groups[0]) & (totals > 0)
                   & (bins_r < jnp.uint32(n_bins)))
    out_words = jnp.stack(wr, axis=1)
    out_bins = jnp.where(group_valid, bins_r, U32MAX).astype(jnp.int32)
    out_counts = jnp.where(group_valid, totals, 0)
    return out_bins[None], out_words[None], out_counts[None]


def _finalize_shard_bc(keys_s, before, src_t, offs, n_groups, n_live,
                       start, *, chunk, k, n_bins, fuse, counter_size,
                       counter_max, cutoff_min, cutoff_max, unit):
    """Chunked tiled phase B+C per owner: gather the group representatives
    for output rows [start, start+chunk) AND pack them into their on-disk
    record bytes (kb big-endian k-mer bytes + counter_size LE counter),
    keep bitmask, chunk-local per-bin kept histogram and stats in ONE
    dispatch.  `start` is a traced replicated scalar, so every chunk
    reuses one executable and the driver overlaps chunk c's D2H + host
    assembly with chunk c+1's execution — the sharded port of the
    single-chip KMC_TPU_PIPELINE_D2H path.  It also bounds the transfer
    to ceil(n/chunk)*chunk rows instead of the pow2-padded owner
    capacity (the old phase-C shipped the full pad)."""
    keys_r, totals = _tiled_gather_groups(
        tuple(c[0] for c in keys_s), before[0], src_t[0], offs[0],
        n_groups[0], n_live[0], out=chunk, has_counts=not unit,
        start=start)
    W = (k + 15) // 16
    r0 = k - 16 * (W - 1)
    idx = start.astype(jnp.int32) + jnp.arange(chunk, dtype=jnp.int32)
    bins_r, wr = _split_bins(keys_r, fuse=fuse, r0=r0)
    valid = ((idx < n_groups[0]) & (totals > 0)
             & (bins_r < jnp.uint32(n_bins)))
    ci = min(int(cutoff_min), 0xFFFFFFFF)
    cx = min(int(cutoff_max), 0xFFFFFFFF)
    cm = min(int(counter_max), 0xFFFFFFFF)
    below = valid & (totals < jnp.uint32(ci))
    above = valid & (totals > jnp.uint32(cx))
    keep = valid & ~below & ~above
    kb = (k + 3) // 4
    cols = []
    for j in range(kb):  # right-aligned big-endian bytes (words_to_kmer_bytes)
        g = 4 * W - kb + j
        sh = (3 - g % 4) * 8
        cols.append(((wr[g // 4] >> jnp.uint32(sh))
                     & jnp.uint32(0xFF)).astype(jnp.uint8))
    cc = jnp.minimum(totals, jnp.uint32(cm))
    for j in range(counter_size):  # little-endian counter
        cols.append(((cc >> jnp.uint32(8 * j))
                     & jnp.uint32(0xFF)).astype(jnp.uint8))
    rec = jnp.stack(cols, axis=1)
    bitw = jnp.uint8(1) << jnp.arange(8, dtype=jnp.uint8)
    kbits = (keep.reshape(-1, 8).astype(jnp.uint8)
             * bitw[None, :]).sum(axis=1).astype(jnp.uint8)
    # kept rows per bin: valid rows are a bin-ascending prefix of the
    # chunk, so per-bin ranges come from one searchsorted + cumsum diff
    b_eff = jnp.where(valid, bins_r.astype(jnp.int32), jnp.int32(n_bins))
    bound = jnp.searchsorted(b_eff, jnp.arange(n_bins + 1, dtype=jnp.int32))
    kc = jnp.concatenate([jnp.zeros(1, jnp.int32),
                          jnp.cumsum(keep.astype(jnp.int32))])
    hist = kc[bound[1:]] - kc[bound[:-1]]
    stats = jnp.stack([valid.sum(dtype=jnp.int32),
                       below.sum(dtype=jnp.int32),
                       above.sum(dtype=jnp.int32)])
    return rec[None], kbits[None], hist[None], stats[None]


def _finalize_shard_rc(keys_s, before, src_t, offs, n_groups, n_live,
                       start, *, chunk, unit, **kw):
    """Chunked tiled phase B + completer per owner: gather the group
    representatives for output rows [start, start+chunk) AND emit their
    on-disk SUFFIX record byte planes, keep bits, chunk-local (bin,
    prefix) LUT and stats in one dispatch (ops/store._finalize_groups_core
    under shard_map) — the sharded port of the single-chip
    finalize_records completer (kb_completer.cpp:59-223 emits the same
    bytes from its sorters).  vs _finalize_shard_bc: needs
    lut_prefix_len up front but ships only suffix bytes (not the whole
    k-mer) and the finished LUT, so the host never rebuilds prefix
    histograms."""
    from ..ops.store import _finalize_groups_core

    keys_r, totals = _tiled_gather_groups(
        tuple(c[0] for c in keys_s), before[0], src_t[0], offs[0],
        n_groups[0], n_live[0], out=chunk, has_counts=not unit,
        start=start)
    cols, keep_bits, lut, stats = _finalize_groups_core(
        keys_r, totals, n_groups[0], start=start, **kw)
    return (tuple(c[None] for c in cols), keep_bits[None], lut[None],
            jnp.stack(stats)[None])


def _pack_records_shard(bins, words, counts, *, k, n_bins, counter_size,
                        counter_max, cutoff_min, cutoff_max):
    """Finalize phase C per owner: pack the merged (bins, words, counts)
    rows into their on-disk byte form ON DEVICE — kb big-endian k-mer
    bytes + counter_size little-endian counter bytes per row — plus a
    keep bitmask, per-bin kept-row counts, and (n_valid, n_below,
    n_above) scalars.  Halves the device->host payload vs shipping raw
    (bins i32 + W u32 lanes + u32 counts): e.g. 16 -> 8 bytes/row at
    k=27/cs=1 (the reference's completer writes these same bytes from
    its sorters, kb_completer.cpp:59-223; here the wire format IS the
    disk format so the tunnel/PCIe moves no byte twice)."""
    b = bins[0]            # (out,) int32, -1 on invalid rows
    w = words[0]           # (out, W) uint32 MSW-first lanes
    c = counts[0]          # (out,) uint32 merged totals
    out = b.shape[0]
    W = w.shape[1]
    kb = (k + 3) // 4
    valid = b >= 0
    # totals are u32 (ingest clamps at 0xFFFFFFFF), so u32-clamped
    # cutoffs/counter_max compare identically to the host raw path
    ci = min(int(cutoff_min), 0xFFFFFFFF)
    cx = min(int(cutoff_max), 0xFFFFFFFF)
    counter_max = min(int(counter_max), 0xFFFFFFFF)
    below = valid & (c < jnp.uint32(ci))
    above = valid & (c > jnp.uint32(cx))
    keep = valid & ~below & ~above
    cols = []
    for j in range(kb):  # right-aligned big-endian bytes (words_to_kmer_bytes)
        g = 4 * W - kb + j
        sh = (3 - g % 4) * 8
        cols.append(((w[:, g // 4] >> jnp.uint32(sh))
                     & jnp.uint32(0xFF)).astype(jnp.uint8))
    cc = jnp.minimum(c, jnp.uint32(counter_max))
    for j in range(counter_size):  # little-endian counter
        cols.append(((cc >> jnp.uint32(8 * j))
                     & jnp.uint32(0xFF)).astype(jnp.uint8))
    rec = jnp.stack(cols, axis=1)
    out8 = -(-out // 8) * 8
    kp = keep
    if out8 != out:
        kp = jnp.pad(kp, (0, out8 - out))
    bitw = jnp.uint8(1) << jnp.arange(8, dtype=jnp.uint8)
    kbits = (kp.reshape(-1, 8).astype(jnp.uint8)
             * bitw[None, :]).sum(axis=1).astype(jnp.uint8)
    # kept rows per bin: valid rows are bin-ascending, so per-bin ranges
    # come from one searchsorted and kept counts from a cumsum difference
    b_eff = jnp.where(valid, b, jnp.int32(n_bins))
    bound = jnp.searchsorted(b_eff, jnp.arange(n_bins + 1, dtype=jnp.int32))
    kc = jnp.concatenate([jnp.zeros(1, jnp.int32),
                          jnp.cumsum(keep.astype(jnp.int32))])
    hist = kc[bound[1:]] - kc[bound[:-1]]
    stats = jnp.stack([valid.sum(dtype=jnp.int32),
                       below.sum(dtype=jnp.int32),
                       above.sum(dtype=jnp.int32)])
    return rec[None], kbits[None], hist[None], stats[None]


def _round_pow2(x: int, lo: int = 64) -> int:
    """Round up to {1, 1.25, 1.5, 1.75} x 2^k (128-aligned): static
    shapes with at most 4 jit variants per octave, while capping the
    phase-A sort-width overshoot at 25% (plain pow2 wastes up to 2x —
    29% on the 2.08e8-row bench, measured in exchange_groupsort_s)."""
    n = lo
    while n < x:
        n *= 2
    if n <= max(x, lo):
        return n
    half = n // 2
    for frac in (1.25, 1.5, 1.75):
        c = (int(half * frac) + 127) & ~127
        if c >= x:
            return c
    return n


class ShardedKmerStore:
    """Row-partitioned HBM store across a device mesh (binned layout,
    prefix signature->bin policy), multi-host aware.

    Survival tools mirror the single-chip DeviceKmerStore: when a device
    partition fills, `compact()` merges duplicates in place (materializing
    the counts column); if the merged unique set still fills the partition,
    the run spills to host RAM and is merged back at finalize — the
    analogue of the reference's strict-memory big-bin pipeline
    (kmc.h:1611-1692)."""

    def __init__(self, mesh: Mesh, capacity_rows_per_device: int, *,
                 k: int, sig_len: int = 9, both_strands: bool = True,
                 n_bins: int = 512, axis: str = "d", chain: str = "global",
                 map_mode: str = "prefix", sig_map: np.ndarray | None = None,
                 spill_budget_bytes: int | None = None):
        self.mesh = mesh
        self.axis = axis
        self.D = mesh.devices.size
        # carry-chain topology for the super-k-mer stats: "global" = one
        # ring over all devices (a single input stream dealt round-robin to
        # every device); "per_host" = one ring per process (each host
        # parses its own input shard and feeds only its local devices)
        if chain == "per_host":
            by_proc: dict[int, list[int]] = {}
            for pos, dev in enumerate(mesh.devices.flat):
                by_proc.setdefault(dev.process_index, []).append(pos)
            perm, heads = [], [False] * self.D
            for pos_list in by_proc.values():
                n = len(pos_list)
                heads[pos_list[0]] = True
                perm += [(pos_list[j], pos_list[(j + 1) % n])
                         for j in range(n)]
            self.chain_perm = tuple(sorted(perm))
            self.chain_heads = tuple(heads)
        else:
            self.chain_perm = tuple(
                (i, (i + 1) % self.D) for i in range(self.D))
            self.chain_heads = (True,) + (False,) * (self.D - 1)
        self.cap = int(capacity_rows_per_device)
        self.k = int(k)
        self.sig_len = int(sig_len)
        self.both_strands = bool(both_strands)
        self.W = (self.k + 15) // 16
        self.r0 = self.k - 16 * (self.W - 1)
        self.map_mode = map_mode
        if map_mode == "prefix":
            self.prefix_bits, self.fuse = prefix_bin_bits(k, sig_len, n_bins)
            self.n_used_bins = (1 << self.prefix_bits) + 1
            self._sig_map_host = None
            self._sig_map_dev = None
        elif map_mode == "greedy":
            # the reference's sampled-histogram greedy map (s_mapper.h:
            # 141-235): a table lookup instead of a shift; identical on
            # every process (built from the same global input prefix)
            if sig_map is None:
                raise ValueError("greedy map_mode requires sig_map")
            from ..ops.store import greedy_fuse

            self.prefix_bits = 0
            self.n_used_bins = int(sig_map.max()) + 1
            self.fuse = greedy_fuse(k, self.n_used_bins)
            self._sig_map_host = sig_map.astype(np.int32)
            # kept as host numpy: each process uploads it replicated when
            # the jitted ingest takes it (a local jnp array would not be a
            # valid global array under multi-controller SPMD)
            sm = np.where(sig_map < 0, self.n_used_bins, sig_map)
            self._sig_map_dev = sm.astype(np.int32)
        else:
            raise ValueError(f"unknown map_mode {map_mode!r}")
        self.n_dead_bin = self.n_used_bins
        self.n_cols = self.W if self.fuse else self.W + 1
        self._rows = NamedSharding(mesh, P(axis))
        self._rows2 = NamedSharding(mesh, P(axis, None))
        self._init_state()
        self._ingest_fn = None
        self._ingest_has_counts = None
        self._jit_cache = {}  # (kind, has_counts, *statics) -> jitted fn
        self._rows_per_device = 0
        self._base_rows = 0  # compacted prefix length (max over devices)
        self.has_counts = False
        self.spilled = []  # [(bins, words, counts) numpy triples], global
        # -m enforcement (memory.plan_memory): see DeviceKmerStore
        self.spill_budget_bytes = spill_budget_bytes
        self._multi = jax.process_count() > 1
        # wall-clock phase splits (seconds), populated by finalize() and by
        # barrier(); used by tools/tpu_sharded_run.py for the TPU-measured
        # device splits of the sharded pipeline
        self.timings: dict[str, float] = {}
        self.n_compactions = 0
        self.n_spills = 0

    # -- multi-host plumbing --

    def _host(self, x) -> np.ndarray:
        """Global device array -> host numpy on every process."""
        if not self._multi:
            return np.asarray(x)
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))

    def to_global(self, host_rows: np.ndarray, leading_dim_sharded=True):
        """uint8[D, ...] host batch -> global array row-sharded over the
        mesh.  Single-process: a plain device_put.  Multi-process: each
        process uploads only its local devices' rows."""
        sh = NamedSharding(
            self.mesh, P(self.axis, *([None] * (host_rows.ndim - 1))))
        if not self._multi:
            return jax.device_put(host_rows, sh)
        pid = jax.process_index()
        shards = [
            jax.device_put(host_rows[i : i + 1], dev)
            for i, dev in enumerate(self.mesh.devices.flat)
            if dev.process_index == pid
        ]
        return jax.make_array_from_single_device_arrays(
            host_rows.shape, sh, shards)

    def local_mesh_positions(self) -> list[int]:
        """Mesh flat positions owned by this process, in flat order — the
        round-robin dealing order of a per-host input shard."""
        pid = jax.process_index()
        return [i for i, dev in enumerate(self.mesh.devices.flat)
                if dev.process_index == pid]

    def to_global_from_local(self, local_rows: np.ndarray):
        """uint8[ldc, ...] host batch (this process's local devices only)
        -> global array row-sharded over the mesh.  Each process uploads
        only what it parsed (per-host input sharding)."""
        sh = NamedSharding(
            self.mesh, P(self.axis, *([None] * (local_rows.ndim - 1))))
        devs = list(self.mesh.devices.flat)
        pos = self.local_mesh_positions()
        assert local_rows.shape[0] == len(pos)
        shards = [jax.device_put(local_rows[j : j + 1], devs[p])
                  for j, p in enumerate(pos)]
        global_shape = (self.D,) + tuple(local_rows.shape[1:])
        return jax.make_array_from_single_device_arrays(
            global_shape, sh, shards)

    # -- state --

    def _init_state(self):
        D, cap, nc = self.D, self.cap, self.n_cols

        def init():
            cols = tuple(jnp.full((D, cap), U32MAX, jnp.uint32)
                         for _ in range(nc))
            n_used = jnp.zeros((D,), jnp.int32)
            occ = jnp.zeros((D, 2), jnp.uint32)
            skm = jnp.zeros((D, 2), jnp.uint32)
            prev = jnp.full((D, 1), INVALID_SIG, jnp.uint32)
            return cols, n_used, occ, skm, prev

        shardings = (tuple(self._rows2 for _ in range(nc)), self._rows,
                     self._rows2, self._rows2, self._rows2)
        (self.cols, self.n_used, self.occ, self.skm, self.prev) = jax.jit(
            init, out_shardings=shardings)()
        self.counts = None

    def _reset_rows(self):
        D, cap, nc = self.D, self.cap, self.n_cols
        jitted = self._jit_cache.get("reset")
        if jitted is None:
            def init():
                cols = tuple(jnp.full((D, cap), U32MAX, jnp.uint32)
                             for _ in range(nc))
                counts = jnp.zeros((D, cap), jnp.uint32)
                n_used = jnp.zeros((D,), jnp.int32)
                return cols, counts, n_used

            shardings = (tuple(self._rows2 for _ in range(nc)), self._rows2,
                         self._rows)
            jitted = self._jit_cache["reset"] = jax.jit(
                init, out_shardings=shardings)
        self.cols, self.counts, self.n_used = jitted()

    def host_sig_map(self) -> np.ndarray:
        if self.map_mode == "greedy":
            return self._sig_map_host
        return prefix_sig_map(self.sig_len, self.prefix_bits)

    # -- ingest --

    def make_ingest(self, *, s, has_counts, fmt="mask"):
        from ..ops.store import _use_pallas_extract

        extract_mode = _use_pallas_extract(s, self.k) or "xla"
        fn = _ingest_shard if fmt == "mask" else _ingest_shard_bounds
        body = functools.partial(
            fn, s=s, k=self.k, sig_len=self.sig_len,
            both_strands=self.both_strands, prefix_bits=self.prefix_bits,
            fuse=self.fuse, n_dead_bin=self.n_dead_bin,
            n_devices=self.D, axis=self.axis, has_counts=has_counts,
            map_mode=self.map_mode, extract_mode=extract_mode,
            chain_perm=self.chain_perm, chain_heads=self.chain_heads,
        )
        nc = self.n_cols
        col_specs = tuple(P(self.axis, None) for _ in range(nc))
        cnt_spec = P(self.axis, None) if has_counts else P()
        feed_spec = (P(self.axis, None),
                     P(self.axis, None) if fmt == "mask" else P(self.axis))
        sharded = jax.shard_map(
            body,
            mesh=self.mesh,
            in_specs=(*feed_spec, col_specs,
                      cnt_spec, P(self.axis), P(self.axis, None),
                      P(self.axis, None), P(self.axis, None), P()),
            out_specs=(col_specs, cnt_spec, P(self.axis), P(self.axis, None),
                       P(self.axis, None), P(self.axis, None)),
            # the Pallas extract's interpret-mode scratch buffers carry no
            # varying-manual-axes set, which trips check_vma inside the
            # kernel; keep the check ON for the plain XLA path
            check_vma=(extract_mode == "xla"),
        )
        donate = (2, 3) if has_counts else (2,)
        return jax.jit(sharded, donate_argnums=donate)

    def ingest(self, packed_dm: np.ndarray, mask_dm: np.ndarray, *, s,
               k=None, sig_len=None, both_strands=None, local=False,
               fmt="mask"):
        """packed_dm/mask_dm: (D, L/4) and (D, L/8) — one batch per device
        (fmt="mask"); with fmt="bounds" they are instead the boundary-delta
        buffers (D, L/4 + 2*cap) and per-device tail_start i32 (D,) —
        25% fewer host-pack + H2D bytes (pack_codes_boundaries).  With
        local=True the leading dim is this process's local device count
        instead (per-host input sharding: each process uploads only the
        batches it parsed)."""
        if self._rows_per_device + s > self.cap:
            self._make_room(s)
        key = ("ingest", s, self.has_counts, fmt)
        self._ingest_fn = self._jit_cache.get(key)
        if self._ingest_fn is None:
            self._ingest_fn = self._jit_cache[key] = self.make_ingest(
                s=s, fmt=fmt, has_counts=self.has_counts)
        counts_in = self.counts if self.has_counts else jnp.zeros((), jnp.uint32)
        up = self.to_global_from_local if local else self.to_global
        sig_map_arg = (self._sig_map_dev if self._sig_map_dev is not None
                       else np.zeros((1,), np.int32))
        (self.cols, counts_out, self.n_used, self.occ, self.skm,
         self.prev) = self._ingest_fn(
            up(packed_dm), up(mask_dm), self.cols,
            counts_in, self.n_used, self.occ, self.skm, self.prev,
            sig_map_arg)
        if self.has_counts:
            self.counts = counts_out
        self._rows_per_device += s

    def _make_room(self, s: int):
        self.compact()
        if self._base_rows + s > self.cap:
            self.spill()
            if s > self.cap:
                raise MemoryError(
                    "batch larger than per-device store capacity")

    # -- compaction / spill --

    def compact(self):
        """Per-device duplicate merge; materializes the counts column."""
        nc = self.n_cols
        col_specs = tuple(P(self.axis, None) for _ in range(nc))
        has = self.has_counts
        key = ("compact", has)
        jitted = self._jit_cache.get(key)
        if jitted is None:
            body = functools.partial(_compact_shard, has_counts=has,
                                     wide=False)
            sharded = jax.shard_map(
                body, mesh=self.mesh,
                in_specs=(col_specs, P(self.axis, None) if has else P(),
                          P(self.axis)),
                out_specs=(col_specs, P(self.axis, None), P(self.axis)),
            )
            donate = (0, 1) if has else (0,)
            jitted = self._jit_cache[key] = jax.jit(sharded,
                                                    donate_argnums=donate)
        counts_in = self.counts if has else jnp.zeros((), jnp.uint32)
        self.cols, self.counts, n_groups = jitted(self.cols, counts_in,
                                                  self.n_used)
        self.has_counts = True
        self.n_compactions += 1
        n_groups = self._host(n_groups)
        self._base_rows = int(n_groups.max())
        self._rows_per_device = self._base_rows
        # n_used must cover every device's groups for the next appends;
        # appending at a uniform offset keeps shapes static, so take the max
        fill = self._jit_cache.get("fill_n_used")
        if fill is None:
            fill = self._jit_cache["fill_n_used"] = jax.jit(
                lambda v: jnp.full((self.D,), v, jnp.int32),
                out_shardings=self._rows)
        self.n_used = fill(jnp.int32(self._base_rows))

    def spill(self):
        """Move the compacted per-device runs to host RAM and reset the
        device partitions.  Every process keeps the full spilled set (the
        runs are re-merged identically everywhere at finalize)."""
        bins_np, words_np, counts_np = self._pull_rows()
        self.spilled.append((bins_np, words_np, counts_np))
        self.n_spills += 1
        self._reset_rows()
        self.has_counts = True
        self._rows_per_device = 0
        self._base_rows = 0
        self._enforce_spill_budget()

    def _spilled_bytes(self) -> int:
        return sum(b.nbytes + w.nbytes + c.nbytes
                   for b, w, c in self.spilled)

    def _enforce_spill_budget(self):
        """-m enforcement: re-merge spilled runs in place when their
        cumulative bytes cross the budget (duplicates across runs
        collapse); a single run still over budget means the unique set
        genuinely exceeds -m (see DeviceKmerStore._enforce_spill_budget)."""
        bud = self.spill_budget_bytes
        if bud is None or self._spilled_bytes() <= bud:
            return
        if len(self.spilled) > 1:
            self._remerge_spilled()
        if self._spilled_bytes() > bud:
            raise MemoryError(
                f"unique k-mer set exceeds the -m/max_ram_gb host budget "
                f"({self._spilled_bytes()} spilled bytes > {bud}); raise -m")

    def _remerge_spilled(self):
        """Collapse every spilled (bins, words, counts) run into one
        sorted unique run — the same lexsort+reduceat merge finalize()
        runs over spills, done early to cap resident spill bytes."""
        bins = np.concatenate([r[0] for r in self.spilled])
        words = np.concatenate([r[1] for r in self.spilled])
        counts = np.concatenate([r[2] for r in self.spilled]).astype(np.uint64)
        order = np.lexsort(
            tuple(words[:, t] for t in range(self.W - 1, -1, -1)) + (bins,))
        bins, words, counts = bins[order], words[order], counts[order]
        if len(bins):
            newg = np.ones(len(bins), bool)
            same = bins[1:] == bins[:-1]
            for t in range(self.W):
                same &= words[1:, t] == words[:-1, t]
            newg[1:] = ~same
            starts = np.flatnonzero(newg)
            totals = np.add.reduceat(counts, starts)
            bins, words = bins[newg], words[newg]
            # device group-reduce saturates at u32: clamp identically
            counts = np.minimum(totals, 0xFFFFFFFF).astype(np.uint32)
        else:
            counts = counts.astype(np.uint32)
        self.spilled = [(bins, words, counts)]

    def _pull_rows(self):
        """Host copy of the live (bins, words, counts) rows of the store."""
        cols = self._host(jnp.concatenate(
            [c.reshape(self.D * self.cap)[None] for c in self.cols], axis=0))
        counts = (self._host(self.counts).reshape(-1)
                  if self.has_counts else None)
        key0 = cols[0]
        live = key0 != U32MAX
        if counts is not None:
            live &= counts > 0
        if self.fuse:
            bins = (key0 >> (2 * self.r0)).astype(np.int64)
            w0 = key0 & np.uint32((1 << (2 * self.r0)) - 1)
            words = np.stack([w0] + [cols[i] for i in range(1, self.n_cols)],
                             axis=1)
        else:
            bins = key0.astype(np.int64)
            words = np.stack([cols[i] for i in range(1, self.n_cols)], axis=1)
        cnt = counts[live] if counts is not None else np.ones(
            int(live.sum()), np.uint32)
        return bins[live], words[live], cnt

    # -- finalize --

    def _owner_plan(self) -> tuple[int, np.ndarray]:
        """(capacity, bounds): contiguous owner boundaries balanced from
        the measured per-bin histogram, plus the exact per-(sender, owner)
        segment size for the exchange (pow2-rounded to bound recompiles).

        Owner o holds bins [bounds[o], bounds[o+1]): because the bin is
        the top bits of the fused key, a plain key sort groups rows by
        owner with NO owner column — each owner's rows are a contiguous
        slice, and the owners' outputs concatenated in device order are
        already in global (bin, k-mer) order (the bin-ordered
        concatenation of the reference completer, kb_completer.cpp:
        131-222, without its bin-permutation step)."""
        nh = self.n_used_bins + 1  # real bins + the dead bin
        if self.D == 1:
            # single owner receives exactly its own live rows — the O(n)
            # per-bin histogram pass is pure overhead (2.4 s at 2^27.6
            # rows on the TPU e2e); capacity is the live row count
            cap = _round_pow2(int(self._host(self.n_used).max()))
            return cap, np.array([0, nh], np.uint32)
        nc = self.n_cols
        col_specs = tuple(P(self.axis, None) for _ in range(nc))
        has = self.has_counts
        key = ("binhist", has)
        jitted = self._jit_cache.get(key)
        if jitted is None:
            body = functools.partial(
                _bin_hist_shard, fuse=self.fuse, r0=self.r0,
                n_hist=nh, has_counts=has)
            sharded = jax.shard_map(
                body, mesh=self.mesh,
                in_specs=(col_specs, P(self.axis, None) if has else P(),
                          P(self.axis)),
                out_specs=P(self.axis, None),
            )
            jitted = self._jit_cache[key] = jax.jit(sharded)
        counts_in = self.counts if has else jnp.zeros((), jnp.uint32)
        hist = self._host(jitted(self.cols, counts_in,
                                 self.n_used)).astype(np.int64)  # (D, nh)
        g = hist.sum(axis=0)
        cum = np.concatenate([np.zeros(1, np.int64), np.cumsum(g)])
        total = int(cum[-1])
        # smallest bin boundary whose cumulative load reaches each owner's
        # even share (exact balance up to the largest single bin)
        targets = (total * np.arange(1, self.D, dtype=np.int64)) // self.D
        inner = np.searchsorted(cum, targets, side="left")
        bounds = np.concatenate(
            [np.zeros(1, np.int64), inner, np.full(1, nh, np.int64)]
        ).astype(np.uint32)
        # exact per-(sender, owner) segment rows from the same histogram
        pc = np.concatenate(
            [np.zeros((self.D, 1), np.int64), np.cumsum(hist, axis=1)],
            axis=1)
        seg = pc[:, bounds[1:]] - pc[:, bounds[:-1]]
        cap = _round_pow2(int(seg.max()) if seg.size else 64)
        return cap, bounds

    def _phase_a(self, capacity_per_owner: int | None = None):
        """Exchange + grouping sort + tile bookkeeping (tiled finalize
        phase A) per owner.  Returns the per-owner phase-A artifacts plus
        the host n_groups."""
        import time as _time

        D = self.D
        _t0 = _time.perf_counter()
        if capacity_per_owner:
            cap = capacity_per_owner
            bounds = self._even_bounds()
        else:
            cap, bounds = self._owner_plan()
        self.timings["owner_hist_s"] = _time.perf_counter() - _t0
        has = self.has_counts
        nc = self.n_cols
        col_specs = tuple(P(self.axis, None) for _ in range(nc))
        counts_in = self.counts if has else jnp.zeros((), jnp.uint32)
        common = dict(k=self.k, fuse=self.fuse, n_devices=D, capacity=cap,
                      axis=self.axis, has_counts=has)
        body_a = functools.partial(_finalize_shard_a, **common)
        sharded_a = jax.shard_map(
            body_a, mesh=self.mesh,
            in_specs=(col_specs, P(self.axis, None) if has else P(),
                      P(self.axis), P()),
            out_specs=(col_specs, P(self.axis, None),
                       P(self.axis, None), P(self.axis, None),
                       P(self.axis), P(self.axis), P(self.axis)),
        )
        _t0 = _time.perf_counter()
        (keys_s_d, before_d, src_t_d, offs_d, n_groups_d, n_live_d,
         dropped_d) = jax.jit(sharded_a, donate_argnums=(0,))(
            self.cols, counts_in, self.n_used, bounds)
        self.cols = None
        self.counts = None
        n_groups = self._host(n_groups_d)
        self.timings["exchange_groupsort_s"] = _time.perf_counter() - _t0
        if int(self._host(dropped_d).sum()):
            raise MemoryError("all_to_all capacity exceeded; raise "
                              "capacity_per_owner or leave it automatic")
        return (keys_s_d, before_d, src_t_d, offs_d, n_groups_d, n_live_d,
                n_groups)

    def _even_bounds(self) -> np.ndarray:
        """Bin-count-even owner boundaries (no histogram pass) — the
        manual-capacity override path."""
        nh = self.n_used_bins + 1
        b = (np.arange(self.D + 1, dtype=np.int64) * nh) // self.D
        return b.astype(np.uint32)

    def _finalize_device(self, capacity_per_owner: int | None = None):
        """Device side of finalize: owner-plan measure + exchange +
        group-reduce.  Returns (bins_d, words_d, counts_d, n_groups) —
        per-owner device arrays where valid rows are a bin-ascending
        prefix and invalid rows (beyond n_groups, merged-away, dead-bin)
        carry bin == -1 / count == 0."""
        import time as _time  # noqa: F401 (both branches time phases)

        D = self.D
        has = self.has_counts
        nc = self.n_cols
        col_specs = tuple(P(self.axis, None) for _ in range(nc))
        if _use_tiled_finalize():
            # two-phase tiled finalize (see ops/store.py): phase A =
            # exchange + grouping sort + tile bookkeeping; phase B compiled
            # at the max-owner OUTPUT size
            from ..ops.store import _out_grain

            (keys_s_d, before_d, src_t_d, offs_d, n_groups_d, n_live_d,
             n_groups) = self._phase_a(capacity_per_owner)
            P128 = int(src_t_d.shape[1])
            grain = _out_grain()
            n_max = int(n_groups.max())
            out = min(P128, ((max(n_max, 1) + grain - 1) // grain) * grain)
            body_b = functools.partial(
                _finalize_shard_b, out=out, k=self.k,
                n_bins=self.n_used_bins, fuse=self.fuse, unit=not has)
            sharded_b = jax.shard_map(
                body_b, mesh=self.mesh,
                in_specs=(col_specs, P(self.axis, None), P(self.axis, None),
                          P(self.axis, None), P(self.axis), P(self.axis)),
                out_specs=(P(self.axis, None), P(self.axis, None, None),
                           P(self.axis, None)),
            )
            _t0 = _time.perf_counter()
            bins_d, words_d, counts_d = jax.jit(
                sharded_b, donate_argnums=(0, 1, 2))(
                keys_s_d, before_d, src_t_d, offs_d, n_groups_d, n_live_d)
            jax.block_until_ready((bins_d, words_d, counts_d))
            self.timings["finalize_exec_s"] = _time.perf_counter() - _t0
        else:
            import time as _time

            _t0 = _time.perf_counter()
            if capacity_per_owner:
                cap = capacity_per_owner
                bounds = self._even_bounds()
            else:
                cap, bounds = self._owner_plan()
            self.timings["owner_hist_s"] = _time.perf_counter() - _t0
            counts_in = (self.counts if has
                         else jnp.zeros((), jnp.uint32))
            body = functools.partial(
                _finalize_shard, n_bins=self.n_used_bins, k=self.k,
                fuse=self.fuse, n_devices=D, capacity=cap, axis=self.axis,
                has_counts=has)
            sharded = jax.shard_map(
                body,
                mesh=self.mesh,
                in_specs=(col_specs, P(self.axis, None) if has else P(),
                          P(self.axis), P()),
                out_specs=(P(self.axis, None), P(self.axis, None, None),
                           P(self.axis, None), P(self.axis), P(self.axis)),
            )
            jitted = jax.jit(sharded, donate_argnums=(0,))
            bins_d, words_d, counts_d, n_groups_d, dropped_d = jitted(
                self.cols, counts_in, self.n_used, bounds)
            self.cols = None
            self.counts = None
            n_groups = self._host(n_groups_d)
            if int(self._host(dropped_d).sum()):
                # cannot happen with the measured capacity; only a manual
                # capacity_per_owner override can get here
                raise MemoryError("all_to_all capacity exceeded; raise "
                                  "capacity_per_owner or leave it automatic")
        return bins_d, words_d, counts_d, n_groups

    def finalize(self, sig_map=None, *, cutoff_min, cutoff_max, counter_max,
                 capacity_per_owner: int | None = None):
        """Exchange + group-reduce; returns host arrays (bins, words, counts)
        in global (bin, k-mer) order plus stats, reassembled across owners
        and spilled runs.  Cutoffs apply to the MERGED totals (spilled rows
        included), exactly like the single-chip host merge."""
        import time as _time

        D = self.D
        bins_d, words_d, counts_d, n_groups = self._finalize_device(
            capacity_per_owner)
        _t0 = _time.perf_counter()
        bins_h = self._host(bins_d)
        words_h = self._host(words_d)
        counts_h = self._host(counts_d)
        self.timings["finalize_d2h_s"] = _time.perf_counter() - _t0
        _t0 = _time.perf_counter()
        # host reassembly: owners hold disjoint bins; concat then stable
        # sort by bin only (rows within a bin are already k-mer sorted)
        parts_b, parts_w, parts_c = [], [], []
        for d in range(D):
            n = int(n_groups[d])
            b = bins_h[d, :n]
            c = counts_h[d, :n]
            keep = (b >= 0) & (c > 0)
            parts_b.append(b[keep].astype(np.int64))
            parts_w.append(words_h[d, :n][keep])
            parts_c.append(c[keep])
        for sb, sw, sc in self.spilled:
            parts_b.append(sb)
            parts_w.append(sw)
            parts_c.append(sc)
        self.timings["reassembly_slice_s"] = _time.perf_counter() - _t0
        if self.spilled:
            # spilled rows may duplicate exchanged rows: re-reduce on host
            bins = (np.concatenate(parts_b) if parts_b
                    else np.zeros(0, np.int64))
            words = (np.concatenate(parts_w) if parts_w
                     else np.zeros((0, self.W), np.uint32))
            counts = (np.concatenate(parts_c) if parts_c
                      else np.zeros(0, np.uint32))
            order = np.lexsort(
                tuple(words[:, t] for t in range(self.W - 1, -1, -1))
                + (bins,))
            bins, words, counts = bins[order], words[order], counts[order]
            if len(bins):
                newg = np.ones(len(bins), bool)
                same = bins[1:] == bins[:-1]
                for t in range(self.W):
                    same &= words[1:, t] == words[:-1, t]
                newg[1:] = ~same
                gid = np.cumsum(newg) - 1
                tot = np.zeros(gid[-1] + 1, np.uint64)
                np.add.at(tot, gid, counts.astype(np.uint64))
                bins = bins[newg]
                words = words[newg]
                counts = np.minimum(tot, 0xFFFFFFFF).astype(np.uint32)
            self.spilled = []
        elif len(parts_b) > 1:
            # owner o holds the CONTIGUOUS bin range [bounds[o],
            # bounds[o+1]) and each part is (bin, k-mer)-sorted, so global
            # order is simply the parts concatenated in device order —
            # no slicing, no row sort (the per-bin interleave this
            # replaces was itself the fix for a 6.3 s stable argsort)
            bins = np.concatenate(parts_b)
            words = np.concatenate(parts_w)
            counts = np.concatenate(parts_c)
        else:
            bins = (parts_b[0] if parts_b else np.zeros(0, np.int64))
            words = (parts_w[0] if parts_w
                     else np.zeros((0, self.W), np.uint32))
            counts = (parts_c[0] if parts_c else np.zeros(0, np.uint32))
        self.timings["host_reassembly_s"] = _time.perf_counter() - _t0
        n_unique = int(len(bins))
        n_below = int((counts < cutoff_min).sum())
        n_above = int((counts > cutoff_max).sum())
        keep = (counts >= cutoff_min) & (counts <= cutoff_max)
        return (
            bins[keep].astype(np.int32),
            words[keep],
            np.minimum(counts[keep], counter_max).astype(np.uint32),
            (n_unique, n_below, n_above),
            self._total64(self.occ_host()),
            self._total64(self._host(self.skm)),
        )

    def finalize_packed(self, *, cutoff_min, cutoff_max, counter_max,
                        counter_size: int,
                        capacity_per_owner: int | None = None):
        """Like finalize(), but the device packs each kept row into its
        on-disk byte form (kb big-endian k-mer bytes + counter_size LE
        counter bytes) before the transfer — half the device->host bytes
        of the raw path.  Returns (rec u8[n, kb+cs] in global (bin,
        k-mer) order, kept-rows-per-bin hist, (n_unique, n_below,
        n_above), n_total, n_super_kmers).  Requires no spilled runs
        (spill merging needs the raw totals; callers fall back to
        finalize())."""
        import time as _time

        if self.spilled:
            raise RuntimeError("finalize_packed cannot merge spilled runs;"
                               " use finalize()")
        from ..ops.store import _pipeline_chunks

        chunk = _pipeline_chunks() if _use_tiled_finalize() else 0
        if chunk:
            return self._finalize_packed_pipelined(
                chunk=chunk, cutoff_min=cutoff_min, cutoff_max=cutoff_max,
                counter_max=counter_max, counter_size=counter_size,
                capacity_per_owner=capacity_per_owner)
        D = self.D
        bins_d, words_d, counts_d, n_groups = self._finalize_device(
            capacity_per_owner)
        n_bins = self.n_used_bins
        key = ("packC", bins_d.shape, counter_size, int(cutoff_min),
               int(cutoff_max), int(counter_max))
        jitted = self._jit_cache.get(key)
        if jitted is None:
            body = functools.partial(
                _pack_records_shard, k=self.k, n_bins=n_bins,
                counter_size=counter_size, counter_max=counter_max,
                cutoff_min=cutoff_min, cutoff_max=cutoff_max)
            sharded = jax.shard_map(
                body, mesh=self.mesh,
                in_specs=(P(self.axis, None), P(self.axis, None, None),
                          P(self.axis, None)),
                out_specs=(P(self.axis, None, None), P(self.axis, None),
                           P(self.axis, None), P(self.axis, None)),
            )
            jitted = self._jit_cache[key] = jax.jit(
                sharded, donate_argnums=(0, 1, 2))
        _t0 = _time.perf_counter()
        rec_d, kbits_d, hist_d, stats_d = jitted(bins_d, words_d, counts_d)
        jax.block_until_ready(rec_d)
        self.timings["finalize_exec_s"] = (
            self.timings.get("finalize_exec_s", 0.0)
            + _time.perf_counter() - _t0)
        _t0 = _time.perf_counter()
        for a in (rec_d, kbits_d, hist_d, stats_d):
            try:
                a.copy_to_host_async()
            except AttributeError:
                pass
        rec_h = self._host(rec_d)
        kbits_h = self._host(kbits_d)
        hist_h = self._host(hist_d).astype(np.int64)
        stats_h = self._host(stats_d).astype(np.int64)
        self.timings["finalize_d2h_s"] = _time.perf_counter() - _t0
        _t0 = _time.perf_counter()
        out = rec_h.shape[1]
        parts = []
        for d in range(D):
            mask = np.unpackbits(kbits_h[d],
                                 bitorder="little")[:out].astype(bool)
            parts.append(rec_h[d][mask])
        # owner o holds the contiguous bin range [bounds[o], bounds[o+1]):
        # device-order concatenation IS global (bin, k-mer) order
        rec = np.concatenate(parts) if D > 1 else parts[0]
        self.timings["host_reassembly_s"] = _time.perf_counter() - _t0
        hist = hist_h.sum(axis=0)
        n_unique = int(stats_h[:, 0].sum())
        n_below = int(stats_h[:, 1].sum())
        n_above = int(stats_h[:, 2].sum())
        return (rec, hist, (n_unique, n_below, n_above),
                self._total64(self.occ_host()),
                self._total64(self._host(self.skm)))

    def _finalize_packed_pipelined(self, *, chunk, cutoff_min, cutoff_max,
                                   counter_max, counter_size,
                                   capacity_per_owner=None):
        """Chunked packed finalize: phase A once, then phase B+C in
        `chunk`-row chunks per owner with a traced start scalar — ONE
        compiled executable for every chunk, all chunks dispatched with
        their D2H copies queued async, consumed in order so chunk c's
        transfer + host assembly overlap chunk c+1's device execution
        (the sharded port of the single-chip KMC_TPU_PIPELINE_D2H path).
        Same return contract as finalize_packed."""
        import time as _time

        D = self.D
        n_bins = self.n_used_bins
        unit = not self.has_counts
        (keys_s_d, before_d, src_t_d, offs_d, n_groups_d, n_live_d,
         n_groups) = self._phase_a(capacity_per_owner)
        P128 = int(src_t_d.shape[1])
        chunk = min(max(32, (chunk + 31) & ~31), P128)
        n_max = int(n_groups.max())
        n_chunks = -(-max(n_max, 1) // chunk)
        body = functools.partial(
            _finalize_shard_bc, chunk=chunk, k=self.k, n_bins=n_bins,
            fuse=self.fuse, counter_size=counter_size,
            counter_max=counter_max, cutoff_min=cutoff_min,
            cutoff_max=cutoff_max, unit=unit)
        col_specs = tuple(P(self.axis, None) for _ in range(self.n_cols))
        sharded = jax.shard_map(
            body, mesh=self.mesh,
            in_specs=(col_specs, P(self.axis, None), P(self.axis, None),
                      P(self.axis, None), P(self.axis), P(self.axis), P()),
            out_specs=(P(self.axis, None, None), P(self.axis, None),
                       P(self.axis, None), P(self.axis, None)),
        )
        jitted = jax.jit(sharded)
        _t0 = _time.perf_counter()
        parts = []
        for c in range(n_chunks):
            out = jitted(keys_s_d, before_d, src_t_d, offs_d, n_groups_d,
                         n_live_d, jnp.int32(c * chunk))
            for a in out:
                try:
                    a.copy_to_host_async()
                except AttributeError:
                    pass
            parts.append(out)
        # chunk-0 stats completion = the exec side of the timer split (the
        # remaining chunks' exec overlaps the consumption loop below)
        st0 = self._host(parts[0][3]).astype(np.int64)
        self.timings["finalize_exec_s"] = _time.perf_counter() - _t0
        _t0 = _time.perf_counter()
        n_unique = int(st0[:, 0].sum())
        n_below = int(st0[:, 1].sum())
        n_above = int(st0[:, 2].sum())
        hist = np.zeros(n_bins, np.int64)
        owner_parts: list[list[np.ndarray]] = [[] for _ in range(D)]
        rb = (self.k + 3) // 4 + counter_size
        for c, (rec_c, kbits_c, hist_c, st_c) in enumerate(parts):
            rec_h = self._host(rec_c)      # (D, chunk, rb)
            kb_h = self._host(kbits_c)     # (D, chunk // 8)
            hist += self._host(hist_c).astype(np.int64).sum(axis=0)
            if c:
                st = self._host(st_c).astype(np.int64)
                n_unique += int(st[:, 0].sum())
                n_below += int(st[:, 1].sum())
                n_above += int(st[:, 2].sum())
            for d in range(D):
                mask = np.unpackbits(kb_h[d], bitorder="little").astype(bool)
                owner_parts[d].append(rec_h[d][mask])
        # owner o holds the contiguous bin range [bounds[o], bounds[o+1]):
        # (owner, chunk) order IS global (bin, k-mer) order
        flat = [p for d in range(D) for p in owner_parts[d] if len(p)]
        rec = (np.concatenate(flat) if flat
               else np.zeros((0, rb), np.uint8))
        self.timings["finalize_d2h_s"] = _time.perf_counter() - _t0
        self.timings["host_reassembly_s"] = 0.0
        return (rec, hist, (n_unique, n_below, n_above),
                self._total64(self.occ_host()),
                self._total64(self._host(self.skm)))

    def finalize_records(self, *, cutoff_min, cutoff_max, counter_max,
                         lut_prefix_len, counter_size,
                         capacity_per_owner=None):
        """Sharded analogue of DeviceKmerStore.finalize_records: the
        device completer emits the exact on-disk record payload (suffix
        big-endian k-mer bytes + LE counter) AND the (bin, prefix) LUT,
        chunked with a traced start so each chunk's D2H + host assembly
        overlap the next chunk's execution.  Returns (rec u8[n, rb] in
        global (bin, k-mer) order keep-filtered, lut u64, (n_unique,
        n_below, n_above), n_total, n_super_kmers).  Requires no spilled
        runs (callers fall back to finalize())."""
        import time as _time

        if self.spilled:
            raise RuntimeError("finalize_records cannot merge spilled "
                               "runs; use finalize()")
        from ..ops.store import _out_grain, _pipeline_chunks

        D = self.D
        n_bins = self.n_used_bins
        unit = not self.has_counts
        (keys_s_d, before_d, src_t_d, offs_d, n_groups_d, n_live_d,
         n_groups) = self._phase_a(capacity_per_owner)
        P128 = int(src_t_d.shape[1])
        chunk = _pipeline_chunks() or _out_grain()
        chunk = min(max(32, (chunk + 31) & ~31), P128)
        n_max = int(n_groups.max())
        n_chunks = -(-max(n_max, 1) // chunk)
        kw = dict(cutoff_min=cutoff_min, cutoff_max=cutoff_max,
                  counter_max=counter_max, k=self.k,
                  lut_prefix_len=lut_prefix_len,
                  counter_size=counter_size, n_bins=n_bins,
                  fuse=self.fuse)
        body = functools.partial(_finalize_shard_rc, chunk=chunk,
                                 unit=unit, **kw)
        col_specs = tuple(P(self.axis, None) for _ in range(self.n_cols))
        # record byte planes: variable count/dtypes — all (d, chunk)
        suffix_bytes = ((self.k - lut_prefix_len) // 4 if lut_prefix_len
                        else (self.k + 3) // 4)
        record_bytes = suffix_bytes + counter_size
        n_planes = 0
        c0 = 0
        while c0 < record_bytes:
            rem = record_bytes - c0
            c0 += 4 if rem >= 4 else 2 if rem >= 2 else 1
            n_planes += 1
        sharded = jax.shard_map(
            body, mesh=self.mesh,
            in_specs=(col_specs, P(self.axis, None), P(self.axis, None),
                      P(self.axis, None), P(self.axis), P(self.axis), P()),
            out_specs=(tuple(P(self.axis, None) for _ in range(n_planes)),
                       P(self.axis, None), P(self.axis, None),
                       P(self.axis, None)),
        )
        jitted = jax.jit(sharded)
        _t0 = _time.perf_counter()
        parts = []
        for c in range(n_chunks):
            out = jitted(keys_s_d, before_d, src_t_d, offs_d, n_groups_d,
                         n_live_d, jnp.int32(c * chunk))
            for grp in out:
                for a in (grp if isinstance(grp, tuple) else (grp,)):
                    try:
                        a.copy_to_host_async()
                    except AttributeError:
                        pass
            parts.append(out)
        st0 = self._host(parts[0][3]).astype(np.int64)
        self.timings["finalize_exec_s"] = _time.perf_counter() - _t0
        _t0 = _time.perf_counter()
        n_unique = int(st0[:, 0].sum())
        n_below = int(st0[:, 1].sum())
        n_above = int(st0[:, 2].sum())
        lut = None
        owner_parts: list[list[np.ndarray]] = [[] for _ in range(D)]
        for c, (cols_c, keep_c, lut_c, st_c) in enumerate(parts):
            kb_h = self._host(keep_c)  # (D, chunk // 32) u32 MSB-first
            lc = self._host(lut_c).astype(np.uint64).sum(axis=0)
            lut = lc if lut is None else lut + lc
            if c:
                st = self._host(st_c).astype(np.int64)
                n_unique += int(st[:, 0].sum())
                n_below += int(st[:, 1].sum())
                n_above += int(st[:, 2].sum())
            planes = [self._host(p) for p in cols_c]  # (D, chunk) each
            for d in range(D):
                keep_h = np.unpackbits(
                    kb_h[d].astype(">u4").view(np.uint8)).astype(bool)
                rec_h = np.empty((chunk, record_bytes), np.uint8)
                off = 0
                for p in planes:
                    a = p[d]
                    w = a.dtype.itemsize
                    rec_h[:, off : off + w] = (
                        a.astype(">u%d" % w).view(np.uint8).reshape(chunk, w))
                    off += w
                owner_parts[d].append(rec_h[keep_h])
        flat = [p for d in range(D) for p in owner_parts[d] if len(p)]
        rec = (np.concatenate(flat) if flat
               else np.zeros((0, record_bytes), np.uint8))
        self.timings["finalize_d2h_s"] = _time.perf_counter() - _t0
        self.timings["host_reassembly_s"] = 0.0
        return (rec, lut, (n_unique, n_below, n_above),
                self._total64(self.occ_host()),
                self._total64(self._host(self.skm)))

    def barrier(self):
        """Block until all dispatched device work (ingest/compact) has
        executed — lets callers split host-parse+dispatch wall time from
        device execution when measuring."""
        for c in self.cols or ():
            jax.block_until_ready(c)
        if self.counts is not None:
            jax.block_until_ready(self.counts)
        jax.block_until_ready(self.n_used)

    def occ_host(self):
        return self._host(self.occ)

    @staticmethod
    def _total64(acc2: np.ndarray) -> int:
        return int(sum(int(lo) + (int(hi) << 32) for lo, hi in acc2))


def _auto_threads() -> int:
    import os as _os

    try:
        return len(_os.sched_getaffinity(0))
    except AttributeError:
        return _os.cpu_count() or 1


def _hc_wrap(gen):
    """Homopolymer compression over a code-chunk stream with cross-chunk
    run carry (reference splitter.cpp:424-435; mirrors Runner._chunks)."""
    from ..io.readers import homopolymer_compress_codes

    prev_last = -1
    for chunk in gen:
        chunk = homopolymer_compress_codes(chunk)
        if len(chunk) and chunk[0] == prev_last:
            chunk = chunk[1:]
        if len(chunk):
            prev_last = int(chunk[-1])
        yield chunk


def _estimator_wrap(gen, est):
    for chunk in gen:
        est.process_codes(chunk)
        yield chunk


def _process_chunk_gen(input_files, fmt, state, *, shard_input,
                       n_parse_threads, min_shard_bytes):
    """This process's code-chunk stream: a disjoint record-aligned input
    shard when shard_input (gz/BAM/-fkmc files as atomic units), else the
    full stream (legacy duplicated parse)."""
    from ..io.readers import (file_code_stream, process_input_shards,
                              shard_code_stream)

    if not shard_input:
        return file_code_stream(input_files, fmt, state)
    n_th = n_parse_threads or _auto_threads()
    if fmt in ("fastq", "fasta", "multifasta"):
        parts = process_input_shards(input_files, fmt, jax.process_count(),
                                     min_shard_bytes=min_shard_bytes)
        my = parts[jax.process_index()]
        return shard_code_stream(my, fmt, state, n_threads=n_th)
    # BAM / -fkmc inputs: whole files are the shard units

    def _sz(p):
        pp = Path(p)
        if pp.exists():
            return pp.stat().st_size
        suf = Path(str(p) + ".kmc_suf")  # -fkmc takes a DB prefix
        return suf.stat().st_size if suf.exists() else 0

    sizes = [_sz(p) for p in input_files]
    total = sum(sizes) or 1
    n_procs, pid = jax.process_count(), jax.process_index()
    my_files, acc = [], 0
    for path, sz in zip(input_files, sizes):
        mid = acc + sz / 2
        if min(int(mid * n_procs / total), n_procs - 1) == pid:
            my_files.append(path)
        acc += sz

    def gen():
        if fmt == "bam":
            from ..io.bam import bam_code_chunks

            for path in my_files:
                for codes, n_reads in bam_code_chunks(
                        path, True, n_threads=n_th):
                    state.n_reads += n_reads
                    state.consumed_bytes += 0
                    yield codes
        elif fmt == "kmc":
            from ..runner import kmc_db_code_chunks

            yield from kmc_db_code_chunks(my_files, state)
        else:
            raise ValueError(f"unsupported input_file_type {fmt!r}")

    return gen()


def _prefetch_groups(gen, depth: int = 2):
    """Producer thread for the ingest loop: parse+pack of group g+1
    overlaps the H2D upload + dispatch of group g (the sharded analogue
    of the single-chip Runner's transfer thread; docs/PERFORMANCE.md
    "What mattered" #7).  Single-process only — in multi-controller runs
    the lockstep allgather inside the generator must stay on the main
    thread with the other collectives."""
    import queue as _queue
    import threading

    q: "_queue.Queue" = _queue.Queue(maxsize=depth)
    err: list = []
    stop = threading.Event()

    def run():
        try:
            for item in gen:
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.2)
                        break
                    except _queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:  # re-raised by the consumer
            err.append(e)
        finally:
            # the end-of-stream sentinel MUST land (a dropped sentinel
            # hangs the consumer); block for space unless the consumer
            # already signalled it is gone
            while not stop.is_set():
                try:
                    q.put(None, timeout=0.2)
                    break
                except _queue.Full:
                    continue

    t = threading.Thread(target=run, daemon=True, name="kmc-ingest-feed")
    t.start()
    try:
        while True:
            item = q.get()
            if item is None:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        # consumer abandoned mid-stream (exception in ingest): release
        # the producer instead of leaving it parked on a full queue
        stop.set()
        while True:
            try:
                q.get_nowait()
            except _queue.Empty:
                break


def _sharded_bounds() -> bool:
    """KMC_TPU_SHARDED_BOUNDS=1 feeds the sharded ingest the 0.28 B/base
    boundary-delta format.  Default OFF: measured on the real chip
    (2026-08-21, two runs), the boundary unpack's scatter lowers WORSE
    under shard_map than on the single-device path — sharded ingest_wall
    3.8-3.9 s vs 2.3-2.5 s with packed+mask on the bench workload — so
    the sharded default stays packed+mask (byte-identical either way;
    tests cover both formats)."""
    import os as _os

    return _os.environ.get("KMC_TPU_SHARDED_BOUNDS", "0") == "1"


def _lockstep_groups(batch_iter, ldc, multi, L, boundaries=False):
    """Yield ldc-local-batch groups; in multi-process mode every process
    yields the SAME number of groups (lockstep via a per-group flag
    allgather), padding with invalid batches once its own shard runs dry —
    so global collective dispatch counts always agree.

    boundaries=False: yields ("mask", packed, mask) — the 0.375 B/base
    packed+mask format.  boundaries=True: yields ("bounds", bufs, tails)
    when EVERY batch of the group (fleet-wide, via the same allgather)
    admits the 0.28 B/base boundary-delta format, else falls back to
    ("mask", ...) for that group — the whole fleet always dispatches the
    same program."""
    from ..io.native import pack_codes, pack_codes_boundaries

    if multi:
        from jax.experimental import multihost_utils
    done = False
    while True:
        raw = []
        while len(raw) < ldc and not done:
            try:
                raw.append(next(batch_iter))
            except StopIteration:
                done = True
                break
        have = len(raw) > 0
        while len(raw) < ldc:  # pad missing local shards with invalid codes
            raw.append(np.full(L, 4, np.uint8))
        packed_b = None
        if boundaries:
            packed_b = [pack_codes_boundaries(b) for b in raw]
            bounds_ok = all(buf is not None for buf, _ in packed_b)
        else:
            bounds_ok = False
        if multi:
            flags = np.asarray(multihost_utils.process_allgather(
                np.array([have, bounds_ok], dtype=np.int32)))
            flags = flags.reshape(-1, 2)
            cont = bool(flags[:, 0].any())
            use_bounds = bool(flags[:, 1].all())
        else:
            cont = have
            use_bounds = bounds_ok
        if not cont:
            return
        if use_bounds:
            yield ("bounds",
                   np.stack([buf for buf, _ in packed_b]),
                   np.array([ts for _, ts in packed_b], np.int32))
        else:
            pm = [pack_codes(b) for b in raw]
            yield ("mask", np.stack([p for p, _ in pm]),
                   np.stack([m for _, m in pm]))


def _allsum_scalar(x: int, multi: bool) -> int:
    if not multi:
        return int(x)
    from jax.experimental import multihost_utils

    arr = multihost_utils.process_allgather(np.array([x], dtype=np.int64))
    return int(np.asarray(arr).sum())


def _merge_estimator_multihost(est):
    """Exact cross-process merge of the ntCard sketch: counter increments
    commute, so the merged sketch is the elementwise sum.  Transported as
    padded COO (the sketches are sparse at sampling rate 2^-s) through
    process_allgather."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    for ci in range(len(est.counters)):
        ctr = est.counters[ci]
        nz = np.flatnonzero(ctr).astype(np.int32)
        n = np.array([len(nz)], dtype=np.int32)
        ns = np.asarray(multihost_utils.process_allgather(n)).reshape(-1)
        m = int(ns.max())
        if m == 0:
            continue
        idx = np.full(m, -1, np.int32)
        idx[: len(nz)] = nz
        val = np.zeros(m, np.uint32)
        val[: len(nz)] = ctr[nz]
        all_idx = np.asarray(multihost_utils.process_allgather(idx))
        all_val = np.asarray(multihost_utils.process_allgather(val))
        merged = np.zeros_like(ctr)
        for p in range(all_idx.shape[0]):
            ii, vv = all_idx[p], all_val[p]
            sel = ii >= 0
            np.add.at(merged, ii[sel].astype(np.int64), vv[sel])
        est.counters[ci] = merged


def _stage0_greedy_map(input_files, fmt, *, k, sig_len, n_bins,
                       batch_positions, homopolymer_compressed):
    """Sampled signature histogram -> the reference's greedy balanced map
    (s_mapper.h:141-235).  Every process samples the SAME global input
    prefix (the reference samples the stream start too, defs.h:37), so the
    map is identical fleet-wide without any exchange."""
    from .. import defs
    from ..io.native import pack_codes
    from ..io.readers import BatchStream, ParseState, file_code_stream
    from ..ops.extract import stage0_stats_accum
    from ..signatures import build_signature_map, map_size

    s = batch_positions
    bs = BatchStream(s, k)
    msize = map_size(sig_len)
    dev_hist = jnp.zeros((msize,), jnp.uint32)
    gen = file_code_stream(input_files, fmt, ParseState(),
                           max_bytes=defs.STATS_SAMPLE_BYTES)
    if homopolymer_compressed:
        gen = _hc_wrap(gen)
    for batch in bs.batches(gen):
        packed, mask = pack_codes(batch)
        dev_hist = stage0_stats_accum(packed, mask, dev_hist, s=s, k=k,
                                      sig_len=sig_len)
    hist = np.asarray(dev_hist, dtype=np.uint64)
    return build_signature_map(hist, sig_len, n_bins)


def _distributed_smallk(input_files, output_file_name, *, k, mesh,
                        cutoff_min, cutoff_max, counter_max, both_strands,
                        batch_positions, input_file_type, output_type,
                        shard_input, n_parse_threads, min_shard_bytes,
                        homopolymer_compressed, axis="d"):
    """Multi-chip small-k (k<=13) dense counting: each device accumulates a
    4^k+1 histogram partition over its batches (no binning, no exchange —
    the reference's small-k optimization, kmc.h:677-970), summed across the
    mesh at the end; process 0 writes the KMC1 database."""
    from ..io.readers import BatchStream, ParseState
    from ..ops.smallk import _smallk_core, smallk_histogram_shape
    from ..runner import smallk_finalize_and_write

    D = mesh.devices.size
    multi = jax.process_count() > 1
    s = batch_positions
    bs = BatchStream(s, k)
    H = smallk_histogram_shape(k)[0]
    rows2 = NamedSharding(mesh, P(axis, None))

    hist = jax.jit(lambda: jnp.zeros((D, H), jnp.uint32),
                   out_shardings=rows2)()

    def body(packed, mask, h):
        c4, bad = _unpack_device(packed[0], mask[0])
        return _smallk_core(c4, bad, h[0], s=s, k=k,
                            both_strands=both_strands)[None]

    sharded = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis, None)),
        out_specs=P(axis, None))
    step = jax.jit(sharded, donate_argnums=(2,))

    state = ParseState()
    gen = _process_chunk_gen(input_files, input_file_type, state,
                             shard_input=shard_input,
                             n_parse_threads=n_parse_threads,
                             min_shard_bytes=min_shard_bytes)
    if homopolymer_compressed:
        gen = _hc_wrap(gen)
    pid = jax.process_index()
    local = [i for i, dev in enumerate(mesh.devices.flat)
             if dev.process_index == pid]
    ldc = len(local) if shard_input else D

    def up(rows):
        if not shard_input and not multi:
            return jax.device_put(rows, rows2)
        devs = list(mesh.devices.flat)
        pos = local if shard_input else list(range(D))
        mine = [(j, p) for j, p in enumerate(pos)
                if devs[p].process_index == pid]
        shards = [jax.device_put(rows[j : j + 1], devs[p]) for j, p in mine]
        return jax.make_array_from_single_device_arrays(
            (D,) + tuple(rows.shape[1:]), NamedSharding(
                mesh, P(axis, *([None] * (rows.ndim - 1)))), shards)

    for _fmt, packed, mask in _lockstep_groups(bs.batches(gen), ldc, multi,
                                               bs.batch_bytes):
        hist = step(up(packed), up(mask), hist)

    total = jax.jit(lambda h: jnp.sum(h, axis=0),
                    out_shardings=NamedSharding(mesh, P()))(hist)
    hist_np = np.asarray(total)[:-1].astype(np.uint64)
    n_reads_local = state.n_reads
    n_reads = _allsum_scalar(state.n_reads, multi) if shard_input else \
        state.n_reads

    stats = smallk_finalize_and_write(
        hist_np, k, cutoff_min=cutoff_min, cutoff_max=cutoff_max,
        counter_max=counter_max, canonical=both_strands,
        output_file_name=output_file_name,
        output_kff=output_type == "kff",
        write=jax.process_index() == 0)
    n_unique, n_below, n_above, n_total = stats
    return {
        "n_unique": n_unique,
        "n_below": n_below,
        "n_above": n_above,
        "n_total": n_total,
        "n_super_kmers": 0,  # small-k skips binning (no super-k-mers)
        "n_reads": n_reads,
        "n_reads_local": n_reads_local,
        "consumed_bytes_local": state.consumed_bytes,
        "n_devices": D,
        "n_processes": jax.process_count(),
        "was_small_k_opt_used": True,
    }


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
    output_type: str = "kmc",
    shard_input: bool = True,
    n_parse_threads: int | None = None,
    min_shard_bytes: int = 32 << 20,
    homopolymer_compressed: bool = False,
    signature_map_policy: str = "prefix",
    strict_memory_mode: bool = False,
    estimate_only: bool = False,
    opt_out_size: bool = False,
    max_ram_gb: int = 12,
):
    """End-to-end multi-chip counting: data-parallel ingest over the mesh,
    owner-partitioned merge, KMC2 database out.  Returns stats dict.

    Feature parity with the single-chip Runner (VERDICT r2 missing #3):
      k <= 13          dense 4^k small-k path, KMC1 output (kmc.h:677-970)
      homopolymer_compressed   -hc run collapse (splitter.cpp:424-435)
      both_strands=False       non-canonical counting (-b)
      signature_map_policy     "prefix" (default) or the reference's
                               sampled greedy map (s_mapper.h:141-235)
      strict_memory_mode       halved per-device store (spill machinery
                               covers the overflow, kmc.h:1611-1692)
      estimate_only            -e: ntCard histogram estimate, no counting
      opt_out_size             --opt-out-size: estimate drives the
                               lut_prefix_len choice (kmc.h:1436-1447)
      input_file_type          fastq/fasta/multifasta/bam/kmc (-fkmc)

    Multi-host: runs as the same program on every process (call
    init_multihost first).  With shard_input=True (default) each process
    parses only a DISJOINT record-aligned byte-range shard of the input
    with N parser threads (io.readers.process_input_shards /
    shard_code_stream — the multi-host analogue of the reference giving
    each reader thread distinct files, kmc.h:276-292) and uploads only its
    local devices' batches; total host parse work is constant as process
    count grows.  shard_input=False keeps the legacy duplicated-parse path
    (every process parses everything, uploads local slices).  Process 0
    writes the database; output bytes are identical either way."""
    import os as _os

    from ..defs import calc_counter_size
    from ..formats.kmc_db import (DbInfo, Kmc2DbWriter,
                                  kmer_bytes_to_prefix_ids,
                                  pick_lut_prefix_len)
    from ..io.readers import BatchStream, ParseState, file_code_stream
    from ..runner import words_to_kmer_bytes

    mesh = mesh or make_mesh()
    D = mesh.devices.size
    s = batch_positions
    multi = jax.process_count() > 1

    if k <= 13 and not estimate_only:
        # forced small-k, like the reference when k < signature_len
        return _distributed_smallk(
            input_files, output_file_name, k=k, mesh=mesh,
            cutoff_min=cutoff_min, cutoff_max=cutoff_max,
            counter_max=counter_max, both_strands=both_strands,
            batch_positions=batch_positions,
            input_file_type=input_file_type, output_type=output_type,
            shard_input=shard_input, n_parse_threads=n_parse_threads,
            min_shard_bytes=min_shard_bytes,
            homopolymer_compressed=homopolymer_compressed)

    est = None
    if estimate_only or opt_out_size:
        from ..ops.nthash import NtCardEstimator

        predicted = sum(Path(p).stat().st_size for p in input_files
                        if Path(p).exists())
        est = NtCardEstimator(k, s=7 if predicted < 50_000_000_000 else 11)

    state = ParseState()
    if estimate_only:
        # -e: per-process sketch over its shard, exact cross-process merge
        gen = _process_chunk_gen(input_files, input_file_type, state,
                                 shard_input=shard_input,
                                 n_parse_threads=n_parse_threads,
                                 min_shard_bytes=min_shard_bytes)
        if homopolymer_compressed:
            gen = _hc_wrap(gen)
        for chunk in gen:
            est.process_codes(chunk)
        _merge_estimator_multihost(est)
        n_reads_local = state.n_reads
        return {
            "estimated_histogram": est.estimate_histogram(),
            "n_reads": _allsum_scalar(state.n_reads, multi and shard_input),
            "n_reads_local": n_reads_local,
            "consumed_bytes_local": state.consumed_bytes,
            "n_devices": D,
            "n_processes": jax.process_count(),
        }

    sig_map = None
    if signature_map_policy == "greedy":
        sig_map = _stage0_greedy_map(
            input_files, input_file_type, k=k, sig_len=sig_len,
            n_bins=n_bins, batch_positions=batch_positions,
            homopolymer_compressed=homopolymer_compressed)

    # -m carve (memory.plan_memory; AdjustMemoryLimits analogue): the
    # explicit per-device capacity wins, strict-memory halves either way,
    # spilled host runs are budget-enforced
    from ..memory import plan_memory

    plan = plan_memory(max_ram_gb, k=k, batch_positions=s,
                       n_threads=n_parse_threads or _auto_threads(),
                       strict_memory=strict_memory_mode,
                       requested_rows=capacity_rows_per_device)
    capacity = max(plan.device_store_rows, 2 * s)

    store = ShardedKmerStore(mesh, capacity, k=k,
                             sig_len=sig_len, both_strands=both_strands,
                             n_bins=n_bins,
                             chain="per_host" if shard_input else "global",
                             map_mode=signature_map_policy, sig_map=sig_map,
                             spill_budget_bytes=plan.spill_budget_bytes)
    bs = BatchStream(s, k)
    L = bs.batch_bytes

    import time as _time

    _t_ingest0 = _time.perf_counter()
    if shard_input:
        gen = _process_chunk_gen(input_files, input_file_type, state,
                                 shard_input=True,
                                 n_parse_threads=n_parse_threads,
                                 min_shard_bytes=min_shard_bytes)
        if homopolymer_compressed:
            gen = _hc_wrap(gen)
        if est is not None:
            gen = _estimator_wrap(gen, est)
        ldc = len(store.local_mesh_positions())
        groups = _lockstep_groups(bs.batches(gen), ldc, multi, L,
                                  boundaries=_sharded_bounds())
        if not multi:
            groups = _prefetch_groups(groups)
        for fmt, a, b in groups:
            store.ingest(a, b, s=s, local=True, fmt=fmt)
        n_reads_local = state.n_reads
        state.n_reads = _allsum_scalar(state.n_reads, multi)
    else:
        gen = file_code_stream(input_files, input_file_type, state)
        if homopolymer_compressed:
            gen = _hc_wrap(gen)
        if est is not None:
            gen = _estimator_wrap(gen, est)
        for fmt, a, b in _prefetch_groups(
                _lockstep_groups(bs.batches(gen), D, False, L,
                                 boundaries=_sharded_bounds())):
            store.ingest(a, b, s=s, fmt=fmt)
        n_reads_local = state.n_reads

    store.barrier()
    _t_finalize0 = _time.perf_counter()
    sig_map = store.host_sig_map()
    n_used_bins = store.n_used_bins
    counter_size = calc_counter_size(cutoff_max, counter_max)

    # LUT width picked BEFORE finalize, with the single-chip Runner's
    # exact inputs (_make_db_info): the estimated in-cutoff unique count
    # when -e/--opt-out-size ran (kmc.h:1436-1447), else the reference's
    # 4*n_reads heuristic (kmc.h:1436) — so a sharded database is
    # byte-identical to the single-chip one BY CONSTRUCTION, and the
    # device completer can emit suffix records + the finished LUT
    if est is not None:
        _merge_estimator_multihost(est)
        hist = est.estimate_histogram()
        end = min(cutoff_max + 1, len(hist))
        n_est_unique = sum(hist[cutoff_min:end])
        estimated_histogram = hist
    else:
        n_est_unique = 4 * state.n_reads
        estimated_histogram = None
    lut_prefix_len = pick_lut_prefix_len(k, n_used_bins,
                                         max(n_est_unique, 1))

    # device completer flavors (KMC_TPU_SHARDED_PACKED=0 forces raw;
    # spill merging needs raw totals, so spilled runs take the classic
    # path): KMC output -> suffix records + device LUT; KFF -> full
    # k-mer record bytes + per-bin histogram
    use_packed = (_os.environ.get("KMC_TPU_SHARDED_PACKED", "1") != "0"
                  and not store.spilled)
    use_records = use_packed and output_type != "kff"
    if use_records:
        rec, lut_u64, (n_unique, n_below, n_above), n_total, n_skm = (
            store.finalize_records(
                cutoff_min=cutoff_min, cutoff_max=cutoff_max,
                counter_max=counter_max, lut_prefix_len=lut_prefix_len,
                counter_size=counter_size)
        )
    elif use_packed:
        rec, bin_hist, (n_unique, n_below, n_above), n_total, n_skm = (
            store.finalize_packed(
                cutoff_min=cutoff_min, cutoff_max=cutoff_max,
                counter_max=counter_max, counter_size=counter_size)
        )
    else:
        bins, words, counts, (n_unique, n_below, n_above), n_total, n_skm = (
            store.finalize(cutoff_min=cutoff_min, cutoff_max=cutoff_max,
                           counter_max=counter_max)
        )
    _t_finalize1 = _time.perf_counter()
    timings = dict(store.timings)
    timings["ingest_wall_s"] = _t_finalize0 - _t_ingest0
    timings["finalize_wall_s"] = _t_finalize1 - _t_finalize0

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
    if jax.process_index() == 0:
        kb = (k + 3) // 4
        if output_type == "kff":
            # One raw section per non-empty bin, like the single-chip
            # _write_kff (reference: kb_completer.cpp:172-177).
            from ..formats.kff import KffWriter

            if use_packed:
                kmer_bytes = rec[:, :kb]
                if counter_size:
                    c32 = np.zeros(len(rec), np.uint32)
                    for j in range(counter_size):  # LE counter tail
                        c32 |= (rec[:, kb + j].astype(np.uint32)
                                << np.uint32(8 * j))
                    counts_out = c32
                else:
                    counts_out = np.ones(len(rec), np.uint32)
                bounds = np.zeros(n_used_bins + 1, np.int64)
                np.cumsum(bin_hist, out=bounds[1:])
            else:
                kmer_bytes = words_to_kmer_bytes(words, k)
                counts_out = counts
                bounds = np.searchsorted(bins, np.arange(n_used_bins + 1))
            w = KffWriter(
                output_file_name + ".kff",
                canonical=both_strands,
                k=k,
                counter_size=counter_size,
                min_count=cutoff_min,
                max_count=cutoff_max,
            )
            for b in range(n_used_bins):
                lo, hi = bounds[b], bounds[b + 1]
                if lo < hi:
                    w.store_section(kmer_bytes[lo:hi], counts_out[lo:hi])
            w.close()
        else:
            writer = Kmc2DbWriter(output_file_name, info, sig_map)
            writer.n_unique = n_unique
            writer.n_below_min = n_below
            writer.n_above_max = n_above
            writer.n_total = n_total
            if use_records:
                # the device completer already emitted the suffix-record
                # payload AND the (bin, prefix) LUT — nothing to rebuild
                writer.write_all_records(rec, lut_u64)
            elif use_packed:
                # rows carry whole-k-mer+counter record bytes; build the
                # (bin, prefix) LUT exactly like write_all does
                lpl2 = 2 * info.lut_prefix_len
                prefix_ids = kmer_bytes_to_prefix_ids(
                    rec[:, :kb], k, info.lut_prefix_len)
                bins_rep = np.repeat(
                    np.arange(n_used_bins, dtype=np.int64), bin_hist)
                keys = (bins_rep << lpl2) | prefix_ids.astype(np.int64)
                lut_counts = np.bincount(
                    keys, minlength=info.n_bins << lpl2).astype(np.uint64)
                writer.write_all_records(
                    np.ascontiguousarray(rec[:, kb - info.suffix_bytes:]),
                    lut_counts)
            else:
                writer.write_all(bins, words_to_kmer_bytes(words, k), counts)
            writer.close()
    out = {
        "n_unique": n_unique,
        "n_below": n_below,
        "n_above": n_above,
        "n_total": n_total,
        "n_super_kmers": n_skm,
        "n_reads": state.n_reads,
        # per-process parse accounting: with shard_input the sum of
        # consumed_bytes_local across processes equals the input size (each
        # byte parsed once fleet-wide), not n_processes x input size
        "n_reads_local": n_reads_local,
        "consumed_bytes_local": state.consumed_bytes,
        "n_devices": D,
        "n_processes": jax.process_count(),
        "n_compactions": store.n_compactions,
        "n_spills": store.n_spills,
        "timings": timings,
    }
    if estimated_histogram is not None:
        out["estimated_histogram"] = estimated_histogram
    return out
