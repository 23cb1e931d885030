"""Multi-chip counting step: SPMD over a jax.sharding.Mesh.

TPU-native replacement for the reference's in-process queue/temp-file
shuffle (SURVEY.md §2.6): input code-stream batches are data-parallel across
devices; signature bins are owner-partitioned (this self-contained test
step uses bin % D; the production pipeline in parallel/multihost.py uses
contiguous histogram-balanced bin ranges); the (bin, k-mer, count) records
move between chips with one all_to_all over ICI; each owner merges its
shard locally.  No global shuffle is ever needed — exactly KMC's "bins are
independent after stage 1" property
(/root/reference/kmc_core/kb_completer.cpp:130-222), mapped onto a mesh.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.extract import INVALID_SIG, stage1_batch


def init_multihost(coordinator_address: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None,
                   heartbeat_timeout_seconds: int | None = None) -> None:
    """Initialize jax.distributed for a multi-host run (DCN control plane;
    the data plane stays on ICI collectives).  Call once per host process
    before building the mesh; single-process runs may skip it.  Arguments
    default to cluster auto-detection (TPU pod environments set them).

    heartbeat_timeout_seconds bounds peer-failure detection: when a
    process dies mid-run, the coordination service fails the survivors'
    next collective within roughly this window instead of hanging the
    lockstep allgather forever — the fleet analogue of the reference's
    cooperative cancellation (critical_error_handler.h:9-80).  None keeps
    the jax default (100 s)."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    if heartbeat_timeout_seconds is not None:
        kwargs.update(heartbeat_timeout_seconds=heartbeat_timeout_seconds)
    jax.distributed.initialize(**kwargs)


def make_mesh(n_devices: int | None = None, axis: str = "d") -> Mesh:
    """1-D device mesh over all (global, when jax.distributed is live)
    devices; n_devices truncates for tests on virtual CPU meshes."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def _local_count_step(codes, sig_map, *, s, k, sig_len, both_strands, capacity, axis):
    """Per-device body (runs under shard_map).

    codes:   uint8[1, L]    — this device's batch
    sig_map: int32[4^m + 1] — replicated signature->bin map
    Returns (words uint32[1, C, W], counts uint32[1, C], n_out int32[1]):
    this device's owned, merged, deduplicated records (padded with all-0xFF
    rows / zero counts).
    """
    D = jax.lax.axis_size(axis)
    me = jax.lax.axis_index(axis)

    u_sig, u_words, counts, n_groups = stage1_batch(
        codes[0], s=s, k=k, sig_len=sig_len, both_strands=both_strands
    )
    W = u_words.shape[1]

    # signature -> bin -> owner; invalid rows get owner D (dropped)
    n_bins = sig_map.shape[0]
    sig_idx = jnp.minimum(u_sig, n_bins - 1).astype(jnp.int32)
    bins = sig_map[sig_idx]
    valid = u_sig != INVALID_SIG
    owner = jnp.where(valid, bins % D, D).astype(jnp.int32)

    # group rows by owner (stage1 output is already deduplicated)
    ops = jax.lax.sort(
        [owner] + [u_words[:, t] for t in range(W)] + [counts],
        num_keys=1 + W,
    )
    owner_s = ops[0]
    words_s = ops[1 : 1 + W]
    counts_s = ops[1 + W]

    # slot each row into its owner's fixed-capacity send segment
    pos_all = jnp.arange(s, dtype=jnp.int32)
    owner_start = jnp.searchsorted(owner_s, jnp.arange(D + 1, dtype=jnp.int32))
    pos_in_owner = pos_all - owner_start[jnp.minimum(owner_s, D)]
    in_cap = (pos_in_owner < capacity) & (owner_s < D)
    slot = jnp.where(in_cap, owner_s * capacity + pos_in_owner, D * capacity)

    send_words = jnp.full((D * capacity + 1, W), 0xFFFFFFFF, jnp.uint32)
    send_counts = jnp.zeros((D * capacity + 1,), jnp.uint32)
    row_words = jnp.stack(words_s, axis=1)
    send_words = send_words.at[slot].set(row_words)
    send_counts = send_counts.at[slot].set(counts_s)
    send_words = send_words[: D * capacity].reshape(D, capacity, W)
    send_counts = send_counts[: D * capacity].reshape(D, capacity)
    n_dropped = jnp.sum(((owner_s < D) & ~in_cap).astype(jnp.int32))

    # the ragged all-to-all (fixed-capacity segments over ICI)
    recv_words = jax.lax.all_to_all(send_words, axis, 0, 0, tiled=True)
    recv_counts = jax.lax.all_to_all(send_counts, axis, 0, 0, tiled=True)

    # local merge of owned records from all devices
    flat_words = recv_words.reshape(D * capacity, W)
    flat_counts = recv_counts.reshape(D * capacity)
    P_ = D * capacity
    mops = jax.lax.sort(
        [flat_words[:, t] for t in range(W)] + [flat_counts], num_keys=W
    )
    mw = mops[:W]
    mc = mops[W]
    new = jnp.ones((P_,), jnp.bool_)
    diff = jnp.zeros((P_ - 1,), jnp.bool_)
    for w in mw:
        diff = diff | (w[1:] != w[:-1])
    new = new.at[1:].set(diff)
    uid = jnp.cumsum(new.astype(jnp.int32)) - 1
    totals = jax.ops.segment_sum(mc, uid, num_segments=P_)
    starts = jnp.nonzero(new, size=P_, fill_value=P_)[0]
    gidx = jnp.minimum(starts, P_ - 1)
    u_w = jnp.stack([w[gidx] for w in mw], axis=1)
    group_valid = (starts < P_) & (totals > 0)
    n_out = jnp.sum(group_valid.astype(jnp.int32))
    # padding groups (all-0xFF rows with zero counts) sort last, so the
    # valid groups are exactly the first n_out rows
    out_words = jnp.where(group_valid[:, None], u_w, jnp.uint32(0xFFFFFFFF))
    out_counts = jnp.where(group_valid, totals, 0).astype(jnp.uint32)
    return (
        out_words[None],
        out_counts[None],
        n_out[None],
        n_dropped[None],
    )


def make_distributed_count_step(
    mesh: Mesh,
    *,
    s: int,
    k: int,
    sig_len: int,
    both_strands: bool = True,
    capacity: int | None = None,
    axis: str = "d",
):
    """Build the jitted multi-chip counting step.

    Returns fn(codes, sig_map) where codes is uint8[D, L] (L = s + k + 16)
    sharded over the mesh and sig_map is int32[4^m + 1] replicated; the
    result is per-device owned (words, counts, n_out, n_dropped).

    `capacity` is the per-(sender, owner) record budget of the all-to-all —
    the analogue of the reference's n_plus_x_recs pre-reservation
    (kb_collector.h:66-116).  Default: s // n_devices * 2 (each device emits
    at most s records, spread over n_devices owners, 2x skew margin).
    """
    D = mesh.devices.size
    if capacity is None:
        capacity = max(64, (s // D) * 2)

    body = functools.partial(
        _local_count_step,
        s=s,
        k=k,
        sig_len=sig_len,
        both_strands=both_strands,
        capacity=capacity,
        axis=axis,
    )
    mapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis, None), P()),
        out_specs=(P(axis, None, None), P(axis, None), P(axis), P(axis)),
    )
    codes_sharding = NamedSharding(mesh, P(axis, None))

    @jax.jit
    def step(codes, sig_map):
        codes = jax.lax.with_sharding_constraint(codes, codes_sharding)
        return mapped(codes, sig_map)

    return step, capacity
