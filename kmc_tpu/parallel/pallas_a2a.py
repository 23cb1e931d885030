"""Pallas ICI all-to-all: the record-exchange transport of the multi-chip
pipeline as an explicit inter-chip RDMA kernel.

The multihost finalize moves (bin, k-mer, count) rows to their bin owners
(SURVEY.md §2.6: the TPU replacement for the reference's bin-part queue +
temp-file shuffle).  The default transport is jax.lax.all_to_all; this
module provides the same exchange as a hand-written Pallas kernel using
`make_async_remote_copy`, which lets every peer transfer ride ICI
concurrently and overlap with local compute — the pattern to extend when
segments become properly ragged (send only n_rows[dst] instead of the
fixed-capacity segment).

x: uint32[D, cap, C] on each device (segment j destined for device j) ->
out: uint32[D, cap, C] (out[j] = segment received from device j).

Usage (inside shard_map over axis 'd'):
    out = pallas_all_to_all(x, axis="d")

Testing: multi-chip RDMA needs a real multi-chip slice; on the CPU mesh the
wrapper falls back to lax.all_to_all (transport="xla").  The kernel follows
the ring-collective pattern of the Pallas TPU guide.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _a2a_kernel(x_ref, out_ref, send_sem, recv_sem, local_sem, *, axis: str,
                n_dev: int):
    """One-shot all-to-all: device d pushes segment j straight into peer
    j's receive slot d; every transfer is independent and rides ICI
    concurrently.

    Semaphore slots: the sender at offset `step` (peer me+step) signals the
    receiver's recv_sem[step-1]; since the receiver's sender at offset step
    is me-step and each (receiver, slot) pair has exactly one incoming
    transfer, waiting on every slot drains every receive."""
    me = jax.lax.axis_index(axis)

    # local segment: async copy (refs live in ANY/HBM space)
    local = pltpu.make_async_copy(x_ref.at[me], out_ref.at[me], local_sem)
    local.start()

    # global barrier: everyone's buffers must exist before remote writes
    barrier = pltpu.get_barrier_semaphore()
    for p in range(n_dev):
        pltpu.semaphore_signal(
            barrier, inc=1, device_id=jnp.int32(p),
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
    pltpu.semaphore_wait(barrier, n_dev)

    # push each remote segment to its owner
    def _vary(c):
        # constants must carry the same varying-manual-axes set as me
        try:
            return jax.lax.pvary(jnp.int32(c), (axis,))
        except Exception:
            return jnp.int32(c)

    rdmas = []
    for step in range(1, n_dev):
        dst = jax.lax.rem(me + _vary(step), _vary(n_dev))
        rdma = pltpu.make_async_remote_copy(
            src_ref=x_ref.at[dst],
            dst_ref=out_ref.at[me],
            send_sem=send_sem.at[step - 1],
            recv_sem=recv_sem.at[step - 1],
            device_id=dst,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        rdma.start()
        rdmas.append(rdma)
    local.wait()
    for rdma in rdmas:
        rdma.wait()


def _ragged_a2a_kernel(send_n_ref, recv_n_ref, x_ref, out_ref, send_sem,
                       recv_sem, local_sem, *, axis: str, n_dev: int,
                       chunk: int, max_chunks: int):
    """Ragged all-to-all: only ceil(n/chunk) chunks of each (sender, dst)
    segment cross the wire.  send_n/recv_n are SMEM scalar vectors (the
    per-destination row counts, exchanged beforehand with a tiny XLA
    all_to_all), so every conditional transfer has a matching conditional
    wait on the peer — the SPMD symmetry of the dense kernel is replaced
    by count agreement."""
    me = jax.lax.axis_index(axis)

    def _vary(c):
        try:
            return jax.lax.pvary(jnp.int32(c), (axis,))
        except Exception:
            return jnp.int32(c)

    # local segment: copy only the used chunks
    for ci in range(max_chunks):
        @pl.when(ci * chunk < send_n_ref[me])
        def _():
            cp = pltpu.make_async_copy(
                x_ref.at[me, pl.ds(ci * chunk, chunk)],
                out_ref.at[me, pl.ds(ci * chunk, chunk)],
                local_sem,
            )
            cp.start()
            cp.wait()

    barrier = pltpu.get_barrier_semaphore()
    for p in range(n_dev):
        pltpu.semaphore_signal(
            barrier, inc=1, device_id=jnp.int32(p),
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
    pltpu.semaphore_wait(barrier, n_dev)

    # push used chunks of each remote segment to its owner
    for step in range(1, n_dev):
        dst = jax.lax.rem(me + _vary(step), _vary(n_dev))
        for ci in range(max_chunks):
            @pl.when(ci * chunk < send_n_ref[dst])
            def _():
                rdma = pltpu.make_async_remote_copy(
                    src_ref=x_ref.at[dst, pl.ds(ci * chunk, chunk)],
                    dst_ref=out_ref.at[me, pl.ds(ci * chunk, chunk)],
                    send_sem=send_sem.at[step - 1],
                    recv_sem=recv_sem.at[step - 1],
                    device_id=dst,
                    device_id_type=pltpu.DeviceIdType.LOGICAL,
                )
                rdma.start()
    # drain: wait my sends, then my receives (peer me-step sent
    # ceil(recv_n[src]/chunk) chunks into my slot via recv_sem[step-1])
    for step in range(1, n_dev):
        dst = jax.lax.rem(me + _vary(step), _vary(n_dev))
        src = jax.lax.rem(me - _vary(step) + _vary(n_dev), _vary(n_dev))
        for ci in range(max_chunks):
            @pl.when(ci * chunk < send_n_ref[dst])
            def _():
                pltpu.make_async_remote_copy(
                    src_ref=x_ref.at[dst, pl.ds(ci * chunk, chunk)],
                    dst_ref=out_ref.at[me, pl.ds(ci * chunk, chunk)],
                    send_sem=send_sem.at[step - 1],
                    recv_sem=recv_sem.at[step - 1],
                    device_id=dst,
                    device_id_type=pltpu.DeviceIdType.LOGICAL,
                ).wait_send()
            @pl.when(ci * chunk < recv_n_ref[src])
            def _():
                pltpu.make_async_remote_copy(
                    src_ref=x_ref.at[dst, pl.ds(ci * chunk, chunk)],
                    dst_ref=out_ref.at[me, pl.ds(ci * chunk, chunk)],
                    send_sem=send_sem.at[step - 1],
                    recv_sem=recv_sem.at[step - 1],
                    device_id=dst,
                    device_id_type=pltpu.DeviceIdType.LOGICAL,
                ).wait_recv()


def pallas_ragged_all_to_all(x: jax.Array, n_rows: jax.Array, *, axis: str,
                             chunk: int = 512, transport: str = "auto",
                             interpret=False, collective_id: int = 8):
    """All-to-all where only the first n_rows[dst] rows of each segment are
    guaranteed to transfer — the truly ragged record exchange of SURVEY.md
    §2.6 (ICI traffic scales with the real rows, not the capacity bound).

    x: (D, cap, C) per-destination segments; n_rows: int32[D] live rows per
    segment.  Returns (out, recv_rows): out[j, :recv_rows[j]] are the rows
    received from peer j; rows beyond recv_rows[j] are UNDEFINED under the
    pallas transport (the xla fallback transfers them verbatim).  Callers
    must mask by recv_rows — the kmc exchange pads segments with all-ones
    sentinel rows, so its consumers already do."""
    n_dev = jax.lax.axis_size(axis)
    cap = x.shape[1]
    # the peer's counts for my slots: a tiny dense exchange
    recv_rows = jax.lax.all_to_all(
        n_rows.reshape(n_dev, 1), axis, 0, 0, tiled=True).reshape(n_dev)
    if transport == "auto":
        transport = (
            "pallas"
            if jax.default_backend() == "tpu" and n_dev > 1
            else "xla"
        )
    if transport == "xla" or n_dev == 1:
        return jax.lax.all_to_all(x, axis, 0, 0, tiled=True), recv_rows
    if cap % chunk:
        raise ValueError(f"segment capacity {cap} not a multiple of "
                         f"chunk {chunk}")
    try:
        vma = jax.typeof(x).vma
    except AttributeError:
        vma = None
    out_shape = (jax.ShapeDtypeStruct(x.shape, x.dtype, vma=vma)
                 if vma is not None else jax.ShapeDtypeStruct(x.shape, x.dtype))
    out = pl.pallas_call(
        functools.partial(_ragged_a2a_kernel, axis=axis, n_dev=n_dev,
                          chunk=chunk, max_chunks=cap // chunk),
        out_shape=out_shape,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.SemaphoreType.DMA((n_dev - 1,)),
            pltpu.SemaphoreType.DMA((n_dev - 1,)),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, collective_id=collective_id
        ),
        interpret=interpret,
    )(n_rows.astype(jnp.int32), recv_rows.astype(jnp.int32), x)
    return out, recv_rows


def pallas_all_to_all(x: jax.Array, *, axis: str, transport: str = "auto",
                      interpret=False):
    """All-to-all of fixed-capacity segments inside shard_map.

    transport: "pallas" (remote-DMA kernel), "xla" (lax.all_to_all), or
    "auto" (pallas on TPU with >1 device, else xla — the pltpu remote-copy
    primitives only lower on the TPU backend).  interpret: passed through
    to pallas_call; pltpu.InterpretParams() simulates the inter-chip DMAs
    on CPU (how tests/test_pallas_a2a.py exercises this kernel)."""
    n_dev = jax.lax.axis_size(axis)
    if transport == "auto":
        transport = (
            "pallas"
            if jax.default_backend() == "tpu" and n_dev > 1
            else "xla"
        )
    if transport == "xla" or n_dev == 1:
        return jax.lax.all_to_all(x, axis, 0, 0, tiled=True)

    try:
        vma = jax.typeof(x).vma
    except AttributeError:  # older jax: no vma tracking
        vma = None
    out_shape = (jax.ShapeDtypeStruct(x.shape, x.dtype, vma=vma)
                 if vma is not None else jax.ShapeDtypeStruct(x.shape, x.dtype))
    return pl.pallas_call(
        functools.partial(_a2a_kernel, axis=axis, n_dev=n_dev),
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.SemaphoreType.DMA((n_dev - 1,)),
            pltpu.SemaphoreType.DMA((n_dev - 1,)),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, collective_id=7
        ),
        interpret=interpret,
    )(x)
