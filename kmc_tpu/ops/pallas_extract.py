"""Pallas TPU kernel for the stage-1 extract: signature scan + canonical
k-mer lanes, fused into one VMEM-resident pass per tile.

The XLA version (ops/extract.py) materializes ~30 intermediate arrays in HBM
per batch; this kernel streams the code array tile-by-tile through VMEM and
writes only the outputs (sig, k-mer lanes) — HBM traffic drops to ~1 B/pos
read + 4*(1+W) B/pos write.  (The 2-bit unpack itself stays in XLA: Mosaic
cannot lower the 4-way interleave reshape, and the unpacked code array is a
single cheap fused op.)

Each grid step processes TILE positions and reads a HALO of extra codes past
its block (the k-mer/packing windows cross tile edges), passed as a second
BlockSpec view of the same operand.  All compute is elementwise /
static-slice / minimum — no cumsum, no sort, no gather: validity is a
sliding-window maximum of the bad-code indicator, computed with the same
log-step doubling as the signature minimum.

Semantics identical to extract.position_sigs + _kmer_words (asserted in
tests/test_pallas_extract.py on CPU interpret mode).

STATUS — two variants:
- pallas_extract (1-D): NOT wired.  Round 1: compiled 1.6x faster than the
  XLA version (4.0 ms vs 6.4 ms per 8M positions) but Mosaic MISCOMPILED
  unaligned 1-D vector slices (the 16 shifted window reads): ~0.1% of
  outputs lost one 2-bit field.  Round-2 re-test on jax 0.9.0: interpret
  mode still exact, but the compiled kernel now mismatches ~61% of outputs
  — the 1-D lane-shift lowering regressed further.  Kept as the semantic
  template and the negative-lowering witness.
- pallas_extract2d (below): WIRED into the ingest (ops/store.py,
  KMC_TPU_PALLAS_EXTRACT, default auto = on for TPU when the batch aligns
  to pallas2d_align(k) positions).  The rewrite makes every data-window
  shift a SUBLANE-dimension slice of (rows, 128) blocks — a lowering path
  Mosaic handles correctly: bit-exact against the XLA extract COMPILED on
  the real chip across the full k range (k=21/27/55 at 1024-row tiles,
  k=77/128/200/256 at the W-adaptive 512-row tiles,
  tools/validate_pallas_extract_tpu.py) and through the full pipeline
  (byte-identical DBs, tests/test_pallas_extract.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .extract import INVALID_SIG, TAIL, _is_allowed

TILE = 1 << 16  # positions per grid step
HALO = 2048  # codes past the tile (1-D TPU blocks are multiples of 512)


def _sliding_min(x, w, out_len):
    acc = x
    n = x.shape[0]
    covered = 1
    while covered < w:
        step = min(covered, w - covered)
        acc = jnp.minimum(acc[: n - step], acc[step:])
        n -= step
        covered += step
    return acc[:out_len]


def _sliding_max(x, w, out_len):
    acc = x
    n = x.shape[0]
    covered = 1
    while covered < w:
        step = min(covered, w - covered)
        acc = jnp.maximum(acc[: n - step], acc[step:])
        n -= step
        covered += step
    return acc[:out_len]


def _kernel(codes_ref, halo_ref, sig_ref, *rest,
            k: int, sig_len: int, both_strands: bool, W: int):
    lane_refs = rest[:W]
    cbuf = rest[W]
    S = TILE
    n_codes = S + HALO

    # join main + halo in VMEM scratch (Mosaic can't concat 1-D vectors).
    # min/max run on int32: this Mosaic version doesn't legalize arith.minui,
    # and every minimized quantity here is < 2^31.
    cbuf[0:S] = codes_ref[:].astype(jnp.int32)
    cbuf[S:n_codes] = halo_ref[:].astype(jnp.int32)
    c = cbuf[:]
    bad = jnp.where(c >= 4, jnp.int32(1), jnp.int32(0))
    c4 = jnp.minimum(c, 3).astype(jnp.uint32)

    # packed 16-base windows (big-endian) + reverse-complement windows
    n_pack = n_codes - 15
    p = jnp.zeros((n_pack,), jnp.uint32)
    q = jnp.zeros((n_pack,), jnp.uint32)
    for j in range(16):
        cj = c4[j : j + n_pack]
        p = p | (cj << (2 * (15 - j)))
        q = q | ((jnp.uint32(3) - cj) << (2 * j))

    # validity: no bad code inside [i, i+k)   (integer 0/1: Mosaic's 1-D i1
    # vectors don't lower, so boolean state stays integer)
    valid = _sliding_max(bad, k, S) == 0

    # per-position signature = min canonical m-mer norm over the window
    special = jnp.int32(1 << (2 * sig_len))
    n_norm = S + k - sig_len
    fwd = p[:n_norm] >> (2 * (16 - sig_len))
    rev = q[:n_norm] & jnp.uint32((1 << (2 * sig_len)) - 1)
    fv = jnp.where(_is_allowed(fwd, sig_len), fwd.astype(jnp.int32), special)
    rv = jnp.where(_is_allowed(rev, sig_len), rev.astype(jnp.int32), special)
    norms = jnp.minimum(fv, rv)
    sig = _sliding_min(norms, k - sig_len + 1, S).astype(jnp.uint32)
    sig_ref[:] = jnp.where(valid, sig, jnp.uint32(INVALID_SIG))

    # canonical k-mer lanes (see extract._kmer_words)
    r0 = k - 16 * (W - 1)
    fwd_l = []
    rc_l = []
    w0 = p[0:S]
    if r0 < 16:
        w0 = w0 >> (2 * (16 - r0))
    fwd_l.append(w0)
    for t in range(1, W):
        off = r0 + 16 * (t - 1)
        fwd_l.append(p[off : off + S])
    if both_strands:
        m0 = jnp.uint32((1 << (2 * r0)) - 1) if r0 < 16 else jnp.uint32(0xFFFFFFFF)
        off0 = k - r0
        rc_l.append(q[off0 : off0 + S] & m0)
        for t in range(1, W):
            off = k - r0 - 16 * t
            rc_l.append(q[off : off + S])
        use_rc = jnp.zeros((S,), jnp.uint32)
        decided = jnp.zeros((S,), jnp.uint32)
        sbit = jnp.uint32(0x80000000)
        for t in range(W):
            # unsigned compare via the sign-flip trick: Mosaic lowers u32 <
            # as a signed comparison on this toolchain
            a = (rc_l[t] ^ sbit).astype(jnp.int32)
            b = (fwd_l[t] ^ sbit).astype(jnp.int32)
            lt = jnp.where(a < b, jnp.uint32(1), jnp.uint32(0))
            ne = jnp.where(rc_l[t] != fwd_l[t], jnp.uint32(1), jnp.uint32(0))
            use_rc = use_rc | ((jnp.uint32(1) - decided) & lt)
            decided = decided | ne
        lanes = [
            jnp.where(use_rc != 0, rc_l[t], fwd_l[t]) for t in range(W)
        ]
    else:
        lanes = fwd_l
    for t in range(W):
        lane_refs[t][:] = jnp.where(valid, lanes[t], jnp.uint32(0xFFFFFFFF))


@functools.partial(
    jax.jit, static_argnames=("s", "k", "sig_len", "both_strands", "interpret")
)
def pallas_extract(codes, *, s: int, k: int, sig_len: int,
                   both_strands: bool, interpret: bool = False):
    """(sig uint32[s], [lane_t uint32[s] for t in range(W)]) from a u8 code
    array of length pallas_batch_len(s, k).  Requires s % TILE == 0 and
    k + TAIL <= HALO."""
    assert s % TILE == 0, "s must be a multiple of the 65536-position tile"
    assert k + TAIL <= HALO
    W = (k + 15) // 16
    kernel = functools.partial(
        _kernel, k=k, sig_len=sig_len, both_strands=both_strands, W=W
    )
    return pl.pallas_call(
        kernel,
        grid=(s // TILE,),
        in_specs=[
            pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (HALO,), lambda i: ((i + 1) * TILE // HALO,),
                memory_space=pltpu.VMEM,
            ),
        ],
        # per-lane 1-D outputs: a (TILE, W) block would be tile-padded to
        # (TILE, 128) in VMEM — 32 MB per buffer
        out_specs=[
            pl.BlockSpec((TILE,), lambda i: (i,), memory_space=pltpu.VMEM)
            for _ in range(1 + W)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((s,), jnp.uint32) for _ in range(1 + W)
        ],
        scratch_shapes=[pltpu.VMEM((TILE + HALO,), jnp.int32)],
        interpret=interpret,
    )(codes, codes)


def pallas_batch_len(s: int, k: int) -> int:
    """Code-array length required by pallas_extract (halo padding)."""
    return s + HALO


# ---------------------------------------------------------------------------
# 2-D sublane-layout variant: all data-window shifts are SUBLANE-dimension
# slices of (rows, 128) VMEM blocks — a different (far better-supported)
# Mosaic lowering than the 1-D lane rotations that miscompile above.  The
# batch's s positions become 128 independent column streams (position
# (r, c) = c*seg + r) built by one cheap XLA transpose; each column carries
# its own halo rows read from the next column.  Outputs come back in
# column-major order and are transposed to position order by XLA.
# ---------------------------------------------------------------------------

LANES = 128
TILE_R = 1024  # rows per grid step at W<=4 (fits the 16 MiB scoped-VMEM budget with all intermediates)


def tile_rows(k: int) -> int:
    """Rows per grid step for pallas_extract2d, sized to the 16 MiB
    scoped-VMEM budget: the kernel holds (1+W) double-buffered output
    blocks plus ~3W lane intermediates of (rows, 128) u32, so rows must
    shrink as W = ceil(k/16) grows.  1024 rows is chip-validated for
    W<=4 (k<=64); 512 for W<=16 (k<=256, chip-validated at k=77/128/200/
    256 by tools/validate_pallas_extract_tpu.py).  Must stay a multiple
    of _halo_rows(k) (the halo BlockSpec indexes in halo-block units)."""
    return TILE_R if k <= 64 else 512


def pallas2d_align(k: int) -> int:
    """Batch-length alignment required by pallas_extract2d for this k."""
    return LANES * tile_rows(k)


def _halo_rows(k: int) -> int:
    """Lookahead rows per column, rounded up to a power of two so the halo
    block size divides TILE_R (the halo BlockSpec indexes in block units)."""
    h = max(k + TAIL, 64)
    r = 64
    while r < h:
        r *= 2
    return r


def _kernel2d(a_ref, halo_ref, sig_ref, *rest, k: int, sig_len: int,
              both_strands: bool, W: int, hr: int, rows: int):
    lane_refs = rest[:W]
    cbuf = rest[W]
    S = rows
    n_codes = S + hr

    cbuf[0:S, :] = a_ref[:, :].astype(jnp.int32)
    cbuf[S:n_codes, :] = halo_ref[:, :].astype(jnp.int32)
    c = cbuf[:, :]
    bad = jnp.where(c >= 4, jnp.int32(1), jnp.int32(0))
    c4 = jnp.minimum(c, 3).astype(jnp.uint32)

    n_pack = n_codes - 15
    p = jnp.zeros((n_pack, LANES), jnp.uint32)
    q = jnp.zeros((n_pack, LANES), jnp.uint32)
    for j in range(16):
        cj = c4[j : j + n_pack, :]
        p = p | (cj << (2 * (15 - j)))
        q = q | ((jnp.uint32(3) - cj) << (2 * j))

    valid = _sliding_max(bad, k, S) == 0

    special = jnp.int32(1 << (2 * sig_len))
    n_norm = S + k - sig_len
    fwd = p[:n_norm, :] >> (2 * (16 - sig_len))
    rev = q[:n_norm, :] & jnp.uint32((1 << (2 * sig_len)) - 1)
    fv = jnp.where(_is_allowed(fwd, sig_len), fwd.astype(jnp.int32), special)
    rv = jnp.where(_is_allowed(rev, sig_len), rev.astype(jnp.int32), special)
    norms = jnp.minimum(fv, rv)
    sig = _sliding_min(norms, k - sig_len + 1, S).astype(jnp.uint32)
    sig_ref[:, :] = jnp.where(valid, sig, jnp.uint32(INVALID_SIG))

    r0 = k - 16 * (W - 1)
    fwd_l = []
    rc_l = []
    w0 = p[0:S, :]
    if r0 < 16:
        w0 = w0 >> (2 * (16 - r0))
    fwd_l.append(w0)
    for t in range(1, W):
        off = r0 + 16 * (t - 1)
        fwd_l.append(p[off : off + S, :])
    if both_strands:
        m0 = jnp.uint32((1 << (2 * r0)) - 1) if r0 < 16 else jnp.uint32(0xFFFFFFFF)
        off0 = k - r0
        rc_l.append(q[off0 : off0 + S, :] & m0)
        for t in range(1, W):
            off = k - r0 - 16 * t
            rc_l.append(q[off : off + S, :])
        use_rc = jnp.zeros((S, LANES), jnp.uint32)
        decided = jnp.zeros((S, LANES), jnp.uint32)
        sbit = jnp.uint32(0x80000000)
        for t in range(W):
            a = (rc_l[t] ^ sbit).astype(jnp.int32)
            b = (fwd_l[t] ^ sbit).astype(jnp.int32)
            lt = jnp.where(a < b, jnp.uint32(1), jnp.uint32(0))
            ne = jnp.where(rc_l[t] != fwd_l[t], jnp.uint32(1), jnp.uint32(0))
            use_rc = use_rc | ((jnp.uint32(1) - decided) & lt)
            decided = decided | ne
        lanes = [
            jnp.where(use_rc != 0, rc_l[t], fwd_l[t]) for t in range(W)
        ]
    else:
        lanes = fwd_l
    for t in range(W):
        lane_refs[t][:, :] = jnp.where(valid, lanes[t], jnp.uint32(0xFFFFFFFF))


@functools.partial(
    jax.jit, static_argnames=("s", "k", "sig_len", "both_strands", "interpret")
)
def pallas_extract2d(codes, *, s: int, k: int, sig_len: int,
                     both_strands: bool, interpret: bool = False):
    """Same contract as pallas_extract (sig + canonical k-mer lanes in
    POSITION order), via the 2-D sublane-layout kernel.  Requires
    s % pallas2d_align(k) == 0 and len(codes) >= pallas2d_batch_len(s, k)."""
    R = tile_rows(k)
    assert s % (LANES * R) == 0, (
        f"s must be a multiple of {LANES * R}")
    W = (k + 15) // 16
    hr = _halo_rows(k)
    seg = s // LANES

    # column-major layout + per-column halo rows (one XLA transpose)
    codesL = codes[: s + hr]
    M = codesL[:s].reshape(LANES, seg).T  # (seg, LANES)
    tail = codesL[s : s + hr]
    Hh = jnp.concatenate([M[:hr, 1:], tail[:, None]], axis=1)
    H = jnp.concatenate([M, Hh], axis=0)  # (seg + hr, LANES)

    kernel = functools.partial(
        _kernel2d, k=k, sig_len=sig_len, both_strands=both_strands, W=W,
        hr=hr, rows=R,
    )
    nb = seg // R
    outs = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((R, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hr, LANES),
                         lambda i: ((i + 1) * (R // hr), 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((R, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(1 + W)
        ],
        out_shape=[
            _out_struct((seg, LANES), codes)
            for _ in range(1 + W)
        ],
        scratch_shapes=[pltpu.VMEM((R + hr, LANES), jnp.int32)],
        interpret=interpret,
    )(H, H)
    # back to position order (cheap u32 transposes)
    return [o.T.reshape(s) for o in outs]


def _out_struct(shape, like):
    """ShapeDtypeStruct carrying `like`'s varying-manual-axes set (required
    under shard_map's check_vma; empty outside shard_map)."""
    try:
        vma = jax.typeof(like).vma
    except AttributeError:
        vma = None
    if vma is not None:
        return jax.ShapeDtypeStruct(shape, jnp.uint32, vma=vma)
    return jax.ShapeDtypeStruct(shape, jnp.uint32)


def pallas2d_batch_len(s: int, k: int) -> int:
    """Code-array length required by pallas_extract2d."""
    return s + _halo_rows(k)


def extract_for_ingest(c4, bad, *, s, k, sig_len, both_strands, mode):
    """Shared ingest front end: (valid, sig, lanes) via the 2-D kernel.
    Rewrites (c4, bad) back to a u8 code stream, pads to the kernel's halo
    length with sentinels, and reconstructs `valid` from the INVALID_SIG
    marking (valid <=> sig != INVALID_SIG, since a valid window's signature
    is at most the special-bin id).  Used by both the single-chip store
    ingest (ops/store.py) and the multi-chip shard ingest
    (parallel/multihost.py) so the two paths cannot drift."""
    codes8 = jnp.where(bad, jnp.uint8(4), c4.astype(jnp.uint8))
    need = s + _halo_rows(k)
    if codes8.shape[0] < need:
        codes8 = jnp.concatenate(
            [codes8, jnp.full((need - codes8.shape[0],), 4, jnp.uint8)])
    outs = pallas_extract2d(codes8, s=s, k=k, sig_len=sig_len,
                            both_strands=both_strands,
                            interpret=(mode == "interpret"))
    sig = outs[0]
    return sig != INVALID_SIG, sig, outs[1:]
