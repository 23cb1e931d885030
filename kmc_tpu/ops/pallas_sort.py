"""EXPERIMENTAL: blocked bitonic sort in the sublane-safe layout.

The round-2 roofline (docs/PERFORMANCE.md) showed `lax.sort` at ~3x the
blocked-bitonic HBM floor, and the 2-D extract kernel proved that SUBLANE-
dimension operations lower correctly on this Mosaic while 1-D lane shifts
miscompile.  This module is the resulting sort design:

  Layout: element p of the flat array lives at (row, lane) with
  p = lane * R + row, held as a (R, LANES) array (rows on the sublane
  axis).  Batcher's bitonic network pairs p with p ^ s, so:
    - strides s <  R   pair rows (r, r^s) within a lane: contiguous
      (R/(2s), 2, s, LANES) reshapes — sublane-axis ops, minor dim 128;
    - strides s >= R   pair lanes at the same row: handled in the
      TRANSPOSED (LANES, R) view as (LANES/(2t), 2, t, R) reshapes —
      minor dim R, so neither case ever creates a small minor dimension
      (the tile-padding trap) or a lane shuffle (the miscompile).
  Within each merge level, the final ladder of strides < BLOCK_R is fused
  into ONE Pallas pass per block — the VMEM-resident sub-ladder; strides
  in [BLOCK_R, R) run as XLA reshape passes.

Direction: at merge level k (arrow mask 2^k), element p sorts ascending
iff bit k of p is 0 (the final level sorts everything ascending: bit
log2(N) of p < N is always 0).  With the XOR pairing, the element whose
bit log2(s) is 0 keeps the minimum iff ascending.  All masks are
elementwise functions of (row, lane) — no data-dependent control flow.

Keys: 1..n uint32 columns compared lexicographically (the store's fused
(bin|k-mer) rows); remaining columns are payloads.

STATUS: compiled and BIT-EXACT vs lax.sort on the chip at 2^19-2^28, but
MEASURED ~3x SLOWER (2^28 2key: 3.915 s vs 1.387 s; docs/PERFORMANCE.md
has the table and the accounting — XLA's internally-fused SortOp already
sits near the HBM floor, while this schedule pays ~146 discrete HBM
passes).  Kept wired behind KMC_TPU_BITONIC_SORT (default OFF,
byte-identity-tested e2e) as a correctness-verified witness of the
measurement and of the Mosaic lowering recipe below.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
# rows per Pallas block: 512 KiB per u32 column.  1<<11 compiles at small
# grids but blows the 16 MiB scoped-VMEM limit (17.81M) once the grid is
# long enough for full double-buffering (2^26 rows, 2 columns).
BLOCK_R = 1 << 10


def _log2(x: int) -> int:
    return int(x).bit_length() - 1


def _lex_swap(key_lo, key_hi, pay_lo, pay_hi, asc):
    """Compare-exchange of two element groups by lexicographic key order;
    returns ordered (key_lo', key_hi', pay_lo', pay_hi')."""
    gt = jnp.zeros(key_lo[0].shape, jnp.bool_)
    eq = jnp.ones(key_lo[0].shape, jnp.bool_)
    for x, y in zip(key_lo, key_hi):
        gt = gt | (eq & (x > y))
        eq = eq & (x == y)
    want_swap = jnp.where(asc, gt, ~gt & ~eq)
    lo, hi = [], []
    for x, y in zip(list(key_lo) + list(pay_lo), list(key_hi) + list(pay_hi)):
        lo.append(jnp.where(want_swap, y, x))
        hi.append(jnp.where(want_swap, x, y))
    n = len(key_lo)
    return lo[:n], hi[:n], lo[n:], hi[n:]


def _ladder_kernel(*refs, n_keys: int, n_cols: int, level_bit: int,
                   top_stride: int, r_total: int, block_r: int):
    """Fused ladder of strides top_stride..1 (all < block_r) of one merge
    level, over a (block_r, LANES) block of the (R, LANES) layout.

    Mosaic rules learned the hard way ('Unsupported target bitwidth for
    truncation', i8->i1 trunci on the select predicate): boolean STATE
    must never live as a bool vector — algebra on i1 vectors (|, &, ==
    between masks) materializes i8 and the final select can't truncate
    back.  Like pallas_extract.py, all flags here are 0/1 uint32 and
    every jnp.where predicate is a direct fresh comparison.  The XOR
    partner c[r ^ s] is where(bit s of r == 0, c[r+s], c[r-s]) with two
    static axis-0 rotations (sublane-shifted slices — the primitive
    pallas_extract2d proved bit-exact).  Each element decides
    take-partner locally: keep_min = (is_lo == asc); take = keep_min ?
    key>partner : key<partner (ties never move — consistent on both
    sides of a pair)."""
    in_refs = refs[:n_cols]
    out_refs = refs[n_cols : 2 * n_cols]
    i = pl.program_id(0)

    one = jnp.uint32(1)
    zero = jnp.uint32(0)
    cols = [r[:, :] for r in in_refs]
    rows = jax.lax.broadcasted_iota(jnp.int32, (block_r, LANES), 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (block_r, LANES), 1)
    p = (lanes * r_total + rows + i * block_r).astype(jnp.uint32)
    asc_bit = (p >> level_bit) & one  # 0 = this element sorts ascending

    s = top_stride
    while s >= 1:
        lg = s.bit_length() - 1
        bit_s = (rows.astype(jnp.uint32) >> lg) & one  # 0 = lo element
        partners = []
        for c in cols:
            down = jnp.concatenate([c[s:], c[:s]], axis=0)      # c[r+s]
            up = jnp.concatenate([c[block_r - s:], c[:block_r - s]],
                                 axis=0)                        # c[r-s]
            partners.append(jnp.where(bit_s == 0, down, up))
        keep_min = one - (bit_s ^ asc_bit)  # 1 iff is_lo == asc
        gt = jnp.zeros((block_r, LANES), jnp.uint32)
        lt = jnp.zeros((block_r, LANES), jnp.uint32)
        eq = jnp.ones((block_r, LANES), jnp.uint32)
        for c, pt in zip(cols[:n_keys], partners[:n_keys]):
            gt = gt | (eq & jnp.where(c > pt, one, zero))
            lt = lt | (eq & jnp.where(c < pt, one, zero))
            eq = eq & jnp.where(c == pt, one, zero)
        take = jnp.where(keep_min != 0, gt, lt)
        cols = [jnp.where(take != 0, pt, c)
                for c, pt in zip(cols, partners)]
        s //= 2
    for r, c in zip(out_refs, cols):
        r[:, :] = c


def _xla_row_pass(arrs, n_keys, s, level_bit, R):
    """Compare-exchange at row stride s (BLOCK_R <= s < R) on the
    (R, LANES) layout: (R/(2s), 2, s, LANES) reshape, minor dim 128."""
    n_grp = R // (2 * s)
    sp = [c.reshape(n_grp, 2, s, LANES) for c in arrs]
    lo = [c[:, 0] for c in sp]
    hi = [c[:, 1] for c in sp]
    grp = jax.lax.broadcasted_iota(jnp.int32, (n_grp, s, LANES), 0)
    row = grp * 2 * s + jax.lax.broadcasted_iota(
        jnp.int32, (n_grp, s, LANES), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (n_grp, s, LANES), 2)
    p = lane * R + row
    asc = ((p >> level_bit) & 1) == 0
    klo, khi, plo, phi = _lex_swap(lo[:n_keys], hi[:n_keys],
                                   lo[n_keys:], hi[n_keys:], asc)
    return [jnp.stack([a, b], axis=1).reshape(R, LANES)
            for a, b in zip(klo + plo, khi + phi)]


def _xla_lane_pass(arrs_t, n_keys, s, level_bit, R):
    """Compare-exchange at stride s >= R on the TRANSPOSED (LANES, R)
    layout: lane pairing becomes (LANES/(2t), 2, t, R) reshape, minor
    dim R."""
    t = s // R
    n_grp = LANES // (2 * t)
    sp = [c.reshape(n_grp, 2, t, R) for c in arrs_t]
    lo = [c[:, 0] for c in sp]
    hi = [c[:, 1] for c in sp]
    grp = jax.lax.broadcasted_iota(jnp.int32, (n_grp, t, R), 0)
    lane = grp * 2 * t + jax.lax.broadcasted_iota(jnp.int32, (n_grp, t, R), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (n_grp, t, R), 2)
    p = lane * R + row
    asc = ((p >> level_bit) & 1) == 0
    klo, khi, plo, phi = _lex_swap(lo[:n_keys], hi[:n_keys],
                                   lo[n_keys:], hi[n_keys:], asc)
    return [jnp.stack([a, b], axis=1).reshape(LANES, R)
            for a, b in zip(klo + plo, khi + phi)]


@functools.partial(jax.jit, static_argnames=("n_keys", "interpret"))
def pallas_bitonic_sort(cols, n_keys: int = 1, interpret: bool = False):
    """Sort flat uint32 arrays by the first n_keys columns (ascending,
    lexicographic); remaining columns are payloads.  Length must be a
    power of two with at least 2*BLOCK_R rows per lane.  Returns the
    sorted columns (flat)."""
    cols = [jnp.asarray(c) for c in cols]
    N = int(cols[0].shape[0])
    R = N // LANES
    assert N == LANES * R and (N & (N - 1)) == 0
    nc = len(cols)
    # scoped VMEM is 16 MiB: 2 columns fit 1024-row blocks with full grid
    # double-buffering; 3+ columns need 512 (measured: nc=3 @1024 = 16.34M)
    br = BLOCK_R if nc <= 2 else BLOCK_R // 2
    assert R >= 2 * br, "array too small for the blocked layout"

    # lane-major element order as (R, LANES): p = lane * R + row
    arrs = [c.reshape(LANES, R).T for c in cols]

    def fused_ladder(arrs, level_bit, top_stride):
        kernel = functools.partial(
            _ladder_kernel, n_keys=n_keys, n_cols=nc,
            level_bit=level_bit, top_stride=top_stride, r_total=R,
            block_r=br)
        outs = pl.pallas_call(
            kernel,
            grid=(R // br,),
            in_specs=[pl.BlockSpec((br, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)
                      for _ in range(nc)],
            out_specs=[pl.BlockSpec((br, LANES), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)
                       for _ in range(nc)],
            out_shape=[jax.ShapeDtypeStruct((R, LANES), jnp.uint32)
                       for _ in range(nc)],
            interpret=interpret,
        )(*arrs)
        return list(outs)

    log_n = _log2(N)
    for k in range(1, log_n + 1):  # merge level: direction bit k
        # level log_n: bit log_n of p (< N) is always 0 -> all ascending
        level_bit = k if k < log_n else 31
        s = 1 << (k - 1)
        if s >= R:
            arrs_t = [a.T for a in arrs]
            while s >= R:
                arrs_t = _xla_lane_pass(arrs_t, n_keys, s, level_bit, R)
                s //= 2
            arrs = [a.T for a in arrs_t]
        while s >= br:
            arrs = _xla_row_pass(arrs, n_keys, s, level_bit, R)
            s //= 2
        arrs = fused_ladder(arrs, level_bit, s)

    return [a.T.reshape(N) for a in arrs]
