"""Microbenchmarks for the finalize sort/count roofline analysis (VERDICT
round 1, item 1): measures every candidate primitive for a RADULS-class
radix sort on this TPU, so docs/PERFORMANCE.md can carry a quantified
feasibility table instead of assertions.

Run on the real chip:  timeout 900 python tools/microbench_sort.py [section]

Sections: sort, roofline, bitonic, pallas, scatter, onehot, all (default).
Each prints one line per measurement: name, n, seconds, derived GB/s.
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# the dev-tunnel platform: block_until_ready does not block; force a sync
# by fetching one scalar


def sync(x):
    if isinstance(x, (list, tuple)):
        x = x[0]
    return np.asarray(x.ravel()[0])


def timeit(fn, *args, warmup=1, iters=3):
    for _ in range(warmup):
        sync(fn(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def report(name, n, secs, bytes_moved=None):
    gbs = f"  {bytes_moved / secs / 1e9:8.1f} GB/s" if bytes_moved else ""
    print(f"{name:44s} n=2^{int(np.log2(n)):2d}  {secs*1e3:9.2f} ms{gbs}",
          flush=True)


def rand_u32(n, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(0, 2**32, size=n, dtype=np.uint32))


LOGN = int(__import__("os").environ.get("MB_LOGN", "28"))
N = 1 << LOGN


def sec_sort():
    a, b = rand_u32(N, 0), rand_u32(N, 1)
    f2 = jax.jit(lambda x, y: jax.lax.sort([x, y], num_keys=2))
    report("lax.sort 2 u32 keys", N, timeit(f2, a, b), None)
    f1 = jax.jit(lambda x, y: jax.lax.sort([x, y], num_keys=1))
    report("lax.sort 1 u32 key + 1 payload", N, timeit(f1, a, b), None)
    f0 = jax.jit(lambda x: jax.lax.sort([x], num_keys=1))
    report("lax.sort 1 u32 key alone", N, timeit(f0, a), None)
    # 8-bit key: does key width change anything?
    a8 = jnp.asarray(np.asarray(a) & 0xFF)
    f8 = jax.jit(lambda x, y: jax.lax.sort([x, y], num_keys=1))
    report("lax.sort u32(8-bit values) + payload", N, timeit(f8, a8, b), None)
    # scaling in n (per-element cost ~ log^2 n?)
    for ln in (24, 26):
        m = 1 << ln
        fm = jax.jit(lambda x, y: jax.lax.sort([x, y], num_keys=2))
        report("lax.sort 2 u32 keys", m, timeit(fm, a[:m], b[:m]), None)
    # pre-sorted input (adaptive?)
    s = jnp.arange(N, dtype=jnp.uint32)
    report("lax.sort pre-sorted 1 key", N, timeit(f0, s), None)


def sec_roofline():
    a = rand_u32(N, 0)
    f = jax.jit(lambda x: x + jnp.uint32(1))
    report("elementwise add (r+w)", N, timeit(f, a), 2 * 4 * N)
    f2 = jax.jit(lambda x: jnp.cumsum(x, dtype=jnp.uint32))
    report("cumsum u32", N, timeit(f2, a), 2 * 4 * N)
    g = jax.jit(lambda x: x[::-1])
    report("reverse (r+w)", N, timeit(g, a), 2 * 4 * N)


def _ce_pass(x, stride, iota):
    """bitonic-merge compare-exchange at `stride`, roll-based: 1-D
    contiguous ops only (a (n/2s, 2, s) reshape tile-pads the minor dim to
    128 — 16x memory at small strides, an instant OOM at 2^28)."""
    up = jnp.roll(x, -stride)
    dn = jnp.roll(x, stride)
    is_lo = (iota & stride) == 0
    return jnp.where(is_lo, jnp.minimum(x, up), jnp.maximum(x, dn))


def sec_bitonic():
    # cost of one log-n ladder of compare-exchange passes (a full bitonic
    # MERGE of a bitonic sequence) — the building block of merging sorted
    # runs without lax.sort
    a = rand_u32(N, 0)
    iota = jnp.arange(N, dtype=jnp.uint32)

    @jax.jit
    def merge(x):
        for s in range(LOGN - 1, -1, -1):
            x = _ce_pass(x, 1 << s, iota)
        return x

    t = timeit(merge, a)
    report(f"bitonic merge ladder ({LOGN} passes)", N, t, 2 * 4 * N * LOGN)

    @jax.jit
    def one_pass(x):
        return _ce_pass(x, 1 << (LOGN - 1), iota)

    t = timeit(one_pass, a)
    report("single compare-exchange pass", N, t, 2 * 4 * N)


def sec_pallas():
    from jax.experimental import pallas as pl

    a = rand_u32(N, 0).reshape(N // 1024, 1024)

    def copy_kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] + jnp.uint32(1)

    f = jax.jit(
        pl.pallas_call(
            copy_kernel,
            out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
            grid=(N // (1 << 20),),
            in_specs=[pl.BlockSpec((1 << 10, 1024), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((1 << 10, 1024), lambda i: (i, 0)),
        )
    )
    report("pallas block passthrough (r+w)", N, timeit(f, a), 2 * 4 * N)

    # in-VMEM dynamic gather: does Mosaic lower jnp.take along sublanes?
    idx = jnp.asarray(
        np.random.default_rng(2).permutation(1 << 10).astype(np.int32))

    def gather_kernel(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take(x_ref[:], i_ref[:], axis=0)

    try:
        g = jax.jit(
            pl.pallas_call(
                gather_kernel,
                out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
                grid=(N // (1 << 20),),
                in_specs=[pl.BlockSpec((1 << 10, 1024), lambda i: (i, 0)),
                          pl.BlockSpec((1 << 10,), lambda i: (0,))],
                out_specs=pl.BlockSpec((1 << 10, 1024), lambda i: (i, 0)),
            )
        )
        report("pallas in-VMEM take(1024 rows)", N, timeit(g, a, idx),
               2 * 4 * N)
    except Exception as e:
        print(f"pallas in-VMEM take: FAILS — {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)

    # lane-wise gather: take_along_axis on the last dim
    idxl = jnp.asarray(
        np.random.default_rng(3).permutation(1024).astype(np.int32))

    def gatherl_kernel(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take(x_ref[:], i_ref[:], axis=1)

    try:
        gl = jax.jit(
            pl.pallas_call(
                gatherl_kernel,
                out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
                grid=(N // (1 << 20),),
                in_specs=[pl.BlockSpec((1 << 10, 1024), lambda i: (i, 0)),
                          pl.BlockSpec((1024,), lambda i: (0,))],
                out_specs=pl.BlockSpec((1 << 10, 1024), lambda i: (i, 0)),
            )
        )
        report("pallas in-VMEM take(lanes)", N, timeit(gl, a, idxl),
               2 * 4 * N)
    except Exception as e:
        print(f"pallas in-VMEM take(lanes): FAILS — {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)


def sec_scatter():
    a = rand_u32(N, 0)
    idx = jnp.asarray(
        np.random.default_rng(4).permutation(N).astype(np.int32))

    f = jax.jit(lambda x, i: jnp.zeros_like(x).at[i].set(x))
    report("XLA scatter (full permutation)", N, timeit(f, a, idx), None)

    g = jax.jit(lambda x, i: x[i])
    report("XLA gather (full permutation)", N, timeit(g, a, idx), None)

    hsz = 1 << 16
    hi = jnp.asarray((np.asarray(idx) & (hsz - 1)).astype(np.int32))
    h = jax.jit(
        lambda i: jnp.zeros(hsz, jnp.uint32).at[i].add(jnp.uint32(1)))
    report("XLA scatter-add histogram (64K bins)", N, timeit(h, hi), None)


def sec_onehot():
    # MXU permutation: batched one-hot matmul moving 8 u8 payload columns
    # (chunked: the full one-hot tensor at 2^28 is 134 GB)
    B = 256  # permutation tile
    nb = min(N, 1 << 24) // B
    rng = np.random.default_rng(5)
    perm = jnp.asarray(
        np.stack([rng.permutation(B) for _ in range(1024)])[
            rng.integers(0, 1024, nb)].astype(np.int32))
    vals = jnp.asarray(rng.integers(0, 256, (nb, B, 8), dtype=np.uint8))

    @jax.jit
    def permute(perm, vals):
        oh = jax.nn.one_hot(perm, B, dtype=jnp.bfloat16)  # (nb, B, B)
        out = jnp.einsum("bij,bjc->bic", oh,
                         vals.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        return out.astype(jnp.uint8)

    t = timeit(permute, perm, vals)
    report("one-hot matmul permute 256-tiles (8B rows)", N, t, None)
    print(f"  -> {N / t / 1e6:.0f} M rows/s", flush=True)


SECTIONS = {
    "sort": sec_sort,
    "roofline": sec_roofline,
    "bitonic": sec_bitonic,
    "pallas": sec_pallas,
    "scatter": sec_scatter,
    "onehot": sec_onehot,
}

if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"backend={jax.default_backend()} devices={jax.devices()}",
          flush=True)
    if which == "all":
        for name, fn in SECTIONS.items():
            print(f"--- {name} ---", flush=True)
            fn()
    else:
        SECTIONS[which]()
