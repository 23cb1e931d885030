"""Small-k direct counting (k <= 13): dense 4^k counter tensor on device.

Replaces binning/sorting entirely, mirroring the reference's small-k
optimization (kmc.h:677-970, splitter.cpp:682-805): every valid (canonical)
k-mer increments a dense counter; batches accumulate into one histogram.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .extract import _kmer_words, _pack_streams, _unpack_device


@functools.partial(jax.jit, static_argnames=("s", "k", "both_strands"), donate_argnums=(1,))
def smallk_batch(codes: jax.Array, hist: jax.Array, *, s: int, k: int, both_strands: bool):
    """Accumulate canonical k-mer occurrences of one batch into hist
    (uint32[4^k + 1]; the last slot absorbs invalid positions)."""
    c = codes.astype(jnp.uint32)
    bad = (c >= 4).astype(jnp.int32)
    c4 = jnp.minimum(c, 3)
    return _smallk_core(c4, bad, hist, s=s, k=k, both_strands=both_strands)


@functools.partial(jax.jit, static_argnames=("s", "k", "both_strands"), donate_argnums=(2,))
def smallk_batch_packed(
    packed: jax.Array, mask: jax.Array, hist: jax.Array, *, s: int, k: int, both_strands: bool
):
    c4, bad = _unpack_device(packed, mask)
    return _smallk_core(c4, bad, hist, s=s, k=k, both_strands=both_strands)


def _smallk_core(c4, bad, hist, *, s: int, k: int, both_strands: bool):
    p, q = _pack_streams(c4, c4.shape[0] - 15)
    cs = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(bad)])
    valid = (cs[k : k + s] - cs[0:s]) == 0
    words = _kmer_words(p, q, k, s, both_strands)  # k<=13 -> single lane
    idx = jnp.where(valid, words[0], jnp.uint32(1 << (2 * k)))
    return hist.at[idx].add(1)


def smallk_histogram_shape(k: int):
    return ((1 << (2 * k)) + 1,)
