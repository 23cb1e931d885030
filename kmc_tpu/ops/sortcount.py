"""Stage-2 device kernel: per-bin k-mer merge, count, cutoff filter.

The TPU replacement for the reference's RADULS radix sort + run-length
compaction (kb_sorter.h:210-1281): one lexicographic multiword sort, a
segment-sum of partial counts, then cutoff filtering and front-compaction so
the host only transfers surviving records.

Inputs are the per-bin concatenation of stage-1 batch outputs: the same
k-mer may appear many times with partial counts; padding rows carry count 0
and all-0xFF words, so they sort to the end and can only merge into the
last group, adding zero — harmless by construction.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(
    jax.jit, static_argnames=("cutoff_min", "cutoff_max", "counter_max")
)
def merge_count_bin(
    words: jax.Array,  # uint32[P, W], padding rows all-0xFF
    counts: jax.Array,  # uint32[P], padding rows 0
    *,
    cutoff_min: int,
    cutoff_max: int,
    counter_max: int,
):
    """Returns (kept_words uint32[P,W], kept_counts uint32[P], n_kept,
    stats = (n_unique, n_below, n_above, n_total)) — kept entries compacted
    to the front, sorted ascending, counts clamped to counter_max."""
    P, W = words.shape
    ops = jax.lax.sort(
        [words[:, t] for t in range(W)] + [counts], num_keys=W
    )
    ws = ops[:W]
    cs = ops[W]

    new = jnp.ones((P,), jnp.bool_)
    diff = jnp.zeros((P - 1,), jnp.bool_)
    for w in ws:
        diff = diff | (w[1:] != w[:-1])
    new = new.at[1:].set(diff)
    uid = jnp.cumsum(new.astype(jnp.int32)) - 1
    totals = jax.ops.segment_sum(cs.astype(jnp.uint32), uid, num_segments=P)

    starts = jnp.nonzero(new, size=P, fill_value=P)[0]
    gidx = jnp.minimum(starts, P - 1)
    u_words = [w[gidx] for w in ws]
    group_valid = (starts < P) & (totals > 0)  # drops the all-padding group

    # n_total is computed host-side from the (pre-merge) partial counts to
    # avoid 32-bit overflow; device reports per-distinct-k-mer stats only.
    n_unique = jnp.sum(group_valid.astype(jnp.int32))
    below = group_valid & (totals < cutoff_min)
    above = group_valid & (totals > cutoff_max)
    n_below = jnp.sum(below.astype(jnp.int32))
    n_above = jnp.sum(above.astype(jnp.int32))

    keep = group_valid & ~below & ~above
    kept_idx = jnp.nonzero(keep, size=P, fill_value=P)[0]
    n_kept = jnp.sum(keep.astype(jnp.int32))
    kidx = jnp.minimum(kept_idx, P - 1)
    kept_words = jnp.stack([w[kidx] for w in u_words], axis=1)
    kept_counts = jnp.minimum(totals[kidx], counter_max).astype(jnp.uint32)
    return kept_words, kept_counts, n_kept, (n_unique, n_below, n_above)
