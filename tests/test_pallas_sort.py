"""The experimental blocked bitonic sort (ops/pallas_sort.py) must sort
exactly — validated in interpret mode at the smallest layout-legal size
(2^19 elements: 4096 rows x 128 lanes, 4 blocks per fused ladder)."""
import numpy as np
import pytest

import jax.numpy as jnp

from kmc_tpu.ops.pallas_sort import BLOCK_R, LANES, pallas_bitonic_sort

N = LANES * 2 * BLOCK_R  # minimum legal size


def test_unique_key_with_payload_matches_argsort():
    rng = np.random.default_rng(0)
    key = rng.permutation(N).astype(np.uint32)  # unique keys
    pay = rng.integers(0, 2**32, N, dtype=np.uint32)
    out = pallas_bitonic_sort([jnp.asarray(key), jnp.asarray(pay)],
                              n_keys=1, interpret=True)
    order = np.argsort(key)
    assert np.array_equal(np.asarray(out[0]), key[order])
    assert np.array_equal(np.asarray(out[1]), pay[order])


def test_two_key_lexicographic_with_duplicates():
    rng = np.random.default_rng(1)
    k0 = rng.integers(0, 64, N, dtype=np.uint32)  # heavy duplicates
    k1 = rng.integers(0, 2**32, N, dtype=np.uint32)
    out = pallas_bitonic_sort([jnp.asarray(k0), jnp.asarray(k1)],
                              n_keys=2, interpret=True)
    import jax.lax as lax

    ref = lax.sort([jnp.asarray(k0), jnp.asarray(k1)], num_keys=2)
    assert np.array_equal(np.asarray(out[0]), np.asarray(ref[0]))
    assert np.array_equal(np.asarray(out[1]), np.asarray(ref[1]))


def test_grouping_sort_padding_matches_lax():
    """store._grouping_sort pads non-pow2 stores with sentinel rows
    (all-U32MAX keys, zero counts — the store's dead-row encoding) and
    slices back; the result must equal lax.sort exactly."""
    import jax.lax as lax

    from kmc_tpu.ops.store import _grouping_sort

    X = 3 << 17  # pads to 2^19 internally
    rng = np.random.default_rng(3)
    k0 = rng.integers(0, 2**32 - 1, X, dtype=np.uint32)  # live keys < max
    k1 = rng.integers(0, 2**32, X, dtype=np.uint32)
    cnt = rng.integers(1, 100, X, dtype=np.uint32)
    dead = rng.random(X) < 0.1
    k0[dead] = 0xFFFFFFFF
    k1[dead] = 0xFFFFFFFF
    cnt[dead] = 0
    cols = [jnp.asarray(k0), jnp.asarray(k1), jnp.asarray(cnt)]
    got = _grouping_sort(cols, 2, "interpret")
    ref = lax.sort(cols, num_keys=2)
    for g, r in zip(got, ref):
        assert np.array_equal(np.asarray(g), np.asarray(r))


def test_grouping_sort_small_falls_back_to_lax():
    from kmc_tpu.ops.store import _grouping_sort

    x = jnp.asarray(np.random.default_rng(4).integers(
        0, 2**32, 1024, dtype=np.uint32))
    got = _grouping_sort([x], 1, "interpret")  # pad > 2x -> lax fallback
    assert np.array_equal(np.asarray(got[0]), np.sort(np.asarray(x)))


def test_extreme_values_and_presorted():
    rng = np.random.default_rng(2)
    key = rng.integers(0, 2**32, N, dtype=np.uint32)
    key[:100] = 0xFFFFFFFF  # the store's dead-row sentinel
    key[100:200] = 0
    out = pallas_bitonic_sort([jnp.asarray(key)], n_keys=1, interpret=True)
    assert np.array_equal(np.asarray(out[0]), np.sort(key))
    # already sorted input is a fixed point
    out2 = pallas_bitonic_sort([jnp.asarray(np.sort(key))], n_keys=1,
                               interpret=True)
    assert np.array_equal(np.asarray(out2[0]), np.sort(key))
