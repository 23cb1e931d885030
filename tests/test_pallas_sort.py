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
