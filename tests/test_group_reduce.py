"""_group_reduce: wide mode (no 2^31 occurrence cap) vs narrow vs numpy."""
import numpy as np
import pytest

import jax.numpy as jnp

from kmc_tpu.ops.store import _group_reduce


def _np_groups(keys, counts):
    """Reference grouping: sorted unique keys with summed counts (uint32
    wraparound semantics per group)."""
    order = np.lexsort(keys[::-1])
    ks = np.stack([k[order] for k in keys], axis=1)
    cs = counts[order].astype(np.uint64)
    uniq, idx = np.unique(ks, axis=0, return_index=True)
    # np.unique sorts rows lexicographically; sum counts per group
    totals = []
    bounds = np.sort(idx)
    bounds = np.append(bounds, len(ks))
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        totals.append(cs[lo:hi].sum() & 0xFFFFFFFF)
    return uniq, np.asarray(totals, np.uint32)


@pytest.mark.parametrize("wide", [False, True])
def test_group_reduce_matches_numpy(wide):
    rng = np.random.default_rng(3)
    X = 4096
    k0 = rng.integers(0, 50, X).astype(np.uint32)
    k1 = rng.integers(0, 4, X).astype(np.uint32)
    counts = rng.integers(1, 9, X).astype(np.uint32)
    keys_r, _, totals, n_groups = _group_reduce(
        [jnp.asarray(k0), jnp.asarray(k1)], [], jnp.asarray(counts), wide=wide
    )
    n = int(n_groups)
    got_keys = np.stack([np.asarray(c[:n]) for c in keys_r], axis=1)
    got_tot = np.asarray(totals[:n])
    exp_keys, exp_tot = _np_groups([k0, k1], counts)
    assert np.array_equal(got_keys, exp_keys)
    assert np.array_equal(got_tot, exp_tot)


def test_group_reduce_wide_over_2e31_occurrences():
    """Sum of counts far beyond 2^31: the narrow path's flag bit would be
    clobbered; wide mode must stay exact (per-group totals < 2^32)."""
    rng = np.random.default_rng(4)
    X = 1024
    k0 = rng.integers(0, 40, X).astype(np.uint32)
    counts = rng.integers(1 << 26, 1 << 27, X).astype(np.uint32)  # sum ~ 2^36
    keys_r, _, totals, n_groups = _group_reduce(
        [jnp.asarray(k0)], [], jnp.asarray(counts), wide=True
    )
    n = int(n_groups)
    got = dict(zip(np.asarray(keys_r[0][:n]).tolist(),
                   np.asarray(totals[:n]).tolist()))
    exp_keys, exp_tot = _np_groups([k0], counts)
    exp = dict(zip(exp_keys[:, 0].tolist(), exp_tot.tolist()))
    assert got == exp


def test_group_reduce_wide_payloads():
    """Payload columns must ride along with their group representative."""
    k0 = np.array([5, 1, 5, 1, 9], np.uint32)
    pay = np.array([50, 10, 51, 11, 90], np.uint32)
    counts = np.ones(5, np.uint32)
    keys_r, pays_r, totals, n_groups = _group_reduce(
        [jnp.asarray(k0)], [jnp.asarray(pay)], jnp.asarray(counts), wide=True
    )
    n = int(n_groups)
    assert n == 3
    assert np.asarray(keys_r[0][:n]).tolist() == [1, 5, 9]
    assert np.asarray(totals[:n]).tolist() == [2, 2, 1]
    # each group's payload is one of its members' payloads
    got_pay = np.asarray(pays_r[0][:n]).tolist()
    assert got_pay[0] in (10, 11) and got_pay[1] in (50, 51) and got_pay[2] == 90


def test_compact_effective_stitches_partial_width(monkeypatch):
    """Voluntary mid-run compaction (compact_effective) slices to the
    grain-rounded used width, dedups there, and stitches the result back
    over the full-width store: totals/uniques must survive across the
    unit->counted transition and repeated compactions."""
    monkeypatch.setenv("KMC_TPU_FINALIZE_GRAIN", "64")
    from kmc_tpu.ops.store import DeviceKmerStore

    st = DeviceKmerStore(1024, k=21, sig_len=7, both_strands=True,
                         n_bins=64, initial_rows=1024)
    X = st.key_cols[0].shape[0]
    keys = np.arange(100, dtype=np.uint32) % 40  # duplicates
    st.append((keys, keys), np.ones(100, np.uint32))
    st.compact_effective()  # eff=128 << X -> the stitch branch
    assert st.n_autocompacts == 1
    assert st.key_cols[0].shape[0] == X  # still full width
    keys2 = (np.arange(60, dtype=np.uint32) % 40) + 20
    st.append((keys2, keys2), np.ones(60, np.uint32))
    st.compact_effective()  # counted stitch branch
    assert st.n_autocompacts == 2
    st.compact(blocking=True)
    runs = st._host_runs()
    total = sum(int(c[c > 0].sum()) for _, c in runs)
    uniq = sum(int((c > 0).sum()) for _, c in runs)
    assert total == 160
    assert uniq == 60  # 0..39 union 20..59


def test_spill_realloc_includes_slack_region(monkeypatch):
    """Regression (ADVICE round 1): spill() must reallocate capacity+slack
    rows.  With KMC_TPU_STORE_SLACK_DIV set, a post-spill deferred
    compaction keeps appending into the slack region [capacity,
    capacity+slack); a short allocation makes dynamic_update_slice clamp
    those appends over the store's tail rows — silent count corruption."""
    monkeypatch.setenv("KMC_TPU_STORE_SLACK_DIV", "2")
    from kmc_tpu.ops.store import DeviceKmerStore

    st = DeviceKmerStore(64, k=21, sig_len=7, both_strands=True, n_bins=64,
                         initial_rows=64)
    assert st._slack == 32

    def put(lo, n):
        keys = np.arange(lo, lo + n, dtype=np.uint32)
        st.append((keys, keys), np.ones(n, np.uint32))

    put(0, 48)
    st.spill()  # buggy spill() reallocates only 64 rows, not 96
    put(1000, 64)   # fill to capacity
    put(2000, 16)   # grow fails -> compact -> append lands in slack rows
    st.compact(blocking=True)
    runs = st._host_runs()
    # each compacted run may carry a trailing dead (U32MAX, count 0) row
    total = sum(int(c[c > 0].sum()) for _, c in runs)
    uniq = sum(int((c > 0).sum()) for _, c in runs)
    assert total == 48 + 64 + 16
    assert uniq == 48 + 64 + 16
