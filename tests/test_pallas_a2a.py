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
