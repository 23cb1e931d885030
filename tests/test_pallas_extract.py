"""Pallas fused extract == XLA extract (interpret mode on CPU)."""
import numpy as np
import pytest

import jax.numpy as jnp

from kmc_tpu.ops.extract import _kmer_words, position_sigs
from kmc_tpu.ops.pallas_extract import TILE, pallas_batch_len, pallas_extract


@pytest.mark.parametrize("k", [21, 27, 32, 33])
@pytest.mark.parametrize("both", [True, False])
def test_pallas_extract_matches_xla(k, both):
    s, m = TILE * 2, 9
    rng = np.random.default_rng(k)
    codes = rng.integers(0, 5, pallas_batch_len(s, k)).astype(np.uint8)

    out = pallas_extract(
        jnp.asarray(codes), s=s, k=k, sig_len=m, both_strands=both,
        interpret=True,
    )
    sig_p, words_p = out[0], jnp.stack(out[1:], axis=1)

    c = jnp.asarray(codes, jnp.uint32)
    bad = (c >= 4).astype(jnp.int32)
    c4 = jnp.minimum(c, 3)
    valid, sig_x, p, q = position_sigs(c4, bad, s=s, k=k, sig_len=m)
    wl = _kmer_words(p, q, k, s, both)
    words_x = jnp.stack(
        [jnp.where(valid, w, jnp.uint32(0xFFFFFFFF)) for w in wl], axis=1
    )

    assert np.array_equal(np.asarray(sig_p), np.asarray(sig_x))
    assert np.array_equal(np.asarray(words_p), np.asarray(words_x))


@pytest.mark.parametrize("k,both", [(27, True), (21, False), (55, True),
                                    (129, True), (256, True)])
def test_pallas_extract2d_matches_xla(k, both):
    """The 2-D sublane-layout kernel (position (r,c) = c*seg + r; every
    window shift a sublane slice) must match the XLA extract exactly —
    including k>64, where tile_rows(k) shrinks the grid block to fit
    scoped VMEM."""
    from kmc_tpu.ops.pallas_extract import (
        pallas2d_align,
        pallas2d_batch_len,
        pallas_extract2d,
    )

    s, m = pallas2d_align(k), 9
    rng = np.random.default_rng(1000 + k)
    codes = rng.integers(0, 5, pallas2d_batch_len(s, k)).astype(np.uint8)

    out = pallas_extract2d(jnp.asarray(codes), s=s, k=k, sig_len=m,
                           both_strands=both, interpret=True)
    sig_p, words_p = out[0], jnp.stack(out[1:], axis=1)

    from kmc_tpu.ops.extract import batch_len

    L = batch_len(s, k)
    cl = codes[:L] if len(codes) >= L else np.concatenate(
        [codes, np.full(L - len(codes), 4, np.uint8)])
    c = jnp.asarray(cl, jnp.uint32)
    bad = (c >= 4).astype(jnp.int32)
    c4 = jnp.minimum(c, 3)
    valid, sig_x, p, q = position_sigs(c4, bad, s=s, k=k, sig_len=m)
    wl = _kmer_words(p, q, k, s, both)
    sig_x = jnp.where(valid, sig_x, jnp.uint32(0xFFFFFFFF))
    words_x = jnp.stack(
        [jnp.where(valid, w, jnp.uint32(0xFFFFFFFF)) for w in wl], axis=1)
    assert np.array_equal(np.asarray(sig_p), np.asarray(sig_x))
    assert np.array_equal(np.asarray(words_p), np.asarray(words_x))


def test_wired_pallas_extract_db_identical(tmp_path, monkeypatch):
    """KMC_TPU_PALLAS_EXTRACT=interpret routes the ingest through the 2-D
    Pallas extract (interpreter on CPU); the DB must be byte-identical to
    the XLA-extract path."""
    import sys
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from util import random_reads, write_fastq

    from kmc_tpu.ops.pallas_extract import LANES, TILE_R
    from kmc_tpu.runner import count

    s = LANES * TILE_R  # aligned batch => kernel path eligible
    reads = random_reads(400, 120, seed=61, genome_len=5000)
    reads[7] = reads[7][:50] + "N" + reads[7][51:]
    inp = write_fastq(tmp_path / "in.fastq", reads)

    monkeypatch.setenv("KMC_TPU_PALLAS_EXTRACT", "off")
    out_x = str(tmp_path / "xla")
    count([inp], out_x, k=27, cutoff_min=1, batch_positions=s)

    monkeypatch.setenv("KMC_TPU_PALLAS_EXTRACT", "interpret")
    out_p = str(tmp_path / "pallas")
    count([inp], out_p, k=27, cutoff_min=1, batch_positions=s)

    for suf in (".kmc_pre", ".kmc_suf"):
        with open(out_x + suf, "rb") as a, open(out_p + suf, "rb") as b:
            assert a.read() == b.read(), suf
