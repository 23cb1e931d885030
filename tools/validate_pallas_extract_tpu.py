#!/usr/bin/env python
"""On-chip exactness check for the 2-D sublane Pallas extract: compiles
pallas_extract2d on the attached TPU and bit-compares sig + k-mer lanes
against the XLA extract for k in {27, 21, 55} (1024-row tiles)
and {77, 128, 200, 256} (512-row tiles, W-adaptive VMEM budget).  (The interpret-mode
equivalent runs in CI: tests/test_pallas_extract.py.)"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax; 
import numpy as np, jax.numpy as jnp
from kmc_tpu.ops.extract import position_sigs, _kmer_words, batch_len, INVALID_SIG
from kmc_tpu.ops.pallas_extract import pallas_extract2d, pallas2d_batch_len

for k in (27, 21, 55, 77, 128, 200, 256):
    s, sig_len = 1 << 19, 9
    rng = np.random.default_rng(k)
    codes = rng.integers(0, 5, pallas2d_batch_len(s, k)).astype(np.uint8)
    sig_p, *lanes_p = [np.asarray(x) for x in pallas_extract2d(
        jnp.asarray(codes), s=s, k=k, sig_len=sig_len, both_strands=True,
        interpret=False)]
    L = batch_len(s, k)
    cl = codes[:L] if len(codes) >= L else np.concatenate([codes, np.full(L-len(codes),4,np.uint8)])
    c = jnp.asarray(cl); bad = c >= 4; c4 = jnp.minimum(c, 3).astype(jnp.uint32)
    valid, sig_x, p, q = position_sigs(c4, bad, s=s, k=k, sig_len=sig_len)
    wl = _kmer_words(p, q, k, s, both_strands=True)
    sig_x = np.asarray(jnp.where(valid, sig_x, jnp.uint32(INVALID_SIG)))
    ok = np.array_equal(sig_p, sig_x)
    print(f"k={k} sig equal:", ok, "" if ok else f"mism={int((sig_p!=sig_x).sum())}")
    for t, w in enumerate(wl):
        lx = np.asarray(jnp.where(valid, w, jnp.uint32(0xFFFFFFFF)))
        print(f"  lane{t}:", np.array_equal(lanes_p[t], lx))
