import numpy as np, jax
from kmc_tpu.ops.extract import position_sigs, _kmer_words, _unpack_device, batch_len
from kmc_tpu.ops.pallas_extract import pallas_extract, pallas_batch_len, TILE
import jax.numpy as jnp

s, k, sig_len = 1 << 20, 27, 9
rng = np.random.default_rng(0)
n = pallas_batch_len(s, k)
codes = rng.integers(0, 4, n).astype(np.uint8)
codes[150::151] = 4

sig_p, *lanes_p = [np.asarray(x) for x in pallas_extract(jnp.asarray(codes), s=s, k=k, sig_len=sig_len, both_strands=True)]

# XLA reference on the same positions
L = batch_len(s, k)
c = jnp.asarray(codes[:L])
bad = c >= 4
c4 = jnp.minimum(c, 3).astype(jnp.uint32)
valid, sig_x, p, q = position_sigs(c4, bad, s=s, k=k, sig_len=sig_len)
from kmc_tpu.ops.extract import INVALID_SIG
wl = _kmer_words(p, q, k, s, both_strands=True)
sig_x = np.asarray(jnp.where(valid, sig_x, jnp.uint32(INVALID_SIG)))
lanes_x = [np.asarray(jnp.where(valid, w, jnp.uint32(0xFFFFFFFF))) for w in wl]
print("sig equal:", np.array_equal(sig_p, sig_x), "mismatches:", int((sig_p != sig_x).sum()))
for t,(a,b) in enumerate(zip(lanes_p, lanes_x)):
    print(f"lane{t} equal:", np.array_equal(a,b), "mismatches:", int((a!=b).sum()))
