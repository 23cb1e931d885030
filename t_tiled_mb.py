import time, jax, jax.numpy as jnp, numpy as np

def sync(x):
    if isinstance(x,(list,tuple)): x=x[0]
    return np.asarray(x.ravel()[0])
def timeit(fn,*a,warm=1,it=3):
    for _ in range(warm): sync(fn(*a))
    b=1e9
    for _ in range(it):
        t=time.perf_counter(); sync(fn(*a)); b=min(b,time.perf_counter()-t)
    return b

N = 1 << 28
T = 256
nb = N // T
rng = np.random.default_rng(0)
key = jnp.asarray(rng.integers(0,2**32,N,dtype=np.uint32)).reshape(nb,T)
p1 = jnp.asarray(rng.integers(0,2**32,N,dtype=np.uint32)).reshape(nb,T)
p2 = jnp.asarray(rng.integers(0,2**32,N,dtype=np.uint32)).reshape(nb,T)
p3 = jnp.asarray(rng.integers(0,2**32,N,dtype=np.uint32)).reshape(nb,T)

f = jax.jit(lambda a,b,c,d: jax.lax.sort([a,b,c,d], dimension=1, num_keys=1))
t = timeit(f, key, p1, p2, p3)
print(f"tile-sort (2^20,256) 1key+3pay: {t*1e3:9.2f} ms", flush=True)

f2 = jax.jit(lambda a,b: jax.lax.sort([a,b], dimension=1, num_keys=1))
t = timeit(f2, key, p1)
print(f"tile-sort (2^20,256) 1key+1pay: {t*1e3:9.2f} ms", flush=True)

# gather: 2^23 rows from a 2^28 1-D table, x3 columns
M = 1 << 23
flat = key.reshape(N)
idx = jnp.asarray(rng.integers(0, N, M, dtype=np.int32))
g = jax.jit(lambda x,i: (x[i],))
t = timeit(g, flat, idx)
print(f"gather 2^23 from 2^28 (1 col): {t*1e3:9.2f} ms", flush=True)
g3 = jax.jit(lambda x,y,z,i: (x[i], y[i], z[i]))
t = timeit(g3, flat, p1.reshape(N), p2.reshape(N), idx)
print(f"gather 2^23 from 2^28 (3 cols): {t*1e3:9.2f} ms", flush=True)

# searchsorted 2^23 needles into 2^20 offsets
offs = jnp.asarray(np.sort(rng.integers(0, N, nb).astype(np.uint32)))
ss = jax.jit(lambda o,n: jnp.searchsorted(o, n))
needles = jnp.asarray(rng.integers(0, N, M, dtype=np.uint32))
t = timeit(ss, offs, needles)
print(f"searchsorted 2^23 into 2^20: {t*1e3:9.2f} ms", flush=True)

# cumsum over 2^20 tiles (offsets)
cs = jax.jit(lambda c: jnp.cumsum(c))
cnts = jnp.asarray(rng.integers(0, 32, nb).astype(np.uint32))
t = timeit(cs, cnts)
print(f"cumsum 2^20: {t*1e3:9.2f} ms", flush=True)
