#!/usr/bin/env python
"""Microbench: masked index compaction strategies on TPU.

bezier.py's ray compaction ran jnp.nonzero(mask, size=cap) every walk
segment (224x/pass); the profile showed its scatter-add at 1.14 ms per call
on 131072 lanes.  Candidates:
  * nonzero:  jnp.nonzero(mask, size=cap, fill_value=N)
  * argsort:  stable argsort of ~mask, slice cap, re-validate
  * sortkv:   lax.sort_key_val(~mask, iota), slice cap, re-validate
Also times the deposit-key sort pair: argsort+gather vs sort_key_val
(1835008 keys; profile: gather alone 27.7 ms).
"""
import os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import jax, jax.numpy as jnp, numpy as np

N, CAP, FRAC = 131072, 6553, 0.05
key = jax.random.key(0)
mask = jax.random.uniform(key, (N,)) < FRAC

def nonzero(m):
    return jnp.nonzero(m, size=CAP, fill_value=N)[0]

def argsortc(m):
    idx = jnp.argsort(jnp.logical_not(m), stable=True)[:CAP]
    return jnp.where(m[idx], idx, N)

def sortkv(m):
    k = jnp.logical_not(m).astype(jnp.int32)
    _, idx = jax.lax.sort_key_val(k, jnp.arange(N, dtype=jnp.int32))
    idx = idx[:CAP]
    return jnp.where(m[idx], idx, N)

D = 1835008
dkey = jax.random.uniform(jax.random.key(1), (D,))
def argsort_gather(k):
    o = jnp.argsort(k)
    return k[o], o
def skv(k):
    return jax.lax.sort_key_val(k, jnp.arange(D, dtype=jnp.int32))

def timeit(name, fn, arg, reps=30):
    f = jax.jit(fn)
    out = f(arg); jax.block_until_ready(out)
    # force real completion through the tunnel with a scalar device_get
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(arg)
    s = jax.tree.leaves(out)[0]
    _ = float(jnp.sum(s[:8].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:16s} {dt:8.3f} ms")
    return out

a = timeit("nonzero", nonzero, mask)
b = timeit("argsort", argsortc, mask)
c = timeit("sortkv", sortkv, mask)
np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
print("compaction outputs identical")

x = timeit("argsort+gather", argsort_gather, dkey, reps=10)
y = timeit("sort_key_val", skv, dkey, reps=10)
np.testing.assert_array_equal(np.asarray(x[0]), np.asarray(y[0]))
np.testing.assert_array_equal(np.asarray(x[1]), np.asarray(y[1]))
print("sort outputs identical")
