"""Measure lax.sort / gather / cumsum cost on the axon TPU backend.

The round-4 pair-expansion traversal needs, per traversal call:
  - one sort of ~1M (int32 key, int32 idx) pairs by cluster id
  - gathers of ray data by pair index (~10 f32 per pair)
  - scatter-back (inverse gather) of 2 outputs
Round 2/3 found whole-wavefront argsort+gather "a wash" and round 3 hit
a >20 min compile on an 8-bounce sorted program — this isolates whether
the SORT/GATHER primitives themselves are slow or whether it was the
full-state gather fusion.  Chains 17 sort+gather rounds in one jit to
emulate the per-frame count and to smoke-test compile time.

Run on TPU: python benchmarks/experiments/_exp_sortcost.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(f, *a):
    out = jax.block_until_ready(f(*a))
    jax.block_until_ready(f(*a))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*a))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), out


N = 1 << 20
key = jax.random.randint(jax.random.key(0), (N,), 0, 928, jnp.int32)
val = jnp.arange(N, dtype=jnp.int32)
data = jax.random.normal(jax.random.key(1), (N, 8), jnp.float32)

t0 = time.perf_counter()


@jax.jit
def one_sort(key, val):
    return jax.lax.sort((key, val), num_keys=1)


dt, _ = timed(one_sort, key, val)
print(f"lax.sort 1M (k,v): {dt*1e3:.3f} ms  [compile+2warm "
      f"{time.perf_counter()-t0:.1f}s]")


@jax.jit
def one_argsort(key):
    return jnp.argsort(key)


dt, _ = timed(one_argsort, key)
print(f"argsort 1M: {dt*1e3:.3f} ms")


@jax.jit
def one_gather(data, idx):
    return data[idx]


idx = one_argsort(key)
dt, _ = timed(one_gather, data, idx)
print(f"gather 1M x 8 f32: {dt*1e3:.3f} ms")


@jax.jit
def one_cumsum(x):
    return jnp.cumsum(x, axis=0)


dt, _ = timed(one_cumsum, jnp.ones((N,), jnp.int32))
print(f"cumsum 1M int32: {dt*1e3:.3f} ms")


# chained: 17 rounds of sort+gather+scatter-back in ONE jit, like a frame
@jax.jit
def chained(key, data):
    acc = jnp.zeros((N,), jnp.float32)
    k = key
    for i in range(17):
        kk, idx = jax.lax.sort((k, jnp.arange(N, dtype=jnp.int32)),
                               num_keys=1)
        g = data[idx]                       # gather by perm
        out = g.sum(axis=1)
        acc = acc.at[idx].add(out)          # scatter-back
        k = (kk * 1103515245 + 12345 + i) % 928
    return acc


t0 = time.perf_counter()
dt, _ = timed(chained, key, data)
print(f"chained 17x(sort+gather+scatter): {dt*1e3:.3f} ms "
      f"({dt/17*1e3:.3f} ms/round)  [compile+2warm "
      f"{time.perf_counter()-t0:.1f}s]")
