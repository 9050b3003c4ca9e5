"""VPU throughput microbenchmarks: why does the slab pass run ~10x below
the MT trip's achieved rate on same-shaped ops?

Variants (all: grid=64 steps, SUB=16 'subtiles' per step to mirror the
production kernel):
  fma64x936   — K unrolled FMAs on a (64,936) value
  fma64x128   — K unrolled FMAs on a (64,128) value
  slab1       — the exact slab chain, reading (1,C) table rows + (64,1)
                ray columns (production structure)
  slab2       — slab chain with ray scalars pre-broadcast to (64,C) ONCE
  slab3       — slab chain with the (1,C)-row loads hoisted to values
                read once per subtile
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE, SUB, C = 64, 16, 936
BIG = 3.0e38


def _kern_fma(o_ref, out, scr, *, shape, K):
    for s in range(SUB):
        x = o_ref[0:shape[0], 0:1] + jnp.zeros(shape, jnp.float32)
        for k in range(K):
            x = x * 1.000001 + 0.5
        out[s:s + 1, 0:1] = jnp.min(x).reshape(1, 1)


def _kern_slab(o_ref, d_ref, cmin_ref, cmax_ref, out, te_scr, *, mode):
    for s in range(SUB):
        rs = slice(s * TILE, (s + 1) * TILE)
        tn = jnp.full((TILE, C), -BIG)
        tf = jnp.full((TILE, C), BIG)
        if mode == 3:
            cmin_rows = [cmin_ref[a:a + 1, :] + 0.0 for a in range(3)]
            cmax_rows = [cmax_ref[a:a + 1, :] + 0.0 for a in range(3)]
        for a in range(3):
            da = d_ref[rs, a:a + 1]
            tiny = 1e-12
            inv = 1.0 / jnp.where(jnp.abs(da) < tiny,
                                  jnp.where(da >= 0.0, tiny, -tiny), da)
            oa = o_ref[rs, a:a + 1]
            if mode == 1:
                t0 = (cmin_ref[a:a + 1, :] - oa) * inv
                t1 = (cmax_ref[a:a + 1, :] - oa) * inv
            elif mode == 2:
                ob = oa + jnp.zeros((TILE, C), jnp.float32)
                ib = inv + jnp.zeros((TILE, C), jnp.float32)
                t0 = (cmin_ref[a:a + 1, :] - ob) * ib
                t1 = (cmax_ref[a:a + 1, :] - ob) * ib
            else:
                t0 = (cmin_rows[a] - oa) * inv
                t1 = (cmax_rows[a] - oa) * inv
            tn = jnp.maximum(tn, jnp.minimum(t0, t1))
            tf = jnp.minimum(tf, jnp.maximum(t0, t1))
        hit = tn <= tf
        te_scr[:] = jnp.where(hit, tn, BIG)
        out[rs] = jnp.min(te_scr[:], axis=1, keepdims=True)


def run_fma(n_steps, shape, K):
    out = pl.pallas_call(
        functools.partial(_kern_fma, shape=shape, K=K),
        grid=(n_steps,),
        in_specs=[pl.BlockSpec((TILE * SUB, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((SUB, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_steps * SUB, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM(shape, jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )
    return out


def run_slab(n_steps, mode):
    blk = TILE * SUB
    ray2 = lambda w: pl.BlockSpec((blk, w), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
    full = lambda shp: pl.BlockSpec(shp, lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kern_slab, mode=mode),
        grid=(n_steps,),
        in_specs=[ray2(3), ray2(3), full((3, C)), full((3, C))],
        out_specs=ray2(1),
        out_shape=jax.ShapeDtypeStruct((n_steps * blk, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TILE, C), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )


def main():
    n_steps = 64
    n = n_steps * TILE * SUB
    r = np.random.default_rng(0)
    o = jnp.asarray(r.normal(size=(n, 3)).astype(np.float32))
    d = jnp.asarray(r.normal(size=(n, 3)).astype(np.float32))
    cmin = jnp.asarray(r.normal(size=(3, C)).astype(np.float32))
    cmax = cmin + 1.0

    def timeit(fn, *args):
        g = jax.jit(fn)
        out = g(*args)
        np.asarray(out)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = g(*args)
            out.block_until_ready()
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    K = 32
    for shape in ((64, 936), (64, 128), (128, 1024)):
        f = run_fma(n_steps, shape, K)
        t = timeit(lambda oo: f(oo), o[:, :1])
        ops = n_steps * SUB * K * shape[0] * shape[1]
        print(f"fma{shape}: {t*1e3:8.3f} ms  "
              f"{ops/t/1e9:7.1f} Gop/s", flush=True)
    for mode in (1, 2, 3):
        f = run_slab(n_steps, mode)
        t = timeit(lambda a, b, c_, e: f(a, b, c_, e), o, d, cmin, cmax)
        print(f"slab{mode}: {t*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
