"""Is the 5ms per pallas call fixed overhead, or the (N,1) shape?"""
import functools, time
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 1 << 16

def trivial(x_ref, o_ref):
    o_ref[:] = x_ref[:] + 1.0

def make(shape, block):
    x0 = jnp.arange(np.prod(shape), dtype=jnp.float32).reshape(shape)
    grid = (shape[0] // block[0],)
    @functools.partial(jax.jit, static_argnames=('k',))
    def chain(x, k):
        s = jnp.float32(0)
        for _ in range(k):
            y = pl.pallas_call(
                trivial, grid=grid,
                in_specs=[pl.BlockSpec(block, lambda i: (i, 0), memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(block, lambda i: (i, 0), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
            )(x)
            x = y * (1.0 - 1e-12)
            s = s + y[0, 0]
        return s
    return x0, chain

for shape, block in (((N, 1), (64, 1)), ((N, 1), (8192, 1)),
                     ((N // 128, 128), (64, 128)), ((N // 128, 128), (512, 128)),
                     ((8, 128), (8, 128))):
    x0, chain = make(shape, block)
    for k in (1, 8):
        f = lambda: chain(x0, k)
        float(f()); float(f())
        ts = []
        for _ in range(5):
            t0=time.perf_counter(); float(f()); ts.append(time.perf_counter()-t0)
        dt = float(np.median(ts))
        print(f"shape={shape} block={block} k={k}: {dt*1e3:.3f} ms total")
