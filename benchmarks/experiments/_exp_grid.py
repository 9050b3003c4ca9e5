"""Measure raw pallas grid-step overhead on axon."""
import functools, time
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 1 << 16
x = jnp.arange(N*1, dtype=jnp.float32).reshape(N, 1)

def trivial(x_ref, o_ref):
    o_ref[:] = x_ref[:] + 1.0

@functools.partial(jax.jit, static_argnames=("tile",))
def run(x, tile):
    return pl.pallas_call(
        trivial,
        grid=(N // tile,),
        in_specs=[pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, 1), jnp.float32),
    )(x)

@functools.partial(jax.jit, static_argnames=("tile",))
def chain(x, tile):
    s = jnp.float32(0)
    for _ in range(8):
        y = run(x, tile)
        x = y * (1.0 - 1e-12)
        s = s + y[0, 0]
    return s

for tile in (64, 256, 1024, 8192):
    f = lambda: chain(x, tile)
    float(f()); float(f())
    ts = []
    for _ in range(5):
        t0=time.perf_counter(); float(f()); ts.append(time.perf_counter()-t0)
    dt = float(np.median(ts))/8
    print(f"tile={tile} grid={N//tile}: {dt*1e3:.3f} ms/call = {dt/ (N//tile) *1e6:.2f} us/step")
