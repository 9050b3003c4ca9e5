import functools, time
import numpy as np, jax, jax.numpy as jnp
from tputracer.scene import mesh_scene
from tputracer.accel import intersect
scene = mesh_scene(subdiv=6)
N = 1 << 16
rng = np.random.default_rng(0)
o = jnp.asarray(rng.uniform(-2, 2, (N,3)).astype(np.float32))
dd = rng.normal(size=(N,3)).astype(np.float32)
d = jnp.asarray(dd/np.linalg.norm(dd,axis=1,keepdims=True))

@functools.partial(jax.jit, static_argnames=("dead",))
def chain(o, d, dead):
    tmin = jnp.zeros((N,), jnp.float32)
    tmax = jnp.zeros((N,), jnp.float32) if dead else jnp.full((N,), 3e38, jnp.float32)
    s = jnp.float32(0)
    for _ in range(4):
        h = intersect(scene, o, d, tmin, tmax)
        o = o + h.t[:, None] * 1e-20
        s = s + jnp.sum(jnp.where(h.valid, h.t, 0.0))
    return s
for dead in (False, True):
    f = lambda: chain(o, d, dead)
    float(f()); float(f())
    ts=[]
    for _ in range(5):
        t0=time.perf_counter(); float(f()); ts.append(time.perf_counter()-t0)
    print(f"dead={dead}: {float(np.median(ts))/4*1e3:.3f} ms/call")
