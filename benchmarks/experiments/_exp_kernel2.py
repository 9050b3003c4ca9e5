"""Clean kernel timing: K=32 chained calls, scalar fetch (~30ms floor amortized)."""
import functools, time, os
import numpy as np, jax, jax.numpy as jnp
from tputracer.scene import mesh_scene
from tputracer.accel import intersect, occluded
from tputracer.integrators.pt import camera_rays
from tputracer.config import RenderConfig

scene = mesh_scene(subdiv=6)
N = 1 << 16
cfg = RenderConfig(width=256, height=256, spp=1, max_bounces=1)
uid = jnp.arange(N, dtype=jnp.uint32)
o_c, d_c = jax.jit(lambda u: camera_rays(scene, u, cfg))(uid)
rng = np.random.default_rng(0)
o_i = jnp.asarray(rng.uniform(np.array([-2,0,-2]), np.array([2,3,2]), (N,3)).astype(np.float32))
dd = rng.normal(size=(N,3)).astype(np.float32)
d_i = jnp.asarray(dd/np.linalg.norm(dd,axis=1,keepdims=True))
K = 32

@functools.partial(jax.jit, static_argnames=("dead","frac"))
def chain(o, d, dead=False, frac=1.0):
    tmin = jnp.zeros((N,), jnp.float32)
    alive = (jnp.arange(N) < int(N*frac)) & (not dead)
    tmax0 = jnp.where(alive, 3e38, 0.0).astype(jnp.float32)
    s = jnp.float32(0)
    tmax = tmax0
    for _ in range(K):
        h = intersect(scene, o, d, tmin, tmax)
        tmax = tmax0 * (1.0 - jnp.sum(h.t) * 1e-40)
        s = s + jnp.sum(jnp.where(h.valid, h.t, 0.0))
    return s

def run(tag, o, d, **kw):
    f = lambda: chain(o, d, **kw)
    float(f()); float(f())
    ts=[]
    for _ in range(3):
        t0=time.perf_counter(); float(f()); ts.append(time.perf_counter()-t0)
    dt=(float(np.median(ts)) - 0.0) / K
    print(f"{tag}: {dt*1e3:.3f} ms/call -> {N/dt/1e6:.1f}M rays/s")

run("coherent ", o_c, d_c)
run("incoherent", o_i, d_i)
run("dead     ", o_i, d_i, dead=True)
run("inc half-sorted frac=0.25", o_i, d_i, frac=0.25)
