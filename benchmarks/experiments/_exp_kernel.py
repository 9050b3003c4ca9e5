import time, numpy as np, jax, jax.numpy as jnp
from tputracer.scene import mesh_scene
from tputracer.accel import intersect, occluded
from tputracer.integrators.pt import camera_rays
from tputracer.config import RenderConfig

scene = mesh_scene(subdiv=6)
N = 1 << 16
cfg = RenderConfig(width=256, height=256, spp=1, max_bounces=1)

rng = np.random.default_rng(0)
# coherent: camera rays
uid = jnp.arange(N, dtype=jnp.uint32)
o_c, d_c = jax.jit(lambda u: camera_rays(scene, u, cfg))(uid)
# incoherent: random origins in bbox, random dirs
lo, hi = np.array([-2,0,-2]), np.array([2,3,2])
o_i = jnp.asarray(rng.uniform(lo, hi, (N,3)).astype(np.float32))
d = rng.normal(size=(N,3)).astype(np.float32)
d_i = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))

@jax.jit
def chain(o, d, k=8):
    tmin = jnp.zeros((N,), jnp.float32)
    tmax = jnp.full((N,), 3e38, jnp.float32)
    acc = jnp.zeros((N,), jnp.float32)
    for i in range(k):
        h = intersect(scene, o, d + acc[:, None]*0e-9, tmin, tmax)
        acc = acc + h.t * 1e-30
    return acc

for name, o, d in (("coherent", o_c, d_c), ("incoherent", o_i, d_i)):
    f = lambda: chain(o, d)
    np.asarray(f()); np.asarray(f())
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); np.asarray(f()); ts.append(time.perf_counter()-t0)
    dt = float(np.median(ts)) / 8
    print(f"{name}: {dt*1e3:.2f} ms per {N} rays -> {N/dt/1e6:.1f}M rays/s")
