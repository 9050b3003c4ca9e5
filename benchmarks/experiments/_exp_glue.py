"""Bisect the per-call XLA glue cost around the traversal kernel."""
import functools, time
import numpy as np, jax, jax.numpy as jnp
from tputracer.scene import mesh_scene
from tputracer.accel.traverse_tpu import _traverse_pallas
from tputracer.accel.bruteforce import finalize_hit
from tputracer.accel.clustered import _sphere_best
from tputracer.config import RenderConfig

scene = mesh_scene(subdiv=6)
N = 1 << 16
rng = np.random.default_rng(0)
o = jnp.asarray(rng.uniform(np.array([-2,0,-2]), np.array([2,3,2]), (N,3)).astype(np.float32))
dd = rng.normal(size=(N,3)).astype(np.float32)
d = jnp.asarray(dd/np.linalg.norm(dd,axis=1,keepdims=True))
K = 32
sc = scene
# pre-transposed scene args (hoisted out of the chain)
pre = (sc.clus_min.T, sc.clus_max.T, sc.tri_v0.T, sc.tri_e1.T, sc.tri_e2.T, sc.tri_mask[None, :])
pre = jax.tree.map(jnp.asarray, pre)

@jax.jit
def chain_kernel(o, d):
    tmin = jnp.zeros((N,), jnp.float32)
    tmax0 = jnp.full((N,), 3e38, jnp.float32)
    bp0 = jnp.full((N,), -1, jnp.int32)
    s = jnp.float32(0); tmax = tmax0
    for _ in range(K):
        t, prim = _traverse_pallas(o, d, tmin, tmax, tmax, bp0, *pre, leaf=sc.leaf_size)
        tmax = tmax0 * (1.0 - jnp.sum(t) * 1e-40)
        s = s + jnp.sum(jnp.where(t < 1e38, t, 0.0))
    return s

@jax.jit
def chain_kernel_transposes(o, d):
    tmin = jnp.zeros((N,), jnp.float32)
    tmax0 = jnp.full((N,), 3e38, jnp.float32)
    bp0 = jnp.full((N,), -1, jnp.int32)
    s = jnp.float32(0); tmax = tmax0
    for _ in range(K):
        args = (sc.clus_min.T, sc.clus_max.T, sc.tri_v0.T, sc.tri_e1.T,
                sc.tri_e2.T, sc.tri_mask[None, :])
        t, prim = _traverse_pallas(o, d, tmin, tmax, tmax, bp0, *args, leaf=sc.leaf_size)
        tmax = tmax0 * (1.0 - jnp.sum(t) * 1e-40)
        s = s + jnp.sum(jnp.where(t < 1e38, t, 0.0))
    return s

@jax.jit
def chain_full(o, d):
    tmin = jnp.zeros((N,), jnp.float32)
    tmax0 = jnp.full((N,), 3e38, jnp.float32)
    bp0 = jnp.full((N,), -1, jnp.int32)
    s = jnp.float32(0); tmax = tmax0
    for _ in range(K):
        t, prim = _traverse_pallas(o, d, tmin, tmax, tmax, bp0, *pre, leaf=sc.leaf_size)
        h = finalize_hit(scene, o, d, t, prim, t < tmax)
        tmax = tmax0 * (1.0 - jnp.sum(h.t) * 1e-40)
        s = s + jnp.sum(jnp.where(h.valid, h.t, 0.0))
    return s

for tag, f0 in (("kernel only (pre-T)", chain_kernel),
                ("kernel + transposes", chain_kernel_transposes),
                ("kernel + finalize  ", chain_full)):
    f = lambda: f0(o, d)
    float(f()); float(f())
    ts=[]
    for _ in range(3):
        t0=time.perf_counter(); float(f()); ts.append(time.perf_counter()-t0)
    dt=float(np.median(ts))/K
    print(f"{tag}: {dt*1e3:.3f} ms/call -> {N/dt/1e6:.1f}M rays/s")
