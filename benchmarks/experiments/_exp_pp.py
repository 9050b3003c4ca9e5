"""PP-row measurement (round-4 task 8): is there any bounce-stage
overlap for pipelining to exploit on this hardware?

The PP analogue (SURVEY.md §2) would issue bounce k's closest-hit
traversal before bounce k-1's NEE shading so the two "overlap".  On a
single TPU core that only helps if independent kernels actually execute
concurrently.  Measure: chain R rounds of two traversal-kernel calls
where round i's pair is (a) DEPENDENT (B consumes A's output) vs (b)
INDEPENDENT (B reads fresh inputs) — if (b) is not faster, the XLA/TPU
executor runs kernels serially and there is no overlap to win, closing
the row with data.

Run on TPU: python benchmarks/experiments/_exp_pp.py
"""

import sys
import os
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tputracer.accel.clustered import _sphere_best
from tputracer.accel.traverse_tpu import _traverse_pallas
from tputracer.integrators.pt import camera_rays
from tputracer.config import RenderConfig
from tputracer.scene import mesh_scene

_BIG = 3.0e38


def timed_fetch(f, *a):
    np.asarray(f(*a))
    np.asarray(f(*a))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(f(*a))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


scene = mesh_scene(subdiv=6)
sc = scene
cfg = RenderConfig(width=128, height=128, spp=4, max_bounces=8)
n = 65536
uid = jnp.arange(n, dtype=jnp.uint32)
o, d = camera_rays(scene, uid, cfg)
tmin = jnp.zeros((n,))
tmax = jnp.full((n,), _BIG)
args = (sc.clus_min.T, sc.clus_max.T, sc.tri_v0.T, sc.tri_e1.T,
        sc.tri_e2.T, sc.tri_mask[None, :])
R = 6


def trav(o, d, tmin, tmax):
    bt0 = jnp.full((n,), _BIG)
    bp0 = jnp.full((n,), -1, jnp.int32)
    return _traverse_pallas(o, d, tmin, tmax, jnp.minimum(bt0, tmax), bp0,
                            *args, leaf=sc.leaf_size)


@jax.jit
def dependent(o, d):
    acc = jnp.float32(0)
    oo = o
    for i in range(R):
        t1, p1 = trav(oo, d, tmin, tmax)
        # B consumes A's output (like bounce k after bounce k-1)
        o2 = oo + jnp.clip(t1, 0, 10.0)[:, None] * 1e-4 * d
        t2, p2 = trav(o2, d, tmin, tmax)
        acc += t1.mean() + t2.mean()
        oo = o + acc * 1e-9
    return acc


@jax.jit
def independent(o, d):
    acc = jnp.float32(0)
    for i in range(R):
        # A and B share no data dependence: free to overlap if the
        # executor can run kernels concurrently
        t1, p1 = trav(o + jnp.float32(i) * 1e-6, d, tmin, tmax)
        t2, p2 = trav(o - jnp.float32(i) * 1e-6, d, tmin, tmax)
        acc += t1.mean() + t2.mean()
    return acc


d_dep = timed_fetch(dependent, o, d)
d_ind = timed_fetch(independent, o, d)
print(f"dependent   pairs: {d_dep*1e3:.2f} ms ({d_dep/R/2*1e3:.2f} ms/call)")
print(f"independent pairs: {d_ind*1e3:.2f} ms ({d_ind/R/2*1e3:.2f} ms/call)")
print(f"overlap speedup from independence: {d_dep/d_ind:.3f}x "
      "(1.0 = kernels execute serially; pipelining has nothing to win)")
