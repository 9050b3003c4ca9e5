"""Per-trip cost decomposition, done right: K data-dependent kernel
calls chained inside ONE jit (the ~25 ms axon dispatch latency made the
single-call probes in _exp_pertrip.py meaningless in absolute terms —
verify-skill protocol).

Reports per-CALL cost (slope over K) for: slab-only, k_trips=4/8/16
with and without the MT block — from which per-trip and slab costs fall
out.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.experiments._exp_pertrip import probe  # the probe kernel


def main():
    from tputracer.scene import mesh_scene
    from tputracer.integrators.pt import camera_rays
    from tputracer.config import RenderConfig

    scene = mesh_scene(subdiv=6)
    cfg = RenderConfig(width=256, height=256, spp=4, max_bounces=8)
    n = 65536
    uid = jnp.arange(n, dtype=jnp.uint32)
    o, d = camera_rays(scene, uid, cfg)
    tmin = jnp.zeros((n,))
    tmax0 = jnp.full((n,), 3.0e38)
    tbls = (scene.clus_min.T, scene.clus_max.T, scene.tri_v0.T,
            scene.tri_e1.T, scene.tri_e2.T, scene.tri_mask[None, :])

    def chain(K, k_trips, do_mt):
        @jax.jit
        def f(o, d, tmin, tmax):
            acc = jnp.zeros((n, 1), jnp.float32)
            tm = tmax
            for _ in range(K):
                bt, bp = probe(o, d, tmin, tm, *tbls,
                               leaf=scene.leaf_size, k_trips=k_trips,
                               do_mt=do_mt)
                # data dependence without changing the work: dead-cheap
                # elementwise combine feeding the next call's tmax
                acc = acc + bt
                tm = tmax + 0.0 * bt[:, 0]
            return acc
        return f

    def timeit(f, reps=5):
        out = f(o, d, tmin, tmax0)
        np.asarray(out)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = f(o, d, tmin, tmax0)
            out.block_until_ready()
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    def per_call(k_trips, do_mt):
        t2 = timeit(chain(2, k_trips, do_mt))
        t10 = timeit(chain(10, k_trips, do_mt))
        return (t10 - t2) / 8.0

    c_slab = per_call(0, False)
    print(f"slab-only per call: {c_slab*1e3:7.3f} ms "
          f"({c_slab/1024*1e6:6.2f} us/subtile)", flush=True)
    for K in (8, 16):
        cb = per_call(K, False)
        cf = per_call(K, True)
        n_trip = 1024 * K
        print(f"k={K}: book {cb*1e3:7.3f} ms  full {cf*1e3:7.3f} ms  "
              f"per-trip book {(cb-c_slab)/n_trip*1e9:5.0f} ns  "
              f"full {(cf-c_slab)/n_trip*1e9:5.0f} ns", flush=True)


if __name__ == "__main__":
    main()
