"""Isolate the inverse-bench gap: plain fused fit chain (4.7 ms/step,
_exp_bwd2.py) vs the bench's fit_chain_sharded (measures ~31 ms/step via
benchmarks/run.py).  Same scene/cfg/K; the only structural difference is
the shard_map wrapper (1-device mesh) + target flip + projection.

python benchmarks/experiments/_exp_bwd3.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax

K = 8


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.tree.map(np.asarray, out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    from tputracer.config import RenderConfig
    from tputracer.dist import fit_chain_sharded, make_mesh, render_sharded
    from tputracer.integrators.pt import render_pt
    from tputracer.scene import cornell_box

    size = 128
    mesh = make_mesh()
    scene = cornell_box("boxes")
    cfg = RenderConfig(width=size, height=size, spp=4, max_bounces=3,
                       rr_start=2, chunk_size=1 << 16)
    target, _ = render_sharded(scene, cfg, mesh)
    target = jnp.asarray(jax.block_until_ready(target))
    params0 = {"mat_albedo": scene.mat_albedo * 0.5,
               "mat_emission": scene.mat_emission * 2.0}
    opt = optax.adam(1e-2)
    sc = scene.replace(**params0)

    t = timeit(lambda: fit_chain_sharded(sc, params0, target, cfg, mesh,
                                         opt, opt.init(params0), K))
    print(f"fit_chain_sharded : {t/K*1e3:8.2f} ms/step", flush=True)

    from tputracer.fit import _project

    @jax.jit
    def plain_chain(scene, params, opt_state):
        def loss(p):
            img, _ = render_pt(scene.replace(**p), cfg)
            return jnp.mean((img - target) ** 2)
        losses = []
        for _ in range(K):
            v, g = jax.value_and_grad(loss)(params)
            upd, opt_state = opt.update(g, opt_state, params)
            params = _project(optax.apply_updates(params, upd))
            losses.append(v)
        return jnp.stack(losses), params, opt_state

    t = timeit(lambda: plain_chain(sc, params0, opt.init(params0)))
    print(f"plain fused chain : {t/K*1e3:8.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
