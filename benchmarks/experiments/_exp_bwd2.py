"""Honest backward-pass split via CHAINED in-jit iterations.

_exp_bwd.py times single dispatches, which the axon tunnel pollutes with
~25 ms of round-trip latency — fwd and value_and_grad both measured
~25 ms there, which is the latency floor, not device time.  Here each
probe chains K data-dependent iterations inside ONE jit and divides, the
same protocol as _exp_pertrip2 / fit_chain_sharded:

  fwd-chain   — K renders, each seeded with 0*prev (data dependence)
  vag-chain   — K value_and_grad steps (no optimizer)
  fit-chain   — K full fit steps (render+bwd+adam), the bench's program

python benchmarks/experiments/_exp_bwd2.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax


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


K = 8


def main():
    from tputracer.config import RenderConfig
    from tputracer.integrators.pt import render_pt
    from tputracer.scene import cornell_box

    size = 128
    scene = cornell_box("boxes")
    cfg = RenderConfig(width=size, height=size, spp=4, max_bounces=3,
                       rr_start=2, chunk_size=1 << 16)
    cfg_r = cfg.with_(remat=True)
    target, _ = jax.jit(lambda s: render_pt(s, cfg))(scene)
    target = jnp.asarray(target)
    params0 = {"mat_albedo": scene.mat_albedo * 0.5,
               "mat_emission": scene.mat_emission * 2.0}
    opt = optax.adam(1e-2)

    def fwd_chain(scene, c):
        acc = jnp.float32(0.0)
        for _ in range(K):
            sc = scene.replace(mat_albedo=scene.mat_albedo + 0.0 * acc)
            img, _ = render_pt(sc, c)
            acc = jnp.mean(img)
        return acc

    def vag_chain(scene, params, c):
        def loss(p):
            img, _ = render_pt(scene.replace(**p), c)
            return jnp.mean((img - target) ** 2)
        tot = jnp.float32(0.0)
        for _ in range(K):
            v, g = jax.value_and_grad(loss)(params)
            params = jax.tree.map(lambda x, gg: x + 0.0 * gg, params, g)
            tot = tot + v
        return tot, params

    def fit_chain(scene, params, opt_state, c):
        def loss(p):
            img, _ = render_pt(scene.replace(**p), c)
            return jnp.mean((img - target) ** 2)
        tot = jnp.float32(0.0)
        for _ in range(K):
            v, g = jax.value_and_grad(loss)(params)
            upd, opt_state = opt.update(g, opt_state, params)
            params = optax.apply_updates(params, upd)
            tot = tot + v
        return tot, params

    for name, f, args in (
            ("fwd-chain       ", jax.jit(fwd_chain, static_argnums=1),
             (scene, cfg)),
            ("vag-chain       ", jax.jit(vag_chain, static_argnums=2),
             (scene, params0, cfg)),
            ("vag-chain remat ", jax.jit(vag_chain, static_argnums=2),
             (scene, params0, cfg_r)),
            ("fit-chain       ", jax.jit(fit_chain, static_argnums=3),
             (scene, params0, opt.init(params0), cfg)),
            ("fit-chain remat ", jax.jit(fit_chain, static_argnums=3),
             (scene, params0, opt.init(params0), cfg_r))):
        t = timeit(f, *args)
        print(f"{name}: {t/K*1e3:8.2f} ms/iter ({K} chained)", flush=True)


if __name__ == "__main__":
    main()
