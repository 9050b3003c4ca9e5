"""Backward-pass bisect for the inverse config (BASELINE config 5).

Times, on the real chip, each suspect in the 34 ms fit step:
  fwd          — render only
  fwd+loss     — render + MSE reduce
  vag:albedo   — value_and_grad wrt mat_albedo only
  vag:both     — albedo + emission (the bench's param set)
  vag:remat    — same with jax.checkpoint around each chunk

python benchmarks/experiments/_exp_bwd.py [quick]
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args):
    out = fn(*args)
    jax.tree.map(np.asarray, out)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    quick = len(sys.argv) > 1
    from tputracer.config import RenderConfig
    from tputracer.integrators.pt import render_pt, trace_chunked, \
        film_from_radiance
    from tputracer.scene import cornell_box

    size = 64 if quick else 128
    scene = cornell_box("boxes")
    cfg = RenderConfig(width=size, height=size, spp=4, max_bounces=3,
                       rr_start=2, chunk_size=1 << 16)
    target, _ = jax.jit(lambda s: render_pt(s, cfg))(scene)
    target = jnp.asarray(target)

    @jax.jit
    def fwd(scene):
        return render_pt(scene, cfg)[0]

    @jax.jit
    def fwd_loss(scene):
        img, _ = render_pt(scene, cfg)
        return jnp.mean((img - target) ** 2)

    def make_vag(keys, remat=False):
        @jax.jit
        def f(scene, params):
            def loss(p):
                sc = scene.replace(**p)
                if remat == "chunk":
                    n_total = cfg.width * cfg.height * cfg.spp
                    uids = jnp.arange(n_total, dtype=jnp.uint32)
                    body = jax.checkpoint(
                        lambda sc_, u: trace_chunked(sc_, u, cfg)[0])
                    L = body(sc, uids)
                    img = film_from_radiance(L, cfg)
                elif remat == "bounce":
                    # per-bounce jax.checkpoint (cfg.remat): backward
                    # stores only the carry at bounce boundaries
                    img, _ = render_pt(sc, cfg.with_(remat=True))
                else:
                    img, _ = render_pt(sc, cfg)
                return jnp.mean((img - target) ** 2)
            return jax.value_and_grad(loss)(params)
        params = {k: getattr(scene, k) * 0.5 for k in keys}
        return f, params

    t = timeit(fwd, scene)
    print(f"fwd            {t*1e3:8.2f} ms", flush=True)
    t = timeit(fwd_loss, scene)
    print(f"fwd+loss       {t*1e3:8.2f} ms", flush=True)
    for name, keys, remat in (
            ("vag:albedo", ("mat_albedo",), False),
            ("vag:both", ("mat_albedo", "mat_emission"), False),
            ("vag:remat", ("mat_albedo", "mat_emission"), "chunk"),
            ("vag:rematB", ("mat_albedo", "mat_emission"), "bounce")):
        f, params = make_vag(keys, remat)
        t = timeit(f, scene, params)
        print(f"{name:14s} {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
