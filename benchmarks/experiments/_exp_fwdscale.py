"""Forward-render scaling probe: the _exp_bwd bisect shows the inverse
fit step is FORWARD-bound (fwd 24.2 ms vs value_and_grad 25.6 ms at
128^2x4spp), and per-path cost is ~7x worse than pt_cornell's 1M-path
chunks.  This times the same cornell forward at several path counts to
split fixed per-program overhead from per-path compute.

python benchmarks/experiments/_exp_fwdscale.py
"""
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
    from tputracer.config import RenderConfig
    from tputracer.integrators.pt import render_pt
    from tputracer.scene import cornell_box

    scene = cornell_box("boxes")
    for size, spp in ((64, 4), (128, 4), (128, 16), (256, 4), (256, 16)):
        cfg = RenderConfig(width=size, height=size, spp=spp, max_bounces=3,
                           rr_start=2, chunk_size=1 << 20)
        f = jax.jit(lambda s, c=cfg: render_pt(s, c)[0])
        t = timeit(f, scene)
        n = size * size * spp
        print(f"{size}^2 x{spp:3d}spp n={n:8d}: {t*1e3:8.2f} ms "
              f"({t/n*1e9:6.1f} ns/path)", flush=True)


if __name__ == "__main__":
    main()
