"""Benchmark suite over the five BASELINE measurement configs (BASELINE.md).

Each benchmark jits, warms up, then reports the median of N timed reps
(first post-warmup rep discarded — the axon backend's first
block_until_ready can return early; see bench.py).  Output: one JSON line
per config, written to stdout and benchmarks/results.jsonl.

    python -m benchmarks.run [--quick] [--only pt_cornell,mesh]

rays/s counts closest-hit + shadow rays actually issued per path (masked
lanes do full work on TPU, so they count).  BDPT counts subpath segments
+ one shadow ray per connection strategy.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def _timed(fn, reps=5):
    # bench.py protocol: two warmup reps with a FULL host fetch (the axon
    # backend's block_until_ready can return before the dispatch completes
    # unless a real transfer has drained the stream), then the median of
    # blocking reps.
    _fetch(fn())
    _fetch(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jaxify(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def _fetch(x):
    import jax

    for leaf in jax.tree.leaves(x):
        np.asarray(leaf)


def jaxify(x):
    import jax

    jax.block_until_ready(x)


def bench_pt_cornell(quick):
    """Config 1: Cornell box, unidirectional PT, 4 bounces, 16 spp, 512^2."""
    from tputracer.api import render
    from tputracer.config import RenderConfig
    from tputracer.scene import cornell_box

    size = 256 if quick else 512
    scene = cornell_box("boxes")
    cfg = RenderConfig(width=size, height=size, spp=16, max_bounces=4)
    dt = _timed(lambda: render(scene, cfg)[0])
    paths = size * size * cfg.spp
    rays = paths * (cfg.max_bounces + 1 + cfg.max_bounces)
    return {"rays_per_s": round(rays / dt), "render_s": round(dt, 4),
            "paths": paths}


def bench_cornell_glass(quick):
    """Config 2: Cornell + glass/mirror spheres, RR, 64 spp."""
    from tputracer.api import render
    from tputracer.config import RenderConfig
    from tputracer.scene import cornell_box

    size = 128 if quick else 256
    scene = cornell_box("spheres")
    cfg = RenderConfig(width=size, height=size, spp=64, max_bounces=6,
                       rr_start=3)
    dt = _timed(lambda: render(scene, cfg)[0])
    paths = size * size * cfg.spp
    rays = paths * (cfg.max_bounces + 1 + cfg.max_bounces)
    return {"rays_per_s": round(rays / dt), "render_s": round(dt, 4)}


def bench_mesh(quick):
    """Config 3: ~100k-tri mesh, PT 8 bounces, cluster-BVH traversal."""
    from tputracer.api import render
    from tputracer.config import RenderConfig
    from tputracer.scene import mesh_scene

    scene = mesh_scene(subdiv=4 if quick else 6)
    size = 64 if quick else 256
    cfg = RenderConfig(width=size, height=size, spp=4, max_bounces=8,
                       rr_start=3, chunk_size=1 << 16)
    dt = _timed(lambda: render(scene, cfg)[0], reps=3)
    paths = size * size * cfg.spp
    rays = paths * (cfg.max_bounces + 1 + cfg.max_bounces)
    return {"rays_per_s": round(rays / dt), "render_s": round(dt, 4),
            "n_tris": scene.n_tris, "n_clusters": scene.n_clusters}


def bench_bdpt_caustic(quick):
    """Config 4: BDPT with vertex connection + MIS on the caustics scene."""
    from tputracer.api import render_bdpt
    from tputracer.config import BdptConfig
    from tputracer.scene import cornell_box

    size = 64 if quick else 128
    scene = cornell_box("caustic")
    cfg = BdptConfig(width=size, height=size, spp=8, max_bounces=4,
                     chunk_size=1 << 15)
    dt = _timed(lambda: render_bdpt(scene, cfg)[0], reps=3)
    paths = size * size * cfg.spp
    B = cfg.max_bounces
    E = B + 1
    # 2 subpath walks of E segments + ~(strategies) shadow rays per path
    n_strat = sum(1 for t in range(1, E + 2) for s in range(0, E + 1)
                  if 2 <= s + t <= B + 2 and not (s == 0 and t < 2))
    rays = paths * (2 * E + n_strat)
    return {"rays_per_s": round(rays / dt), "render_s": round(dt, 4),
            "strategies": n_strat}


def bench_inverse(quick):
    """Config 5: inverse-rendering step (render + grad + psum + update)."""
    import jax
    import optax

    from tputracer.config import RenderConfig
    from tputracer.dist import fit_step_sharded, make_mesh, render_sharded
    from tputracer.scene import cornell_box

    size = 64 if quick else 128
    mesh = make_mesh()
    scene = cornell_box("boxes")
    cfg = RenderConfig(width=size, height=size, spp=4, max_bounces=3,
                       rr_start=2, chunk_size=1 << 16)
    target, _ = render_sharded(scene, cfg, mesh)
    target = jax.block_until_ready(target)
    params = {"mat_albedo": scene.mat_albedo * 0.5,
              "mat_emission": scene.mat_emission * 2.0}
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)
    sc = scene.replace(**params)

    def step():
        loss, grads = fit_step_sharded(sc, params, target, cfg, mesh)
        updates, _ = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), loss

    dt = _timed(step, reps=3)
    paths = size * size * cfg.spp
    rays = paths * (cfg.max_bounces + 1 + cfg.max_bounces)
    return {"steps_per_s": round(1.0 / dt, 3),
            "fwd_bwd_rays_per_s": round(rays / dt),
            "n_devices": len(jax.devices())}


BENCHES = {
    "pt_cornell": bench_pt_cornell,
    "cornell_glass": bench_cornell_glass,
    "mesh": bench_mesh,
    "bdpt_caustic": bench_bdpt_caustic,
    "inverse": bench_inverse,
}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--only", default=None,
                    help="comma-separated subset of: " + ",".join(BENCHES))
    args = ap.parse_args(argv)
    names = args.only.split(",") if args.only else list(BENCHES)

    if len(names) > 1:
        # one subprocess per bench: the axon backend reliably errors
        # (INVALID_ARGUMENT) on the second large program compiled in one
        # process, so isolate each config
        import subprocess
        import sys

        for name in names:
            cmd = [sys.executable, "-m", "benchmarks.run", "--only", name]
            if args.quick:
                cmd.append("--quick")
            subprocess.run(cmd, check=False)
        return

    import jax

    name = names[0]
    out_path = os.path.join(os.path.dirname(__file__), "results.jsonl")
    rec = {"bench": name, "quick": args.quick,
           "backend": jax.default_backend(),
           "device": str(jax.devices()[0])}
    rec.update(BENCHES[name](args.quick))
    line = json.dumps(rec)
    print(line, flush=True)
    with open(out_path, "a") as fh:
        fh.write(line + "\n")


if __name__ == "__main__":
    main()
