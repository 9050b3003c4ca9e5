"""Headline benchmark: Cornell box 512x512, 16 spp, 4 bounces (BASELINE
config "pt_cornell").  Prints ONE JSON line:

  {"metric": "rays_per_s", "value": N, "unit": "rays/s", "vs_baseline": R}

vs_baseline is measured rays/s divided by the BASELINE north-star target
of 100M rays/s/chip (the reference publishes no numbers — BASELINE.md).
Rays counted = closest-hit rays + NEE shadow rays actually issued per
path: (max_bounces+1) + max_bounces per path, every lane traced (masked
lanes still do the work on TPU).
"""

from __future__ import annotations

import json
import time


def main():
    from tputracer.api import render
    from tputracer.config import RenderConfig
    from tputracer.scene import cornell_box

    scene = cornell_box("boxes")
    cfg = RenderConfig(width=512, height=512, spp=16, max_bounces=4)

    import numpy as np

    img, _ = render(scene, cfg)
    np.asarray(img)  # compile + warm-up (full host fetch)

    # The first post-warmup block_until_ready on the axon backend can
    # return before the dispatch completes; run one discarded rep with a
    # host fetch, then take the median of blocking reps.
    img, _ = render(scene, cfg)
    np.asarray(img)

    times = []
    stats = None
    for _ in range(5):
        t0 = time.perf_counter()
        img, stats = render(scene, cfg)
        img.block_until_ready()
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))

    n_paths = cfg.width * cfg.height * cfg.spp
    # flat upper bound: every lane does full work on TPU whether alive or
    # not, so (bounces+1) closest + bounces shadow segments per path is
    # the work actually dispatched.  The HONEST live-lane counts (exact
    # per-bounce issued closest-hit + shadow rays from the integrator's
    # stats) are reported alongside.
    rays = n_paths * (cfg.max_bounces + 1 + cfg.max_bounces)
    rays_issued = float(np.asarray(stats["rays_closest"]).sum()
                        + np.asarray(stats["rays_shadow"]).sum())
    rays_per_s = rays / dt
    print(json.dumps({
        "metric": "rays_per_s",
        "value": round(rays_per_s),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / 100e6, 4),
        "rays_issued": round(rays_issued),
        "issued_rays_per_s": round(rays_issued / dt),
        "render_s": round(dt, 4),
    }))


if __name__ == "__main__":
    main()
