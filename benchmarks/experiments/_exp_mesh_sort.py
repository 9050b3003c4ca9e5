import time, numpy as np
from tputracer.api import render
from tputracer.config import RenderConfig
from tputracer.scene import mesh_scene

scene = mesh_scene(subdiv=6)
for sort in (False, True):
    cfg = RenderConfig(width=256, height=256, spp=4, max_bounces=8,
                       rr_start=3, chunk_size=1 << 16, sort_rays=sort)
    img, stats = render(scene, cfg)
    np.asarray(img); 
    img, stats = render(scene, cfg); np.asarray(img)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        img, stats = render(scene, cfg)
        np.asarray(img)
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    live = float(np.asarray(stats["rays_closest"]).sum() + np.asarray(stats["rays_shadow"]).sum())
    flat = 256*256*4*17
    print(f"sort={sort} dt={dt:.4f} flat_rays/s={flat/dt/1e6:.2f}M live_rays/s={live/dt/1e6:.2f}M live_frac={live/flat:.3f}")
    print("  alive per bounce:", np.asarray(stats["alive"]).astype(int))
    print("  shadow per bounce:", np.asarray(stats["rays_shadow"]).astype(int))
