import time, numpy as np
from tputracer.api import render
from tputracer.config import RenderConfig
from tputracer.scene import mesh_scene

scene = mesh_scene(subdiv=6)
for cs, bounces in ((1<<18, 8), (1<<16, 0)):
    cfg = RenderConfig(width=256, height=256, spp=4, max_bounces=bounces,
                       rr_start=3, chunk_size=cs)
    import jax
    img, stats = render(scene, cfg); jax.block_until_ready(img)
    img, stats = render(scene, cfg); jax.block_until_ready(img)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        img, stats = render(scene, cfg); jax.block_until_ready(img)
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    flat = 256*256*4*(2*bounces+1)
    print(f"chunk={cs} bounces={bounces}: dt={dt:.4f} flat_rays/s={flat/dt/1e6:.2f}M mean={float(np.asarray(img).mean()):.4f}")
