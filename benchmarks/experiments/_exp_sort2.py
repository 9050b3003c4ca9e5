"""Re-measure sort_rays on the mesh config after SUB-batching + dead-subtile
skip (round-2's 'a wash' datum predates both).  One variant per process:
    python benchmarks/experiments/_exp_sort2.py [sorted]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def main():
    do_sort = len(sys.argv) > 1 and sys.argv[1] == "sorted"
    from tputracer.api import render
    from tputracer.config import RenderConfig
    from tputracer.scene import mesh_scene

    scene = mesh_scene(subdiv=6)
    cfg = RenderConfig(width=256, height=256, spp=4, max_bounces=8,
                       rr_start=3, chunk_size=1 << 16, sort_rays=do_sort)
    img, _ = render(scene, cfg)
    np.asarray(img)
    img, _ = render(scene, cfg)
    np.asarray(img)
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        img, _ = render(scene, cfg)
        img.block_until_ready()
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    rays = 256 * 256 * 4 * 17
    print(f"sort={do_sort} dt={dt:.4f} rays/s={rays/dt/1e6:.2f}M mean={float(np.asarray(img).mean()):.5f}")


if __name__ == "__main__":
    main()
