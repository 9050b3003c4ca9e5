"""Round-5: hop-count scaling of the scene-tiling ring (CPU mesh).

The mesh_tiled bench on the 1-chip axon environment degenerates to one
hop, so the SCALING term of ring traversal had never been measured.
This script renders the same clustered scene tiled over 1/2/4/8-shard
CPU meshes and reports, per shard count:

  * wall time per render (8 virtual CPU devices — glue scaling, not
    TPU throughput; the per-hop traversal work halves as shards double
    while ppermute volume grows linearly with hop count);
  * exact ppermute bytes/device per render (the new
    ring_ppermute_bytes_per_device stat);
  * per-shard geometry bytes (the capacity win being paid for).

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python benchmarks/experiments/_exp_ring_scale.py
Findings are recorded in this directory's README.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from tputracer.config import RenderConfig  # noqa: E402
from tputracer.dist import make_mesh, render_tiled  # noqa: E402
from tputracer.dist.scene_shard import pad_scene_clusters  # noqa: E402
from tputracer.scene.mesh import mesh_scene  # noqa: E402


def main():
    scene = mesh_scene(subdiv=6, leaf_size=128, accel="cluster")
    cfg = RenderConfig(width=32, height=32, spp=4, max_bounces=4,
                       rr_start=3, chunk_size=32 * 32 * 4)
    print(f"scene: {scene.n_tris} tris, {scene.n_clusters} clusters")
    ref = None
    for p in (1, 2, 4, 8):
        mesh = make_mesh((p,), ("dp",))
        padded = pad_scene_clusters(scene, p)
        geo = sum(int(np.prod(getattr(padded, f).shape))
                  * getattr(padded, f).dtype.itemsize
                  for f in ("tri_v0", "tri_e1", "tri_e2", "tri_n",
                            "tri_mat", "tri_mask", "plu",
                            "clus_min", "clus_max"))
        img, stats = render_tiled(scene, cfg, mesh)   # compile + warm
        jax.block_until_ready(img)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            img, stats = render_tiled(scene, cfg, mesh)
            jax.block_until_ready(img)
            ts.append(time.perf_counter() - t0)
        m = float(np.asarray(img).mean())
        if ref is None:
            ref = m
        by = float(stats["ring_ppermute_bytes_per_device"])
        print(f"shards={p}: render {np.median(ts):.3f} s  "
              f"ppermute {by/1e6:.2f} MB/device  "
              f"geo/shard {geo/p/1e6:.1f} MB  mean {m:.6f} "
              f"(match {abs(m-ref) < 1e-6})")


if __name__ == "__main__":
    main()
