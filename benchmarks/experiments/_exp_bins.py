"""Measure the ray->cluster binning hypothesis (round-4 task 1).

Round 3 established the union-walk kernel is at its VPU roofline with
~21 cluster trips per incoherent 64-ray subtile and a ~6/64-lane
utilization floor.  The proposed scheme change bins bounce rays by their
*first admitted cluster* (argmin of slab entry distance) so each tile's
union collapses.  Before building it, measure on real bounce rays from
the mesh config:

  1. per-ray count of clusters admitted before the final hit
     (= the pruned walk's visit bound);
  2. fraction of rays whose closest hit lies in their FIRST-entered
     cluster (-> a single "resolve visit" would finish them);
  3. fraction resolved by the te2 bound (hit.t <= entry of 2nd cluster
     -> provably closest after one visit, no further slab needed);
  4. per-64-ray-tile union sizes: unsorted vs sorted-by-first-cluster
     (-> trips for the union-walk kernel after binning).

Run: JAX_PLATFORMS=cpu python benchmarks/experiments/_exp_bins.py
"""

import numpy as np
import jax
import jax.numpy as jnp

from tputracer.accel.clustered import cluster_entries, intersect_clustered
from tputracer.config import RenderConfig
from tputracer.integrators import pt
from tputracer.scene import mesh_scene

_BIG = 3.0e38

scene = mesh_scene(subdiv=6)
cfg = RenderConfig(width=64, height=64, spp=1, max_bounces=8, rr_start=3,
                   chunk_size=1 << 12)
print(f"scene: {scene.n_tris} tris, {scene.n_clusters} clusters, "
      f"leaf {scene.leaf_size}")

snaps = []


def rec_isect(sc, o, d, tmin, tmax):
    snaps.append((np.asarray(o), np.asarray(d), np.asarray(tmin),
                  np.asarray(tmax)))
    return intersect_clustered(sc, o, d, tmin, tmax)


uid = jnp.arange(cfg.width * cfg.height * cfg.spp, dtype=jnp.uint32)
pt.trace_radiance(scene, uid, cfg, intersect_fn=rec_isect)
print(f"captured {len(snaps)} closest-hit snapshots")


def tile_unions(order, te, bt, live, tile=64):
    """Mean distinct clusters with te < final bt per 64-ray tile."""
    idx = order[live[order]]
    sizes = []
    for s in range(0, len(idx) - tile + 1, tile):
        rows = idx[s:s + tile]
        want = te[rows] < bt[rows][:, None]
        sizes.append(int(np.any(want, axis=0).sum()))
    return float(np.mean(sizes)) if sizes else 0.0


for b, (o, d, tmin, tmax) in enumerate(snaps):
    live = tmax > 0
    n_live = int(live.sum())
    if n_live < 64:
        print(f"bounce {b}: {n_live} live, skipped")
        continue
    te = np.asarray(cluster_entries(scene, jnp.asarray(o), jnp.asarray(d),
                                    jnp.asarray(tmin), jnp.asarray(tmax)))
    hit = intersect_clustered(scene, jnp.asarray(o), jnp.asarray(d),
                              jnp.asarray(tmin), jnp.asarray(tmax))
    bt = np.asarray(hit.t)
    prim = np.asarray(hit.prim)
    valid = np.asarray(hit.valid) & live
    hit_clus = prim // scene.leaf_size

    c0 = np.argmin(te, axis=1)                       # first admitted
    te_sorted = np.sort(te, axis=1)
    te1, te2 = te_sorted[:, 0], te_sorted[:, 1]
    admitted = (te < np.where(valid, bt, _BIG)[:, None]).sum(axis=1)

    lv = live & (te1 < _BIG)
    in_c0 = valid & (hit_clus == c0)
    by_te2 = valid & (bt <= te2)
    n = max(int(lv.sum()), 1)

    u_unsorted = tile_unions(np.arange(len(o)), te, np.where(valid, bt, _BIG),
                             lv)
    u_sorted = tile_unions(np.argsort(c0, kind="stable"), te,
                           np.where(valid, bt, _BIG), lv)

    print(f"bounce {b}: live={n_live} "
          f"admitted<bt mean={admitted[lv].mean():.2f} "
          f"p90={np.percentile(admitted[lv], 90):.0f} | "
          f"hit-in-c0={int(in_c0.sum())/n:.1%} "
          f"resolved-by-te2={int(by_te2.sum())/n:.1%} | "
          f"tile-union unsorted={u_unsorted:.1f} sorted-c0={u_sorted:.1f}")
