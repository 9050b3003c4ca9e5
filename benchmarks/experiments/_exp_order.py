"""Offline study: which ray ordering minimizes per-tile cluster unions?

Tile-union size == union-walk kernel trips == the dominant per-subtile
cost on incoherent bounces.  Candidates: identity (pixel-major),
first-cluster c0, (c0, c1), (octant, c0), (c0, octant), hit-cluster of
previous bounce (free key!), morton of origin + octant.

Run: JAX_PLATFORMS=cpu python benchmarks/experiments/_exp_order.py
"""

import numpy as np
import jax.numpy as jnp

from tputracer.accel.clustered import cluster_entries, intersect_clustered
from tputracer.config import RenderConfig
from tputracer.integrators import pt
from tputracer.scene import mesh_scene

_BIG = 3.0e38

scene = mesh_scene(subdiv=6)
cfg = RenderConfig(width=64, height=64, spp=1, max_bounces=8, rr_start=3,
                   chunk_size=1 << 12)
snaps = []


def rec_isect(sc, o, d, tmin, tmax):
    snaps.append((np.asarray(o), np.asarray(d), np.asarray(tmin),
                  np.asarray(tmax)))
    return intersect_clustered(sc, o, d, tmin, tmax)


uid = jnp.arange(cfg.width * cfg.height * cfg.spp, dtype=jnp.uint32)
pt.trace_radiance(scene, uid, cfg, intersect_fn=rec_isect)


def unions(order, te, bt, live, tile):
    idx = order[live[order]]
    sizes = []
    for s in range(0, len(idx) - tile + 1, tile):
        rows = idx[s:s + tile]
        want = te[rows] < bt[rows][:, None]
        sizes.append(int(np.any(want, axis=0).sum()))
    return float(np.mean(sizes)) if sizes else 0.0


for b in (1, 2, 3):
    o, d, tmin, tmax = snaps[b]
    live = tmax > 0
    if live.sum() < 128:
        continue
    te = np.asarray(cluster_entries(scene, jnp.asarray(o), jnp.asarray(d),
                                    jnp.asarray(tmin), jnp.asarray(tmax)))
    hit = intersect_clustered(scene, jnp.asarray(o), jnp.asarray(d),
                              jnp.asarray(tmin), jnp.asarray(tmax))
    bt = np.where(np.asarray(hit.valid), np.asarray(hit.t), _BIG)

    tes = np.sort(te, axis=1)
    order_te = np.argsort(te, axis=1)
    c0 = order_te[:, 0]
    c1 = np.where(tes[:, 1] < _BIG, order_te[:, 1], c0)
    octant = ((d[:, 0] >= 0) + 2 * (d[:, 1] >= 0)
              + 4 * (d[:, 2] >= 0)).astype(np.int64)
    # previous-bounce hit cluster = cluster containing the ray origin
    # (free at trace time: prim // leaf of the spawning hit)
    oc = np.full(len(o), -1, np.int64)
    if b > 0:
        ph = intersect_clustered(scene, *map(jnp.asarray, snaps[b - 1]))
        pprim = np.asarray(ph.prim)
        oc = np.where(np.asarray(ph.valid), pprim // scene.leaf_size, 0)

    keys = {
        "identity": np.arange(len(o)),
        "c0": c0,
        "(c0,c1)": c0 * 1024 + c1,
        "(c0,oct)": c0 * 8 + octant,
        "(oct,c0)": octant * 1024 + c0,
        "(origin_cl)": oc,
        "(origin_cl,oct)": oc * 8 + octant,
        "(origin_cl,c0)": oc * 1024 + c0,
    }
    line = [f"b{b} live={int(live.sum())}"]
    for T in (64, 32):
        for nm, k in keys.items():
            order = (np.arange(len(o)) if nm == "identity"
                     else np.argsort(k, kind="stable"))
            line.append(f"{nm}@T{T}={unions(order, te, bt, live, T):.1f}")
    print(" ".join(line))
