"""Acceleration-structure oracle tests (SURVEY.md §4 item 1): the cluster
BVH traversal must agree EXACTLY with brute-force all-primitives argmin on
the same scene arrays — same t, same prim id, same occlusion verdict.
"""

import numpy as np
import jax.numpy as jnp

from tputracer.accel import (
    intersect_brute,
    intersect_clustered,
    occluded_brute,
    occluded_clustered,
)
from tputracer.scene.mesh import load_obj, mesh_scene, obj_scene
from tputracer.scene.types import DIFFUSE, make_camera, make_scene


def _random_scene(n_tris=257, n_spheres=2, seed=0, leaf_size=16):
    r = np.random.default_rng(seed)
    base = r.uniform(-1, 1, (n_tris, 1, 3))
    tv = (base + r.uniform(-0.25, 0.25, (n_tris, 3, 3))).astype(np.float32)
    mats = r.integers(0, 2, n_tris).astype(np.int32)
    materials = [
        {"kind": DIFFUSE, "albedo": (0.5, 0.5, 0.5)},
        {"kind": DIFFUSE, "albedo": (0, 0, 0), "emission": (5, 5, 5)},
    ]
    spheres = [((0.2, 0.1, 0.0), 0.3, 0), ((-0.4, -0.2, 0.3), 0.2, 1)]
    cam = make_camera((0, 0, -3), (0, 0, 0), (0, 1, 0), 40.0, 1.0)
    return make_scene(tv, mats, materials, spheres=spheres[:n_spheres],
                      camera=cam, accel="cluster", leaf_size=leaf_size)


def _random_rays(n, seed=1):
    r = np.random.default_rng(seed)
    o = r.uniform(-2, 2, (n, 3)).astype(np.float32)
    d = r.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_clustered_matches_brute_closest_hit():
    scene = _random_scene()
    o, d = _random_rays(512)
    tmin = jnp.zeros((512,))
    tmax = jnp.full((512,), 3.0e38)
    hb = intersect_brute(scene, o, d, tmin, tmax)
    hc = intersect_clustered(scene, o, d, tmin, tmax)
    np.testing.assert_array_equal(np.asarray(hb.valid), np.asarray(hc.valid))
    v = np.asarray(hb.valid)
    np.testing.assert_array_equal(np.asarray(hb.prim)[v], np.asarray(hc.prim)[v])
    np.testing.assert_allclose(np.asarray(hb.t)[v], np.asarray(hc.t)[v],
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(hb.mat)[v], np.asarray(hc.mat)[v])


def test_clustered_matches_brute_any_hit():
    scene = _random_scene(seed=3)
    o, d = _random_rays(512, seed=4)
    tmax = jnp.full((512,), 1.5)
    ob = np.asarray(occluded_brute(scene, o, d, tmax))
    oc = np.asarray(occluded_clustered(scene, o, d, tmax))
    np.testing.assert_array_equal(ob, oc)


def test_clustered_respects_tmin_tmax_window():
    scene = _random_scene(seed=7)
    o, d = _random_rays(256, seed=8)
    tmin = jnp.full((256,), 0.8)
    tmax = jnp.full((256,), 2.0)
    hb = intersect_brute(scene, o, d, tmin, tmax)
    hc = intersect_clustered(scene, o, d, tmin, tmax)
    np.testing.assert_array_equal(np.asarray(hb.valid), np.asarray(hc.valid))
    v = np.asarray(hb.valid)
    np.testing.assert_array_equal(np.asarray(hb.prim)[v], np.asarray(hc.prim)[v])


def test_mesh_scene_renders():
    """Small-subdiv mesh scene (config 3 shape) end-to-end through PT."""
    from tputracer.api import render
    from tputracer.config import RenderConfig

    scene = mesh_scene(subdiv=3, leaf_size=32, accel="cluster")
    assert scene.n_clusters > 8
    cfg = RenderConfig(width=12, height=12, spp=2, max_bounces=2,
                       rr_start=1, chunk_size=12 * 12 * 2)
    img, _ = render(scene, cfg)
    img = np.asarray(img)
    assert np.isfinite(img).all()
    assert img.mean() > 1e-3, img.mean()


def test_pallas_kernel_matches_brute_interpret():
    """The Pallas tile-coherent traversal kernel, run in interpreter mode
    (the kernel 'sanitizer' of SURVEY.md §5), against brute force."""
    from tputracer.accel.traverse_tpu import intersect_pallas, occluded_pallas

    scene = _random_scene(n_tris=300, leaf_size=16, seed=11)
    o, d = _random_rays(600, seed=12)
    tmin = jnp.zeros((600,))
    tmax = jnp.full((600,), 3.0e38)
    hb = intersect_brute(scene, o, d, tmin, tmax)
    hp = intersect_pallas(scene, o, d, tmin, tmax, interpret=True)
    v = np.asarray(hb.valid)
    np.testing.assert_array_equal(np.asarray(hp.valid), v)
    np.testing.assert_array_equal(np.asarray(hp.prim)[v], np.asarray(hb.prim)[v])
    # t via Moeller-Trumbore vs the plane equation: float32 formula skew
    np.testing.assert_allclose(np.asarray(hp.t)[v], np.asarray(hb.t)[v],
                               rtol=2e-4)
    ob = np.asarray(occluded_brute(scene, o, d, jnp.full((600,), 1.5)))
    op = np.asarray(occluded_pallas(scene, o, d, jnp.full((600,), 1.5),
                                    interpret=True))
    np.testing.assert_array_equal(ob, op)


def test_pallas_kernel_mixed_liveness_interpret():
    """Round-2 advisor: exercise the kernel's wavefront-facing paths off-
    TPU — per-lane tmax=0 dead lanes, varied finite tmax, all-dead
    subtiles (any_live skip), and a ray count that is not a multiple of
    TILE*SUB (pad path).  Dead lanes must come back invalid/unoccluded;
    live lanes must match brute force exactly."""
    from tputracer.accel.traverse_tpu import (SUB, TILE, intersect_pallas,
                                              occluded_pallas)

    n = TILE * SUB + 3 * TILE + 7     # spans 2 grid steps, ragged tail
    scene = _random_scene(n_tris=300, leaf_size=16, seed=21)
    o, d = _random_rays(n, seed=22)
    r = np.random.default_rng(23)
    tmax_np = r.uniform(0.5, 4.0, n).astype(np.float32)
    # kill whole subtiles (any_live skip) and scattered single lanes
    tmax_np[TILE:3 * TILE] = 0.0
    tmax_np[r.integers(0, n, n // 4)] = 0.0
    tmin = jnp.zeros((n,))
    tmax = jnp.asarray(tmax_np)
    hb = intersect_brute(scene, o, d, tmin, tmax)
    hp = intersect_pallas(scene, o, d, tmin, tmax, interpret=True)
    dead = tmax_np == 0.0
    assert not np.asarray(hp.valid)[dead].any()
    np.testing.assert_array_equal(np.asarray(hp.valid), np.asarray(hb.valid))
    v = np.asarray(hb.valid)
    np.testing.assert_array_equal(np.asarray(hp.prim)[v],
                                  np.asarray(hb.prim)[v])
    np.testing.assert_allclose(np.asarray(hp.t)[v], np.asarray(hb.t)[v],
                               rtol=2e-4)
    ob = np.asarray(occluded_brute(scene, o, d, tmax))
    op = np.asarray(occluded_pallas(scene, o, d, tmax, interpret=True))
    assert not op[dead].any()
    np.testing.assert_array_equal(ob, op)


def test_mesh_scene_grad():
    """Gradients flow through renders of clustered scenes (the traversal
    while_loop is stop_gradient-detached — SURVEY.md §3.6)."""
    from tputracer.api import grad_render, render
    from tputracer.config import RenderConfig

    scene = mesh_scene(subdiv=2, leaf_size=32, accel="cluster")
    cfg = RenderConfig(width=8, height=8, spp=2, max_bounces=2,
                       rr_start=1, chunk_size=8 * 8 * 2)
    target = np.asarray(render(scene, cfg)[0])
    params = {"mat_albedo": scene.mat_albedo * 0.5}
    loss, grads = grad_render(scene, params, target, cfg)
    gn = float(np.abs(np.asarray(grads["mat_albedo"])).sum())
    assert np.isfinite(float(loss)) and float(loss) > 0.0
    assert np.isfinite(gn) and gn > 0.0


def test_sort_rays_invariance():
    """M5 wavefront sorting: counter-based RNG keyed on uid makes the
    render invariant under per-bounce permutation (SURVEY.md §7 M5)."""
    from tputracer.api import render
    from tputracer.config import RenderConfig

    scene = mesh_scene(subdiv=3, leaf_size=32, accel="cluster")
    cfg = RenderConfig(width=12, height=12, spp=2, max_bounces=3,
                       rr_start=2, chunk_size=12 * 12 * 2)
    a = np.asarray(render(scene, cfg)[0])
    b = np.asarray(render(scene, cfg.with_(sort_rays=True))[0])
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def test_obj_loader_roundtrip():
    obj = """
v 0 0 0
v 1 0 0
v 0 1 0
v 1 1 0
f 1 2 3
f 2 4 3
f -4 -3 -2 -1
"""
    tv = load_obj(obj)
    assert tv.shape == (4, 3, 3)       # 2 tris + 1 quad fan -> 2 tris
    np.testing.assert_allclose(tv[0, 1], [1, 0, 0])
    scene = obj_scene(obj, accel="none")
    assert scene.n_tris == 4


def test_pairs_kernel_matches_brute_interpret():
    """Round-4 pair-expansion traversal (accel.pairs_tpu) vs brute force
    in interpreter mode: closest hit, any-hit, mixed liveness, ragged
    tail, and a K-overflow-heavy scene (rays admitting > K clusters must
    resolve exactly through the union-walk fallback)."""
    from tputracer.accel.pairs_tpu import K, intersect_pairs, occluded_pairs

    n = 4 * 64 + 7
    # dense overlapping clusters so many rays admit more than K boxes
    scene = _random_scene(n_tris=480, leaf_size=16, seed=31)
    o, d = _random_rays(n, seed=32)
    r = np.random.default_rng(33)
    tmax_np = r.uniform(0.5, 4.0, n).astype(np.float32)
    tmax_np[64:128] = 0.0                       # dead subtile
    tmax_np[r.integers(0, n, n // 4)] = 0.0     # scattered dead lanes
    tmin = jnp.zeros((n,))
    tmax = jnp.asarray(tmax_np)

    hb = intersect_brute(scene, o, d, tmin, jnp.full((n,), 3.0e38))
    hp = intersect_pairs(scene, o, d, tmin, jnp.full((n,), 3.0e38),
                         interpret=True)
    v = np.asarray(hb.valid)
    assert K >= 2
    np.testing.assert_array_equal(np.asarray(hp.valid), v)
    np.testing.assert_array_equal(np.asarray(hp.prim)[v],
                                  np.asarray(hb.prim)[v])
    # rtol as the union-walk kernel test; atol for near-zero t where the
    # Moeller-Trumbore vs plane-equation formula skew is absolute
    np.testing.assert_allclose(np.asarray(hp.t)[v], np.asarray(hb.t)[v],
                               rtol=2e-4, atol=1e-6)

    # mixed-liveness closest hit: dead lanes come back invalid
    hb2 = intersect_brute(scene, o, d, tmin, tmax)
    hp2 = intersect_pairs(scene, o, d, tmin, tmax, interpret=True)
    dead = tmax_np == 0.0
    assert not np.asarray(hp2.valid)[dead].any()
    np.testing.assert_array_equal(np.asarray(hp2.valid),
                                  np.asarray(hb2.valid))
    v2 = np.asarray(hb2.valid)
    np.testing.assert_array_equal(np.asarray(hp2.prim)[v2],
                                  np.asarray(hb2.prim)[v2])

    ob = np.asarray(occluded_brute(scene, o, d, tmax))
    op = np.asarray(occluded_pairs(scene, o, d, tmax, interpret=True))
    assert not op[dead].any()
    np.testing.assert_array_equal(ob, op)


def test_pairs_kernel_no_spheres_interpret():
    """Pair traversal on a sphere-free clustered scene (bt0 = tmax path)."""
    from tputracer.accel.pairs_tpu import intersect_pairs, occluded_pairs

    scene = _random_scene(n_tris=300, n_spheres=0, leaf_size=16, seed=41)
    o, d = _random_rays(300, seed=42)
    tmin = jnp.zeros((300,))
    tmax = jnp.full((300,), 3.0e38)
    hb = intersect_brute(scene, o, d, tmin, tmax)
    hp = intersect_pairs(scene, o, d, tmin, tmax, interpret=True)
    v = np.asarray(hb.valid)
    np.testing.assert_array_equal(np.asarray(hp.valid), v)
    np.testing.assert_array_equal(np.asarray(hp.prim)[v],
                                  np.asarray(hb.prim)[v])
    ob = np.asarray(occluded_brute(scene, o, d, jnp.full((300,), 1.5)))
    op = np.asarray(occluded_pairs(scene, o, d, jnp.full((300,), 1.5),
                                   interpret=True))
    np.testing.assert_array_equal(ob, op)


def test_bf16_slab_conservative_far_origin(monkeypatch):
    """Round-5 (advisor): the opt-in bf16 slab's admission guard must
    stay conservative when |origin| >> |box - origin| — rounding the
    origin itself to bf16 adds ABSOLUTE error ~|o|*2^-9 that a purely
    relative guard misses.  Rays from |o| ~ 1000 at a unit-scale scene
    must still find every brute-force hit."""
    monkeypatch.setenv("TPUTRACER_SLAB_BF16", "1")
    from tputracer.accel.traverse_tpu import intersect_pallas

    scene = _random_scene(n_tris=300, n_spheres=0, leaf_size=16, seed=31)
    r = np.random.default_rng(32)
    n = 256
    o_far = r.normal(size=(n, 3))
    o_far = (o_far / np.linalg.norm(o_far, axis=1, keepdims=True)
             * 1000.0).astype(np.float32)
    tgt = r.uniform(-1, 1, (n, 3)).astype(np.float32)
    d = tgt - o_far
    d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)
    o, d = jnp.asarray(o_far), jnp.asarray(d)
    tmin = jnp.zeros((n,))
    tmax = jnp.full((n,), 3.0e38)
    hb = intersect_brute(scene, o, d, tmin, tmax)
    hp = intersect_pallas(scene, o, d, tmin, tmax, interpret=True)
    # conservative admission may only ADD visits, never lose a hit
    v = np.asarray(hb.valid)
    np.testing.assert_array_equal(np.asarray(hp.valid), v)
    np.testing.assert_array_equal(np.asarray(hp.prim)[v],
                                  np.asarray(hb.prim)[v])


def test_obj_mtl_materials():
    """Round-5: material-aware OBJ loading — usemtl/mtllib map onto the
    three BSDF families; emissive mtl materials become area lights."""
    from tputracer.scene.mesh import load_obj_with_materials
    from tputracer.scene.types import DIFFUSE, GLASS, MIRROR

    mtl = """
newmtl red
Kd 0.8 0.1 0.1
newmtl lamp
Kd 0 0 0
Ke 10 9 8
newmtl chrome
illum 5
Ks 0.95 0.95 0.95
newmtl glass
illum 7
Ni 1.52
d 0.1
"""
    obj = """
v 0 0 0
v 1 0 0
v 0 1 0
v 1 1 0
usemtl red
f 1 2 3
usemtl lamp
f 2 4 3
usemtl chrome
f 1 3 2
usemtl glass
f 2 3 4
"""
    tv, mats, materials = load_obj_with_materials(obj, mtl_source=mtl)
    assert tv.shape == (4, 3, 3)
    kinds = [materials[m]["kind"] for m in mats]
    assert kinds == [DIFFUSE, DIFFUSE, MIRROR, GLASS]
    assert materials[mats[1]]["emission"] == (10.0, 9.0, 8.0)
    assert abs(materials[mats[3]]["ior"] - 1.52) < 1e-6
    assert materials[mats[0]]["albedo"] == (0.8, 0.1, 0.1)

    # end-to-end: the scene builds and renders with emitters found
    from tputracer.api import render
    from tputracer.config import RenderConfig
    from tputracer.scene.mesh import obj_scene

    sc = obj_scene(obj, mtl_source=mtl)
    assert sc.n_emitters > 0
    img, _ = render(sc, RenderConfig(width=8, height=8, spp=2,
                                     max_bounces=2, chunk_size=128))
    assert np.isfinite(np.asarray(img)).all()
