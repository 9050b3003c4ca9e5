"""Scene tiling (TP analogue) tests on the 8-virtual-CPU-device mesh.

The geometry is sharded cluster-major over the mesh (per-device footprint
= C/P clusters) and rays ring-rotate past every shard (dist.scene_shard).
The render must match the fully-replicated render: the ring traversal
finds the identical global nearest hit and the RNG is uid-keyed, so the
images agree to float32 tolerance (cluster visit order differs, so the
best-t reduction order can differ in the last ulp).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tputracer.api import render
from tputracer.config import RenderConfig
from tputracer.dist import make_mesh, render_tiled
from tputracer.dist.scene_shard import pad_scene_clusters
from tputracer.scene.mesh import mesh_scene

CFG = RenderConfig(width=16, height=16, spp=2, max_bounces=3, rr_start=2,
                   chunk_size=16 * 16 * 2)


@pytest.fixture(scope="module")
def scene():
    # ~5k tris, leaf 32 -> enough clusters that every shard holds several
    return mesh_scene(subdiv=4, leaf_size=32, accel="cluster")


def test_tiled_render_matches_replicated(scene):
    assert len(jax.devices()) >= 8
    ref, ref_stats = render(scene, CFG)
    mesh = make_mesh((8,), ("dp",))
    img, stats = render_tiled(scene, CFG, mesh)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)
    # stats contracts match the replicated renderer's global sums
    np.testing.assert_allclose(np.asarray(stats["rays_closest"]),
                               np.asarray(ref_stats["rays_closest"]))


def test_tiled_footprint_is_fractional(scene):
    """Per-device geometry footprint must be C/P clusters (<= 1/4 of the
    full scene for P=8) — the point of tiling."""
    mesh = make_mesh((8,), ("dp",))
    P = 8
    padded = pad_scene_clusters(scene, P)
    C = padded.n_clusters
    assert C % P == 0
    per_dev_tris = (C // P) * padded.leaf_size
    assert per_dev_tris <= padded.n_tri_pad / 4, (
        per_dev_tris, padded.n_tri_pad)
    # and the sharded leaves really are split: check the spec'd axes
    from tputracer.dist.scene_shard import scene_tiling_specs

    specs = scene_tiling_specs(padded, ("dp",))
    assert specs.tri_v0 != specs.mat_albedo


def test_tiled_render_with_spheres_matches_replicated():
    """Round-5: analytic spheres are first-class in tiled scenes
    (BASELINE north_star) — the sphere tables stay replicated and
    resolve on the home hop of the ring, so a sphere-bearing clustered
    scene renders tiled and matches the replicated render (glass +
    mirror exercise delta BSDFs through the ring's Hit assembly)."""
    from tputracer.scene import cornell_box

    sc = cornell_box("spheres", accel="cluster", leaf_size=4)
    assert sc.n_spheres == 2 and sc.n_clusters > 0
    cfg = RenderConfig(width=16, height=16, spp=2, max_bounces=4,
                       rr_start=3, chunk_size=16 * 16 * 2)
    ref, ref_stats = render(sc, cfg)
    mesh = make_mesh((8,), ("dp",))
    img, stats = render_tiled(sc, cfg, mesh)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(stats["rays_shadow"]),
                               np.asarray(ref_stats["rays_shadow"]))


def test_tiled_render_2axis_mesh(scene):
    """Round-4: the ring generalizes to multi-axis meshes (tuple axis
    ppermute over the linearized (host, chip) ring) — the same mesh
    shape dryrun_multichip uses."""
    ref, _ = render(scene, CFG)
    mesh = make_mesh((2, 4), ("host", "chip"))
    img, _ = render_tiled(scene, CFG, mesh)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_tiled_fit_step_matches_replicated(scene):
    """Round-4: tiled inverse rendering — loss/grads through the ring
    traversal must match the replicated DP fit step (identical hits,
    identical RNG, same shading math)."""
    from tputracer.dist import fit_step_sharded
    from tputracer.dist.scene_shard import fit_step_tiled

    target, _ = render(scene, CFG)
    target = jnp.asarray(np.asarray(target))
    params = {"mat_albedo": scene.mat_albedo * 0.6,
              "mat_emission": scene.mat_emission * 1.5}
    sc = scene.replace(**params)

    mesh_dp = make_mesh((8,), ("dp",))
    loss_r, grads_r = fit_step_sharded(sc, params, target, CFG, mesh_dp)
    loss_t, grads_t = fit_step_tiled(sc, params, target, CFG, mesh_dp)
    np.testing.assert_allclose(float(loss_t), float(loss_r),
                               rtol=1e-5, atol=1e-7)
    for k in params:
        np.testing.assert_allclose(np.asarray(grads_t[k]),
                                   np.asarray(grads_r[k]),
                                   rtol=2e-4, atol=1e-6)
    gn = sum(float(jnp.abs(g).sum()) for g in grads_t.values())
    assert np.isfinite(gn) and gn > 0.0

    # and on the 2-axis mesh
    mesh2 = make_mesh((2, 4), ("host", "chip"))
    loss_t2, grads_t2 = fit_step_tiled(sc, params, target, CFG, mesh2)
    np.testing.assert_allclose(float(loss_t2), float(loss_r),
                               rtol=1e-5, atol=1e-7)
    for k in params:
        np.testing.assert_allclose(np.asarray(grads_t2[k]),
                                   np.asarray(grads_r[k]),
                                   rtol=2e-4, atol=1e-6)


def test_tiled_bdpt_matches_plain(scene):
    """Round-5: geometry-tiled BDPT — both subpath walks, connection
    shadow rays and t=1 splat occlusion traverse via the ring; the film
    must match single-device render_bdpt to float tolerance."""
    from tputracer.config import BdptConfig
    from tputracer.dist import render_bdpt_tiled
    from tputracer.integrators.bdpt import render_bdpt

    cfg = BdptConfig(width=16, height=16, spp=2, max_bounces=3,
                     chunk_size=16 * 16 * 2)
    ref, _ = render_bdpt(scene, cfg)
    mesh = make_mesh((8,), ("dp",))
    img = render_bdpt_tiled(scene, cfg, mesh)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_tiled_bdpt_with_spheres(scene):
    """Tiled BDPT on a sphere-bearing clustered scene (caustic-class
    content: glass sphere = delta chains through the ring Hit path)."""
    from tputracer.config import BdptConfig
    from tputracer.dist import render_bdpt_tiled
    from tputracer.integrators.bdpt import render_bdpt
    from tputracer.scene import cornell_box

    sc = cornell_box("caustic", accel="cluster", leaf_size=4)
    assert sc.n_spheres == 1 and sc.n_clusters > 0
    cfg = BdptConfig(width=16, height=16, spp=2, max_bounces=3,
                     chunk_size=16 * 16 * 2)
    ref, _ = render_bdpt(sc, cfg)
    mesh = make_mesh((8,), ("dp",))
    img = render_bdpt_tiled(sc, cfg, mesh)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_fit_tiled_smoke(scene):
    """Round-5: fit(tiled=True) drives the chained geometry-tiled step
    and the loss drops."""
    from tputracer.fit import fit

    target, _ = render(scene, CFG)
    off = scene.replace(mat_albedo=jnp.clip(scene.mat_albedo * 0.5,
                                            0.05, 0.95))
    mesh = make_mesh((8,), ("dp",))
    _, params, hist = fit(off, target, param_names=("mat_albedo",),
                          cfg=CFG, steps=4, learning_rate=5e-2,
                          log_every=0, steps_per_dispatch=2,
                          mesh=mesh, tiled=True)
    assert np.isfinite(hist[-1]["loss"])
    assert hist[-1]["loss"] < hist[0]["loss"]
