"""Multi-device tests on the 8-virtual-CPU-device mesh (SURVEY.md §4.5).

Placement invariance is the core property: the RNG is keyed by global
path uid (tputracer.rng), so any mesh shape must reproduce the
single-device image bitwise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tputracer.api import render
from tputracer.config import RenderConfig
from tputracer.dist import (fit_step_opt_sharded, fit_step_sharded,
                            make_mesh, render_sharded)
from tputracer.scene import cornell_box

CFG = RenderConfig(width=16, height=16, spp=2, max_bounces=2, rr_start=1,
                   chunk_size=16 * 16 * 2)


@pytest.fixture(scope="module")
def scene():
    return cornell_box("boxes")


@pytest.mark.parametrize("shape,names", [
    ((8,), ("dp",)),
    ((2, 4), ("host", "chip")),
])
def test_sharded_render_bitwise_matches_single_device(scene, shape, names):
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    ref, _ = render(scene, CFG)
    mesh = make_mesh(shape, names)
    img, _ = render_sharded(scene, CFG, mesh)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(img))


def test_bdpt_sharded_matches_single_device(scene):
    """Sharded BDPT == single-device BDPT (splat film psum reduces in a
    different float order, so allclose rather than bitwise)."""
    import numpy as np

    from tputracer.api import render_bdpt
    from tputracer.config import BdptConfig
    from tputracer.dist import make_mesh, render_bdpt_sharded

    cfg = BdptConfig(width=8, height=8, spp=4, max_bounces=2, seed=3,
                     chunk_size=8 * 8 * 4)
    ref, _ = render_bdpt(scene, cfg)
    mesh = make_mesh((4,), ("dp",))
    img = render_bdpt_sharded(scene, cfg, mesh)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_fit_step_sharded_matches_single_device_grads(scene):
    target, _ = render(scene, CFG)
    params = {"mat_albedo": scene.mat_albedo * 0.5}
    sc = scene.replace(**params)

    def loss_fn(p):
        img, _ = render(sc.replace(**p), CFG)
        return jnp.mean((img - target) ** 2)

    loss1, grads1 = jax.value_and_grad(loss_fn)(params)

    mesh = make_mesh((8,), ("dp",))
    loss8, grads8 = fit_step_sharded(sc, params, target, CFG, mesh)

    np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(grads1["mat_albedo"]), np.asarray(grads8["mat_albedo"]),
        rtol=1e-4, atol=1e-7)


def test_fit_step_opt_sharded_fused(scene):
    """The fused single-dispatch step (render+bwd+psum+adam+project) must
    match fit_step_sharded + a separate optax update."""
    import optax

    target, _ = render(scene, CFG)
    params = {"mat_albedo": scene.mat_albedo * 0.5}
    sc = scene.replace(**params)
    mesh = make_mesh((8,), ("dp",))
    opt = optax.adam(1e-1)
    st = opt.init(params)

    loss_a, grads = fit_step_sharded(sc, params, target, CFG, mesh)
    updates, st_a = opt.update(grads, st, params)
    p_a = jax.tree.map(lambda p, u: jnp.clip(p + u, 0.0, 1.0),
                       params, updates)

    loss_b, p_b, st_b = fit_step_opt_sharded(sc, params, target, CFG,
                                             mesh, opt, st)
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(p_a["mat_albedo"]),
                               np.asarray(p_b["mat_albedo"]),
                               rtol=1e-6, atol=1e-7)
