"""Sharded BDPT inverse rendering (round-5): the DP fit step through the
bidirectional integrator must reproduce the single-device BDPT loss and
gradients.

The interesting coupling: the t=1 light-tracing splat film is GLOBAL
(shard s's light subpaths land on shard t's image rows), so the loss
couples shards and the backward pass must flow through the splat's
``lax.psum`` — psum's transpose being psum supplies exactly the
cross-shard cotangent sum.  These tests pin that down numerically
against jax.grad of the plain single-device render_bdpt.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tputracer.config import BdptConfig
from tputracer.dist import fit_step_bdpt_sharded, make_mesh
from tputracer.integrators.bdpt import render_bdpt
from tputracer.scene import cornell_box

CFG = BdptConfig(width=16, height=16, spp=2, max_bounces=3,
                 chunk_size=16 * 16 * 2)


def _single_device_reference(scene, params, target):
    def loss_fn(p):
        img, _ = render_bdpt(scene.replace(**p), CFG)
        return jnp.sum((img - target) ** 2) / jnp.float32(
            CFG.height * CFG.width * 3)

    return jax.value_and_grad(loss_fn)(params)


def test_sharded_bdpt_fit_matches_single_device():
    assert len(jax.devices()) >= 8
    scene = cornell_box("boxes")
    target, _ = render_bdpt(scene, CFG)
    target = jnp.asarray(np.asarray(target))
    params = {"mat_albedo": jnp.clip(scene.mat_albedo * 0.6, 0.05, 0.95),
              "mat_emission": scene.mat_emission * 1.5}
    sc = scene.replace(**params)

    loss_1, grads_1 = _single_device_reference(sc, params, target)

    for shape, names in (((8,), ("dp",)), ((2, 4), ("host", "chip"))):
        mesh = make_mesh(shape, names)
        loss_s, grads_s = fit_step_bdpt_sharded(sc, params, target, CFG,
                                                mesh)
        np.testing.assert_allclose(float(loss_s), float(loss_1),
                                   rtol=1e-5, atol=1e-7)
        for k in params:
            np.testing.assert_allclose(np.asarray(grads_s[k]),
                                       np.asarray(grads_1[k]),
                                       rtol=2e-4, atol=1e-6)
    gn = sum(float(jnp.abs(g).sum()) for g in grads_1.values())
    assert np.isfinite(gn) and gn > 0.0


def test_fit_bdpt_with_mesh_smoke():
    """fit(integrator='bdpt', mesh=...) drives the sharded step and the
    loss drops."""
    from tputracer.fit import fit

    scene = cornell_box("boxes")
    cfg = BdptConfig(width=8, height=8, spp=2, max_bounces=2,
                     chunk_size=8 * 8 * 2)
    target, _ = render_bdpt(scene, cfg)
    off = scene.replace(mat_albedo=jnp.clip(scene.mat_albedo * 0.5,
                                            0.05, 0.95))
    mesh = make_mesh((8,), ("dp",))
    _, params, hist = fit(off, target, param_names=("mat_albedo",),
                          cfg=cfg, steps=4, learning_rate=5e-2,
                          log_every=0, steps_per_dispatch=1,
                          integrator="bdpt", mesh=mesh)
    assert np.isfinite(hist[-1]["loss"])
    assert hist[-1]["loss"] < hist[0]["loss"]
