"""jax_debug_nans CI job (SURVEY.md §5 "sanitizers").

Runs representative forward renders and a gradient step with JAX's NaN
debugger armed: any NaN produced ANYWHERE in the computation (not just
surviving to the output) raises immediately.  This catches transient
NaN-poisoning that masked selects would otherwise hide — e.g. the
round-2 inf**2 overflow in the MIS power heuristic backward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tputracer.config import RenderConfig
from tputracer.integrators.pt import render_pt
from tputracer.scene import cornell_box


@pytest.fixture
def nan_debug():
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", False)


CFG = RenderConfig(width=12, height=12, spp=2, max_bounces=4, rr_start=2,
                   chunk_size=12 * 12 * 2)


@pytest.mark.parametrize("variant", ["boxes", "spheres", "caustic"])
def test_forward_render_nan_free(nan_debug, variant):
    img, _ = render_pt(cornell_box(variant), CFG)
    assert np.isfinite(np.asarray(img)).all()


def test_forward_render_mis_nan_free(nan_debug):
    img, _ = render_pt(cornell_box("boxes"), CFG.with_(mis=True))
    assert np.isfinite(np.asarray(img)).all()


def test_grad_step_nan_free(nan_debug):
    scene = cornell_box("spheres")
    target, _ = render_pt(scene, CFG)

    def loss(p):
        img, _ = render_pt(scene.replace(**p), CFG.with_(mis=True))
        return jnp.mean((img - target) ** 2)

    params = {"mat_albedo": scene.mat_albedo * 0.7,
              "mat_emission": scene.mat_emission * 1.5,
              "mat_ior": scene.mat_ior}
    val, grads = jax.value_and_grad(loss)(params)
    for leaf in jax.tree.leaves((val, grads)):
        assert np.isfinite(np.asarray(leaf)).all()


def test_bdpt_render_nan_free(nan_debug):
    from tputracer.config import BdptConfig
    from tputracer.integrators.bdpt import render_bdpt

    cfg = BdptConfig(width=10, height=10, spp=2, max_bounces=3,
                     chunk_size=10 * 10 * 2)
    img, _ = render_bdpt(cornell_box("caustic"), cfg)
    assert np.isfinite(np.asarray(img)).all()


def test_no_tracer_leaks():
    """jax.checking_leaks (SURVEY.md §5 "sanitizers", leak checking):
    verifies no tracer escapes a jit trace through Python-side state —
    the render/fit paths accumulate Python lists of per-bounce stats,
    which is exactly the pattern that leaks when mishandled."""
    with jax.checking_leaks():
        img, stats = jax.jit(
            lambda s: render_pt(s, CFG))(cornell_box("boxes"))
        jax.block_until_ready(img)
    assert np.isfinite(np.asarray(img)).all()


def test_bdpt_grad_nan_free(nan_debug):
    """Round-5: the BDPT backward (MIS ratio chains, splat scatter VJP,
    delta-suppression masks) under the NaN debugger — transient NaNs in
    masked branches would raise here even if the final grads are clean."""
    from tputracer.config import BdptConfig
    from tputracer.integrators.bdpt import render_bdpt

    cfg = BdptConfig(width=8, height=8, spp=2, max_bounces=3,
                     chunk_size=8 * 8 * 2)
    scene = cornell_box("caustic")

    def loss(p):
        img, _ = render_bdpt(scene.replace(**p), cfg)
        return jnp.mean(img)

    params = {"mat_albedo": jnp.clip(scene.mat_albedo, 0.05, 0.95),
              "mat_emission": scene.mat_emission}
    val, grads = jax.value_and_grad(loss)(params)
    for leaf in jax.tree.leaves((val, grads)):
        assert np.isfinite(np.asarray(leaf)).all()
