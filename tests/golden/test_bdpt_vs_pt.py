"""BDPT cross-check (SURVEY.md §4 item 3): PT and BDPT must converge to
the same image.  Both integrators are independent estimators of the same
path-space integral over the same path-length cap (BdptConfig docstring),
so with the PT image rendered at high spp as the reference, the BDPT
image must agree within Monte-Carlo noise — verified at two spp levels so
a bias (which would NOT shrink with spp) is distinguished from variance.
"""

import numpy as np

from tputracer.api import render, render_bdpt
from tputracer.config import BdptConfig, RenderConfig
from tputracer.scene import cornell_box


def _pt_reference(variant, bounces, spp=4096):
    scene = cornell_box(variant)
    cfg = RenderConfig(width=12, height=12, spp=spp, max_bounces=bounces,
                       rr_start=99, seed=1, chunk_size=1 << 17)
    return scene, np.asarray(render(scene, cfg)[0])


def _bdpt(scene, bounces, spp):
    cfg = BdptConfig(width=12, height=12, spp=spp, max_bounces=bounces,
                     seed=2, chunk_size=1 << 15)
    return np.asarray(render_bdpt(scene, cfg)[0])


def _rel(a, ref):
    return np.abs(a - ref) / (0.05 + np.abs(ref))


def test_bdpt_matches_pt_diffuse():
    """Diffuse Cornell: all connection strategies + MIS active."""
    scene, ref = _pt_reference("boxes", bounces=3)
    lo = _rel(_bdpt(scene, 3, spp=64), ref).mean()
    hi = _rel(_bdpt(scene, 3, spp=256), ref).mean()
    assert hi < 0.022, f"bdpt vs pt mean rel err {hi:.4f}"
    # error is variance, not bias: quadrupling spp must shrink it
    assert hi < lo * 0.85, f"no MC convergence: {lo:.4f} -> {hi:.4f}"


def test_bdpt_matches_pt_caustic():
    """Caustics scene (BASELINE config 4): delta chains, light tracing
    splats (t=1) carry the caustic; MIS must not double-count them."""
    scene, ref = _pt_reference("caustic", bounces=5)
    err = _rel(_bdpt(scene, 5, spp=256), ref)
    assert err.mean() < 0.018, f"bdpt vs pt mean rel err {err.mean():.4f}"


def test_bdpt_matches_pt_specular():
    """Mirror + glass spheres (config 2 geometry): s=0 through delta
    chains and connections around them."""
    scene, ref = _pt_reference("spheres", bounces=5)
    err = _rel(_bdpt(scene, 5, spp=256), ref)
    assert err.mean() < 0.04, f"bdpt vs pt mean rel err {err.mean():.4f}"


def test_bdpt_deterministic_and_chunk_invariant():
    """Counter-based RNG: the render is a pure function of (scene, cfg)
    and independent of the chunk split (SURVEY.md §2 row 2)."""
    scene = cornell_box("boxes")
    base = BdptConfig(width=8, height=8, spp=8, max_bounces=2, seed=7,
                      chunk_size=8 * 8 * 8)
    a = np.asarray(render_bdpt(scene, base)[0])
    b = np.asarray(render_bdpt(scene, base.with_(chunk_size=8 * 8 * 2))[0])
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)
