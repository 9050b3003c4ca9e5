"""Public API (SURVEY.md §1b top layer): render / render_bdpt / grad_render.

All entry points jit-compile with the config as a static argument; the
scene is a pytree argument so material/light edits do NOT retrace.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from tputracer.config import BdptConfig, RenderConfig


@partial(jax.jit, static_argnums=(1,))
def _render_jit(scene, cfg):
    from tputracer.integrators.pt import render_pt

    return render_pt(scene, cfg)


def render(scene, cfg: RenderConfig | None = None, **kw):
    """Render with the wavefront path tracer. Returns (image, stats)."""
    cfg = (cfg or RenderConfig()).with_(**kw) if kw or cfg is None else cfg
    return _render_jit(scene, cfg)


@partial(jax.jit, static_argnums=(1,))
def _render_bdpt_jit(scene, cfg):
    from tputracer.integrators.bdpt import render_bdpt as _rb

    return _rb(scene, cfg)


def render_bdpt(scene, cfg: BdptConfig | None = None, **kw):
    """Render with the bidirectional path tracer. Returns (image, stats)."""
    cfg = (cfg or BdptConfig()).with_(**kw) if kw or cfg is None else cfg
    return _render_bdpt_jit(scene, cfg)


def _loss_l2(img, target):
    return jnp.mean((img - target) ** 2)


@partial(jax.jit, static_argnums=(3,))
def _grad_render_jit(scene, params, target, cfg):
    from tputracer.integrators.pt import render_pt

    def loss_fn(p):
        img, _ = render_pt(scene.replace(**p), cfg)
        return _loss_l2(img, target)

    return jax.value_and_grad(loss_fn)(params)


def grad_render(scene, params, target, cfg: RenderConfig | None = None, **kw):
    """Pixel-loss value + gradients w.r.t. material/light parameter arrays.

    params: dict of Scene field overrides to differentiate, e.g.
      {"mat_albedo": ..., "mat_emission": ...}   (BASELINE config 5)
    target: (H,W,3) target image.
    Returns (loss, grads) with grads matching the params pytree.

    Gradients flow through the shading math only (detached sampling,
    SURVEY.md §3.6): sampled directions / discrete choices are constants.
    """
    cfg = (cfg or RenderConfig()).with_(**kw) if kw or cfg is None else cfg
    return _grad_render_jit(scene, params, target, cfg)
