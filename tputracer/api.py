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


@partial(jax.jit, static_argnums=(2, 3))
def _progressive_pass_jit(scene, offset, step, cfg):
    from tputracer.integrators.pt import trace_chunked

    n_pix = cfg.width * cfg.height
    pix = jnp.arange(n_pix, dtype=jnp.uint32)[:, None]
    # offset is (1,)-shaped, NOT a 0-d scalar: jax 0.9's C++ fast path
    # mis-prunes executable buffers on repeat calls with scalar args once
    # another jitted program has run ("supplied 20 buffers but expected
    # 23"); a rank-1 arg sidesteps the bug
    uid = (pix * cfg.spp + offset[0]
           + jnp.arange(step, dtype=jnp.uint32)[None, :]).ravel()
    L, _ = trace_chunked(scene, uid, cfg)
    return L.reshape(cfg.height, cfg.width, step, 3).sum(axis=2)


def _ckpt_ident(scene, cfg):
    """Checkpoint identity: a stale film from a different render must
    never silently blend in — resume only on a full scene/config/seed
    match.  (hashlib, not hash(): bytes hashing is PYTHONHASHSEED-salted
    and would differ across processes, breaking every resume.)

    The INTEGRATOR is part of the identity (round-5 review): cfg's type
    plus its estimator-changing flags (mis / mis_power) are hashed in,
    so a PT film can never resume into a BDPT accumulation (the five
    shared numeric fields alone would collide)."""
    import hashlib

    import numpy as np

    dig = hashlib.sha256()
    for leaf in jax.tree.leaves(scene):
        dig.update(np.asarray(leaf).tobytes())
    dig.update(type(cfg).__name__.encode())
    dig.update(repr((getattr(cfg, "mis", None),
                     getattr(cfg, "mis_power", None),
                     getattr(cfg, "rr_start", None),
                     getattr(cfg, "transport_radiance", None))).encode())
    scene_hash = int.from_bytes(dig.digest()[:6], "little")
    return np.array(
        [cfg.width, cfg.height, cfg.spp, cfg.seed, cfg.max_bounces,
         scene_hash], np.int64)


def _progressive_loop(scene, cfg, pass_fn, spp_per_pass, checkpoint_path,
                      resume, callback):
    """Shared pass/accumulate/checkpoint loop for PT + BDPT progressive.

    pass_fn(offset (1,), step) -> (H,W,3) film-sum contribution of
    samples [offset, offset+step) per pixel, in uid-row order."""
    import os

    import numpy as np

    ident = _ckpt_ident(scene, cfg)
    film = np.zeros((cfg.height, cfg.width, 3), np.float32)  # uid-row order
    done = 0
    if checkpoint_path and resume and os.path.exists(checkpoint_path):
        z = np.load(checkpoint_path)
        if "ident" not in z or not np.array_equal(z["ident"], ident):
            raise ValueError(
                f"checkpoint {checkpoint_path} belongs to a different "
                "render (scene/config/seed mismatch); delete it or pass "
                "resume=False")
        film, done = z["film"], int(z["spp_done"])

    while done < cfg.spp:
        step = min(spp_per_pass, cfg.spp - done)
        part = pass_fn(jnp.full((1,), done, jnp.uint32), step)
        film = film + np.asarray(part)
        done += step
        if checkpoint_path:
            np.savez(checkpoint_path, film=film, spp_done=done, ident=ident)
        if callback:
            callback(done, film[::-1] / max(done, 1))
    return film[::-1] / max(done, 1), done


def render_progressive(scene, cfg: RenderConfig, spp_per_pass=4,
                       checkpoint_path=None, resume=True, callback=None):
    """Accumulate cfg.spp in passes with film checkpointing (SURVEY.md §5
    "checkpoint/resume": film + sample count persist; resume adds the
    REMAINING spp and reproduces the single-shot render exactly).

    Per-pass path uids are the same global ids the single-shot render
    would use (uid = pixel * cfg.spp + sample), so the counter-based RNG
    makes pass-splitting invisible: the accumulated film is bitwise the
    mean of the same per-path radiances, whatever spp_per_pass or how
    often the job died.  Returns (image (H,W,3) row-0-top, spp_done).
    """
    return _progressive_loop(
        scene, cfg,
        lambda off, step: _progressive_pass_jit(scene, off, step, cfg),
        spp_per_pass, checkpoint_path, resume, callback)


@partial(jax.jit, static_argnums=(2, 3))
def _progressive_bdpt_pass_jit(scene, offset, step, cfg):
    from tputracer.integrators.bdpt import trace_bdpt_rows

    n_pix = cfg.width * cfg.height
    pix = jnp.arange(n_pix, dtype=jnp.uint32)[:, None]
    uid = (pix * cfg.spp + offset[0]
           + jnp.arange(step, dtype=jnp.uint32)[None, :]).ravel()
    # trace_bdpt_rows honors cfg.chunk_size in whole-row chunks (a
    # 512^2 pass at step=4 is 1M paths — 16x the memory knob if traced
    # in one call); samples_per_pixel=step because this uid array holds
    # only a slice of each pixel's samples
    L_own, splat, _ = trace_bdpt_rows(scene, uid, cfg,
                                      samples_per_pixel=step)
    own = L_own.reshape(cfg.height, cfg.width, step, 3).sum(axis=2)
    # single-shot film = L_sum/spp + splat_sum/(n_pix*spp)
    #                  = (L_sum + splat_sum/n_pix) / spp — so each pass
    # contributes its splat scaled by 1/n_pix into the same accumulator
    return own + splat.reshape(cfg.height, cfg.width, 3) / jnp.float32(n_pix)


def render_bdpt_progressive(scene, cfg: BdptConfig, spp_per_pass=4,
                            checkpoint_path=None, resume=True,
                            callback=None):
    """Progressive BDPT (round-5): same pass/checkpoint/resume contract
    as render_progressive — long caustic renders (BDPT's home turf) can
    now accumulate spp across restarts.  The t=1 splat film joins the
    same accumulator scaled by 1/n_pix, so the accumulated image matches
    the single-shot render_bdpt (same per-path radiances; summation
    order differs, so float tolerance rather than bitwise).
    Returns (image (H,W,3) row-0-top, spp_done)."""
    return _progressive_loop(
        scene, cfg,
        lambda off, step: _progressive_bdpt_pass_jit(scene, off, step, cfg),
        spp_per_pass, checkpoint_path, resume, callback)


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
