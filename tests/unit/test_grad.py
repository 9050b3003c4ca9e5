"""Gradient correctness vs central finite differences (SURVEY.md §4.4).

Pathwise-exact setup: RNG streams are counter-based on path uid, so a
parameter perturbation replays the IDENTICAL sampling decisions as long
as no discrete choice flips.  With a diffuse-only scene and RR disabled
(rr_start > max_bounces) the estimator is a smooth function of albedo
and emission, and AD must match FD to float32 accuracy — no statistical
tolerance needed (SURVEY.md §4 test strategy).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tputracer.config import RenderConfig
from tputracer.integrators.pt import render_pt
from tputracer.scene import cornell_box

CFG = RenderConfig(width=16, height=16, spp=4, max_bounces=3,
                   rr_start=99,  # RR off: keeps the FD pathwise-smooth
                   chunk_size=16 * 16 * 4)


def _loss(scene, key=0):
    # fixed random projection of the image: exercises all pixels with
    # distinct weights (a mean would cancel antisymmetric errors)
    img, _ = render_pt(scene, CFG)
    w = jax.random.uniform(jax.random.key(key), img.shape)
    return jnp.sum(img * w)


def _fd_vs_ad(scene, name, eps):
    # linearize at a strictly interior point: albedo exactly 0 (the light
    # material) sits on the thr>0 liveness discontinuity, which a
    # symmetric FD would straddle
    p0 = getattr(scene, name)
    if name == "mat_albedo":
        p0 = jnp.clip(p0, 0.05, 0.95)

    def f(p):
        return _loss(scene.replace(**{name: p}))

    g_ad = jax.grad(f)(p0)

    rng = np.random.default_rng(7)
    u = jnp.asarray(rng.normal(size=p0.shape).astype(np.float32))
    f_plus = f(p0 + eps * u)
    f_minus = f(p0 - eps * u)
    fd = (float(f_plus) - float(f_minus)) / (2 * eps)
    ad = float(jnp.vdot(g_ad, u))
    return fd, ad


def test_albedo_grad_matches_fd():
    scene = cornell_box("boxes")
    fd, ad = _fd_vs_ad(scene, "mat_albedo", eps=2e-3)
    assert abs(fd - ad) <= 2e-2 * max(abs(fd), abs(ad)), (fd, ad)


def test_emission_grad_matches_fd():
    scene = cornell_box("boxes")
    fd, ad = _fd_vs_ad(scene, "mat_emission", eps=2e-2)
    assert abs(fd - ad) <= 2e-2 * max(abs(fd), abs(ad)), (fd, ad)


def test_ior_grad_finite_on_glass_scene():
    scene = cornell_box("spheres")
    cfg = CFG.with_(max_bounces=5)

    def f(p):
        img, _ = render_pt(scene.replace(mat_ior=p), cfg)
        return jnp.mean(img)

    g = jax.grad(f)(scene.mat_ior)
    assert np.all(np.isfinite(np.asarray(g)))


def test_ior_grad_matches_fd():
    """AD vs central FD on the glass IOR (SURVEY.md §4.4, §7 hard-part 3).

    The detached estimator stop-gradients the reflect/refract pick AND the
    sampled direction, so the function AD differentiates is
    f(ior; decisions(ior0)).  The FD twin replays exactly those frozen
    decisions via decision_scene — without it the FD pair straddles lobe
    flips and measures a different (discontinuous) estimator.
    """
    scene = cornell_box("spheres")
    cfg = CFG.with_(width=24, height=24, max_bounces=5,
                    chunk_size=24 * 24 * 4)
    w = jax.random.uniform(jax.random.key(3), (cfg.height, cfg.width, 3))

    def f(p):
        img, _ = render_pt(scene.replace(mat_ior=p), cfg,
                           decision_scene=scene)
        return jnp.sum(img * w)

    p0 = scene.mat_ior
    g_ad = jax.grad(f)(p0)
    rng = np.random.default_rng(11)
    u = jnp.asarray(rng.normal(size=p0.shape).astype(np.float32))
    eps = 1e-3
    fd = (float(f(p0 + eps * u)) - float(f(p0 - eps * u))) / (2 * eps)
    ad = float(jnp.vdot(g_ad, u))
    assert abs(ad) > 1e-6, "glass gradient unexpectedly zero"
    assert abs(fd - ad) <= 3e-2 * max(abs(fd), abs(ad)), (fd, ad)


def test_decision_scene_identity():
    """decision_scene=scene must be the identity (same decisions, same
    transport) — guards the frozen-decision plumbing itself."""
    scene = cornell_box("spheres")
    cfg = CFG.with_(max_bounces=4)
    a, _ = render_pt(scene, cfg)
    b, _ = render_pt(scene, cfg, decision_scene=scene)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fit_recovers_albedo_and_emission():
    scene = cornell_box("boxes")
    cfg = RenderConfig(width=16, height=16, spp=4, max_bounces=2,
                       rr_start=1, chunk_size=16 * 16 * 4)
    target, _ = render_pt(scene, cfg)

    from tputracer.fit import fit

    init = {
        "mat_albedo": jnp.clip(scene.mat_albedo * 0.4 + 0.2, 0.0, 1.0),
        "mat_emission": scene.mat_emission * 0.5,
    }
    _, params, history = fit(
        scene, target, cfg=cfg, steps=40, learning_rate=1.5e-1,
        init=init, log_every=0)
    assert history[-1]["loss"] < 0.3 * history[0]["loss"], history[::8]


def test_fit_chain_single_matches_stepwise():
    """K chained single-device steps (one dispatch) must reproduce K
    individual _fit_step_single dispatches — the chain is the same math
    unrolled, so out-of-the-box fit() (steps_per_dispatch=8) cannot
    change trajectories."""
    import optax

    from tputracer.fit import _fit_chain_single, _fit_step_single

    scene = cornell_box("boxes")
    cfg = RenderConfig(width=8, height=8, spp=2, max_bounces=2,
                       rr_start=1, chunk_size=8 * 8 * 2)
    target, _ = render_pt(scene, cfg)
    params0 = {"mat_albedo": scene.mat_albedo * 0.5}
    opt = optax.adam(5e-2)

    p, st = params0, opt.init(params0)
    step_losses = []
    for _ in range(4):
        loss, p, st = _fit_step_single(scene, p, target, cfg, opt, st)
        step_losses.append(float(loss))

    losses, pc, _ = _fit_chain_single(
        scene, params0, target, cfg, opt, opt.init(params0), 4)

    np.testing.assert_allclose(np.asarray(losses), step_losses, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(pc["mat_albedo"]),
                               np.asarray(p["mat_albedo"]), rtol=1e-5,
                               atol=1e-7)


def test_fit_checkpoint_resume_reproduces_trajectory(tmp_path):
    """Resume must be bitwise vs an uninterrupted run with the SAME
    checkpoint config: chain boundaries snap to the checkpoint_every
    grid, so both runs compile the identical per-segment programs.
    (Runs with different chaining agree only to float-fusion tolerance —
    XLA fuses a K-step program differently from K 1-step programs.)"""
    scene = cornell_box("boxes")
    cfg = RenderConfig(width=8, height=8, spp=2, max_bounces=2,
                       rr_start=1, chunk_size=8 * 8 * 2)
    target, _ = render_pt(scene, cfg)
    from tputracer.fit import fit

    init = {"mat_albedo": scene.mat_albedo * 0.5}

    # uninterrupted run, same checkpoint cadence (its own file)
    _, p_full, h_full = fit(scene, target, cfg=cfg, steps=10,
                            init=init, log_every=0,
                            checkpoint_path=str(tmp_path / "ref.npz"),
                            checkpoint_every=5)

    # interrupted at step 5, resumed from checkpoint
    ck = str(tmp_path / "fit.npz")
    fit(scene, target, cfg=cfg, steps=5, init=init, log_every=0,
        checkpoint_path=ck, checkpoint_every=5)
    _, p_res, h_res = fit(scene, target, cfg=cfg, steps=10, init=init,
                          log_every=0, checkpoint_path=ck,
                          checkpoint_every=5)

    np.testing.assert_array_equal(
        np.asarray(p_full["mat_albedo"]), np.asarray(p_res["mat_albedo"]))
    assert h_res[0]["step"] == 5

def test_remat_bitwise_primal_and_matching_grads():
    """cfg.remat=True must be a pure scheduling change: the per-bounce
    jax.checkpoint path shares the exact step function with the default
    path, so the primal is BITWISE identical and gradients agree to
    float32 tolerance (backward order differs, so not bitwise)."""
    scene = cornell_box("spheres")   # exercises glass + mirror lobes too
    img0, _ = jax.jit(lambda s: render_pt(s, CFG))(scene)
    img1, _ = jax.jit(lambda s: render_pt(s, CFG.with_(remat=True)))(scene)
    assert bool(jnp.all(img0 == img1))

    def loss(p, cfg):
        img, _ = render_pt(scene.replace(**p), cfg)
        return jnp.mean(img ** 2)

    params = {"mat_albedo": jnp.clip(scene.mat_albedo, 0.05, 0.95),
              "mat_emission": scene.mat_emission}
    g0 = jax.grad(loss)(params, CFG)
    g1 = jax.grad(loss)(params, CFG.with_(remat=True))
    for k in params:
        np.testing.assert_allclose(np.asarray(g0[k]), np.asarray(g1[k]),
                                   rtol=1e-5, atol=1e-7)
