"""BDPT MIS weight-sum property test (SURVEY.md §4.3).

For one full transport path x0=camera .. x_{k-1}=light-point, BDPT can
sample it via every strategy (s, t) with s + t = k (t >= 1 eye vertices,
s >= 0 light vertices).  The balance heuristic weight of strategy j is
p_j / sum_i p_i, so over all *samplable* strategies the weights MUST sum
to exactly 1 — any bookkeeping slip in the pdf_fwd/pdf_rev chains or the
delta-suppression flags breaks the identity (the round-2 light-chain
reset bug lived exactly here).

The test builds random synthetic paths through the Cornell box, fills the
eye/light vertex SoAs with exactly the pdf chains integrators.bdpt._walk
would produce for that path (camera pdf at the first eye segment, cosine
emission pdf at the first light segment, pdf_bsdf conversions elsewhere),
then sums _mis_weight over all strategies of each path length.

Normals are the half-vectors of the incoming/outgoing directions, which
(a) keeps every pdf_bsdf argument on the positive hemisphere and (b)
makes every vertex *geometrically valid as a mirror vertex* (wi is the
exact reflection of wo about the half-vector) — so the same chains test
the delta-suppression logic by retagging one vertex as MIRROR.
"""

import numpy as np
import jax.numpy as jnp

from tputracer import geometry as g
from tputracer.bsdf import pdf_bsdf
from tputracer.integrators.bdpt import (
    _camera_pdf_sa,
    _camera_forward,
    _convert_density,
    _mis_weight,
)
from tputracer.scene import cornell_box
from tputracer.scene.types import DIFFUSE, MIRROR

_PI = float(np.pi)


def _unit(v):
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def _make_paths(scene, k, n, seed, mirror_at=None):
    """n random k-vertex paths: camera, k-2 interior points, emitter point.

    Returns (pts (k,n,3), ng (k,n,3), wo_eye (k,n,3), mats (k,n), prims
    (k,n), pdf_a (n,)) — all as the EYE walk orients them (wo toward the
    camera side).  mirror_at retags that path index as the scene's MIRROR
    material (geometrically exact: normals are half-vectors).
    """
    r = np.random.default_rng(seed)
    cam_o = np.asarray(scene.camera.o, np.float64)
    kinds = np.asarray(scene.mat_kind)
    mat_diff = int(np.nonzero(kinds == DIFFUSE)[0][0])
    mat_mirr = int(np.nonzero(kinds == MIRROR)[0][0])

    # emitter point (uniform over emitter 0)
    ev0 = np.asarray(scene.emit_v0)[0]
    ee1 = np.asarray(scene.emit_e1)[0]
    ee2 = np.asarray(scene.emit_e2)[0]
    en = np.asarray(scene.emit_n)[0]
    area = float(np.asarray(scene.emit_area)[0])
    E = scene.n_emitters
    b1 = r.uniform(0.05, 0.6, n)
    b2 = r.uniform(0.05, 0.35, n)
    x_light = ev0[None] + b1[:, None] * ee1[None] + b2[:, None] * ee2[None]
    pdf_a = np.full(n, 1.0 / (area * E))

    pts = np.empty((k, n, 3))
    pts[0] = cam_o[None]
    for i in range(1, k - 1):
        pts[i] = r.uniform(0.15, 0.85, (n, 3))
    pts[k - 1] = x_light

    e = _unit(pts[1:] - pts[:-1])          # e[i] = dir x_i -> x_{i+1}
    ng = np.empty((k, n, 3))
    ng[0] = np.asarray(_camera_forward(scene.camera))[None]
    for i in range(1, k - 1):
        ng[i] = _unit(-e[i - 1] + e[i])    # half-vector: both dots > 0
    ng[k - 1] = en[None]

    wo = np.zeros((k, n, 3))
    wo[1:] = -e                            # toward the eye-side predecessor

    mats = np.full((k, n), mat_diff, np.int32)
    prims = np.full((k, n), 0, np.int32)   # non-emitter tri id
    mats[k - 1] = int(np.asarray(scene.emit_mat)[0])
    prims[k - 1] = int(np.asarray(scene.emit_prim)[0])
    if mirror_at is not None:
        mats[mirror_at] = mat_mirr
    return (jnp.asarray(pts, jnp.float32), jnp.asarray(ng, jnp.float32),
            jnp.asarray(wo, jnp.float32), jnp.asarray(mats),
            jnp.asarray(prims), jnp.asarray(pdf_a, jnp.float32),
            jnp.asarray(e, jnp.float32))


def _vert(p, ng, wo, beta_n, pdf_fwd, pdf_rev, mat, prim, delta, valid):
    n = p.shape[0]
    return dict(p=p, ng=ng, wo=wo,
                beta=jnp.ones((n, 3), jnp.float32),
                pdf_fwd=pdf_fwd, pdf_rev=pdf_rev, mat=mat, prim=prim,
                delta=delta, valid=valid)


def _build_vertex_lists(scene, pts, ng, wo, mats, prims, pdf_a, e):
    """Fill eye (zs) and light (ys) vertex SoAs with the pdf chains
    integrators.bdpt._walk produces along this exact path."""
    k, n, _ = pts.shape
    cam = scene.camera
    zeros1 = jnp.zeros((n,), jnp.float32)
    ones_b = jnp.ones((n,), bool)
    zeros_b = jnp.zeros((n,), bool)
    kinds = jnp.asarray(scene.mat_kind)
    delta = [kinds[mats[i]] != DIFFUSE for i in range(k)]

    # ---- eye subpath: z_j = x_j ----
    zs = []
    cam_v = _vert(pts[0], ng[0], jnp.zeros((n, 3), jnp.float32), None,
                  jnp.ones((n,), jnp.float32), zeros1,
                  jnp.zeros((n,), jnp.int32), jnp.full((n,), -1, jnp.int32),
                  zeros_b, ones_b)
    zs.append(cam_v)
    for j in range(1, k):
        if j == 1:
            sa = _camera_pdf_sa(cam, e[0])
        else:
            # pdf of sampling e[j-1] at x_{j-1} (incoming from x_{j-2})
            sa = pdf_bsdf(scene, mats[j - 1], ng[j - 1], -e[j - 2], e[j - 1])
        pf = _convert_density(sa, pts[j - 1], pts[j], ng[j])
        # pdf_rev(z_j): written when the walk, at x_{j+1}, samples
        # e[j+1]; needs x_{j+2} to exist
        if j + 2 <= k - 1:
            rev_sa = pdf_bsdf(scene, mats[j + 1], ng[j + 1],
                              e[j + 1], -e[j])
            pr = _convert_density(rev_sa, pts[j + 1], pts[j], ng[j])
        else:
            pr = zeros1
        zs.append(_vert(pts[j], ng[j], wo[j], None, pf, pr,
                        mats[j], prims[j], delta[j], ones_b))

    # ---- light subpath: y_j = x_{k-1-j} ----
    # light-walk wo points toward the light-side predecessor = +e
    ys = []
    # y_0 pdf_rev: written at y_1 = x_{k-2} sampling toward y_2 = x_{k-3}
    if k - 3 >= 0:
        rev_sa = pdf_bsdf(scene, mats[k - 2], ng[k - 2],
                          -e[k - 3], e[k - 2])
        pr0 = _convert_density(rev_sa, pts[k - 2], pts[k - 1], ng[k - 1])
    else:
        pr0 = zeros1
    y0 = _vert(pts[k - 1], ng[k - 1], jnp.zeros((n, 3), jnp.float32), None,
               pdf_a, pr0, mats[k - 1], prims[k - 1], zeros_b, ones_b)
    ys.append(y0)
    for j in range(1, k - 1):
        i = k - 1 - j                       # path index of y_j
        if j == 1:
            cos_l = jnp.maximum(g.dot(ng[k - 1], -e[k - 2]), 0.0)
            sa = cos_l / _PI
        else:
            # at y_{j-1} = x_{i+1}: incoming from x_{i+2}, sampling -e[i]
            sa = pdf_bsdf(scene, mats[i + 1], ng[i + 1], e[i + 1], -e[i])
        pf = _convert_density(sa, pts[i + 1], pts[i], ng[i])
        if i - 2 >= 0:
            # pdf_rev(y_j): written at y_{j+1} = x_{i-1} sampling -e[i-2]
            rev_sa = pdf_bsdf(scene, mats[i - 1], ng[i - 1],
                              -e[i - 2], e[i - 1])
            pr = _convert_density(rev_sa, pts[i - 1], pts[i], ng[i])
        else:
            pr = zeros1
        ys.append(_vert(pts[i], ng[i], e[i], None, pf, pr,
                        mats[i], prims[i], delta[i], ones_b))
    return zs, ys


def _sum_weights(scene, k, n=64, seed=0, mirror_at=None, power=False):
    pts, ng, wo, mats, prims, pdf_a, e = _make_paths(
        scene, k, n, seed, mirror_at)
    zs, ys = _build_vertex_lists(scene, pts, ng, wo, mats, prims, pdf_a, e)
    total = jnp.zeros((n,), jnp.float32)
    for t in range(1, k + 1):
        s = k - t
        if s == 0 and t < 2:
            continue
        # unsamplable strategies: a connection endpoint on a delta vertex
        if mirror_at is not None and s >= 1:
            if t - 1 == mirror_at or k - s == mirror_at:
                continue
        w = _mis_weight(scene, scene.camera, ys, zs, s, t, power=power)
        total = total + w
    return np.asarray(total)


def test_bdpt_mis_weights_sum_to_one_all_diffuse():
    scene = cornell_box("boxes")
    for k, seed in ((3, 1), (4, 2), (5, 3), (6, 4)):
        tot = _sum_weights(scene, k, n=64, seed=seed)
        np.testing.assert_allclose(tot, 1.0, rtol=2e-3,
                                   err_msg=f"k={k}")


def test_bdpt_mis_weights_sum_to_one_with_mirror():
    """One interior vertex retagged MIRROR: strategies whose connection
    endpoint is the delta vertex are unsamplable; the remaining weights
    must still sum to 1 (delta-suppression flags in _mis_weight)."""
    scene = cornell_box("spheres")
    for k, m, seed in ((4, 1, 5), (4, 2, 6), (5, 2, 7), (5, 3, 8)):
        tot = _sum_weights(scene, k, n=64, seed=seed, mirror_at=m)
        np.testing.assert_allclose(tot, 1.0, rtol=2e-3,
                                   err_msg=f"k={k} mirror_at={m}")


def test_bdpt_mis_weights_sum_to_one_power_heuristic():
    """Round-4: the beta=2 power-heuristic option (BdptConfig.mis_power)
    must satisfy the same identity — every strategy weight becomes
    p_s^2 / sum_i p_i^2, whose sum over samplable strategies is 1."""
    scene = cornell_box("boxes")
    for k, seed in ((3, 11), (4, 12), (5, 13)):
        tot = _sum_weights(scene, k, n=64, seed=seed, power=True)
        np.testing.assert_allclose(tot, 1.0, rtol=2e-3,
                                   err_msg=f"k={k} power")
    scene = cornell_box("spheres")
    for k, m, seed in ((4, 1, 14), (5, 2, 15)):
        tot = _sum_weights(scene, k, n=64, seed=seed, mirror_at=m,
                           power=True)
        np.testing.assert_allclose(tot, 1.0, rtol=2e-3,
                                   err_msg=f"k={k} mirror_at={m} power")


def test_bdpt_power_heuristic_render_converges():
    """End-to-end: a power-heuristic BDPT render agrees with the balance
    render within MC noise (both unbiased, weights differ per stratum)."""
    from tputracer.api import render_bdpt
    from tputracer.config import BdptConfig

    scene = cornell_box("caustic")
    cfg = BdptConfig(width=12, height=12, spp=8, max_bounces=3,
                     chunk_size=12 * 12 * 8)
    a = np.asarray(render_bdpt(scene, cfg)[0])
    b = np.asarray(render_bdpt(scene, cfg.with_(mis_power=True))[0])
    assert np.isfinite(b).all()
    assert abs(a.mean() - b.mean()) / a.mean() < 0.06, (a.mean(), b.mean())
