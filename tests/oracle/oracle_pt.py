"""Pure-NumPy per-path recursive oracle path tracer (SURVEY.md §4 item 2).

Deliberately simple and slow — trusted by inspection.  It mirrors the
wavefront integrator's *semantics* (same RNG streams via rng.uniform3_np,
same eps, same NEE/RR conventions from SURVEY.md §3.2) but is an
independent implementation: scalar recursion instead of a wavefront,
Moeller-Trumbore instead of Pluecker matmuls.  Golden tests compare the
two renders near-exactly.
"""

from __future__ import annotations

import numpy as np

from tputracer.rng import (
    SLOT_BSDF,
    SLOT_CAMERA,
    SLOT_LIGHT,
    SLOT_RR,
    salt,
    uniform3_np,
)
from tputracer.scene.types import DIFFUSE, GLASS, MIRROR

BIG = 3.0e38


class NpScene:
    """NumPy view of a tputracer Scene pytree (valid triangles only)."""

    def __init__(self, scene):
        T = scene.n_tris
        self.v0 = np.asarray(scene.tri_v0)[:T]
        self.e1 = np.asarray(scene.tri_e1)[:T]
        self.e2 = np.asarray(scene.tri_e2)[:T]
        self.n = np.asarray(scene.tri_n)[:T]
        self.tri_mat = np.asarray(scene.tri_mat)[:T]
        self.sph_c = np.asarray(scene.sph_c)
        self.sph_r = np.asarray(scene.sph_r)
        self.sph_mat = np.asarray(scene.sph_mat)
        self.kind = np.asarray(scene.mat_kind)
        self.albedo = np.asarray(scene.mat_albedo)
        self.emission = np.asarray(scene.mat_emission)
        self.ior = np.asarray(scene.mat_ior)
        self.emit_prim = np.asarray(scene.emit_prim)
        self.emit_area = np.asarray(scene.emit_area)
        self.cam_o = np.asarray(scene.camera.o)
        self.cam_corner = np.asarray(scene.camera.corner)
        self.cam_du = np.asarray(scene.camera.du)
        self.cam_dv = np.asarray(scene.camera.dv)
        self.eps = np.float32(scene.eps)
        self.n_tri_pad = scene.n_tri_pad


def intersect_np(sc: NpScene, o, d, tmin, tmax):
    """Closest hit via vectorized Moeller-Trumbore + sphere quadratic.

    Returns (t, prim, p, n, mat, valid); prim uses the same id space as
    the device intersector (tris [0,Tp), spheres Tp+i).
    """
    best_t, best_prim = tmax, -1
    # triangles
    h = np.cross(d[None, :], sc.e2)
    a = np.einsum("tk,tk->t", sc.e1, h)
    ok = np.abs(a) > 1e-12
    f = np.where(ok, 1.0 / np.where(ok, a, 1.0), 0.0)
    s = o[None, :] - sc.v0
    u = f * np.einsum("tk,tk->t", s, h)
    q = np.cross(s, sc.e1)
    v = f * (d[None, :] * q).sum(1)
    t = f * np.einsum("tk,tk->t", sc.e2, q)
    hit = ok & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > tmin) & (t < best_t)
    if hit.any():
        i = np.argmin(np.where(hit, t, BIG))
        best_t, best_prim = t[i], int(i)
    # spheres
    for j in range(len(sc.sph_r)):
        oc = o - sc.sph_c[j]
        b = float(np.dot(oc, d))
        c = float(np.dot(oc, oc)) - float(sc.sph_r[j]) ** 2
        disc = b * b - c
        if disc <= 0:
            continue
        sq = np.sqrt(disc)
        tj = -b - sq
        if tj <= tmin:
            tj = -b + sq
        if tmin < tj < best_t:
            best_t, best_prim = tj, sc.n_tri_pad + j
    if best_prim < 0:
        return BIG, -1, None, None, 0, False
    p = o + best_t * d
    if best_prim < sc.n_tri_pad:
        n = sc.n[best_prim]
        n = n / np.linalg.norm(n)
        mat = int(sc.tri_mat[best_prim])
    else:
        j = best_prim - sc.n_tri_pad
        n = (p - sc.sph_c[j]) / sc.sph_r[j]
        mat = int(sc.sph_mat[j])
    return float(best_t), best_prim, p, n, mat, True


def occluded_np(sc, o, d, tmax):
    t, prim, *_ , valid = intersect_np(sc, o, d, 0.0, tmax)
    return valid


def _fresnel(cos_i, eta_i, eta_t):
    sin2_t = (eta_i / eta_t) ** 2 * max(1.0 - cos_i * cos_i, 0.0)
    if sin2_t >= 1.0:
        return 1.0, 0.0, True
    cos_t = np.sqrt(1.0 - sin2_t)
    r_par = (eta_t * cos_i - eta_i * cos_t) / (eta_t * cos_i + eta_i * cos_t)
    r_per = (eta_i * cos_i - eta_t * cos_t) / (eta_i * cos_i + eta_t * cos_t)
    return 0.5 * (r_par**2 + r_per**2), cos_t, False


def _onb(n):
    s = 1.0 if n[2] >= 0 else -1.0
    a = -1.0 / (s + n[2])
    b = n[0] * n[1] * a
    t = np.array([1.0 + s * n[0] ** 2 * a, s * b, -s * n[0]])
    bt = np.array([b, s + n[1] ** 2 * a, -n[1]])
    return t, bt


def _power2(a, b):
    """Power heuristic (beta=2) — mirrors integrators.pt._power2."""
    a2 = a * a
    return a2 / max(a2 + b * b, 1e-20)


def pdf_light_area_np(sc: NpScene, prim):
    """Area pdf of sampling emissive triangle `prim` (0 if not an emitter).

    Mirrors tputracer.lights.pdf_light_area.
    """
    E = len(sc.emit_prim)
    for i, ep in enumerate(sc.emit_prim):
        if int(ep) == prim:
            return 1.0 / (float(sc.emit_area[i]) * E)
    return 0.0


def trace_path(sc: NpScene, uid, cfg):
    seed = cfg.seed
    spp, W = cfg.spp, cfg.width
    pix = uid // spp
    px, py = pix % W, pix // W
    j0, j1, _ = (x[()] for x in uniform3_np(np.uint32(uid), salt(0, SLOT_CAMERA), seed))
    u = (px + j0) / W
    v = (py + j1) / cfg.height
    d = sc.cam_corner + u * sc.cam_du + v * sc.cam_dv - sc.cam_o
    d = d / np.linalg.norm(d)
    o = sc.cam_o.copy()

    L = np.zeros(3)
    thr = np.ones(3)
    prev_delta = True
    prev_pdf = 0.0            # solid-angle pdf of the previous BSDF sample
    mis = getattr(cfg, "mis", False)
    for b in range(cfg.max_bounces + 1):
        t, prim, p, n, mat, valid = intersect_np(sc, o, d, 0.0, BIG)
        if not valid:
            break
        if np.dot(d, n) < 0:   # one-sided emission (front face)
            if mis and b > 0:
                # power-heuristic weight of the BSDF-sampling strategy vs
                # NEE for this emitter hit (integrators.pt, cfg.mis=True)
                if prev_delta:
                    w_hit = 1.0
                else:
                    pl_a = pdf_light_area_np(sc, prim)
                    cos_l = abs(float(np.dot(n, d)))
                    pl_sa = pl_a * t * t / max(cos_l, 1e-6)
                    w_hit = _power2(prev_pdf, pl_sa)
            else:
                w_hit = 1.0 if prev_delta else 0.0
            L = L + thr * sc.emission[mat] * w_hit
        if b == cfg.max_bounces:
            break
        wo = -d
        ns = n if np.dot(n, wo) >= 0 else -n

        # NEE
        ul0, ul1, ul2 = (x[()] for x in uniform3_np(np.uint32(uid), salt(b, SLOT_LIGHT), seed))
        E = len(sc.emit_prim)
        li = min(int(ul0 * E), E - 1)
        lp = sc.emit_prim[li]
        su = np.sqrt(ul1)
        b1, b2 = 1.0 - su, ul2 * su
        y = sc.v0[lp] + b1 * sc.e1[lp] + b2 * sc.e2[lp]
        n_l = sc.n[lp] / np.linalg.norm(sc.n[lp])
        to_l = y - p
        dist2 = max(float(np.dot(to_l, to_l)), 1e-12)
        dist = np.sqrt(dist2)
        wi_l = to_l / dist
        cos_p = float(np.dot(wi_l, ns))
        cos_l = float(np.dot(n_l, -wi_l))
        if sc.kind[mat] == DIFFUSE and cos_p > 0 and cos_l > 1e-6 and np.dot(wo, ns) > 0:
            so = p + ns * sc.eps
            if not occluded_np(sc, so, wi_l, dist * (1.0 - 1e-3)):
                pdf_a = 1.0 / (sc.emit_area[li] * E)
                pdf_sa = pdf_a * dist2 / max(cos_l, 1e-6)
                f = sc.albedo[mat] / np.pi
                le = sc.emission[sc.tri_mat[lp]]
                if mis:
                    pb = max(cos_p, 0.0) / np.pi   # diffuse sampling pdf
                    w_nee = _power2(pdf_sa, pb)
                else:
                    w_nee = 1.0
                L = L + thr * f * le * (w_nee * cos_p / pdf_sa)

        # BSDF sample
        ub0, ub1, ub2 = (x[()] for x in uniform3_np(np.uint32(uid), salt(b, SLOT_BSDF), seed))
        kind = sc.kind[mat]
        if kind == DIFFUSE:
            r = np.sqrt(ub1)
            phi = 2 * np.pi * ub2
            local = np.array([r * np.cos(phi), r * np.sin(phi),
                              np.sqrt(max(1.0 - ub1, 0.0))])
            tt, bb = _onb(ns)
            wi = local[0] * tt + local[1] * bb + local[2] * ns
            thr = thr * sc.albedo[mat]
            prev_delta = False
            prev_pdf = max(float(np.dot(wi, ns)), 0.0) / np.pi
        elif kind == MIRROR:
            wi = 2.0 * np.dot(wo, ns) * ns - wo
            thr = thr * sc.albedo[mat]
            prev_delta = True
            prev_pdf = 0.0
        else:  # GLASS
            entering = np.dot(wo, n) > 0
            ior = float(sc.ior[mat])
            eta_i, eta_t = (1.0, ior) if entering else (ior, 1.0)
            cos_i = abs(float(np.dot(wo, ns)))
            fr, cos_t, tir = _fresnel(cos_i, eta_i, eta_t)
            eta = eta_i / eta_t
            if ub0 < fr or tir:
                wi = 2.0 * np.dot(wo, ns) * ns - wo
                thr = thr * sc.albedo[mat]
            else:
                wi = -eta * wo + (eta * cos_i - cos_t) * ns
                wi = wi / np.linalg.norm(wi)
                scale = eta**2 if cfg.transport_radiance else 1.0
                thr = thr * sc.albedo[mat] * scale
            prev_delta = True
            prev_pdf = 0.0

        # Russian roulette
        if b >= cfg.rr_start:
            ur, _, _ = (x[()] for x in uniform3_np(np.uint32(uid), salt(b, SLOT_RR), seed))
            qq = float(np.clip(np.max(thr), 0.05, 0.95))
            if not (ur < qq):
                break
            thr = thr / qq

        side = 1.0 if np.dot(wi, n) >= 0 else -1.0
        o = p + n * side * sc.eps
        d = wi
        if np.max(thr) <= 0:
            break
    return L


def oracle_render(scene, cfg):
    """(H,W,3) image, row 0 = top — matches integrators.pt.render_pt layout."""
    sc = NpScene(scene)
    n = cfg.width * cfg.height * cfg.spp
    L = np.zeros((n, 3))
    for uid in range(n):
        L[uid] = trace_path(sc, uid, cfg)
    img = L.reshape(cfg.height, cfg.width, cfg.spp, 3).mean(axis=2)
    return img[::-1]
