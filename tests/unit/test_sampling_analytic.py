"""Analytic-oracle unit tests for samplers and Fresnel (SURVEY.md §4
item 1 — the two prescriptions that were only covered transitively by
the golden renders until round 5: a chi-square test of the
cosine-hemisphere sampler's distribution, and the exact dielectric
Fresnel against closed forms / known identities).
"""

import numpy as np
import jax.numpy as jnp

from tputracer import geometry as g
from tputracer.bsdf.bsdf import _fresnel_dielectric


def test_cosine_hemisphere_chi_square():
    """Samples must follow p(θ, φ) = (cosθ/π) sinθ: chi-square over a
    stratified (cosθ-bin × φ-bin) grid.  CDF in z=cosθ: P(Z<=z) = z²
    under the cosine-weighted measure — bin edges are analytic."""
    rng = np.random.default_rng(9)
    n = 200_000
    u1 = jnp.asarray(rng.uniform(size=n).astype(np.float32))
    u2 = jnp.asarray(rng.uniform(size=n).astype(np.float32))
    d = np.asarray(g.cosine_sample_hemisphere(u1, u2))
    assert np.all(d[:, 2] >= 0.0)
    assert np.allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-5)

    kz, kp = 10, 8
    # z-bin edges from the inverse CDF z = sqrt(P): equal-probability bins
    z_edges = np.sqrt(np.linspace(0.0, 1.0, kz + 1))
    zi = np.clip(np.searchsorted(z_edges, d[:, 2], side="right") - 1,
                 0, kz - 1)
    phi = np.arctan2(d[:, 1], d[:, 0])
    pi_ = (np.clip(((phi + np.pi) / (2 * np.pi) * kp).astype(int),
                   0, kp - 1))
    counts = np.zeros((kz, kp))
    np.add.at(counts, (zi, pi_), 1)
    expected = n / (kz * kp)          # equal-probability stratification
    chi2 = float(((counts - expected) ** 2 / expected).sum())
    dof = kz * kp - 1                 # 79; P(chi2 > 150) ~ 1e-6
    assert chi2 < 150.0, (chi2, dof)


def test_cosine_hemisphere_moments():
    """E[cosθ] = 2/3 and E[cos²θ] = 1/2 under pdf = cosθ/π."""
    rng = np.random.default_rng(10)
    n = 400_000
    u1 = jnp.asarray(rng.uniform(size=n).astype(np.float32))
    u2 = jnp.asarray(rng.uniform(size=n).astype(np.float32))
    z = np.asarray(g.cosine_sample_hemisphere(u1, u2))[:, 2]
    assert abs(z.mean() - 2.0 / 3.0) < 2e-3
    assert abs((z**2).mean() - 0.5) < 2e-3


def test_fresnel_normal_incidence_closed_form():
    """F(0°) = ((n1 - n2)/(n1 + n2))² exactly."""
    for n1, n2 in ((1.0, 1.5), (1.5, 1.0), (1.0, 2.4), (1.33, 1.0)):
        f, cos_t, tir = _fresnel_dielectric(
            jnp.float32(1.0), jnp.float32(n1), jnp.float32(n2))
        assert not bool(tir)
        expect = ((n1 - n2) / (n1 + n2)) ** 2
        np.testing.assert_allclose(float(f), expect, rtol=1e-6)
        np.testing.assert_allclose(float(cos_t), 1.0, atol=1e-5)


def test_fresnel_brewster_and_tir():
    """At Brewster's angle the parallel component vanishes:
    F = r_perp²/2 with r_perp = -cos(2θ_B) for n1=1.  Past the critical
    angle (sinθ > n2/n1 going dense->rare) reflectance is exactly 1."""
    n2 = 1.5
    theta_b = np.arctan(n2)           # Brewster, n1 = 1
    f, _, tir = _fresnel_dielectric(
        jnp.float32(np.cos(theta_b)), jnp.float32(1.0), jnp.float32(n2))
    r_perp = np.cos(2 * theta_b)      # |r_perp| at Brewster for n1=1
    np.testing.assert_allclose(float(f), 0.5 * r_perp**2, rtol=1e-5)
    assert not bool(tir)

    # dense -> rare beyond the critical angle: TIR, F = 1
    theta_c = np.arcsin(1.0 / n2)
    f, _, tir = _fresnel_dielectric(
        jnp.float32(np.cos(theta_c * 1.05)), jnp.float32(n2),
        jnp.float32(1.0))
    assert bool(tir) and float(f) == 1.0


def test_fresnel_snell_consistency_and_energy():
    """cos_t must satisfy Snell (n1 sinθ_i = n2 sinθ_t) and F ∈ [0, 1]
    across a dense sweep of angles and index pairs."""
    cos_i = jnp.asarray(np.linspace(0.01, 1.0, 200, dtype=np.float32))
    for n1, n2 in ((1.0, 1.5), (1.5, 1.0), (1.0, 2.4)):
        f, cos_t, tir = _fresnel_dielectric(
            cos_i, jnp.float32(n1), jnp.float32(n2))
        f, cos_t, tir = map(np.asarray, (f, cos_t, tir))
        assert np.all((f >= 0.0) & (f <= 1.0))
        ok = ~tir
        sin_i = np.sqrt(1.0 - np.asarray(cos_i)[ok] ** 2)
        sin_t = np.sqrt(np.maximum(1.0 - cos_t[ok] ** 2, 0.0))
        np.testing.assert_allclose(n1 * sin_i, n2 * sin_t, atol=2e-4)
        # reciprocity of the interface: F(θ_i; n1→n2) == F(θ_t; n2→n1)
        f_rev, _, _ = _fresnel_dielectric(
            jnp.asarray(cos_t[ok]), jnp.float32(n2), jnp.float32(n1))
        np.testing.assert_allclose(f[ok], np.asarray(f_rev), atol=2e-4)
