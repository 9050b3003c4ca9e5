"""Furnace test (SURVEY.md §4 item 2): exact analytic oracle.

Camera inside a uniformly emissive enclosure (radiance L) looking at a
convex diffuse sphere (albedo rho).  A convex body never sees itself, so
its exitant radiance under uniform illumination is EXACTLY rho * L —
one NEE estimate per path already has the right expectation, and any
energy bug (pdf, cosine, 1/pi, double counting) shifts the mean.
Background pixels hit the emitter directly and must equal L exactly.
"""

import numpy as np

from tputracer.api import render
from tputracer.config import RenderConfig
from tputracer.scene import furnace


def test_furnace_energy():
    rho, L = 0.6, 1.0
    scene = furnace(albedo=rho, emission=L)
    cfg = RenderConfig(width=16, height=16, spp=128, max_bounces=2,
                       rr_start=99, seed=3, chunk_size=1 << 15)
    img = np.asarray(render(scene, cfg)[0])

    # central pixels view the sphere (camera at z=-4, r=1 sphere at origin,
    # 40 deg vfov -> the sphere spans ~70% of the frame; the middle 6/16
    # band is safely inside it)
    c = img[5:11, 5:11].mean()
    np.testing.assert_allclose(c, rho * L, rtol=0.02)
    # corner pixels see the emissive wall directly: exactly L
    corners = np.stack([img[0, 0], img[0, -1], img[-1, 0], img[-1, -1]])
    np.testing.assert_allclose(corners, L, rtol=1e-5)
