"""Ring-connection BDPT tests on the 8-virtual-CPU-device mesh
(SURVEY.md §2 SP row, §5 long-context analogue).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tputracer.api import render_bdpt
from tputracer.config import BdptConfig
from tputracer.dist import make_mesh, render_bdpt_ring
from tputracer.dist.bdpt_ring import emulate_ring_bdpt
from tputracer.integrators.pt import film_from_radiance
from tputracer.scene import cornell_box

CFG = BdptConfig(width=16, height=16, spp=2, max_bounces=3,
                 chunk_size=16 * 16 * 2)


@pytest.fixture(scope="module")
def scene():
    return cornell_box("caustic")


def test_ring_matches_single_device_emulation(scene):
    """The sharded ring (ppermute light blocks) must equal the
    single-device emulation (jnp.roll light blocks) — same pairings,
    same arithmetic."""
    assert len(jax.devices()) >= 8
    mesh = make_mesh((8,), ("dp",))
    img_ring = np.asarray(render_bdpt_ring(scene, CFG, mesh))

    n_total = CFG.width * CFG.height * CFG.spp
    uids = jnp.arange(n_total, dtype=jnp.uint32)
    L, splat = emulate_ring_bdpt(scene, uids, CFG, 8)
    img = film_from_radiance(L, CFG)
    splat_img = (np.asarray(splat) / n_total).reshape(
        CFG.height, CFG.width, 3)[::-1]
    ref = np.asarray(img) + splat_img
    np.testing.assert_allclose(img_ring, ref, rtol=2e-5, atol=1e-6)


def test_ring_converges_to_plain_bdpt(scene):
    """P-partner connection averaging estimates the same integrals as
    plain BDPT: image means agree within MC noise at moderate spp."""
    cfg = CFG.with_(spp=8)
    mesh = make_mesh((8,), ("dp",))
    a = float(np.asarray(render_bdpt_ring(scene, cfg, mesh)).mean())
    b = float(np.asarray(render_bdpt(scene, cfg)[0]).mean())
    assert abs(a - b) / b < 0.05, (a, b)
