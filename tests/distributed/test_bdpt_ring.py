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


def test_ring_2axis_mesh(scene):
    """Round-4: the connection ring generalizes to the (host, chip)
    2-axis mesh that dryrun_multichip uses — identical estimator, so it
    must equal the single-device emulation exactly."""
    mesh = make_mesh((2, 4), ("host", "chip"))
    img_ring = np.asarray(render_bdpt_ring(scene, CFG, mesh))

    n_total = CFG.width * CFG.height * CFG.spp
    uids = jnp.arange(n_total, dtype=jnp.uint32)
    L, splat = emulate_ring_bdpt(scene, uids, CFG, 8)
    img = film_from_radiance(L, CFG)
    splat_img = (np.asarray(splat) / n_total).reshape(
        CFG.height, CFG.width, 3)[::-1]
    ref = np.asarray(img) + splat_img
    np.testing.assert_allclose(img_ring, ref, rtol=2e-5, atol=1e-6)


def test_ring_per_pixel_matches_plain_bdpt(scene):
    """Round-4 (replaces the mean-only 5% check as the convergence
    gate): a spatially-structured ring bias — e.g. a wrong MIS weight
    only on cross-shard pairs — would pass a whole-image mean test.
    Compare per-pixel against plain BDPT at MATCHED total connection
    counts: ring at spp=S with P=8 partners does S*P connections per
    pixel, plain at spp=S*P the same.  Both are unbiased estimators of
    the same integrals, so their per-pixel deviations from a higher-spp
    reference must be statistically indistinguishable: the ring's
    deviation distribution may not be worse than plain's by more than
    the noise-of-noise margin, anywhere in the image."""
    S, P_ = 4, 8
    cfg = CFG.with_(spp=S)
    n = cfg.width * cfg.height * cfg.spp
    uids = jnp.arange(n, dtype=jnp.uint32)
    L, splat = emulate_ring_bdpt(scene, uids, cfg, P_)
    ring = np.asarray(film_from_radiance(L, cfg)) + (
        np.asarray(splat) / n).reshape(cfg.height, cfg.width, 3)[::-1]

    # SAME spp: ring shares plain's eye paths and s=0/t=1 strategies and
    # additionally averages each connection over P partner blocks — so
    # per-pixel deviations from a high-spp reference must be
    # statistically NO WORSE than plain's (a cross-shard-only bias would
    # push them above).  NOT matched-connection-count vs spp=S*P: that
    # would also scale down the eye-side variance ring leaves untouched.
    plain = np.asarray(render_bdpt(scene, cfg)[0])
    ref = np.asarray(render_bdpt(scene, CFG.with_(spp=64, seed=7))[0])

    dev_ring = np.abs(ring - ref)
    dev_plain = np.abs(plain - ref)
    s95r, s95p = (np.percentile(dev_ring, 95),
                  np.percentile(dev_plain, 95))
    assert s95r < 1.2 * s95p + 1e-3, (s95r, s95p)
    assert dev_ring.max() < 2.0 * dev_plain.max() + 1e-2, (
        dev_ring.max(), dev_plain.max())
    # and the mean still agrees (the old gate, tightened)
    assert abs(ring.mean() - ref.mean()) / ref.mean() < 0.05
