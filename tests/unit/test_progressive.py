"""Progressive rendering + film checkpoint/resume (SURVEY.md §5)."""

import numpy as np

from tputracer.api import render, render_progressive
from tputracer.config import RenderConfig
from tputracer.scene import cornell_box

CFG = RenderConfig(width=8, height=8, spp=8, max_bounces=2, rr_start=1,
                   seed=4, chunk_size=8 * 8 * 8)


def test_progressive_matches_single_shot():
    scene = cornell_box("boxes")
    ref, _ = render(scene, CFG)
    img, done = render_progressive(scene, CFG, spp_per_pass=3)
    assert done == CFG.spp
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref),
                               rtol=1e-5, atol=1e-7)


def test_progressive_resume_reproduces(tmp_path):
    scene = cornell_box("boxes")
    ck = str(tmp_path / "film.npz")
    # run only the first pass, "die", then resume
    calls = []

    def die_after_one(done, _):
        calls.append(done)
        if len(calls) == 1:
            raise KeyboardInterrupt

    try:
        render_progressive(scene, CFG, spp_per_pass=2, checkpoint_path=ck,
                           callback=die_after_one)
    except KeyboardInterrupt:
        pass
    img, done = render_progressive(scene, CFG, spp_per_pass=2,
                                   checkpoint_path=ck)
    ref, _ = render(scene, CFG)
    assert done == CFG.spp
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref),
                               rtol=1e-5, atol=1e-7)


def test_progressive_bdpt_matches_single_shot():
    """Round-5: progressive BDPT — pass-split accumulation (incl. the
    t=1 splat film scaled into the same accumulator) must reproduce the
    single-shot render_bdpt."""
    from tputracer.api import render_bdpt, render_bdpt_progressive
    from tputracer.config import BdptConfig

    scene = cornell_box("boxes")
    cfg = BdptConfig(width=8, height=8, spp=6, max_bounces=2, seed=4,
                     chunk_size=8 * 8 * 6)
    ref, _ = render_bdpt(scene, cfg)
    img, done = render_bdpt_progressive(scene, cfg, spp_per_pass=4)
    assert done == cfg.spp
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref),
                               rtol=1e-5, atol=1e-7)


def test_progressive_bdpt_resume_reproduces(tmp_path):
    from tputracer.api import render_bdpt, render_bdpt_progressive
    from tputracer.config import BdptConfig

    scene = cornell_box("caustic")
    cfg = BdptConfig(width=8, height=8, spp=4, max_bounces=2, seed=1,
                     chunk_size=8 * 8 * 4)
    ck = str(tmp_path / "bdpt_film.npz")
    calls = []

    def die_after_one(done, _):
        calls.append(done)
        if len(calls) == 1:
            raise KeyboardInterrupt

    try:
        render_bdpt_progressive(scene, cfg, spp_per_pass=2,
                                checkpoint_path=ck,
                                callback=die_after_one)
    except KeyboardInterrupt:
        pass
    img, done = render_bdpt_progressive(scene, cfg, spp_per_pass=2,
                                        checkpoint_path=ck)
    ref, _ = render_bdpt(scene, cfg)
    assert done == cfg.spp
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref),
                               rtol=1e-5, atol=1e-7)
