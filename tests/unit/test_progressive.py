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
