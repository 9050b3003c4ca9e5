"""True multi-process distributed tests (SURVEY.md §2 comm-backend row,
§5 failure detection): 2 OS processes x 4 virtual CPU devices each join
one 8-device cluster via jax.distributed.initialize, render/fit over the
global mesh, and survive a mid-fit host kill via checkpoint resume.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "mp_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _spawn(mode, port, pid, nprocs=2, timeout=420, **kw):
    cmd = [sys.executable, _WORKER, "--mode", mode,
           "--coordinator", f"127.0.0.1:{port}",
           "--num-processes", str(nprocs), "--process-id", str(pid)]
    for k, v in kw.items():
        cmd += [f"--{k.replace('_', '-')}", str(v)]
    env = dict(os.environ)
    return subprocess.Popen(cmd, env=env, stdout=subprocess.PIPE,
                            stderr=subprocess.PIPE, text=True)


def _run_cluster(mode, nprocs=2, timeout=420, **kw):
    port = _free_port()
    procs = [_spawn(mode, port, i, nprocs, **kw) for i in range(nprocs)]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=timeout)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    return outs


def _parse(out):
    return [json.loads(line) for line in out.splitlines()
            if line.startswith("{")]


def test_multiprocess_render_matches_single_process():
    """2-process 8-device cluster render == in-process 8-device render."""
    outs = _run_cluster("render")
    for rc, out, err in outs:
        assert rc == 0, err[-2000:]
    means = [
        r["mean"] for rc, out, _ in outs for r in _parse(out)
        if r["mode"] == "render"
    ]
    assert len(means) == 2
    assert means[0] == means[1]

    # in-process reference on this test's own 8 virtual devices
    from tputracer.api import render
    from tputracer.config import RenderConfig
    from tputracer.scene import cornell_box

    cfg = RenderConfig(width=16, height=16, spp=2, max_bounces=2,
                       rr_start=1, chunk_size=16 * 16 * 2)
    ref = float(np.asarray(render(cornell_box("boxes"), cfg)[0]).mean())
    np.testing.assert_allclose(means[0], ref, rtol=1e-6)


def test_multiprocess_fit_fault_drill(tmp_path):
    """SURVEY.md §5 failure drill: kill process 1 mid-fit; resume from
    the checkpoint; the trajectory must reproduce the uninterrupted run
    (per-step RNG is keyed by uid/step, not wall clock)."""
    steps = 6

    # uninterrupted reference (no checkpointing)
    outs = _run_cluster("fit", steps=steps)
    for rc, _, err in outs:
        assert rc == 0, err[-2000:]
    ref = {r["step"]: r["loss"] for r in _parse(outs[0][1])
           if r["mode"] == "fit"}
    ref_final = [r["albedo_sum"] for r in _parse(outs[0][1])
                 if r["mode"] == "fit_done"][0]
    assert len(ref) == steps

    # crashed run: process 1 dies at step 3 -> kill the survivor too
    ck = str(tmp_path / "fit_mp.npz")
    port = _free_port()
    procs = [_spawn("fit", port, i, steps=steps, crash_at=3, checkpoint=ck)
             for i in range(2)]
    out1, _ = procs[1].communicate(timeout=420)
    assert procs[1].returncode == 42          # simulated host failure
    procs[0].kill()
    procs[0].communicate()
    assert os.path.exists(ck)

    # resume: fresh 2-process cluster continues from the checkpoint
    outs = _run_cluster("fit", steps=steps, checkpoint=ck)
    for rc, _, err in outs:
        assert rc == 0, err[-2000:]
    rec = _parse(outs[0][1])
    resumed = {r["step"]: r["loss"] for r in rec if r["mode"] == "fit"}
    res_final = [r["albedo_sum"] for r in rec if r["mode"] == "fit_done"][0]
    assert min(resumed) == 3                  # picked up where it left off
    for s in resumed:
        np.testing.assert_allclose(resumed[s], ref[s], rtol=1e-5,
                                   err_msg=f"step {s}")
    np.testing.assert_allclose(res_final, ref_final, rtol=1e-6)


def test_multiprocess_bdpt_fit_matches_in_process():
    """Round-5: the sharded BDPT fit step on a REAL 2-process cluster —
    the splat psum and the gradient psum cross the process boundary —
    must agree across processes and match the in-process 8-device
    result (placement-invariant RNG)."""
    outs = _run_cluster("bdpt_fit")
    for rc, _, err in outs:
        assert rc == 0, err[-2000:]
    recs = [r for rc, out, _ in outs for r in _parse(out)
            if r["mode"] == "bdpt_fit"]
    assert len(recs) == 2
    assert recs[0]["loss"] == recs[1]["loss"]
    assert recs[0]["grad_sum"] == recs[1]["grad_sum"]

    # in-process reference on this test's own 8 virtual devices
    import jax.numpy as jnp

    from tputracer.config import BdptConfig
    from tputracer.dist import (fit_step_bdpt_sharded, make_mesh,
                                render_bdpt_sharded)
    from tputracer.scene import cornell_box

    scene = cornell_box("boxes")
    bcfg = BdptConfig(width=16, height=16, spp=2, max_bounces=2,
                      chunk_size=16 * 16 * 2)
    mesh = make_mesh((8,), ("dp",))
    target = render_bdpt_sharded(scene, bcfg, mesh)
    params = {"mat_albedo": scene.mat_albedo * 0.6}
    loss, grads = fit_step_bdpt_sharded(
        scene.replace(**params), params, target, bcfg, mesh)
    np.testing.assert_allclose(recs[0]["loss"], float(loss), rtol=1e-6)
    gs = float(sum(jnp.sum(g) for g in grads.values()))
    np.testing.assert_allclose(recs[0]["grad_sum"], gs, rtol=1e-5)
