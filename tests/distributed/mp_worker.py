"""Worker process for the multi-process distributed tests.

Launched by test_multiprocess.py, N processes x 4 virtual CPU devices
each.  Modes:
  render — sharded render over the global mesh; prints the image mean
  fit    — inverse-rendering loop with per-step checkpoints; prints one
           loss line per step; optionally crashes (process --crash-at)
           to drive the fault drill of SURVEY.md §5.
"""

import argparse
import json
import os
import sys

# must happen before any jax import: each worker contributes 4 virtual
# CPU devices to the global mesh (strip any inherited count flag first)
_flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
          if "xla_force_host_platform_device_count" not in f]
_flags.append("--xla_force_host_platform_device_count=4")
os.environ["XLA_FLAGS"] = " ".join(_flags)
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", required=True,
                    choices=["render", "fit", "bdpt_fit"])
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--crash-at", type=int, default=-1)
    ap.add_argument("--checkpoint", default=None)
    args = ap.parse_args()

    from tputracer.dist.launch import initialize, replicate_global

    initialize(args.coordinator, args.num_processes, args.process_id)
    assert len(jax.local_devices()) == 4
    assert len(jax.devices()) == 4 * args.num_processes

    import optax

    from tputracer.config import RenderConfig
    from tputracer.dist import fit_step_sharded, make_mesh, render_sharded
    from tputracer.fit import load_checkpoint, save_checkpoint
    from tputracer.scene import cornell_box

    mesh = make_mesh()          # all global devices on one axis
    scene = cornell_box("boxes")
    cfg = RenderConfig(width=16, height=16, spp=2, max_bounces=2,
                       rr_start=1, chunk_size=16 * 16 * 2)
    scene_g = replicate_global(scene, mesh)

    if args.mode == "render":
        img, _ = render_sharded(scene_g, cfg, mesh)
        mean = float(jnp.mean(img))   # replicated scalar: local read
        print(json.dumps({"mode": "render", "pid": args.process_id,
                          "mean": mean}), flush=True)
        return

    if args.mode == "bdpt_fit":
        # round-5: one sharded BDPT fit step on the real 2-process
        # cluster — the t=1 splat psum crosses the process boundary in
        # both the forward and the backward pass
        from tputracer.config import BdptConfig
        from tputracer.dist import fit_step_bdpt_sharded, \
            render_bdpt_sharded

        bcfg = BdptConfig(width=16, height=16, spp=2, max_bounces=2,
                          chunk_size=16 * 16 * 2)
        target = render_bdpt_sharded(scene_g, bcfg, mesh)
        params = {"mat_albedo": scene.mat_albedo * 0.6}
        params = replicate_global(params, mesh)
        loss, grads = fit_step_bdpt_sharded(
            scene_g.replace(**params), params, target, bcfg, mesh)
        print(json.dumps({
            "mode": "bdpt_fit", "pid": args.process_id,
            "loss": float(loss),
            "grad_sum": float(sum(jnp.sum(g)
                                  for g in jax.tree.leaves(grads))),
        }), flush=True)
        return

    # ---- fit with per-step checkpointing + optional crash ----
    target, _ = render_sharded(scene_g, cfg, mesh)
    params = {"mat_albedo": scene.mat_albedo * 0.5}
    params = replicate_global(params, mesh)
    opt = optax.adam(1e-1)
    opt_state = opt.init(params)
    start = 0
    if args.checkpoint and os.path.exists(args.checkpoint):
        start, params, opt_state = load_checkpoint(
            args.checkpoint, params, opt_state)
        params = replicate_global(params, mesh)
        opt_state = replicate_global(opt_state, mesh)

    @jax.jit
    def update(params, grads, opt_state):
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    for step in range(start, args.steps):
        if step == args.crash_at and args.process_id == 1:
            os._exit(42)        # simulated host failure mid-fit
        sc = scene_g.replace(**params)
        loss, grads = fit_step_sharded(sc, params, target, cfg, mesh)
        params, opt_state = update(params, grads, opt_state)
        print(json.dumps({"mode": "fit", "pid": args.process_id,
                          "step": step, "loss": float(loss)}), flush=True)
        if args.checkpoint and args.process_id == 0:
            save_checkpoint(args.checkpoint, step + 1, params, opt_state)
    p_final = float(jnp.sum(params["mat_albedo"]))
    print(json.dumps({"mode": "fit_done", "pid": args.process_id,
                      "albedo_sum": p_final}), flush=True)


if __name__ == "__main__":
    main()
