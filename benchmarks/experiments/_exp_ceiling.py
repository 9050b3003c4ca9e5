"""Round-5: ceiling measurement for the mesh-traversal gate (>=30M?).

Question: can ANY redistribution-based scheme (pair-expansion with the
glue fused on-chip, K-pass ray-major re-sorts, per-cluster queues...)
reach 30M flat rays/s end-to-end on the config-3 mesh bench — or is the
gate above the architecture's ceiling?

Method: run the REAL end-to-end mesh bench (full wavefront pipeline,
compaction, NEE, RR) against an instrumented union-walk kernel whose
per-subtile cluster-visit loop is CAPPED at V visits.  The capped
backend does STRICTLY LESS WORK than any correct traversal scheme:

  * same dense slab admission (measured VPU-roofline across 4
    formulations — every scheme pays it);
  * at most V cluster visits per 64-ray subtile, vs the ~2.5 admitted
    clusters PER RAY a perfect-utilization scheme must test (a
    perfectly bucketed scheme at K~2.5 does ~2.5 visits-worth of dense
    MT per 64 rays — so V=3 is at least perfect-utilization cheap);
  * ZERO redistribution cost (no sort, no gather, no scatter — the
    pair scheme's fused glue could never be cheaper than free);
  * rays whose hit lands in an unvisited cluster MISS and die early,
    shrinking downstream work below any correct run's.

So throughput(capped V=3) is a hard UPPER bound on throughput of any
correct scheme with perfect work distribution.  V=0 (slab only) bounds
the admission+pipeline floor by itself.

Run on the real chip: python benchmarks/experiments/_exp_ceiling.py
Findings go into traverse_tpu.py's docstring + BASELINE.md (the gate
decision) and this directory's README.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tputracer.accel.bruteforce import finalize_hit
from tputracer.accel.clustered import _detach
from tputracer.accel.traverse_tpu import TILE, SUB, slab_te, mt_cluster_block
from tputracer.config import RenderConfig
from tputracer.integrators.pt import film_from_radiance, trace_chunked
from tputracer.scene import mesh_scene

_BIG = 3.0e38


def _capped_tile(o_ref, d_ref, rs, tmin, tmax, cmin_ref, cmax_ref,
                 v0_ref, e1_ref, e2_ref, mask_ref, bt_out, bp_out,
                 te_scr, score_scr, *, leaf, any_hit, cap):
    BIG = 3.0e38
    C = cmin_ref.shape[1]
    te_scr[:] = slab_te(o_ref, d_ref, rs, tmin, tmax, cmin_ref, cmax_ref)
    if cap == 0:
        return
    iota_c = lax.broadcasted_iota(jnp.int32, (1, C), 1)
    adm = jnp.where(te_scr[:] < bt_out[rs], te_scr[:], BIG)
    score_scr[:] = jnp.min(adm, axis=0, keepdims=True)

    def pick():
        row = score_scr[:]
        return (jnp.argmin(row[0]).astype(jnp.int32), jnp.min(row))

    def body(state):
        k, c, _ = state
        score_scr[:] = jnp.where(iota_c == c, BIG, score_scr[:])
        bt = bt_out[rs]
        th, j = mt_cluster_block(o_ref, d_ref, rs, v0_ref, e1_ref, e2_ref,
                                 mask_ref, c, tmin, bt, leaf)
        imp = th < bt
        bt_out[rs] = jnp.where(imp, -BIG if any_hit else th, bt)
        bp_out[rs] = jnp.where(imp, c * leaf + j, bp_out[rs])
        nc, nv = pick()
        return k + 1, nc, nv

    c0, val0 = pick()
    lax.while_loop(lambda s: (s[0] < cap) & (s[2] < BIG), body,
                   (jnp.int32(0), c0, val0))


def _capped_kernel(o_ref, d_ref, tmin_ref, tmax_ref, bt0_ref, bp0_ref,
                   cmin_hbm, cmax_hbm, v0_hbm, e1_hbm, e2_hbm, mask_hbm,
                   bt_out, bp_out, te_scr, score_scr,
                   cmin_ref, cmax_ref, v0_ref, e1_ref, e2_ref, mask_ref,
                   sem, *, leaf, any_hit, cap):
    @pl.when(pl.program_id(0) == 0)
    def _load():
        for src, dst in ((cmin_hbm, cmin_ref), (cmax_hbm, cmax_ref),
                         (v0_hbm, v0_ref), (e1_hbm, e1_ref),
                         (e2_hbm, e2_ref), (mask_hbm, mask_ref)):
            cp = pltpu.make_async_copy(src, dst, sem)
            cp.start()
            cp.wait()

    bt_out[:] = bt0_ref[:]
    bp_out[:] = bp0_ref[:]
    for s in range(SUB):
        rs = slice(s * TILE, (s + 1) * TILE)
        tmin = tmin_ref[rs]
        tmax = tmax_ref[rs]
        any_live = jnp.max(jnp.where(tmax > tmin, 1.0, 0.0)) > 0.0

        @pl.when(any_live)
        def _(rs=rs, tmin=tmin, tmax=tmax):
            _capped_tile(o_ref, d_ref, rs, tmin, tmax,
                         cmin_ref, cmax_ref, v0_ref, e1_ref, e2_ref,
                         mask_ref, bt_out, bp_out, te_scr, score_scr,
                         leaf=leaf, any_hit=any_hit, cap=cap)


@functools.partial(jax.jit, static_argnames=("leaf", "any_hit", "cap"))
def _capped_pallas(o, d, tmin, tmax, bt0, bp0, cmin, cmax,
                   v0, e1, e2, mask, *, leaf, any_hit, cap):
    n = o.shape[0]
    blk = TILE * SUB
    n_pad = -(-n // blk) * blk
    pad = n_pad - n

    def pad0(x, fill=0.0):
        return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1),
                       constant_values=fill)

    args = (pad0(o), pad0(d, 1.0), pad0(tmin[:, None]), pad0(tmax[:, None]),
            pad0(bt0[:, None]), pad0(bp0[:, None], -1),
            cmin, cmax, v0, e1, e2, mask)
    ray2 = lambda w: pl.BlockSpec((blk, w), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
    vmem = lambda a: pltpu.VMEM(a.shape, a.dtype)
    C = cmin.shape[1]
    bt, bp = pl.pallas_call(
        functools.partial(_capped_kernel, leaf=leaf, any_hit=any_hit,
                          cap=cap),
        grid=(n_pad // blk,),
        in_specs=[ray2(3), ray2(3), ray2(1), ray2(1), ray2(1), ray2(1)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * 6,
        out_specs=[ray2(1), ray2(1)],
        out_shape=[jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
                   jax.ShapeDtypeStruct((n_pad, 1), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((TILE, C), jnp.float32),
                        pltpu.VMEM((1, C), jnp.float32),
                        vmem(cmin), vmem(cmax), vmem(v0), vmem(e1),
                        vmem(e2), vmem(mask),
                        pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(*args)
    return bt[:n, 0], bp[:n, 0]


def make_capped_backends(cap):
    """(intersect_fn, occluded_fn) with the visit-capped kernel, using
    the SAME live-first compaction wrapper as production."""

    def _run(sc, o, d, tmin, tmax, bt0, bp0, any_hit):
        n = o.shape[0]
        key = (tmax <= tmin).astype(jnp.int32)
        _, perm = lax.sort((key, jnp.arange(n, dtype=jnp.int32)),
                           num_keys=1)
        pack = jnp.concatenate([o, d, tmin[:, None], tmax[:, None],
                                bt0[:, None]], axis=1)[perm]
        t, p = _capped_pallas(
            pack[:, 0:3], pack[:, 3:6], pack[:, 6], pack[:, 7], pack[:, 8],
            bp0[perm], sc.clus_min.T, sc.clus_max.T,
            sc.tri_v0.T, sc.tri_e1.T, sc.tri_e2.T, sc.tri_mask[None, :],
            leaf=sc.leaf_size, any_hit=any_hit, cap=cap)
        t = jnp.zeros((n,), jnp.float32).at[perm].set(t)
        p = jnp.zeros((n,), jnp.int32).at[perm].set(p)
        return t, p

    def isect(scene, o, d, tmin, tmax):
        od, dd, tn, tx = _detach(o, d, tmin, tmax)
        sc = lax.stop_gradient(scene)
        t, prim = _run(sc, od, dd, tn, tx, tx,
                       jnp.full(od.shape[:1], -1, jnp.int32), False)
        return finalize_hit(scene, o, d, t, prim, t < tx)

    def occl(scene, o, d, tmax):
        o, d, tmax = _detach(o, d, tmax)
        sc = lax.stop_gradient(scene)
        t, _ = _run(sc, o, d, jnp.zeros(o.shape[:1], jnp.float32), tmax,
                    tmax, jnp.full(o.shape[:1], -1, jnp.int32), True)
        return t < tmax

    return isect, occl


def main(cap):
    scene = mesh_scene(subdiv=6)
    size = 256
    cfg = RenderConfig(width=size, height=size, spp=4, max_bounces=8,
                       rr_start=3, chunk_size=1 << 16)
    n_total = size * size * cfg.spp
    uids = jnp.arange(n_total, dtype=jnp.uint32)
    flat_rays = n_total * (cfg.max_bounces + 1 + cfg.max_bounces)

    @functools.partial(jax.jit, static_argnames=("cap",))
    def run(scene, cap):
        if cap < 0:        # production (uncapped union walk) for reference
            L, stats = trace_chunked(scene, uids, cfg)
        else:
            isect, occl = make_capped_backends(cap)
            L, stats = trace_chunked(scene, uids, cfg,
                                     intersect_fn=isect, occluded_fn=occl)
        return film_from_radiance(L, cfg), stats

    img, stats = run(scene, cap)           # compile + warm
    np.asarray(img)
    img, stats = run(scene, cap)
    np.asarray(img)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        img, stats = run(scene, cap)
        jax.block_until_ready(img)
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    issued = float(np.asarray(stats["rays_closest"]).sum()
                   + np.asarray(stats["rays_shadow"]).sum())
    label = "production" if cap < 0 else f"cap={cap}"
    print(f"{label:>10}: {dt:.4f} s  {flat_rays/dt/1e6:6.2f}M flat "
          f"rays/s  issued {issued/1e6:.2f}M  "
          f"mean {float(np.asarray(img).mean()):.4f}", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1:          # one cap per process: the axon backend
        main(int(sys.argv[1]))     # errors on multiple large programs
    else:
        import subprocess

        for cap in (-1, 21, 6, 3, 1, 0):
            subprocess.run([sys.executable, __file__, str(cap)],
                           check=False)
