"""Slab-pass variants shootout: the per-trip probe showed the
(TILE, C) ray-vs-all-AABB slab pass costs ~24 us/subtile -- ~85% of the
whole traversal.  Candidates:

  cur   — production formulation: (1,C) minus (TILE,1) broadcasts
  mxu   — t0/t1 for all axes as ONE (TILE,8)@(8,6C) MXU matmul
  tr    — transposed layout: clusters on sublanes (C,TILE), both
          broadcasts native

python benchmarks/experiments/_exp_slab.py
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

TILE, SUB = 64, 16


def _prep(o_ref, d_ref, rs):
    tiny = 1e-12
    o = o_ref[rs, :]                      # (TILE,3)
    d = d_ref[rs, :]
    inv = 1.0 / jnp.where(jnp.abs(d) < tiny,
                          jnp.where(d >= 0.0, tiny, -tiny), d)
    return o, inv


def _kern_cur(o_ref, d_ref, tmin_ref, tmax_ref, cmin_hbm, cmax_hbm,
              out, te_scr, cmin_ref, cmax_ref, sem):
    BIG = 3.0e38
    C = cmin_ref.shape[1]

    @pl.when(pl.program_id(0) == 0)
    def _load():
        for s, dst in ((cmin_hbm, cmin_ref), (cmax_hbm, cmax_ref)):
            cp = pltpu.make_async_copy(s, dst, sem)
            cp.start()
            cp.wait()

    for s in range(SUB):
        rs = slice(s * TILE, (s + 1) * TILE)
        tmin = tmin_ref[rs]
        tmax = tmax_ref[rs]
        tn = jnp.full((TILE, C), -BIG)
        tf = jnp.full((TILE, C), BIG)
        for a in range(3):
            da = d_ref[rs, a:a + 1]
            tiny = 1e-12
            inv = 1.0 / jnp.where(jnp.abs(da) < tiny,
                                  jnp.where(da >= 0.0, tiny, -tiny), da)
            t0 = (cmin_ref[a:a + 1, :] - o_ref[rs, a:a + 1]) * inv
            t1 = (cmax_ref[a:a + 1, :] - o_ref[rs, a:a + 1]) * inv
            tn = jnp.maximum(tn, jnp.minimum(t0, t1))
            tf = jnp.minimum(tf, jnp.maximum(t0, t1))
        hit = (tn <= tf) & (tf > tmin) & (tn < tmax)
        te_scr[:] = jnp.where(hit, jnp.maximum(tn, tmin), BIG)
        out[rs] = jnp.min(te_scr[:], axis=1, keepdims=True)


def _kern_mxu(o_ref, d_ref, tmin_ref, tmax_ref, tbl_hbm,
              out, te_scr, tbl_ref, sem):
    BIG = 3.0e38
    C6 = tbl_ref.shape[1]
    C = C6 // 6

    @pl.when(pl.program_id(0) == 0)
    def _load():
        cp = pltpu.make_async_copy(tbl_hbm, tbl_ref, sem)
        cp.start()
        cp.wait()

    for s in range(SUB):
        rs = slice(s * TILE, (s + 1) * TILE)
        tmin = tmin_ref[rs]
        tmax = tmax_ref[rs]
        o, inv = _prep(o_ref, d_ref, rs)
        feat = jnp.concatenate(
            [inv, -o * inv, jnp.zeros((TILE, 2), jnp.float32)],
            axis=1)                                         # (TILE,8)
        # table rows: [cmin_x cmin_y cmin_z 1x 1y 1z] per (bound, axis)
        ts = jax.lax.dot_general(
            feat, tbl_ref[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST)                # (TILE,6C)
        tn = jnp.full((TILE, C), -BIG)
        tf = jnp.full((TILE, C), BIG)
        for a in range(3):
            t0 = ts[:, 2 * a * C:(2 * a + 1) * C]
            t1 = ts[:, (2 * a + 1) * C:(2 * a + 2) * C]
            tn = jnp.maximum(tn, jnp.minimum(t0, t1))
            tf = jnp.minimum(tf, jnp.maximum(t0, t1))
        hit = (tn <= tf) & (tf > tmin) & (tn < tmax)
        te_scr[:] = jnp.where(hit, jnp.maximum(tn, tmin), BIG)
        out[rs] = jnp.min(te_scr[:], axis=1, keepdims=True)


def _kern_tr(o_ref, d_ref, tmin_ref, tmax_ref, cmin_hbm, cmax_hbm,
             out, te_scr, cmin_ref, cmax_ref, sem):
    # clusters on sublanes: cmin/cmax arrive as (C,3); te_scr is (C,TILE)
    BIG = 3.0e38
    C = cmin_ref.shape[0]

    @pl.when(pl.program_id(0) == 0)
    def _load():
        for s, dst in ((cmin_hbm, cmin_ref), (cmax_hbm, cmax_ref)):
            cp = pltpu.make_async_copy(s, dst, sem)
            cp.start()
            cp.wait()

    for s in range(SUB):
        rs = slice(s * TILE, (s + 1) * TILE)
        tmin_r = tmin_ref[0:1, rs]                      # (1,TILE)
        tmax_r = tmax_ref[0:1, rs]
        tn = jnp.full((C, TILE), -BIG)
        tf = jnp.full((C, TILE), BIG)
        for a in range(3):
            da = d_ref[a:a + 1, rs]                     # (1,TILE)
            tiny = 1e-12
            inv = 1.0 / jnp.where(jnp.abs(da) < tiny,
                                  jnp.where(da >= 0.0, tiny, -tiny), da)
            t0 = (cmin_ref[:, a:a + 1] - o_ref[a:a + 1, rs]) * inv
            t1 = (cmax_ref[:, a:a + 1] - o_ref[a:a + 1, rs]) * inv
            tn = jnp.maximum(tn, jnp.minimum(t0, t1))
            tf = jnp.minimum(tf, jnp.maximum(t0, t1))
        hit = (tn <= tf) & (tf > tmin_r) & (tn < tmax_r)
        te_scr[:] = jnp.where(hit, jnp.maximum(tn, tmin_r), BIG)
        out[0:1, rs] = jnp.min(te_scr[:], axis=0, keepdims=True)


def _kern_bf16(o_ref, d_ref, tmin_ref, tmax_ref, cmin_hbm, cmax_hbm,
               out, te_scr, cmin_ref, cmax_ref, sem):
    # same math as _kern_cur but the (TILE,C) chain runs in bfloat16 —
    # probes whether Mosaic packs bf16 VPU elementwise 2-per-lane.  The
    # production version would need conservative widening (shrink tn,
    # grow tf by one bf16 ulp) to stay exact; timing is what matters here.
    BIG = 3.0e38
    C = cmin_ref.shape[1]

    @pl.when(pl.program_id(0) == 0)
    def _load():
        for s, dst in ((cmin_hbm, cmin_ref), (cmax_hbm, cmax_ref)):
            cp = pltpu.make_async_copy(s, dst, sem)
            cp.start()
            cp.wait()

    for s in range(SUB):
        rs = slice(s * TILE, (s + 1) * TILE)
        tmin = tmin_ref[rs]
        tmax = tmax_ref[rs]
        tn = jnp.full((TILE, C), jnp.bfloat16(-BIG), jnp.bfloat16)
        tf = jnp.full((TILE, C), jnp.bfloat16(BIG), jnp.bfloat16)
        for a in range(3):
            da = d_ref[rs, a:a + 1]
            tiny = 1e-12
            inv = (1.0 / jnp.where(jnp.abs(da) < tiny,
                                   jnp.where(da >= 0.0, tiny, -tiny),
                                   da)).astype(jnp.bfloat16)
            ob = o_ref[rs, a:a + 1].astype(jnp.bfloat16)
            t0 = (cmin_ref[a:a + 1, :] - ob) * inv
            t1 = (cmax_ref[a:a + 1, :] - ob) * inv
            tn = jnp.maximum(tn, jnp.minimum(t0, t1))
            tf = jnp.minimum(tf, jnp.maximum(t0, t1))
        tn32 = tn.astype(jnp.float32)
        hit = (tn <= tf) & (tf.astype(jnp.float32) > tmin) & (tn32 < tmax)
        te_scr[:] = jnp.where(hit, jnp.maximum(tn32, tmin), BIG)
        out[rs] = jnp.min(te_scr[:], axis=1, keepdims=True)


def run_bf16(o, d, tmin, tmax, cmin, cmax):
    n = o.shape[0]
    blk = TILE * SUB
    C = cmin.shape[1]
    ray2 = lambda w: pl.BlockSpec((blk, w), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kern_bf16,
        grid=(n // blk,),
        in_specs=[ray2(3), ray2(3), ray2(1), ray2(1),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=ray2(1),
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TILE, C), jnp.float32),
                        pltpu.VMEM(cmin.shape, jnp.bfloat16),
                        pltpu.VMEM(cmax.shape, jnp.bfloat16),
                        pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(o, d, tmin[:, None], tmax[:, None], cmin, cmax)


def _kern_chunk(o_ref, d_ref, tmin_ref, tmax_ref, cmin_hbm, cmax_hbm,
                out, te_scr, cmin_ref, cmax_ref, sem, *, ck):
    # identical math to _kern_cur but looped over cluster chunks of ck
    # columns, so every intermediate is a handful of vregs instead of a
    # (TILE, C) VMEM round-trip per op
    BIG = 3.0e38
    C = cmin_ref.shape[1]

    @pl.when(pl.program_id(0) == 0)
    def _load():
        for s, dst in ((cmin_hbm, cmin_ref), (cmax_hbm, cmax_ref)):
            cp = pltpu.make_async_copy(s, dst, sem)
            cp.start()
            cp.wait()

    for s in range(SUB):
        rs = slice(s * TILE, (s + 1) * TILE)
        tmin = tmin_ref[rs]
        tmax = tmax_ref[rs]
        invs, os_ = [], []
        for a in range(3):
            da = d_ref[rs, a:a + 1]
            tiny = 1e-12
            invs.append(1.0 / jnp.where(jnp.abs(da) < tiny,
                                        jnp.where(da >= 0.0, tiny, -tiny),
                                        da))
            os_.append(o_ref[rs, a:a + 1])
        best = jnp.full((TILE, 1), BIG)
        for c0 in range(0, C, ck):
            cs = slice(c0, c0 + ck)
            tn = jnp.full((TILE, ck), -BIG)
            tf = jnp.full((TILE, ck), BIG)
            for a in range(3):
                t0 = (cmin_ref[a:a + 1, cs] - os_[a]) * invs[a]
                t1 = (cmax_ref[a:a + 1, cs] - os_[a]) * invs[a]
                tn = jnp.maximum(tn, jnp.minimum(t0, t1))
                tf = jnp.minimum(tf, jnp.maximum(t0, t1))
            hit = (tn <= tf) & (tf > tmin) & (tn < tmax)
            te = jnp.where(hit, jnp.maximum(tn, tmin), BIG)
            te_scr[:, cs] = te
            best = jnp.minimum(best, jnp.min(te, axis=1, keepdims=True))
        out[rs] = best


def run_chunk(o, d, tmin, tmax, cmin, cmax, ck):
    n = o.shape[0]
    blk = TILE * SUB
    C = cmin.shape[1]
    ray2 = lambda w: pl.BlockSpec((blk, w), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kern_chunk, ck=ck),
        grid=(n // blk,),
        in_specs=[ray2(3), ray2(3), ray2(1), ray2(1),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=ray2(1),
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TILE, C), jnp.float32),
                        pltpu.VMEM(cmin.shape, jnp.float32),
                        pltpu.VMEM(cmax.shape, jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(o, d, tmin[:, None], tmax[:, None], cmin, cmax)


def run_cur(o, d, tmin, tmax, cmin, cmax):
    n = o.shape[0]
    blk = TILE * SUB
    C = cmin.shape[1]
    ray2 = lambda w: pl.BlockSpec((blk, w), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kern_cur,
        grid=(n // blk,),
        in_specs=[ray2(3), ray2(3), ray2(1), ray2(1),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=ray2(1),
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TILE, C), jnp.float32),
                        pltpu.VMEM(cmin.shape, jnp.float32),
                        pltpu.VMEM(cmax.shape, jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(o, d, tmin[:, None], tmax[:, None], cmin, cmax)


def run_mxu(o, d, tmin, tmax, tbl):
    n = o.shape[0]
    blk = TILE * SUB
    C = tbl.shape[1] // 6
    ray2 = lambda w: pl.BlockSpec((blk, w), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kern_mxu,
        grid=(n // blk,),
        in_specs=[ray2(3), ray2(3), ray2(1), ray2(1),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=ray2(1),
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TILE, C), jnp.float32),
                        pltpu.VMEM(tbl.shape, jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(o, d, tmin[:, None], tmax[:, None], tbl)


def run_tr(o, d, tmin, tmax, cmin, cmax):
    # rays transposed: (3, n) / (1, n) blocks, lanes = rays
    n = o.shape[1]
    blk = TILE * SUB
    C = cmin.shape[0]
    rayt = lambda h: pl.BlockSpec((h, blk), lambda i: (0, i),
                                  memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kern_tr,
        grid=(n // blk,),
        in_specs=[rayt(3), rayt(3), rayt(1), rayt(1),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=rayt(1),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((C, TILE), jnp.float32),
                        pltpu.VMEM(cmin.shape, jnp.float32),
                        pltpu.VMEM(cmax.shape, jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(o, d, tmin[None, :], tmax[None, :], cmin, cmax)


def main():
    from tputracer.scene import mesh_scene
    from tputracer.integrators.pt import camera_rays
    from tputracer.config import RenderConfig

    scene = mesh_scene(subdiv=6)
    cfg = RenderConfig(width=256, height=256, spp=4, max_bounces=8)
    n = 65536
    uid = jnp.arange(n, dtype=jnp.uint32)
    o, d = camera_rays(scene, uid, cfg)
    tmin = jnp.zeros((n,))
    tmax = jnp.full((n,), 3.0e38)
    cmin = np.asarray(scene.clus_min)            # (C,3)
    cmax = np.asarray(scene.clus_max)
    C = cmin.shape[0]

    # MXU table (8 rows padded from 6): per (axis a, bound b) block of C
    # columns: row a = bound value, row 3+a = 1
    tbl = np.zeros((8, 6 * C), np.float32)
    for a in range(3):
        for b, src in ((0, cmin), (1, cmax)):
            blk = slice((2 * a + b) * C, (2 * a + b + 1) * C)
            tbl[a, blk] = src[:, a]
            tbl[3 + a, blk] = 1.0

    def timeit(f, *args):
        out = jax.jit(f)(*args)
        np.asarray(out)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = jax.jit(f)(*args)
            out.block_until_ready()
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)), out

    t_cur, o_cur = timeit(run_cur, o, d, tmin, tmax,
                          jnp.asarray(cmin.T), jnp.asarray(cmax.T))
    print(f"cur: {t_cur*1e3:8.3f} ms", flush=True)

    # chunked variants need C % ck == 0: pad with never-hit boxes
    Cp = -(-C // 256) * 256
    cminp = np.full((Cp, 3), 3.0e38, np.float32)
    cmaxp = np.full((Cp, 3), 3.0e38, np.float32)
    cminp[:C], cmaxp[:C] = cmin, cmax
    for ck in (128, 256):
        f_ck = functools.partial(run_chunk, ck=ck)
        t_ck, o_ck = timeit(f_ck, o, d, tmin, tmax,
                            jnp.asarray(cminp.T), jnp.asarray(cmaxp.T))
        agree = np.allclose(np.asarray(o_cur), np.asarray(o_ck),
                            rtol=1e-5, atol=1e-3)
        print(f"ck{ck}: {t_ck*1e3:8.3f} ms  agree={agree}", flush=True)
    t_bf, o_bf = timeit(run_bf16, o, d, tmin, tmax,
                        jnp.asarray(cmin.T, jnp.bfloat16),
                        jnp.asarray(cmax.T, jnp.bfloat16))
    close = np.mean(np.abs(np.asarray(o_bf) - np.asarray(o_cur))
                    < 0.05 * np.abs(np.asarray(o_cur)) + 0.1)
    print(f"bf16:{t_bf*1e3:8.3f} ms  ~agree={close:.3f}", flush=True)
    t_mxu, o_mxu = timeit(run_mxu, o, d, tmin, tmax, jnp.asarray(tbl))
    agree = np.allclose(np.asarray(o_cur), np.asarray(o_mxu),
                        rtol=1e-5, atol=1e-3)
    print(f"mxu: {t_mxu*1e3:8.3f} ms  agree={agree}", flush=True)
    ot, dt_ = jnp.asarray(np.asarray(o).T), jnp.asarray(np.asarray(d).T)
    t_tr, o_tr = timeit(run_tr, ot, dt_, tmin, tmax,
                        jnp.asarray(cmin), jnp.asarray(cmax))
    agree = np.allclose(np.asarray(o_cur)[:, 0], np.asarray(o_tr)[0],
                        rtol=1e-5, atol=1e-3)
    print(f"tr : {t_tr*1e3:8.3f} ms  agree={agree}", flush=True)


if __name__ == "__main__":
    main()
