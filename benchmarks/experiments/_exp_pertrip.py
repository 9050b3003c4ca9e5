"""Per-trip cost decomposition of the traversal kernel.

Fixed-K-trip variants of the production kernel isolate:
  slab   — K=0: the (TILE,C) slab pass + score row only
  book   — K trips of pick/mark/score-refresh WITHOUT the triangle test
  full   — K trips of the real body (pick + MT block test)

python benchmarks/experiments/_exp_pertrip.py   (real TPU)
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


def _kern(o_ref, d_ref, tmin_ref, tmax_ref,
          cmin_hbm, cmax_hbm, v0_hbm, e1_hbm, e2_hbm, mask_hbm,
          bt_out, bp_out, te_scr, score_scr,
          cmin_ref, cmax_ref, v0_ref, e1_ref, e2_ref, mask_ref, sem,
          *, leaf, k_trips, do_mt, refresh=8):
    BIG = 3.0e38
    C = cmin_ref.shape[1]

    @pl.when(pl.program_id(0) == 0)
    def _load():
        for src, dst in ((cmin_hbm, cmin_ref), (cmax_hbm, cmax_ref),
                         (v0_hbm, v0_ref), (e1_hbm, e1_ref),
                         (e2_hbm, e2_ref), (mask_hbm, mask_ref)):
            cp = pltpu.make_async_copy(src, dst, sem)
            cp.start()
            cp.wait()

    bt_out[:] = jnp.full_like(bt_out, BIG)
    bp_out[:] = jnp.full_like(bp_out, -1)
    iota_c = lax.broadcasted_iota(jnp.int32, (1, C), 1)

    for s in range(SUB):
        rs = slice(s * TILE, (s + 1) * TILE)
        tmin = tmin_ref[rs]
        tmax = tmax_ref[rs]
        tn = jnp.full((TILE, C), -BIG)
        tf = jnp.full((TILE, C), BIG)
        for a in range(3):
            da = d_ref[rs, a:a + 1]
            tiny = jnp.float32(1e-12)
            inv = 1.0 / jnp.where(jnp.abs(da) < tiny,
                                  jnp.where(da >= 0.0, tiny, -tiny), da)
            t0 = (cmin_ref[a:a + 1, :] - o_ref[rs, a:a + 1]) * inv
            t1 = (cmax_ref[a:a + 1, :] - o_ref[rs, a:a + 1]) * inv
            tn = jnp.maximum(tn, jnp.minimum(t0, t1))
            tf = jnp.minimum(tf, jnp.maximum(t0, t1))
        hit = (tn <= tf) & (tf > tmin) & (tn < tmax)
        te_scr[:] = jnp.where(hit, jnp.maximum(tn, tmin), BIG)

        def fresh():
            adm = jnp.where((te_scr[:] < bt_out[rs]) & (score_scr[:] < BIG),
                            te_scr[:], BIG)
            score_scr[:] = jnp.min(adm, axis=0, keepdims=True)

        score_scr[:] = jnp.full((1, C), 0.0)
        fresh()

        def body(k, _):
            row = score_scr[:]
            c = jnp.argmin(row[0]).astype(jnp.int32)
            score_scr[:] = jnp.where(iota_c == c, BIG, score_scr[:])
            if do_mt:
                bt = bt_out[rs]
                sl = pl.ds(pl.multiple_of(c * leaf, 128), leaf)
                v0x, v0y, v0z = (v0_ref[a:a + 1, sl] for a in range(3))
                e1x, e1y, e1z = (e1_ref[a:a + 1, sl] for a in range(3))
                e2x, e2y, e2z = (e2_ref[a:a + 1, sl] for a in range(3))
                msk = mask_ref[0:1, sl]
                ox, oy, oz = (o_ref[rs, a:a + 1] for a in range(3))
                dx, dy, dz = (d_ref[rs, a:a + 1] for a in range(3))
                px = dy * e2z - dz * e2y
                py = dz * e2x - dx * e2z
                pz = dx * e2y - dy * e2x
                det = e1x * px + e1y * py + e1z * pz
                ok = jnp.abs(det) > 1e-12
                f = 1.0 / jnp.where(ok, det, 1.0)
                sx, sy, sz = ox - v0x, oy - v0y, oz - v0z
                u = f * (sx * px + sy * py + sz * pz)
                qx = sy * e1z - sz * e1y
                qy = sz * e1x - sx * e1z
                qz = sx * e1y - sy * e1x
                v = f * (dx * qx + dy * qy + dz * qz)
                t = f * (e2x * qx + e2y * qy + e2z * qz)
                ok = (ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                      & (t > tmin) & (t < bt) & (msk > 0.0))
                tblk = jnp.where(ok, t, BIG)
                th = jnp.min(tblk, axis=1, keepdims=True)
                j = jnp.argmin(tblk, axis=1).astype(jnp.int32)[:, None]
                imp = th < bt
                bt_out[rs] = jnp.where(imp, th, bt)
                bp_out[rs] = jnp.where(imp, c * leaf + j, bp_out[rs])

            @pl.when((k + 1) % refresh == 0)
            def _():
                fresh()
            return 0

        if k_trips:
            lax.fori_loop(0, k_trips, body, 0)


@functools.partial(jax.jit, static_argnames=("leaf", "k_trips", "do_mt"))
def probe(o, d, tmin, tmax, cmin, cmax, v0, e1, e2, mask, *, leaf,
          k_trips, do_mt):
    n = o.shape[0]
    blk = TILE * SUB
    C = cmin.shape[1]
    ray2 = lambda w: pl.BlockSpec((blk, w), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
    hbm = lambda: pl.BlockSpec(memory_space=pl.ANY)
    vmem = lambda a: pltpu.VMEM(a.shape, a.dtype)
    bt, bp = pl.pallas_call(
        functools.partial(_kern, leaf=leaf, k_trips=k_trips, do_mt=do_mt),
        grid=(n // blk,),
        in_specs=[ray2(3), ray2(3), ray2(1), ray2(1),
                  hbm(), hbm(), hbm(), hbm(), hbm(), hbm()],
        out_specs=[ray2(1), ray2(1)],
        out_shape=[jax.ShapeDtypeStruct((n, 1), jnp.float32),
                   jax.ShapeDtypeStruct((n, 1), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((TILE, C), jnp.float32),
                        pltpu.VMEM((1, C), jnp.float32),
                        vmem(cmin), vmem(cmax), vmem(v0), vmem(e1),
                        vmem(e2), vmem(mask),
                        pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(o, d, tmin[:, None], tmax[:, None], cmin, cmax, v0, e1, e2, mask)
    return bt, bp


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
    args = (o, d, tmin, tmax, scene.clus_min.T, scene.clus_max.T,
            scene.tri_v0.T, scene.tri_e1.T, scene.tri_e2.T,
            scene.tri_mask[None, :])

    def timeit(**kw):
        out = probe(*args, leaf=scene.leaf_size, **kw)
        np.asarray(out[0])
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = probe(*args, leaf=scene.leaf_size, **kw)
            out[0].block_until_ready()
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t_slab = timeit(k_trips=0, do_mt=False)
    print(f"slab only: {t_slab*1e3:.3f} ms", flush=True)
    for K in (4, 8, 16):
        tb = timeit(k_trips=K, do_mt=False)
        tf = timeit(k_trips=K, do_mt=True)
        n_sub = n // TILE
        print(f"K={K}: book {tb*1e3:.3f} ms  full {tf*1e3:.3f} ms  "
              f"per-trip book {(tb-t_slab)/K/n_sub*1e9:.0f} ns  "
              f"full {(tf-t_slab)/K/n_sub*1e9:.0f} ns", flush=True)


if __name__ == "__main__":
    main()
