"""Traversal kernel v2 candidates, chained-timing protocol.

Matrix: slab {vpu, mxu} x trip {mt, plu} x TILE {64, 32}, fixed K=12
trips per subtile (upper-bound work; relative costs are what matter).

  slab vpu — production (TILE,C) min/max chain
  slab mxu — one (TILE,8)@(8,6C) HIGHEST matmul for all six t-planes
  trip mt  — production Moeller-Trumbore on the VPU
  trip plu — Pluecker signs via (TILE,6)@(6,3L) + plane-t via two
             (TILE,4)@(4,L) matmuls (same math as accel.clustered)

python benchmarks/experiments/_exp_v2.py
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

BLK = 1024          # rays per grid step
KTRIPS = 12


def _kern(*refs, C, leaf, tile, slab, trip, refresh=8):
    BIG = 3.0e38
    nt = (2 if slab == "vpu" else 1) + (4 if trip == "mt" else 2)
    # per-ray feature blocks (feat8 slab-mxu; feat6/featd/feato plu) are
    # precomputed in XLA: Mosaic cannot yet concat/transposed-build
    # (tile, k) feature matrices from (tile, 1) columns in-kernel
    (o_ref, d_ref, tmin_ref, tmax_ref, f8_ref, f6_ref, fd_ref,
     fo_ref) = refs[0:8]
    tab_hbm = refs[8:8 + nt]
    bt_out, bp_out, te_scr, score_scr = refs[8 + nt:12 + nt]
    tab_ref = refs[12 + nt:12 + nt + nt]
    sem = refs[-1]
    if slab == "vpu":
        cmin_ref, cmax_ref = tab_ref[0:2]
        rest = tab_ref[2:]
    else:
        stbl_ref = tab_ref[0]
        rest = tab_ref[1:]
    if trip == "mt":
        v0_ref, e1_ref, e2_ref, mask_ref = rest
    else:
        plu_ref, ndv_ref = rest

    SUBT = BLK // tile

    @pl.when(pl.program_id(0) == 0)
    def _load():
        for s, dst in zip(tab_hbm, tab_ref):
            cp = pltpu.make_async_copy(s, dst, sem)
            cp.start()
            cp.wait()

    bt_out[:] = jnp.full_like(bt_out, BIG)
    bp_out[:] = jnp.full_like(bp_out, -1)
    iota_c = lax.broadcasted_iota(jnp.int32, (1, C), 1)

    for s in range(SUBT):
        rs = slice(s * tile, (s + 1) * tile)
        tmin = tmin_ref[rs]
        tmax = tmax_ref[rs]
        tiny = 1e-12

        # ---- slab -> te_scr ----
        if slab == "vpu":
            tn = jnp.full((tile, C), -BIG)
            tf = jnp.full((tile, C), BIG)
            for a in range(3):
                da = d_ref[rs, a:a + 1]
                inv = 1.0 / jnp.where(jnp.abs(da) < tiny,
                                      jnp.where(da >= 0.0, tiny, -tiny), da)
                t0 = (cmin_ref[a:a + 1, :] - o_ref[rs, a:a + 1]) * inv
                t1 = (cmax_ref[a:a + 1, :] - o_ref[rs, a:a + 1]) * inv
                tn = jnp.maximum(tn, jnp.minimum(t0, t1))
                tf = jnp.minimum(tf, jnp.maximum(t0, t1))
        else:
            ts = lax.dot_general(
                f8_ref[rs, :], stbl_ref[:, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGHEST)            # (tile,6C)
            tn = jnp.full((tile, C), -BIG)
            tf = jnp.full((tile, C), BIG)
            for a in range(3):
                t0 = ts[:, 2 * a * C:(2 * a + 1) * C]
                t1 = ts[:, (2 * a + 1) * C:(2 * a + 2) * C]
                tn = jnp.maximum(tn, jnp.minimum(t0, t1))
                tf = jnp.minimum(tf, jnp.maximum(t0, t1))
        hit = (tn <= tf) & (tf > tmin) & (tn < tmax)
        te_scr[0:tile, :] = jnp.where(hit, jnp.maximum(tn, tmin), BIG)

        def fresh():
            adm = jnp.where((te_scr[0:tile, :] < bt_out[rs])
                            & (score_scr[:] < BIG), te_scr[0:tile, :], BIG)
            score_scr[:] = jnp.min(adm, axis=0, keepdims=True)

        score_scr[:] = jnp.full((1, C), 0.0)
        fresh()

        def body(k, _):
            row = score_scr[:]
            c = jnp.argmin(row[0]).astype(jnp.int32)
            score_scr[:] = jnp.where(iota_c == c, BIG, score_scr[:])
            bt = bt_out[rs]
            if trip == "mt":
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
            else:
                sl3 = pl.ds(pl.multiple_of(c * 3 * leaf, 128), 3 * leaf)
                sl1 = pl.ds(pl.multiple_of(c * leaf, 128), leaf)
                w = lax.dot_general(
                    f6_ref[rs, :], plu_ref[:, sl3],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST)        # (tile,3L)
                w0 = w[:, 0:leaf]
                w1 = w[:, leaf:2 * leaf]
                w2 = w[:, 2 * leaf:3 * leaf]
                same = (((w0 >= 0.0) & (w1 >= 0.0) & (w2 >= 0.0))
                        | ((w0 <= 0.0) & (w1 <= 0.0) & (w2 <= 0.0)))
                nd = ndv_ref[:, sl1]                        # (4,L)
                den = lax.dot_general(
                    fd_ref[rs, :], nd,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST)        # (tile,L)
                num = lax.dot_general(
                    fo_ref[rs, :], nd,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST)
                ok = same & (jnp.abs(den) > 1e-12)
                t = num / jnp.where(ok, den, 1.0)
                ok = ok & (t > tmin) & (t < bt)
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

        lax.fori_loop(0, KTRIPS, body, 0)


def ray_feats(o, d):
    """Per-ray feature blocks, built in XLA: f8 slab features
    [inv, -o*inv, 0, 0]; f6 Pluecker [d, o x d]; fd [d, 0]; fo [-o, 1]."""
    n = o.shape[0]
    tiny = 1e-12
    inv = 1.0 / jnp.where(jnp.abs(d) < tiny,
                          jnp.where(d >= 0.0, tiny, -tiny), d)
    z = jnp.zeros((n, 1), jnp.float32)
    one = jnp.ones((n, 1), jnp.float32)
    f8 = jnp.concatenate([inv, -o * inv, z, z], axis=1)
    f6 = jnp.concatenate([d, jnp.cross(o, d)], axis=1)
    fd = jnp.concatenate([d, z], axis=1)
    fo = jnp.concatenate([-o, one], axis=1)
    return f8, f6, fd, fo


@functools.partial(jax.jit,
                   static_argnames=("leaf", "tile", "slab", "trip"))
def probe2(o, d, tmin, tmax, tabs, *, leaf, tile, slab, trip):
    n = o.shape[0]
    C = (tabs[0].shape[1] if slab == "vpu"
         else tabs[0].shape[1] // 6)
    f8, f6, fd, fo = ray_feats(o, d)
    ray2 = lambda w: pl.BlockSpec((BLK, w), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
    hbm = lambda: pl.BlockSpec(memory_space=pl.ANY)
    vmem = lambda a: pltpu.VMEM(a.shape, a.dtype)
    return pl.pallas_call(
        functools.partial(_kern, C=C, leaf=leaf, tile=tile, slab=slab,
                          trip=trip),
        grid=(n // BLK,),
        in_specs=[ray2(3), ray2(3), ray2(1), ray2(1),
                  ray2(8), ray2(6), ray2(4), ray2(4)]
                 + [hbm()] * len(tabs),
        out_specs=[ray2(1), ray2(1)],
        out_shape=[jax.ShapeDtypeStruct((n, 1), jnp.float32),
                   jax.ShapeDtypeStruct((n, 1), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((tile, C), jnp.float32),
                        pltpu.VMEM((1, C), jnp.float32)]
                       + [vmem(t) for t in tabs]
                       + [pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(o, d, tmin[:, None], tmax[:, None], f8, f6, fd, fo, *tabs)


def pack_tables(scene):
    cmin = np.asarray(scene.clus_min)          # (C,3)
    cmax = np.asarray(scene.clus_max)
    C = cmin.shape[0]
    L = scene.leaf_size
    stbl = np.zeros((8, 6 * C), np.float32)
    for a in range(3):
        for b, src in ((0, cmin), (1, cmax)):
            blk = slice((2 * a + b) * C, (2 * a + b + 1) * C)
            stbl[a, blk] = src[:, a]
            stbl[3 + a, blk] = 1.0
    plu_s = np.asarray(scene.plu)              # (3,6,T)
    T = plu_s.shape[2]
    plu = np.zeros((6, 3 * T), np.float32)
    for c in range(T // L):
        for j in range(3):
            plu[:, c * 3 * L + j * L:c * 3 * L + (j + 1) * L] = \
                plu_s[j, :, c * L:(c + 1) * L]
    n_ = np.asarray(scene.tri_n)               # (T,3)
    v0 = np.asarray(scene.tri_v0)
    msk = np.asarray(scene.tri_mask)
    ndv = np.zeros((4, T), np.float32)
    ndv[:3] = (n_ * msk[:, None]).T
    ndv[3] = np.einsum("tk,tk->t", v0, n_) * msk
    return dict(
        cmin=jnp.asarray(cmin.T), cmax=jnp.asarray(cmax.T),
        stbl=jnp.asarray(stbl),
        v0=scene.tri_v0.T, e1=scene.tri_e1.T, e2=scene.tri_e2.T,
        mask=scene.tri_mask[None, :],
        plu=jnp.asarray(plu), ndv=jnp.asarray(ndv))


def tab_list(T, slab, trip):
    out = ([T["cmin"], T["cmax"]] if slab == "vpu" else [T["stbl"]])
    out += ([T["v0"], T["e1"], T["e2"], T["mask"]] if trip == "mt"
            else [T["plu"], T["ndv"]])
    return tuple(out)


def main():
    from tputracer.scene import mesh_scene
    from tputracer.integrators.pt import camera_rays
    from tputracer.config import RenderConfig

    n = 65536
    for leaf in (128, 256):
        scene = mesh_scene(subdiv=6, leaf_size=leaf)
        cfg = RenderConfig(width=256, height=256, spp=4, max_bounces=8)
        uid = jnp.arange(n, dtype=jnp.uint32)
        o, d = camera_rays(scene, uid, cfg)
        tmin = jnp.zeros((n,))
        tmax0 = jnp.full((n,), 3.0e38)
        T = pack_tables(scene)
        C = scene.n_clusters

        def chain(K, tile, slab, trip):
            tabs = tab_list(T, slab, trip)

            @jax.jit
            def f(o, d, tmin, tmax):
                acc = jnp.zeros((n, 1), jnp.float32)
                tm = tmax
                for _ in range(K):
                    bt, _ = probe2(o, d, tmin, tm, tabs, leaf=leaf,
                                   tile=tile, slab=slab, trip=trip)
                    acc = acc + bt
                    tm = tmax + 0.0 * bt[:, 0]
                return acc
            return f

        def timeit(f):
            out = f(o, d, tmin, tmax0)
            np.asarray(out)
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                out = f(o, d, tmin, tmax0)
                out.block_until_ready()
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts))

        for tile in (64,):   # add 32 in a follow-up run if warranted
            for slab in ("vpu", "mxu"):
                for trip in ("mt", "plu"):
                    t2 = timeit(chain(2, tile, slab, trip))
                    t8 = timeit(chain(8, tile, slab, trip))
                    pc = (t8 - t2) / 6.0
                    n_sub = n // tile
                    print(f"leaf={leaf} C={C} tile={tile} slab={slab} "
                          f"trip={trip}: {pc*1e3:7.3f} ms/call "
                          f"({pc/n_sub*1e6:5.2f} us/subtile, K={KTRIPS})",
                          flush=True)


if __name__ == "__main__":
    main()
