"""Fused small-scene intersection kernel (SURVEY.md §2 rows 3-4, §7 M1/M4).

The brute-force XLA path (accel.bruteforce) is algebraically right for
Cornell-class scenes but XLA materializes every (N, T)-shaped candidate
matrix to HBM — measured ~60 ms per 1M-ray intersect on a v5e, entirely
memory traffic.  This kernel fuses the whole test in VMEM and writes back
only (t, prim).

Layout is the load-bearing decision: **rays live on lanes** (the 128-wide
minor dimension), triangles on sublanes.  Per-ray scalars are (1, N)
rows and the Pluecker edge test is  (L, 6) @ (6, TILE)  on the MXU with
the ray-feature matrix pre-transposed — every VMEM buffer is dense.  The
first version of this kernel kept rays on ROWS ((N, 1) columns for
scalars), and Mosaic's (8, 128) tiling padded every such column 128x:
the kernel moved ~7 MB per 1024-ray tile instead of ~30 KB and ran no
faster than the XLA path it replaced.

No scalar control flow at all: T is small, so all T/128 blocks are
statically unrolled (the traversal kernel's scalar while-loop costs
~0.5 us per round trip; a Cornell-class scene needs none).

Used for scenes WITHOUT a cluster BVH (scene.n_clusters == 0) on TPU;
accel.traverse_tpu handles clustered scenes; accel.bruteforce stays the
CPU/fallback oracle.  Requires the padded triangle count to be a
multiple of 128 (make_scene pads to 128 by default).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tputracer.accel.bruteforce import finalize_hit
from tputracer.accel.clustered import _detach

FTILE = 1024   # rays per grid step (lanes)
_BLK = 128     # triangles per MXU block (sublanes)


def _fused_kernel(feat_ref, o_ref, d_ref, tmin_ref, tmax_ref,
                  sph_ref, plu_ref, trin_ref, v0n_ref, mask_ref,
                  bt_out, bp_out, *, n_sph):
    BIG = 3.0e38
    T = plu_ref.shape[1]
    tmin = tmin_ref[:]                                   # (1,TILE)
    tmax = tmax_ref[:]
    dx, dy, dz = (d_ref[a:a + 1, :] for a in range(3))   # (1,TILE)
    ox, oy, oz = (o_ref[a:a + 1, :] for a in range(3))

    bt = tmax                                            # (1,TILE)
    bp = jnp.full(tmax.shape, -1, jnp.int32)
    # spheres first (analytic primitives, BASELINE row 4): statically
    # unrolled, (1,1)-sliced constants broadcast against ray rows — no
    # scalar extraction, no XLA pre-pass
    for sidx in range(n_sph):
        cx, cy, cz, r = (sph_ref[a:a + 1, sidx:sidx + 1] for a in range(4))
        bx, by, bz = ox - cx, oy - cy, oz - cz
        bq = bx * dx + by * dy + bz * dz
        cq = bx * bx + by * by + bz * bz - r * r
        disc = bq * bq - cq
        okq = disc > 0.0
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t0 = -bq - sq
        t1 = -bq + sq
        ts = jnp.where(t0 > tmin, t0, t1)
        okq = okq & (ts > tmin) & (ts < bt)
        bt = jnp.where(okq, ts, bt)
        bp = jnp.where(okq, T + sidx, bp)
    for blk in range(T // _BLK):
        sl = slice(blk * _BLK, (blk + 1) * _BLK)         # static
        w0, w1, w2 = (
            jax.lax.dot_general(
                plu_ref[e, sl, :], feat_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            for e in range(3)
        )                                                # (BLK,TILE)
        pos = (w0 >= 0.0) & (w1 >= 0.0) & (w2 >= 0.0)
        neg = (w0 <= 0.0) & (w1 <= 0.0) & (w2 <= 0.0)

        njx, njy, njz = (trin_ref[sl, a:a + 1] for a in range(3))  # (BLK,1)
        d_dot_n = njx * dx + njy * dy + njz * dz         # (BLK,TILE)
        o_dot_n = njx * ox + njy * oy + njz * oz
        ok = jnp.abs(d_dot_n) > 1e-12
        t = (v0n_ref[sl, :] - o_dot_n) / jnp.where(ok, d_dot_n, 1.0)
        ok = (ok & (pos | neg) & (t > tmin) & (t < bt)
              & (mask_ref[sl, :] > 0.0))
        tblk = jnp.where(ok, t, BIG)

        th = jnp.min(tblk, axis=0, keepdims=True)        # (1,TILE)
        j = jnp.argmin(tblk, axis=0).astype(jnp.int32)[None, :]
        imp = th < bt
        bt = jnp.where(imp, th, bt)
        bp = jnp.where(imp, blk * _BLK + j, bp)
    bt_out[:] = bt
    bp_out[:] = bp


@functools.partial(jax.jit, static_argnames=("n_sph", "interpret"))
def _fused_pallas(o, d, tmin, tmax, sph, plu, trin, v0n, mask,
                  n_sph, interpret=False):
    n = o.shape[0]
    n_pad = -(-n // FTILE) * FTILE
    pad = n_pad - n

    def row(x, fill=0.0):
        return jnp.pad(x, [(0, pad)], constant_values=fill)[None, :]

    o_t = jnp.pad(o, [(0, pad), (0, 0)]).T               # (3,N)
    d_t = jnp.pad(d, [(0, pad), (0, 0)], constant_values=1.0).T
    m = jnp.cross(o, d)
    feat = jnp.pad(jnp.concatenate([d, m], axis=1),
                   [(0, pad), (0, 0)], constant_values=1.0).T  # (6,N)
    args = (feat, o_t, d_t, row(tmin), row(tmax),
            sph, plu, trin, v0n, mask)

    lane = lambda h: pl.BlockSpec((h, FTILE), lambda i: (0, i),
                                  memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    bt, bp = pl.pallas_call(
        functools.partial(_fused_kernel, n_sph=n_sph),
        grid=(n_pad // FTILE,),
        in_specs=[lane(6), lane(3), lane(3), lane(1), lane(1),
                  full(sph), full(plu), full(trin), full(v0n), full(mask)],
        out_specs=[lane(1), lane(1)],
        out_shape=[jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
                   jax.ShapeDtypeStruct((1, n_pad), jnp.int32)],
        interpret=interpret,
    )(*args)
    return bt[0, :n], bp[0, :n]


def _scene_args(sc):
    """Scene tables in kernel layout: spheres packed (4, S) rows
    [cx, cy, cz, r]; triangle tables tri-on-sublanes."""
    if sc.n_spheres:
        sph = jnp.concatenate([sc.sph_c.T, sc.sph_r[None, :]], axis=0)
    else:
        sph = jnp.zeros((4, 1), jnp.float32)   # unused (n_sph=0)
    return (sph,
            jnp.transpose(sc.plu, (0, 2, 1)),            # (3,T,6)
            sc.tri_n,                                    # (T,3)
            jnp.sum(sc.tri_v0 * sc.tri_n, axis=-1)[:, None],   # (T,1)
            sc.tri_mask[:, None])                        # (T,1)


def intersect_fused(scene, o, d, tmin, tmax, interpret=False):
    """Closest hit over ALL primitives (tris + analytic spheres), fully
    fused in VMEM (Hit SoA) — no XLA pre-pass."""
    od, dd, tn, tx = _detach(o, d, tmin, tmax)
    sc = jax.lax.stop_gradient(scene)
    t, prim = _fused_pallas(od, dd, tn, tx, *_scene_args(sc),
                            n_sph=scene.n_spheres, interpret=interpret)
    return finalize_hit(scene, o, d, t, prim, t < tmax)


def occluded_fused(scene, o, d, tmax, interpret=False):
    """Any-hit shadow predicate (nearest-hit form of the same kernel)."""
    o, d, tmax = _detach(o, d, tmax)
    sc = jax.lax.stop_gradient(scene)
    tmin = jnp.zeros(o.shape[:1], jnp.float32)
    t, _ = _fused_pallas(o, d, tmin, tmax, *_scene_args(sc),
                         n_sph=scene.n_spheres, interpret=interpret)
    return t < tmax
