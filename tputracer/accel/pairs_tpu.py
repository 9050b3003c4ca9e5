"""Pair-expansion Pallas traversal (round-4 redesign of SURVEY.md §3.5).

The union-walk kernel (accel.traverse_tpu) is VPU-roofline-bound with a
measured ~6/64-lane utilization floor on incoherent bounce rays: a
64-ray tile collectively wants ~30 clusters while each ray only needs
~2.5 (benchmarks/experiments/_exp_bins.py / _exp_bins2.py, mesh config).
Sorting rays by first-cluster barely shrinks the union (30 -> 24), so
instead of making *tiles* coherent we make the WORK ITEMS coherent:

  1. **expand**: a slab-only Pallas kernel gives each ray K static slots
     holding its K nearest admitted clusters by entry distance
     (cid, te), plus ``bound`` = entry of the (K+1)-th cluster
     (BIG if fewer than K+1 admitted).  Measured: K=4 covers 96-98%% of
     closest-hit rays and ~99%% of shadow rays outright.
  2. **bin**: flatten to N*K (ray, cluster) pairs and lax.sort them by
     cluster id (measured 0.18 ms per 1M pairs on axon — cheap).  Empty
     slots and dead rays sort to the end, so dead work compacts away
     entirely — this also removes the dead-lane fragmentation that made
     flat throughput 3.6x the issued rate.
  3. **test**: a second Pallas kernel runs the dense Moeller-Trumbore
     block test per pair tile.  Because pairs are cluster-sorted, every
     64-lane tile wants 1-2 distinct clusters — full lane utilization
     instead of 6/64.
  4. **resolve**: fold the K slot results in entry order (first strict
     improvement wins — identical semantics to the front-to-back walk).
     A ray is resolved iff its best hit beats ``bound`` (provably no
     unvisited cluster can contain a closer hit).  The 2-4%% unresolved
     tail goes through the union-walk kernel, sorted unresolved-first so
     its dead-subtile skip makes resolved rays free.

Everything is statically shaped: K is a compile-time constant and the
sort/gather/scatter glue is plain XLA.  Oracles: accel.clustered /
brute force; ``interpret=True`` runs both kernels on CPU for CI.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tputracer.accel.bruteforce import finalize_hit
from tputracer.accel.clustered import _detach, _sphere_best
from tputracer.accel.traverse_tpu import (TILE, _traverse_pallas,
                                          mt_cluster_block, slab_te)

_BIG = 3.0e38

K = int(os.environ.get("TPUTRACER_PAIRK", "4"))      # slots per ray
SUB_A = 16     # ray subtiles per expand grid step
# pair subtiles per test grid step: 32 exceeded the 16M scoped-vmem
# limit (each unrolled subtile's (TILE,C) score-row temporaries are
# stack-allocated); 16 fits like the union-walk kernel's SUB=16
SUB_B = 16
if K < 2:
    raise ValueError(f"TPUTRACER_PAIRK={K}: need >= 2 slots")


# --------------------------------------------------------------- expand

def _expand_kernel(o_ref, d_ref, tmin_ref, tmax_ref, cmin_hbm, cmax_hbm,
                   cid_out, te_out, bound_out,
                   cmin_ref, cmax_ref, sem):
    BIG = 3.0e38
    C = cmin_ref.shape[1]

    @pl.when(pl.program_id(0) == 0)
    def _load():
        for src, dst in ((cmin_hbm, cmin_ref), (cmax_hbm, cmax_ref)):
            cp = pltpu.make_async_copy(src, dst, sem)
            cp.start()
            cp.wait()

    cid_out[:] = jnp.full(cid_out.shape, -1, jnp.int32)
    te_out[:] = jnp.full(te_out.shape, BIG, jnp.float32)
    bound_out[:] = jnp.full(bound_out.shape, BIG, jnp.float32)

    for s in range(SUB_A):
        rs = slice(s * TILE, (s + 1) * TILE)
        tmin = tmin_ref[rs]
        tmax = tmax_ref[rs]
        any_live = jnp.max(jnp.where(tmax > tmin, 1.0, 0.0)) > 0.0

        @pl.when(any_live)
        def _(rs=rs, tmin=tmin, tmax=tmax):
            te = slab_te(o_ref, d_ref, rs, tmin, tmax, cmin_ref, cmax_ref)
            iota_c = lax.broadcasted_iota(jnp.int32, (TILE, C), 1)
            for k in range(K):
                v = jnp.min(te, axis=1, keepdims=True)           # (TILE,1)
                c = jnp.argmin(te, axis=1).astype(jnp.int32)[:, None]
                cid_out[rs, k:k + 1] = jnp.where(v < BIG, c, -1)
                te_out[rs, k:k + 1] = v
                te = jnp.where(iota_c == c, BIG, te)
            bound_out[rs] = jnp.min(te, axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _expand_pallas(o, d, tmin, tmax, cmin, cmax, *, interpret=False):
    n = o.shape[0]
    blk = TILE * SUB_A
    n_pad = -(-n // blk) * blk
    pad = n_pad - n

    def pad0(x, fill=0.0):
        return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1),
                       constant_values=fill)

    args = (pad0(o), pad0(d, 1.0), pad0(tmin[:, None]), pad0(tmax[:, None]),
            cmin, cmax)
    ray2 = lambda w: pl.BlockSpec((blk, w), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
    cid, te, bound = pl.pallas_call(
        _expand_kernel,
        grid=(n_pad // blk,),
        in_specs=[ray2(3), ray2(3), ray2(1), ray2(1),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[ray2(K), ray2(K), ray2(1)],
        out_shape=[jax.ShapeDtypeStruct((n_pad, K), jnp.int32),
                   jax.ShapeDtypeStruct((n_pad, K), jnp.float32),
                   jax.ShapeDtypeStruct((n_pad, 1), jnp.float32)],
        scratch_shapes=[pltpu.VMEM(cmin.shape, cmin.dtype),
                        pltpu.VMEM(cmax.shape, cmax.dtype),
                        pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(*args)
    return cid[:n], te[:n], bound[:n, 0]


# ----------------------------------------------------------------- test

def _pairtest_kernel(o_ref, d_ref, tmin_ref, cid_ref, te_ref, bt_ref,
                     v0_hbm, e1_hbm, e2_hbm, mask_hbm,
                     t_out, p_out,
                     score_scr, v0_ref, e1_ref, e2_ref, mask_ref, sem,
                     *, leaf, n_clusters):
    BIG = 3.0e38
    C = n_clusters

    @pl.when(pl.program_id(0) == 0)
    def _load():
        for src, dst in ((v0_hbm, v0_ref), (e1_hbm, e1_ref),
                         (e2_hbm, e2_ref), (mask_hbm, mask_ref)):
            cp = pltpu.make_async_copy(src, dst, sem)
            cp.start()
            cp.wait()

    t_out[:] = jnp.full(t_out.shape, BIG, jnp.float32)
    p_out[:] = jnp.full(p_out.shape, -1, jnp.int32)

    for s in range(SUB_B):
        rs = slice(s * TILE, (s + 1) * TILE)
        cid = cid_ref[rs]                                # (TILE,1) int32
        te = te_ref[rs]
        bt = bt_ref[rs]
        want = (te < bt) & (cid >= 0)
        any_live = jnp.max(jnp.where(want, 1.0, 0.0)) > 0.0

        @pl.when(any_live)
        def _(rs=rs, cid=cid, te=te, bt=bt, want=want):
            iota_row = lax.broadcasted_iota(jnp.int32, (1, C), 1)
            iota_mat = lax.broadcasted_iota(jnp.int32, (TILE, C), 1)
            # distinct wanted clusters of this tile -> score row
            mat = jnp.where((iota_mat == cid) & want, te, BIG)
            score_scr[:] = jnp.min(mat, axis=0, keepdims=True)   # (1,C)
            tmin = tmin_ref[rs]

            def pick():
                row = score_scr[:]
                return (jnp.argmin(row[0]).astype(jnp.int32),
                        jnp.min(row))

            def body(state):
                c, _ = state
                score_scr[:] = jnp.where(iota_row == c, BIG, score_scr[:])
                # member lanes test against their own bt bound; others
                # are muted with bt=-BIG so the block test yields BIG
                bt_eff = jnp.where((cid == c) & want, bt, -BIG)
                th, j = mt_cluster_block(o_ref, d_ref, rs,
                                         v0_ref, e1_ref, e2_ref, mask_ref,
                                         c, tmin, bt_eff, leaf)
                imp = th < bt_eff
                t_out[rs] = jnp.where(imp, th, t_out[rs])
                p_out[rs] = jnp.where(imp, c * leaf + j, p_out[rs])
                return pick()

            c0, v0 = pick()
            lax.while_loop(lambda s_: s_[1] < BIG, body, (c0, v0))


@functools.partial(jax.jit, static_argnames=("leaf", "n_clusters",
                                             "interpret"))
def _pairtest_pallas(o, d, tmin, cid, te, bt, v0, e1, e2, mask, *,
                     leaf, n_clusters, interpret=False):
    n = o.shape[0]
    blk = TILE * SUB_B
    n_pad = -(-n // blk) * blk
    pad = n_pad - n

    def pad0(x, fill=0.0):
        return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1),
                       constant_values=fill)

    args = (pad0(o), pad0(d, 1.0), pad0(tmin[:, None]),
            pad0(cid[:, None], -1), pad0(te[:, None], _BIG),
            pad0(bt[:, None]), v0, e1, e2, mask)
    ray2 = lambda w: pl.BlockSpec((blk, w), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
    vmem = lambda a: pltpu.VMEM(a.shape, a.dtype)
    t, p = pl.pallas_call(
        functools.partial(_pairtest_kernel, leaf=leaf,
                          n_clusters=n_clusters),
        grid=(n_pad // blk,),
        in_specs=[ray2(3), ray2(3), ray2(1), ray2(1), ray2(1), ray2(1),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[ray2(1), ray2(1)],
        out_shape=[jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
                   jax.ShapeDtypeStruct((n_pad, 1), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((1, n_clusters), jnp.float32),
                        vmem(v0), vmem(e1), vmem(e2), vmem(mask),
                        pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(*args)
    return t[:n, 0], p[:n, 0]


# -------------------------------------------------------------- resolve

def _pair_traverse(sc, o, d, tmin, tmax, bt0, bp0, any_hit, interpret):
    """Expand -> bin -> test -> resolve; unresolved tail through the
    union-walk kernel (sorted unresolved-first).  Returns (t, prim)."""
    n = o.shape[0]
    C = sc.n_clusters
    cmin, cmax = sc.clus_min.T, sc.clus_max.T
    v0, e1, e2 = sc.tri_v0.T, sc.tri_e1.T, sc.tri_e2.T
    mask = sc.tri_mask[None, :]

    cid, tek, bound = _expand_pallas(o, d, tmin, tmax, cmin, cmax,
                                     interpret=interpret)

    npair = n * K
    flat_cid = cid.reshape(npair)
    key = jnp.where(flat_cid >= 0, flat_cid, jnp.int32(C + 1))
    _, sidx = lax.sort((key, jnp.arange(npair, dtype=jnp.int32)),
                       num_keys=1)
    ray = sidx // K
    pt_, pp_ = _pairtest_pallas(
        o[ray], d[ray], tmin[ray], flat_cid[sidx],
        tek.reshape(npair)[sidx], bt0[ray],
        v0, e1, e2, mask, leaf=sc.leaf_size, n_clusters=C,
        interpret=interpret)
    # back to slot order, then fold slots front-to-back (slots are te-
    # ascending, so first strict improvement == the walk's first hit)
    t_slots = jnp.zeros((npair,), jnp.float32).at[sidx].set(pt_)
    p_slots = jnp.zeros((npair,), jnp.int32).at[sidx].set(pp_)
    t_slots = t_slots.reshape(n, K)
    p_slots = p_slots.reshape(n, K)
    best_t, best_p = bt0, bp0
    for k in range(K):
        imp = t_slots[:, k] < best_t
        best_t = jnp.where(imp, t_slots[:, k], best_t)
        best_p = jnp.where(imp, p_slots[:, k], best_p)

    if any_hit:
        resolved = (best_t < tmax) | (bound >= tmax)
    else:
        resolved = best_t <= bound
    fkey = resolved.astype(jnp.int32)           # unresolved (0) first
    _, fidx = lax.sort((fkey, jnp.arange(n, dtype=jnp.int32)), num_keys=1)
    ftmax = jnp.where(resolved, 0.0, tmax)[fidx]
    ft, fp = _traverse_pallas(
        o[fidx], d[fidx], tmin[fidx], ftmax, best_t[fidx], best_p[fidx],
        cmin, cmax, v0, e1, e2, mask, leaf=sc.leaf_size,
        interpret=interpret, any_hit=any_hit)
    t = jnp.zeros((n,), jnp.float32).at[fidx].set(ft)
    prim = jnp.zeros((n,), jnp.int32).at[fidx].set(fp)
    return t, prim


def intersect_pairs(scene, o, d, tmin, tmax, interpret=False):
    """Closest hit via pair-expansion traversal (Hit SoA)."""
    od, dd, tn, tx = _detach(o, d, tmin, tmax)
    sc = lax.stop_gradient(scene)
    bt0, bp0 = _sphere_best(sc, od, dd, tn, tx)
    bt0 = jnp.minimum(bt0, tx)
    t, prim = _pair_traverse(sc, od, dd, tn, tx, bt0, bp0,
                             any_hit=False, interpret=interpret)
    return finalize_hit(scene, o, d, t, prim, t < tmax)


def occluded_pairs(scene, o, d, tmax, interpret=False):
    """Any-hit shadow predicate via pair-expansion traversal."""
    o, d, tmax = _detach(o, d, tmax)
    sc = lax.stop_gradient(scene)
    tmin = jnp.zeros(o.shape[:1], jnp.float32)
    bt0, _ = _sphere_best(sc, o, d, tmin, tmax)
    bt0 = jnp.minimum(bt0, tmax)
    t, _ = _pair_traverse(sc, o, d, tmin, tmax, bt0,
                          jnp.full(o.shape[:1], -1, jnp.int32),
                          any_hit=True, interpret=interpret)
    return t < tmax
