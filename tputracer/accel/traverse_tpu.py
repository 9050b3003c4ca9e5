"""Pallas TPU traversal kernel (SURVEY.md §2 row 6, §3.5, §7 M4).

The BASELINE north_star: "recursive CPU KD-tree traversal becomes an
iterative Pallas kernel".  A literal per-lane short stack would need a
data-dependent *vector gather* per step (every lane chasing its own node
pointer) — the one access pattern TPU vector memory cannot do.  The
TPU-idiomatic redesign is **tile-coherent traversal** of the 2-level
cluster BVH (accel.bvh):

  * the whole scene lives in VMEM for the kernel's lifetime (SoA
    triangle arrays + cluster AABBs; ~4.5 MB for a 100k-tri scene with
    leaf_size=128 — comfortably inside the ~16 MB budget);
  * each grid step owns a TILE of rays.  It slab-tests all C cluster
    AABBs densely (one fused VPU pass into a (TILE, C) entry-distance
    scratch), then walks the **union** of clusters any lane still wants,
    globally front-to-back: per visit, one scalar-indexed contiguous
    slice of the triangle SoA and a dense (TILE, L) Moeller-Trumbore
    test on the VPU.  "If any lane needs a cluster, the whole tile tests
    it" — the vector analogue of the reference's per-ray near/far
    descent, with the per-lane stack replaced by the shared entry-
    distance matrix;
  * per-lane early-out is the (t_enter < best_t) predicate: lanes whose
    best hit beats every remaining entry distance stop pulling clusters
    in, and the kernel's while-loop ends when no lane wants more — the
    batch form of "early-out when hit.t < tmin" (SURVEY.md §3.5).

Everything is statically shaped; the only dynamic addressing is a
*scalar* cluster id slicing contiguous blocks — exactly what Mosaic
lowers well.  Correctness oracle: accel.clustered (XLA) and brute force;
``interpret=True`` runs the same kernel on CPU for CI (SURVEY.md §5
"sanitizers").

Round-3 cost decomposition (measured with CHAINED in-jit calls — single
dispatches are swamped by ~25 ms of axon tunnel latency; see
benchmarks/experiments/_exp_pertrip2.py):
  * slab pass: 2.55 us per live 64-ray subtile at C=936 — VPU roofline
    for the ~36-op (64,C) chain (measured identical for broadcast-,
    chunked-, MXU- and transposed-layout formulations: _exp_slab.py,
    _exp_vpu.py);
  * per cluster visit (pick + dense MT): ~0.26-0.33 us — also roofline
    for ~60 VPU ops on (64,128); MXU Pluecker/plane variants and
    leaf=256 measured SLOWER (_exp_v2.py);
  * trips per live subtile: coherent camera tiles mean 5.8 (p50=2),
    incoherent bounce tiles ~21 (_exp_trips.py) — the union walk's
    utilization floor (~6 of 64 lanes want each visited cluster).
Attempted and rejected with measurements:
  * lazy per-page slab (page prefilter + pl.when-guarded 128-cluster
    chunks): 9.6 -> 8.0 M rays/s — per-page scalar reduce + branch
    overhead exceeds the saved slab work;
  * bin-packing small SAH leaves into full 128-slots: occupancy 69->91%
    and C 936->704, but fat union boxes DOUBLED incoherent trips
    (9.6 -> 6.6 M rays/s);
  * per-bounce coherence sort (cfg.sort_rays): a wash (9.57 vs 9.64M)
    even with the dead-subtile skip — sorted-by-(cell, octant) unions
    stay far from camera-coherent.
The kernel is compute-bound at the VPU on both of its halves; further
gains need either narrower arithmetic with conservative widening (bf16
slab) or a different lane-utilization scheme for incoherent rays.
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

_BIG = jnp.float32(3.0e38)
# Rays per traversal subtile / subtiles per grid step.  Env-overridable
# for tuning experiments (TPUTRACER_TILE / TPUTRACER_SUB).
# TILE history: round-1 measured 64 -> 4.67M rays/s vs 128 -> 4.03M,
# 256 -> 2.76M, 32 -> 4.49M on the 82k-tri mesh config — but that
# predates SUB batching, the cached score row and the dead-subtile skip,
# all of which shrink the per-subtile fixed cost that penalised small
# tiles.  Small tiles shrink the UNION of clusters the tile must visit
# (incoherent bounce rays mean ~21 trips at TILE=64) AND halve the
# per-trip dense-MT cost, so TILE=32 is worth re-measuring whenever the
# trip economics change.  Round-3 re-measurement WITH score row + SUB +
# dead-subtile skip: TILE=32/SUB=32 -> 9.08M rays/s vs TILE=64's 9.83M
# (-8%): the incoherent union shrinks sublinearly (~21 -> ~15, not 10.5)
# while the slab pass runs twice per 64 rays.  TILE=64 stays.
# SUB: the axon backend charges ~1.3 us of step machinery per grid step
# (measured: an all-dead 65536-ray call costs 1.38 ms at one 64-ray tile
# per step — pure overhead); batching SUB subtiles per step amortizes it
# while keeping the TILE-ray union granularity.
TILE = int(os.environ.get("TPUTRACER_TILE", "64"))
SUB = int(os.environ.get("TPUTRACER_SUB", "16"))
# Validate overrides here rather than letting Mosaic fail with an opaque
# layout error: the lane (last) dim of every (TILE, ...) block must be a
# multiple of the 8-sublane tile, and SUB must divide the ray block evenly.
if TILE <= 0 or TILE % 8 != 0:
    raise ValueError(
        f"TPUTRACER_TILE={TILE}: must be a positive multiple of 8 "
        "(TPU sublane tiling)")
if SUB <= 0:
    raise ValueError(f"TPUTRACER_SUB={SUB}: must be >= 1")
if (TILE, SUB) != (64, 16):
    import warnings

    warnings.warn(
        f"tputracer: non-default traversal tiling TILE={TILE} SUB={SUB} "
        "(TPUTRACER_TILE/TPUTRACER_SUB set) — benchmark records will "
        "not be comparable to default-config runs", stacklevel=2)


def _traverse_kernel(o_ref, d_ref, tmin_ref, tmax_ref, bt0_ref, bp0_ref,
                     cmin_hbm, cmax_hbm, v0_hbm, e1_hbm, e2_hbm, mask_hbm,
                     bt_out, bp_out, te_scr, score_scr,
                     cmin_ref, cmax_ref, v0_ref, e1_ref, e2_ref, mask_ref,
                     sem, *, leaf, any_hit, refresh):
    BIG = 3.0e38          # python literal: captured jnp constants are
    C = cmin_ref.shape[1]  # not allowed in pallas kernels

    # Scene residency: the scene tables (~5 MB at 100k tris) arrive with
    # memory_space=ANY and are DMA-ed into persistent VMEM scratch ONCE,
    # on the first grid step.  Passing them as constant-index VMEM blocks
    # instead re-DMAs all ~5 MB on EVERY 64-ray grid step (~6 us/tile at
    # HBM bandwidth) — measured as the kernel's single dominant cost,
    # 4x the actual traversal compute.
    @pl.when(pl.program_id(0) == 0)
    def _load_scene():
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
        tmin = tmin_ref[rs]                              # (TILE,1)
        tmax = tmax_ref[rs]

        # Subtile-level early exit: the wavefront passes tmax=0 for dead
        # lanes (integrators/pt.py) and sorts dead lanes last, so whole
        # subtiles go dead after Russian roulette — a dead subtile costs
        # ~nothing here, which is what turns the alive-first sort into
        # real wavefront compaction (SURVEY.md §7 M5).
        any_live = jnp.max(jnp.where(tmax > tmin, 1.0, 0.0)) > 0.0

        @pl.when(any_live)
        def _tile_body(rs=rs, tmin=tmin, tmax=tmax):
            _traverse_tile(o_ref, d_ref, rs, tmin, tmax,
                           cmin_ref, cmax_ref, v0_ref, e1_ref, e2_ref,
                           mask_ref, bt_out, bp_out,
                           te_scr, score_scr, leaf=leaf, any_hit=any_hit,
                           refresh=refresh)


def _traverse_tile(o_ref, d_ref, rs, tmin, tmax, cmin_ref, cmax_ref,
                   v0_ref, e1_ref, e2_ref, mask_ref, bt_out, bp_out,
                   te_scr, score_scr, *, leaf, any_hit, refresh):
    BIG = 3.0e38
    C = cmin_ref.shape[1]

    # ---- dense ray-vs-all-AABB slab pass -> entry-distance scratch ----
    tn = jnp.full((TILE, C), -BIG)
    tf = jnp.full((TILE, C), BIG)
    for a in range(3):
        da = d_ref[rs, a:a + 1]                          # (TILE,1)
        tiny = jnp.float32(1e-12)
        inv = 1.0 / jnp.where(jnp.abs(da) < tiny,
                              jnp.where(da >= 0.0, tiny, -tiny), da)
        t0 = (cmin_ref[a:a + 1, :] - o_ref[rs, a:a + 1]) * inv
        t1 = (cmax_ref[a:a + 1, :] - o_ref[rs, a:a + 1]) * inv
        tn = jnp.maximum(tn, jnp.minimum(t0, t1))
        tf = jnp.minimum(tf, jnp.maximum(t0, t1))
    hit = (tn <= tf) & (tf > tmin) & (tn < tmax)
    te_scr[:] = jnp.where(hit, jnp.maximum(tn, tmin), BIG)
    # all vector state lives in VMEM scratch; the while-loop carries only
    # scalars (Mosaic cannot yield vectors through scf.while)
    iota_c = lax.broadcasted_iota(jnp.int32, (1, C), 1)

    # ---- cached pick row ----------------------------------------------
    # Per-trip cost is what decides this kernel's throughput: the round-1
    # version recomputed an exact (TILE, C) admission matrix + column-min
    # + argmin every trip, and that reduce-to-scalar chain (~0.5 us per
    # round trip) dominated the whole traversal.  Instead keep a (1, C)
    # SCORE row: score[c] = min over lanes of te[:, c] where the cluster
    # is still admissible, BIG otherwise.  Each trip only argmins the row
    # and marks the visited column BIG; the expensive bt-pruned recompute
    # runs every `refresh` trips.  A stale row can only ADMIT clusters a
    # fresh one would have pruned (bt shrinks monotonically), never skip
    # one — so the walk stays exact, just up to refresh-1 wasted visits
    # near the tail.
    def fresh_score():
        adm = jnp.where((te_scr[:] < bt_out[rs]) & (score_scr[:] < BIG),
                        te_scr[:], BIG)                      # (TILE,C)
        score_scr[:] = jnp.min(adm, axis=0, keepdims=True)   # (1,C)

    score_scr[:] = jnp.full((1, C), 0.0)   # "< BIG" = unvisited marker
    fresh_score()

    def pick():
        row = score_scr[:]
        return (jnp.argmin(row[0]).astype(jnp.int32), jnp.min(row))

    def body(state):
        k, c, _ = state
        # mark visited: BIG in the score row (Mosaic cannot scatter a
        # single lane column — dynamic lane indices must be 128-aligned —
        # so visiting is an iota-compare select over the whole row)
        score_scr[:] = jnp.where(iota_c == c, BIG, score_scr[:])
        bt = bt_out[rs]
        bp = bp_out[rs]

        # dense Moeller-Trumbore of the whole tile vs the cluster's block.
        # multiple_of: Mosaic must statically prove lane-dim slice offsets
        # are 128-aligned — hence the leaf %% 128 == 0 requirement for the
        # compiled path (the dispatcher falls back to XLA otherwise).
        sl = pl.ds(pl.multiple_of(c * leaf, 128) if leaf % 128 == 0
                   else c * leaf, leaf)
        v0x, v0y, v0z = (v0_ref[a:a + 1, sl] for a in range(3))  # (1,L)
        e1x, e1y, e1z = (e1_ref[a:a + 1, sl] for a in range(3))
        e2x, e2y, e2z = (e2_ref[a:a + 1, sl] for a in range(3))
        msk = mask_ref[0:1, sl]
        ox, oy, oz = (o_ref[rs, a:a + 1] for a in range(3))      # (TILE,1)
        dx, dy, dz = (d_ref[rs, a:a + 1] for a in range(3))

        px = dy * e2z - dz * e2y                                 # (TILE,L)
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

        th = jnp.min(tblk, axis=1, keepdims=True)                # (TILE,1)
        j = jnp.argmin(tblk, axis=1).astype(jnp.int32)[:, None]
        imp = th < bt
        if any_hit:
            # shadow rays: ANY hit occludes — drop the lane's horizon to
            # -BIG so it stops pulling clusters in (te < bt never holds)
            bt_out[rs] = jnp.where(imp, -BIG, bt)
        else:
            bt_out[rs] = jnp.where(imp, th, bt)
        bp_out[rs] = jnp.where(imp, c * leaf + j, bp)
        k = k + 1

        @pl.when(k % refresh == 0)
        def _():
            fresh_score()

        nc, nv = pick()
        return k, nc, nv

    c0, val0 = pick()
    lax.while_loop(lambda s: s[2] < BIG, body, (jnp.int32(0), c0, val0))


@functools.partial(jax.jit,
                   static_argnames=("leaf", "interpret", "any_hit"))
def _traverse_pallas(o, d, tmin, tmax, bt0, bp0, cmin, cmax,
                     v0, e1, e2, mask, *, leaf, interpret=False,
                     any_hit=False):
    n = o.shape[0]
    blk = TILE * SUB
    n_pad = -(-n // blk) * blk
    pad = n_pad - n   # padded rays get tmax=0 -> dead, skipped in-kernel

    def pad0(x, fill=0.0):
        return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1),
                       constant_values=fill)

    o_p, d_p = pad0(o), pad0(d, 1.0)
    args = (o_p, d_p,
            pad0(tmin[:, None]), pad0(tmax[:, None]),
            pad0(bt0[:, None]), pad0(bp0[:, None], -1),
            cmin, cmax, v0, e1, e2, mask)

    grid = (n_pad // blk,)
    ray2 = lambda w: pl.BlockSpec((blk, w), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
    # scene tables stay in HBM; the kernel DMAs them to VMEM scratch once
    hbm = lambda a: pl.BlockSpec(memory_space=pl.ANY)
    vmem = lambda a: pltpu.VMEM(a.shape, a.dtype)
    C = cmin.shape[1]
    # stale scores only ADD visits; refresh=4 measured best for closest
    # hits too (round 3 _exp_trips: incoherent trips 20.9 @4 vs 23.4 @8,
    # fresh_score costs ~0.19us per refresh — net win)
    refresh = 4
    bt, bp = pl.pallas_call(
        functools.partial(_traverse_kernel, leaf=leaf, any_hit=any_hit,
                          refresh=refresh),
        grid=grid,
        in_specs=[ray2(3), ray2(3), ray2(1), ray2(1), ray2(1), ray2(1),
                  hbm(cmin), hbm(cmax), hbm(v0), hbm(e1), hbm(e2),
                  hbm(mask)],
        out_specs=[ray2(1), ray2(1)],
        out_shape=[jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
                   jax.ShapeDtypeStruct((n_pad, 1), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((TILE, C), jnp.float32),
                        pltpu.VMEM((1, C), jnp.float32),
                        vmem(cmin), vmem(cmax), vmem(v0), vmem(e1),
                        vmem(e2), vmem(mask),
                        pltpu.SemaphoreType.DMA(())],
        # the DMA-once scene residency (program_id==0 loads the VMEM
        # scratch) is only sound if grid steps run sequentially on one
        # core — pin that instead of relying on the default (round-2
        # advisor: a future 'parallel' megacore split would leave one
        # core's scene scratch unloaded)
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(*args)
    return bt[:n, 0], bp[:n, 0]


def intersect_pallas(scene, o, d, tmin, tmax, interpret=False):
    """Closest hit via the Pallas tile-coherent kernel (Hit SoA)."""
    od, dd, tn, tx = _detach(o, d, tmin, tmax)
    sc = lax.stop_gradient(scene)
    bt0, bp0 = _sphere_best(sc, od, dd, tn, tx)
    bt0 = jnp.minimum(bt0, tx)
    t, prim = _traverse_pallas(
        od, dd, tn, tx, bt0, bp0,
        sc.clus_min.T, sc.clus_max.T,
        sc.tri_v0.T, sc.tri_e1.T, sc.tri_e2.T, sc.tri_mask[None, :],
        leaf=scene.leaf_size, interpret=interpret)
    return finalize_hit(scene, o, d, t, prim, t < tmax)


def occluded_pallas(scene, o, d, tmax, interpret=False):
    """Any-hit shadow predicate via the same kernel (nearest-hit form)."""
    o, d, tmax = _detach(o, d, tmax)
    sc = lax.stop_gradient(scene)
    tmin = jnp.zeros(o.shape[:1], jnp.float32)
    bt0, _ = _sphere_best(sc, o, d, tmin, tmax)
    t, _ = _traverse_pallas(
        o, d, tmin, tmax, jnp.minimum(bt0, tmax),
        jnp.full(o.shape[:1], -1, jnp.int32),
        sc.clus_min.T, sc.clus_max.T,
        sc.tri_v0.T, sc.tri_e1.T, sc.tri_e2.T, sc.tri_mask[None, :],
        leaf=scene.leaf_size, interpret=interpret, any_hit=True)
    return t < tmax
