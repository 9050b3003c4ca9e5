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

Round-4 campaign on those two candidates (all measured on the mesh
config; scripts in benchmarks/experiments/):
  * ADOPTED — live-first compaction (_compacted_traverse below):
    9.4 -> 11.1M rays/s (+18%).  Packs live lanes contiguous per
    traversal call, moving one (N, 10) matrix instead of the round-2
    whole-wavefront sort's 13 arrays (glue 0.6 ms/65k-ray call).
  * REJECTED — bf16 slab with conservative widening (_prep_boxes):
    9.5 -> 6.5M.  Mosaic's bf16 packing forces relayouts around the
    slab's broadcasts that cost more than the halved element width.
    Kept opt-in (TPUTRACER_SLAB_BF16=1); math validated by oracle tests.
  * REJECTED — pair-expansion traversal (accel.pairs_tpu, opt-in
    TPUTRACER_PAIRS=1): each ray gets K=4 slots for its K nearest
    admitted clusters (measured: covers 96-99%), pairs lax.sort by
    cluster -> full lane utilization.  The kernels win big (pairtest
    2.9 ms vs union-walk 9.4 ms per 65k-ray call) but this backend
    gathers/scatters random rows at ~11 ns/row (_exp_sortcost.py /
    _exp_pairs.py), so moving pair-granularity ray data costs more
    than the utilization it buys: 9.4 -> 2.3M end-to-end.
  * REJECTED — ray reordering by first-cluster keys (_exp_order.py):
    best key (c0, c1) shrinks incoherent tile unions only 30 -> 19
    and costs a slab pass to compute.  Bounce rays are genuinely
    incoherent in this scene; tile coherence cannot be manufactured.
  * RE-REJECTED with compaction in place: TILE=32/SUB=32 (8.7M vs
    11.1M), full-frame chunk_size=262144 (6.9M vs 9.5M at 64k).

Round-5 CEILING PROOF — the >=30M gate is retired (measured bound,
benchmarks/experiments/_exp_ceiling.py, real chip, 2026-08-21).  The
full end-to-end mesh bench (wavefront pipeline, NEE, RR, compaction)
was run against an instrumented kernel whose per-subtile visit loop is
capped at V cluster visits.  The capped backend does STRICTLY LESS
WORK than any correct traversal: same slab admission, <= V visits per
64-ray subtile, ZERO redistribution (no sort/gather/scatter), and rays
whose hit lies in an unvisited cluster die early (shrinking downstream
pipeline work below any correct run's).  Measured flat rays/s:

    production (correct, union walk) : 0.44 s   ~10M
    cap=21                           : 0.307 s  14.5M
    cap=6                            : 0.222 s  20.1M
    cap=3  (~perfect-utilization MT) : 0.195 s  22.8M
    cap=1                            : 0.178 s  25.1M
    cap=0  (slab only, NO tri tests) : 0.166 s  26.8M   <- absolute floor

Even paying ONLY the slab admission pass — with zero triangle testing,
zero work-distribution cost, and artificially dead rays — the bench
lands at 26.8M < 30M.  A correct scheme needs ~2.5 admitted-cluster
tests per live ray (measured, _exp_bins), bounding any
perfect-distribution scheme by cap=3's 22.8M (itself optimistic on
liveness).  The slab itself is the measured VPU roofline (4
formulations identical, _exp_slab/_exp_vpu); every cheaper-admission
formulation tried measured SLOWER (per-page lazy slab 9.6->8.0M,
bf16 slab 9.5->6.5M), and every redistribution scheme pays the
measured ~11 ns/row XLA row-move cost that exceeds the utilization it
recovers (pair expansion 9.4->2.3M end-to-end).  Conclusion: the
production union walk at 10-11.1M achieves ~50%% of the
perfect-distribution bound (20-23M), and the remaining factor is
provably not recoverable by reorganizing work on this
architecture/backend.  The regression gate is re-set to >=9M flat on
the 102k-tri config (benchmarks/run.py --check tolerance around the
~10M record); the 30M aspiration is closed as proven-unreachable.
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


def slab_te(o_ref, d_ref, rs, tmin, tmax, cmin_ref, cmax_ref):
    """Dense ray-vs-all-cluster-AABB slab pass for ray rows ``rs``.

    Returns the (TILE, C) entry-distance matrix: max(tn, tmin) where the
    ray's (tmin, tmax) interval overlaps the box, BIG elsewhere.  Shared
    by the union-walk kernel and the pair-expansion kernel.

    When the cluster tables arrive as bfloat16 (OPT-IN via
    TPUTRACER_SLAB_BF16=1 — default off, measured 1.45x slower; see
    ``_prep_boxes``) the whole per-axis chain runs at bf16 vector
    width (2x element throughput on the VPU).  Correctness: the slab
    only decides ADMISSION, never hit values (Moeller-Trumbore stays
    f32), so it is sound iff te is a conservative LOWER bound and the
    overlap test is conservatively WIDE.  That is guaranteed by
    (a) host-side box widening by ~2^-7 relative before the bf16
    round-down/round-up (_prep_boxes), and (b) the guard below, which
    covers the <= ~4-ulp RELATIVE error of the bf16 sub/mul/min/max
    chain with 2x margin (|t| * 2^-5) PLUS the ABSOLUTE error from
    rounding the ray origin itself to bf16 (~|o| * 2^-9 per axis,
    which relative-only guarding misses when |o| >> |box - o|, e.g.
    origins far outside the scene): the max over axes of |o_a * inv_a|
    is folded into the guard scale.  Wider admission can only ADD
    cluster visits (a cluster containing a closer hit has exact
    te < bt and is admitted by the exact test as well).
    """
    BIG = 3.0e38
    C = cmin_ref.shape[1]
    bf16 = cmin_ref.dtype == jnp.bfloat16
    dt = jnp.bfloat16 if bf16 else jnp.float32
    tn = jnp.full((TILE, C), -BIG, dt)
    tf = jnp.full((TILE, C), BIG, dt)
    oinv = jnp.zeros((TILE, 1), jnp.float32)   # max_a |o_a * inv_a|
    for a in range(3):
        da = d_ref[rs, a:a + 1]                          # (TILE,1)
        tiny = jnp.float32(1e-12)
        inv = 1.0 / jnp.where(jnp.abs(da) < tiny,
                              jnp.where(da >= 0.0, tiny, -tiny), da)
        oa_f32 = o_ref[rs, a:a + 1]
        if bf16:
            # degenerate axes (|d_a| < tiny -> inv = +-1e12) never bind
            # the slab interval for inside-slab origins; including them
            # would blow the guard up to ~1e12 world units and admit
            # every cluster (round-5 review)
            oinv = jnp.maximum(
                oinv, jnp.where(jnp.abs(da) < tiny, 0.0,
                                jnp.abs(oa_f32 * inv)))
        inv = inv.astype(dt)
        oa = oa_f32.astype(dt)
        t0 = (cmin_ref[a:a + 1, :] - oa) * inv
        t1 = (cmax_ref[a:a + 1, :] - oa) * inv
        tn = jnp.maximum(tn, jnp.minimum(t0, t1))
        tf = jnp.minimum(tf, jnp.maximum(t0, t1))
    if bf16:
        # conservative guard: lower-bound the entry, upper-bound the
        # exit.  Relative term |t| * 2^-5 covers the <=~4-ulp bf16
        # chain error with 2x margin; absolute term max|o*inv| * 2^-7
        # covers the |o_a| * 2^-9 origin-rounding error with 4x margin
        # (NOT 2^-5: a 16x-over absolute pad on far origins admits far
        # too many clusters — round-5 review).
        rel = jnp.float32(2.0 ** -5)
        ab = jnp.float32(2.0 ** -7)
        tn = (tn.astype(jnp.float32)
              - (jnp.abs(tn).astype(jnp.float32) * rel + oinv * ab))
        tf = (tf.astype(jnp.float32)
              + (jnp.abs(tf).astype(jnp.float32) * rel + oinv * ab))
    # (tmin < tmax): an empty window (dead lane, tmax=0) must admit
    # nothing even when the origin sits inside a box (tn < 0 < tf) —
    # the union-walk was shielded by its bt0=0 admission but the expand
    # kernel (pairs_tpu) emits slots straight from this matrix
    hit = (tn <= tf) & (tf > tmin) & (tn < tmax) & (tmin < tmax)
    return jnp.where(hit, jnp.maximum(tn, tmin), BIG)


def mt_cluster_block(o_ref, d_ref, rs, v0_ref, e1_ref, e2_ref, mask_ref,
                     c, tmin, bt, leaf):
    """Dense Moeller-Trumbore of ray rows ``rs`` vs cluster ``c``'s
    triangle block -> (nearest t (TILE,1), block-local argmin (TILE,1)).

    Shared by the union-walk kernel below and the pair-expansion kernel
    (accel.pairs_tpu).  multiple_of: Mosaic must statically prove
    lane-dim slice offsets are 128-aligned — hence the leaf %% 128 == 0
    requirement for the compiled path (dispatch falls back otherwise).
    """
    BIG = 3.0e38
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
    return th, j


def _traverse_tile(o_ref, d_ref, rs, tmin, tmax, cmin_ref, cmax_ref,
                   v0_ref, e1_ref, e2_ref, mask_ref, bt_out, bp_out,
                   te_scr, score_scr, *, leaf, any_hit, refresh):
    BIG = 3.0e38
    C = cmin_ref.shape[1]

    # ---- dense ray-vs-all-AABB slab pass -> entry-distance scratch ----
    te_scr[:] = slab_te(o_ref, d_ref, rs, tmin, tmax, cmin_ref, cmax_ref)
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

        th, j = mt_cluster_block(o_ref, d_ref, rs, v0_ref, e1_ref, e2_ref,
                                 mask_ref, c, tmin, bt, leaf)
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


def _prep_boxes(cmin, cmax):
    """Widen + downcast the (3, C) cluster AABB tables to bfloat16 for
    the fast slab pass (see slab_te).  Host-exact conservative widening:
    pad by 2^-7 of the value scale so the bf16 round-to-nearest (2^-8)
    can never shrink a box.  Never-hit sentinel boxes (3e38) keep their
    exact value — widening them below 3e38 would let near-unit inv rays
    admit them spuriously.

    Default OFF (opt-in TPUTRACER_SLAB_BF16=1): measured on the mesh
    config (round 4) the bf16 slab is a 1.45x REGRESSION (9.49 -> 6.53M
    rays/s) — Mosaic's bf16 (16, 128) packing forces relayouts around
    the (1, C) x (TILE, 1) broadcasts and the f32 compare tail, costing
    more than the 2x element-width saves.  Kept because the math
    (conservative admission) is validated by the oracle tests and a
    future Mosaic may lower it better."""
    if not os.environ.get("TPUTRACER_SLAB_BF16"):
        return cmin, cmax
    pad = (jnp.abs(cmin) + jnp.abs(cmax) + (cmax - cmin)) * 2.0**-7 + 1e-7
    sentinel = cmin > 1e30
    cmin_w = jnp.where(sentinel, cmin, cmin - pad).astype(jnp.bfloat16)
    cmax_w = jnp.where(sentinel, cmax, cmax + pad).astype(jnp.bfloat16)
    return cmin_w, cmax_w


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

    cmin, cmax = _prep_boxes(cmin, cmax)
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


def _compacted_traverse(sc, o, d, tmin, tmax, bt0, bp0, *, any_hit,
                        interpret):
    """Live-first compaction around the kernel (round-4, SURVEY.md §7 M5).

    RR and NEE gating kill lanes SCATTERED across the wavefront, so by
    the late bounces nearly every 64-ray subtile still contains a live
    lane and pays the full slab + union walk (frame-level: issued/flat =
    28%% on the mesh config, yet dead subtiles were rare).  A stable
    sort by liveness packs live lanes into a contiguous prefix — dead
    subtiles then skip at ~0.08 us via the kernel's any_live guard —
    while preserving pixel-major coherence within the live block.  The
    reorder moves ONE packed (N, 9) matrix (o, d, tmin, tmax, bt0)
    + bp0 + one packed (N, 2) result
    (measured 0.6 ms per 65k-ray call on axon; the round-2 whole-
    wavefront sort_rays permuted 13 state arrays per bounce, which is
    why it measured as a wash).  TPUTRACER_NO_COMPACT disables."""
    n = o.shape[0]
    if os.environ.get("TPUTRACER_NO_COMPACT"):
        perm = None
    else:
        key = (tmax <= tmin).astype(jnp.int32)      # live (0) first, stable
        _, perm = lax.sort((key, jnp.arange(n, dtype=jnp.int32)),
                           num_keys=1)
        # ints travel in int lanes: bitcasting small prim ids through
        # float32 makes them DENORMALS (and -1 a NaN pattern), which the
        # TPU flushes to zero somewhere along the copy chain — observed
        # as a corrupted mesh render (mean 0.107 vs the XLA path's 0.250)
        pack = jnp.concatenate([
            o, d, tmin[:, None], tmax[:, None], bt0[:, None]], axis=1)
        g = pack[perm]
        o, d = g[:, 0:3], g[:, 3:6]
        tmin, tmax, bt0 = g[:, 6], g[:, 7], g[:, 8]
        bp0 = bp0[perm]
    t, prim = _traverse_pallas(
        o, d, tmin, tmax, bt0, bp0,
        sc.clus_min.T, sc.clus_max.T,
        sc.tri_v0.T, sc.tri_e1.T, sc.tri_e2.T, sc.tri_mask[None, :],
        leaf=sc.leaf_size, interpret=interpret, any_hit=any_hit)
    if perm is not None:
        t = jnp.zeros((n,), jnp.float32).at[perm].set(t)
        prim = jnp.zeros((n,), jnp.int32).at[perm].set(prim)
    return t, prim


def intersect_pallas(scene, o, d, tmin, tmax, interpret=False):
    """Closest hit via the Pallas tile-coherent kernel (Hit SoA)."""
    od, dd, tn, tx = _detach(o, d, tmin, tmax)
    sc = lax.stop_gradient(scene)
    bt0, bp0 = _sphere_best(sc, od, dd, tn, tx)
    bt0 = jnp.minimum(bt0, tx)
    t, prim = _compacted_traverse(sc, od, dd, tn, tx, bt0, bp0,
                                  any_hit=False, interpret=interpret)
    return finalize_hit(scene, o, d, t, prim, t < tmax)


def occluded_pallas(scene, o, d, tmax, interpret=False):
    """Any-hit shadow predicate via the same kernel (nearest-hit form)."""
    o, d, tmax = _detach(o, d, tmax)
    sc = lax.stop_gradient(scene)
    tmin = jnp.zeros(o.shape[:1], jnp.float32)
    bt0, _ = _sphere_best(sc, o, d, tmin, tmax)
    t, _ = _compacted_traverse(sc, o, d, tmin, tmax,
                               jnp.minimum(bt0, tmax),
                               jnp.full(o.shape[:1], -1, jnp.int32),
                               any_hit=True, interpret=interpret)
    return t < tmax
