"""Frozen, hashable configs — static jit arguments (SURVEY.md §5 "Config").

Shape-affecting knobs (resolution, spp, bounces, chunk size) live here so
changing them recompiles cleanly; everything runtime-valued lives in the
Scene pytree.
"""

from __future__ import annotations

from dataclasses import dataclass, replace


@dataclass(frozen=True)
class RenderConfig:
    width: int = 512
    height: int = 512
    spp: int = 16
    max_bounces: int = 4          # scatter events; total path verts = +1
    rr_start: int = 3             # first bounce with Russian roulette
    seed: int = 0
    mis: bool = False             # False = NEE-only (reference semantics,
                                  # SURVEY.md §3.2); True = power-heuristic
                                  # MIS between NEE and BSDF sampling
    chunk_size: int = 1 << 20     # wavefront paths per chunk (memory knob)
    transport_radiance: bool = True
    remat: bool = False           # jax.checkpoint each bounce: backward
                                  # stores only the per-bounce carry
                                  # (o,d,thr,L,masks ~ 13 floats/path)
                                  # and recomputes bounce internals —
                                  # trades forward FLOPs for backward
                                  # HBM traffic in inverse rendering.
                                  # Primal math is identical (same step
                                  # function either way).
                                  # Round-4 payoff datum: at the small
                                  # bench config the backward is tunnel-
                                  # latency-bound (remat is a no-op
                                  # there), and at the first scale where
                                  # memory could matter (256^2, 6
                                  # bounces, K=4 chain: 45.8 steps/s
                                  # without remat) the CHECKPOINTED
                                  # program fails to compile within 30
                                  # min on the axon backend (3 attempts,
                                  # 2026-08-21).  Keep off until the
                                  # backend's compile scaling improves;
                                  # correctness stays covered by
                                  # tests/unit/test_grad.py remat tests.
                                  # Retry trigger tracked in
                                  # benchmarks/experiments/README.md
                                  # ("toolchain-blocked retries").
    # PP analogue (bounce-stage pipelining, SURVEY.md §2 PP row):
    # REJECTED with data, round 4 (benchmarks/experiments/_exp_pp.py).
    # Within a chip: chained traversal-kernel pairs with NO data
    # dependence run no faster than dependent pairs (0.64x, i.e.
    # slower) — the TPU executor runs kernels serially, so issuing
    # bounce k's traversal "before" bounce k-1's NEE shading cannot
    # overlap anything; XLA already owns the schedule.  Across chips:
    # pipelining bounce stages would ship the full wavefront state over
    # ICI every bounce and idle devices during fill/drain, strictly
    # dominated by DP (rays are embarrassingly parallel with zero
    # steady-state forward comm, dist/mesh.py).  No flag on purpose.
    # EP analogue (material-keyed shading dispatch, SURVEY.md §2 EP row):
    # REJECTED with data, round 4 (benchmarks/experiments/_exp_ep.py).
    # The full masked-all-lobes shading bundle (emitted + NEE eval + pdf
    # + sample, diffuse/mirror/glass) costs 3.25 ns/lane on the glass
    # config vs 3.32 ns/lane for a perfectly-routed single-lobe batch —
    # XLA fuses the masked lobes into the same bandwidth-bound
    # elementwise sweep, so MoE-style routing has NOTHING to win (upper
    # bound measured at -0.6% of frame) and would add two permutes per
    # bounce.  No flag is provided on purpose.
    sort_rays: bool = False       # M5: re-sort the wavefront by (alive,
                                  # direction octant, origin cell) each
                                  # bounce. Measured on the mesh config
                                  # (round 2): a wash (-5%%) once the
                                  # traversal kernel got any-hit exit +
                                  # TILE=64. Round 3: the 8-bounce mesh
                                  # program with per-bounce argsort +
                                  # full-state gathers additionally
                                  # fails to compile within 20 min on
                                  # the axon backend (two attempts) —
                                  # stays default-off; prefer the
                                  # in-kernel dead-subtile skip, which
                                  # captures the compaction win without
                                  # the sort.

    def with_(self, **kw):
        return replace(self, **kw)


@dataclass(frozen=True)
class BdptConfig:
    """Bidirectional path tracer config (SURVEY.md §3.3).

    ``max_bounces`` mirrors RenderConfig: a full path has at most
    ``max_bounces + 2`` vertices including the camera, so PT and BDPT
    with equal ``max_bounces`` integrate the same path space — the
    PT<->BDPT convergence tests (SURVEY.md §4 item 3) rely on this.
    """
    width: int = 512
    height: int = 512
    spp: int = 16
    max_bounces: int = 4          # max surface scatter events on a full path
    seed: int = 0
    chunk_size: int = 1 << 16
    transport_radiance: bool = True
    mis_power: bool = False       # False = balance heuristic; True =
                                  # Veach power heuristic (beta=2).
                                  # SURVEY §3.3 describes the reference
                                  # as power-heuristic but the mount is
                                  # empty (SURVEY §0): default stays
                                  # balance until a re-survey settles it.

    def with_(self, **kw):
        return replace(self, **kw)


@dataclass(frozen=True)
class DistConfig:
    """Device-mesh layout for multi-chip / multi-host rendering."""
    axis_name: str = "rays"
    num_devices: int = 1          # 1 = single-device (no shard_map)
