"""Intersection backends + trace-time dispatch (SURVEY.md §2 rows 3-6).

Small scenes (Cornell-class) use the dense MXU brute-force contraction;
scenes built with a cluster BVH (scene.n_clusters > 0) traverse it.  The
dispatch is a Python branch on pytree shape, resolved at trace time —
zero runtime cost under jit.
"""

from tputracer.accel.bruteforce import (  # noqa: F401
    Hit,
    finalize_hit,
    intersect_brute,
    occluded_brute,
)
import os

import jax

from tputracer.accel.clustered import (  # noqa: F401
    intersect_clustered,
    occluded_clustered,
)


def _use_pallas(scene):
    """Pallas traversal on real TPU; XLA fallback elsewhere (and via the
    TPUTRACER_NO_PALLAS escape hatch — SURVEY.md §7 hard-part 1 requires
    the plain-XLA path to stay selectable).  The compiled kernel needs
    lane-aligned leaf blocks (leaf_size %% 128 == 0)."""
    if os.environ.get("TPUTRACER_NO_PALLAS"):
        return False
    return scene.leaf_size % 128 == 0 and jax.default_backend() == "tpu"


def _use_fused(scene):
    """Fused Pallas intersection for non-clustered scenes on TPU: needs
    the padded triangle count 128-aligned (make_scene default)."""
    if os.environ.get("TPUTRACER_NO_PALLAS"):
        return False
    return scene.n_tri_pad % 128 == 0 and jax.default_backend() == "tpu"


def _use_pairs(scene):
    """Pair-expansion traversal (accel.pairs_tpu) — opt-in via
    TPUTRACER_PAIRS=1.  Measured on axon (round 4,
    benchmarks/experiments/_exp_pairs.py): the scheme reaches 98%%+
    resolution at K=4 and full lane utilization, but this backend's
    random-row gather/scatter costs ~11 ns/row, so moving (ray, cluster)
    pair data (4x ray granularity) costs more than the union walk's
    utilization loss.  The live-first compaction wrapper on the
    union-walk kernel captures the dead-lane half of the win at ray
    granularity instead (traverse_tpu._compacted_traverse)."""
    if not os.environ.get("TPUTRACER_PAIRS"):
        return False
    return _use_pallas(scene)


def intersect(scene, o, d, tmin, tmax) -> Hit:
    """Closest-hit over the scene; backend picked by scene layout."""
    if scene.n_clusters:
        if _use_pairs(scene):
            from tputracer.accel.pairs_tpu import intersect_pairs

            return intersect_pairs(scene, o, d, tmin, tmax)
        if _use_pallas(scene):
            from tputracer.accel.traverse_tpu import intersect_pallas

            return intersect_pallas(scene, o, d, tmin, tmax)
        return intersect_clustered(scene, o, d, tmin, tmax)
    if _use_fused(scene):
        from tputracer.accel.intersect_tpu import intersect_fused

        return intersect_fused(scene, o, d, tmin, tmax)
    return intersect_brute(scene, o, d, tmin, tmax)


def occluded(scene, o, d, tmax):
    """Any-hit shadow predicate; backend picked by scene layout."""
    if scene.n_clusters:
        if _use_pairs(scene):
            from tputracer.accel.pairs_tpu import occluded_pairs

            return occluded_pairs(scene, o, d, tmax)
        if _use_pallas(scene):
            from tputracer.accel.traverse_tpu import occluded_pallas

            return occluded_pallas(scene, o, d, tmax)
        return occluded_clustered(scene, o, d, tmax)
    if _use_fused(scene):
        from tputracer.accel.intersect_tpu import occluded_fused

        return occluded_fused(scene, o, d, tmax)
    return occluded_brute(scene, o, d, tmax)
