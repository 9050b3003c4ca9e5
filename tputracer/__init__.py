"""tputracer — a TPU-native differentiable path tracer.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
reference C++ offline renderer ``winmad/Winmad-s-raytracer-v1.0``
(unidirectional path tracing with NEE + Russian roulette, bidirectional
path tracing with vertex connection + MIS, KD-tree/BVH ray-triangle and
ray-sphere intersection, diffuse/specular/refractive BSDFs, scene loading,
image output) — redesigned TPU-first:

* recursion inverted into bounce-major **wavefront** loops inside one jit,
* intersection as batched **Pluecker matmuls** (MXU) / stackless BVH kernels,
* counter-based, placement-invariant **hash RNG** (no sampler state),
* **differentiable** shading (detached-sampling estimator) — a new
  capability on top of the reference,
* multi-chip scaling via ``jax.sharding`` meshes + ``shard_map``.

NOTE on citations: the reference mount ``/root/reference`` was empty in
rounds surveyed so far (see SURVEY.md header), so docstrings cite the
capability spec in ``BASELINE.json``/``SURVEY.md`` sections instead of
``file:line`` into the reference tree.
"""

__version__ = "0.1.0"

from tputracer.api import (grad_render, render,  # noqa: F401
                           render_bdpt, render_bdpt_progressive,
                           render_progressive)
