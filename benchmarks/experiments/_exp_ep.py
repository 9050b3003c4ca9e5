"""EP-row measurement (round-4 task 5): what would material-keyed
shading dispatch actually save?

The wavefront shades with masked-all-lobes evaluation: every lane pays
for diffuse + mirror + glass arithmetic and lane masks select.  The EP
analogue (MoE-style routing) would sort lanes by material and run only
the owning lobe per batch.  Upper bound on the win = (all-lobes shading
cost - single-lobe shading cost) as a share of the whole frame.

Measures, chained-in-jit on the real chip (axon protocol):
  1. per-lane cost of the full shading bundle (emitted + NEE eval +
     pdf + sample_bsdf, all lobes masked) on glass-config materials;
  2. the same bundle with materials forced all-DIFFUSE (what a
     perfectly-routed diffuse batch would pay);
  3. the cornell_glass frame cost per lane-bounce for scale.

Run on TPU: python benchmarks/experiments/_exp_ep.py
"""

import sys
import os
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tputracer import geometry as g
from tputracer.bsdf import (emitted, eval_bsdf, nee_nonspecular, pdf_bsdf,
                            sample_bsdf)
from tputracer.config import RenderConfig
from tputracer.scene import cornell_box
from tputracer.api import render


def timed_fetch(f, *a):
    np.asarray(jax.tree.leaves(f(*a))[0])
    np.asarray(jax.tree.leaves(f(*a))[0])
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(jax.tree.leaves(f(*a))[0])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


scene = cornell_box("spheres")
N = 1 << 20
r = np.random.default_rng(0)
n = jnp.asarray(r.normal(size=(N, 3)).astype(np.float32))
n = n / jnp.linalg.norm(n, axis=1, keepdims=True)
wo = jnp.asarray(r.normal(size=(N, 3)).astype(np.float32))
wo = wo / jnp.linalg.norm(wo, axis=1, keepdims=True)
wo = jnp.where(g.dot(wo, n)[:, None] < 0, -wo, wo)
wi = jnp.asarray(r.normal(size=(N, 3)).astype(np.float32))
wi = wi / jnp.linalg.norm(wi, axis=1, keepdims=True)
u0, u1, u2 = (jnp.asarray(r.uniform(size=N).astype(np.float32))
              for _ in range(3))
kinds = np.asarray(scene.mat_kind)
# glass-config material mix: mostly diffuse walls + mirror + glass lanes
mats_mixed = jnp.asarray(r.choice(len(kinds), N).astype(np.int32))
diff_id = int(np.nonzero(np.asarray(scene.mat_kind) == 0)[0][0])
mats_diff = jnp.full((N,), diff_id, jnp.int32)

R = 8


def make_bundle(mats):
    @jax.jit
    def bundle(n, wo, wi, u0, u1, u2):
        acc = jnp.float32(0)
        for i in range(R):
            nn = n + jnp.float32(i) * 1e-7
            le = emitted(scene, mats, nn, -wo)
            f = eval_bsdf(scene, mats, nn, wo, wi)
            p = pdf_bsdf(scene, mats, nn, wo, wi)
            want = nee_nonspecular(scene, mats)
            wi_s, wgt, pdf_b, is_d = sample_bsdf(scene, mats, nn, wo,
                                                 u0, u1, u2)
            acc += (le.sum() + f.sum() + p.sum() + wi_s.sum() + wgt.sum()
                    + pdf_b.sum() + want.sum() + is_d.sum())
        return acc
    return bundle

b_mixed = make_bundle(mats_mixed)
b_diff = make_bundle(mats_diff)
d1 = timed_fetch(b_mixed, n, wo, wi, u0, u1, u2)
d1b = timed_fetch(b_mixed, n, wo, wi, u0, u1, u2)
d2 = timed_fetch(b_diff, n, wo, wi, u0, u1, u2)
per_mixed = d1 / R / N * 1e9
per_diff = d2 / R / N * 1e9
print(f"all-lobes shading bundle: {per_mixed:.2f} ns/lane "
      f"(chain {d1*1e3:.2f} ms, repeat {d1b*1e3:.2f})")
print(f"diffuse-only bundle:      {per_diff:.2f} ns/lane")

cfg = RenderConfig(width=256, height=256, spp=64, max_bounces=6, rr_start=3)
np.asarray(render(scene, cfg)[0])
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    np.asarray(render(scene, cfg)[0])
    ts.append(time.perf_counter() - t0)
dt = float(np.median(ts))
lanes = 256 * 256 * 64 * (cfg.max_bounces + 1)   # shaded lane-bounces
print(f"cornell_glass frame: {dt:.3f} s -> {dt/lanes*1e9:.2f} ns per "
      f"shaded lane-bounce")
print(f"shading bundle share of frame: {per_mixed/(dt/lanes*1e9):.1%}; "
      f"EP upper bound (all-lobes - single-lobe): "
      f"{(per_mixed-per_diff)/(dt/lanes*1e9):.1%} of frame")
