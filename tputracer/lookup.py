"""Gather-free small-table lookups (TPU performance primitive).

TPU vector memory has no fast dynamic gather: ``table[idx]`` for a
(1M,)-index fetch from even a 6-row table measures ~2.5 ms on a v5e,
while the algebraically identical ``one_hot(idx) @ table`` runs in ~11 us
(230x) because it is a dense MXU contraction.  Every per-lane lookup into
a small SoA table (materials, emitters, spheres) goes through here.

Both forms are linear in the table, so gradients (d/dtable = one_hotT @ g)
are identical — material/emission differentiability is preserved.
Tables larger than ``threshold`` rows fall back to a real gather (the
one-hot matmul is O(N*M) work; mesh-sized triangle tables stay gathered).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_THRESHOLD = 2048


def fetch(table, idx, threshold=_THRESHOLD):
    """table (M,) or (M, K) indexed by idx (N,) int -> (N,) / (N, K)."""
    m = table.shape[0]
    if m > threshold or table.ndim > 2:
        return table[idx]
    oh = jax.nn.one_hot(idx, m, dtype=jnp.float32)        # (N,M)
    # HIGHEST precision: the TPU MXU defaults to bf16 passes, which would
    # round emitter positions / material params / int ids on TPU while CPU
    # tests see full f32 (and break fetch_int's 2^24-exactness contract).
    return jnp.matmul(oh, table, precision=jax.lax.Precision.HIGHEST)


def fetch_int(table, idx, threshold=_THRESHOLD):
    """Integer-table variant: exact for |values| < 2^24 (float32 mantissa)."""
    m = table.shape[0]
    if m > threshold:
        return table[idx]
    out = fetch(table.astype(jnp.float32), idx, threshold)
    return jnp.round(out).astype(table.dtype)
