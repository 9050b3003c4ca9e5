"""RNG tests (SURVEY.md §4 item 1): NumPy/JAX bitwise parity + uniformity."""

import numpy as np
import jax.numpy as jnp

from tputracer import rng


def test_np_jax_bitwise_identical():
    uid = np.arange(4096, dtype=np.uint32)
    for salt_, seed in [(0, 0), (7, 123), (255, 2**31)]:
        a = rng.uniform3_np(uid, salt_, seed)
        b = rng.uniform3(jnp.asarray(uid), salt_, seed)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, np.asarray(y))


def test_uniformity_moments():
    uid = np.arange(200_000, dtype=np.uint32)
    u0, u1, u2 = rng.uniform3_np(uid, 3, 42)
    for u in (u0, u1, u2):
        assert 0.0 <= u.min() and u.max() < 1.0
        assert abs(u.mean() - 0.5) < 2e-3
        assert abs(u.var() - 1.0 / 12.0) < 2e-3


def test_streams_decorrelated():
    uid = np.arange(100_000, dtype=np.uint32)
    a = rng.uniform3_np(uid, 0, 0)[0]
    b = rng.uniform3_np(uid, 1, 0)[0]
    c = rng.uniform3_np(uid, 0, 1)[0]
    assert abs(np.corrcoef(a, b)[0, 1]) < 0.01
    assert abs(np.corrcoef(a, c)[0, 1]) < 0.01
