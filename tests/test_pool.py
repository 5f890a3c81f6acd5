"""Non-overlapping max_pool rewrite (round 5).

reports/profile_step.json attributed 10.5 ms of the 100.8 ms flagship
train step to select_and_scatter — lax.reduce_window's maxpool VJP —
from the three MP transitions (nets/common.py:25-31 semantics). The
reshape+jnp.max form is value-identical forward and grad-identical on
continuous inputs, with an elementwise backward.
"""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_continuous_tpu.nn.layers import max_pool


@pytest.mark.parametrize("k,s,p,h", [(2, 2, 0, 8), (2, 2, 0, 64),
                                     (5, 5, 0, 10), (3, 1, 1, 8),
                                     (2, 2, 0, 6)])
def test_max_pool_matches_reduce_window(k, s, p, h):
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, h, h, 16), jnp.float32)
    ref = nn.max_pool(x, (k, k), (s, s), [(p, p), (p, p)])
    got = max_pool(x, k, s, p)
    assert got.shape == ref.shape
    assert bool(jnp.array_equal(got, ref))

    def f(pool):
        return lambda y: jnp.sum(jnp.sin(pool(y)) * 1.7)

    g_new = jax.grad(f(lambda y: max_pool(y, k, s, p)))(x)
    g_ref = jax.grad(f(lambda y: nn.max_pool(
        y, (k, k), (s, s), [(p, p), (p, p)])))(x)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               atol=1e-6)


def test_non_overlapping_backward_has_no_select_and_scatter():
    hlo = jax.jit(jax.grad(lambda x: jnp.sum(max_pool(x, 2, 2)))).lower(
        jnp.zeros((1, 8, 8, 4))).as_text()
    assert "select_and_scatter" not in hlo


def test_odd_spatial_falls_back():
    # H % k != 0: must still produce reduce_window semantics (floor).
    x = jnp.asarray(np.random.RandomState(1).randn(1, 7, 7, 4), jnp.float32)
    ref = nn.max_pool(x, (2, 2), (2, 2), [(0, 0), (0, 0)])
    assert bool(jnp.array_equal(max_pool(x, 2, 2), ref))
