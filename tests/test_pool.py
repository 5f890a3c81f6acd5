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


@pytest.mark.parametrize("k", [3, 5, 9, 13])
def test_sp_separable_exact(k):
    from yolo_continuous_tpu.nn.layers import sp
    x = jnp.asarray(np.random.RandomState(0).randn(2, 20, 20, 32),
                    jnp.float32)
    ref = nn.max_pool(x, (k, k), (1, 1), [(k // 2, k // 2)] * 2)
    assert bool(jnp.array_equal(sp(x, k), ref))


def test_sp_pyramid_cascade_exact_and_grad():
    from yolo_continuous_tpu.nn.layers import sp_pyramid
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(2, 20, 20, 16), jnp.float32)
    outs = sp_pyramid(x, (5, 9, 13))
    for k, o in zip((5, 9, 13), outs):
        ref = nn.max_pool(x, (k, k), (1, 1), [(k // 2, k // 2)] * 2)
        assert bool(jnp.array_equal(o, ref)), k

    def f_cas(y):
        return jnp.sum(jnp.stack([jnp.sum(o * (i + 1))
                                  for i, o in enumerate(sp_pyramid(y, (5, 9, 13)))]))

    def f_dir(y):
        return jnp.sum(jnp.stack([
            jnp.sum(nn.max_pool(y, (k, k), (1, 1), [(k // 2, k // 2)] * 2)
                    * (i + 1)) for i, k in enumerate((5, 9, 13))]))

    g1, g2 = jax.grad(f_cas)(x), jax.grad(f_dir)(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)


def test_sp_pyramid_non_cascadable_falls_back():
    from yolo_continuous_tpu.nn.layers import sp_pyramid
    x = jnp.asarray(np.random.RandomState(2).randn(1, 9, 9, 4), jnp.float32)
    for k, o in zip((5, 3), sp_pyramid(x, (5, 3))):
        ref = nn.max_pool(x, (k, k), (1, 1), [(k // 2, k // 2)] * 2)
        assert bool(jnp.array_equal(o, ref)), k
