"""Pallas fused decode kernel vs the XLA decode oracle."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolo_continuous_tpu.kernels.decode_pallas import decode_level_pallas
from yolo_continuous_tpu.ops.decode import decode_level

ANCHORS = ((12.0, 16.0), (19.0, 36.0), (40.0, 28.0))


@pytest.mark.parametrize("normalized", [True, False])
def test_matches_xla_decode(normalized):
    rs = np.random.RandomState(0)
    pred = jnp.asarray(rs.randn(2, 8, 8, 3, 7).astype(np.float32))
    a = jnp.asarray(ANCHORS)
    ref = decode_level(pred, a, 32.0, normalized)
    interp = jax.default_backend() != "tpu"
    got = decode_level_pallas(pred, ANCHORS, 32.0, normalized,
                              interpret=interp)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("normalized", [True, False])
def test_bin_kernel_matches_xla(normalized):
    from yolo_continuous_tpu.kernels.bin_decode_pallas import \
        decode_level_bin_pallas
    from yolo_continuous_tpu.ops.decode import decode_level_bin
    rs = np.random.RandomState(1)
    nc, L = 2, 22
    no = nc + 3 + 2 * L
    pred = jnp.asarray(rs.randn(2, 8, 8, 3, no).astype(np.float32))
    a = jnp.asarray(ANCHORS)
    ref = decode_level_bin(pred, a, 16.0, 21, normalized)
    interp = jax.default_backend() != "tpu"
    got = decode_level_bin_pallas(pred, ANCHORS, 16.0, 21, normalized,
                                  interpret=interp)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_pointwise_conv_matches_xla():
    """Pallas fused conv+BN+SiLU tail == the identical XLA graph
    (interpret mode off-TPU), including the non-multiple-row padding."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from yolo_continuous_tpu.kernels.fused_conv_pallas import (
        fused_pointwise_conv, xla_pointwise_conv)

    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(2, 5, 7, 64), jnp.float32)   # 70 rows -> pads
    w = jnp.asarray(rs.randn(64, 128) * 0.1, jnp.float32)
    s = jnp.asarray(rs.rand(128) + 0.5, jnp.float32)
    b = jnp.asarray(rs.randn(128) * 0.1, jnp.float32)
    interpret = jax.default_backend() != "tpu"
    got = np.asarray(fused_pointwise_conv(x, w, s, b, block_m=128,
                                          interpret=interpret))
    want = np.asarray(xla_pointwise_conv(x, w, s, b))
    assert got.shape == (2, 5, 7, 128)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
