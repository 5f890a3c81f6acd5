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
