"""Multi-device (8 virtual CPU devices) sharding tests (SURVEY §4d)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolo_continuous_tpu.parallel.mesh import (data_sharding, make_mesh,
                                               param_sharding_rule,
                                               shard_batch, shard_params)


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    return make_mesh(4, 2)


def test_mesh_shape(mesh8):
    assert mesh8.shape == {"data": 4, "model": 2}


def test_batch_sharding(mesh8):
    x = jnp.arange(8 * 4, dtype=jnp.float32).reshape(8, 4)
    xs = shard_batch(mesh8, {"x": x})["x"]
    assert xs.sharding.spec[0] == "data"
    np.testing.assert_array_equal(np.asarray(xs), np.asarray(x))


def test_param_rule_shards_large_kernels(mesh8):
    rule = param_sharding_rule(mesh8, min_channels=64)
    big = jnp.zeros((3, 3, 64, 128))
    small = jnp.zeros((3, 3, 8, 16))
    assert rule(big).spec == jax.sharding.PartitionSpec(None, None, None, "model")
    assert rule(small).spec == jax.sharding.PartitionSpec()


def test_sharded_matmul_matches_single_device(mesh8):
    """A data-sharded computation must equal the unsharded one."""
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(8, 32).astype(np.float32))
    w = jnp.asarray(rs.randn(32, 16).astype(np.float32))

    def f(x, w):
        return jnp.tanh(x @ w).sum(axis=1)

    ref = jax.jit(f)(x, w)
    xs = jax.device_put(x, data_sharding(mesh8, 2))
    ws = jax.device_put(w, jax.sharding.NamedSharding(
        mesh8, jax.sharding.PartitionSpec()))
    out = jax.jit(f)(xs, ws)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_dryrun_entrypoint():
    """__graft_entry__.dryrun_multichip runs a full sharded train step."""
    import __graft_entry__ as ge
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    ge.dryrun_multichip(8)
