"""Test configuration: force an 8-device virtual CPU mesh.

SURVEY.md §4: multi-device behavior is tested on CPU via
``--xla_force_host_platform_device_count=8`` (the TPU-world substitute for
multi-node testing). The axon TPU plugin ignores the JAX_PLATFORMS env
var, so the config update below (which it does honor) is the load-bearing
part; it must run before any jax backend is initialized.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
