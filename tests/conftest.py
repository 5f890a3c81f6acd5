"""Test configuration: force an 8-device virtual CPU mesh.

SURVEY.md §4: multi-device behavior is tested on CPU via
``--xla_force_host_platform_device_count=8`` (the TPU-world substitute for
multi-node testing). Must run before jax is imported anywhere.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
