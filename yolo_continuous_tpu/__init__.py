"""yolo_continuous_tpu — a TPU-native (JAX/XLA/Pallas) object-detection framework.

Re-implements the full capability surface of the reference YOLOv7-style
detector (xin-pu/yolo-continuous) with a TPU-first design:

- NHWC layouts, bf16 compute with fp32 params/statistics,
- a YAML-driven model builder that compiles to ONE static XLA graph,
- static-shape SimOTA loss (vmap over batch, padded ground truth),
- a batched on-device augmentation graph (mosaic/mixup/HSV/flip/jitter),
- on-device fixed-capacity NMS (no host round-trip),
- pjit/Mesh data+tensor parallelism via jax.sharding,
- a torch-semantics-exact optimizer (SGD-Nesterov/Adam) with the
  reference's 3-param-group policy, EMA, warm-up + decay schedules,
  atomic msgpack checkpointing with exact resume, and a mAP evaluator.

Reference parity citations use ``file:line`` into the upstream repo.
"""

__version__ = "0.1.0"


def _honor_jax_platforms_env():
    """Restore the documented ``JAX_PLATFORMS`` semantics.

    This deployment's TPU plugin ignores the env var and would still be
    selected (dialing its remote device) at first backend init; mirroring
    the env var into jax's config — which the plugin does honor — makes
    ``JAX_PLATFORMS=cpu <any script>`` actually stay on CPU. No backend
    is initialized here (tests/test_import_hygiene.py guards that), and
    an already-initialized backend wins (RuntimeError swallowed)."""
    import os
    plats = os.environ.get("JAX_PLATFORMS", "").strip()
    if plats:
        import jax
        # NB mirrors the ENV VAR verbatim — a caller that wants a
        # different platform than its environment (e.g. a test harness
        # pinning cpu) must set os.environ["JAX_PLATFORMS"], not only
        # jax.config (the config's env-derived default is exactly what
        # the plugin ignores, so "config already set" is undetectable).
        try:
            jax.config.update("jax_platforms", plats)
        except (RuntimeError, ValueError):
            pass


_honor_jax_platforms_env()
