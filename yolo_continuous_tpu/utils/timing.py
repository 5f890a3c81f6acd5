"""Timing / profiling utilities.

Parity targets + upgrades (SURVEY §5 "tracing/profiling"):
- ``utils/helper_torch.py:10-20`` ``timer`` decorator (wall-time print)
- NEW: device-accurate timing via ``block_until_ready`` and a
  ``jax.profiler`` trace context (the reference has no profiler hooks).
"""
from __future__ import annotations

import contextlib
import time
from functools import wraps


def timer(func):
    """Print wall time of each call; helper_torch.py:10-20."""
    @wraps(func)
    def wrapper(*args, **kwargs):
        t0 = time.time()
        result = func(*args, **kwargs)
        print("{0} cost:\t{1:.3f}s".format(func.__name__, time.time() - t0))
        return result
    return wrapper


def device_timer(func):
    """Like ``timer`` but blocks on device results for honest numbers."""
    import jax

    @wraps(func)
    def wrapper(*args, **kwargs):
        t0 = time.perf_counter()
        result = func(*args, **kwargs)
        jax.block_until_ready(result)
        print("{0} device cost:\t{1:.3f}s".format(
            func.__name__, time.perf_counter() - t0))
        return result
    return wrapper


def time_fn(fn, *args, iters: int = 10, warmup: int = 1):
    """Median-ish per-call seconds of a jitted fn (compile excluded)."""
    import jax
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


@contextlib.contextmanager
def profile_trace(logdir: str = "/tmp/jax-trace"):
    """jax.profiler trace context (open with TensorBoard/xprof)."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def select_device(device: str = ""):
    """Backend selection; the TPU-world analogue of
    ``utils/helper_torch.py:23-45`` (CUDA_VISIBLE_DEVICES setup).

    device: '' -> default backend; 'cpu'/'tpu' -> force that platform
    (must run before the backend initializes). Returns jax.devices().
    """
    import jax
    if device:
        name = "cpu" if device.lower() == "cpu" else device
        try:
            jax.config.update("jax_platforms", name)
        except RuntimeError:
            pass  # backend already initialized
    return jax.devices()
