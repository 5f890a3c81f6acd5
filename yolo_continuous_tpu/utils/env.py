"""Environment helpers (utils/helper_io.py:29-41 parity)."""
from __future__ import annotations

import datetime
import os
import subprocess
from pathlib import Path

_CACHE_DIR: str | None = None  # the dir actually configured this process


def setup_compile_cache(path: str | None = None) -> str:
    """Enable JAX's persistent compilation cache for this process.

    TPU compiles of the full train step are minutes-long (remote on this
    backend); without a persistent cache every CLI invocation — each
    seed of an A/B sweep, each resume shard of a long schedule — pays
    the compile again. Precedence: an explicit ``path`` argument, then a
    cache dir already configured on ``jax.config`` (e.g. by a test
    conftest — this function must not silently re-point it), then the
    ``JAX_COMPILATION_CACHE_DIR`` env var, then a per-user 0700 default
    (predictable world-shared /tmp paths invite cache poisoning). jax
    import stays inside the function (tests/test_import_hygiene.py:
    package import must not touch a backend).
    """
    global _CACHE_DIR
    if _CACHE_DIR is not None and path is None:
        return _CACHE_DIR
    import jax
    if path is None:
        configured = jax.config.jax_compilation_cache_dir
        if configured:
            _CACHE_DIR = configured
            return configured
    d = path or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        f"/tmp/yolo_continuous_tpu_xla_cache_{os.getuid()}")
    os.makedirs(d, mode=0o700, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _CACHE_DIR = d
    return d


def date_modified(path: str = __file__) -> str:
    """Human-readable mtime; helper_io.py:29-32."""
    t = datetime.datetime.fromtimestamp(Path(path).stat().st_mtime)
    return f"{t.year}-{t.month}-{t.day}"


def git_describe(path=None) -> str:
    """`git describe --tags --long --always`; helper_io.py:35-41."""
    path = path or Path(__file__).parent
    try:
        return subprocess.check_output(
            f"git -C {path} describe --tags --long --always",
            shell=True, stderr=subprocess.STDOUT).decode()[:-1]
    except subprocess.CalledProcessError:
        return ""
