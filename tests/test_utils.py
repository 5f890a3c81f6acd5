"""Utility helpers coverage (utils/helper_cv.py, helper_io.py, helper_torch.py parity)."""
import numpy as np
import pytest

from yolo_continuous_tpu.utils.env import date_modified, git_describe
from yolo_continuous_tpu.utils.image import (chw_to_hwc, hwc_to_chw,
                                             resize_and_padding,
                                             resize_by_largeborder)
from yolo_continuous_tpu.utils.timing import time_fn, timer


def test_layout_roundtrip():
    img = np.random.RandomState(0).rand(4, 6, 3)
    np.testing.assert_array_equal(chw_to_hwc(hwc_to_chw(img)), img)
    assert hwc_to_chw(img).shape == (3, 4, 6)


def test_resize_helpers():
    cv2 = pytest.importorskip("cv2")
    img = np.zeros((30, 60, 3), np.uint8)
    out = resize_by_largeborder(img, 120)
    assert max(out.shape[:2]) == 120 and out.shape[:2] == (60, 120)
    canvas = resize_and_padding(img, (64, 64))
    assert canvas is not None  # reference forgets the return (fixed)
    assert canvas.shape == (64, 64, 3)


def test_timer_decorator(capsys):
    @timer
    def f(x):
        return x + 1
    assert f(1) == 2
    assert "cost" in capsys.readouterr().out


def test_time_fn():
    import jax, jax.numpy as jnp
    g = jax.jit(lambda x: x * 2)
    dt = time_fn(g, jnp.ones(8), iters=3)
    assert dt >= 0


def test_env_helpers():
    assert date_modified(__file__)
    # inside this git repo, describe returns a hash string
    assert isinstance(git_describe("."), str)


def test_generate_colors():
    from yolo_continuous_tpu.detect_api import generate_colors
    cols = generate_colors(5)
    assert len(cols) == 5 and all(len(c) == 3 for c in cols)
    assert len(set(cols)) == 5


def test_compile_cache_respects_preconfigured_dir():
    """ADVICE r4: setup_compile_cache() must not re-point a cache dir
    already configured on jax.config (the conftest sets the repo-local
    tests/.xla_cache; the first Trainer/Detector constructed in the
    suite used to silently swap it for /tmp)."""
    import jax

    from yolo_continuous_tpu.utils import env as env_mod
    from yolo_continuous_tpu.utils.env import setup_compile_cache

    before = jax.config.jax_compilation_cache_dir
    assert before and before.endswith(".xla_cache")  # conftest's dir
    old = env_mod._CACHE_DIR
    env_mod._CACHE_DIR = None  # fresh-process view
    try:
        got = setup_compile_cache()
        assert got == before
        assert jax.config.jax_compilation_cache_dir == before
    finally:
        env_mod._CACHE_DIR = old
