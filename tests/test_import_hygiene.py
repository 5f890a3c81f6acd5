"""Importing the package must NOT initialize a jax backend.

On this deployment the TPU plugin dials a remote tunnel at backend
initialization; a module-level `jnp.array(...)` constant therefore made
every CLI hang at import whenever the tunnel was unhealthy — before the
CLI's own `--device cpu` / `select_device` config update could run
(round-4 fix: losses/yolo_loss.py `_UNIT_OFFSETS` became numpy).
Run in a clean subprocess because the test process itself has long
since initialized its CPU backend.
"""
import os
import subprocess
import sys

_PROBE = """
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
from jax._src import xla_bridge
orig = xla_bridge.backends
hit = []
xla_bridge.backends = lambda *a, **k: (hit.append(1), orig(*a, **k))[1]
import yolo_continuous_tpu.train.train_loop
import yolo_continuous_tpu.detect_api
import yolo_continuous_tpu.eval.validate
import yolo_continuous_tpu.serve
import yolo_continuous_tpu.tools.torch_import
print("INIT" if hit else "CLEAN")
"""


def test_package_import_does_not_initialize_backend():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    p = subprocess.run([sys.executable, "-c", _PROBE], cwd=repo, env=env,
                       capture_output=True, text=True, timeout=300)
    assert p.returncode == 0, p.stderr[-2000:]
    assert p.stdout.strip().splitlines()[-1] == "CLEAN", p.stdout
