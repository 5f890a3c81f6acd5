"""Worker for the 2-process jax.distributed test (test_distributed.py).

Each process: 1 virtual CPU device, joins the coordinator, builds the
SAME model state deterministically, feeds its LOCAL half of a fixed
global batch via ``distributed.host_local_batch``, and runs ONE jitted
train step over the 2-device ('data') mesh. Process 0 writes the loss.

Usage: python _dist_worker.py <proc_id> <nprocs> <port> <outdir>
"""
import os
import sys

proc_id, nprocs, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                                 sys.argv[3], sys.argv[4])

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:  # gloo cross-process collectives for the CPU backend
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass

import numpy as np  # noqa: E402
import yaml  # noqa: E402

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.chdir(_REPO)   # plan YAMLs reference cfg/net/... relative to the repo

from yolo_continuous_tpu.parallel import distributed as dist  # noqa: E402


def main():
    dist.initialize(f"localhost:{port}", nprocs, proc_id)
    assert jax.process_count() == nprocs, jax.process_count()
    assert dist.process_index() == proc_id

    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P

    # establish the gloo context NOW, while both processes are
    # time-aligned (just past import): gloo's bootstrap window is 30s,
    # and on this 1-core machine the model compile below can skew the
    # processes by minutes — the first collective must not be then.
    multihost_utils.sync_global_devices("gloo-bootstrap")

    from yolo_continuous_tpu.config.plan import TrainPlan
    from yolo_continuous_tpu.parallel.mesh import make_mesh
    from yolo_continuous_tpu.train.train_loop import Trainer

    here = os.path.dirname(os.path.abspath(__file__))
    cache = os.path.join(here, ".xla_cache")
    jax.config.update("jax_compilation_cache_dir", cache)

    mesh = make_mesh(nprocs, 1)     # 2 devices, one per process
    size, max_gt, global_bs = 64, 8, 4
    local_bs = dist.local_batch_size(global_bs)

    cfg = yaml.safe_load(open(os.path.join(here, "..",
                                           "cfg/raccoon_tiny.yaml")))
    cfg["image_size"] = size
    cfg["max_boxes"] = max_gt
    cfg["batch_size"] = global_bs
    plan = TrainPlan(cfg)
    trainer = Trainer(plan, dtype=jnp.float32)
    state = trainer.init_state(jax.random.PRNGKey(0))
    state = jax.tree.map(np.asarray, state)   # host values, identical on
                                              # every process (same seed)

    # fixed GLOBAL batch; this process feeds only its local slice
    rs = np.random.RandomState(0)
    images = rs.rand(global_bs, size, size, 3).astype(np.float32)
    labels = np.zeros((global_bs, max_gt, 5), np.float32)
    labels[:, 0] = [0, 0.5, 0.5, 0.4, 0.4]
    lmask = np.zeros((global_bs, max_gt), bool)
    lmask[:, 0] = True
    lo, hi = proc_id * local_bs, (proc_id + 1) * local_bs
    batch = dist.host_local_batch(mesh, {
        "images": images[lo:hi], "labels": labels[lo:hi],
        "lmask": lmask[lo:hi]})

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    step = jax.jit(trainer.train_step_fn,
                   in_shardings=(repl, data, data, data, None, None, None))
    with mesh:
        # AOT-compile, then re-align: execution (whose collectives sync
        # the two processes) must start together, compile may skew.
        compiled = step.lower(state, batch["images"], batch["labels"],
                              batch["lmask"], 0.01, 0.1, 0.9).compile()
        multihost_utils.sync_global_devices("compiled")
        new_state, metrics = compiled(state, batch["images"],
                                      batch["labels"], batch["lmask"],
                                      0.01, 0.1, 0.9)
        loss = float(metrics["loss"])     # fully replicated -> addressable
        psum = float(jnp.sum(jax.tree.reduce(
            lambda a, b: a + jnp.sum(jnp.abs(b.astype(jnp.float32))),
            new_state["params"], jnp.float32(0.0))))
    if proc_id == 0:
        with open(os.path.join(outdir, "result.txt"), "w") as f:
            f.write(f"{loss:.8f} {psum:.4f}\n")
    print(f"proc {proc_id}: loss {loss:.6f}")


if __name__ == "__main__":
    main()
