import time, numpy as np, jax, jax.numpy as jnp, yaml
from yolo_continuous_tpu.config.plan import TrainPlan
from yolo_continuous_tpu.train.train_loop import Trainer

batch, size = 8, 640
cfg = yaml.safe_load(open("cfg/coco_train.yaml"))
cfg.update(image_size=size, batch_size=batch, max_boxes=64)
plan = TrainPlan(cfg)
tr = Trainer(plan)
state = tr.init_state(jax.random.PRNGKey(0))
rs = np.random.RandomState(0)
images = jnp.asarray(rs.rand(batch, size, size, 3), jnp.float32)
labels = np.zeros((batch, 64, 5), np.float32); labels[:, 0] = [1, 0.5, 0.5, 0.4, 0.4]; labels[:,1] = [3,0.3,0.3,0.2,0.25]
lmask = np.zeros((batch, 64), bool); lmask[:, :2] = True
labels, lmask = jnp.asarray(labels), jnp.asarray(lmask)

def timeit(f, *a, iters=10):
    r = f(*a); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters): r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter()-t0)/iters

fwd = jax.jit(lambda p, bs, x: tr.model.apply({"params":p,"batch_stats":bs}, x, False))
t = timeit(fwd, state["params"], state["batch_stats"], images)
print("fwd eval: %.1f ms  (%.1f img/s)" % (t*1000, batch/t))

def triv_loss(p):
    outs, mut = tr.model.apply({"params":p,"batch_stats":state["batch_stats"]}, images, True, mutable=["batch_stats"])
    return sum(jnp.sum(o.astype(jnp.float32)**2) for o in outs)
g_triv = jax.jit(jax.grad(triv_loss))
t = timeit(g_triv, state["params"])
print("fwd+bwd trivial loss: %.1f ms (%.1f img/s)" % (t*1000, batch/t))

def full_loss(p):
    outs, mut = tr.model.apply({"params":p,"batch_stats":state["batch_stats"]}, images, True, mutable=["batch_stats"])
    return tr.loss_from_outputs(outs, labels, lmask)[0]
g_full = jax.jit(jax.grad(full_loss))
t = timeit(g_full, state["params"])
print("fwd+bwd SimOTA loss: %.1f ms (%.1f img/s)" % (t*1000, batch/t))
