import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, yaml, jax, jax.numpy as jnp
from yolo_continuous_tpu.config.plan import TrainPlan
from yolo_continuous_tpu.train.train_loop import Trainer

batch, size = 16, 640
cfg = yaml.safe_load(open("cfg/coco_train.yaml"))
cfg.update(image_size=size, batch_size=batch, max_boxes=64)
plan = TrainPlan(cfg)
tr = Trainer(plan)
state = tr.init_state(jax.random.PRNGKey(0))
images = jnp.zeros((batch, size, size, 3), jnp.float32)
labels = jnp.zeros((batch, 64, 5), jnp.float32)
lmask = jnp.zeros((batch, 64), bool)
lowered = jax.jit(tr.train_step_fn, donate_argnums=(0,)).lower(
    state, images, labels, lmask, 0.01, 0.1, 0.937)
compiled = lowered.compile()
ca = compiled.cost_analysis()
ma = compiled.memory_analysis()
flops = ca.get("flops", 0)
print(f"compiler flops/step: {flops/1e12:.2f} TFLOP")
print(f"bytes accessed: {ca.get('bytes accessed', 0)/1e9:.1f} GB")
step_s = batch / 163.5
print(f"at 163.5 img/s -> {flops/1e12/step_s:.1f} TFLOPs sustained")
if ma is not None:
    print("peak memory:", getattr(ma, 'temp_size_in_bytes', '?'))
