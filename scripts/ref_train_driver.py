#!/usr/bin/env python
"""Train the UNMODIFIED torch reference (/root/reference/train.py:23-121)
on a given plan YAML, for the mAP parity A/B.

The mounted reference tree is read-only and must not be edited; its one
blocking wart — ``main/data_loader.get_dataloader`` hard-codes
``input_shape=[640,640], num_classes=1, mosaic=mixup=True``
(main/data_loader.py:14-23), ignoring the plan — is monkey-patched HERE
so the reference trains at the plan's image size / class count with the
plan's mosaic setting. Everything else (Model, YOLOLoss, optimizer,
schedulers, warm-up, the epoch loop, checkpointing) runs the reference's
own code verbatim.

Run: python scripts/ref_train_driver.py /path/to/plan_torch.yaml [seed]
"""
import os
import sys
import types

sys.path.insert(0, "/root/reference")

# torchvision is not in this image (torch is CPU-only). The reference
# imports it at module scope (utils/bbox.py:7, main/enhance_package.py:4)
# but the TRAINING path never executes a torchvision op: the dead local
# non_max_suppression (utils/bbox.py:121-198) is the only nms caller and
# YoloDataset2 bypasses EnhancePackage/RandomEqualize entirely. Stub the
# import surface; anything actually called raises loudly.
_tv = types.ModuleType("torchvision")
_tv_ops = types.ModuleType("torchvision.ops")
_tv_tf = types.ModuleType("torchvision.transforms")


def _no_tv(*a, **k):
    raise RuntimeError("torchvision stub: not available in this image")


_tv_ops.nms = _no_tv


class RandomEqualize:  # constructed by EnhancePackage, never applied here
    def __init__(self, *a, **k):
        pass

    def __call__(self, *a, **k):
        _no_tv()


_tv_tf.RandomEqualize = RandomEqualize
_tv.ops = _tv_ops
_tv.transforms = _tv_tf
sys.modules.update({"torchvision": _tv, "torchvision.ops": _tv_ops,
                    "torchvision.transforms": _tv_tf})


def patched_get_dataloader(train_plan, train=True):
    from dataset.infinite_dataLoader import InfiniteDataLoader
    from dataset.yolo_dataset_git import YoloDataset2, yolo_dataset_collate

    with open(train_plan.train_indexes if train else train_plan.val_indexes,
              encoding="utf-8") as f:
        index_file = f.readlines()
    cfg = train_plan.cfg_file
    mosaic = bool(cfg.get("mosaic", False))
    mixup = bool(cfg.get("mixup", False))
    dataset = YoloDataset2(
        index_file,
        input_shape=[train_plan.image_size, train_plan.image_size],
        num_classes=train_plan.num_labels,
        anchors=train_plan.anchors,
        anchors_mask=train_plan.anchors_mask,
        epoch_length=train_plan.epochs,
        mosaic=mosaic,
        mixup=mixup,
        mosaic_prob=float(cfg.get("mosaic_prob", 0.0)),
        mixup_prob=float(cfg.get("mixup_prob", 0.0)),
        train=train,
    )
    return InfiniteDataLoader(
        dataset,
        batch_size=train_plan.batch_size,
        shuffle=train_plan.shuffle,
        num_workers=train_plan.workers,
        pin_memory=train_plan.pin_memory,
        drop_last=train_plan.drop_last,
        collate_fn=yolo_dataset_collate,
    )


def main():
    plan_yaml = os.path.abspath(sys.argv[1])
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    import numpy as np
    import torch

    torch.manual_seed(seed)
    np.random.seed(seed)

    import main.data_loader as ref_dl
    ref_dl.get_dataloader = patched_get_dataloader
    import train as ref_train   # /root/reference/train.py
    ref_train.get_dataloader = patched_get_dataloader  # from-import rebind
    ref_train.train(plan_yaml)


if __name__ == "__main__":
    main()
