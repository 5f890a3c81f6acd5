#!/usr/bin/env python
"""Mosaic/mixup A/B on a HARD small-object dataset (round-3 verdict #2).

The on-device mosaic pipeline (ops/augment.py) had exactly one end-to-end
accuracy datapoint before this: -0.17 mAP in an over-augmentation regime
(240 clean images, PARITY_AB.md). This harness builds the regime mosaic
was invented for — low data per class, many SMALL objects — and measures
three runs on the shared 16-class set (scripts/parity_data.py
make_hard_dataset):

  ours-mosaic     our framework, mosaic+mixup 0.5 (device pipeline),
                  special_aug_ratio 0.7 (mosaic off for the last 30% of
                  epochs — the YOLO recipe our epoch plumbing implements)
  ours-plain      our framework, mosaic/mixup off (same budget)
  torch-mosaic    the UNMODIFIED reference with ITS mosaic+mixup 0.5
                  (dataset/yolo_dataset_git.py:262-391; always-on, since
                  train.py never advances epoch_now past its -1 init)

All three checkpoints are scored through the IDENTICAL device
inference + NMS + eval/evaluator.py mAP path (the torch weights enter
via tools/torch_import, bit-parity-tested forward).

Targets: ours-mosaic > ours-plain  AND  ours-mosaic >= torch-mosaic.

Run:  python scripts/mosaic_ab.py gen|probe-torch|train-torch|
          train-ours|train-plain|eval|report  [--dir /tmp/mosaic_ab]
"""
import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EPOCHS = 30
BATCH = 8
SIZE = 320
N_TRAIN = 1200
N_VAL = 240
MAX_BOXES = 64


def write_plans(outdir, train_ann, val_ann, anchors):
    import yaml

    from scripts.parity_data import CLASSES16
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    common = dict(
        train=train_ann, val=val_ann, epochs=EPOCHS, batch_size=BATCH,
        image_size=SIZE, image_chan=3, enhance=True, shuffle=True,
        labels=list(CLASSES16),
        anchors=anchors, anchors_mask=[[6, 7, 8], [3, 4, 5], [0, 1, 2]],
        iou_loss_ratio=1.0, anchor_t=4.0, focal_gamma=1.5, focal_alpha=0.25,
        adam=True, decay="Cosine", lrI=0.001, lrF=0.05, momentum=0.937,
        weight_decay=0.0005, warmup=True, warmup_epochs=2,
        warmup_max_iter=50, warmup_momentum=0.8, warmup_bias_lr=0.0001,
        resume=False, save_dir=outdir,
    )
    # recipe-matched enhance knobs (the reference's ACTIVE train path:
    # jitter/flip-LR/HSV hue=.1 sat=.7 val=.4, no flip-UD, no perspective
    # — its mosaic composite also applies no perspective)
    ours_enhance = {"hsv_h": 0.1, "hsv_s": 0.7, "hsv_v": 0.4,
                    "flip_lr": 0.5, "flip_ud": 0.0, "equalize": 0.0,
                    "mosaic": 0.0, "mix-up": 0.0, "copy_paste": 0.0}
    ours_common = dict(common, device="tpu", workers=0, pin_memory=False,
                       drop_last=False, enhance_cfg=ours_enhance,
                       max_boxes=MAX_BOXES, cache_images=True, seed=0,
                       ema=True,
                       model_cfg=os.path.join(repo, "cfg/net/yolov7-tiny.yaml"))
    ours_mosaic = dict(ours_common, save_name="ab_mosaic",
                       mosaic=True, mixup=True, mosaic_prob=0.5,
                       mixup_prob=0.5, special_aug_ratio=0.7)
    ours_plain = dict(ours_common, save_name="ab_plain",
                      mosaic=False, mixup=False, mosaic_prob=0.0,
                      mixup_prob=0.0)
    torch_mosaic = dict(common, device="cpu", workers=0, pin_memory=False,
                        drop_last=False, save_name="ab_torchmos",
                        model_cfg="/root/reference/cfg/net/yolov7-tiny.yaml",
                        enhance_cfg="/root/reference/cfg/enhance/enhance.yaml",
                        mosaic=True, mixup=True, mosaic_prob=0.5,
                        mixup_prob=0.5)
    paths = {}
    for name, cfg in (("ours_mosaic", ours_mosaic),
                      ("ours_plain", ours_plain),
                      ("torch_mosaic", torch_mosaic)):
        p = os.path.join(outdir, f"plan_{name}.yaml")
        with open(p, "w") as f:
            yaml.safe_dump(cfg, f)
        paths[name] = p
    return paths


def cmd_gen(d):
    from scripts.parity_data import fit_anchors, make_hard_dataset
    train_ann, val_ann = make_hard_dataset(d, n_train=N_TRAIN, n_val=N_VAL,
                                           size=SIZE, seed=7)
    anchors = fit_anchors(train_ann, seed=0)
    print("fitted anchors:", anchors)
    paths = write_plans(d, train_ann, val_ann, anchors)
    with open(os.path.join(d, "meta.json"), "w") as f:
        json.dump({"anchors": anchors, "epochs": EPOCHS, "batch": BATCH,
                   "size": SIZE, "n_train": N_TRAIN, "n_val": N_VAL,
                   "plans": paths}, f)
    print("plans:", paths)


def cmd_gen_extra(d):
    """Round-4 plan variants, derived from the base plans `gen` wrote:
    - plan_ours_mosaic2s{0,1,2}.yaml  matched recipe (always-on mosaic,
      special_aug_ratio 1.0), seeds 0/1/2 — the 3-seed replicate the
      round-3 verdict asked for (seed spread ~0.06 vs a +0.017 claim)
    - plan_ours_mosaic60c.yaml  the COMPLETE 60-epoch late-clean arm
      (special_aug_ratio 0.85) with device_cache on: the round-3 run
      OOM'd at epoch 39 on the tunnel's host-mirror leak; the pool mode
      ships only index batches, so the full schedule fits in one process
    - plan_torch_mosaic_s{1,2}.yaml  extra torch seeds (same recipe)
    """
    import yaml
    base = yaml.safe_load(open(os.path.join(d, "plan_ours_mosaic.yaml")))
    for seed in (0, 1, 2):
        v2 = dict(base, seed=seed, special_aug_ratio=1.0,
                  save_name=f"ab_mosaic2s{seed}")
        with open(os.path.join(d, f"plan_ours_mosaic2s{seed}.yaml"), "w") as f:
            yaml.safe_dump(v2, f)
    m60 = dict(base, epochs=60, special_aug_ratio=0.85, device_cache=True,
               save_name="ab_mosaic60c")
    with open(os.path.join(d, "plan_ours_mosaic60c.yaml"), "w") as f:
        yaml.safe_dump(m60, f)
    tb = yaml.safe_load(open(os.path.join(d, "plan_torch_mosaic.yaml")))
    for seed in (1, 2):
        tv = dict(tb, save_name=f"ab_torchmos_s{seed}")
        with open(os.path.join(d, f"plan_torch_mosaic_s{seed}.yaml"), "w") as f:
            yaml.safe_dump(tv, f)
    print("wrote round-4 plan variants")


def cmd_train_torch(d, plan="plan_torch_mosaic.yaml", seed=0):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    t0 = time.time()
    subprocess.run([sys.executable,
                    os.path.join(repo, "scripts/ref_train_driver.py"),
                    os.path.join(d, plan), str(seed)], check=True)
    print(f"torch reference trained in {time.time() - t0:.0f}s")


def _train_ours(d, which):
    from yolo_continuous_tpu.config.plan import TrainPlan
    from yolo_continuous_tpu.train.train_loop import Trainer
    plan = TrainPlan(os.path.join(d, f"plan_{which}.yaml"))
    t0 = time.time()
    Trainer(plan).run()
    print(f"{which} trained in {time.time() - t0:.0f}s -> {plan.save_path}")


def _eval_ckpt(d, plan_name, torch_pth=None, conf=0.02, nms=0.45):
    import jax
    from yolo_continuous_tpu.config.plan import TrainPlan
    from yolo_continuous_tpu.detect_api import Detector
    from yolo_continuous_tpu.eval.validate import validate
    from yolo_continuous_tpu.train.checkpoint import try_load
    from yolo_continuous_tpu.train.train_loop import Trainer

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plan = TrainPlan(os.path.join(d, f"plan_{plan_name}.yaml"))
    if torch_pth is not None:
        from yolo_continuous_tpu.tools.torch_import import load_torch_checkpoint
        plan.model_cfg = os.path.join(repo, "cfg/net/yolov7-tiny.yaml")
        tr = Trainer(plan)
        state = tr.init_state(jax.random.PRNGKey(0))
        params, batch_stats = load_torch_checkpoint(
            torch_pth, tr.spec, state["params"], state["batch_stats"])
        det = Detector(plan, params=params, batch_stats=batch_stats)
    else:
        tr = Trainer(plan)
        state = tr.init_state(jax.random.PRNGKey(0))
        loaded = try_load(plan.save_path, state)
        assert loaded is not None, f"missing {plan.save_path}"
        det = Detector(plan, params=loaded["ema"].tree["params"],
                       batch_stats=loaded["ema"].tree["batch_stats"])
    return validate(plan, detector=det, conf_thres=conf, nms_thres=nms)


def cmd_eval(d):
    res = {}
    res["ours_mosaic"] = _eval_ckpt(d, "ours_mosaic")
    res["ours_plain"] = _eval_ckpt(d, "ours_plain")
    pth = os.path.join(d, "ab_torchmos.pth")
    if os.path.exists(pth):
        res["torch_mosaic"] = _eval_ckpt(d, "torch_mosaic", torch_pth=pth)
    else:
        print(f"WARNING: {pth} missing; skipping torch row")
    with open(os.path.join(d, "mosaic_results.json"), "w") as f:
        json.dump(res, f, indent=1)
    for k, v in res.items():
        print(k, v)
    return res


MARK_BEGIN = "<!-- mosaic-ab-begin -->"
MARK_END = "<!-- mosaic-ab-end -->"


def cmd_report(d):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    res = json.load(open(os.path.join(d, "mosaic_results.json")))
    meta = json.load(open(os.path.join(d, "meta.json")))
    rows = [("ours mosaic+mixup 0.5 (device pipeline, v1 recipe)",
             "ours_mosaic"),
            ("ours mosaic+mixup 0.5 (matched recipe: always-on mosaic, "
             "single-image mixup partner)", "ours_mosaic2"),
            ("ours matched recipe, seed 1 replicate", "ours_mosaic2s1"),
            ("ours matched recipe, seed 2 replicate", "ours_mosaic2s2"),
            ("ours no mosaic/mixup (same budget)", "ours_plain"),
            ("torch reference mosaic+mixup 0.5", "torch_mosaic"),
            ("torch reference mosaic seed 1", "torch_mosaic_s1"),
            ("torch reference mosaic seed 2", "torch_mosaic_s2")]
    rows60 = [("ours mosaic+mixup 0.5 (late-clean 0.85, "
               "OOM-truncated epoch 39)", "ours_mosaic60"),
              ("ours mosaic+mixup 0.5 (late-clean 0.85, COMPLETE "
               "60-epoch rerun, device_cache)", "ours_mosaic60c"),
              ("ours no mosaic/mixup", "ours_plain60"),
              ("torch reference mosaic+mixup 0.5", "torch_mosaic60")]
    lines = [MARK_BEGIN,
             "## Mosaic/mixup A/B on the HARD small-object set "
             "(scripts/mosaic_ab.py)",
             "",
             f"16-class shapes set built for the regime mosaic was invented "
             f"for: {meta['n_train']} train / {meta['n_val']} val images @ "
             f"{meta['size']}px, 3-12 objects each, sizes log-uniform "
             f"~10-90 px (15% large tail). {meta['epochs']} epochs, batch "
             f"{meta['batch']}, identical fitted anchors/optimizer/enhance "
             "recipe across all runs; scored through the shared evaluator.",
             "",
             "| run | mAP@0.5 | mAP@0.5:0.95 |", "|---|---|---|"]
    for label, key in rows:
        if key in res:
            lines.append(f"| {label} | {res[key]['mAP@0.5']:.4f} | "
                         f"{res[key]['mAP@0.5:0.95']:.4f} |")
    seeds = [res[k]["mAP@0.5"] for k in
             ("ours_mosaic2", "ours_mosaic2s1", "ours_mosaic2s2")
             if k in res]
    tseeds = [res[k]["mAP@0.5"] for k in
              ("torch_mosaic", "torch_mosaic_s1", "torch_mosaic_s2")
              if k in res]
    mean2 = sum(seeds) / len(seeds) if seeds else None
    if mean2 is not None and "ours_plain" in res:
        dm = mean2 - res["ours_plain"]["mAP@0.5"]
        lines += ["", f"mosaic-helps delta @30ep (ours matched-recipe "
                  f"seed-mean {mean2:.4f}, n={len(seeds)}, spread "
                  f"{max(seeds) - min(seeds):.3f} - ours off): {dm:+.4f}"]
    if mean2 is not None and tseeds:
        tmean = sum(tseeds) / len(tseeds)
        dt = mean2 - tmean
        lines += [f"framework delta @30ep (ours matched-recipe seed-mean - "
                  f"torch mosaic seed-mean {tmean:.4f}, n={len(tseeds)}): "
                  f"{dt:+.4f}"]
    if any(k in res for k in ("ours_mosaic60", "ours_plain60",
                              "torch_mosaic60")):
        lines += ["", "### 60-epoch budget (mosaic's intended regime: "
                  "2x schedule, late-clean finish)", "",
                  "| run | mAP@0.5 | mAP@0.5:0.95 |", "|---|---|---|"]
        for label, key in rows60:
            if key in res:
                lines.append(f"| {label} | {res[key]['mAP@0.5']:.4f} | "
                             f"{res[key]['mAP@0.5:0.95']:.4f} |")
        k60 = ("ours_mosaic60c" if "ours_mosaic60c" in res
               else "ours_mosaic60")
        if k60 in res and "ours_plain60" in res:
            d60 = res[k60]["mAP@0.5"] - res["ours_plain60"]["mAP@0.5"]
            lines += ["", f"mosaic-helps delta @60ep: {d60:+.4f}"]
        if k60 in res and "torch_mosaic60" in res:
            d60t = res[k60]["mAP@0.5"] - res["torch_mosaic60"]["mAP@0.5"]
            lines += [f"framework delta @60ep: {d60t:+.4f}"]
        if "ours_mosaic60" in res and "ours_mosaic60c" not in res:
            lines += ["", "Caveat: the 60-epoch mosaic arm stopped at epoch "
                      "39/60 (host OOM — the TPU tunnel retains a host "
                      "mirror of every transferred batch; see ROADMAP "
                      "tunnel-operations note), so its late-clean phase "
                      "(mosaic off after epoch 51) never ran; the row is "
                      "its best-val checkpoint at epoch 39. A fresh rerun "
                      "stalled on a tunnel fault. The 30-epoch table "
                      "carries the complete, replicated comparison."]
    lines += ["",
              "Recipe notes: all mosaic arms run mosaic 0.5 + nested "
              "mixup 0.5 with jitter/flip-LR/HSV. v1 turned mosaic off for "
              "the final 30% of epochs (special_aug_ratio 0.7) and mixed "
              "with the batch neighbor's full composite; v2 matches the "
              "reference's ACTIVE semantics — mosaic always on (its "
              "train.py never advances epoch_now past the -1 init, "
              "yolo_dataset_git.py:40) and mixup blending with a fresh "
              "SINGLE-augmented image (yolo_dataset_git.py:59-62). "
              "Seed spread on the matched-recipe arm is ~0.06 mAP@0.5 "
              "(0.4293 / 0.4884) — single-run deltas under ~0.05 on this "
              "240-image val set are noise; the framework comparison "
              "uses the seed mean.",
              MARK_END]
    block = "\n".join(lines)
    out = os.path.join(repo, "PARITY_AB.md")
    text = open(out).read() if os.path.exists(out) else ""
    if MARK_BEGIN in text:
        pre = text[: text.index(MARK_BEGIN)]
        post = text[text.index(MARK_END) + len(MARK_END):]
        text = pre + block + post
    else:
        text = text.rstrip() + "\n\n" + block + "\n"
    with open(out, "w") as f:
        f.write(text)
    print("wrote", out)


def cmd_eval_extra(d):
    """Evaluate any round-4 variant checkpoints present and merge them
    into mosaic_results.json under their plan-derived keys."""
    out_path = os.path.join(d, "mosaic_results.json")
    res = json.load(open(out_path)) if os.path.exists(out_path) else {}
    variants = [(f"ours_mosaic2s{s}", f"ab_mosaic2s{s}.msgpack", None)
                for s in (0, 1, 2)]
    variants += [("ours_mosaic60c", "ab_mosaic60c.msgpack", None)]
    variants += [(f"torch_mosaic_s{s}", f"ab_torchmos_s{s}.pth",
                  f"ab_torchmos_s{s}.pth") for s in (1, 2)]
    for key, ck, torch_pth in variants:
        path = os.path.join(d, ck)
        if key in res or not os.path.exists(path):
            continue
        # round-4 advisor #1: best-loss checkpoints are written mid-run,
        # so only score arms whose train command completed (the queue
        # touches <ck>.done on a zero exit status)
        if not os.path.exists(path + ".done"):
            print(f"{key}: checkpoint present but no .done sentinel "
                  "(incomplete run?) — skipping")
            continue
        plan_name = ("torch_mosaic" if torch_pth else
                     {"ours_mosaic60c": "ours_mosaic60c"}.get(
                         key, key))
        res[key] = _eval_ckpt(d, plan_name,
                              torch_pth=path if torch_pth else None)
        print(key, res[key])
    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["gen", "gen-extra", "train-torch",
                                    "train-ours", "train-plain", "train",
                                    "eval", "eval-extra", "report"])
    ap.add_argument("--dir", default="/tmp/mosaic_ab")
    ap.add_argument("--plan", default=None,
                    help="for `train`: plan_<NAME>.yaml name part")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    d = args.dir
    os.makedirs(d, exist_ok=True)
    if args.cmd == "train":
        _train_ours(d, args.plan)
    elif args.cmd == "train-torch":
        plan = (f"plan_{args.plan}.yaml" if args.plan
                else "plan_torch_mosaic.yaml")
        cmd_train_torch(d, plan, args.seed)
    else:
        {"gen": cmd_gen, "gen-extra": cmd_gen_extra,
         "train-ours": lambda d: _train_ours(d, "ours_mosaic"),
         "train-plain": lambda d: _train_ours(d, "ours_plain"),
         "eval": cmd_eval, "eval-extra": cmd_eval_extra,
         "report": cmd_report}[args.cmd](d)


if __name__ == "__main__":
    main()
