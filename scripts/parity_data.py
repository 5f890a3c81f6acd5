"""Shared synthetic VOC-style dataset for the mAP parity A/B.

Generates a 6-class, cluttered, multi-scale shapes detection set that
BOTH the torch reference (/root/reference/train.py) and this framework
train on, with annotation lines in the reference's format
(``img.jpg x1,y1,x2,y2,cls ...`` — tools/gen_annotation.py:90-118), plus
dataset-fitted anchors via the reference's ratio-metric k-means
(tools/gen_anchors.py:26-69, re-implemented in our tools).

Class identity is carried by SHAPE, not color (colors are random), and
images contain unlabeled distractor clutter, partial overlap, and sizes
spanning ~18..170 px at 320 — so the task exercises multi-scale anchors,
occlusion handling and real classification, unlike the 2-class demo the
round-1 verdict called "trivially separable".
"""
import math
import os

import numpy as np

CLASSES = ["rect", "ellipse", "triangle", "ring", "cross", "diamond"]


def _rand_color(rs):
    import cv2
    hsv = np.uint8([[[rs.randint(0, 180), rs.randint(140, 256),
                      rs.randint(140, 256)]]])
    return tuple(int(c) for c in cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB)[0, 0])


def _draw_shape(img, cls, x1, y1, w, h, color, rs):
    """Draw shape ``cls`` tightly inside (x1,y1,w,h); returns tight bbox."""
    import cv2
    x2, y2 = x1 + w, y1 + h
    cx, cy = x1 + w // 2, y1 + h // 2
    if cls == 0:    # filled rectangle
        cv2.rectangle(img, (x1, y1), (x2, y2), color, -1)
    elif cls == 1:  # filled ellipse
        cv2.ellipse(img, (cx, cy), (w // 2, h // 2), 0, 0, 360, color, -1)
    elif cls == 2:  # triangle (base at bottom, apex jittered along top)
        ax = x1 + rs.randint(w // 4, max(3 * w // 4, w // 4 + 1))
        pts = np.array([[ax, y1], [x1, y2], [x2, y2]], np.int32)
        cv2.fillPoly(img, [pts], color)
    elif cls == 3:  # ring (outline-only ellipse, thick)
        t = max(2, min(w, h) // 6)
        cv2.ellipse(img, (cx, cy), (w // 2 - t // 2, h // 2 - t // 2),
                    0, 0, 360, color, t)
    elif cls == 4:  # cross / plus sign
        aw = max(2, w // 3)
        ah = max(2, h // 3)
        cv2.rectangle(img, (cx - aw // 2, y1), (cx + aw // 2, y2), color, -1)
        cv2.rectangle(img, (x1, cy - ah // 2), (x2, cy + ah // 2), color, -1)
    else:           # diamond (axis-aligned rhombus)
        pts = np.array([[cx, y1], [x2, cy], [cx, y2], [x1, cy]], np.int32)
        cv2.fillPoly(img, [pts], color)
    return x1, y1, x2, y2


def _iou_xyxy(a, b):
    ix = max(0, min(a[2], b[2]) - max(a[0], b[0]))
    iy = max(0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = ix * iy
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / max(ua, 1)


def _gen_image(path, size, rs, smin=18, smax=170):
    import cv2
    # background: gradient + noise + unlabeled dot clutter
    g0, g1 = rs.randint(70, 120), rs.randint(120, 180)
    ramp = np.linspace(g0, g1, size, dtype=np.float32)
    img = np.broadcast_to(ramp[None, :] if rs.rand() < 0.5 else ramp[:, None],
                          (size, size)).copy()
    img = np.repeat(img[..., None], 3, -1)
    img += rs.randn(size, size, 3) * 8
    img = np.clip(img, 0, 255).astype(np.uint8)
    for _ in range(rs.randint(4, 10)):  # distractor dots, below min obj size
        cv2.circle(img, (rs.randint(0, size), rs.randint(0, size)),
                   rs.randint(2, 7), _rand_color(rs), -1)

    boxes = []
    for _ in range(rs.randint(2, 8)):
        for _try in range(40):
            s = math.exp(rs.uniform(math.log(smin), math.log(smax)))
            ar = math.exp(rs.uniform(math.log(0.5), math.log(2.0)))
            w = int(np.clip(s * math.sqrt(ar), 12, size - 2))
            h = int(np.clip(s / math.sqrt(ar), 12, size - 2))
            x1 = rs.randint(0, size - w)
            y1 = rs.randint(0, size - h)
            cand = (x1, y1, x1 + w, y1 + h)
            if all(_iou_xyxy(cand, b[:4]) < 0.3 for b in boxes):
                break
        else:
            continue
        cls = rs.randint(0, len(CLASSES))
        bb = _draw_shape(img, cls, x1, y1, w, h, _rand_color(rs), rs)
        boxes.append((*bb, cls))
    cv2.imwrite(path, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    return boxes


CLASSES16 = ["rect", "ellipse", "tri_up", "ring", "cross", "diamond",
             "star", "semicircle", "lshape", "tshape", "arrow", "hexagon",
             "xcross", "frame", "tri_down", "twodots"]


def _draw_shape16(img, cls, x1, y1, w, h, color, rs):
    """16-class shape vocabulary for the HARD set (mosaic A/B): returns
    the tight bbox. Classes 0-5 reuse the 6-class vocabulary."""
    import cv2
    if cls < 6:
        return _draw_shape(img, cls, x1, y1, w, h, color, rs)
    x2, y2 = x1 + w, y1 + h
    cx, cy = x1 + w // 2, y1 + h // 2
    if cls == 6:    # 5-point star
        pts = []
        for k in range(10):
            ang = -math.pi / 2 + k * math.pi / 5
            r_w = (w / 2) if k % 2 == 0 else (w / 4.5)
            r_h = (h / 2) if k % 2 == 0 else (h / 4.5)
            pts.append([cx + r_w * math.cos(ang), cy + r_h * math.sin(ang)])
        cv2.fillPoly(img, [np.asarray(pts, np.int32)], color)
    elif cls == 7:  # semicircle, flat side down
        cv2.ellipse(img, (cx, y2), (w // 2, h), 0, 180, 360, color, -1)
    elif cls == 8:  # L-shape
        t_w, t_h = max(2, w // 3), max(2, h // 3)
        cv2.rectangle(img, (x1, y1), (x1 + t_w, y2), color, -1)
        cv2.rectangle(img, (x1, y2 - t_h), (x2, y2), color, -1)
    elif cls == 9:  # T-shape
        t_w, t_h = max(2, w // 3), max(2, h // 3)
        cv2.rectangle(img, (x1, y1), (x2, y1 + t_h), color, -1)
        cv2.rectangle(img, (cx - t_w // 2, y1), (cx + t_w // 2, y2), color, -1)
    elif cls == 10:  # right-pointing arrow
        t_h = max(2, h // 3)
        hx = x1 + w // 2
        cv2.rectangle(img, (x1, cy - t_h // 2), (hx, cy + t_h // 2), color, -1)
        pts = np.array([[hx, y1], [x2, cy], [hx, y2]], np.int32)
        cv2.fillPoly(img, [pts], color)
    elif cls == 11:  # hexagon
        pts = np.array([[x1 + w // 4, y1], [x1 + 3 * w // 4, y1], [x2, cy],
                        [x1 + 3 * w // 4, y2], [x1 + w // 4, y2], [x1, cy]],
                       np.int32)
        cv2.fillPoly(img, [pts], color)
    elif cls == 12:  # diagonal X
        t = max(2, min(w, h) // 4)
        cv2.line(img, (x1, y1), (x2, y2), color, t)
        cv2.line(img, (x1, y2), (x2, y1), color, t)
    elif cls == 13:  # rectangular frame (outline-only rect)
        t = max(2, min(w, h) // 5)
        cv2.rectangle(img, (x1, y1), (x2, y2), color, t)
    elif cls == 14:  # triangle, apex at bottom
        ax = x1 + rs.randint(w // 4, max(3 * w // 4, w // 4 + 1))
        pts = np.array([[x1, y1], [x2, y1], [ax, y2]], np.int32)
        cv2.fillPoly(img, [pts], color)
    else:           # two tangent filled ellipses, side by side
        rw = max(2, w // 4)
        cv2.ellipse(img, (x1 + rw, cy), (rw, h // 2), 0, 0, 360, color, -1)
        cv2.ellipse(img, (x2 - rw, cy), (rw, h // 2), 0, 0, 360, color, -1)
    return x1, y1, x2, y2


def _gen_image_hard(path, size, rs, n_classes=16):
    """Harder image for the mosaic A/B: many SMALL objects (log-uniform
    ~10..90 px with a 15% large tail), 3..12 objects, clutter — the
    low-data/small-object regime mosaic was invented for."""
    import cv2
    g0, g1 = rs.randint(60, 110), rs.randint(110, 190)
    ramp = np.linspace(g0, g1, size, dtype=np.float32)
    img = np.broadcast_to(ramp[None, :] if rs.rand() < 0.5 else ramp[:, None],
                          (size, size)).copy()
    img = np.repeat(img[..., None], 3, -1)
    img += rs.randn(size, size, 3) * 8
    img = np.clip(img, 0, 255).astype(np.uint8)
    for _ in range(rs.randint(4, 12)):  # distractor dots below min obj size
        cv2.circle(img, (rs.randint(0, size), rs.randint(0, size)),
                   rs.randint(1, 5), _rand_color(rs), -1)

    boxes = []
    for _ in range(rs.randint(3, 13)):
        for _try in range(40):
            if rs.rand() < 0.15:
                s = math.exp(rs.uniform(math.log(90), math.log(170)))
            else:
                s = math.exp(rs.uniform(math.log(10), math.log(90)))
            ar = math.exp(rs.uniform(math.log(0.6), math.log(1.7)))
            w = int(np.clip(s * math.sqrt(ar), 9, size - 2))
            h = int(np.clip(s / math.sqrt(ar), 9, size - 2))
            x1 = rs.randint(0, size - w)
            y1 = rs.randint(0, size - h)
            cand = (x1, y1, x1 + w, y1 + h)
            if all(_iou_xyxy(cand, b[:4]) < 0.25 for b in boxes):
                break
        else:
            continue
        cls = rs.randint(0, n_classes)
        bb = _draw_shape16(img, cls, x1, y1, w, h, _rand_color(rs), rs)
        boxes.append((*bb, cls))
    cv2.imwrite(path, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    return boxes


CLASSES20 = CLASSES16 + ["pentagon", "lollipop", "trapezoid", "checker"]


def _draw_shape20(img, cls, x1, y1, w, h, color, rs):
    """20-class vocabulary for the north-star 640px A/B (classes 0-15
    reuse the 16-class set); VOC-proxy class count per BASELINE.md."""
    import cv2
    if cls < 16:
        return _draw_shape16(img, cls, x1, y1, w, h, color, rs)
    x2, y2 = x1 + w, y1 + h
    cx, cy = x1 + w // 2, y1 + h // 2
    if cls == 16:   # pentagon
        pts = []
        for k in range(5):
            ang = -math.pi / 2 + k * 2 * math.pi / 5
            pts.append([cx + (w / 2) * math.cos(ang),
                        cy + (h / 2) * math.sin(ang)])
        cv2.fillPoly(img, [np.asarray(pts, np.int32)], color)
    elif cls == 17:  # lollipop: circle atop a thin stem
        r_w, r_h = w // 2, max(2, h // 3)
        cv2.ellipse(img, (cx, y1 + r_h), (r_w, r_h), 0, 0, 360, color, -1)
        t = max(2, w // 6)
        cv2.rectangle(img, (cx - t // 2, y1 + r_h), (cx + t // 2, y2),
                      color, -1)
    elif cls == 18:  # trapezoid (narrow top, full-width base)
        pts = np.array([[x1 + w // 4, y1], [x1 + 3 * w // 4, y1],
                        [x2, y2], [x1, y2]], np.int32)
        cv2.fillPoly(img, [pts], color)
    else:            # checker: filled squares at TL and BR quadrants
        cv2.rectangle(img, (x1, y1), (cx, cy), color, -1)
        cv2.rectangle(img, (cx, cy), (x2, y2), color, -1)
    return x1, y1, x2, y2


def _gen_image_voc(path, size, rs, n_classes=20):
    """VOC-proxy image for the north-star A/B @640: 1-7 objects with a
    VOC-like wide size spread (log-uniform ~5%..80% of the image side,
    biased medium-large), clutter + occlusion as in the other sets."""
    import cv2
    g0, g1 = rs.randint(60, 110), rs.randint(110, 190)
    ramp = np.linspace(g0, g1, size, dtype=np.float32)
    img = np.broadcast_to(ramp[None, :] if rs.rand() < 0.5 else ramp[:, None],
                          (size, size)).copy()
    img = np.repeat(img[..., None], 3, -1)
    img += rs.randn(size, size, 3) * 8
    img = np.clip(img, 0, 255).astype(np.uint8)
    for _ in range(rs.randint(4, 12)):   # unlabeled distractor dots
        cv2.circle(img, (rs.randint(0, size), rs.randint(0, size)),
                   rs.randint(2, 8), _rand_color(rs), -1)

    boxes = []
    for _ in range(rs.randint(1, 8)):
        for _try in range(40):
            s = math.exp(rs.uniform(math.log(0.05 * size),
                                    math.log(0.80 * size)))
            ar = math.exp(rs.uniform(math.log(0.5), math.log(2.0)))
            w = int(np.clip(s * math.sqrt(ar), 16, size - 2))
            h = int(np.clip(s / math.sqrt(ar), 16, size - 2))
            x1 = rs.randint(0, size - w)
            y1 = rs.randint(0, size - h)
            cand = (x1, y1, x1 + w, y1 + h)
            if all(_iou_xyxy(cand, b[:4]) < 0.3 for b in boxes):
                break
        else:
            continue
        cls = rs.randint(0, n_classes)
        bb = _draw_shape20(img, cls, x1, y1, w, h, _rand_color(rs), rs)
        boxes.append((*bb, cls))
    cv2.imwrite(path, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    return boxes


def make_voc_proxy_dataset(outdir, n_train=1024, n_val=256, size=640,
                           seed=0):
    """20-class VOC-proxy set @640 in the reference annotation format."""
    os.makedirs(outdir, exist_ok=True)
    rs = np.random.RandomState(seed)
    anns = {}
    for split, n in (("train", n_train), ("val", n_val)):
        lines = []
        for i in range(n):
            p = os.path.join(outdir, f"{split}{i}.jpg")
            boxes = _gen_image_voc(p, size, rs)
            while not boxes:
                boxes = _gen_image_voc(p, size, rs)
            lines.append(p + " " + " ".join(
                f"{b[0]},{b[1]},{b[2]},{b[3]},{b[4]}" for b in boxes) + "\n")
        ann = os.path.join(outdir, f"{split}.txt")
        with open(ann, "w") as f:
            f.writelines(lines)
        anns[split] = ann
    return anns["train"], anns["val"]


def make_easy_dataset(outdir, n_train=448, n_val=128, size=640, seed=0):
    """6-class easy-shape set at an arbitrary resolution, object sizes
    scaled to the same RELATIVE spread as the 320px head-to-head set
    (log-uniform 5.6%..53% of the image side). Purpose (round-5): the
    640px discriminating parity budget — the 20-class VOC-proxy task
    needs hundreds of epochs to leave the noise floor (36 no-mosaic
    epochs -> mAP 0.035), while this vocabulary reached torch mAP 0.556
    at 320px, so a CPU-feasible torch arm can clear the >= 0.2 signal
    bar at full 640px input."""
    os.makedirs(outdir, exist_ok=True)
    rs = np.random.RandomState(seed)
    smin, smax = 18 * size / 320.0, 170 * size / 320.0
    anns = {}
    for split, n in (("train", n_train), ("val", n_val)):
        lines = []
        for i in range(n):
            p = os.path.join(outdir, f"ez{split}{i}.jpg")
            boxes = _gen_image(p, size, rs, smin=smin, smax=smax)
            while not boxes:
                boxes = _gen_image(p, size, rs, smin=smin, smax=smax)
            lines.append(p + " " + " ".join(
                f"{b[0]},{b[1]},{b[2]},{b[3]},{b[4]}" for b in boxes) + "\n")
        ann = os.path.join(outdir, f"ez_{split}.txt")
        with open(ann, "w") as f:
            f.writelines(lines)
        anns[split] = ann
    return anns["train"], anns["val"]


def make_hard_dataset(outdir, n_train=1200, n_val=240, size=320, seed=0):
    """16-class small-object set in the reference annotation format."""
    os.makedirs(outdir, exist_ok=True)
    rs = np.random.RandomState(seed)
    anns = {}
    for split, n in (("train", n_train), ("val", n_val)):
        lines = []
        for i in range(n):
            p = os.path.join(outdir, f"{split}{i}.jpg")
            boxes = _gen_image_hard(p, size, rs)
            while not boxes:
                boxes = _gen_image_hard(p, size, rs)
            lines.append(p + " " + " ".join(
                f"{b[0]},{b[1]},{b[2]},{b[3]},{b[4]}" for b in boxes) + "\n")
        ann = os.path.join(outdir, f"{split}.txt")
        with open(ann, "w") as f:
            f.writelines(lines)
        anns[split] = ann
    return anns["train"], anns["val"]


def make_dataset(outdir, n_train=240, n_val=60, size=320, seed=0):
    os.makedirs(outdir, exist_ok=True)
    rs = np.random.RandomState(seed)
    anns = {}
    for split, n in (("train", n_train), ("val", n_val)):
        lines = []
        for i in range(n):
            p = os.path.join(outdir, f"{split}{i}.jpg")
            boxes = _gen_image(p, size, rs)
            while not boxes:  # every image must carry at least one object
                boxes = _gen_image(p, size, rs)
            lines.append(p + " " + " ".join(
                f"{b[0]},{b[1]},{b[2]},{b[3]},{b[4]}" for b in boxes) + "\n")
        ann = os.path.join(outdir, f"{split}.txt")
        with open(ann, "w") as f:
            f.writelines(lines)
        anns[split] = ann
    return anns["train"], anns["val"]


def fit_anchors(train_ann, seed=0):
    """9 ratio-metric k-means anchors from the train boxes, small->large,
    emitted in the reference's 3x6 layout with mask [[6,7,8],[3,4,5],[0,1,2]]."""
    from yolo_continuous_tpu.tools.gen_anchors import kmeans

    whs = []
    for line in open(train_ann):
        for tok in line.split()[1:]:
            x1, y1, x2, y2, _ = map(float, tok.split(","))
            whs.append((x2 - x1, y2 - y1))
    whs = np.asarray(whs, np.float32)
    centers, _ = kmeans(whs, 9, seed=seed)
    centers = centers[np.argsort(centers[:, 0] * centers[:, 1])]
    flat = [int(round(v)) for wh in centers for v in wh]
    return [flat[0:6], flat[6:12], flat[12:18]]


def write_plans(outdir, train_ann, val_ann, anchors, epochs=60, batch=8,
                size=320):
    """Two plan YAMLs differing only in device/model-cfg-path/save/loader
    knobs; training hyperparameters are identical."""
    import yaml
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    common = dict(
        train=train_ann, val=val_ann, epochs=epochs, batch_size=batch,
        image_size=size, image_chan=3, enhance=True, shuffle=True,
        labels=list(CLASSES),
        anchors=anchors, anchors_mask=[[6, 7, 8], [3, 4, 5], [0, 1, 2]],
        iou_loss_ratio=1.0, anchor_t=4.0, focal_gamma=1.5, focal_alpha=0.25,
        adam=True, decay="Cosine", lrI=0.001, lrF=0.05, momentum=0.937,
        weight_decay=0.0005, warmup=True, warmup_epochs=2,
        warmup_max_iter=50, warmup_momentum=0.8, warmup_bias_lr=0.0001,
        resume=False, save_dir=outdir,
        # mosaic/mixup OFF on both sides: the reference never advances
        # epoch_now (train.py sets it nowhere; yolo_dataset_git.py:40 inits
        # -1) so its mosaic gating differs from ours — jitter/flip/HSV remain
        # active on both, keeping the recipes comparable.
        mosaic=False, mixup=False, mosaic_prob=0.0, mixup_prob=0.0,
    )
    # our enhance knobs mirror the reference's ACTUAL train-path
    # semantics (yolo_dataset_git.py:101: jitter/flip-LR/HSV with
    # hue=.1 sat=.7 val=.4, NO up-down flip) — the repo's shipped
    # enhance.yaml has flip_ud 0.5 / hsv_h 0.015, which would train a
    # different recipe than the torch side and void the A/B.
    ours_enhance = {"hsv_h": 0.1, "hsv_s": 0.7, "hsv_v": 0.4,
                    "flip_lr": 0.5, "flip_ud": 0.0, "equalize": 0.0,
                    "mosaic": 0.0, "mix-up": 0.0, "copy_paste": 0.0}
    ours = dict(common, device="tpu", workers=0, pin_memory=False,
                drop_last=False, save_name="ab_ours",
                model_cfg=os.path.join(repo, "cfg/net/yolov7-tiny.yaml"),
                enhance_cfg=ours_enhance,
                max_boxes=32, cache_images=True, seed=0, ema=True)
    ref = dict(common, device="cpu", workers=0, pin_memory=False,
               drop_last=False, save_name="ab_torch",
               model_cfg="/root/reference/cfg/net/yolov7-tiny.yaml",
               enhance_cfg="/root/reference/cfg/enhance/enhance.yaml")
    paths = {}
    for name, cfg in (("ours", ours), ("torch", ref)):
        p = os.path.join(outdir, f"plan_{name}.yaml")
        with open(p, "w") as f:
            yaml.safe_dump(cfg, f)
        paths[name] = p
    return paths
