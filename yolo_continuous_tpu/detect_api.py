"""Single-image / batched inference API.

Parity target: ``detect.py:16-265`` — prepare image (letterbox 114),
forward, grid decode, conf filter + per-class NMS, letterbox un-map,
TargetBox records, rendering. TPU re-design: decode + NMS run on device
in one jitted graph (``ops/decode`` + ``ops/nms``); only the final
fixed-size result crosses to the host.

Deliberate fix (documented): the reference predicts on cv2's BGR while
training on PIL's RGB (``detect.py:23`` vs ``yolo_dataset_git.py:106``);
here both paths are RGB.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .config.plan import TrainPlan, check_file, cvt_cfg
from .nn.builder import YoloModel, build_model_spec
from .ops.decode import decode_outputs
from .ops.nms import batched_nms, yolo_correct_boxes
from .ops.preprocess import letterbox
from .train.checkpoint import try_load
from .utils.env import setup_compile_cache

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


@dataclass
class TargetBox:
    """Detection record; utils/target_box.py:8-38."""
    left: int
    top: int
    right: int
    bottom: int
    score: float
    label: str
    color: Tuple[int, int, int]

    def get_topleft(self):
        return (self.left, self.top)

    def get_bottomright(self):
        return (self.right, self.bottom)

    def __str__(self):
        info = "-" * 20 + type(self).__name__ + "-" * 20 + "\r\n"
        for key, value in self.__dict__.items():
            info += "%20s :\t%s\r\n" % (key, value)
        return info


def generate_colors(n: int) -> List[Tuple[int, int, int]]:
    """HSV wheel label colors; utils/helper_cv.py:60-64."""
    import colorsys
    out = []
    for i in range(n):
        r, g, b = colorsys.hsv_to_rgb(i / n, 1.0, 1.0)
        out.append((int(r * 255), int(g * 255), int(b * 255)))
    return out


class Detector:
    """Loads a plan + checkpoint and serves jitted end-to-end inference."""

    def __init__(self, plan: TrainPlan, dtype=None, params=None,
                 batch_stats=None, use_ema: bool = True, fuse: bool = False,
                 head_dtype=None, fused_tails=None, quantize=None):
        """fuse=True re-parameterizes RepConv branches into single convs
        (the reference's deploy-time ``fuse()``, nets/yolo_net.py:274-283).
        head_dtype: logit accumulate/output dtype (default fp32, matching
        training; bf16 halves head-map traffic with a measured-zero mAP
        cost on the A/B task — see PARITY_AB.md).
        fused_tails: run eligible 1x1 neck tails as the fused Pallas
        matmul+BN+SiLU kernel (layers.Conv.fused_tail); defaults to the
        plan's ``fused_tails`` key (off).
        quantize=True: serve the Conv body with symmetric int8 PTQ
        (layers.quant_ctx; v5e MXU int8 path). Call ``calibrate(images)``
        with representative inputs BEFORE inferring — it records the
        per-Conv activation scales; defaults to plan key ``quantize``."""
        setup_compile_cache()
        self.plan = plan
        self.dtype = dtype or (jnp.bfloat16 if jax.default_backend() == "tpu"
                               else jnp.float32)
        model_cfg = cvt_cfg(plan.model_cfg)
        self.spec = build_model_spec(model_cfg, plan.image_chan, plan.anchors,
                                     plan.num_labels, plan.anchors_mask)
        self.fuse = fuse
        self.head_dtype = head_dtype or jnp.float32
        if fused_tails is None:
            fused_tails = bool(plan.cfg.get("fused_tails", False))
        self.fused_tails = fused_tails
        if quantize is None:
            quantize = bool(plan.cfg.get("quantize", False))
        self.quantize = bool(quantize)
        self.quant = None          # "quant" collection once calibrated
        self.model = YoloModel(spec=self.spec, dtype=self.dtype,
                               head_dtype=self.head_dtype,
                               fused_tails=fused_tails,
                               quant_mode="int8" if self.quantize else None)
        self.nl = len(self.spec.strides)

        if params is None:
            size = plan.image_size
            x = jnp.zeros((1, size, size, plan.image_chan), jnp.float32)
            variables = self.model.init(jax.random.PRNGKey(0), x, False)
            params = variables["params"]
            batch_stats = variables.get("batch_stats", {})
            tmpl = {"params": params, "batch_stats": batch_stats,
                    "ema": {"tree": {"params": params,
                                     "batch_stats": batch_stats}}}
            ckpt = try_load(plan.save_path, tmpl)
            if ckpt is not None:
                if use_ema and "ema" in ckpt:
                    params = ckpt["ema"]["tree"]["params"]
                    batch_stats = ckpt["ema"]["tree"]["batch_stats"]
                else:
                    params = ckpt["params"]
                    batch_stats = ckpt["batch_stats"]
        if fuse:
            from .nn.fuse import deploy_spec, fuse_model_params
            params, batch_stats = fuse_model_params(self.spec, params,
                                                    batch_stats or {})
            self.spec = deploy_spec(self.spec)
            self.model = YoloModel(spec=self.spec, dtype=self.dtype,
                                   head_dtype=self.head_dtype,
                                   fused_tails=self.fused_tails,
                                   quant_mode="int8" if self.quantize
                                   else None)
        self.params = params
        self.batch_stats = batch_stats or {}
        self._infer = None
        self._infer_key = None

    def reload_weights(self, path: Optional[str] = None,
                       use_ema: bool = True) -> bool:
        """Hot-swap weights from a checkpoint WITHOUT recompiling.

        The jitted infer graph closes over shapes only — params and
        batch_stats are call arguments (``__call__``) — so the swap is
        visible on the very next inference, no warm-up needed. Returns
        True if a checkpoint was loaded, False if none exists at
        ``path`` (default: the plan's ``save_path``). With
        ``quantize=True`` the recorded activation scales are kept;
        re-run ``calibrate()`` after large weight changes.
        """
        path = path or self.plan.save_path
        if not (path and os.path.exists(path)):
            return False
        if self.fuse:
            # checkpoints hold UNFUSED trees (RepConv branches intact):
            # rebuild the training-spec template, load, then re-fuse
            # into this detector's deploy spec
            model_cfg = cvt_cfg(self.plan.model_cfg)
            spec = build_model_spec(model_cfg, self.plan.image_chan,
                                    self.plan.anchors, self.plan.num_labels,
                                    self.plan.anchors_mask)
            model = YoloModel(spec=spec, dtype=self.dtype,
                              head_dtype=self.head_dtype)
            size = self.plan.image_size
            x = jnp.zeros((1, size, size, self.plan.image_chan),
                          jnp.float32)
            variables = model.init(jax.random.PRNGKey(0), x, False)
            params = variables["params"]
            batch_stats = variables.get("batch_stats", {})
        else:
            spec = None
            params, batch_stats = self.params, self.batch_stats
        tmpl = {"params": params, "batch_stats": batch_stats,
                "ema": {"tree": {"params": params,
                                 "batch_stats": batch_stats}}}
        ckpt = try_load(path, tmpl)
        if ckpt is None:
            return False
        if use_ema and "ema" in ckpt:
            params = ckpt["ema"]["tree"]["params"]
            batch_stats = ckpt["ema"]["tree"]["batch_stats"]
        else:
            params = ckpt["params"]
            batch_stats = ckpt["batch_stats"]
        if self.fuse:
            from .nn.fuse import fuse_model_params
            params, batch_stats = fuse_model_params(spec, params,
                                                    batch_stats or {})
        self.params = params
        self.batch_stats = batch_stats or {}
        return True

    def calibrate(self, images, batches=1):
        """Record per-Conv activation scales (int8 PTQ) from
        representative inputs. ``images``: one (bs, H, W, 3) array or an
        iterable of them; the recorded scale is the running max-abs.
        Must be called before inference when ``quantize=True``."""
        assert self.quantize, "calibrate() requires Detector(quantize=True)"
        m = YoloModel(spec=self.spec, dtype=self.dtype,
                      head_dtype=self.head_dtype, quant_mode="calib")
        batches = [images] if hasattr(images, "shape") else list(images)
        quant = self.quant or {}
        fn = jax.jit(lambda q, imgs: m.apply(
            {"params": self.params, "batch_stats": self.batch_stats,
             "quant": q} if q else
            {"params": self.params, "batch_stats": self.batch_stats},
            imgs, False, mutable=["quant"])[1]["quant"])
        for b in batches:
            quant = fn(quant, jnp.asarray(b))
        self.quant = quant
        self._infer = None       # quantized graphs bake the scales in
        return quant

    def _build_infer(self, conf_thres: float, nms_thres: float, max_det: int):
        spec = self.spec
        if self.quantize and self.quant is None:
            raise RuntimeError(
                "Detector(quantize=True) needs calibrate(images) before "
                "inference: the int8 path reads the recorded activation "
                "scales from the 'quant' collection")
        quant = self.quant

        @jax.jit
        def infer(params, batch_stats, images):
            variables = {"params": params, "batch_stats": batch_stats}
            if quant is not None:
                variables["quant"] = quant
            outs = self.model.apply(variables, images, False)
            outs = outs[: self.nl]  # IAuxDetect: leads only (iaux_detect.py:52)
            if spec.head_name == "IBin":
                from .ops.decode import decode_outputs_bin
                pred = decode_outputs_bin(outs, spec.anchors, spec.strides,
                                          spec.bin_count, normalized=True)
            else:
                pred = decode_outputs(outs, spec.anchors, spec.strides,
                                      normalized=True)  # (bs, total, 5+nc)
            return batched_nms(pred, conf_thres, nms_thres, max_det)

        return infer

    def __call__(self, images: jnp.ndarray, conf_thres: float = 0.5,
                 nms_thres: float = 0.4, max_det: int = 300):
        """images: (bs, H, W, 3) float 0..1 -> (boxes_xyxy_norm, scores,
        classes, valid), all fixed-shape on device."""
        key = (conf_thres, nms_thres, max_det)
        if self._infer is None or self._infer_key != key:
            self._infer = self._build_infer(conf_thres, nms_thres, max_det)
            self._infer_key = key
        return self._infer(self.params, self.batch_stats, images)


def predict(cfg_file: str, image_path: str, conf_threshold: float = 0.3,
            nms_threshold: float = 0.3, detector: Optional[Detector] = None,
            save_path: Optional[str] = None, show: bool = False,
            verbose: bool = False):
    """Public API mirroring ``detect.py:208-265``.

    Returns the list of TargetBox records (printed like the reference);
    optionally renders boxes to ``save_path``. ``verbose`` prints the
    per-layer param table (Model.print_info parity, nets/yolo.py:127-141).
    """
    plan = TrainPlan(check_file(cfg_file))
    det = detector or Detector(plan)
    if verbose:
        from .nn.builder import format_model_info
        print(format_model_info(det.spec, det.params, plan.image_size,
                                model=det.model))
    size = (plan.image_size, plan.image_size)

    bgr = cv2.imread(image_path)
    rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
    img, ratio, offset = letterbox(rgb, size, color=(114, 114, 114),
                                   scale_fill=False)
    images = jnp.asarray(img, jnp.float32)[None] / 255.0

    boxes, scores, classes, valid = det(images, conf_threshold, nms_threshold)
    boxes = np.asarray(yolo_correct_boxes(boxes[0], size, bgr.shape[:2], True))
    scores = np.asarray(scores[0])
    classes = np.asarray(classes[0])
    valid = np.asarray(valid[0])

    colors = generate_colors(plan.num_labels)
    target_boxes: List[TargetBox] = []
    h0, w0 = bgr.shape[:2]
    for i in np.where(valid)[0]:
        y1, x1, y2, x2 = boxes[i]  # yolo_correct_boxes emits y1x1y2x2
        x1 = max(0, int(np.floor(x1)))
        y1 = max(0, int(np.floor(y1)))
        x2 = min(w0, int(np.floor(x2)))
        y2 = min(h0, int(np.floor(y2)))
        label = plan.labels[int(classes[i])]
        tb = TargetBox(x1, y1, x2, y2, float(scores[i]), label,
                       colors[int(classes[i])])
        print(tb)
        target_boxes.append(tb)

    if save_path or show:
        canvas = bgr.copy()
        for tb in target_boxes:
            cv2.rectangle(canvas, tb.get_topleft(), tb.get_bottomright(),
                          tb.color, 1)
            info = "{} {:.2f}".format(tb.label, tb.score)
            cv2.putText(canvas, info, (tb.left, max(tb.top - 2, 10)),
                        cv2.FONT_HERSHEY_PLAIN, 1, (255, 255, 255))
        if save_path:
            cv2.imwrite(save_path, canvas)
        if show:  # pragma: no cover (headless env)
            cv2.imshow("Predict", canvas)
            cv2.waitKey()
    return target_boxes
