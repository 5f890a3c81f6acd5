"""SimOTA training loss for the IBin head (bin + residual box regression).

NEW capability: the reference ships the IBin head (``nets/ibin.py``) and
the SigmoidBin loss component (``losses/sigmoid_bin.py:65-96``) but its
``YOLOLoss`` cannot consume IBin's output layout — IBin is inference-only
there (SURVEY §2). This module wires SigmoidBin into the same SimOTA
assignment machinery as the standard loss:

- channel layout per anchor (nets/ibin.py:20-21, 57-70):
  [x, y, w_reg+w_bins (22) @2:24, h_reg+h_bins (22) @24:46, obj @46, cls @47:]
- matching + obj/cls terms identical to losses/yolo_loss.py,
- the box term becomes SigmoidBin.training_loss on the w/h ratios
  (BCE over bins + MSE on the regressed ratio, target = gt_wh / anchor,
  clamped to the bin range [0, 4]) plus CIoU on the decoded boxes.
"""
from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp

from ..ops.boxes import bbox_iou
from ..ops.sigmoid_bin import SigmoidBinCfg, sigmoid_bin_training_loss
from .focal import qfocal_loss
from .yolo_loss import (LossConfig, _balance_for_stride, _candidates_level,
                        _masked_mean, _sigmoid, _simota_match, smooth_bce)

WH_BIN = SigmoidBinCfg(bin_count=21, vmin=0.0, vmax=4.0)  # nets/ibin.py:17-18


def _bin_layout(no_bin: int, nc: int):
    L = WH_BIN.length  # 22
    assert no_bin == nc + 3 + 2 * L
    return dict(w=slice(2, 2 + L), h=slice(2 + L, 2 + 2 * L),
                obj=2 + 2 * L, cls=slice(3 + 2 * L, 3 + 2 * L + nc))


def _decode_wh_ratio(p, lay):
    """Sigmoided bins -> decoded (w_ratio, h_ratio); nets/ibin.py:62-63."""
    from ..ops.sigmoid_bin import sigmoid_bin_decode
    sw = _sigmoid(p[..., lay["w"]])
    sh = _sigmoid(p[..., lay["h"]])
    return sigmoid_bin_decode(sw, WH_BIN), sigmoid_bin_decode(sh, WH_BIN)


def bin_yolo_loss(
    preds: Sequence[jnp.ndarray],   # per level (bs, h, w, na, nc+3+44)
    targets: jnp.ndarray,           # (bs, max_gt, 5) [cls, cx, cy, w, h]
    tmask: jnp.ndarray,
    cfg: LossConfig,
):
    nl = len(cfg.strides)
    preds = [jnp.asarray(p, jnp.float32) for p in preds]
    targets = jnp.asarray(targets, jnp.float32)
    tmask = jnp.asarray(tmask, bool)
    bs = targets.shape[0]
    img_size = float(cfg.input_size[0])
    nc = cfg.num_classes
    lay = _bin_layout(preds[0].shape[-1], nc)

    cand = []
    for i in range(nl):
        h, w = preds[i].shape[1], preds[i].shape[2]
        na = preds[i].shape[3]
        anchors_f = jnp.asarray(cfg.anchors[i], jnp.float32) / float(cfg.strides[i])
        gen = jax.vmap(lambda t, m: _candidates_level(t, m, h, w, anchors_f,
                                                      cfg.threshold))
        gt_idx, a_idx, gi, gj, mask = gen(targets, tmask)
        flat = preds[i].reshape(bs, h * w * na, preds[i].shape[-1])
        idx = (gj * w + gi) * na + a_idx
        p_cand = jnp.take_along_axis(flat, idx[..., None], axis=1)
        cand.append(dict(gt=gt_idx, a=a_idx, gi=gi, gj=gj, mask=mask,
                         p=p_cand, anchors_f=anchors_f[a_idx[0]], h=h, w=w,
                         stride=float(cfg.strides[i])))

    # candidate boxes in px for the cost (stop-grad)
    pbox_all, pobj_all, pcls_all, mask_all = [], [], [], []
    for c in cand:
        p = jax.lax.stop_gradient(c["p"])
        sxy = _sigmoid(p[..., 0:2]) * 2.0 - 0.5
        pxy = (sxy + jnp.stack([c["gi"], c["gj"]], -1)) * c["stride"]
        wr, hr = _decode_wh_ratio(p, lay)
        pwh = jnp.stack([wr, hr], -1) * c["anchors_f"] * c["stride"]
        pbox_all.append(jnp.concatenate([pxy - pwh / 2, pxy + pwh / 2], -1))
        pobj_all.append(p[..., lay["obj"]])
        pcls_all.append(p[..., lay["cls"]])
        mask_all.append(c["mask"])
    pbox_all = jnp.concatenate(pbox_all, axis=1)
    pobj_all = jnp.concatenate(pobj_all, axis=1)
    pcls_all = jnp.concatenate(pcls_all, axis=1)
    mask_all = jnp.concatenate(mask_all, axis=1)

    txywh = targets[:, :, 1:5] * img_size
    tbox_xyxy = jnp.concatenate([txywh[..., :2] - txywh[..., 2:] / 2,
                                 txywh[..., :2] + txywh[..., 2:] / 2], -1)
    tcls = targets[:, :, 0].astype(jnp.int32)

    fg, matched_gt = jax.vmap(partial(_simota_match, topk=cfg.topk))(
        tbox_xyxy, tcls, tmask, pbox_all, pobj_all, pcls_all, mask_all)
    fg = jax.lax.stop_gradient(fg)
    matched_gt = jax.lax.stop_gradient(matched_gt)

    sizes = [c["mask"].shape[1] for c in cand]
    offs = [0]
    for s in sizes:
        offs.append(offs[-1] + s)

    cp, cn = smooth_bce(cfg.label_smoothing)
    box_l = obj_l = cls_l = bin_l = 0.0
    for i, c in enumerate(cand):
        sel = fg[:, offs[i]:offs[i + 1]] & c["mask"]
        mg = matched_gt[:, offs[i]:offs[i + 1]]
        sel_f = sel.astype(jnp.float32)
        count = jnp.sum(sel)
        h, w, stride = c["h"], c["w"], c["stride"]
        na = preds[i].shape[3]
        p = c["p"]

        tsel = jnp.take_along_axis(targets, mg[..., None], axis=1)
        scale = jnp.array([w, h, w, h], jnp.float32)
        tbox_f = tsel[..., 1:5] * scale
        grid = jnp.stack([c["gi"], c["gj"]], -1).astype(jnp.float32)
        tbox_f = tbox_f.at[..., 0:2].add(-grid)

        # CIoU on decoded boxes (residual path carries the gradient)
        pxy = _sigmoid(p[..., 0:2]) * 2.0 - 0.5
        wr, hr = _decode_wh_ratio(p, lay)
        pwh = jnp.stack([wr, hr], -1) * c["anchors_f"]
        pbox = jnp.concatenate([pxy, pwh], -1)
        iou = bbox_iou(pbox, tbox_f, x1y1x2y2=False, ciou=True)
        box_l += _masked_mean(1.0 - iou, sel_f, count)

        # SigmoidBin training loss on the w/h ratios (sigmoid_bin.py:65-96)
        t_ratio_w = tbox_f[..., 2] / c["anchors_f"][..., 0]
        t_ratio_h = tbox_f[..., 3] / c["anchors_f"][..., 1]
        lw, _ = sigmoid_bin_training_loss(
            p[..., lay["w"]], jnp.clip(t_ratio_w, WH_BIN.vmin, WH_BIN.vmax),
            WH_BIN, mask=sel_f)
        lh, _ = sigmoid_bin_training_loss(
            p[..., lay["h"]], jnp.clip(t_ratio_h, WH_BIN.vmin, WH_BIN.vmax),
            WH_BIN, mask=sel_f)
        bin_l += lw + lh

        # obj targets via scatter-max of detached IoU
        iou_d = jax.lax.stop_gradient(jnp.clip(iou, 0.0, None))
        bidx = jnp.broadcast_to(jnp.arange(bs)[:, None], sel.shape)
        flat_idx = ((bidx * h + c["gj"]) * w + c["gi"]) * na + c["a"]
        vals = jnp.where(sel, iou_d, -1.0)
        tobj = jnp.zeros((bs * h * w * na,), jnp.float32)
        tobj = tobj.at[flat_idx.reshape(-1)].max(vals.reshape(-1))
        tobj = jnp.clip(tobj, 0.0, None).reshape(bs, h, w, na)
        obj_elem = qfocal_loss(preds[i][..., lay["obj"]], tobj,
                               cfg.fl_gamma, cfg.fl_alpha)
        obj_l += jnp.mean(obj_elem) * _balance_for_stride(stride)

        tcls_sel = tsel[..., 0].astype(jnp.int32)
        t = cn + (cp - cn) * jax.nn.one_hot(tcls_sel, nc)
        cls_elem = qfocal_loss(p[..., lay["cls"]], t, cfg.fl_gamma, cfg.fl_alpha)
        cls_l += jnp.sum(cls_elem * sel_f[..., None]) / (
            jnp.maximum(count, 1.0) * nc)

    box_l = box_l * cfg.box_ratio
    obj_l = obj_l * cfg.obj_ratio
    cls_l = cls_l * cfg.cls_ratio
    bin_l = bin_l * cfg.box_ratio
    loss = box_l + obj_l + cls_l + bin_l
    return loss, {"box": box_l, "obj": obj_l, "cls": cls_l, "bin": bin_l,
                  "num_fg": jnp.sum(fg & mask_all)}
