"""YOLOv7-style SimOTA loss under static shapes (jit/vmap-native).

Parity target: ``losses/yolo_loss.py:21-387`` — the whole training loss:

- ``find_3_positive`` (``:294-387``): anchor-ratio filter
  ``max(r, 1/r) < 4`` + 0.5-offset neighbor-cell expansion (5 candidate
  cells per gt x anchor), grid indices clamped.
- ``build_targets`` SimOTA (``:125-292``): per-image candidate decode at
  all levels, pairwise IoU cost ``-log(iou + 1e-8)``, dynamic-k from the
  top-20 IoU sum, cls cost = BCE of ``sqrt(cls_sig * obj_sig)`` logits vs
  one-hot, total cost ``cls + 3 * iou``, top-k assignment, conflict
  resolution (one prediction -> its min-cost gt).
- final per-level loss (``:74-123``): CIoU box loss, IoU-valued obj
  targets, label-smoothed one-hot cls, QFocal on cls+obj, per-level
  balance [0.4, 1.0, 4] for strides [32, 16, 8], gains box 0.05 /
  obj (HW/640^2) / cls 0.5*nc/80.

TPU-first re-design (SURVEY §3.4/§7 "hard part #1"): the reference loops
Python over the batch (``:141``) and over gts (``:245``) with boolean
indexing everywhere — all dynamic shapes. Here:

- ground truth is padded to a static ``(bs, max_gt, 5)`` + mask,
- candidate positives have static capacity ``5 * na * max_gt`` per level,
- dynamic-k top-k becomes a rank-vs-k comparison on an argsorted cost row,
- the batch loop is a ``vmap``,
- duplicate obj-target writes become a deterministic scatter-max
  (the torch version's duplicate index assignment is nondeterministic).

The cls-cost term uses the one-hot decomposition
``sum_c BCE(l_c, onehot_c) = sum_c BCE(l_c, 0) - l_{cls}``, which avoids
materializing the (gt, candidate, class) tensor the reference builds
(``:223-237``) — O(G*N) instead of O(G*N*C) memory.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.boxes import bbox_iou, box_iou
from .focal import qfocal_loss

_BIG = 1e9


def smooth_bce(eps: float = 0.1) -> Tuple[float, float]:
    """Positive/negative label-smoothing targets; losses/yolo_loss.py:16-18."""
    return 1.0 - 0.5 * eps, 0.5 * eps


def _balance_for_stride(stride: int) -> float:
    """Per-level obj balance; losses/yolo_loss.py:36 ([0.4,1,4] for [32,16,8]).
    Stride 64 (P6 models) uses 0.1 per upstream YOLOv7 convention."""
    return {64: 0.1, 32: 0.4, 16: 1.0, 8: 4.0}.get(int(stride), 1.0)


@dataclass(frozen=True)
class LossConfig:
    num_classes: int
    input_size: Tuple[int, int]                    # (H, W) of the net input
    strides: Tuple[int, ...]                       # per pred level
    anchors: Tuple[Tuple[Tuple[float, float], ...], ...]  # per level, px
    max_gt: int = 128
    label_smoothing: float = 0.0
    fl_gamma: float = 1.5
    fl_alpha: float = 0.25
    box_ratio: float = 0.05                        # yolo_loss.py:39
    iou_ratio: float = 1.0                         # gr blend; yolo_loss.py:45,106
    threshold: float = 4.0                         # yolo_loss.py:42
    topk: int = 20                                 # yolo_loss.py:219
    aux_weight: float = 0.25                       # aux-head loss weight (YOLOv7 paper)

    @property
    def obj_ratio(self) -> float:                  # yolo_loss.py:40
        return 1.0 * (self.input_size[0] * self.input_size[1]) / (640.0 ** 2)

    @property
    def cls_ratio(self) -> float:                  # yolo_loss.py:41
        return 0.5 * (self.num_classes / 80.0)


def _sigmoid(x):
    return jax.nn.sigmoid(x)  # grad-safe at extreme logits


# ---------------------------------------------------------------------------
# candidate generation (find_3_positive, static capacity)
# ---------------------------------------------------------------------------

# unit offset stencil [0,0],[1,0],[0,1],[-1,0],[0,-1]; scaled by the
# offset gain g (0.5 for lead heads, yolo_loss.py:311-316; 1.0 for aux
# heads — YOLOv7's find_5_positive widened coarse assignment).
# NB deliberately a NUMPY constant: a module-level jnp.array initializes
# the jax backend at import time, which dials the TPU tunnel before any
# CLI's --device/select_device config update can run (and hangs every
# entry point whenever the tunnel is unhealthy).
_UNIT_OFFSETS = np.array(
    [[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [-1.0, 0.0], [0.0, -1.0]],
    np.float32)


def _candidates_level(tgt, tmask, h, w, anchors_f, threshold, g=0.5):
    """Candidate positives at one level for ONE image.

    tgt: (G, 5) [cls, cx, cy, bw, bh] normalized; tmask: (G,) bool.
    ``g``: neighbor-cell offset gain — 0.5 selects center + 2 nearest
    cells (find_3_positive); 1.0 selects all 5 stencil cells
    (find_5_positive, used for aux-head assignment).
    Returns flattened (C,) arrays with C = 5 * na * G:
    gt_idx, a_idx (static patterns), gi, gj (dynamic), mask (dynamic).
    """
    G = tgt.shape[0]
    na = anchors_f.shape[0]
    scale = jnp.array([w, h], jnp.float32)
    gxy = tgt[:, 1:3] * scale                     # (G,2) grid-space center
    gwh = tgt[:, 3:5] * scale

    # anchor-ratio filter; yolo_loss.py:342-344
    r = gwh[None, :, :] / anchors_f[:, None, :]   # (na,G,2)
    valid_a = jnp.max(jnp.maximum(r, 1.0 / r), axis=-1) < threshold  # (na,G)

    # neighbor-cell conditions; yolo_loss.py:350-354
    gxi = scale - gxy
    jx, ky = ((gxy % 1.0 < g) & (gxy > 1.0)).T    # x-left, y-up
    lx, my = ((gxi % 1.0 < g) & (gxi > 1.0)).T    # x-right, y-down
    off_ok = jnp.stack([jnp.ones_like(jx), jx, ky, lx, my])  # (5,G)

    gij = jnp.floor(gxy[None, :, :] - g * _UNIT_OFFSETS[:, None, :]) \
        .astype(jnp.int32)                        # (5,G,2)
    gi = jnp.clip(gij[..., 0], 0, w - 1)          # yolo_loss.py:384 clamp
    gj = jnp.clip(gij[..., 1], 0, h - 1)

    mask = off_ok[:, None, :] & valid_a[None, :, :] & tmask[None, None, :]  # (5,na,G)
    gi = jnp.broadcast_to(gi[:, None, :], (5, na, G))
    gj = jnp.broadcast_to(gj[:, None, :], (5, na, G))
    gt_idx = jnp.broadcast_to(jnp.arange(G)[None, None, :], (5, na, G))
    a_idx = jnp.broadcast_to(jnp.arange(na)[None, :, None], (5, na, G))
    C = 5 * na * G
    return (gt_idx.reshape(C), a_idx.reshape(C), gi.reshape(C), gj.reshape(C),
            mask.reshape(C))


# ---------------------------------------------------------------------------
# SimOTA matching for one image (vmapped over batch)
# ---------------------------------------------------------------------------

def _simota_match(tbox_xyxy, tcls, tmask, pbox_xyxy, p_obj, p_cls, cand_mask,
                  topk: int):
    """build_targets core (losses/yolo_loss.py:196-258) for one image.

    Shapes: tbox (G,4) px; tcls (G,); pbox (N,4) px; p_obj (N,); p_cls (N,nc).
    Returns fg (N,) bool, matched_gt (N,) int32.
    """
    G = tbox_xyxy.shape[0]
    N = pbox_xyxy.shape[0]
    pair_mask = tmask[:, None] & cand_mask[None, :]              # (G,N)

    pair_iou = box_iou(tbox_xyxy, pbox_xyxy)                      # (G,N)
    pair_iou = jnp.where(pair_mask, pair_iou, 0.0)
    iou_cost = -jnp.log(pair_iou + 1e-8)                          # :216

    # dynamic-k from top-20 IoU sum; :219-220 (.int() truncates)
    k = min(topk, N)
    top_iou, _ = jax.lax.top_k(pair_iou, k)                       # (G,k)
    dynamic_k = jnp.clip(jnp.sum(top_iou, axis=1).astype(jnp.int32), 1, None)

    # cls cost via one-hot decomposition of :223-237
    y = jnp.sqrt(_sigmoid(p_cls) * _sigmoid(p_obj)[:, None])      # (N,nc)
    logit = jnp.log(y / (1.0 - y))
    # BCE(l, 0) = softplus(l) (stable form)
    bce0 = jnp.clip(logit, 0, None) + jnp.log1p(jnp.exp(-jnp.abs(logit)))
    s0 = jnp.sum(bce0, axis=-1)                                   # (N,)
    # logit at each gt's class: (G,N)
    l_at_cls = logit.T[tcls.astype(jnp.int32)]                    # (G,N)
    cls_cost = s0[None, :] - l_at_cls

    cost = cls_cost + 3.0 * iou_cost                              # :241
    cost = jnp.where(pair_mask, cost, _BIG)
    # deterministic tie-break by candidate index (torch top-k picks exactly
    # k on ties; the epsilon keeps our threshold form doing the same)
    cost = cost + jnp.arange(N, dtype=jnp.float32)[None, :] * 1e-6

    # dynamic_k smallest per gt via a bounded top-k (dynamic_k <= topk),
    # replacing the reference's per-gt topk loop (:244-247) AND the full
    # argsort-rank formulation — O(N log k) instead of O(N log N)
    neg_top, _ = jax.lax.top_k(-cost, k)                          # (G,k) sorted
    kth_val = jnp.take_along_axis(-neg_top, dynamic_k[:, None] - 1, axis=1)
    matching = (cost <= kth_val) & (cost < _BIG / 2)              # (G,N)

    # conflict resolution; :252-256 (argmin over ALL gts of the column)
    colsum = jnp.sum(matching, axis=0)
    conflicted = colsum > 1
    argmin_g = jnp.argmin(cost, axis=0)                           # (N,)
    onehot_min = jax.nn.one_hot(argmin_g, G, dtype=bool).T        # (G,N)
    matching = jnp.where(conflicted[None, :], onehot_min, matching)

    fg = jnp.any(matching, axis=0) & cand_mask                    # :257
    matched_gt = jnp.argmax(matching, axis=0).astype(jnp.int32)   # :258
    return fg, matched_gt


# ---------------------------------------------------------------------------
# full loss
# ---------------------------------------------------------------------------

def _masked_mean(x, mask, count):
    return jnp.sum(x * mask) / jnp.maximum(count, 1.0)


def yolo_loss(
    preds: Sequence[jnp.ndarray],   # per level (bs, h, w, na, no) raw logits
    targets: jnp.ndarray,           # (bs, max_gt, 5) [cls, cx, cy, w, h] normalized
    tmask: jnp.ndarray,             # (bs, max_gt) bool
    cfg: LossConfig,
    aux_preds: Sequence[jnp.ndarray] = (),
):
    """Total training loss. Returns (scalar, dict of parts).

    ``aux_preds``: optional coarse maps from IAuxDetect (same grid sizes
    as ``preds``); trained with YOLOv7's widened coarse assignment — a
    find_5_positive (g=1.0) candidate set matched by a second SimOTA
    pass whose costs use the lead predictions — at ``aux_weight`` (the
    reference loss predates aux training; SURVEY §2 flags that its
    shipped loss cannot consume IAuxDetect's 6 maps).
    """
    nl = len(cfg.strides)
    # HBM-traffic note: head maps arrive in the compute dtype (bf16 on
    # TPU) and are NOT upcast wholesale — a full fp32 copy of the three
    # (bs,h,w,na,no) maps costs ~2x the step's dominant activation
    # traffic (round-1 roofline: the step is bandwidth-bound). Instead
    # the small candidate gathers and the 1-of-no obj-channel slice are
    # cast to fp32 where the math needs it; values are bit-identical to
    # the upcast-first formulation (casts commute with gather/slice).
    preds = [jnp.asarray(p) for p in preds]
    targets = jnp.asarray(targets, jnp.float32)
    tmask = jnp.asarray(tmask, bool)
    bs = targets.shape[0]
    img_size = float(cfg.input_size[0])  # yolo_loss.py:153 uses image H

    # gt boxes in px (xywh -> xyxy); :153-156
    txywh = targets[:, :, 1:5] * img_size
    tbox_xyxy = jnp.concatenate([txywh[..., :2] - txywh[..., 2:] / 2,
                                 txywh[..., :2] + txywh[..., 2:] / 2], axis=-1)
    tcls = targets[:, :, 0].astype(jnp.int32)

    def build_cands(gather_preds, g):
        """Candidate cells at offset gain g, with ``gather_preds`` maps
        gathered at those cells (vmapped over batch)."""
        cand = []   # per level dict of (bs, C_l) arrays + static parts
        for i in range(nl):
            h, w = preds[i].shape[1], preds[i].shape[2]
            anchors_f = jnp.asarray(cfg.anchors[i], jnp.float32) / float(cfg.strides[i])
            gen = jax.vmap(lambda t, m: _candidates_level(
                t, m, h, w, anchors_f, cfg.threshold, g))
            gt_idx, a_idx, gi, gj, mask = gen(targets, tmask)
            gp = gather_preds[i]
            # the gather indices below are built on the LEAD grid (h, w);
            # an aux map with a different grid would silently read wrong
            # cells — fail loudly instead (IAuxDetect shares lead strides)
            assert gp.shape[1:3] == (h, w), (
                f"level {i}: gather map grid {gp.shape[1:3]} != lead ({h}, {w})")
            na = gp.shape[3]
            flat = gp.reshape(bs, h * w * na, gp.shape[-1])
            idx = (gj * w + gi) * na + a_idx
            p_cand = jnp.take_along_axis(flat, idx[..., None], axis=1) \
                .astype(jnp.float32)                                 # (bs, C, no)
            anchors_cand = anchors_f[a_idx[0]]                       # (C,2) static pattern
            cand.append(dict(gt=gt_idx, a=a_idx, gi=gi, gj=gj, mask=mask,
                             p=p_cand, anchors_f=anchors_cand, h=h, w=w,
                             stride=float(cfg.strides[i])))
        return cand

    def match_cands(cand):
        """Decode candidates (stop-grad) and run SimOTA; returns
        per-level fg/matched-gt slices + the flat fg/mask."""
        pbox_all, pobj_all, pcls_all, mask_all = [], [], [], []
        for c in cand:
            p = jax.lax.stop_gradient(c["p"])
            sxy = _sigmoid(p[..., 0:2]) * 2.0 - 0.5
            pxy = (sxy + jnp.stack([c["gi"], c["gj"]], -1)) * c["stride"]   # :190
            pwh = (_sigmoid(p[..., 2:4]) * 2.0) ** 2 * c["anchors_f"] * c["stride"]  # :191
            pbox = jnp.concatenate([pxy - pwh / 2, pxy + pwh / 2], axis=-1)  # xyxy
            pbox_all.append(pbox)
            pobj_all.append(p[..., 4])
            pcls_all.append(p[..., 5:])
            mask_all.append(c["mask"])
        pbox_all = jnp.concatenate(pbox_all, axis=1)     # (bs, N, 4)
        pobj_all = jnp.concatenate(pobj_all, axis=1)
        pcls_all = jnp.concatenate(pcls_all, axis=1)
        mask_all = jnp.concatenate(mask_all, axis=1)

        fg, matched_gt = jax.vmap(partial(_simota_match, topk=cfg.topk))(
            tbox_xyxy, tcls, tmask, pbox_all, pobj_all, pcls_all, mask_all)
        fg = jax.lax.stop_gradient(fg)
        matched_gt = jax.lax.stop_gradient(matched_gt)
        sizes = [c["mask"].shape[1] for c in cand]
        offs = [0]
        for s in sizes:
            offs.append(offs[-1] + s)
        fg_lvl = [fg[:, offs[i]:offs[i + 1]] for i in range(nl)]
        mg_lvl = [matched_gt[:, offs[i]:offs[i + 1]] for i in range(nl)]
        return fg_lvl, mg_lvl, fg, mask_all

    cand = build_cands(preds, 0.5)          # find_3_positive; yolo_loss.py:294
    fg_lvl, mg_lvl, fg, mask_all = match_cands(cand)

    cp, cn = smooth_bce(cfg.label_smoothing)        # yolo_loss.py:44

    def level_losses(preds_lvl, cand_lvl, fg_lvl, mg_lvl):
        box_l = obj_l = cls_l = 0.0
        box_total, obj_total, cls_total = [], [], []
        for i, (pl, c) in enumerate(zip(preds_lvl, cand_lvl)):
            sel = fg_lvl[i] & c["mask"]                             # (bs,C)
            count = jnp.sum(sel)
            self_f = sel.astype(jnp.float32)
            h, w, stride = c["h"], c["w"], c["stride"]
            na = pl.shape[3]
            mg = mg_lvl[i]

            tsel = jnp.take_along_axis(targets, mg[..., None], axis=1)  # (bs,C,5)
            scale = jnp.array([w, h, w, h], jnp.float32)
            tbox_f = tsel[..., 1:5] * scale                         # :97
            grid = jnp.stack([c["gi"], c["gj"]], -1).astype(jnp.float32)
            tbox_f = tbox_f.at[..., 0:2].add(-grid)                 # :98

            p = c["p"]
            pxy = _sigmoid(p[..., 0:2]) * 2.0 - 0.5                 # :92
            pwh = (_sigmoid(p[..., 2:4]) * 2.0) ** 2 * c["anchors_f"]  # :93
            pbox = jnp.concatenate([pxy, pwh], axis=-1)
            iou = bbox_iou(pbox, tbox_f, x1y1x2y2=False, ciou=True)  # :101
            box_total.append((_masked_mean(1.0 - iou, self_f, count), count))

            # obj targets: deterministic scatter-max of the gr-blended
            # detached IoU, tobj = (1-gr) + gr*iou; :105-106
            iou_d = jax.lax.stop_gradient(jnp.clip(iou, 0.0, None))
            tval = (1.0 - cfg.iou_ratio) + cfg.iou_ratio * iou_d
            bidx = jnp.broadcast_to(jnp.arange(bs)[:, None], sel.shape)
            flat_idx = ((bidx * h + c["gj"]) * w + c["gi"]) * na + c["a"]
            vals = jnp.where(sel, tval, -1.0)
            tobj = jnp.zeros((bs * h * w * na,), jnp.float32)
            tobj = tobj.at[flat_idx.reshape(-1)].max(vals.reshape(-1))
            tobj = jnp.clip(tobj, 0.0, None).reshape(bs, h, w, na)
            obj_elem = qfocal_loss(pl[..., 4].astype(jnp.float32), tobj,
                                   cfg.fl_gamma, cfg.fl_alpha)
            obj_total.append((jnp.mean(obj_elem) * _balance_for_stride(stride), None))

            # cls loss; :109-112
            tcls_sel = tsel[..., 0].astype(jnp.int32)
            t = cn + (cp - cn) * jax.nn.one_hot(tcls_sel, cfg.num_classes)
            cls_elem = qfocal_loss(p[..., 5:], t, cfg.fl_gamma, cfg.fl_alpha)
            cls_total.append((
                jnp.sum(cls_elem * self_f[..., None]) /
                (jnp.maximum(count, 1.0) * cfg.num_classes), count))
        box_l = sum(v for v, _ in box_total)
        obj_l = sum(v for v, _ in obj_total)
        cls_l = sum(v for v, _ in cls_total)
        return box_l, obj_l, cls_l

    box_l, obj_l, cls_l = level_losses(preds, cand, fg_lvl, mg_lvl)

    # Aux heads: YOLOv7's coarse-to-fine assignment — candidate cells
    # widened to the full 5-cell stencil (find_5_positive, g=1.0), a
    # SECOND SimOTA match whose costs come from the LEAD predictions at
    # those cells, and the resulting targets applied to the AUX outputs
    # at aux_weight. (The reference loss predates IAuxDetect and cannot
    # consume its 6 maps at all — SURVEY §2; this follows the YOLOv7
    # paper's auxiliary-head recipe instead.)
    if aux_preds:
        aux_preds = [jnp.asarray(a) for a in aux_preds]
        cost_cand = build_cands(preds, 1.0)       # lead preds, widened cells
        afg_lvl, amg_lvl, _, _ = match_cands(cost_cand)
        aux_cand = [dict(cc, p=ac["p"]) for cc, ac in
                    zip(cost_cand, build_cands(aux_preds, 1.0))]
        abox, aobj, acls = level_losses(aux_preds, aux_cand, afg_lvl, amg_lvl)
        box_l = box_l + cfg.aux_weight * abox
        obj_l = obj_l + cfg.aux_weight * aobj
        cls_l = cls_l + cfg.aux_weight * acls

    box_l = box_l * cfg.box_ratio       # :118-120
    obj_l = obj_l * cfg.obj_ratio
    cls_l = cls_l * cfg.cls_ratio
    loss = box_l + obj_l + cls_l        # :122
    return loss, {"box": box_l, "obj": obj_l, "cls": cls_l,
                  "num_fg": jnp.sum(fg & mask_all)}


def na_of(pred):
    return pred.shape[3]
