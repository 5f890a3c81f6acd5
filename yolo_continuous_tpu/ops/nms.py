"""On-device fixed-capacity non-maximum suppression.

Replaces the reference's host round-trip: conf filter + per-class
``torchvision.ops.nms`` + ``.cpu().numpy()`` (``detect.py:90-144``). Here
the whole post-process is one jitted graph with static shapes:

1. score = obj * max(cls) (``detect.py:108-111``), threshold filter,
2. top-K selection (static capacity ``max_det``),
3. class-aware greedy suppression over the K x K IoU matrix
   (exact greedy NMS, same keep-set as torchvision per-class NMS),
4. optional letterbox un-mapping (``detect.py:147-165``).

Returns fixed-shape (boxes, scores, classes, valid) so nothing ever leaves
the device until the caller asks. A Pallas kernel variant lives in
``kernels/nms_pallas.py``; this XLA version is its always-available
fallback and correctness oracle.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from .boxes import box_iou


def _greedy_suppress(iou: jnp.ndarray, same_class: jnp.ndarray, valid: jnp.ndarray,
                     iou_thres: float) -> jnp.ndarray:
    """Greedy NMS keep mask over score-sorted candidates (sequential oracle).

    Exact sequential semantics: element i is kept iff no kept j<i
    suppresses it. O(K) fori_loop with O(K) vector body. Kept as the
    correctness oracle for ``_fixpoint_suppress`` (the default).
    """
    k = iou.shape[0]
    suppress = (iou > iou_thres) & same_class  # (K, K)
    idx = jnp.arange(k)

    def body(i, keep):
        # if i survives, it suppresses all later, overlapping, same-class boxes
        row = suppress[i] & (idx > i) & keep[i]
        return keep & ~row

    keep0 = valid
    return jax.lax.fori_loop(0, k, body, keep0)


def _fixpoint_suppress(iou: jnp.ndarray, same_class: jnp.ndarray,
                       valid: jnp.ndarray, iou_thres: float) -> jnp.ndarray:
    """Exact greedy NMS as a dataflow fixpoint (TPU-native default).

    keep_{t+1}[j] = valid[j] & not any_i (sup[i, j] & keep_t[i]) with
    sup[i, j] = higher-scored i would suppress j. Correct values
    propagate down the suppression DAG one depth level per iteration
    (induction on chain depth), so the while-loop converges to exactly
    the sequential greedy keep-set in (max chain depth + 1) iterations —
    typically 2-5 MXU matvecs instead of K sequential steps.
    """
    k = iou.shape[0]
    idx = jnp.arange(k)
    sup = ((iou > iou_thres) & same_class &
           (idx[None, :] > idx[:, None])).astype(jnp.float32)

    def cond(carry):
        keep, prev, it = carry
        return (it < k) & jnp.any(keep != prev)

    def body(carry):
        keep, prev, it = carry
        hit = (keep.astype(jnp.float32) @ sup) > 0.5
        return valid & ~hit, keep, it + 1

    keep, _, _ = jax.lax.while_loop(
        cond, body, (valid, jnp.zeros_like(valid), jnp.int32(0)))
    return keep


def _nms_core(pred, conf_thres, iou_thres, max_det, per_class, use_pallas):
    pred = jnp.asarray(pred, jnp.float32)
    nc = pred.shape[-1] - 5
    obj = pred[:, 4]
    cls_conf = jnp.max(pred[:, 5:5 + nc], axis=-1)
    cls_id = jnp.argmax(pred[:, 5:5 + nc], axis=-1)
    score = obj * cls_conf                      # detect.py:111,133
    ok = score >= conf_thres
    ranked = jnp.where(ok, score, -1.0)

    k = min(max_det, pred.shape[0])
    top_scores, top_idx = jax.lax.top_k(ranked, k)
    valid = top_scores > 0.0

    boxes_xywh = pred[top_idx, :4]
    boxes = jnp.concatenate(
        [boxes_xywh[:, :2] - boxes_xywh[:, 2:] / 2,
         boxes_xywh[:, :2] + boxes_xywh[:, 2:] / 2], axis=-1)  # detect.py:98-103
    classes = cls_id[top_idx]

    if use_pallas:
        from ..kernels.nms_pallas import pallas_suppress, pallas_suppress_tiled
        classes_for_sup = classes if per_class else jnp.zeros_like(classes)
        if k > 1024:
            # single-VMEM-block (K,K) matrix caps the in-kernel greedy
            # at K~1024; beyond that, the row-tiled fixpoint kernel
            keep = pallas_suppress_tiled(boxes, classes_for_sup, valid,
                                         iou_thres)
        else:
            keep = pallas_suppress(boxes, classes_for_sup, valid, iou_thres)
    else:
        iou = box_iou(boxes, boxes)
        same_class = (classes[:, None] == classes[None, :]) if per_class \
            else jnp.ones((k, k), bool)
        keep = _fixpoint_suppress(iou, same_class, valid, iou_thres)

    if k < max_det:  # pad up to static capacity
        padn = max_det - k
        boxes = jnp.pad(boxes, ((0, padn), (0, 0)))
        top_scores = jnp.pad(top_scores, (0, padn))
        classes = jnp.pad(classes, (0, padn))
        keep = jnp.pad(keep, (0, padn))
    return boxes, top_scores, classes, keep


def _auto_pallas(use_pallas):
    if use_pallas is None:
        # the Pallas kernel measures ~1.5x faster at production candidate
        # counts on TPU (25200 -> 300: 1.18ms vs 1.80ms); off-TPU use XLA.
        # Round-5 dispatch validation (reports/nms_tpu_smoke.json,
        # scripts/tpu_smoke_nms.py): with RTT-cancelling chained timing,
        # ALL three paths (block kernel K<=1024, row-tiled kernel,
        # XLA fixpoint) run 0.2-2 ms at every K in {300..4096} with
        # bit-identical keep-sets — the earlier 27-29 ms "tiled p50" was
        # per-call tunnel RTT, not kernel time. Winners flip run-to-run
        # within noise, so the dispatch below never picks a
        # significantly slower path at any size.
        return jax.default_backend() == "tpu"
    return use_pallas


@partial(jax.jit, static_argnames=("max_det", "per_class", "use_pallas"))
def _nms_single_jit(pred, conf_thres, iou_thres, max_det, per_class, use_pallas):
    return _nms_core(pred, conf_thres, iou_thres, max_det, per_class, use_pallas)


def nms_single(
    pred: jnp.ndarray,            # (N, 5+nc): cx,cy,w,h (any consistent units), obj, cls...
    conf_thres: float = 0.5,
    iou_thres: float = 0.4,
    max_det: int = 300,
    per_class: bool = True,
    use_pallas: bool = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One image -> (boxes_xyxy (max_det,4), scores, classes, valid)."""
    return _nms_single_jit(pred, conf_thres, iou_thres, max_det, per_class,
                           _auto_pallas(use_pallas))


@partial(jax.jit, static_argnames=("max_det", "per_class", "use_pallas"))
def _batched_nms_jit(pred, conf_thres, iou_thres, max_det, per_class, use_pallas):
    return jax.vmap(
        lambda p: _nms_core(p, conf_thres, iou_thres, max_det, per_class,
                            use_pallas)
    )(jnp.asarray(pred, jnp.float32))


def batched_nms(
    pred: jnp.ndarray,            # (bs, N, 5+nc)
    conf_thres: float = 0.5,
    iou_thres: float = 0.4,
    max_det: int = 300,
    per_class: bool = True,
    use_pallas: bool = None,
):
    return _batched_nms_jit(pred, conf_thres, iou_thres, max_det, per_class,
                            _auto_pallas(use_pallas))


def yolo_correct_boxes_np(boxes_xyxy, input_shape, image_shapes,
                          letterbox_image: bool = True):
    """Host-side (numpy) twin of :func:`yolo_correct_boxes`.

    Pure elementwise math on already-fetched arrays — the serving layer
    uses this so mapping a whole batch of boxes back to original-image
    pixels costs ZERO device round trips (each host sync through the
    TPU tunnel is ~100 ms). Supports batched ``image_shapes``:
    ``boxes_xyxy`` (..., N, 4) with ``image_shapes`` (..., 2) maps each
    leading-index slice with its own original (h, w).
    """
    import numpy as np
    boxes_xyxy = np.asarray(boxes_xyxy, np.float32)
    input_shape = np.asarray(input_shape, np.float32)            # (2,)
    image_shapes = np.asarray(image_shapes, np.float32)          # (..., 2)
    img = image_shapes[..., None, :]                             # (..., 1, 2)
    box_yx = ((boxes_xyxy[..., 0:2] + boxes_xyxy[..., 2:4]) / 2)[..., ::-1]
    box_hw = (boxes_xyxy[..., 2:4] - boxes_xyxy[..., 0:2])[..., ::-1]
    if letterbox_image:
        new_shape = np.round(
            img * np.min(input_shape / img, axis=-1, keepdims=True))
        offset = (input_shape - new_shape) / 2.0 / input_shape
        scale = input_shape / new_shape
        box_yx = (box_yx - offset) * scale
        box_hw = box_hw * scale
    boxes = np.concatenate(
        [box_yx - box_hw / 2.0, box_yx + box_hw / 2.0], axis=-1)
    return boxes * np.concatenate([img, img], axis=-1)


def yolo_correct_boxes(
    boxes_xyxy: jnp.ndarray,      # (.., 4) normalized x1,y1,x2,y2 in net-input space
    input_shape,                  # (h, w) of the network input
    image_shape,                  # (h, w) of the original image
    letterbox_image: bool = True,
) -> jnp.ndarray:
    """Map normalized net-space boxes back to original-image pixels (y1x1y2x2).

    Mirrors ``detect.py:147-165`` (which works in y/x order and returns
    boxes scaled by the original image shape).
    """
    box_xy = (boxes_xyxy[..., 0:2] + boxes_xyxy[..., 2:4]) / 2
    box_wh = boxes_xyxy[..., 2:4] - boxes_xyxy[..., 0:2]
    box_yx = box_xy[..., ::-1]
    box_hw = box_wh[..., ::-1]
    input_shape = jnp.asarray(input_shape, jnp.float32)
    image_shape = jnp.asarray(image_shape, jnp.float32)
    if letterbox_image:
        new_shape = jnp.round(image_shape * jnp.min(input_shape / image_shape))
        offset = (input_shape - new_shape) / 2.0 / input_shape
        scale = input_shape / new_shape
        box_yx = (box_yx - offset) * scale
        box_hw = box_hw * scale
    box_mins = box_yx - box_hw / 2.0
    box_maxes = box_yx + box_hw / 2.0
    boxes = jnp.concatenate([box_mins, box_maxes], axis=-1)
    return boxes * jnp.concatenate([image_shape, image_shape], axis=-1)
