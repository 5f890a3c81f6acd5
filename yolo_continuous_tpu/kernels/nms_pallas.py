"""Pallas TPU kernel for greedy class-aware NMS suppression.

Replaces the reference's host round-trip per-class ``torchvision.ops.nms``
(``detect.py:130-140``) at the kernel level. The surrounding stages
(score computation, threshold, top-K) are single fused XLA ops already;
the sequential greedy suppression is the part XLA executes as a ~K-step
while-loop over tiny tensors — here it becomes ONE kernel launch that
keeps the IoU matrix and the keep-vector in VMEM for the whole loop.

Layout: candidates are padded to a static K (multiple of 128 lanes).
Inputs are the score-sorted top-K boxes; ``keep[i]`` survives iff no kept
higher-scored j<i of the same class overlaps it beyond ``iou_thres`` —
exactly the torchvision keep-set.

Falls back to interpret mode off-TPU (tests run it on CPU).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(boxes_ref, classes_ref, valid_ref, thr_ref, keep_ref, sup_ref):
    """boxes (K,4) f32; classes (K,1) i32; valid (K,1) i32; thr (1,1) f32 SMEM;
    keep (K,1) i32 out; sup (K,K) f32 scratch."""
    k = boxes_ref.shape[0]
    x1 = boxes_ref[:, 0:1]
    y1 = boxes_ref[:, 1:2]
    x2 = boxes_ref[:, 2:3]
    y2 = boxes_ref[:, 3:4]
    area = (x2 - x1) * (y2 - y1)                      # (K,1)

    ix1 = jnp.maximum(x1, x1.T)                        # (K,K)
    iy1 = jnp.maximum(y1, y1.T)
    ix2 = jnp.minimum(x2, x2.T)
    iy2 = jnp.minimum(y2, y2.T)
    inter = jnp.clip(ix2 - ix1, 0.0, None) * jnp.clip(iy2 - iy1, 0.0, None)
    iou = inter / (area + area.T - inter + 1e-9)

    same = (classes_ref[:, 0:1] == classes_ref[:, 0:1].T)
    col = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    # sup[i, j] = 1 if i (higher score) would suppress j
    sup_ref[:, :] = jnp.where(
        (iou > thr_ref[0, 0]) & same & (col > row), 1.0, 0.0)

    keep_ref[:, :] = valid_ref[:, :]

    def body(i, _):
        alive = keep_ref[i, 0] > 0
        row_i = sup_ref[i, :] * jnp.where(alive, 1.0, 0.0)   # (K,)
        keep_ref[:, 0] = jnp.where(row_i > 0.5, 0, keep_ref[:, 0])
        return 0

    jax.lax.fori_loop(0, k, body, 0)


@partial(jax.jit, static_argnames=("interpret",))
def pallas_suppress(boxes: jnp.ndarray, classes: jnp.ndarray,
                    valid: jnp.ndarray, iou_thres,
                    interpret: bool = False) -> jnp.ndarray:
    """(K,4) f32 boxes, (K,) i32 classes, (K,) bool valid -> (K,) bool keep."""
    k = boxes.shape[0]
    kp = -(-k // 128) * 128  # pad K to the 128-lane boundary
    if kp != k:
        boxes = jnp.pad(boxes, ((0, kp - k), (0, 0)))
        classes = jnp.pad(classes, (0, kp - k), constant_values=-1)
        valid = jnp.pad(valid, (0, kp - k))
    thr = jnp.asarray(iou_thres, jnp.float32).reshape(1, 1)
    keep = pl.pallas_call(
        _nms_kernel,
        out_shape=jax.ShapeDtypeStruct((kp, 1), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((kp, kp), jnp.float32)],
        interpret=interpret,
    )(boxes.astype(jnp.float32), classes.astype(jnp.int32).reshape(kp, 1),
      valid.astype(jnp.int32).reshape(kp, 1), thr)
    return keep[:k, 0] > 0


def _hit_kernel(tile: int, boxes_ref, classes_ref, keep_ref, thr_ref,
                hit_ref):
    """One row-tile sweep of the fixpoint: hit[j] |= any_i in tile
    (sup[i, j] & keep[i]).

    boxes (K,4) f32, classes (K,1) i32, keep (K,1) f32 all FULL in VMEM
    (K*4 floats — tiny); the (tile, K) suppression tile is recomputed
    from boxes on the fly, so VMEM holds tile*K floats instead of the
    K*K matrix that caps the single-block kernel at K~1024.
    """
    i = pl.program_id(0)
    k = boxes_ref.shape[0]
    r = pl.ds(i * tile, tile)
    x1r, y1r = boxes_ref[r, 0:1], boxes_ref[r, 1:2]       # (T,1)
    x2r, y2r = boxes_ref[r, 2:3], boxes_ref[r, 3:4]
    x1c, y1c = boxes_ref[:, 0:1].T, boxes_ref[:, 1:2].T   # (1,K)
    x2c, y2c = boxes_ref[:, 2:3].T, boxes_ref[:, 3:4].T
    inter = (jnp.clip(jnp.minimum(x2r, x2c) - jnp.maximum(x1r, x1c), 0.0, None)
             * jnp.clip(jnp.minimum(y2r, y2c) - jnp.maximum(y1r, y1c),
                        0.0, None))
    area_r = (x2r - x1r) * (y2r - y1r)
    area_c = (x2c - x1c) * (y2c - y1c)
    iou = inter / (area_r + area_c - inter + 1e-9)        # (T,K)

    same = classes_ref[r, 0:1] == classes_ref[:, 0:1].T
    col = jax.lax.broadcasted_iota(jnp.int32, (tile, k), 1)
    row = i * tile + jax.lax.broadcasted_iota(jnp.int32, (tile, k), 0)
    sup = (iou > thr_ref[0, 0]) & same & (col > row)      # (T,K)
    partial = jnp.max(jnp.where(sup, keep_ref[r, 0:1], 0.0),
                      axis=0, keepdims=True)              # (1,K)

    @pl.when(i == 0)
    def _init():
        hit_ref[:, :] = jnp.zeros_like(hit_ref)

    hit_ref[:, :] = jnp.maximum(hit_ref[:, :], partial)


@partial(jax.jit, static_argnames=("tile", "interpret"))
def pallas_suppress_tiled(boxes: jnp.ndarray, classes: jnp.ndarray,
                          valid: jnp.ndarray, iou_thres, tile: int = 256,
                          interpret: bool = False) -> jnp.ndarray:
    """Row-tiled fixpoint NMS suppression — exact greedy keep-set for K
    beyond the single-VMEM-block limit (tested at K=4096).

    The dataflow fixpoint of ``ops.nms._fixpoint_suppress``:
    ``keep_{t+1}[j] = valid[j] & !any_i(sup[i,j] & keep_t[i])``
    converges to the sequential greedy keep-set in (suppression-chain
    depth + 1) sweeps. Each sweep is ONE pallas_call whose grid walks
    row tiles sequentially, recomputing the (tile, K) IoU block in VMEM
    — no (K, K) materialization anywhere.

    VMEM/complexity envelope (round-3 advisor finding): per tile the
    kernel holds the full (K, 4) boxes plus a handful of live (tile, K)
    f32 temporaries — ~1 MB each at K=4096/tile=256 — linear in K, so
    the practical ceiling on a 128 MB-VMEM core is K ~ 64k; the
    supported/validated envelope is **K <= 4096** (the largest size
    ops/nms.py auto-dispatches), checked ON HARDWARE by
    scripts/tpu_smoke_nms.py (keep-set == XLA fixpoint reference,
    reports/nms_tpu_smoke.json). Worst-case sweep count is the
    suppression-chain depth (O(K) only for a fully chained pathological
    box set; measured real inputs converge in <=8 sweeps).
    """
    k = boxes.shape[0]
    kp = -(-k // max(tile, 128)) * max(tile, 128)
    if kp != k:
        boxes = jnp.pad(boxes, ((0, kp - k), (0, 0)))
        classes = jnp.pad(classes, (0, kp - k), constant_values=-1)
        valid = jnp.pad(valid, (0, kp - k))
    boxes = boxes.astype(jnp.float32)
    classes2 = classes.astype(jnp.int32).reshape(kp, 1)
    thr = jnp.asarray(iou_thres, jnp.float32).reshape(1, 1)

    sweep = pl.pallas_call(
        partial(_hit_kernel, tile),
        grid=(kp // tile,),
        out_shape=jax.ShapeDtypeStruct((1, kp), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )

    def cond(carry):
        keep, prev, it = carry
        return (it < kp) & jnp.any(keep != prev)

    def body(carry):
        keep, prev, it = carry
        hit = sweep(boxes, classes2,
                    keep.astype(jnp.float32).reshape(kp, 1), thr)[0] > 0.5
        return valid & ~hit, keep, it + 1

    keep, _, _ = jax.lax.while_loop(
        cond, body, (valid, jnp.zeros_like(valid), jnp.int32(0)))
    return keep[:k]


def nms_single_pallas(pred: jnp.ndarray, conf_thres: float = 0.5,
                      iou_thres: float = 0.4, max_det: int = 300,
                      interpret: bool = False):
    """Drop-in variant of ops.nms.nms_single with the Pallas suppression."""
    pred = jnp.asarray(pred, jnp.float32)
    nc = pred.shape[-1] - 5
    obj = pred[:, 4]
    cls_conf = jnp.max(pred[:, 5:5 + nc], axis=-1)
    cls_id = jnp.argmax(pred[:, 5:5 + nc], axis=-1)
    score = obj * cls_conf
    ok = score >= conf_thres
    ranked = jnp.where(ok, score, -1.0)
    k = min(max_det, pred.shape[0])
    top_scores, top_idx = jax.lax.top_k(ranked, k)
    valid = top_scores > 0.0
    bxywh = pred[top_idx, :4]
    boxes = jnp.concatenate([bxywh[:, :2] - bxywh[:, 2:] / 2,
                             bxywh[:, :2] + bxywh[:, 2:] / 2], axis=-1)
    classes = cls_id[top_idx]
    keep = pallas_suppress(boxes, classes, valid, iou_thres,
                           interpret=interpret)
    if k < max_det:
        padn = max_det - k
        boxes = jnp.pad(boxes, ((0, padn), (0, 0)))
        top_scores = jnp.pad(top_scores, (0, padn))
        classes = jnp.pad(classes, (0, padn))
        keep = jnp.pad(keep, (0, padn))
    return boxes, top_scores, classes, keep
