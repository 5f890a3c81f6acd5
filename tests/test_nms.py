"""NMS parity vs a straightforward numpy greedy implementation
(the algorithm of torchvision.ops.nms used at detect.py:130-133)."""
import numpy as np

import jax.numpy as jnp

from yolo_continuous_tpu.ops.nms import batched_nms, nms_single, yolo_correct_boxes


def np_greedy_nms(boxes, scores, iou_thres):
    """Classic greedy NMS on xyxy boxes -> kept indices (score-desc order)."""
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        x1 = np.maximum(boxes[i, 0], boxes[:, 0])
        y1 = np.maximum(boxes[i, 1], boxes[:, 1])
        x2 = np.minimum(boxes[i, 2], boxes[:, 2])
        y2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        a = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        ai = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        iou = inter / (a + ai - inter)
        suppressed |= iou > iou_thres
    return keep


def _random_preds(n=200, nc=5, seed=0, clustered=True):
    rs = np.random.RandomState(seed)
    if clustered:
        # overlapping clusters so suppression actually triggers
        centers = rs.rand(20, 2) * 0.8 + 0.1
        cxy = centers[rs.randint(0, 20, n)] + rs.randn(n, 2) * 0.01
        wh = np.full((n, 2), 0.15) + rs.randn(n, 2) * 0.01
    else:
        cxy = rs.rand(n, 2) * 0.8 + 0.1
        wh = rs.rand(n, 2) * 0.2 + 0.05
    obj = rs.rand(n)
    cls = rs.rand(n, nc)
    return np.concatenate([cxy, wh, obj[:, None], cls], -1).astype(np.float32)


def test_against_numpy_greedy():
    pred = _random_preds()
    conf, iou_t = 0.3, 0.45
    boxes, scores, classes, valid = (np.asarray(a) for a in
                                     nms_single(jnp.asarray(pred), conf, iou_t, 256))
    # build the expected set: per-class numpy greedy over conf-filtered boxes
    obj = pred[:, 4]
    cc = pred[:, 5:].max(1)
    cid = pred[:, 5:].argmax(1)
    score = obj * cc
    m = score >= conf
    xyxy = np.concatenate([pred[:, :2] - pred[:, 2:4] / 2,
                           pred[:, :2] + pred[:, 2:4] / 2], -1)
    expected = set()
    for c in np.unique(cid[m]):
        sel = np.where(m & (cid == c))[0]
        kept = np_greedy_nms(xyxy[sel], score[sel], iou_t)
        expected.update(tuple(np.round(xyxy[sel][k], 5)) for k in kept)
    got = {tuple(np.round(boxes[i], 5)) for i in range(len(valid)) if valid[i]}
    assert got == expected


def test_batched_shapes():
    pred = np.stack([_random_preds(seed=s) for s in range(3)])
    boxes, scores, classes, valid = batched_nms(jnp.asarray(pred), 0.3, 0.45, 50)
    assert boxes.shape == (3, 50, 4)
    assert valid.dtype == jnp.bool_
    # scores of valid entries are sorted descending per image
    for b in range(3):
        s = np.asarray(scores[b])[np.asarray(valid[b])]
        assert np.all(np.diff(s) <= 1e-6)


def test_conf_threshold_filters_everything():
    pred = _random_preds()
    _, _, _, valid = nms_single(jnp.asarray(pred), conf_thres=2.0)
    assert not bool(np.asarray(valid).any())


def test_yolo_correct_boxes_identity_when_square():
    # square original == input size: mapping reduces to scaling by image size
    boxes = jnp.asarray([[0.25, 0.25, 0.75, 0.75]])
    out = np.asarray(yolo_correct_boxes(boxes, (640, 640), (640, 640), True))
    np.testing.assert_allclose(out, [[160, 160, 480, 480]], atol=1e-3)


def test_yolo_correct_boxes_letterbox():
    # tall 1280x640 (h x w) original letterboxed into 640x640: content spans
    # x in [0.25, 0.75] of net space; x un-squeezes by 2 around the center
    boxes = jnp.asarray([[0.25, 0.375, 0.75, 0.625]])  # x1,y1,x2,y2 normalized
    out = np.asarray(yolo_correct_boxes(boxes, (640, 640), (1280, 640), True))
    # output is y1,x1,y2,x2 scaled by the original image shape
    # (detect.py:147-165): center (0.5,0.5), hw=(0.25,1.0) after unmap
    np.testing.assert_allclose(out, [[480, 0, 800, 640]], atol=1e-2)


def test_yolo_correct_boxes_np_matches_device():
    """Host numpy twin (serving path) vs the jitted device version,
    batched over heterogeneous original shapes."""
    from yolo_continuous_tpu.ops.nms import yolo_correct_boxes_np

    rs = np.random.RandomState(3)
    boxes = rs.rand(4, 7, 4).astype(np.float32)
    boxes[..., 2:] = boxes[..., :2] + boxes[..., 2:] * 0.3
    shapes = [(480, 640), (640, 640), (1280, 720), (97, 311)]
    got = yolo_correct_boxes_np(boxes, (320, 320), shapes, True)
    for i, shp in enumerate(shapes):
        want = np.asarray(
            yolo_correct_boxes(jnp.asarray(boxes[i]), (320, 320), shp, True))
        np.testing.assert_allclose(got[i], want, rtol=1e-5, atol=1e-3)
