"""mAP evaluator sanity tests."""
import numpy as np

from yolo_continuous_tpu.eval.evaluator import (DetectionRecord,
                                                GroundTruthRecord,
                                                MAPEvaluator,
                                                average_precision)


def _rec(boxes, scores, classes):
    return DetectionRecord(np.asarray(boxes, np.float32).reshape(-1, 4),
                           np.asarray(scores, np.float32),
                           np.asarray(classes, np.int32))


def _gt(boxes, classes):
    return GroundTruthRecord(np.asarray(boxes, np.float32).reshape(-1, 4),
                             np.asarray(classes, np.int32))


def test_perfect_detections():
    ev = MAPEvaluator(2)
    gt_boxes = [[0, 0, 10, 10], [20, 20, 40, 40]]
    ev.add(_rec(gt_boxes, [0.9, 0.8], [0, 1]), _gt(gt_boxes, [0, 1]))
    assert ev.map50() == 1.0
    assert ev.map50_95() == 1.0


def test_no_detections():
    ev = MAPEvaluator(1)
    ev.add(_rec(np.zeros((0, 4)), [], []), _gt([[0, 0, 10, 10]], [0]))
    assert ev.map50() == 0.0


def test_false_positive_lowers_precision():
    ev = MAPEvaluator(1)
    ev.add(_rec([[0, 0, 10, 10], [50, 50, 60, 60]], [0.9, 0.95], [0, 0]),
           _gt([[0, 0, 10, 10]], [0]))
    m = ev.map50()
    assert 0.0 < m < 1.0
    # higher-scored FP first: precision at the TP is 1/2 -> AP 0.5
    np.testing.assert_allclose(m, 0.5, atol=1e-6)


def test_localization_threshold():
    ev = MAPEvaluator(1)
    # IoU with gt = (5*10)/(10*10 + 10*5... shifted box, IoU ~ 1/3 < 0.5
    ev.add(_rec([[5, 0, 15, 10]], [0.9], [0]), _gt([[0, 0, 10, 10]], [0]))
    assert ev.map50() == 0.0
    assert ev.ap_per_class(0.3)[0] == 1.0


def test_eleven_point_vs_integral():
    rec = np.array([0.2, 0.4, 0.6, 0.8])
    pre = np.array([1.0, 0.8, 0.6, 0.4])
    ap_i = average_precision(rec, pre, eleven_point=False)
    ap_11 = average_precision(rec, pre, eleven_point=True)
    assert 0 < ap_i < 1 and 0 < ap_11 < 1


def test_class_missing_from_gt_is_excluded():
    ev = MAPEvaluator(3)
    ev.add(_rec([[0, 0, 10, 10]], [0.9], [0]), _gt([[0, 0, 10, 10]], [0]))
    aps = ev.ap_per_class(0.5)
    assert aps[0] == 1.0 and np.isnan(aps[1]) and np.isnan(aps[2])
    assert ev.map50() == 1.0  # nanmean ignores classes absent from gt
