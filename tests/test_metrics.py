"""Tests for the corrected mAP evaluator (SURVEY bug #6: the reference's
evaluator corrupts its matched-target bookkeeping; this one must behave
like textbook greedy-matching AP)."""

import numpy as np
import pytest

from yoloclip_tpu.utils.metrics import (average_precision, bbox_iou_matrix,
                                        calculate_map)


def make_batch(pred_boxes, pred_scores, pred_cls, gt_boxes, gt_cls):
    preds = [{'boxes': np.asarray([pred_boxes], np.float32),
              'scores': np.asarray([pred_scores], np.float32),
              'class_ids': np.asarray([pred_cls])}]
    targets = [{'boxes': np.asarray([gt_boxes], np.float32),
                'class_ids': np.asarray([gt_cls]),
                'valid_mask': np.ones((1, len(gt_cls)), bool)}]
    return preds, targets


def test_perfect_predictions_ap1():
    boxes = [[0, 0, 10, 10], [20, 20, 40, 40], [50, 50, 80, 90]]
    cls = [0, 1, 2]
    preds, targets = make_batch(boxes, [0.9, 0.8, 0.7], cls, boxes, cls)
    m50, m5095 = calculate_map(preds, targets)
    assert m50 == pytest.approx(1.0)
    assert m5095 == pytest.approx(1.0)


def test_all_wrong_predictions_ap0():
    gt = [[0, 0, 10, 10]]
    pred = [[500, 500, 600, 600]]
    preds, targets = make_batch(pred, [0.9], [0], gt, [0])
    m50, m5095 = calculate_map(preds, targets)
    assert m50 == 0.0 and m5095 == 0.0


def test_duplicate_detections_penalized():
    """Second detection of an already-matched GT counts as FP."""
    gt = [[0, 0, 10, 10]]
    pred = [[0, 0, 10, 10], [0.5, 0.5, 10, 10]]
    preds, targets = make_batch(pred, [0.9, 0.8], [0, 0], gt, [0])
    m50, _ = calculate_map(preds, targets)
    # AP: recall reaches 1.0 at precision 1.0 (first det), envelope keeps it
    assert m50 == pytest.approx(1.0)
    # reversed score order: the duplicate comes first -> precision at
    # recall 1 is 1/2... (first is also a match since greedy picks best IoU)
    preds2, targets2 = make_batch(pred, [0.8, 0.9], [0, 0], gt, [0])
    m50b, _ = calculate_map(preds2, targets2)
    assert 0.0 < m50b <= 1.0


def test_half_recall():
    gt = [[0, 0, 10, 10], [100, 100, 120, 120]]
    pred = [[0, 0, 10, 10]]
    preds, targets = make_batch(pred, [0.9], [0], gt, [0, 0])
    m50, _ = calculate_map(preds, targets)
    assert m50 == pytest.approx(0.5)


def test_localization_quality_affects_5095():
    gt = [[0, 0, 100, 100]]
    pred = [[0, 0, 100, 90]]   # IoU = 0.9
    preds, targets = make_batch(pred, [0.9], [0], gt, [0])
    m50, m5095 = calculate_map(preds, targets)
    assert m50 == pytest.approx(1.0)
    # matches at IoU .5 .. .9 (5095 averages 10 thresholds; .9 inclusive
    # depends on float grid) -> strictly between 0 and 1
    assert 0.4 < m5095 < 1.0


def test_average_precision_envelope():
    r = np.array([0.5, 1.0])
    p = np.array([1.0, 0.5])
    assert average_precision(r, p) == pytest.approx(0.75)


def test_iou_matrix_empty():
    assert bbox_iou_matrix(np.zeros((0, 4)), np.zeros((3, 4))).shape == (0, 3)
