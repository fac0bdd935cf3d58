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


# ---------------------------------------------------------------------
# reference-compat evaluator (round-2 verdict missing #4)
# ---------------------------------------------------------------------
def _flat(preds, targets):
    """Batch-schema -> the reference evaluator's flat per-entry arrays."""
    fp = [{k: np.asarray(p[k])[0] for k in ('boxes', 'scores', 'class_ids')}
          for p in preds]
    ft = [{k: np.asarray(t[k])[0] for k in ('boxes', 'class_ids')}
          for t in targets]
    return fp, ft


def test_reference_evaluator_crashes_on_match():
    """Documents WHY compat mode cannot be bit-identical: the reference's
    own `calculate_ap_at_iou` passes a float box row to np.delete as an
    index array and raises IndexError on ANY true positive."""
    from yoloclip_tpu.utils import refbridge
    if not refbridge.reference_available():
        pytest.skip('reference package not present')
    refbridge.install_stubs()
    import sys
    if refbridge.REF_ROOT not in sys.path:
        sys.path.insert(0, refbridge.REF_ROOT)
    from yolo_clip_detector.utils.metrics import calculate_ap_at_iou

    preds, targets = make_batch([[10, 10, 50, 50]], [0.9], [0],
                                [[12, 11, 52, 49]], [0])
    fp, ft = _flat(preds, targets)
    with pytest.raises(IndexError):
        calculate_ap_at_iou(fp, ft, 0, 0.5)


def test_compat_matches_reference_on_no_match_path():
    """On the path the reference CAN execute (zero true positives) the
    compat evaluator must agree with reference code exactly."""
    from yoloclip_tpu.utils import refbridge
    from yoloclip_tpu.utils.metrics import _compat_ap_at_iou
    if not refbridge.reference_available():
        pytest.skip('reference package not present')
    refbridge.install_stubs()
    import sys
    if refbridge.REF_ROOT not in sys.path:
        sys.path.insert(0, refbridge.REF_ROOT)
    from yolo_clip_detector.utils.metrics import calculate_ap_at_iou

    preds, targets = make_batch(
        [[500, 500, 600, 600], [5, 5, 9, 9]], [0.9, 0.4], [0, 0],
        [[0, 0, 100, 100]], [0])
    fp, ft = _flat(preds, targets)
    want = float(calculate_ap_at_iou(fp, ft, 0, 0.5))
    got = _compat_ap_at_iou(fp, ft, 0, 0.5)
    assert got == pytest.approx(want)


def test_compat_recall_denominator_shrinks():
    """The kept quirk (:233): recall divides by the REMAINING target
    count, so fully-consumed targets leave denominator max(0,1)=1 and the
    perfect-match case reports recall = #TP (not 1) -- with 2 matched
    targets, AP (area under the recall axis out to 2.0) exceeds 1."""
    from yoloclip_tpu.utils.metrics import calculate_map_compat
    boxes = [[0, 0, 10, 10], [100, 100, 150, 150]]
    preds, targets = make_batch(boxes, [0.9, 0.8], [0, 0], boxes, [0, 0])
    fp, ft = _flat(preds, targets)
    m50, _ = calculate_map_compat(fp, ft)
    assert m50 == pytest.approx(2.0)   # the bug, faithfully reproduced
    # the correct evaluator says 1.0 on the same input
    assert calculate_map(preds, targets)[0] == pytest.approx(1.0)


def test_compat_cross_image_batch_matching():
    """The kept quirk (:208): target pools are per accumulated BATCH
    entry, so a prediction in image A may consume image B's target when
    both land in the same batch."""
    from yoloclip_tpu.utils.metrics import _compat_ap_at_iou
    # one batch entry holding two images' worth of flattened data:
    # prediction box matches image-2's GT exactly
    fp = [{'boxes': np.array([[0., 0., 10., 10.]]),
           'scores': np.array([0.9]), 'class_ids': np.array([0])}]
    ft = [{'boxes': np.array([[0., 0., 10., 10.]]),   # "other image" GT
           'class_ids': np.array([0])}]
    ap = _compat_ap_at_iou(fp, ft, 0, 0.5)
    assert ap > 0.9   # matched, even though the GT belongs to another image


def test_detections_to_coco_results_roundtrip(tmp_path):
    """detect()-schema list -> standard COCO results entries (xywh bbox,
    optional sparse category-id remap) -> JSON file round trip."""
    import json

    from yoloclip_tpu.utils.metrics import (detections_to_coco_results,
                                            save_coco_results)
    dets = [
        {'box': (10, 20, 50, 80), 'score': 0.9, 'class_id': 0,
         'class_name': 'cat'},
        {'box': (0, 0, 5, 5), 'score': 0.4, 'class_id': 2,
         'class_name': 'bird'},
    ]
    rows = detections_to_coco_results(dets, image_id=42,
                                      category_ids={0: 1, 2: 17})
    assert rows == [
        {'image_id': 42, 'category_id': 1, 'bbox': [10.0, 20.0, 40.0, 60.0],
         'score': 0.9},
        {'image_id': 42, 'category_id': 17, 'bbox': [0.0, 0.0, 5.0, 5.0],
         'score': 0.4},
    ]
    # identity category map when omitted
    assert detections_to_coco_results(dets, 0)[1]['category_id'] == 2

    path = str(tmp_path / 'results.json')
    save_coco_results(path, rows)
    with open(path) as f:
        assert json.load(f) == rows
