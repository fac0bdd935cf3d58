"""Unit tests for the quality-eval analysis helpers (pure numpy, fast):
the float-vs-int8 disagreement localization added for round-4 verdict
task 5 (benchmarks/quality_eval.py::int8_disagreement_breakdown)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    'benchmarks'))

from quality_eval import (_match_masks, int8_disagreement_breakdown)  # noqa: E402


def _pred(boxes, scores, class_ids):
    return {'boxes': np.asarray(boxes, np.float64)[None],
            'scores': np.asarray(scores, np.float64)[None],
            'class_ids': np.asarray(class_ids, np.int64)[None]}


def test_match_masks_identical_and_mismatched():
    a = _pred([[10, 10, 50, 50], [80, 80, 120, 120]], [0.9, 0.4], [0, 1])
    # identical stacks: everything matches
    ha, hb = _match_masks(a, a)
    assert ha.all() and hb.all()

    # same boxes, second one has a DIFFERENT class: only the first matches
    b = _pred([[10, 10, 50, 50], [80, 80, 120, 120]], [0.9, 0.4], [0, 2])
    ha, hb = _match_masks(a, b)
    assert ha.tolist() == [True, False]
    assert hb.tolist() == [True, False]

    # shifted box below the IoU floor: no match
    c = _pred([[100, 10, 140, 50]], [0.9], [0])
    ha, hb = _match_masks(_pred([[10, 10, 50, 50]], [0.9], [0]), c)
    assert not ha.any() and not hb.any()

    # NMS padding rows (class_id -1) are ignored on both sides
    d = _pred([[10, 10, 50, 50], [0, 0, 0, 0]], [0.9, 0.0], [0, -1])
    ha, hb = _match_masks(d, d)
    assert ha.tolist() == [True] and hb.tolist() == [True]


def test_breakdown_localizes_low_score_disagreements():
    S = 160
    # ground truth: two class-0 objects
    targets = [{'boxes': np.array([[10, 10, 50, 50],
                                   [70, 70, 150, 150]], np.float32)[None],
                'class_ids': np.array([0, 0], np.int64)[None],
                'valid_mask': np.ones((1, 2), bool)}]
    # float stack finds both; int8 stack drops the LOW-score small one
    f = [_pred([[10, 10, 50, 50], [70, 70, 150, 150]], [0.27, 0.70], [0, 0])]
    q = [_pred([[70, 70, 150, 150]], [0.70], [0])]
    summary, rows = int8_disagreement_breakdown(f, q, targets, S)

    # the disagreement concentrates in the lowest score band...
    assert summary['disagree_score_0.25'] == 1.0
    assert summary['disagree_score_0.45'] == 0.0
    # ...and in the small-box scale band (40px box / 160px image = 0.25
    # relative size lands in the 0.25-0.40 band; the 80px one in 0.40+)
    assert summary['disagree_rel_size_0.25'] == 1.0
    assert summary['disagree_rel_size_0.40'] == 0.0
    # dropping a true positive costs recall: the disagreeing detection
    # carries real mAP, and the full-vs-matched delta measures it
    assert summary['float_map50_full'] > summary['float_map50_matched_only']
    assert summary['disagree_map50_contribution'] > 0
    assert len(rows) == 12  # 4 score bands + 4 scale bands + 4 IoU-curve
    # agreement-vs-match-IoU curve: monotone non-increasing in the floor
    curve = [summary[f'agreement_iou{t:.2f}'] for t in (0.5, 0.75, 0.9, 0.95)]
    assert all(a >= b for a, b in zip(curve, curve[1:]))
    # identical boxes match at every floor: the one shared detection is
    # found, the dropped one is not -- agreement 0.5 across the curve
    assert curve[0] == 0.5 and curve[-1] == 0.5


def test_breakdown_clean_when_stacks_agree():
    S = 160
    targets = [{'boxes': np.array([[10, 10, 50, 50]], np.float32)[None],
                'class_ids': np.array([0], np.int64)[None],
                'valid_mask': np.ones((1, 1), bool)}]
    p = [_pred([[10, 10, 50, 50]], [0.5], [0])]
    summary, _ = int8_disagreement_breakdown(p, p, targets, S)
    assert summary['disagree_map50_contribution'] == 0.0
    assert summary['float_map50_full'] == summary['float_map50_matched_only']
    assert all(v == 0.0 for k, v in summary.items()
               if k.startswith('disagree_score') or k.startswith('disagree_rel'))
