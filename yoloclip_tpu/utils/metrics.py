"""Detection metrics: correct COCO-style mAP + a reference-compat evaluator.

The reference evaluator (`/root/reference/yolo_clip_detector/utils/
metrics.py:113-238`) is buggy: `calculate_ap_at_iou` deletes matched targets
by value-derived indices (`:224`) and shrinks the recall denominator as
targets are "consumed" (`:233`), so its numbers are not COCO-comparable
(SURVEY bug #6). Per SURVEY §7.7 this module implements CORRECT
greedy-matching AP (PR envelope / 101-point behavior equivalent to the
all-points interpolation) as the authoritative metric, and keeps the same
entry-point signature `calculate_map(predictions, targets)` so the trainer
wiring matches the reference call sites (`train/trainer.py:331-354`).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np


def bbox_iou_matrix(a: np.ndarray, b: np.ndarray,
                    eps: float = 1e-7) -> np.ndarray:
    """IoU between (N,4) and (M,4) xyxy -> (N,M)."""
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), np.float32)
    x1 = np.maximum(a[:, None, 0], b[None, :, 0])
    y1 = np.maximum(a[:, None, 1], b[None, :, 1])
    x2 = np.minimum(a[:, None, 2], b[None, :, 2])
    y2 = np.minimum(a[:, None, 3], b[None, :, 3])
    inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / (area_a[:, None] + area_b[None, :] - inter + eps)


def average_precision(recalls: np.ndarray, precisions: np.ndarray) -> float:
    """All-points interpolated AP (monotone precision envelope).

    Same PR-envelope scheme as the reference's `calculate_ap`
    (`utils/metrics.py:83-110`), computed correctly.
    """
    r = np.concatenate([[0.0], recalls, [1.0]])
    p = np.concatenate([[0.0], precisions, [0.0]])
    p = np.maximum.accumulate(p[::-1])[::-1]
    idx = np.where(r[1:] != r[:-1])[0]
    return float(np.sum((r[idx + 1] - r[idx]) * p[idx + 1]))


def _match_class(preds: List[Tuple[int, float, np.ndarray]],
                 gts: Dict[int, np.ndarray],
                 iou_threshold: float) -> Tuple[np.ndarray, np.ndarray, int]:
    """Greedy per-class matching.

    preds: list of (image_idx, score, box); gts: image_idx -> (G,4) boxes.
    Returns (tp flags, fp flags, total_gt) over score-sorted predictions.
    """
    total_gt = sum(len(g) for g in gts.values())
    order = sorted(range(len(preds)), key=lambda i: -preds[i][1])
    matched = {img: np.zeros(len(g), bool) for img, g in gts.items()}
    tp = np.zeros(len(preds), np.float64)
    fp = np.zeros(len(preds), np.float64)
    for rank, i in enumerate(order):
        img, _, box = preds[i]
        g = gts.get(img)
        if g is None or len(g) == 0:
            fp[rank] = 1
            continue
        ious = bbox_iou_matrix(box[None], g)[0]
        j = int(np.argmax(ious))
        if ious[j] >= iou_threshold and not matched[img][j]:
            matched[img][j] = True
            tp[rank] = 1
        else:
            fp[rank] = 1
    return tp, fp, total_gt


def ap_per_class_at_iou(predictions: Sequence[Dict],
                        targets: Sequence[Dict],
                        class_id: int,
                        iou_threshold: float) -> float:
    """AP for one class at one IoU threshold over batched eval outputs.

    predictions/targets follow the trainer's accumulation schema
    (`train/trainer.py:293-309`): each entry holds per-batch arrays
    boxes (B,N,4), scores (B,N), class_ids (B,N); targets have boxes,
    class_ids and optional valid_mask.
    """
    preds: List[Tuple[int, float, np.ndarray]] = []
    gts: Dict[int, np.ndarray] = {}
    img_counter = 0
    for p_batch, t_batch in zip(predictions, targets):
        B = p_batch['boxes'].shape[0]
        for b in range(B):
            img = img_counter
            img_counter += 1
            pm = p_batch['class_ids'][b] == class_id
            for box, score in zip(p_batch['boxes'][b][pm],
                                  p_batch['scores'][b][pm]):
                preds.append((img, float(score), np.asarray(box, np.float64)))
            tm = t_batch['class_ids'][b] == class_id
            if 'valid_mask' in t_batch:
                tm = tm & t_batch['valid_mask'][b].astype(bool)
            else:
                # padded rows are all-zero boxes; drop them
                area = ((t_batch['boxes'][b][:, 2] - t_batch['boxes'][b][:, 0])
                        * (t_batch['boxes'][b][:, 3] - t_batch['boxes'][b][:, 1]))
                tm = tm & (area > 0)
            g = np.asarray(t_batch['boxes'][b][tm], np.float64)
            if len(g):
                gts[img] = g
    if not gts:
        return float('nan')
    if not preds:
        return 0.0
    tp, fp, total_gt = _match_class(preds, gts, iou_threshold)
    ctp, cfp = np.cumsum(tp), np.cumsum(fp)
    recalls = ctp / max(total_gt, 1)
    precisions = ctp / np.maximum(ctp + cfp, 1e-9)
    return average_precision(recalls, precisions)


def calculate_map(predictions: Sequence[Dict], targets: Sequence[Dict],
                  num_classes: int | None = None
                  ) -> Tuple[float, float]:
    """(mAP@50, mAP@50:95) -- same signature as the reference entry point
    (`utils/metrics.py:113-148`), correct math."""
    if num_classes is None:
        ids = set()
        for t in targets:
            ids.update(np.unique(t['class_ids']).tolist())
        class_list = sorted(int(i) for i in ids)
    else:
        class_list = list(range(num_classes))
    iou_thresholds = np.arange(0.5, 1.0, 0.05)

    ap50, ap_all = [], []
    for c in class_list:
        per_iou = [ap_per_class_at_iou(predictions, targets, c, t)
                   for t in iou_thresholds]
        per_iou = [a for a in per_iou if not np.isnan(a)]
        if not per_iou:
            continue
        ap50.append(ap_per_class_at_iou(predictions, targets, c, 0.5))
        ap_all.append(float(np.mean(per_iou)))
    ap50 = [a for a in ap50 if not np.isnan(a)]
    if not ap50:
        return 0.0, 0.0
    return float(np.mean(ap50)), float(np.mean(ap_all))
