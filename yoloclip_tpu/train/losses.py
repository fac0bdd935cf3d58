"""Training losses (pure jnp functions, fixed shapes, jit/grad-safe).

Behavioral contracts (each documented per function):
  * region_text_contrastive_loss --
    `/root/reference/yolo_clip_detector/loss/region_text_contrastive.py:10-165`
  * iou_loss -- `loss/iou_loss.py:11-200` (iou/giou/diou/ciou family)
  * distributed_focal_loss -- `loss/dfl_loss.py:10-136` (the real DFL module,
    which the reference trainer never wires up -- SURVEY bug #10/#5)
  * combined train-step loss -- `train/trainer.py:142-194`, including the
    compat quirk that only the first `max_objects` anchors participate
    (truncation instead of label assignment, SURVEY bug #4), reproduced
    behind `assigner='compat'`; `assigner='topk_center'` provides a clean
    center-distance assigner built fresh for this framework.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax


def _l2norm(x: jax.Array, eps: float = 1e-12) -> jax.Array:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


def region_text_contrastive_loss(
        region_features: jax.Array,        # (B, R, E)
        text_embeddings: jax.Array,        # (B, C, E)
        region_labels: jax.Array,          # (B, M) int or (B, M, C) one-hot
        valid_mask: Optional[jax.Array] = None,   # (B, M) bool
        temperature: float = 0.1,
        topk: int = 3,
        label_smoothing: float = 0.0,
        reduction: str = 'mean') -> jax.Array:
    """Region-text contrastive loss, reference-exact.

    Quirks reproduced deliberately (ref lines cited):
      * Regions are truncated/zero-padded to M = region_labels.shape[1]
        (`:66-82`) -- with M=100 only the first 100 of 8400 anchors train.
      * Labels >= C are zeroed and masked out (`:99-110`).
      * top-k positive weighting: pos_weight = sum of top-k of
        (similarity * labels) / floor(min positive count) (`:126-141`;
        the reference converts that min to a Python int -- floor here).
      * 'mean' divides by the EXPANDED mask sum (= n_valid * C), not the
        region count (`:147-159`).
    """
    B, R, E = region_features.shape
    C = text_embeddings.shape[1]
    M = region_labels.shape[1]

    if R >= M:
        region = region_features[:, :M, :]
    else:
        pad = jnp.zeros((B, M - R, E), region_features.dtype)
        region = jnp.concatenate([region_features, pad], axis=1)
        if valid_mask is not None:
            valid_mask = jnp.concatenate(
                [valid_mask, jnp.zeros((B, M - R), bool)], axis=1)

    region = _l2norm(region.astype(jnp.float32))
    text = _l2norm(text_embeddings.astype(jnp.float32))
    similarity = jnp.einsum('bme,bce->bmc', region, text,
                            preferred_element_type=jnp.float32)
    logits = similarity / temperature

    if region_labels.ndim == 2:
        invalid = region_labels >= C
        labels_idx = jnp.where(invalid, 0, region_labels)
        if valid_mask is None:
            valid_mask = ~invalid
        else:
            valid_mask = valid_mask & ~invalid
        labels_oh = jax.nn.one_hot(labels_idx, C, dtype=jnp.float32)
    else:
        labels_oh = region_labels.astype(jnp.float32)

    if label_smoothing > 0:
        labels_oh = ((1 - label_smoothing) * labels_oh
                     + label_smoothing / C)

    if valid_mask is None:
        valid_mask = jnp.ones((B, M), bool)

    if topk > 1:
        pos_sim = similarity * labels_oh
        k = min(topk, C)
        topk_vals, _ = jax.lax.top_k(pos_sim, k)
        pos_count_min = jnp.clip(jnp.min(jnp.sum(labels_oh, axis=-1)),
                                 1, None)
        topk_min = jnp.minimum(jnp.float32(topk),
                               jnp.floor(pos_count_min))
        pos_weight = jnp.sum(topk_vals, axis=-1, keepdims=True) / topk_min
        weighted_labels = labels_oh * pos_weight
    else:
        weighted_labels = labels_oh

    log_probs = jax.nn.log_softmax(logits, axis=-1)
    loss = -(weighted_labels * log_probs)                  # (B, M, C)
    mask3 = jnp.broadcast_to(valid_mask[..., None], loss.shape)
    loss = loss * mask3
    pos_count = jnp.clip(jnp.sum(labels_oh, axis=-1), 1, None)
    loss = jnp.sum(loss, axis=-1) / pos_count              # (B, M)

    if reduction == 'mean':
        denom = jnp.sum(mask3.astype(jnp.float32))
        return jnp.where(denom > 0, jnp.sum(loss) / denom, 0.0)
    if reduction == 'sum':
        return jnp.sum(loss)
    return loss


def iou_family(pred: jax.Array, target: jax.Array, iou_type: str = 'ciou',
               eps: float = 1e-7) -> Tuple[jax.Array, jax.Array]:
    """(iou, loss) per box pair; pred/target (..., 4) xyxy.

    Ref `loss/iou_loss.py:99-200`: areas unclamped, intersection w/h clamped
    at 0, CIoU's alpha computed WITHOUT detaching (kept for parity).
    """
    px1, py1, px2, py2 = [pred[..., i] for i in range(4)]
    tx1, ty1, tx2, ty2 = [target[..., i] for i in range(4)]
    p_area = (px2 - px1) * (py2 - py1)
    t_area = (tx2 - tx1) * (ty2 - ty1)
    iw = jnp.clip(jnp.minimum(px2, tx2) - jnp.maximum(px1, tx1), 0, None)
    ih = jnp.clip(jnp.minimum(py2, ty2) - jnp.maximum(py1, ty1), 0, None)
    inter = iw * ih
    union = p_area + t_area - inter
    iou = inter / (union + eps)
    if iou_type == 'iou':
        return iou, 1 - iou

    ex1 = jnp.minimum(px1, tx1)
    ey1 = jnp.minimum(py1, ty1)
    ex2 = jnp.maximum(px2, tx2)
    ey2 = jnp.maximum(py2, ty2)
    if iou_type == 'giou':
        enclose = (ex2 - ex1) * (ey2 - ey1)
        giou = iou - (enclose - union) / (enclose + eps)
        return iou, 1 - giou

    center_d2 = (((px1 + px2) - (tx1 + tx2)) ** 2
                 + ((py1 + py2) - (ty1 + ty2)) ** 2) / 4
    diag2 = (ex2 - ex1) ** 2 + (ey2 - ey1) ** 2
    if iou_type == 'diou':
        diou = iou - center_d2 / (diag2 + eps)
        return iou, 1 - diou

    if iou_type == 'ciou':
        pw, ph = px2 - px1, py2 - py1
        tw, th = tx2 - tx1, ty2 - ty1
        v = (4 / jnp.pi ** 2) * (jnp.arctan(pw / (ph + eps))
                                 - jnp.arctan(tw / (th + eps))) ** 2
        alpha = v / (1 - iou + v + eps)
        ciou = iou - (center_d2 / (diag2 + eps) + alpha * v)
        return iou, 1 - ciou
    raise ValueError(f'Unknown iou_type: {iou_type}')


def iou_loss(pred_boxes: jax.Array, target_boxes: jax.Array,
             weights: Optional[jax.Array] = None, iou_type: str = 'ciou',
             reduction: str = 'mean', eps: float = 1e-7) -> jax.Array:
    """Ref `loss/iou_loss.py:44-97`: optional elementwise weights, then
    mean over ALL entries (invalid rows count in the denominator).

    Weight shape fixups reproduce ref `:63-89` exactly: a 2-D weight
    against a 3-D loss is truncated / zero-padded along axis 1 and then
    unsqueezed; a weight whose axis-1 width STILL mismatches the loss is
    silently IGNORED (the reference logs a warning and proceeds
    unweighted). Shapes are static under jit, so this is plain Python
    control flow at trace time."""
    _, loss = iou_family(pred_boxes.astype(jnp.float32),
                         target_boxes.astype(jnp.float32), iou_type, eps)
    if weights is not None:
        w = weights.astype(loss.dtype)
        if loss.ndim == 3 and w.ndim == 2:
            if w.shape[1] > loss.shape[1]:
                w = w[:, :loss.shape[1]]
            elif w.shape[1] < loss.shape[1]:
                w = jnp.concatenate(
                    [w, jnp.zeros((w.shape[0], loss.shape[1] - w.shape[1]),
                                  w.dtype)], axis=1)
            w = w[..., None]
        if w.ndim >= 2 and loss.ndim >= 2 and w.shape[1] != loss.shape[1]:
            pass        # ref :86-87: mismatched weights are dropped
        else:
            loss = loss * w
    if reduction == 'mean':
        return jnp.mean(loss)
    if reduction == 'sum':
        return jnp.sum(loss)
    return loss


def distributed_focal_loss(pred_dfl: jax.Array, target_bins: jax.Array,
                           weights: Optional[jax.Array] = None,
                           reg_max: int = 16,
                           reduction: str = 'mean') -> jax.Array:
    """Cross-entropy between predicted bin logits and integer bin targets.

    Ref `loss/dfl_loss.py:43-83`. pred_dfl: (..., reg_max+1) logits;
    target_bins: (...,) integers clipped to [0, reg_max].
    """
    target = jnp.clip(target_bins.astype(jnp.int32), 0, reg_max)
    logp = jax.nn.log_softmax(pred_dfl.astype(jnp.float32), axis=-1)
    loss = -jnp.take_along_axis(logp, target[..., None], axis=-1)[..., 0]
    if weights is not None:
        loss = loss * weights.astype(loss.dtype)
    if reduction == 'mean':
        return jnp.mean(loss)
    if reduction == 'sum':
        return jnp.sum(loss)
    return loss


def dfl_soft_targets(distances: jax.Array, reg_max: int = 16) -> jax.Array:
    """Continuous distance -> two-bin soft DFL target distribution.

    Clean-mode helper (no reference equivalent; the reference's DFL term is
    permanently 0, `train/trainer.py:177-187`).
    """
    d = jnp.clip(distances, 0, reg_max - 1e-3)
    lo = jnp.floor(d)
    hi = lo + 1
    w_hi = d - lo
    oh_lo = jax.nn.one_hot(lo.astype(jnp.int32), reg_max + 1)
    oh_hi = jax.nn.one_hot(hi.astype(jnp.int32), reg_max + 1)
    return oh_lo * (1 - w_hi[..., None]) + oh_hi * w_hi[..., None]


def soft_dfl_loss(pred_logits: jax.Array, target_cont: jax.Array,
                  mask: jax.Array, reg_max: int = 16) -> jax.Array:
    """Cross-entropy between per-coordinate bin logits and two-bin soft
    targets, masked mean over foreground anchors.

    pred_logits: (..., 4, reg_max+1); target_cont: (..., 4) continuous bins;
    mask: (...,) bool foreground.
    """
    tgt = dfl_soft_targets(target_cont, reg_max)             # (...,4,nb)
    logp = jax.nn.log_softmax(pred_logits.astype(jnp.float32), axis=-1)
    ce = -jnp.sum(tgt * logp, axis=-1)                       # (..., 4)
    ce = jnp.mean(ce, axis=-1)                               # (...,)
    m = mask.astype(jnp.float32)
    return jnp.sum(ce * m) / jnp.maximum(jnp.sum(m), 1.0)


def region_text_bce_loss(region_features: jax.Array,      # (B, A, E)
                         text_embeddings: jax.Array,      # (B, C, E)
                         labels: jax.Array,               # (B, A) int
                         fg_mask: jax.Array,              # (B, A) bool
                         temperature: float = 0.1,
                         score_bias: float = 0.25) -> jax.Array:
    """Per-class sigmoid BCE over ALL anchors (YOLO-World-style training).

    The softmax-CE formulation (reference math) only shapes RELATIVE class
    similarities of labeled anchors -- nothing pushes background anchors'
    scores down, so a trained model fires on arbitrary background (the
    reference has exactly this pathology, SURVEY bug #4). Here every
    anchor gets a target: one-hot(class) for assigned anchors, all-zero
    for background, with logits centered on `score_bias` -- the inference
    confidence threshold on the raw-cosine scale (0.25) -- so foreground
    is pushed above the deploy threshold and background below it.
    Normalized by num_fg (YOLOv8 cls-loss convention).
    """
    region = _l2norm(region_features.astype(jnp.float32))
    text = _l2norm(text_embeddings.astype(jnp.float32))
    sim = jnp.einsum('bae,bce->bac', region, text,
                     preferred_element_type=jnp.float32)
    logits = (sim - score_bias) / temperature
    C = text.shape[1]
    tgt = (jax.nn.one_hot(labels, C, dtype=jnp.float32)
           * fg_mask[..., None].astype(jnp.float32))
    per = optax.sigmoid_binary_cross_entropy(logits, tgt)   # (B, A, C)
    return jnp.sum(per) / jnp.maximum(jnp.sum(fg_mask), 1.0)


def combined_loss_clean(outputs: Dict[str, jax.Array],
                        batch: Dict[str, jax.Array],
                        loss_weights: Dict[str, float],
                        anchors: jax.Array,
                        anchor_strides: jax.Array,
                        temperature: float = 0.1,
                        iou_type: str = 'ciou',
                        label_smoothing: float = 0.0,
                        topk_assign: int = 10,
                        reg_max: int = 16,
                        contrastive_type: str = 'bce'
                        ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Clean training objective with real target assignment.

    No reference equivalent (the reference trains on an arbitrary anchor
    subset, SURVEY bug #4). All 8400 anchors participate: topk-center
    assignment -> contrastive over anchors, CIoU over assigned boxes
    (foreground-normalized), REAL DFL on inverted decode targets.

    contrastive_type: 'bce' (default; fg pulled above / bg pushed below
    the 0.25 deploy threshold -- see region_text_bce_loss) or 'softmax'
    (reference-style CE over labeled anchors only; no bg suppression).
    """
    from yoloclip_tpu.train.assign import (assign_batch,
                                           dfl_targets_from_boxes)

    assigned = assign_batch(anchors, batch['boxes'], batch['class_ids'],
                            batch['valid_mask'], topk=topk_assign)
    fg = assigned['fg_mask']                                 # (B, A)
    labels = jnp.where(fg, assigned['cls_target'], 0)

    if contrastive_type == 'bce':
        cont = region_text_bce_loss(
            outputs['obj_embeddings'], outputs['text_embeddings'],
            labels, fg, temperature=temperature)
    elif contrastive_type == 'softmax':
        cont = region_text_contrastive_loss(
            outputs['obj_embeddings'], outputs['text_embeddings'],
            labels, fg, temperature=temperature, topk=1,
            label_smoothing=label_smoothing)
    else:
        raise ValueError(
            f"contrastive_type must be 'bce' or 'softmax', "
            f"got {contrastive_type!r}")

    _, iou_l = iou_family(outputs['boxes'].astype(jnp.float32),
                          assigned['box_target'].astype(jnp.float32),
                          iou_type)
    m = fg.astype(jnp.float32)
    iou = jnp.sum(iou_l * m) / jnp.maximum(jnp.sum(m), 1.0)

    # raw per-level maps -> (B, A, 4, nbins), level-major like decode
    B = fg.shape[0]
    flat = [p.reshape(B, -1, 4, reg_max + 1) for p in outputs['box_preds']]
    pred_dist = jnp.concatenate(flat, axis=1)
    tgt = dfl_targets_from_boxes(assigned['box_target'], anchors[None],
                                 anchor_strides[None], reg_max)
    dfl = soft_dfl_loss(pred_dist, tgt, fg, reg_max)

    total = (loss_weights['contrastive'] * cont
             + loss_weights['iou'] * iou
             + loss_weights['dfl'] * dfl)
    return total, {'loss': total, 'contrastive_loss': cont,
                   'iou_loss': iou, 'dfl_loss': dfl,
                   'num_fg': jnp.sum(m)}


def combined_loss_compat(outputs: Dict[str, jax.Array],
                         batch: Dict[str, jax.Array],
                         loss_weights: Dict[str, float],
                         temperature: float = 0.1,
                         iou_type: str = 'ciou',
                         label_smoothing: float = 0.0,
                         topk: int = 3) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Reference-exact training objective (`train/trainer.py:142-194`).

    contrastive over the first max_objects anchors + CIoU over the first
    max_objects predicted boxes vs padded GT (weights = valid_mask, mean
    over all B*M entries) + dfl term fixed at 0 (the reference's dataset
    never emits box_targets, `trainer.py:177-187`).
    """
    cont = region_text_contrastive_loss(
        outputs['obj_embeddings'], outputs['text_embeddings'],
        batch['class_ids'], batch.get('valid_mask'),
        temperature=temperature, topk=topk,
        label_smoothing=label_smoothing)
    M = batch['boxes'].shape[1]
    pred_boxes = outputs['boxes'][:, :M, :]
    iou = iou_loss(pred_boxes, batch['boxes'], batch.get('valid_mask'),
                   iou_type=iou_type)
    dfl = jnp.float32(0.0)
    total = (loss_weights['contrastive'] * cont
             + loss_weights['iou'] * iou
             + loss_weights['dfl'] * dfl)
    return total, {'loss': total, 'contrastive_loss': cont,
                   'iou_loss': iou, 'dfl_loss': dfl}
