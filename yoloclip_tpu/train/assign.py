"""Anchor-target assignment (clean mode).

The reference performs NO assignment: it truncates 8400 predictions to the
first `max_objects` anchors and pairs them index-wise with padded GT
(SURVEY bug #4, kept behind `assigner='compat'`). This module is the clean
alternative (`assigner='topk_center'`): a simple, fully-vectorized
TAL-flavored scheme --

  for each GT, the top-k anchors by center distance whose anchor point lies
  inside the GT box become positives; an anchor claimed by several GTs goes
  to the nearest one. Everything is fixed-shape: masks, argmins, one top_k.

Outputs feed the clean combined loss: per-anchor class targets, box
targets, DFL bin targets (the inverse of the reference's exp-wh decode so
decode(target) == gt), and a foreground mask.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp


def anchor_points(strides: Sequence[int],
                  image_size: Tuple[int, int]) -> Tuple[jax.Array, jax.Array]:
    """(A, 2) anchor points (grid*stride, the decode origin) and (A,) strides,
    level-major row-major -- same order as decode_boxes."""
    pts, sts = [], []
    H, W = image_size
    for s in strides:
        h, w = H // s, W // s
        gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                              jnp.arange(w, dtype=jnp.float32), indexing='ij')
        pts.append(jnp.stack([gx.reshape(-1), gy.reshape(-1)], -1) * s)
        sts.append(jnp.full((h * w,), s, jnp.float32))
    return jnp.concatenate(pts), jnp.concatenate(sts)


def assign_topk_center(anchors: jax.Array, gt_boxes: jax.Array,
                       gt_cls: jax.Array, gt_valid: jax.Array,
                       topk: int = 10) -> Dict[str, jax.Array]:
    """Single-image assignment.

    anchors (A, 2); gt_boxes (M, 4) xyxy; gt_cls (M,); gt_valid (M,) bool.
    Returns fg_mask (A,), cls_target (A,), box_target (A, 4),
    gt_index (A,).
    """
    A = anchors.shape[0]
    M = gt_boxes.shape[0]
    cx = (gt_boxes[:, 0] + gt_boxes[:, 2]) / 2
    cy = (gt_boxes[:, 1] + gt_boxes[:, 3]) / 2
    centers = jnp.stack([cx, cy], -1)                       # (M, 2)

    d = jnp.linalg.norm(anchors[:, None, :] - centers[None], axis=-1)  # (A,M)
    inside = ((anchors[:, 0:1] >= gt_boxes[None, :, 0])
              & (anchors[:, 0:1] <= gt_boxes[None, :, 2])
              & (anchors[:, 1:2] >= gt_boxes[None, :, 1])
              & (anchors[:, 1:2] <= gt_boxes[None, :, 3]))  # (A, M)
    eligible = inside & gt_valid[None, :]

    BIG = jnp.float32(1e9)
    d_masked = jnp.where(eligible, d, BIG)
    # top-k nearest anchors per GT: mark anchors whose distance is within
    # the k-th smallest for that GT
    k = min(topk, A)
    kth = -jax.lax.top_k(-(d_masked.T), k)[0][:, -1]         # (M,)
    is_topk = (d_masked <= kth[None, :]) & eligible          # (A, M)

    # resolve multi-GT anchors to the nearest GT
    d_pos = jnp.where(is_topk, d_masked, BIG)
    gt_index = jnp.argmin(d_pos, axis=1)                     # (A,)
    fg = jnp.min(d_pos, axis=1) < BIG / 2

    cls_target = jnp.where(fg, gt_cls[gt_index], -1)
    box_target = jnp.where(fg[:, None], gt_boxes[gt_index], 0.0)
    return {'fg_mask': fg, 'cls_target': cls_target,
            'box_target': box_target, 'gt_index': gt_index}


def assign_batch(anchors: jax.Array, gt_boxes: jax.Array, gt_cls: jax.Array,
                 gt_valid: jax.Array, topk: int = 10) -> Dict[str, jax.Array]:
    fn = lambda b, c, v: assign_topk_center(anchors, b, c, v, topk)
    return jax.vmap(fn)(gt_boxes, gt_cls, gt_valid)


def dfl_targets_from_boxes(box_target: jax.Array, anchors: jax.Array,
                           anchor_strides: jax.Array,
                           reg_max: int = 16) -> jax.Array:
    """Invert the reference decode (xy=(grid+off)*stride, wh=exp(v)*stride,
    `box_head.py:179-214`) to per-coordinate continuous bin targets (A, 4),
    clipped to [0, reg_max]."""
    cx = (box_target[..., 0] + box_target[..., 2]) / 2
    cy = (box_target[..., 1] + box_target[..., 3]) / 2
    w = jnp.clip(box_target[..., 2] - box_target[..., 0], 1e-3, None)
    h = jnp.clip(box_target[..., 3] - box_target[..., 1], 1e-3, None)
    s = anchor_strides
    off_x = cx / s - anchors[..., 0] / s
    off_y = cy / s - anchors[..., 1] / s
    v_w = jnp.log(w / s)
    v_h = jnp.log(h / s)
    t = jnp.stack([off_x, off_y, v_w, v_h], axis=-1)
    return jnp.clip(t, 0.0, float(reg_max))
