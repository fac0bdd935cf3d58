"""Box utilities (pure jnp, fixed shapes).

Covers the reference's numpy box helpers:
  * `utils/metrics.py:9-47` bbox_iou (xyxy / xywh modes)
  * `utils/metrics.py:49-81` xywh2xyxy / xyxy2xywh
  * `inference/detector.py:258-287` single-vs-many IoU (eps=1e-7, no
    area clamping)
  * `utils/data_utils.py:73-99` adjust_box_coordinates (letterbox transform)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def xywh2xyxy(boxes: jax.Array) -> jax.Array:
    """(cx, cy, w, h) -> (x1, y1, x2, y2). Ref `utils/metrics.py:49-63`."""
    cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def xyxy2xywh(boxes: jax.Array) -> jax.Array:
    """(x1, y1, x2, y2) -> (cx, cy, w, h). Ref `utils/metrics.py:66-81`."""
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1)


def box_area(boxes: jax.Array) -> jax.Array:
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def pairwise_iou(a: jax.Array, b: jax.Array, eps: float = 1e-7) -> jax.Array:
    """IoU between every box in a (N,4) and b (M,4) -> (N, M).

    Matches the reference inference-NMS IoU (`detector.py:271-287`):
    intersection w/h clamped at 0, union + eps denominator, raw areas.
    """
    a = a[..., :, None, :]   # (N,1,4)
    b = b[..., None, :, :]   # (1,M,4)
    x1 = jnp.maximum(a[..., 0], b[..., 0])
    y1 = jnp.maximum(a[..., 1], b[..., 1])
    x2 = jnp.minimum(a[..., 2], b[..., 2])
    y2 = jnp.minimum(a[..., 3], b[..., 3])
    inter = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)
    area_a = (a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1])
    area_b = (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])
    return inter / (area_a + area_b - inter + eps)


def elementwise_iou(a: jax.Array, b: jax.Array, eps: float = 1e-7
                    ) -> jax.Array:
    """IoU between matched pairs: a, b both (..., 4) -> (...,)."""
    x1 = jnp.maximum(a[..., 0], b[..., 0])
    y1 = jnp.maximum(a[..., 1], b[..., 1])
    x2 = jnp.minimum(a[..., 2], b[..., 2])
    y2 = jnp.minimum(a[..., 3], b[..., 3])
    inter = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)
    union = box_area(a) + box_area(b) - inter
    return inter / (union + eps)


def compute_padding_size(original_hw, target_hw):
    """(top, bottom, left, right) padding for a CENTERED letterbox.

    Ref `utils/data_utils.py:43-71`. Note the reference's actually-used
    pipelines letterbox TOP-LEFT (`coco_dataset.py:122`,
    `detector.py:147-150`); these centered helpers exist in its utils and
    are kept for API completeness.
    """
    oh, ow = original_hw
    th, tw = target_hw
    ratio = min(th / oh, tw / ow)
    nh, nw = int(oh * ratio), int(ow * ratio)
    pt, pl = (th - nh) // 2, (tw - nw) // 2
    return (pt, th - nh - pt, pl, tw - nw - pl)


def adjust_box_coordinates(boxes: jax.Array, padding, scale_factor
                           ) -> jax.Array:
    """Map original-image xyxy boxes into a (possibly centered) letterboxed
    frame: scale then add the pad offsets. Ref `utils/data_utils.py:73-99`.
    """
    pad_top, _, pad_left, _ = padding
    x = boxes * scale_factor
    offset = jnp.asarray([pad_left, pad_top, pad_left, pad_top], x.dtype)
    return x + offset
