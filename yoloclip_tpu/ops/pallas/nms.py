"""Pallas TPU kernel: greedy-NMS keep mask via in-VMEM fixpoint sweeps.

The XLA NMS path (`ops/nms.py`) materializes a (B, K, K) fp32 IoU matrix
in HBM (537 MB at B=128, K=1024) and re-reads the overlap matrix from HBM
on every fixpoint sweep -- NMS is ~30% of the bs=128 pipeline. This
kernel keeps everything on-chip: per batch element it

  1. builds the (K, K) upper-triangular overlap matrix in row tiles,
     storing it once as bf16 0/1 in VMEM scratch (2 MB at K=1024);
  2. runs the greedy fixed-point (`ops/nms.py::_fixpoint_keep` semantics:
     keep[j] <- valid[j] & no higher-ranked kept i overlaps j) where each
     sweep is ONE (1, K) x (K, K) MXU matvec with fp32 accumulation --
     exact overlap counts, so `count > 0` reproduces the boolean `any`.

Same greedy result as the reference's numpy loop
(`/root/reference/yolo_clip_detector/inference/detector.py:225-256`);
tests assert equality against both XLA variants.

Candidates must arrive score-sorted descending (they do: `lax.top_k`
upstream). Boxes enter in two layouts -- (4, K) for the column
(suppressed) side and (K, 4) for the row (suppressor) side -- so neither
side needs an in-kernel relayout.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_TILE = 256


def _kernel(thresh_ref, boxes_c_ref, boxes_r_ref, valid_ref,
            keep_ref, over):
    """boxes_c_ref (1, 4, K) f32; boxes_r_ref (1, K, 4) f32;
    valid_ref (1, 1, K) f32 0/1; keep_ref (1, 1, K) f32;
    over: (K, K) bf16 VMEM scratch."""
    K = boxes_c_ref.shape[2]
    thresh = thresh_ref[0]

    x1 = boxes_c_ref[0, 0:1, :]          # (1, K) column (suppressed) side
    y1 = boxes_c_ref[0, 1:2, :]
    x2 = boxes_c_ref[0, 2:3, :]
    y2 = boxes_c_ref[0, 3:4, :]
    area = (x2 - x1) * (y2 - y1)         # (1, K)

    for ti in range(K // ROW_TILE):
        s = ti * ROW_TILE
        # row (suppressor) side as (T, 1) columns
        rx1 = boxes_r_ref[0, s:s + ROW_TILE, 0:1]
        ry1 = boxes_r_ref[0, s:s + ROW_TILE, 1:2]
        rx2 = boxes_r_ref[0, s:s + ROW_TILE, 2:3]
        ry2 = boxes_r_ref[0, s:s + ROW_TILE, 3:4]
        rarea = (rx2 - rx1) * (ry2 - ry1)

        iw = jnp.maximum(jnp.minimum(rx2, x2) - jnp.maximum(rx1, x1), 0.0)
        ih = jnp.maximum(jnp.minimum(ry2, y2) - jnp.maximum(ry1, y1), 0.0)
        inter = iw * ih                                  # (T, K)
        union = rarea + area - inter
        iou = jnp.where(union > 0.0, inter / union, 0.0)

        rows = jax.lax.broadcasted_iota(jnp.int32, (ROW_TILE, K), 0) + s
        cols = jax.lax.broadcasted_iota(jnp.int32, (ROW_TILE, K), 1)
        over[s:s + ROW_TILE, :] = jnp.where(
            (iou > thresh) & (cols > rows), 1.0, 0.0).astype(jnp.bfloat16)

    valid = valid_ref[0]                  # (1, K) f32

    def cond(carry):
        _, changed = carry
        return changed

    def body(carry):
        keep, _ = carry
        # suppressed[j] = sum_i keep[i] * over[i, j]  (fp32-exact counts)
        supp = jax.lax.dot_general(
            keep.astype(jnp.bfloat16), over[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (1, K)
        new_keep = jnp.where(supp > 0.0, 0.0, valid)
        changed = jnp.any(new_keep != keep)
        return new_keep, changed

    keep, _ = jax.lax.while_loop(cond, body, (valid, jnp.bool_(True)))
    keep_ref[0] = keep


def _pad_axis(x: jax.Array, size: int, axis: int) -> jax.Array:
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=('interpret',))
def nms_keep_pallas(boxes: jax.Array, valid: jax.Array,
                    iou_threshold, interpret: Optional[bool] = None
                    ) -> jax.Array:
    """boxes (B, K, 4) xyxy score-sorted desc, valid (B, K) bool ->
    keep (B, K) bool, identical to the greedy/fixpoint XLA paths.

    interpret: None = auto (interpreter off-TPU).
    """
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    B, K, _ = boxes.shape
    Kp = -(-K // ROW_TILE) * ROW_TILE
    boxes_r = _pad_axis(boxes.astype(jnp.float32), Kp, 1)    # (B, Kp, 4)
    boxes_c = jnp.swapaxes(boxes_r, 1, 2)                    # (B, 4, Kp)
    valid_f = _pad_axis(valid.astype(jnp.float32)[:, None, :], Kp, 2)
    thresh = jnp.asarray([iou_threshold], jnp.float32)

    keep = pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, 4, Kp), lambda b, t: (b, 0, 0)),
                pl.BlockSpec((1, Kp, 4), lambda b, t: (b, 0, 0)),
                pl.BlockSpec((1, 1, Kp), lambda b, t: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, Kp), lambda b, t: (b, 0, 0)),
            scratch_shapes=[pltpu.VMEM((Kp, Kp), jnp.bfloat16)],
        ),
        out_shape=jax.ShapeDtypeStruct((B, 1, Kp), jnp.float32),
        interpret=interpret,
    )(thresh, boxes_c, boxes_r, valid_f)
    return keep[:, 0, :K] > 0.5
