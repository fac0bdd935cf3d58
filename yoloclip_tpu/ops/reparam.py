"""Deploy-time re-parameterization: fold a fixed vocabulary into the graph.

The reference stubs this out (`/root/reference/yolo_clip_detector/model/
repvl_pan.py:302-315` just logs a warning; SURVEY bug #8). The YOLO-World
deploy recipe it was meant to implement: with an offline vocabulary the
text side is constant, so (a) the per-image image->text update (I-Pooling
attention) is dropped, and (b) every text projection (the T-CSP max-sigmoid
path and the similarity head) collapses into fixed weights.

On TPU/XLA, re-parameterization IS constant folding: close the vocabulary
matrix over the jit boundary and mark the I-Pool update off, and the
compiler folds `text @ W_proj^T + b` into a constant for every
TextGuidedCSPLayer, embeds the normalized vocabulary into the similarity
matmul, and dead-code-eliminates the whole CLIP/I-Pool subgraph. No manual
weight surgery needed -- `build_reparam_forward` returns that jitted
function.

Accuracy note: dropping I-Pooling changes the math (the reference never
drops it because its reparam is a stub); use this mode for max-throughput
deployment, and the standard path for reference-exact outputs.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp


def build_reparam_forward(model, variables, vocabulary: jax.Array,
                          class_mask: Optional[jax.Array] = None,
                          fused_scores: Optional[bool] = None,
                          nms: Optional[Dict] = None) -> Callable:
    """Returns jitted `fn(images) -> output dict` with the vocabulary and
    weights baked in as compile-time constants.

    model: YOLOCLIP module; vocabulary: (C, E) offline text matrix.
    fused_scores: None = auto (Pallas streaming-max scoring on TPU).
    nms: optional dict of `batched_nms` kwargs (e.g. {'conf_threshold':
      0.25, 'iou_threshold': 0.45, 'topk': 1024, 'max_detections': 300}).
      When given, NMS runs INSIDE the same jitted program and the fn
      returns the batched detection dict. This matters for throughput:
      composing a separate NMS program materializes the unused
      obj_embeddings (~430 MB per bs=32 batch) in HBM between programs,
      while the fused program dead-code-eliminates them (measured +3% bf16,
      +5% int8 on v5e -- see benchmarks/RESULTS.md).
    """
    vocab_const = jnp.asarray(vocabulary)
    mask_const = None if class_mask is None else jnp.asarray(class_mask)
    if fused_scores is None:
        fused_scores = (jax.default_backend() == 'tpu'
                        and class_mask is None)

    @jax.jit
    def forward(images: jax.Array) -> Dict[str, jax.Array]:
        out = model.apply(variables, images, vocab_const,
                          class_mask=mask_const, skip_image_pool=True,
                          fused_scores=fused_scores)
        if nms is None:
            return out
        from yoloclip_tpu.ops.nms import batched_nms
        kw = dict(nms)
        conf = kw.pop('conf_threshold', 0.25)
        iou = kw.pop('iou_threshold', 0.45)
        return batched_nms(out['boxes'], out['scores'], out['class_ids'],
                           conf, iou, **kw)

    return forward
