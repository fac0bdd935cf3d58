"""Deploy-time re-parameterization: fold a fixed vocabulary into the graph.

The reference stubs this out (`/root/reference/yolo_clip_detector/model/
repvl_pan.py:302-315` just logs a warning; SURVEY bug #8). With an offline
vocabulary the text side is constant, so every text projection (the T-CSP
max-sigmoid path and the similarity head) collapses into fixed weights.

On TPU/XLA, re-parameterization IS constant folding: close the vocabulary
matrix over the jit boundary and the compiler folds `text @ W_proj^T + b`
into a constant for every TextGuidedCSPLayer and embeds the normalized
vocabulary into the similarity matmul. No manual weight surgery needed --
`build_reparam_forward` returns that jitted function.

I-Pooling is KEPT by default. The YOLO-World deploy recipe additionally
drops the per-image image->text update (I-Pooling attention); measured on
trained weights that is a quality CATASTROPHE, not an approximation: the
contrastive head learns to score against the image-CONDITIONED text
embeddings, and scoring against the raw vocabulary rows collapses every
cosine score below the 0.25 confidence threshold (max observed score
0.128; mAP50 0.0 with detection agreement 0.0 on the offline quality
protocol -- benchmarks/RESULTS.md round-4 reparam table). The measured
throughput cost of keeping I-Pool is ~2% at bs=256 (2754 vs 2810 img/s
int8) and ~0% at bs=32, so `skip_image_pool=True` is an explicit opt-in
for models TRAINED without I-Pooling, never a free win.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp


def build_reparam_forward(model, variables, vocabulary: jax.Array,
                          class_mask: Optional[jax.Array] = None,
                          fused_scores: Optional[bool] = None,
                          skip_image_pool: bool = False,
                          nms: Optional[Dict] = None) -> Callable:
    """Returns jitted `fn(images) -> output dict` with the vocabulary and
    weights baked in as compile-time constants.

    model: YOLOCLIP module; vocabulary: (C, E) offline text matrix.
    fused_scores: None = auto (Pallas streaming-max scoring on TPU).
    skip_image_pool: ALSO drop the I-Pooling image->text update. Off by
      default -- on weights trained with I-Pooling this zeroes detection
      quality outright (see the module docstring); only enable for models
      trained without it.
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
                          class_mask=mask_const,
                          skip_image_pool=skip_image_pool,
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
