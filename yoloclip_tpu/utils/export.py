"""Deployment export: serialize the detection pipeline as StableHLO.

The reference declares onnx/onnxruntime in requirements but ships no
export code (`/root/reference/requirements.txt:17-18`, SURVEY §2 row 24).
The TPU-native equivalent is `jax.export`: the whole jitted pipeline --
weights and vocabulary baked in, optionally through NMS -- serializes to a
single portable StableHLO artifact that any JAX/XLA runtime (or IFRT
serving stack) can load and run without the Python model code.

    from yoloclip_tpu.utils.export import export_detector, load_exported
    path = export_detector(model, variables, vocab, (32, 640, 640),
                           'model.stablehlo', include_nms=True)
    fn = load_exported(path)
    out = fn(images)          # {'boxes', 'scores', 'class_ids', ...}
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as jexport


def export_detector(model, variables, vocabulary: jax.Array,
                    batch_image_shape: Tuple[int, int, int],
                    path: str,
                    include_nms: bool = True,
                    conf_threshold: float = 0.25,
                    iou_threshold: float = 0.45,
                    nms_topk: int = 1024,
                    max_detections: int = 300,
                    skip_image_pool: bool = False,
                    platforms: Optional[Sequence[str]] = None) -> str:
    """Serialize `images -> detections` with weights+vocabulary baked in.

    batch_image_shape: (B, H, W) of the float [0,1] NHWC input.
    platforms: lowering targets, default [current backend]; pass
      ['tpu', 'cpu'] for a multi-platform artifact.
    Returns `path`.
    """
    from yoloclip_tpu.ops.nms import batched_nms

    vocab_const = jnp.asarray(vocabulary)
    B, H, W = batch_image_shape

    @jax.jit
    def forward(images):
        out = model.apply(variables, images, vocab_const,
                          skip_image_pool=skip_image_pool)
        if not include_nms:
            return {'boxes': out['boxes'], 'scores': out['scores'],
                    'class_ids': out['class_ids']}
        return batched_nms(out['boxes'], out['scores'], out['class_ids'],
                           conf_threshold, iou_threshold,
                           topk=nms_topk, max_detections=max_detections,
                           method='fixpoint')   # portable: no pallas dep

    spec = jax.ShapeDtypeStruct((B, H, W, 3), jnp.float32)
    exported = jexport.export(
        forward,
        platforms=list(platforms) if platforms else None)(spec)
    with open(path, 'wb') as f:
        f.write(exported.serialize())
    return path


def load_exported(path: str):
    """Load a serialized artifact; returns `fn(images) -> dict`."""
    with open(path, 'rb') as f:
        exported = jexport.deserialize(f.read())
    return jax.jit(exported.call)
