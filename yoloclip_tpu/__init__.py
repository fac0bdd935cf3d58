"""YOLO-CLIP TPU: a TPU-native JAX framework for real-time zero-shot
open-vocabulary object detection.

A ground-up re-design (not a port) of the capabilities of
`dragonzzuny/Real-Time-Zero-Shot-Open-Vocabulary-Object-Detection-Using-a-Lightweight`
(YOLO-World-style "YOLO-CLIP"): a YOLOv8 CSPDarknet backbone, a frozen CLIP
ViT-B/32 text tower, a vision-language RepVL-PAN neck, contrastive + DFL box
heads, and an end-to-end jitted inference pipeline (letterbox -> forward ->
similarity -> decode -> fixed-shape NMS) that runs as ONE XLA program per
input shape.

Design principles (TPU-first):
  * NHWC layouts, static shapes, bf16-capable compute path on the MXU.
  * Text encoding runs ONCE per vocabulary and is cached on device; the
    detection graph takes the `(num_classes, 512)` embedding matrix as a
    plain input (the reference re-encodes text every training step --
    `/root/reference/yolo_clip_detector/model/yolo_clip.py:130-165`).
  * All postprocessing (conf filter, rescale, NMS) is fixed-shape and
    jittable; no host round-trips inside the hot loop.
  * Scale-out via `jax.sharding.Mesh` + NamedSharding (data parallel with
    psum gradient reduction over ICI), testable on a virtual CPU mesh.
"""

__version__ = "0.1.0"

from yoloclip_tpu.config import ModelConfig, InferenceConfig, TrainingConfig  # noqa: F401
