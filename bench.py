"""Headline benchmark: batched 640x640 COCO-80 inference throughput.

BASELINE.md config 2: bs=32 @ 640x640, 80-class offline vocabulary (cached
text embeddings), ONE jitted graph covering model forward + similarity +
DFL decode + fixed-shape class-agnostic NMS, single chip. Target:
>= 400 images/sec/chip on TPU v5e (vs_baseline = value / 400).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp

from yoloclip_tpu.utils.general import enable_compile_cache

enable_compile_cache()


def build(batch_size: int, num_classes: int, image_size: int, dtype: str):
    from yoloclip_tpu.config import ModelConfig
    from yoloclip_tpu.models.yolo_clip import YOLOCLIP
    from yoloclip_tpu.ops.nms import batched_nms

    cfg = ModelConfig(backbone_variant='n',
                      image_size=(image_size, image_size), dtype=dtype)
    model = YOLOCLIP(cfg)
    rng = jax.random.PRNGKey(0)
    images = jax.random.uniform(rng, (batch_size, image_size, image_size, 3),
                                jnp.float32)
    text = jax.random.normal(rng, (num_classes, 512), jnp.float32)
    text = text / jnp.linalg.norm(text, axis=-1, keepdims=True)
    variables = model.init(rng, images[:1], text)

    fused = jax.default_backend() == 'tpu'

    @jax.jit
    def pipeline(variables, images, text):
        out = model.apply(variables, images, text, fused_scores=fused)
        return batched_nms(out['boxes'], out['scores'], out['class_ids'],
                           conf_threshold=0.25, iou_threshold=0.45,
                           topk=1024, max_detections=300)

    return pipeline, variables, images, text


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch-size', type=int, default=32)
    ap.add_argument('--classes', type=int, default=80)
    ap.add_argument('--image-size', type=int, default=640)
    ap.add_argument('--dtype', default='bfloat16')
    ap.add_argument('--iters', type=int, default=20)
    ap.add_argument('--warmup', type=int, default=3)
    args = ap.parse_args()

    pipeline, variables, images, text = build(
        args.batch_size, args.classes, args.image_size, args.dtype)

    import numpy as np

    for _ in range(args.warmup):
        out = pipeline(variables, images, text)
    np.asarray(out['count'])   # real sync: block_until_ready is
    #                            unreliable through the tunnel backend

    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = pipeline(variables, images, text)
    np.asarray(out['count'])
    dt = time.perf_counter() - t0

    imgs_per_sec = args.batch_size * args.iters / dt
    print(json.dumps({
        'metric': 'batched_inference_throughput_bs%d_%dpx_coco80'
                  % (args.batch_size, args.image_size),
        'value': round(imgs_per_sec, 2),
        'unit': 'images/sec/chip',
        'vs_baseline': round(imgs_per_sec / 400.0, 3),
    }))


if __name__ == '__main__':
    main()
