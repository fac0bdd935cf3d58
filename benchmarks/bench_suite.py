"""Extended benchmark suite covering the BASELINE.md measurement configs.

  1. single-image end-to-end p50 latency (letterbox + forward + NMS), target
     < 15 ms on v5e
  2. batched bs=32 throughput (the headline metric, also in ../bench.py)
  3. LVIS-scale 1203-class vocabulary (wide similarity einsum)
  4. reparameterized deploy mode (vocabulary constant-folded, I-Pool dropped)
  5. streaming: 8 x 1080p frames letterboxed on device per step

Prints one JSON line per config. Run on the real chip:
    python benchmarks/bench_suite.py [--configs 1,2,3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _model(image_size=640, dtype='bfloat16', num_classes=80):
    from yoloclip_tpu.config import ModelConfig
    from yoloclip_tpu.models.yolo_clip import YOLOCLIP
    cfg = ModelConfig(backbone_variant='n',
                      image_size=(image_size, image_size), dtype=dtype)
    model = YOLOCLIP(cfg)
    rng = jax.random.PRNGKey(0)
    text = jax.random.normal(rng, (num_classes, 512), jnp.float32)
    text = text / jnp.linalg.norm(text, axis=-1, keepdims=True)
    variables = model.init(rng, jnp.zeros((1, image_size, image_size, 3)),
                           text)
    return model, variables, text


def _time(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return np.asarray(times)


def emit(metric, value, unit, baseline):
    print(json.dumps({'metric': metric, 'value': round(value, 3),
                      'unit': unit,
                      'vs_baseline': round(value / baseline, 3)
                      if baseline else None}))


def bench_single_image_latency():
    """Config 1: 1 image end-to-end, p50 < 15 ms target."""
    from yoloclip_tpu.ops.nms import nms_fixed
    from yoloclip_tpu.ops.preprocess import letterbox, rescale_boxes
    model, variables, text = _model()

    @jax.jit
    def pipeline(variables, raw, text):
        canvas, scale = letterbox(raw, (640, 640))
        out = model.apply(variables, canvas[None], text)
        boxes = rescale_boxes(out['boxes'][0], scale, (480, 854))
        return nms_fixed(boxes, out['scores'][0], 0.25, 0.45,
                         topk=1024, max_detections=300,
                         class_ids=out['class_ids'][0])

    raw = jnp.asarray((np.random.RandomState(0).rand(480, 854, 3) * 255)
                      .astype(np.uint8))
    times = _time(pipeline, variables, raw, text, iters=50)
    p50_ms = float(np.percentile(times, 50) * 1000)
    # lower is better: report speedup factor vs the 15 ms budget
    emit('single_image_p50_latency', p50_ms, 'ms', None)
    emit('single_image_latency_headroom', 15.0 / p50_ms, 'x_budget', 1.0)


def bench_batched(batch=32, classes=80, tag='coco80'):
    from yoloclip_tpu.ops.nms import batched_nms
    model, variables, text = _model(num_classes=classes)
    images = jax.random.uniform(jax.random.PRNGKey(1),
                                (batch, 640, 640, 3), jnp.float32)

    @jax.jit
    def pipeline(variables, images, text):
        out = model.apply(variables, images, text)
        return batched_nms(out['boxes'], out['scores'], out['class_ids'],
                           0.25, 0.45, topk=1024, max_detections=300)

    times = _time(pipeline, variables, images, text)
    ips = batch / float(np.mean(times))
    emit(f'batched_bs{batch}_{tag}_throughput', ips, 'images/sec/chip', 400)


def bench_reparam(batch=32):
    from yoloclip_tpu.ops.nms import batched_nms
    from yoloclip_tpu.ops.reparam import build_reparam_forward
    model, variables, text = _model()
    fwd = build_reparam_forward(model, variables, text)
    images = jax.random.uniform(jax.random.PRNGKey(1),
                                (batch, 640, 640, 3), jnp.float32)

    @jax.jit
    def nms_part(out):
        return batched_nms(out['boxes'], out['scores'], out['class_ids'],
                           0.25, 0.45, topk=1024, max_detections=300)

    def pipeline(images):
        return nms_part(fwd(images))

    times = _time(pipeline, images)
    ips = batch / float(np.mean(times))
    emit(f'reparam_bs{batch}_throughput', ips, 'images/sec/chip', 400)


def bench_streaming(n_streams=8):
    """Config 5 (single-chip slice): 8 x 1080p frames per step, letterboxed
    on device. Target >= 30 fps/stream."""
    from yoloclip_tpu.ops.nms import batched_nms
    from yoloclip_tpu.ops.preprocess import letterbox_batch
    model, variables, text = _model()
    frames = jnp.asarray((np.random.RandomState(0)
                          .rand(n_streams, 1080, 1920, 3) * 255)
                         .astype(np.uint8))

    @jax.jit
    def pipeline(variables, frames, text):
        canvases, scale = letterbox_batch(frames, (640, 640))
        out = model.apply(variables, canvases, text)
        return batched_nms(out['boxes'], out['scores'], out['class_ids'],
                           0.25, 0.45, topk=1024, max_detections=300)

    times = _time(pipeline, variables, frames, text)
    fps_per_stream = 1.0 / float(np.mean(times))
    emit(f'streaming_{n_streams}x1080p_fps_per_stream', fps_per_stream,
         'fps/stream', 30)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--configs', default='1,2,3,4,5')
    args = ap.parse_args()
    wanted = set(args.configs.split(','))
    if '1' in wanted:
        bench_single_image_latency()
    if '2' in wanted:
        bench_batched(32, 80, 'coco80')
    if '3' in wanted:
        bench_batched(8, 1203, 'lvis1203')
    if '4' in wanted:
        bench_reparam()
    if '5' in wanted:
        bench_streaming()


if __name__ == '__main__':
    main()
