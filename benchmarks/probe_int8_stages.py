"""Stage decomposition of the int8 vs bf16 serve graphs (real TPU).

Motivation (RESULTS.md): the bf16 detect pipeline sustains ~80% of v5e HBM
bandwidth, but the int8 path at ~1560 img/s x ~300 MB/img is only ~57% --
so the int8 graph is NOT bandwidth-saturated and its limiter is elsewhere.
This probe times truncated versions of BOTH graphs to localize where the
int8 time goes.

Method: jit the full serve apply with `capture_intermediates` restricted to
one submodule, return ONLY a scalar sum of that submodule's output --
XLA dead-code-eliminates every later stage, so each timing is the cost of
the graph UP TO that stage (plus a negligible reduce). Timing is async
dispatch + one tiny scalar fetch, so the tunnel RTT cancels in deltas.

Stages: backbone -> neck -> embeds(+box head) -> full(decode+scores) -> +NMS.
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

from yoloclip_tpu.utils.general import enable_compile_cache


def _tree_scalar(x):
    leaves = jax.tree.leaves(x)
    return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves
               if hasattr(l, 'astype'))


def _time(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)        # one sync fetch; block_until_ready is unreliable
    return (time.perf_counter() - t0) / iters


def build_stage_fns(model, fused):
    """Return {stage: jitted fn(vars, images, text) -> scalar}."""
    from yoloclip_tpu.ops.nms import batched_nms

    def capture_of(*names):
        return lambda mdl, method: mdl.name in names

    def stage_backbone(variables, images, text):
        _, inter = model.apply(variables, images, text,
                               fused_scores=fused,
                               capture_intermediates=capture_of('backbone'),
                               mutable=['intermediates'])
        return _tree_scalar(inter['intermediates']['backbone'])

    def stage_neck(variables, images, text):
        _, inter = model.apply(variables, images, text,
                               fused_scores=fused,
                               capture_intermediates=capture_of('neck'),
                               mutable=['intermediates'])
        return _tree_scalar(inter['intermediates']['neck'])

    def stage_heads(variables, images, text):
        names = ('contrastive_heads_0', 'contrastive_heads_1',
                 'contrastive_heads_2', 'box_head')
        _, inter = model.apply(variables, images, text,
                               fused_scores=fused,
                               capture_intermediates=capture_of(*names),
                               mutable=['intermediates'])
        return _tree_scalar({k: v for k, v in
                             inter['intermediates'].items() if k in names})

    def stage_boxes(variables, images, text):
        # heads + DFL decode only (scores path dead-code-eliminated)
        out = model.apply(variables, images, text, fused_scores=fused)
        return jnp.sum(out['boxes'].astype(jnp.float32))

    def stage_scores(variables, images, text):
        # heads + similarity/argmax only (box decode dead-code-eliminated)
        out = model.apply(variables, images, text, fused_scores=fused)
        return (jnp.sum(out['scores'].astype(jnp.float32))
                + jnp.sum(out['class_ids'].astype(jnp.float32)))

    def stage_full(variables, images, text):
        out = model.apply(variables, images, text, fused_scores=fused)
        return (jnp.sum(out['boxes'].astype(jnp.float32))
                + jnp.sum(out['scores'].astype(jnp.float32))
                + jnp.sum(out['class_ids'].astype(jnp.float32)))

    def stage_nms(variables, images, text):
        out = model.apply(variables, images, text, fused_scores=fused)
        det = batched_nms(out['boxes'], out['scores'], out['class_ids'],
                          0.25, 0.45, topk=1024, max_detections=300)
        return _tree_scalar(det)

    return {'backbone': jax.jit(stage_backbone),
            'neck': jax.jit(stage_neck),
            'heads': jax.jit(stage_heads),
            'boxes': jax.jit(stage_boxes),
            'scores': jax.jit(stage_scores),
            'full': jax.jit(stage_full),
            'nms': jax.jit(stage_nms)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=32)
    ap.add_argument('--classes', type=int, default=80)
    ap.add_argument('--variant', default='n')
    ap.add_argument('--image-size', type=int, default=640)
    ap.add_argument('--iters', type=int, default=20)
    args = ap.parse_args()

    enable_compile_cache()
    from yoloclip_tpu.config import ModelConfig
    from yoloclip_tpu.models.yolo_clip import YOLOCLIP
    from yoloclip_tpu.ops.quantize import quantize_model

    S = args.image_size
    cfg = ModelConfig(backbone_variant=args.variant, image_size=(S, S),
                      dtype='bfloat16')
    model = YOLOCLIP(cfg)
    rng = jax.random.PRNGKey(0)
    images = jax.random.uniform(jax.random.PRNGKey(1),
                                (args.batch, S, S, 3), jnp.float32)
    text = jax.random.normal(jax.random.PRNGKey(2), (args.classes, 512))
    text = text / jnp.linalg.norm(text, axis=-1, keepdims=True)
    variables = model.init(rng, images[:1], text)
    fused = jax.default_backend() == 'tpu'

    qmodel, qvars = quantize_model(cfg, variables, [(images[:8], text)])

    results = {}
    for tag, mdl, vrs in (('bf16', model, variables), ('int8', qmodel, qvars)):
        fns = build_stage_fns(mdl, fused)
        prev = 0.0
        for stage, fn in fns.items():
            dt = _time(fn, vrs, images, text, iters=args.iters)
            results[f'{tag}_{stage}'] = dt
            print(f'{tag:5s} {stage:9s} cum {dt * 1e3:8.2f} ms  '
                  f'delta {(dt - prev) * 1e3:8.2f} ms  '
                  f'({args.batch / dt:7.1f} img/s)', flush=True)
            prev = dt
        print(flush=True)

    print(json.dumps({k: round(v * 1e3, 3) for k, v in results.items()}))


if __name__ == '__main__':
    main()
