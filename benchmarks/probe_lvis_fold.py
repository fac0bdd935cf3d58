"""A/B probe: projection-folded vs unfolded fused scoring at LVIS scale.

The projection fold (`ops/pallas/similarity.py::
fused_projected_similarity_argmax`) measured +6% e2e at C=80 but LVIS
(C=1203) came out BELOW the round-2 unfolded numbers. This probe builds
both serve graphs from the SAME int8 model and times them back-to-back on
the same pool, isolating the score-path structure:

  folded:   per-level h -> text-side projection -> K=256 kernel
  unfolded: obj_2 conv -> concat -> normalize_obj kernel (K=512)

Both chained-execute with a scalar-reduced output (tunnel fetch cancels).
Run: JAX_PLATFORMS='' PYTHONPATH=/root/repo:/root/.axon_site \
     python -u benchmarks/probe_lvis_fold.py [--classes 1203] [--bf16]
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from yoloclip_tpu.config import ModelConfig
from yoloclip_tpu.models.yolo_clip import YOLOCLIP
from yoloclip_tpu.ops.quantize import quantize_model
from yoloclip_tpu.utils.general import enable_compile_cache


def time_chained(fn, args, n=10, reps=3):
    out = fn(*args)
    float(np.asarray(out))                      # warm + sync
    best = float('inf')
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        float(np.asarray(out))
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--classes', type=int, default=1203)
    ap.add_argument('--batch', type=int, default=32)
    ap.add_argument('--bf16', action='store_true',
                    help='float path instead of int8')
    args = ap.parse_args()
    enable_compile_cache()

    cfg = ModelConfig(image_size=(640, 640), dtype='bfloat16')
    model = YOLOCLIP(cfg)
    key = jax.random.PRNGKey(0)
    images = jax.random.uniform(key, (args.batch, 640, 640, 3))
    text = jax.random.normal(key, (args.classes, cfg.embed_dim))
    variables = jax.jit(model.init)(key, images[:1], text)
    if not args.bf16:
        model, variables = quantize_model(cfg, variables, [(images, text)],
                                          skip_image_pool=True)

    @jax.jit
    def folded(v, im, tx):
        out = model.apply(v, im, tx, fused_scores=True,
                          skip_image_pool=True)
        return (jnp.sum(out['scores']) +
                jnp.sum(out['class_ids'].astype(jnp.float32)))

    def make_unfolded_tiled(tile_a, tile_c):
        @jax.jit
        def unfolded_tiled(v, im, tx):
            from yoloclip_tpu.ops.pallas.similarity import (
                fused_similarity_argmax)
            out = model.apply(v, im, tx, skip_image_pool=True)
            obj = out['obj_embeddings'].astype(jnp.bfloat16)
            txn = out['text_embeddings']
            txn = txn / jnp.maximum(
                jnp.linalg.norm(txn, axis=-1, keepdims=True), 1e-12)
            s, ids = fused_similarity_argmax(obj, txn.astype(jnp.bfloat16),
                                             normalize_obj=True,
                                             tile_a=tile_a, tile_c=tile_c)
            return jnp.sum(cfg.cls_alpha * s + cfg.cls_beta) + \
                jnp.sum(ids.astype(jnp.float32))
        return unfolded_tiled

    @jax.jit
    def unfolded(v, im, tx):
        # reconstruct the pre-fold serve graph: einsum path but with the
        # (B, A, C) similarity dead-code-eliminated; obj_2 + concat run,
        # then the round-2 normalize_obj kernel (K = embed_dim).
        from yoloclip_tpu.ops.pallas.similarity import (
            fused_similarity_argmax)
        out = model.apply(v, im, tx, skip_image_pool=True)
        obj = out['obj_embeddings'].astype(jnp.bfloat16)
        txn = out['text_embeddings']
        txn = txn / jnp.maximum(
            jnp.linalg.norm(txn, axis=-1, keepdims=True), 1e-12)
        s, ids = fused_similarity_argmax(obj, txn.astype(jnp.bfloat16),
                                         normalize_obj=True)
        return jnp.sum(cfg.cls_alpha * s + cfg.cls_beta) + \
            jnp.sum(ids.astype(jnp.float32))

    res = {}
    variants = [('folded', folded), ('unfolded', unfolded),
                ('unfolded_a1024_c512', make_unfolded_tiled(1024, 512)),
                ('unfolded_a2048_c640', make_unfolded_tiled(2048, 640)),
                ('unfolded_a1024_c1280', make_unfolded_tiled(1024, 1280))]
    for name, fn in variants:
        ms = time_chained(fn, (variables, images, text))
        res[name] = round(ms, 3)
        print(f'{name:9s} {ms:8.2f} ms  ({args.batch / ms * 1e3:7.1f} img/s)',
              flush=True)
    res.update(classes=args.classes, batch=args.batch,
               mode='bf16' if args.bf16 else 'int8')
    print(json.dumps(res))


if __name__ == '__main__':
    main()
