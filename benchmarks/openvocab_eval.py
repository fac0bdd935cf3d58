"""Open-vocabulary (held-out-class / zero-shot) quality benchmark.

Round-2 verdict missing #2: every quality number so far was closed-set.
This measures the reference's HEADLINE capability -- detecting classes
named only at inference time (`clip/vocab_builder.py:44`,
`model/yolo_clip.py:225`) -- offline, using the open-vocab synthetic
family (`yoloclip_tpu/data/synth.py::make_open_vocab_family`) where class
appearance (color) and class embedding are deterministic functions of the
SAME latent:

  1. Train the clean-mode detector on K train classes (their colors +
     embeddings) -- it must learn the appearance -> embedding mapping.
  2. Seen eval: images of train classes, train-class vocabulary.
  3. ZERO-SHOT eval: images of held-out classes the model has NEVER seen,
     scored against their embeddings alone, through the real inference
     path (conf 0.25 + class-agnostic NMS).
  4. Control: the same held-out images scored against PERMUTED held-out
     embeddings -- if the zero-shot number came from anything but the
     embedding<->appearance link, this would not collapse.

Prints one JSON line: seen mAP50, zero-shot mAP50, shuffled-control mAP50.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def train(args, family, train_ids):
    import jax
    import jax.numpy as jnp

    from yoloclip_tpu.config import ModelConfig, TrainingConfig
    from yoloclip_tpu.data.synth import make_open_vocab_detection_set
    from yoloclip_tpu.models.yolo_clip import YOLOCLIP
    from yoloclip_tpu.train.train_state import (create_train_state,
                                                make_onecycle_schedule,
                                                make_train_step,
                                                set_learning_rate)

    S = args.image_size
    mcfg = ModelConfig(backbone_variant=args.variant, image_size=(S, S))
    cfg = TrainingConfig(model=mcfg, max_objects=8,
                         batch_size=args.batch_size,
                         assigner='topk_center', contrastive_type='bce')
    model = YOLOCLIP(mcfg)
    data = make_open_vocab_detection_set(args.train_images, 0, family,
                                         train_ids, image_size=S)
    text = family['embeddings'][train_ids]
    C = text.shape[0]

    rng = jax.random.PRNGKey(args.seed)
    state = create_train_state(model, cfg, rng,
                               jnp.zeros((1, S, S, 3)), jnp.zeros((C, 512)))
    step = jax.jit(make_train_step(cfg), donate_argnums=(0,))
    sched = make_onecycle_schedule(args.lr, args.steps,
                                   max(args.steps // 20, 1))

    B = args.batch_size
    textb = jnp.broadcast_to(jnp.asarray(text)[None], (B, C, 512))
    # 1 + seed: seed 0 keeps the historical round-3/4 batch order; other
    # seeds vary BOTH init and data order (the multi-seed protocol
    # measures full train-to-train variance, round-4 verdict task 4)
    rs = np.random.RandomState(1 + args.seed)
    order = rs.permutation(args.train_images)
    pos = 0
    t0 = time.time()
    for i in range(args.steps):
        if pos + B > args.train_images:
            order = rs.permutation(args.train_images)
            pos = 0
        idx = order[pos:pos + B]
        pos += B
        batch = {k: jnp.asarray(data[k][idx])
                 for k in ('images', 'boxes', 'class_ids', 'valid_mask')}
        state = set_learning_rate(state, float(sched(i)))
        state, parts = step(state, batch, textb)
        if (i + 1) % max(args.steps // 10, 1) == 0:
            print(f'  step {i + 1}/{args.steps} '
                  f'loss={float(parts["loss"]):.4f} '
                  f'({time.time() - t0:.0f}s)', flush=True)
    return model, mcfg, state


def evaluate(model, state, val, text, conf, iou, skip_image_pool=False):
    from quality_eval import eval_ours

    from yoloclip_tpu.utils.metrics import calculate_map
    preds = eval_ours(model, state, val, text, conf, iou,
                      skip_image_pool=skip_image_pool)
    targets = [{'boxes': val['boxes'][i][None],
                'class_ids': val['class_ids'][i][None],
                'valid_mask': val['valid_mask'][i][None]}
               for i in range(val['images'].shape[0])]
    m50, m5095 = calculate_map(preds, targets)
    return m50, m5095


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--total-classes', type=int, default=32)
    ap.add_argument('--holdout', type=int, default=8)
    ap.add_argument('--train-images', type=int, default=512)
    ap.add_argument('--val-images', type=int, default=64)
    ap.add_argument('--image-size', type=int, default=160)
    ap.add_argument('--variant', default='n')
    ap.add_argument('--steps', type=int, default=2000)
    ap.add_argument('--batch-size', type=int, default=16)
    ap.add_argument('--lr', type=float, default=2e-3)
    ap.add_argument('--conf', type=float, default=0.25)
    ap.add_argument('--iou', type=float, default=0.45)
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--seeds', default=None, metavar='S0,S1,...',
                    help='run the FULL protocol (train + seen/zero-shot/'
                         'control evals) once per seed and report mean and '
                         'range -- the protocol has ~2x train-to-train '
                         'variance (round-3 0.316 vs round-4 0.158, same '
                         'code), so single-seed numbers cannot detect a '
                         'real zero-shot regression (round-4 verdict '
                         'task 4). Overrides --seed; --cache-state gets a '
                         'per-seed suffix')
    ap.add_argument('--cache-state', default=None, metavar='PATH')
    ap.add_argument('--reparam', action='store_true',
                    help='ALSO run the seen + zero-shot evals through the '
                         'reparam deploy graph (I-Pooling dropped, '
                         'ops/reparam.py): open-vocab generalization is '
                         'where dropping the image->text update is most '
                         'likely to cost, so the peak-throughput headline '
                         'needs this number')
    args = ap.parse_args()

    from yoloclip_tpu.data.synth import make_open_vocab_family
    from yoloclip_tpu.utils.general import enable_compile_cache
    enable_compile_cache()

    family = make_open_vocab_family(args.total_classes)
    all_ids = np.arange(args.total_classes)
    # held-out classes interleave the latent sphere (not one polar cap)
    stride = max(args.total_classes // args.holdout, 1)
    held_ids = all_ids[stride - 1::stride][:args.holdout]
    train_ids = np.array([i for i in all_ids if i not in set(held_ids)])
    print(f'train classes: {len(train_ids)}, held-out: {list(held_ids)}',
          flush=True)

    if args.seeds:
        import copy
        seeds = [int(s) for s in args.seeds.split(',') if s.strip()]
        per_seed = []
        for sd in seeds:
            a = copy.copy(args)
            a.seed = sd
            a.cache_state = (f'{args.cache_state}.s{sd}'
                             if args.cache_state else None)
            print(f'=== seed {sd} ===', flush=True)
            r = run_once(a, family, train_ids, held_ids)
            print(f'seed {sd}: {json.dumps(r)}', flush=True)
            per_seed.append(r)
        agg_keys = [k for k in per_seed[0]
                    if isinstance(per_seed[0][k], float)]
        result = {'metric': 'zero_shot_map50_mean',
                  'value': round(float(np.mean(
                      [r['value'] for r in per_seed])), 4),
                  'n_seeds': len(seeds), 'seeds': seeds}
        for k in agg_keys:
            vals = [r[k] for r in per_seed]
            result[f'{k}_mean'] = round(float(np.mean(vals)), 4)
            result[f'{k}_min'] = round(float(np.min(vals)), 4)
            result[f'{k}_max'] = round(float(np.max(vals)), 4)
        result['per_seed'] = per_seed
    else:
        result = run_once(args, family, train_ids, held_ids)
    print(json.dumps(result))


def run_once(args, family, train_ids, held_ids):
    """Train (or load) one seed's model and run the seen / zero-shot /
    shuffled-control evals. Returns the per-seed result dict."""
    import jax

    from yoloclip_tpu.data.synth import make_open_vocab_detection_set

    if args.cache_state and os.path.exists(args.cache_state):
        import pickle

        import jax.numpy as jnp

        from yoloclip_tpu.config import ModelConfig
        from yoloclip_tpu.models.yolo_clip import YOLOCLIP
        with open(args.cache_state, 'rb') as f:
            blob = pickle.load(f)
        got = (blob['variant'], blob['image_size'], blob['n_train_classes'])
        want = (args.variant, args.image_size, len(train_ids))
        if got != want:
            sys.exit(f'cache mismatch: {got} != {want}')

        class _State:
            pass
        state = _State()
        state.params = jax.tree.map(jnp.asarray, blob['params'])
        state.batch_stats = jax.tree.map(jnp.asarray, blob['batch_stats'])
        S = args.image_size
        mcfg = ModelConfig(backbone_variant=args.variant, image_size=(S, S))
        model = YOLOCLIP(mcfg)
        print(f'loaded cached state: {args.cache_state}', flush=True)
    else:
        print(f'training: {args.steps} steps on {len(train_ids)} classes',
              flush=True)
        model, mcfg, state = train(args, family, train_ids)
        if args.cache_state:
            import pickle
            with open(args.cache_state, 'wb') as f:
                pickle.dump({'params': jax.tree.map(np.asarray, state.params),
                             'batch_stats': jax.tree.map(
                                 np.asarray, state.batch_stats),
                             'variant': args.variant,
                             'image_size': args.image_size,
                             'n_train_classes': len(train_ids)}, f)

    S = args.image_size
    seen_val = make_open_vocab_detection_set(args.val_images, 1000, family,
                                             train_ids, image_size=S)
    held_val = make_open_vocab_detection_set(args.val_images, 2000, family,
                                             held_ids, image_size=S)

    seen_m50, seen_m5095 = evaluate(model, state, seen_val,
                                    family['embeddings'][train_ids],
                                    args.conf, args.iou)
    zs_m50, zs_m5095 = evaluate(model, state, held_val,
                                family['embeddings'][held_ids],
                                args.conf, args.iou)
    # control: permute embedding<->class assignment among held-out classes
    perm = np.roll(np.arange(len(held_ids)), 1)
    ctrl_m50, _ = evaluate(model, state, held_val,
                           family['embeddings'][held_ids][perm],
                           args.conf, args.iou)

    result = {
        'metric': 'zero_shot_map50',
        'value': round(zs_m50, 4),
        'zero_shot_map50_95': round(zs_m5095, 4),
        'seen_map50': round(seen_m50, 4),
        'seen_map50_95': round(seen_m5095, 4),
        'shuffled_control_map50': round(ctrl_m50, 4),
        'train_classes': int(len(train_ids)),
        'holdout_classes': int(len(held_ids)),
    }
    if args.reparam:
        rp_seen, _ = evaluate(model, state, seen_val,
                              family['embeddings'][train_ids],
                              args.conf, args.iou, skip_image_pool=True)
        rp_zs, rp_zs95 = evaluate(model, state, held_val,
                                  family['embeddings'][held_ids],
                                  args.conf, args.iou,
                                  skip_image_pool=True)
        result.update({
            'reparam_seen_map50': round(rp_seen, 4),
            'reparam_zero_shot_map50': round(rp_zs, 4),
            'reparam_zero_shot_map50_95': round(rp_zs95, 4),
            'reparam_zero_shot_gap': round(abs(zs_m50 - rp_zs), 4),
        })
    return result


if __name__ == '__main__':
    main()
