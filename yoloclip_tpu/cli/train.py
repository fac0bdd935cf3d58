"""Training CLI. Flag surface mirrors
`/root/reference/yolo_clip_detector/train.py:36-48` (--config --resume
--output_dir --backbone --batch_size --epochs --lr --no_eval; --devices is
accepted for compatibility but maps to the data-parallel mesh size instead
of CUDA_VISIBLE_DEVICES).

Usage:
    python -m yoloclip_tpu.cli.train --config cfg.yaml --epochs 10
"""

from __future__ import annotations

import argparse
import dataclasses
import logging
from typing import List, Optional

logger = logging.getLogger('yoloclip_tpu.train')


def parse_args(argv: Optional[List[str]] = None):
    p = argparse.ArgumentParser(description='Train YOLO-CLIP (TPU)')
    p.add_argument('--config', type=str, default=None)
    p.add_argument('--resume', type=str, default=None,
                   help='Checkpoint dir to resume from')
    p.add_argument('--output_dir', type=str, default=None)
    p.add_argument('--backbone', type=str, default=None)
    p.add_argument('--batch_size', type=int, default=None)
    p.add_argument('--epochs', type=int, default=None)
    p.add_argument('--lr', type=float, default=None)
    p.add_argument('--no_eval', action='store_true')
    p.add_argument('--devices', type=str, default=None,
                   help='Data-parallel device count (default: all)')
    p.add_argument('--text-checkpoint', type=str, default=None)
    p.add_argument('--ema', type=float, default=None, metavar='DECAY',
                   help='EMA weight-averaging decay (e.g. 0.9999); eval and '
                        'best/final checkpoints use the averaged weights')
    p.add_argument('--grad-accum', type=int, default=None, metavar='K',
                   help='split each batch into K micro-batches inside the '
                        'jitted step (~K-fold lower activation memory; '
                        'batch_size must divide by K)')
    p.add_argument('--dtype', choices=['float32', 'bfloat16'], default=None,
                   help='model compute dtype (params/optimizer/EMA stay '
                        'fp32; every loss computes in fp32 -- bfloat16 '
                        'halves activation HBM traffic on TPU)')
    p.add_argument('--schedule-units', choices=['epoch', 'step'],
                   default='epoch',
                   help="'epoch' reproduces the reference's per-epoch "
                        "OneCycle stepping; 'step' is textbook per-step")
    p.add_argument('--multihost', action='store_true',
                   help='pod-scale run: one process per host over a global '
                        'mesh (jax.distributed). On a real TPU pod slice '
                        'topology auto-detects; for manual bring-up also '
                        'pass --coordinator/--num-processes/--process-id')
    p.add_argument('--coordinator', type=str, default=None,
                   help='host:port of process 0 (multihost manual bring-up)')
    p.add_argument('--num-processes', type=int, default=None)
    p.add_argument('--process-id', type=int, default=None)
    return p.parse_args(argv)


def main(argv: Optional[List[str]] = None) -> int:
    args = parse_args(argv)

    if args.multihost:
        # must run before ANY backend-touching JAX call in this process
        from yoloclip_tpu.parallel.multihost import initialize
        initialize(coordinator_address=args.coordinator,
                   num_processes=args.num_processes,
                   process_id=args.process_id)

    import jax

    # one INFO stream per pod (process 0); other hosts log warnings only
    logging.basicConfig(
        level=logging.INFO if jax.process_index() == 0 else logging.WARNING)

    from yoloclip_tpu.config import TrainingConfig, load_config
    from yoloclip_tpu.data.augment import default_train_transforms
    from yoloclip_tpu.data.coco import COCODataset
    from yoloclip_tpu.data.loader import DataLoader
    from yoloclip_tpu.models.yolo_clip import YOLOCLIP
    from yoloclip_tpu.text.encoder import CLIPTextEncoder
    from yoloclip_tpu.train.trainer import YOLOCLIPTrainer
    from yoloclip_tpu.utils.general import set_seed

    overrides = {}
    if args.output_dir:
        overrides['output_dir'] = args.output_dir
    if args.batch_size:
        overrides['batch_size'] = args.batch_size
    if args.epochs:
        overrides['max_epochs'] = args.epochs
    if args.lr:
        overrides['learning_rate'] = args.lr
    if args.backbone:
        overrides['backbone_variant'] = args.backbone
    if args.ema is not None:
        overrides['ema_decay'] = args.ema
    if args.grad_accum is not None:
        overrides['grad_accum_steps'] = args.grad_accum
    if args.dtype is not None:
        overrides['dtype'] = args.dtype
    cfg = load_config(TrainingConfig, args.config, **overrides)
    set_seed(cfg.seed)

    train_ds = COCODataset(
        cfg.train_anno_path, cfg.train_img_dir, cfg.class_names,
        cfg.model.image_size,
        transform=default_train_transforms(cfg.model.image_size, cfg.seed),
        mode='train', mosaic_prob=cfg.mosaic_prob,
        max_objects=cfg.max_objects, seed=cfg.seed)
    val_ds = None
    if not args.no_eval:
        val_ds = COCODataset(
            cfg.val_anno_path, cfg.val_img_dir, cfg.class_names,
            cfg.model.image_size, mode='val',
            max_objects=cfg.max_objects)

    batch_size = cfg.batch_size   # per-host loader batch (global in cfg)
    val_drop_last = False
    if args.multihost:
        # each host loads a disjoint, equal-length shard of the dataset
        # and contributes local rows of the GLOBAL batch; equal per-host
        # batch counts are required (per-batch collectives)
        from yoloclip_tpu.parallel.multihost import (Subset,
                                                     local_batch_size,
                                                     process_local_indices)
        batch_size = local_batch_size(cfg.batch_size)
        train_ds = Subset(train_ds,
                          process_local_indices(len(train_ds), even=True))
        if val_ds is not None:
            val_ds = Subset(val_ds,
                            process_local_indices(len(val_ds), even=True))
        val_drop_last = True   # eval allgathers per batch: equal geometry

    train_dl = DataLoader(train_ds, batch_size, shuffle=True,
                          num_workers=cfg.num_workers, drop_last=True,
                          seed=cfg.seed)
    val_dl = None
    if val_ds is not None:
        val_dl = DataLoader(val_ds, batch_size, shuffle=False,
                            num_workers=cfg.num_workers,
                            drop_last=val_drop_last)

    mesh = None
    n_dp = int(args.devices) if args.devices else None
    if args.multihost and n_dp not in (None, len(jax.devices())):
        # a partial mesh would span only process 0's addressable devices
        logger.warning('--devices %d ignored under --multihost: the global '
                       'mesh must cover all %d devices', n_dp,
                       len(jax.devices()))
        n_dp = None
    if n_dp is None:
        n_dp = len(jax.devices())   # global count after initialize()
    if n_dp > 1 or args.multihost:
        from yoloclip_tpu.parallel.mesh import create_mesh
        mesh = create_mesh(n_data=n_dp, n_model=1)
        logger.info('Data-parallel mesh: %s over %d process(es)',
                    mesh.shape, jax.process_count())

    model = YOLOCLIP(cfg.model)
    text_encoder = CLIPTextEncoder(cfg.model.clip_model, cfg.model.embed_dim,
                                   checkpoint_path=args.text_checkpoint,
                                   dtype=cfg.model.dtype)
    trainer = YOLOCLIPTrainer(model, text_encoder, cfg, mesh=mesh,
                              schedule_units=args.schedule_units)
    if args.resume:
        trainer.load(args.resume)

    history = trainer.train(train_dl, val_dl)
    logger.info('Training complete. Final train loss: %s',
                history['train_loss'][-1] if history['train_loss'] else None)
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
