"""Export CLI: checkpoint -> StableHLO serving artifact.

    python -m yoloclip_tpu.cli.export --model ckpt_dir \
        --classes person,car --batch-size 32 --output model.stablehlo

No reference equivalent (its onnx deps were never wired up); see
`yoloclip_tpu/utils/export.py`.
"""

from __future__ import annotations

import argparse
import logging
from typing import List, Optional

logger = logging.getLogger('yoloclip_tpu.export')


def main(argv: Optional[List[str]] = None) -> int:
    logging.basicConfig(level=logging.INFO)
    ap = argparse.ArgumentParser(description='Export YOLO-CLIP to StableHLO')
    ap.add_argument('--config', default=None, help='YAML config file '
                    '(architecture must match the checkpoint)')
    ap.add_argument('--backbone', default=None, help='variant n/s/m/l/x')
    ap.add_argument('--model', default=None, help='checkpoint dir (orbax)')
    ap.add_argument('--classes', required=True,
                    help='comma-separated class names (baked-in vocabulary)')
    ap.add_argument('--output', default='yolo_clip.stablehlo')
    ap.add_argument('--batch-size', type=int, default=32)
    ap.add_argument('--conf', type=float, default=0.25)
    ap.add_argument('--iou', type=float, default=0.45)
    ap.add_argument('--max-detections', type=int, default=300)
    ap.add_argument('--no-nms', action='store_true',
                    help='export raw boxes/scores (no suppression)')
    ap.add_argument('--skip-ipool', '--reparam', dest='skip_ipool',
                    action='store_true',
                    help='ALSO drop I-Pooling from the exported graph. '
                         'Only for models TRAINED without I-Pooling: on '
                         'I-Pool-trained weights this zeroes detection '
                         'quality (measured 0.0 mAP -- ops/reparam.py). '
                         'The vocabulary is constant-folded either way.')
    ap.add_argument('--platforms', default=None,
                    help="comma list, e.g. 'tpu,cpu' (default: current)")
    ap.add_argument('--text-checkpoint', default=None)
    args = ap.parse_args(argv)

    import dataclasses

    from yoloclip_tpu.config import InferenceConfig, load_config
    from yoloclip_tpu.inference.detector import YOLOCLIPDetector
    from yoloclip_tpu.utils.export import export_detector

    cfg = load_config(InferenceConfig, args.config)
    if args.backbone:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(
                cfg.model, backbone_variant=args.backbone))
    class_names = [c.strip() for c in args.classes.split(',') if c.strip()]
    det = YOLOCLIPDetector(model_path=args.model, class_names=class_names,
                           config=cfg,
                           text_checkpoint=args.text_checkpoint)
    h, w = det.image_size
    path = export_detector(
        det.model, det.variables, det.offline_vocabulary,
        (args.batch_size, h, w), args.output,
        include_nms=not args.no_nms,
        conf_threshold=args.conf, iou_threshold=args.iou,
        max_detections=args.max_detections,
        skip_image_pool=args.skip_ipool,
        platforms=[p.strip() for p in args.platforms.split(',')
                   if p.strip()] if args.platforms else None)
    logger.info('exported %d-class detector (bs=%d, %dx%d) -> %s',
                len(class_names), args.batch_size, h, w, path)
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
