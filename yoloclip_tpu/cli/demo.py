"""Demo CLI: offline (class list) vs online (free-text prompts) detection.

Mirrors `/root/reference/yolo_clip_detector/scripts/demo.py:51-141`: one
image, either a class-name vocabulary or raw prompts, optional matplotlib
display, drawn output saved to disk.
"""

from __future__ import annotations

import argparse
import logging
import os
from typing import List, Optional

logger = logging.getLogger('yoloclip_tpu.demo')


def parse_args(argv: Optional[List[str]] = None):
    p = argparse.ArgumentParser(description='YOLO-CLIP TPU demo')
    p.add_argument('--image', type=str, required=True)
    p.add_argument('--model', type=str, default=None)
    p.add_argument('--classes', type=str, default=None,
                   help='Offline mode: comma-separated class names')
    p.add_argument('--prompts', type=str, default=None,
                   help='Online mode: comma-separated free-text prompts')
    p.add_argument('--conf', type=float, default=0.25)
    p.add_argument('--output', type=str, default='demo_output.jpg')
    p.add_argument('--show', action='store_true',
                   help='Display with matplotlib')
    return p.parse_args(argv)


def main(argv: Optional[List[str]] = None) -> int:
    logging.basicConfig(level=logging.INFO)
    args = parse_args(argv)
    import dataclasses

    from yoloclip_tpu.config import InferenceConfig
    from yoloclip_tpu.inference.detector import YOLOCLIPDetector

    cfg = InferenceConfig()
    cfg = dataclasses.replace(cfg, conf_threshold=args.conf,
                              use_offline_vocab=args.prompts is None)
    class_names = ([c.strip() for c in args.classes.split(',')]
                   if args.classes else None)
    detector = YOLOCLIPDetector(model_path=args.model,
                                class_names=class_names, config=cfg)

    prompts = ([t.strip() for t in args.prompts.split(',')]
               if args.prompts else None)
    dets = detector.detect(args.image, text_prompts=prompts)
    logger.info('%d detections', len(dets))
    for d in dets:
        logger.info('  %s %.3f %s', d['class_name'], d['score'], d['box'])

    drawn = detector.draw_detections(args.image, dets)
    try:
        import cv2
        cv2.imwrite(args.output, cv2.cvtColor(drawn, cv2.COLOR_RGB2BGR))
    except ImportError:
        from PIL import Image
        Image.fromarray(drawn).save(args.output)
    logger.info('saved %s', args.output)

    if args.show:
        import matplotlib.pyplot as plt
        plt.imshow(drawn)
        plt.axis('off')
        plt.show()
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
