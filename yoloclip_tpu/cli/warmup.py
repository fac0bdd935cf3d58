"""Compile-cache warmup for serving deployments.

First compilation of the full detection pipeline takes minutes on TPU; with
the persistent compile cache (`utils/general.enable_compile_cache`, backed
by `.jax_cache/` or JAX_COMPILATION_CACHE_DIR) every later process starts
in seconds. This CLI pre-compiles the serving programs a deployment will
hit -- one jitted program per (batch size, input resolution, precision) --
so the cache is hot before traffic arrives.

No reference equivalent (the reference is eager torch; nothing to warm).

    python -m yoloclip_tpu.cli.warmup --classes person,car \
        --batch-sizes 1,8,32 --int8
"""

from __future__ import annotations

import argparse
import logging
import time

import numpy as np

logger = logging.getLogger('yoloclip_tpu.warmup')


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('--model', default=None, help='checkpoint dir')
    ap.add_argument('--classes', default='person,car')
    ap.add_argument('--image-size', type=int, default=640)
    ap.add_argument('--batch-sizes', default='1,32',
                    help='comma-separated detect_batch sizes to compile')
    ap.add_argument('--frame-sizes', default='',
                    help='comma-separated HxW single-image detect() input '
                         'resolutions to compile (e.g. 1080x1920,480x854)')
    ap.add_argument('--host-preprocess', default='auto',
                    choices=['auto', 'on', 'off'],
                    help="detect() preprocessing route to warm. 'auto'/'on' "
                         'use the resolution-independent host-letterbox + '
                         'canvas program; \'off\' compiles one DEVICE-'
                         'letterbox program PER --frame-sizes resolution -- '
                         'match this to your serving config or the per-'
                         'resolution compiles happen under traffic')
    ap.add_argument('--int8', action='store_true',
                    help='warm the W8A8 deploy graph instead of bf16')
    ap.add_argument('--stem-u8-s2d', action='store_true',
                    help='warm the uint8 space-to-depth stem layout '
                         '(the bs>=256 deploy winner; pair with the same '
                         'flag on cli.serve)')
    ap.add_argument('--conf', type=float, default=0.25)
    ap.add_argument('--text-checkpoint', default=None)
    args = ap.parse_args(argv)

    from yoloclip_tpu.config import InferenceConfig, ModelConfig
    from yoloclip_tpu.inference.detector import YOLOCLIPDetector
    from yoloclip_tpu.utils.general import enable_compile_cache

    enable_compile_cache()
    logging.basicConfig(level=logging.INFO, format='%(message)s')

    S = args.image_size
    hp = {'auto': 'auto', 'on': True, 'off': False}[args.host_preprocess]
    cfg = InferenceConfig(model=ModelConfig(image_size=(S, S),
                                            stem_u8_s2d=args.stem_u8_s2d),
                          conf_threshold=args.conf, host_preprocess=hp)
    class_names = [c.strip() for c in args.classes.split(',') if c.strip()]
    det = YOLOCLIPDetector(model_path=args.model, class_names=class_names,
                           config=cfg, text_checkpoint=args.text_checkpoint)

    rs = np.random.RandomState(0)
    if args.int8:
        calib = (rs.rand(4, S, S, 3) * 255).astype(np.uint8)
        t0 = time.time()
        det.quantize_int8(calib)
        logger.info('quantize_int8 calibration: %.1fs', time.time() - t0)

    for bs in (int(b) for b in args.batch_sizes.split(',') if b):
        frames = (rs.rand(bs, S, S, 3) * 255).astype(np.uint8)
        t0 = time.time()
        out = det.detect_batch(frames)
        np.asarray(out['count'])           # force compile + execute
        logger.info('detect_batch bs=%d @%dpx: compiled+ran in %.1fs',
                    bs, S, time.time() - t0)

    for hw in (s for s in args.frame_sizes.split(',') if s):
        h, w = (int(x) for x in hw.split('x'))
        frame = (rs.rand(h, w, 3) * 255).astype(np.uint8)
        t0 = time.time()
        det.detect(frame)
        logger.info('detect() %dx%d: compiled+ran in %.1fs',
                    h, w, time.time() - t0)

    logger.info('warmup complete -- compile cache is hot')


if __name__ == '__main__':
    main()
