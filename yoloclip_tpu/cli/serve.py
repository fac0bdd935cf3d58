"""HTTP detection service (stdlib-only) over the micro-batching runtime.

    # serve COCO-80 int8 on :8000 (calibrate on a directory of images):
    python -m yoloclip_tpu.cli.serve --model run/final_model --port 8000 \
        --int8 --calib-dir samples/

    # query it:
    curl -s -X POST --data-binary @dog.jpg localhost:8000/detect | jq .
    curl -s localhost:8000/stats

Endpoints:
    POST /detect   image bytes (JPEG/PNG) -> JSON detection list
                   (same schema as YOLOCLIPDetector.detect: box int xyxy
                   in ORIGINAL image pixels, score, class_id, class_name)
    POST /vocab    JSON {"class_names": [...]} -> hot-swap the serving
                   vocabulary (encoded once; next batch scores against it)
    GET  /stats    micro-batcher counters (occupancy, latency percentiles)
    GET  /healthz  liveness

No reference equivalent (the reference's `scripts/demo.py` is a local
one-shot). Concurrent requests from `ThreadingHTTPServer`'s per-client
threads block on futures from ONE `DetectionServer`
(`inference/server.py`), which coalesces them into fixed-shape device
batches -- single-image clients get batched throughput without managing
batches themselves.
"""

from __future__ import annotations

import argparse
import json
import logging
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

logger = logging.getLogger('yoloclip_tpu.serve')

MAX_BODY_BYTES = 64 * 1024 * 1024


def decode_image_bytes(buf: bytes) -> np.ndarray:
    """JPEG/PNG bytes -> (H, W, 3) uint8 RGB: native C++ decoder first,
    PIL fallback (mirrors data/coco.py::_imread_rgb's backend order)."""
    from yoloclip_tpu import native
    if native.available():
        try:
            return native.decode_bytes(buf)
        except ValueError:
            pass   # unusual format: fall through
    import io

    from PIL import Image
    return np.asarray(Image.open(io.BytesIO(buf)).convert('RGB'))


def make_handler(server):
    """Bind a BaseHTTPRequestHandler subclass to a DetectionServer."""

    class Handler(BaseHTTPRequestHandler):
        protocol_version = 'HTTP/1.1'

        def _reply(self, code: int, payload) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header('Content-Type', 'application/json')
            self.send_header('Content-Length', str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _read_body(self) -> Optional[bytes]:
            n = int(self.headers.get('Content-Length') or 0)
            if n <= 0:
                self._reply(400, {'error': 'empty body'})
                return None
            if n > MAX_BODY_BYTES:
                self._reply(413, {'error': 'body too large'})
                return None
            return self.rfile.read(n)

        def do_GET(self):
            if self.path == '/healthz':
                self._reply(200, {'status': 'ok'})
            elif self.path == '/stats':
                self._reply(200, server.stats())
            else:
                self._reply(404, {'error': f'unknown path {self.path}'})

        def do_POST(self):
            body = self._read_body()
            if body is None:
                return
            if self.path == '/detect':
                try:
                    image = decode_image_bytes(body)
                except Exception:
                    self._reply(400, {'error': 'undecodable image'})
                    return
                try:
                    dets = server.detect(image, timeout=60.0)
                except Exception as e:
                    self._reply(500, {'error': str(e)})
                    return
                self._reply(200, {'detections': dets})
            elif self.path == '/vocab':
                try:
                    names = json.loads(body)['class_names']
                except Exception:
                    names = None
                # explicit check, not assert: `python -O` strips asserts
                # and an empty vocabulary poisons every later batch (C=0)
                if not isinstance(names, list) or not names:
                    self._reply(
                        400, {'error': 'expected {"class_names": [...]}'})
                    return
                server.set_vocabulary([str(n) for n in names])
                self._reply(200, {'status': 'ok', 'classes': len(names)})
            else:
                self._reply(404, {'error': f'unknown path {self.path}'})

        def log_message(self, fmt, *args):   # route through logging
            logger.info('%s -- %s', self.address_string(), fmt % args)

    return Handler


def build_server(args) -> 'object':
    """args -> (DetectionServer, detector). Split out for tests."""
    from yoloclip_tpu.config import (COCO_CLASS_NAMES, InferenceConfig,
                                     ModelConfig)
    from yoloclip_tpu.inference.detector import YOLOCLIPDetector
    from yoloclip_tpu.inference.server import DetectionServer

    classes = ([c.strip() for c in args.classes.split(',') if c.strip()]
               if args.classes else list(COCO_CLASS_NAMES))
    cfg = InferenceConfig(
        model=ModelConfig(backbone_variant=args.variant,
                          image_size=(args.image_size, args.image_size),
                          dtype='bfloat16',
                          stem_u8_s2d=getattr(args, 'stem_u8_s2d', False)),
        class_names=tuple(classes),
        conf_threshold=args.conf, iou_threshold=args.iou)
    detector = YOLOCLIPDetector(model_path=args.model, config=cfg,
                                vocab_path=args.vocab or None)
    if args.int8:
        if not args.calib_dir:
            raise SystemExit('--int8 needs --calib-dir (a directory of '
                             'representative images for activation '
                             'calibration)')
        import os
        exts = ('.jpg', '.jpeg', '.png')
        paths = sorted(
            os.path.join(args.calib_dir, f)
            for f in os.listdir(args.calib_dir)
            if f.lower().endswith(exts))[:16]
        if not paths:
            raise SystemExit(f'no jpg/png files in {args.calib_dir}')
        from yoloclip_tpu.data.coco import _imread_rgb
        batch = []
        for p in paths:
            canvas, _ = detector._host_letterbox(_imread_rgb(p))
            batch.append(canvas)
        detector.quantize_int8(np.stack(batch))
        logger.info('int8 deploy path calibrated on %d images', len(batch))
    mesh = None
    spatial = max(int(getattr(args, 'spatial', 1) or 1), 1)
    if args.devices:
        import jax

        from yoloclip_tpu.parallel.mesh import create_mesh
        n = (len(jax.devices()) if args.devices == 'auto'
             else int(args.devices))
        if n % spatial:
            raise SystemExit(f'--spatial {spatial} must divide the device '
                             f'count ({n})')
        if n > 1:
            mesh = create_mesh(n_data=n // spatial, n_model=spatial)
            logger.info('serving over a %s mesh%s', dict(mesh.shape),
                        (' (height axis spatially partitioned '
                         f'{spatial}-way)') if spatial > 1 else '')
    elif spatial > 1:
        raise SystemExit('--spatial needs --devices')
    return DetectionServer(detector, max_batch=args.max_batch,
                           max_delay_ms=args.max_delay_ms,
                           mesh=mesh, spatial=spatial > 1,
                           bucket_batches=not args.no_bucket), detector


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description='HTTP detection service (micro-batching)')
    ap.add_argument('--model', default=None, help='checkpoint dir')
    ap.add_argument('--classes', default=None,
                    help='comma-separated class names (default COCO-80)')
    ap.add_argument('--vocab', default=None, help='offline vocabulary JSON')
    ap.add_argument('--variant', default='n')
    ap.add_argument('--image-size', type=int, default=640)
    ap.add_argument('--conf', type=float, default=0.25)
    ap.add_argument('--iou', type=float, default=0.45)
    ap.add_argument('--int8', action='store_true',
                    help='serve the W8A8 deploy configuration')
    ap.add_argument('--calib-dir', default=None,
                    help='directory of images for int8 calibration')
    ap.add_argument('--max-batch', type=int, default=32)
    ap.add_argument('--max-delay-ms', type=float, default=5.0)
    ap.add_argument('--stem-u8-s2d', action='store_true',
                    help='serve the uint8 space-to-depth stem layout '
                         '(letterbox_batch_u8_s2d input; /255 folded into '
                         'the stem kernel). Measured guidance: WINS at '
                         'bs>=256 int8 (+2.4%%, the reference-exact peak), '
                         'LOSES at bs=32 (-4.5%%) -- use with '
                         '--max-batch 256+ deployments only '
                         '(benchmarks/RESULTS.md config 26)')
    ap.add_argument('--no-bucket', action='store_true',
                    help='always dispatch max_batch-shaped batches instead '
                         'of padding to the smallest power-of-two bucket '
                         '(one executable instead of log2(max_batch)+1)')
    ap.add_argument('--devices', default=None,
                    help="shard batches over N chips ('auto' = all); "
                         'requests are data-parallel')
    ap.add_argument('--spatial', type=int, default=1, metavar='M',
                    help='additionally split each frame\'s HEIGHT M-way '
                         'over the mesh (latency scaling; XLA inserts the '
                         'conv halo exchanges). M must divide --devices; '
                         'batches then shard over devices/M')
    ap.add_argument('--host', default='127.0.0.1')
    ap.add_argument('--port', type=int, default=8000)
    args = ap.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    server, detector = build_server(args)
    # pre-compile EVERY bucket program so no live request ever pays an
    # XLA compile (minutes on a cold remote backend)
    server.warmup()
    server.reset_stats()   # don't let the compile latency skew /stats
    logger.info('serving %d classes (%s, %s) on %s:%d',
                len(detector.class_names), args.variant,
                'int8' if args.int8 else 'bf16', args.host, args.port)

    httpd = ThreadingHTTPServer((args.host, args.port),
                                make_handler(server))

    import signal
    signal.signal(signal.SIGTERM,
                  lambda *_: threading.Thread(target=httpd.shutdown,
                                              daemon=True).start())
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.shutdown()
        httpd.server_close()
        server.close()   # drains queued requests before stopping
        logger.info('drained and stopped: %s', server.stats())
    return 0


if __name__ == '__main__':
    raise SystemExit(main())
