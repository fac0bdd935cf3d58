"""Host data-pipeline benchmark: native C++ loader vs cv2 vs PIL.

The TPU consumes ~660 train images/sec at bs=64 (RESULTS.md config 4); the
host pipeline must decode+letterbox at least that fast or the chip starves.
Synthesizes a COCO-sized JPEG set, then measures decode+letterbox
throughput for each backend. Prints one JSON line per backend.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_images(n=64, hw=(480, 640)):
    import cv2
    d = tempfile.mkdtemp(prefix='ycl_bench_')
    rng = np.random.RandomState(0)
    paths = []
    for i in range(n):
        img = (rng.rand(*hw, 3) * 255).astype(np.uint8)
        p = os.path.join(d, f'{i:04d}.jpg')
        cv2.imwrite(p, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        paths.append(p)
    return paths


def emit(name, ips):
    print(json.dumps({'metric': f'dataload_{name}', 'value': round(ips, 1),
                      'unit': 'images/sec',
                      'vs_baseline': round(ips / 660.0, 3)}))


def main():
    paths = make_images()
    target = (640, 640)
    reps = 5

    from yoloclip_tpu import native
    if native.available():
        native.load_batch(paths[:4], target)    # warm the thread pool
        t0 = time.perf_counter()
        for _ in range(reps):
            _, _, nfail = native.load_batch(paths, target)
        assert nfail == 0
        emit('native_parallel', len(paths) * reps
             / (time.perf_counter() - t0))

        t0 = time.perf_counter()
        for _ in range(reps):
            for p in paths:
                native.letterbox_u8(native.decode_image(p), target)
        emit('native_serial', len(paths) * reps / (time.perf_counter() - t0))

    try:
        import cv2
        t0 = time.perf_counter()
        for _ in range(reps):
            for p in paths:
                img = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
                h, w = img.shape[:2]
                s = min(target[0] / h, target[1] / w)
                r = cv2.resize(img, (int(w * s), int(h * s)))
                canvas = np.zeros((*target, 3), np.uint8)
                canvas[:r.shape[0], :r.shape[1]] = r
        emit('cv2_serial', len(paths) * reps / (time.perf_counter() - t0))
    except ImportError:
        pass

    try:
        from PIL import Image
        t0 = time.perf_counter()
        for _ in range(reps):
            for p in paths:
                img = np.asarray(Image.open(p).convert('RGB'))
        emit('pil_decode_only', len(paths) * reps
             / (time.perf_counter() - t0))
    except ImportError:
        pass


if __name__ == '__main__':
    main()
