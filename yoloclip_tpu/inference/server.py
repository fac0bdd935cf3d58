"""Micro-batching serving front-end.

No reference equivalent (the reference serves one image per call and
re-encodes CLIP text inside every forward, `model/yolo_clip.py:130-165`).
Production detectors receive SINGLE images from many concurrent clients,
but the chip earns its throughput at bs~32 (benchmarks/RESULTS.md: ~1.9k
img/s at bs=32 int8 vs a few hundred at bs=1). This runtime closes that
gap: requests queue, a dispatcher flushes a batch when it reaches
`max_batch` or the OLDEST queued request has waited `max_delay_ms`, the
batch runs as ONE jitted fixed-shape program, and per-request futures
resolve with the standard detection-dict list (same schema as
`YOLOCLIPDetector.detect`).

TPU-first design:
  * Mixed client resolutions: each request is letterboxed on the HOST
    (native C++ loader / cv2 / numpy fallback) to the fixed model canvas,
    so ONE compiled program serves every input size -- a device-letterbox
    design would retrace per unique (H, W).
  * Partial batches PAD to the smallest power-of-two BUCKET that holds
    them (XLA static shapes only; jit caches one executable per bucket
    size, `warmup()` pre-compiles them all) -- the canvas upload and the
    device program scale with actual occupancy instead of always paying
    max_batch. Mean occupancy and mean bucket size are reported in
    `stats()` so operators can see the residual padding tax.
  * Two pipeline threads: the dispatcher assembles + dispatches batch k+1
    while the completer fetches batch k (double buffering; dispatch is
    async, the ONE packed device->host fetch per batch amortizes the
    ~30 ms tunnel RTT over every request in it).
  * Vocabulary hot-swap between batches is free: the text matrix is a
    plain input to the jitted program (`set_vocabulary` encodes once,
    swaps the device array, no retrace -- bench_suite config 21).
"""

from __future__ import annotations

import logging
import queue
import threading
import time
from concurrent.futures import Future
from typing import Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from yoloclip_tpu.ops.nms import batched_nms

logger = logging.getLogger(__name__)

_SENTINEL = object()


class _Request:
    __slots__ = ('canvas', 'scale', 'orig_wh', 'names', 'future', 't_enq')

    def __init__(self, canvas, scale, orig_wh, names, future):
        self.canvas = canvas
        self.scale = scale
        self.orig_wh = orig_wh
        self.names = names
        self.future = future
        self.t_enq = time.perf_counter()


class DetectionServer:
    """Micro-batching wrapper around a (possibly int8-quantized)
    `YOLOCLIPDetector`. Thread-safe: any number of client threads may
    call `submit` / `detect` concurrently.

    Serving mode is fixed-vocabulary (the detector's offline vocabulary);
    swap it atomically with `set_vocabulary` -- takes effect on the next
    batch at zero graph cost. Per-request prompt lists would shatter
    batching; use `YOLOCLIPDetector.detect(..., text_prompts=...)` for
    ad-hoc prompts instead.
    """

    def __init__(self, detector, max_batch: int = 32,
                 max_delay_ms: float = 5.0,
                 queue_capacity: int = 1024,
                 mesh=None, spatial: bool = False,
                 bucket_batches: bool = True):
        if detector.offline_vocabulary is None:
            raise ValueError(
                'DetectionServer needs a detector with an offline '
                'vocabulary (pass class_names= / vocab_path= to '
                'YOLOCLIPDetector, or call set_offline_vocabulary)')
        if max_batch < 1:
            raise ValueError(f'max_batch must be >= 1, got {max_batch}')
        if mesh is not None and max_batch % mesh.shape['data'] != 0:
            raise ValueError(
                f"max_batch ({max_batch}) must divide evenly over the "
                f"mesh's 'data' axis ({mesh.shape['data']})")
        if spatial and mesh is None:
            raise ValueError('spatial=True needs a mesh with a "model" '
                             'axis to shard image height over')
        self.mesh = mesh
        self.spatial = bool(spatial)
        self.detector = detector
        self.max_batch = int(max_batch)
        self.max_delay_s = float(max_delay_ms) / 1000.0
        # Bucketed dispatch: a partial batch pads only to the smallest
        # power-of-two bucket that holds it, not to max_batch -- the
        # host->device canvas upload AND the device program scale with
        # actual occupancy instead of the worst case (XLA still sees
        # static shapes: jit caches ONE executable per bucket size).
        # Under a mesh, every bucket must divide evenly over the 'data'
        # axis, so the smallest bucket is the axis size itself.
        if bucket_batches:
            lo = mesh.shape['data'] if mesh is not None else 1
            b, buckets = lo, []
            while b < self.max_batch:
                buckets.append(b)
                b *= 2
            self._buckets = buckets + [self.max_batch]
        else:
            self._buckets = [self.max_batch]
        self._queue: queue.Queue = queue.Queue(maxsize=queue_capacity)
        # ONE attribute so a hot-swap is atomic for the dispatcher's read
        self._vocab: Tuple[jax.Array, List[str]] = (
            detector.offline_vocabulary, list(detector.class_names))
        self._run = self._build_batched_canvas_fn()

        # stats (guarded by _stats_lock)
        self._stats_lock = threading.Lock()
        self._n_requests = 0
        self._n_batches = 0
        self._occupancy_sum = 0
        self._bucket_sum = 0
        self._latencies: List[float] = []

        self._closed = False
        # serializes the closed-check+enqueue in submit() against close()
        # setting _closed: without it a submitter that passed the check
        # could enqueue AFTER close() drained the queue, leaving its
        # Future unresolved forever
        self._submit_lock = threading.Lock()
        # dispatcher -> completer hand-off; maxsize=2 gives double
        # buffering (assemble k+1 while the device chews k) without
        # letting unfetched device results pile up
        self._inflight: queue.Queue = queue.Queue(maxsize=2)
        self._dispatcher = threading.Thread(target=self._dispatch_loop,
                                            daemon=True,
                                            name='yoloclip-serve-dispatch')
        self._completer = threading.Thread(target=self._complete_loop,
                                           daemon=True,
                                           name='yoloclip-serve-complete')
        self._dispatcher.start()
        self._completer.start()

    # ------------------------------------------------------------------
    # jitted program: fixed (max_batch, th, tw, 3) canvases in, packed
    # (max_batch, max_det + 1, 6) detections out
    # ------------------------------------------------------------------
    def _build_batched_canvas_fn(self):
        det = self.detector
        model = det.model
        topk = det.config.nms_topk
        max_det = det.config.max_detections
        fused = det._use_fused_similarity()
        agnostic = getattr(det.config, 'class_agnostic_nms', True)
        u8_s2d = getattr(det.model_cfg, 'stem_u8_s2d', False)

        def run(variables, canvases_u8, text, scales, orig_whs,
                conf_threshold, iou_threshold):
            if u8_s2d:
                # cfg.model.stem_u8_s2d: the model consumes the 0..255
                # uint8 space-to-depth canvas directly (the stem folds the
                # /255 into its kernel) -- same device-side rearrange as
                # detector._build_detect_canvas_fn; the host letterbox and
                # the (B, th, tw, 3) upload layout are unchanged
                from yoloclip_tpu.ops.preprocess import _s2d
                canv = _s2d(canvases_u8)
            else:
                canv = canvases_u8.astype(jnp.float32) / 255.0
            out = model.apply(variables, canv, text, fused_scores=fused)
            boxes = out['boxes'] / scales[:, None, None]
            hi = jnp.concatenate([orig_whs, orig_whs], axis=-1)  # (B, 4)
            boxes = jnp.clip(boxes, 0.0, hi[:, None, :])
            o = batched_nms(boxes, out['scores'], out['class_ids'],
                            conf_threshold, iou_threshold, topk=topk,
                            max_detections=max_det,
                            class_agnostic=agnostic)
            # slot layout owned by detector._pack_detections (batched via
            # its leading-dim polymorphism) -- one definition, no drift
            from yoloclip_tpu.inference.detector import _pack_detections
            return _pack_detections(o)

        if self.mesh is not None:
            # batch rows shard over 'data' (requests are embarrassingly
            # data-parallel); params/text replicate -- same recipe as
            # inference/streaming.py. spatial=True additionally splits
            # each frame's HEIGHT over 'model' (GSPMD halo exchange; see
            # parallel/spatial.py) -- throughput x latency scaling.
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P
            repl = NamedSharding(self.mesh, P())
            data1 = NamedSharding(self.mesh, P('data'))
            canv_sh = (NamedSharding(self.mesh, P('data', 'model',
                                                  None, None))
                       if self.spatial else data1)
            return jax.jit(run, in_shardings=(
                jax.tree_util.tree_map(lambda _: repl, det.variables),
                canv_sh, repl, data1, data1, repl, repl))
        return jax.jit(run)

    # ------------------------------------------------------------------
    # client API
    # ------------------------------------------------------------------
    def submit(self, image: Union[str, np.ndarray]) -> Future:
        """Enqueue one image; returns a Future resolving to the detection
        list. Host letterbox happens on the CALLING thread so N clients
        parallelize their own preprocessing."""
        if self._closed:
            raise RuntimeError('DetectionServer is closed')
        if isinstance(image, str):
            from yoloclip_tpu.inference.detector import _imread_rgb
            image = _imread_rgb(image)
        image = np.asarray(image)
        fut: Future = Future()
        if image.ndim != 3 or image.shape[-1] != 3:
            fut.set_exception(ValueError(
                f'expected (H, W, 3) image, got shape {image.shape}'))
            return fut
        h, w = image.shape[:2]
        canvas, scale = self.detector._host_letterbox(
            image.astype(np.uint8))
        req = _Request(canvas, float(scale),
                       np.asarray([w, h], np.float32),
                       self._vocab[1], fut)
        with self._submit_lock:      # vs close(): no enqueue after drain
            if self._closed:
                raise RuntimeError('DetectionServer is closed')
            self._queue.put(req)
        return fut

    def detect(self, image: Union[str, np.ndarray],
               timeout: Optional[float] = None) -> List[Dict]:
        """Synchronous convenience: submit + wait."""
        return self.submit(image).result(timeout=timeout)

    def set_vocabulary(self, class_names: Sequence[str]) -> None:
        """Encode a new vocabulary ONCE and swap it in atomically; the
        next dispatched batch scores against it (no retrace as long as
        the class count is unchanged; a different count compiles one new
        program for the new (C, E) shape and is then cached)."""
        text = self.detector.vocab_builder.build_online_vocabulary(
            class_names)
        # single assignment keeps (text, names) consistent for readers
        self._vocab = (jnp.asarray(text), list(class_names))

    def stats(self) -> Dict[str, float]:
        with self._stats_lock:
            lat = sorted(self._latencies)
            n = len(lat)
            return {
                'requests': self._n_requests,
                'batches': self._n_batches,
                'mean_occupancy': (self._occupancy_sum / self._n_batches
                                   if self._n_batches else 0.0),
                'mean_bucket': (self._bucket_sum / self._n_batches
                                if self._n_batches else 0.0),
                'p50_latency_ms': lat[n // 2] * 1000 if n else 0.0,
                'p95_latency_ms': lat[int(n * 0.95)] * 1000 if n else 0.0,
                'queue_depth': self._queue.qsize(),
            }

    def reset_stats(self) -> None:
        """Zero the counters (e.g. after warmup, so the first request's
        XLA compile doesn't skew latency percentiles)."""
        with self._stats_lock:
            self._n_requests = 0
            self._n_batches = 0
            self._occupancy_sum = 0
            self._bucket_sum = 0
            self._latencies = []

    def warmup(self) -> None:
        """Compile every bucket program before serving (one dummy batch
        per bucket size, smallest first). Without this the first request
        that lands in a new bucket pays its XLA compile inline -- a
        multi-second latency spike production servers must not take on a
        live request. Blocks until every executable is built."""
        th, tw = self.detector.image_size
        text, _ = self._vocab
        for b in self._buckets:
            packed = self._run(
                self.detector.variables,
                jnp.zeros((b, th, tw, 3), jnp.uint8), text,
                jnp.ones((b,), jnp.float32),
                jnp.ones((b, 2), jnp.float32),
                jnp.float32(self.detector.conf_threshold),
                jnp.float32(self.detector.iou_threshold))
        np.asarray(packed)      # sync: the last compile has finished

    def close(self, timeout: float = 30.0) -> None:
        """Drain the queue, stop both pipeline threads. Idempotent."""
        with self._submit_lock:
            if self._closed:
                return
            self._closed = True
            self._queue.put(_SENTINEL)
        self._dispatcher.join(timeout=timeout)
        self._completer.join(timeout=timeout)
        # fail anything that raced past the closed check after the sentinel
        while True:
            try:
                req = self._queue.get_nowait()
            except queue.Empty:
                break
            if req is not _SENTINEL:
                req.future.set_exception(
                    RuntimeError('DetectionServer closed before dispatch'))

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    # ------------------------------------------------------------------
    # pipeline threads
    # ------------------------------------------------------------------
    def _collect_batch(self) -> Tuple[List[_Request], bool]:
        """Block for the first request, then gather until the batch is
        full or the first request's max_delay deadline passes."""
        first = self._queue.get()
        if first is _SENTINEL:
            return [], True
        reqs = [first]
        deadline = time.perf_counter() + self.max_delay_s
        while len(reqs) < self.max_batch:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            try:
                nxt = self._queue.get(timeout=remaining)
            except queue.Empty:
                break
            if nxt is _SENTINEL:
                return reqs, True
            reqs.append(nxt)
        return reqs, False

    def _dispatch_loop(self):
        th, tw = self.detector.image_size
        while True:
            reqs, stop = self._collect_batch()
            if reqs:
                n = len(reqs)
                b = next(s for s in self._buckets if s >= n)
                canv = np.zeros((b, th, tw, 3), np.uint8)
                scales = np.ones((b,), np.float32)
                whs = np.ones((b, 2), np.float32)
                for i, r in enumerate(reqs):
                    canv[i] = r.canvas
                    scales[i] = r.scale
                    whs[i] = r.orig_wh
                text, names = self._vocab
                try:
                    packed = self._run(
                        self.detector.variables, jnp.asarray(canv), text,
                        jnp.asarray(scales), jnp.asarray(whs),
                        jnp.float32(self.detector.conf_threshold),
                        jnp.float32(self.detector.iou_threshold))
                except Exception as e:   # fail the whole batch, keep serving
                    logger.exception('batch dispatch failed')
                    for r in reqs:
                        r.future.set_exception(e)
                else:
                    for r in reqs:
                        r.names = names
                    # batch counters BEFORE the completer can resolve the
                    # futures: a client waking from future.result() and
                    # calling stats() must see its own batch counted
                    with self._stats_lock:
                        self._n_batches += 1
                        self._occupancy_sum += n
                        self._bucket_sum += b
                    self._inflight.put((packed, reqs))
            if stop:
                self._inflight.put(_SENTINEL)
                return

    def _complete_loop(self):
        while True:
            item = self._inflight.get()
            if item is _SENTINEL:
                return
            packed_dev, reqs = item
            try:
                packed = np.asarray(packed_dev)  # ONE fetch per batch
            except Exception as e:
                for r in reqs:
                    r.future.set_exception(e)
                continue
            now = time.perf_counter()
            # Stats BEFORE resolving futures: a client waking from
            # future.result() must observe its own request in stats().
            with self._stats_lock:
                self._n_requests += len(reqs)
                self._latencies.extend(now - r.t_enq for r in reqs)
                if len(self._latencies) > 10000:
                    del self._latencies[:-5000]
            from yoloclip_tpu.inference.detector import _unpack_detections
            for i, r in enumerate(reqs):
                dets, saturated = _unpack_detections(packed[i], r.names)
                if saturated:
                    logger.warning(
                        'NMS prefilter saturated for a request: raise '
                        'config.nms_topk or the confidence threshold')
                r.future.set_result(dets)
