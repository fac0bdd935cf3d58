"""Real-time multi-stream detection runtime.

No reference equivalent (the reference is single-image only); this is
BASELINE.md config 5 (N x 1080p streams, >= 30 fps/stream) built TPU-first:

  * All N streams step together as ONE jitted program: batched device-side
    letterbox (uint8 in -- the only host->device transfer), model forward,
    batched fixed-shape NMS.
  * A pipeline thread overlaps host frame acquisition with device compute:
    while the device chews batch k, the host assembles batch k+1
    (double buffering).
  * Multi-chip: pass a Mesh and frames shard over the 'data' axis (streams
    are embarrassingly data-parallel; XLA partitions the whole pipeline).
"""

from __future__ import annotations

import queue
import threading
import time
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from yoloclip_tpu.config import InferenceConfig, ModelConfig
from yoloclip_tpu.models.yolo_clip import YOLOCLIP
from yoloclip_tpu.ops.nms import batched_nms
from yoloclip_tpu.ops.preprocess import letterbox_batch, rescale_boxes


class StreamingDetector:
    def __init__(self, variables, text_embeddings,
                 n_streams: int,
                 frame_hw: Tuple[int, int] = (1080, 1920),
                 config: Optional[InferenceConfig] = None,
                 mesh=None):
        self.cfg = config or InferenceConfig()
        self.model = YOLOCLIP(self.cfg.model)
        self.n_streams = n_streams
        self.frame_hw = frame_hw
        self.variables = variables
        self.text = jnp.asarray(text_embeddings)
        self.mesh = mesh

        model = self.model
        target = self.cfg.model.image_size
        conf, iou = self.cfg.conf_threshold, self.cfg.iou_threshold
        topk, max_det = self.cfg.nms_topk, self.cfg.max_detections
        fh, fw = frame_hw

        fused = (getattr(self.cfg, 'fused_similarity', True)
                 and jax.default_backend() == 'tpu')

        def _step(variables, frames, text):
            canvases, scale = letterbox_batch(frames, target)
            out = model.apply(variables, canvases, text, fused_scores=fused)
            boxes = rescale_boxes(out['boxes'], scale, (fh, fw))
            return batched_nms(boxes, out['scores'],
                               out['class_ids'], conf, iou,
                               topk=topk, max_detections=max_det)

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            data1 = NamedSharding(mesh, P('data'))
            self._frame_sharding = data1
            self._step = jax.jit(
                _step,
                in_shardings=(NamedSharding(mesh, P()), data1,
                              NamedSharding(mesh, P())))
        else:
            self._frame_sharding = None
            self._step = jax.jit(_step)

    def step(self, frames: np.ndarray) -> Dict[str, np.ndarray]:
        """frames: (n_streams, H, W, 3) uint8 -> batched NMS dict."""
        f = jnp.asarray(frames)
        if self._frame_sharding is not None:
            f = jax.device_put(f, self._frame_sharding)
        return self._step(self.variables, f, self.text)

    def run(self, frame_source: Callable[[int], Optional[np.ndarray]],
            on_result: Callable[[int, Dict], None],
            max_steps: Optional[int] = None) -> Dict[str, float]:
        """Pipelined loop: overlap host frame acquisition with device compute.

        frame_source(step) -> (n_streams, H, W, 3) uint8 or None to stop.
        on_result(step, nms_dict_numpy) consumes results.
        Returns timing stats {steps, mean_step_ms, fps_per_stream}.
        """
        q: 'queue.Queue' = queue.Queue(maxsize=2)
        stop = threading.Event()

        def producer():
            k = 0
            while not stop.is_set():
                if max_steps is not None and k >= max_steps:
                    break
                frames = frame_source(k)
                if frames is None:
                    break
                q.put((k, frames))
                k += 1
            q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        times: List[float] = []
        pending: Optional[Tuple[int, Dict]] = None
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                k, frames = item
                t0 = time.perf_counter()
                out = self.step(frames)
                if pending is not None:       # drain previous (overlapped)
                    pk, pout = pending
                    on_result(pk, {kk: np.asarray(vv)
                                   for kk, vv in pout.items()})
                pending = (k, out)
                jax.block_until_ready(out['count'])
                times.append(time.perf_counter() - t0)
        finally:
            stop.set()
        if pending is not None:
            pk, pout = pending
            on_result(pk, {kk: np.asarray(vv) for kk, vv in pout.items()})
        mean = float(np.mean(times)) if times else float('nan')
        return {'steps': len(times), 'mean_step_ms': mean * 1000,
                'fps_per_stream': (1.0 / mean) if times else 0.0}
