"""End-to-end learning test: overfit white squares, detect them.

The strongest functional check the suite has: 120 clean-mode train steps
on 4 synthetic images must yield a detector that -- through the REAL
inference path (conf 0.25 on the raw-cosine scale + NMS) -- finds exactly
the square in each image with correct class and IoU >= 0.5. Exercises
assignment, the BCE region-text objective (fg above / bg below the deploy
threshold), CIoU + DFL regression, BN statistics, and NMS together.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yoloclip_tpu.config import ModelConfig, TrainingConfig
from yoloclip_tpu.models.yolo_clip import YOLOCLIP
from yoloclip_tpu.ops.boxes import pairwise_iou
from yoloclip_tpu.ops.nms import batched_nms
from yoloclip_tpu.train.train_state import (create_train_state,
                                            make_train_step,
                                            set_learning_rate)


@pytest.mark.slow
def test_overfit_squares_then_detect():
    mcfg = ModelConfig(image_size=(128, 128))
    cfg = TrainingConfig(model=mcfg, max_objects=4, batch_size=4,
                         assigner='topk_center')
    model = YOLOCLIP(mcfg)
    rng = jax.random.PRNGKey(0)

    B = 4
    img = np.zeros((B, 128, 128, 3), np.float32)
    boxes = np.zeros((B, 4, 4), np.float32)
    cids = np.zeros((B, 4), np.int32)
    valid = np.zeros((B, 4), bool)
    rs = np.random.RandomState(0)
    for b in range(B):
        x0, y0 = rs.randint(10, 60), rs.randint(10, 60)
        w, h = rs.randint(30, 50), rs.randint(30, 50)
        img[b, y0:y0 + h, x0:x0 + w] = 1.0
        boxes[b, 0] = [x0, y0, x0 + w, y0 + h]
        valid[b, 0] = True
    batch = {'images': jnp.asarray(img), 'boxes': jnp.asarray(boxes),
             'class_ids': jnp.asarray(cids), 'valid_mask': jnp.asarray(valid)}
    text = jax.random.normal(rng, (2, 512))
    text = text / jnp.linalg.norm(text, axis=-1, keepdims=True)
    textb = jnp.broadcast_to(text[None], (B, 2, 512))

    state = create_train_state(model, cfg, rng,
                               jnp.zeros((1, 128, 128, 3)),
                               jnp.zeros((2, 512)))
    step = jax.jit(make_train_step(cfg))
    state = set_learning_rate(state, 2e-3)
    _, first = step(state, batch, textb)
    for _ in range(120):
        state, parts = step(state, batch, textb)
    assert float(parts['loss']) < 0.25 * float(first['loss'])

    out = model.apply({'params': state.params,
                       'batch_stats': state.batch_stats},
                      batch['images'], text)
    det = batched_nms(out['boxes'], out['scores'], out['class_ids'],
                      0.25, 0.45, topk=256, max_detections=8)
    for b in range(B):
        n = int(det['count'][b])
        assert n == 1, f'image {b}: expected 1 detection, got {n}'
        assert int(det['class_ids'][b][0]) == 0
        iou = float(pairwise_iou(det['boxes'][b][:1],
                                 jnp.asarray(boxes[b, 0:1]))[0, 0])
        assert iou >= 0.5, f'image {b}: IoU {iou:.3f} < 0.5'
