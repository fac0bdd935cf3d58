"""Tests for the clean topk-center assigner and the clean combined loss."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yoloclip_tpu.config import ModelConfig, TrainingConfig
from yoloclip_tpu.train.assign import (anchor_points, assign_batch,
                                       assign_topk_center,
                                       dfl_targets_from_boxes)
from yoloclip_tpu.train.losses import combined_loss_clean, soft_dfl_loss


def test_anchor_points_order_and_count():
    cfg = ModelConfig(image_size=(160, 160))
    pts, strides = anchor_points(cfg.strides, cfg.image_size)
    assert pts.shape == (cfg.num_anchors(), 2)       # 525 @ 160
    assert strides.shape == (525,)
    # level-major: first 400 at stride 8, row-major
    np.testing.assert_allclose(np.asarray(pts[0]), [0, 0])
    np.testing.assert_allclose(np.asarray(pts[1]), [8, 0])
    np.testing.assert_allclose(np.asarray(pts[20]), [0, 8])
    assert float(strides[0]) == 8 and float(strides[-1]) == 32


def test_assign_positive_anchors_inside_gt():
    cfg = ModelConfig(image_size=(160, 160))
    pts, _ = anchor_points(cfg.strides, cfg.image_size)
    gt = jnp.asarray([[40., 40., 120., 120.], [0., 0., 0., 0.]])
    cls = jnp.asarray([3, 0])
    valid = jnp.asarray([True, False])
    out = assign_topk_center(pts, gt, cls, valid, topk=10)
    fg = np.asarray(out['fg_mask'])
    assert fg.sum() > 0
    # every positive anchor's point lies inside the (only valid) gt
    pos_pts = np.asarray(pts)[fg]
    assert (pos_pts >= 40).all() and (pos_pts <= 120).all()
    assert (np.asarray(out['cls_target'])[fg] == 3).all()
    # background labeled -1
    assert (np.asarray(out['cls_target'])[~fg] == -1).all()
    # invalid gt assigned nothing
    assert (np.asarray(out['gt_index'])[fg] == 0).all()


def test_assign_conflict_resolved_to_nearest():
    pts = jnp.asarray([[10., 10.], [30., 10.]])
    gt = jnp.asarray([[0., 0., 22., 20.], [18., 0., 40., 20.]])
    cls = jnp.asarray([1, 2])
    valid = jnp.asarray([True, True])
    out = assign_topk_center(pts, gt, cls, valid, topk=2)
    # anchor 0 center-nearest to gt0 (center 11,10), anchor 1 to gt1 (29,10)
    assert int(out['cls_target'][0]) == 1
    assert int(out['cls_target'][1]) == 2


def test_dfl_targets_invert_decode():
    """decode(dfl_targets(gt)) must reproduce gt (within clip bounds)."""
    pts = jnp.asarray([[80., 80.]])
    strides = jnp.asarray([8.0])
    gt = jnp.asarray([[70., 60., 110., 100.]])   # cx=90, cy=80, w=h=40
    t = dfl_targets_from_boxes(gt, pts, strides, 16)
    off_x, off_y, vw, vh = [float(t[0, i]) for i in range(4)]
    cx = (80 / 8 + off_x) * 8
    cy = (80 / 8 + off_y) * 8
    w = np.exp(vw) * 8
    h = np.exp(vh) * 8
    assert cx == pytest.approx(90, abs=1e-3)
    assert cy == pytest.approx(80, abs=1e-3)
    assert w == pytest.approx(40, rel=1e-4)
    assert h == pytest.approx(40, rel=1e-4)


def test_soft_dfl_loss_zero_when_confident_correct():
    nb = 17
    tgt = jnp.asarray([[3.0, 5.0, 7.0, 2.0]])
    logits = jax.nn.one_hot(tgt.astype(jnp.int32), nb) * 100.0
    loss_good = float(soft_dfl_loss(logits, tgt, jnp.asarray([True])))
    loss_bad = float(soft_dfl_loss(jnp.zeros_like(logits), tgt,
                                   jnp.asarray([True])))
    assert loss_good < loss_bad


def test_combined_loss_clean_trains():
    cfg = TrainingConfig(model=ModelConfig(image_size=(128, 128)),
                         assigner='topk_center', max_objects=5, batch_size=2)
    from yoloclip_tpu.models.yolo_clip import YOLOCLIP
    from yoloclip_tpu.train.train_state import (create_train_state,
                                                make_train_step,
                                                set_learning_rate)
    model = YOLOCLIP(cfg.model)
    rng = jax.random.PRNGKey(0)
    state = create_train_state(model, cfg, rng,
                               jnp.zeros((1, 128, 128, 3)),
                               jnp.zeros((4, 512)))
    state = set_learning_rate(state, 1e-3)
    npr = np.random.RandomState(0)
    B, M, C = 2, 5, 4
    xy = npr.rand(B, M, 2) * 60
    wh = npr.rand(B, M, 2) * 40 + 20
    batch = {
        'images': jnp.asarray(npr.rand(B, 128, 128, 3), jnp.float32),
        'boxes': jnp.asarray(np.concatenate([xy, xy + wh], -1), jnp.float32),
        'class_ids': jnp.asarray(npr.randint(0, C, (B, M)), jnp.int32),
        'valid_mask': jnp.ones((B, M), bool),
    }
    text = jnp.asarray(npr.randn(B, C, 512), jnp.float32)
    step = jax.jit(make_train_step(cfg))
    s, first = step(state, batch, text)
    assert float(first['num_fg']) > 0
    assert float(first['dfl_loss']) > 0        # REAL dfl term, not inert
    for _ in range(4):
        s, parts = step(s, batch, text)
    assert float(parts['loss']) < float(first['loss'])
