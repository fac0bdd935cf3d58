"""Shape/contract tests for backbone, neck, heads, and the composite model.

Golden shape facts from SURVEY.md §2.3: variant 'n' channels [16,32,64,128,
256], backbone outputs [64,128,256] at strides 8/16/32, 8400 anchors @640.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yoloclip_tpu.config import ModelConfig
from yoloclip_tpu.models import YOLOCLIP, YOLOv8Backbone, RepVLPAN
from yoloclip_tpu.models.heads import decode_boxes, dfl_expectation

KEY = jax.random.PRNGKey(0)


def test_variant_channel_table():
    assert ModelConfig(backbone_variant='n').feature_channels() == [64, 128, 256]
    assert ModelConfig(backbone_variant='s').feature_channels() == [128, 256, 512]
    assert ModelConfig(backbone_variant='m').feature_channels() == [192, 384, 768]
    assert ModelConfig(backbone_variant='l').feature_channels() == [256, 512, 1024]
    assert ModelConfig(backbone_variant='n').backbone_depths() == [1, 1, 1, 2]
    assert ModelConfig(backbone_variant='l').backbone_depths() == [1, 2, 4, 8]
    assert ModelConfig().num_anchors() == 8400


@pytest.mark.parametrize('variant', ['n', 's'])
def test_backbone_shapes(variant):
    cfg = ModelConfig(backbone_variant=variant)
    bb = YOLOv8Backbone(variant)
    x = jnp.zeros((1, 128, 128, 3))
    variables = bb.init(KEY, x)
    c3, c4, c5 = bb.apply(variables, x)
    fc = cfg.feature_channels()
    assert c3.shape == (1, 16, 16, fc[0])
    assert c4.shape == (1, 8, 8, fc[1])
    assert c5.shape == (1, 4, 4, fc[2])


@pytest.mark.parametrize('variant', ['n', 's'])
def test_neck_shapes_all_variants(variant):
    # The reference neck crashes for s/m/l (hard-coded 'n' projections,
    # SURVEY bug #7); the rebuild must work for every variant.
    cfg = ModelConfig(backbone_variant=variant)
    fc = tuple(cfg.feature_channels())
    neck = RepVLPAN(fc, fc, 512, 2)
    feats = [jnp.zeros((2, 16, 16, fc[0])), jnp.zeros((2, 8, 8, fc[1])),
             jnp.zeros((2, 4, 4, fc[2]))]
    text = jnp.zeros((2, 7, 512))
    variables = neck.init(KEY, feats, text)
    pan, txt = neck.apply(variables, feats, text)
    assert [p.shape for p in pan] == [(2, 16, 16, fc[0]), (2, 8, 8, fc[1]),
                                      (2, 4, 4, fc[2])]
    assert txt.shape == (2, 7, 512)


def test_dfl_decode_matches_numpy_reference():
    """decode_boxes must reproduce the reference math exactly
    (softmax-expectation + exp-wh, `box_head.py:179-214`)."""
    rng = np.random.RandomState(1)
    reg_max, H, W, stride = 16, 4, 5, 8
    raw = rng.randn(2, H, W, 4 * (reg_max + 1)).astype(np.float32)

    # independent numpy re-derivation of the reference math
    p = raw.reshape(2, H, W, 4, reg_max + 1)
    p = np.exp(p - p.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    reg = (p * np.arange(reg_max + 1)).sum(-1)        # (2,H,W,4)
    gy, gx = np.mgrid[0:H, 0:W]
    cx = (gx[None] + reg[..., 0]) * stride
    cy = (gy[None] + reg[..., 1]) * stride
    w = np.exp(reg[..., 2]) * stride
    h = np.exp(reg[..., 3]) * stride
    want = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                    axis=-1).reshape(2, H * W, 4)

    got = np.asarray(decode_boxes([jnp.asarray(raw)], [stride], reg_max))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_dfl_expectation_range():
    x = jnp.asarray(np.random.RandomState(2).randn(1, 2, 2, 68), jnp.float32)
    e = dfl_expectation(x, 16)
    assert e.shape == (1, 2, 2, 4)
    assert bool(jnp.all(e >= 0)) and bool(jnp.all(e <= 16))


def test_composite_model_contract():
    cfg = ModelConfig(image_size=(160, 160))
    model = YOLOCLIP(cfg)
    B, C = 2, 5
    images = jnp.zeros((B, 160, 160, 3))
    text = jax.random.normal(KEY, (C, 512))
    variables = model.init(KEY, images, text)
    out = model.apply(variables, images, text)

    A = cfg.num_anchors()   # 400 + 100 + 25 = 525 at 160x160
    assert A == 525
    assert out['boxes'].shape == (B, A, 4)
    assert out['scores'].shape == (B, A)
    assert out['class_ids'].shape == (B, A)
    assert out['obj_embeddings'].shape == (B, A, 512)
    assert out['text_embeddings'].shape == (B, C, 512)
    assert out['similarity'].shape == (B, A, C)
    assert len(out['box_preds']) == 3
    # scores are raw cosine similarities (SURVEY §2.3): bounded by alpha*1+beta
    assert bool(jnp.all(out['scores'] <= 1.0 + 1e-5))
    assert bool(jnp.all(out['scores'] >= -1.0 - 1e-5))
    # class_ids index valid classes
    assert bool(jnp.all(out['class_ids'] < C))


def test_composite_model_class_mask():
    cfg = ModelConfig(image_size=(160, 160))
    model = YOLOCLIP(cfg)
    images = jax.random.uniform(KEY, (1, 160, 160, 3))
    text = jax.random.normal(KEY, (8, 512))
    mask = jnp.array([True] * 5 + [False] * 3)
    variables = model.init(KEY, images, text)
    out = model.apply(variables, images, text, class_mask=mask)
    # masked classes can never win argmax
    assert bool(jnp.all(out['class_ids'] < 5))


def test_composite_model_jits_and_batches():
    cfg = ModelConfig(image_size=(160, 160))
    model = YOLOCLIP(cfg)
    images = jnp.zeros((2, 160, 160, 3))
    text = jnp.zeros((2, 4, 512))  # per-sample (online) vocabulary
    variables = model.init(KEY, images, text)
    fwd = jax.jit(lambda v, i, t: model.apply(v, i, t))
    out = fwd(variables, images, text)
    assert out['boxes'].shape == (2, 525, 4)


def test_composite_model_fused_scores_matches_einsum():
    """fused_scores=True (Pallas streaming max) must reproduce the einsum
    path's scores/class_ids for EVERY batch element. Images are distinct
    per element so the I-Pooling-updated text embeddings differ per image
    -- scoring any element against another's text must fail this test."""
    cfg = ModelConfig(image_size=(160, 160))
    model = YOLOCLIP(cfg)
    images = jax.random.uniform(KEY, (3, 160, 160, 3))
    text = jax.random.normal(KEY, (7, 512))
    variables = model.init(KEY, images, text)
    ref = model.apply(variables, images, text)
    got = model.apply(variables, images, text, fused_scores=True)
    assert 'similarity' not in got
    # per-image text really varies (otherwise the test proves nothing)
    t = np.asarray(ref['text_embeddings'])
    assert np.abs(t[0] - t[1]).max() > 0
    # accumulation-order fp32 noise only on the cosine scale
    np.testing.assert_allclose(np.asarray(got['scores']),
                               np.asarray(ref['scores']),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got['class_ids']),
                                  np.asarray(ref['class_ids']))
