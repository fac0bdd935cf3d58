"""Reparameterized deploy mode: constant-folded vocabulary.

I-Pool is KEPT by default (round 4: dropping it on I-Pool-trained weights
measured 0.0 mAP -- every cosine score lands under the 0.25 confidence
threshold; ops/reparam.py docstring). skip_image_pool=True remains an
explicit opt-in and is pinned here for exactness."""

import numpy as np
import jax
import jax.numpy as jnp

from yoloclip_tpu.config import ModelConfig
from yoloclip_tpu.models.yolo_clip import YOLOCLIP
from yoloclip_tpu.ops.reparam import build_reparam_forward


def test_reparam_forward_default_is_exact():
    """The DEFAULT reparam graph (vocabulary constant-folded, I-Pool kept)
    must be numerically identical to the standard apply -- reparam is a
    compiler trick, not a math change."""
    cfg = ModelConfig(image_size=(128, 128))
    model = YOLOCLIP(cfg)
    rng = jax.random.PRNGKey(0)
    images = jax.random.uniform(rng, (1, 128, 128, 3))
    vocab = jax.random.normal(rng, (5, 512))
    vocab = vocab / jnp.linalg.norm(vocab, axis=-1, keepdims=True)
    variables = model.init(rng, images, vocab)

    fwd = build_reparam_forward(model, variables, vocab)
    out = fwd(images)
    assert out['boxes'].shape == (1, cfg.num_anchors(), 4)
    assert np.isfinite(np.asarray(out['scores'])).all()

    # rtol 2e-4: the jitted constant-folded graph fuses/reassociates
    # float ops differently from the eager apply -- same math, last-ulp
    # scale differences only (scores live on the [-1, 1] cosine scale)
    std = model.apply(variables, images, vocab)
    np.testing.assert_allclose(np.asarray(out['scores']),
                               np.asarray(std['scores']),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out['boxes']),
                               np.asarray(std['boxes']),
                               rtol=2e-4, atol=1e-3)


def test_reparam_forward_skip_ipool_opt_in():
    """skip_image_pool=True (opt-in, for models TRAINED without I-Pool)
    drops the image->text update: text passes through unmodified and the
    graph equals a manual skip apply."""
    cfg = ModelConfig(image_size=(128, 128))
    model = YOLOCLIP(cfg)
    rng = jax.random.PRNGKey(0)
    images = jax.random.uniform(rng, (1, 128, 128, 3))
    vocab = jax.random.normal(rng, (5, 512))
    vocab = vocab / jnp.linalg.norm(vocab, axis=-1, keepdims=True)
    variables = model.init(rng, images, vocab)

    fwd = build_reparam_forward(model, variables, vocab,
                                skip_image_pool=True)
    out = fwd(images)
    ref = model.apply(variables, images, vocab, skip_image_pool=True)
    np.testing.assert_allclose(np.asarray(out['scores']),
                               np.asarray(ref['scores']), rtol=1e-5)
    # text_embeddings pass through UNmodified (I-Pool dropped)
    np.testing.assert_allclose(
        np.asarray(out['text_embeddings'][0]), np.asarray(vocab), rtol=1e-6)
    # while the default path modifies them
    std = build_reparam_forward(model, variables, vocab)(images)
    assert not np.allclose(np.asarray(std['text_embeddings'][0]),
                           np.asarray(vocab))


def test_reparam_forward_with_fused_nms():
    """nms= kwarg runs NMS inside the SAME jitted program (one-program
    deploy: unused obj_embeddings are DCE'd) and matches the two-step
    compose."""
    from yoloclip_tpu.ops.nms import batched_nms

    cfg = ModelConfig(image_size=(128, 128))
    model = YOLOCLIP(cfg)
    rng = jax.random.PRNGKey(0)
    images = jax.random.uniform(rng, (2, 128, 128, 3))
    vocab = jax.random.normal(rng, (5, 512))
    vocab = vocab / jnp.linalg.norm(vocab, axis=-1, keepdims=True)
    variables = model.init(rng, images, vocab)

    fwd = build_reparam_forward(
        model, variables, vocab,
        nms={'conf_threshold': -10.0, 'iou_threshold': 0.45,
             'topk': 64, 'max_detections': 8})
    det = fwd(images)
    assert set(det) >= {'boxes', 'scores', 'class_ids', 'count'}
    assert det['boxes'].shape == (2, 8, 4)

    out = build_reparam_forward(model, variables, vocab)(images)
    want = batched_nms(out['boxes'], out['scores'], out['class_ids'],
                       -10.0, 0.45, topk=64, max_detections=8)
    np.testing.assert_allclose(np.asarray(det['boxes']),
                               np.asarray(want['boxes']),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(det['class_ids']),
                                  np.asarray(want['class_ids']))
