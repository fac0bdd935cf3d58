"""StableHLO export round trip: serialized pipeline == live pipeline."""

import numpy as np
import jax
import jax.numpy as jnp

from yoloclip_tpu.config import ModelConfig
from yoloclip_tpu.models.yolo_clip import YOLOCLIP
from yoloclip_tpu.ops.nms import batched_nms
from yoloclip_tpu.utils.export import export_detector, load_exported


def test_export_roundtrip(tmp_path):
    cfg = ModelConfig(image_size=(160, 160))
    model = YOLOCLIP(cfg)
    rng = jax.random.PRNGKey(0)
    vocab = jax.random.normal(rng, (5, 512))
    vocab = vocab / jnp.linalg.norm(vocab, axis=-1, keepdims=True)
    variables = model.init(rng, jnp.zeros((1, 160, 160, 3)), vocab)

    path = export_detector(model, variables, vocab, (2, 160, 160),
                           str(tmp_path / 'det.stablehlo'),
                           conf_threshold=-10.0, nms_topk=64,
                           max_detections=8)
    fn = load_exported(path)

    images = jax.random.uniform(rng, (2, 160, 160, 3))
    got = fn(images)
    out = model.apply(variables, images, vocab)
    want = batched_nms(out['boxes'], out['scores'], out['class_ids'],
                       -10.0, 0.45, topk=64, max_detections=8,
                       method='fixpoint')
    np.testing.assert_allclose(np.asarray(got['boxes']),
                               np.asarray(want['boxes']),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(got['class_ids']),
                                  np.asarray(want['class_ids']))
    np.testing.assert_array_equal(np.asarray(got['count']),
                                  np.asarray(want['count']))
    # the artifact is a real file a fresh process could load
    assert (tmp_path / 'det.stablehlo').stat().st_size > 1_000_000


def test_export_quantized_roundtrip(tmp_path):
    """The W8A8 deploy graph (ops/quantize.py) serializes to StableHLO and
    the loaded artifact reproduces the live int8 pipeline."""
    from yoloclip_tpu.ops.quantize import quantize_model

    cfg = ModelConfig(image_size=(160, 160))
    model = YOLOCLIP(cfg)
    rng = jax.random.PRNGKey(0)
    vocab = jax.random.normal(rng, (5, 512))
    vocab = vocab / jnp.linalg.norm(vocab, axis=-1, keepdims=True)
    variables = model.init(rng, jnp.zeros((1, 160, 160, 3)), vocab)
    images = jax.random.uniform(rng, (2, 160, 160, 3))

    qmodel, qvars = quantize_model(cfg, variables, [(images, vocab)])
    path = export_detector(qmodel, qvars, vocab, (2, 160, 160),
                           str(tmp_path / 'det_int8.stablehlo'),
                           conf_threshold=-10.0, nms_topk=64,
                           max_detections=8)
    fn = load_exported(path)

    got = fn(images)
    out = qmodel.apply(qvars, images, vocab)
    want = batched_nms(out['boxes'], out['scores'], out['class_ids'],
                       -10.0, 0.45, topk=64, max_detections=8,
                       method='fixpoint')
    np.testing.assert_allclose(np.asarray(got['boxes']),
                               np.asarray(want['boxes']),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(got['class_ids']),
                                  np.asarray(want['class_ids']))
    # int8 weights serialize smaller than the float artifact would
    assert (tmp_path / 'det_int8.stablehlo').stat().st_size > 100_000
