"""End-to-end inference pipeline tests (random weights, tiny image size)."""

import numpy as np
import pytest

from yoloclip_tpu.config import InferenceConfig, ModelConfig


@pytest.fixture(scope='module')
def detector():
    from yoloclip_tpu.inference.detector import YOLOCLIPDetector
    cfg = InferenceConfig(
        model=ModelConfig(image_size=(160, 160)),
        conf_threshold=-10.0,   # random weights: accept everything
        nms_topk=64, max_detections=16)
    return YOLOCLIPDetector(class_names=['cat', 'dog', 'person'], config=cfg)


def test_detect_returns_reference_schema(detector):
    img = (np.random.RandomState(0).rand(120, 200, 3) * 255).astype(np.uint8)
    dets = detector.detect(img)
    assert isinstance(dets, list)
    for d in dets:
        assert set(d) == {'box', 'score', 'class_id', 'class_name'}
        x1, y1, x2, y2 = d['box']
        # boxes clipped to original image bounds (ref detector.py:199-202)
        assert 0 <= x1 <= 200 and 0 <= x2 <= 200
        assert 0 <= y1 <= 120 and 0 <= y2 <= 120
        assert d['class_name'] in ('cat', 'dog', 'person')
        assert isinstance(d['score'], float)


def test_detect_scores_sorted_desc(detector):
    img = (np.random.RandomState(1).rand(160, 160, 3) * 255).astype(np.uint8)
    dets = detector.detect(img)
    scores = [d['score'] for d in dets]
    assert scores == sorted(scores, reverse=True)


def test_detect_online_prompts(detector):
    img = (np.random.RandomState(2).rand(100, 100, 3) * 255).astype(np.uint8)
    dets = detector.detect(img, text_prompts=['a red ball', 'a blue cube'])
    for d in dets:
        assert d['class_name'] in ('a red ball', 'a blue cube')


def test_conf_threshold_blocks_all():
    from yoloclip_tpu.inference.detector import YOLOCLIPDetector
    cfg = InferenceConfig(model=ModelConfig(image_size=(160, 160)),
                          conf_threshold=5.0,   # above cosine range
                          nms_topk=64, max_detections=16)
    det = YOLOCLIPDetector(class_names=['cat'], config=cfg)
    img = np.zeros((160, 160, 3), np.uint8)
    assert det.detect(img) == []


def test_draw_detections(detector):
    img = (np.random.RandomState(3).rand(120, 200, 3) * 255).astype(np.uint8)
    dets = detector.detect(img)
    drawn = detector.draw_detections(img, dets)
    assert drawn.shape == img.shape


def test_host_preprocess_matches_device_path(detector):
    """host_preprocess=True (native/cv2 letterbox + shape-stable program)
    must agree with the device-letterbox path (resize implementations
    differ by ~1 intensity step, so boxes within a couple px)."""
    det = detector
    img = (np.random.RandomState(7).rand(120, 200, 3) * 255).astype(np.uint8)
    base_hp = det.config.host_preprocess

    try:
        object.__setattr__(det.config, 'host_preprocess', True)
        host = det.detect(img)
        object.__setattr__(det.config, 'host_preprocess', False)
        dev = det.detect(img)
    finally:
        object.__setattr__(det.config, 'host_preprocess', base_hp)

    assert len(host) == len(dev)
    for a, b in zip(host, dev):
        assert a['class_id'] == b['class_id']
        assert abs(a['score'] - b['score']) < 5e-2
        assert max(abs(x - y) for x, y in zip(a['box'], b['box'])) <= 3


def test_detect_many_resolutions_single_compile(detector):
    """'auto' serves novel resolutions through ONE shape-stable program."""
    det = detector
    rng = np.random.RandomState(3)
    for hw in [(96, 130), (170, 110), (64, 200)]:
        img = (rng.rand(*hw, 3) * 255).astype(np.uint8)
        out = det.detect(img)   # must not error or hang on retrace
        assert isinstance(out, list)


def test_detect_batch_matches_single(detector):
    """Batched same-size detection agrees with the single-image device
    path on counts/classes/boxes."""
    det = detector
    rng = np.random.RandomState(11)
    imgs = (rng.rand(2, 140, 180, 3) * 255).astype(np.uint8)
    out = det.detect_batch(imgs)
    assert set(out) >= {'boxes', 'scores', 'class_ids', 'valid', 'count'}
    B, D = out['scores'].shape
    assert B == 2 and D == det.config.max_detections

    base_hp = det.config.host_preprocess
    object.__setattr__(det.config, 'host_preprocess', False)
    try:
        for b in range(2):
            single = det.detect(imgs[b])
            n = int(out['count'][b])
            assert n == len(single)
            for i, d in enumerate(single):
                assert int(out['class_ids'][b][i]) == d['class_id']
                got = np.asarray(out['boxes'][b][i])
                assert np.abs(got - np.asarray(d['box'])).max() <= 1.5
    finally:
        object.__setattr__(det.config, 'host_preprocess', base_hp)


def test_detector_prefers_ema_weights(detector, tmp_path):
    """Loading a training checkpoint that carries an EMA tree must serve
    the averaged weights, not the raw ones (cfg.ema_decay contract)."""
    import jax
    from yoloclip_tpu.inference.detector import YOLOCLIPDetector
    from yoloclip_tpu.utils.checkpoint import save_checkpoint

    raw = detector.variables
    ema = jax.tree_util.tree_map(lambda p: np.asarray(p) * 0.5,
                                 raw['params'])
    path = str(tmp_path / 'ema_ckpt')
    save_checkpoint(path, {'params': raw['params'],
                           'batch_stats': raw.get('batch_stats', {}),
                           'ema_params': ema})
    det2 = YOLOCLIPDetector(class_names=['cat'], config=detector.config,
                            model_path=path)
    got = jax.tree_util.tree_leaves(det2.variables['params'])[0]
    want = jax.tree_util.tree_leaves(ema)[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want))


def test_detector_offline_vocab_roundtrip(detector, tmp_path):
    """set_offline_vocabulary(save_path=...) -> load_offline_vocabulary
    restores the same class set and embedding matrix."""
    det = detector
    path = str(tmp_path / 'vocab.json')
    names = list(det.class_names)
    vocab_before = np.asarray(det.offline_vocabulary)
    det.set_offline_vocabulary(names, save_path=path)
    det.load_offline_vocabulary(path)
    assert det.class_names == names
    np.testing.assert_allclose(np.asarray(det.offline_vocabulary),
                               vocab_before, rtol=1e-5, atol=1e-6)


def test_detect_batch_stem_u8_s2d_matches_plain():
    """detector with cfg.model.stem_u8_s2d serves the SAME weights through
    the uint8-s2d letterbox + folded stem and produces the plain
    detector's detections (identity-resize inputs: the relayout is
    byte-exact, only the kernel /255 fold reassociates)."""
    import dataclasses

    from yoloclip_tpu.inference.detector import YOLOCLIPDetector

    base = InferenceConfig(
        model=ModelConfig(image_size=(160, 160)),
        conf_threshold=-10.0, nms_topk=64, max_detections=16)
    names = ['cat', 'dog']
    d_plain = YOLOCLIPDetector(class_names=names, config=base)
    d_pre = YOLOCLIPDetector(class_names=names, config=dataclasses.replace(
        base, model=dataclasses.replace(base.model, stem_u8_s2d=True)))
    imgs = (np.random.RandomState(3).rand(2, 160, 160, 3) * 255
            ).astype(np.uint8)
    a = d_plain.detect_batch(imgs)
    b = d_pre.detect_batch(imgs)
    assert (np.asarray(a['count']) == np.asarray(b['count'])).all()
    np.testing.assert_allclose(np.asarray(a['boxes']),
                               np.asarray(b['boxes']),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(a['scores']),
                               np.asarray(b['scores']), atol=1e-4)

    # the int8 deploy swap keeps working under the layout flag, and the
    # quantized u8-s2d detector matches the quantized PLAIN detector
    # detection-for-detection (the calibration canvases run the same
    # u8-s2d graph, so a calibration-layout regression would show here)
    d_plain.quantize_int8(imgs)
    d_pre.quantize_int8(imgs)
    qa = d_plain.detect_batch(imgs)
    qb = d_pre.detect_batch(imgs)
    assert (np.asarray(qa['count']) == np.asarray(qb['count'])).all()
    np.testing.assert_allclose(np.asarray(qa['boxes']),
                               np.asarray(qb['boxes']),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(qa['scores']),
                               np.asarray(qb['scores']), atol=1e-3)
