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
