"""Config system tests: defaults, YAML overlay, include resolution, CLI
override precedence (ref merge order `train.py:75-93`)."""

import os

import pytest

from yoloclip_tpu.config import (InferenceConfig, ModelConfig,
                                 TrainingConfig, load_config,
                                 COCO_CLASS_NAMES)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_defaults_match_reference_surface():
    t = TrainingConfig()
    assert t.batch_size == 16
    assert t.learning_rate == 1e-4
    assert t.weight_decay == 1e-4
    assert t.max_epochs == 100
    assert t.warmup_epochs == 5
    assert t.temperature == 0.1
    assert t.iou_type == 'ciou'
    assert t.loss_weight('contrastive') == 1.0
    assert t.loss_weight('iou') == 5.0
    assert t.loss_weight('dfl') == 1.0
    assert t.max_objects == 100
    assert len(t.class_names) == 80
    i = InferenceConfig()
    assert i.conf_threshold == 0.25
    assert i.iou_threshold == 0.45
    assert i.use_offline_vocab is True
    assert len(COCO_CLASS_NAMES) == 80


def test_yaml_overlay_and_overrides(tmp_path):
    p = tmp_path / 'cfg.yaml'
    p.write_text('batch_size: 4\nlearning_rate: 0.5\nbackbone_variant: s\n')
    cfg = load_config(TrainingConfig, str(p), learning_rate=0.25)
    assert cfg.batch_size == 4            # from YAML
    assert cfg.learning_rate == 0.25      # kwargs beat YAML
    assert cfg.model.backbone_variant == 's'   # routed into ModelConfig


def test_include_resolution():
    cfg = load_config(TrainingConfig,
                      os.path.join(REPO, 'configs', 'yolov8n_coco.yaml'))
    assert cfg.model.backbone_variant == 'n'     # from models/yolov8n.yaml
    assert cfg.model.dtype == 'bfloat16'
    assert cfg.max_objects == 100                # from datasets/coco.yaml
    assert cfg.batch_size == 16                  # top-level override
    assert cfg.label_smoothing == 0.1
    assert dict(cfg.loss_weights)['iou'] == 5.0


@pytest.mark.parametrize('variant', ['n', 's', 'm', 'l', 'x'])
def test_all_variant_presets_load(variant):
    cfg = load_config(TrainingConfig,
                      os.path.join(REPO, 'configs', 'models',
                                   f'yolov8{variant}.yaml'))
    assert cfg.model.backbone_variant == variant


def test_unknown_keys_ignored(tmp_path):
    p = tmp_path / 'cfg.yaml'
    p.write_text('nonsense_key: 42\nbatch_size: 3\n')
    cfg = load_config(TrainingConfig, str(p))
    assert cfg.batch_size == 3
    assert not hasattr(cfg, 'nonsense_key')
