"""Configuration system.

Mirrors the key-name surface of the reference config
(`/root/reference/yolo_clip_detector/config/default_config.py:18-109`) so a
user of the reference can carry YAML files over, while using frozen
dataclasses + explicit overlay merging instead of mutable `setattr` objects.

Overlay precedence (same as reference `train.py:75-93`):
    defaults < YAML file < explicit keyword overrides (CLI).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple

COCO_CLASS_NAMES: List[str] = [
    'person', 'bicycle', 'car', 'motorcycle', 'airplane', 'bus', 'train',
    'truck', 'boat', 'traffic light', 'fire hydrant', 'stop sign',
    'parking meter', 'bench', 'bird', 'cat', 'dog', 'horse', 'sheep', 'cow',
    'elephant', 'bear', 'zebra', 'giraffe', 'backpack', 'umbrella', 'handbag',
    'tie', 'suitcase', 'frisbee', 'skis', 'snowboard', 'sports ball', 'kite',
    'baseball bat', 'baseball glove', 'skateboard', 'surfboard',
    'tennis racket', 'bottle', 'wine glass', 'cup', 'fork', 'knife', 'spoon',
    'bowl', 'banana', 'apple', 'sandwich', 'orange', 'broccoli', 'carrot',
    'hot dog', 'pizza', 'donut', 'cake', 'chair', 'couch', 'potted plant',
    'bed', 'dining table', 'toilet', 'tv', 'laptop', 'mouse', 'remote',
    'keyboard', 'cell phone', 'microwave', 'oven', 'toaster', 'sink',
    'refrigerator', 'book', 'clock', 'vase', 'scissors', 'teddy bear',
    'hair drier', 'toothbrush',
]

# Variant table: ref `model/backbones/yolov8.py:106-112`.
VARIANT_CONFIGS: Dict[str, Dict[str, float]] = {
    'n': {'width': 0.25, 'depth': 0.33},
    's': {'width': 0.50, 'depth': 0.33},
    'm': {'width': 0.75, 'depth': 0.67},
    'l': {'width': 1.00, 'depth': 1.00},
    'x': {'width': 1.25, 'depth': 1.33},
}


@dataclass(frozen=True)
class ModelConfig:
    """Static architecture hyperparameters (hashable -> usable under jit)."""

    backbone_variant: str = 'n'
    clip_model: str = 'ViT-B/32'
    embed_dim: int = 512
    reg_max: int = 16
    strides: Tuple[int, ...] = (8, 16, 32)
    hidden_dim: int = 256
    neck_bottlenecks: int = 2      # ref model/yolo_clip.py:67 (n_bottlenecks=2)
    cls_alpha: float = 1.0         # ref model/heads/text_contrastive.py:44-45
    cls_beta: float = 0.0
    image_size: Tuple[int, int] = (640, 640)
    # TPU knobs (no reference equivalent -- pure rebuild features):
    dtype: str = 'float32'         # compute dtype: 'float32' | 'bfloat16'
    quant: str = 'none'   # conv path: 'none'|'calib'|'calib_pct'|'int8'
                                   # (W8A8 deploy mode, ops/quantize.py)
    stem_s2d: bool = False         # run the stem as an exact 2x2/s1 conv
                                   # over the space-to-depth layout
                                   # (models/layers.py::s2d_kernel3);
                                   # checkpoint-compatible either way
    stem_u8_s2d: bool = False      # serve-only: the model input is the
                                   # uint8-scaled s2d canvas from
                                   # letterbox_batch_u8_s2d and the stem
                                   # folds /255 into its kernel -- the
                                   # measured-winning stem layout
                                   # (probe_stem.py); checkpoints stay
                                   # interchangeable

    def backbone_channels(self) -> List[int]:
        """Per-stage channel widths. Ref `model/backbones/yolov8.py:124-125`."""
        wm = VARIANT_CONFIGS[self.backbone_variant]['width']
        return [max(int(c * wm), 16) for c in [64, 128, 256, 512, 1024]]

    def backbone_depths(self) -> List[int]:
        """Bottleneck counts per stage. Ref `model/backbones/yolov8.py:128-129`."""
        dm = VARIANT_CONFIGS[self.backbone_variant]['depth']
        return [max(int(d * dm), 1) for d in [1, 2, 4, 8]]

    def feature_channels(self) -> List[int]:
        """Backbone output channels (c3, c4, c5). Ref `yolov8.py:160`."""
        ch = self.backbone_channels()
        return [ch[2], ch[3], ch[4]]

    def num_anchors(self) -> int:
        h, w = self.image_size
        return sum((h // s) * (w // s) for s in self.strides)

    def level_shapes(self) -> List[Tuple[int, int]]:
        h, w = self.image_size
        return [(h // s, w // s) for s in self.strides]


@dataclass(frozen=True)
class InferenceConfig:
    """Inference settings. Ref `config/default_config.py:79-109`."""

    model: ModelConfig = field(default_factory=ModelConfig)
    model_path: Optional[str] = None
    vocab_path: Optional[str] = None
    conf_threshold: float = 0.25
    iou_threshold: float = 0.45
    class_names: Tuple[str, ...] = tuple(COCO_CLASS_NAMES)
    use_offline_vocab: bool = True
    output_dir: str = 'outputs/detections/'
    # TPU rebuild knobs:
    max_detections: int = 300      # fixed-shape NMS output size
    nms_topk: int = 1024           # pre-NMS candidate pool (top-k by score)
    fused_similarity: bool = True  # Pallas streaming max/argmax kernel
    #   (auto-disabled off-TPU; the XLA einsum path is used instead)
    # True = reference behavior (SURVEY bug #12: cross-class suppression);
    # False = per-class NMS (what most other frameworks do)
    class_agnostic_nms: bool = True
    # True: refuse to serve with a degraded text pipeline (random-init
    # text tower or zero-merge tokenizer) instead of warning -- detections
    # would look valid but carry no CLIP semantics.
    require_text_quality: bool = False
    # 'auto': host letterbox (native C++/cv2) for novel input resolutions
    # -- one shape-stable device program, no per-resolution retrace --
    # switching to the device-letterbox program once a resolution repeats
    # (hot camera). True: always host. False: always device letterbox.
    host_preprocess: Any = 'auto'


@dataclass(frozen=True)
class TrainingConfig:
    """Training settings. Ref `config/default_config.py:18-76`."""

    model: ModelConfig = field(default_factory=ModelConfig)
    # dataset
    train_anno_path: str = 'data/coco/annotations/instances_train2017.json'
    train_img_dir: str = 'data/coco/train2017'
    val_anno_path: str = 'data/coco/annotations/instances_val2017.json'
    val_img_dir: str = 'data/coco/val2017'
    class_names: Tuple[str, ...] = tuple(COCO_CLASS_NAMES)
    max_objects: int = 100
    mosaic_prob: float = 0.5
    # training
    batch_size: int = 16
    num_workers: int = 8
    learning_rate: float = 1e-4
    weight_decay: float = 1e-4
    max_epochs: int = 100
    warmup_epochs: int = 5
    save_interval: int = 10
    eval_interval: int = 5
    # loss
    temperature: float = 0.1
    iou_type: str = 'ciou'
    label_smoothing: float = 0.1
    loss_weights: Tuple[Tuple[str, float], ...] = (
        ('contrastive', 1.0), ('iou', 5.0), ('dfl', 1.0))
    # assignment: 'compat' truncates predictions to the first `max_objects`
    # anchors exactly like the reference (`train/trainer.py:158-175`,
    # `loss/region_text_contrastive.py:66-82`); 'topk_center' is the clean
    # TAL-style center-distance assigner built fresh for this framework.
    assigner: str = 'compat'
    # clean-mode score objective: 'bce' pushes assigned anchors above /
    # background below the 0.25 deploy threshold (region_text_bce_loss);
    # 'softmax' is the reference-style CE over labeled anchors only.
    contrastive_type: str = 'bce'
    # optimizer
    optimizer_type: str = 'AdamW'
    lr_scheduler_type: str = 'OneCycleLR'
    # EMA weight averaging (no reference equivalent; standard YOLO-family
    # production training). 0 disables. When on, the train step keeps an
    # exponential moving average of params (decay ramped YOLOv8-style:
    # decay * (1 - exp(-step / ema_warmup_steps))); eval + best/final
    # checkpoints use the EMA weights, resume restores both trees.
    ema_decay: float = 0.0
    ema_warmup_steps: int = 2000
    # Gradient accumulation (no reference equivalent). >1 splits each
    # batch into that many micro-batches inside ONE jitted step
    # (lax.scan): activation memory drops ~k-fold while the optimizer
    # still sees the full-batch mean gradient. The TPU memory lever --
    # remat was measured slower (benchmarks/RESULTS.md); batch_size must
    # be divisible by it.
    grad_accum_steps: int = 1
    output_dir: str = 'outputs/'
    seed: int = 42
    # TPU rebuild knobs:
    data_parallel: int = 1         # number of mesh shards on the 'data' axis
    # Evaluation: the reference scores raw top-max_objects anchors with no
    # NMS or confidence filter (`train/trainer.py:293-309`, SURVEY §3.5) --
    # that is the default for behavior parity. eval_with_nms=True instead
    # evaluates real detections (conf filter + class-agnostic NMS), the
    # COCO-comparable number.
    eval_with_nms: bool = False
    eval_conf_threshold: float = 0.25
    eval_iou_threshold: float = 0.45

    def loss_weight(self, key: str) -> float:
        return dict(self.loss_weights)[key]


def _merge(cfg, overrides: Dict[str, Any]):
    """Merge a flat dict into a (possibly nested) frozen config.

    Keys that match fields on the nested ModelConfig are routed there, same
    spirit as the reference's `setattr`-only-if-exists merge (`train.py:75-81`).
    Unknown keys are ignored.
    """
    own = {f.name for f in dataclasses.fields(cfg)}
    updates = {}
    model_updates = {}
    model_fields = {f.name for f in dataclasses.fields(ModelConfig)}
    for k, v in overrides.items():
        if v is None:
            continue
        if k in own and k != 'model':
            if isinstance(v, list):
                v = tuple(tuple(x) if isinstance(x, list) else x for x in v)
            if k == 'loss_weights' and isinstance(v, dict):
                v = tuple(v.items())
            updates[k] = v
        elif k in model_fields and hasattr(cfg, 'model'):
            if isinstance(v, list):
                v = tuple(v)
            model_updates[k] = v
    if model_updates and hasattr(cfg, 'model'):
        updates['model'] = dataclasses.replace(cfg.model, **model_updates)
    return dataclasses.replace(cfg, **updates)


def _load_yaml_with_includes(path: str) -> Dict[str, Any]:
    """Load a YAML config resolving `model_config:`/`dataset_config:`
    includes (paths relative to the including file).

    The reference DECLARES this compositional scheme in its YAMLs
    (`config/yolov8n_coco.yaml:4-5`) but never implements the resolution
    (SURVEY §2.7 "aspirational"); here it works: include keys merge first,
    the including file's own keys override.
    """
    import os

    import yaml
    with open(path) as f:
        data = yaml.safe_load(f) or {}
    base_dir = os.path.dirname(os.path.abspath(path))
    merged: Dict[str, Any] = {}
    for key in ('model_config', 'dataset_config'):
        inc = data.pop(key, None)
        if inc:
            inc_path = inc if os.path.isabs(inc) else os.path.join(base_dir,
                                                                   inc)
            merged.update(_load_yaml_with_includes(inc_path))
    merged.update(data)
    return merged


def load_config(cls, yaml_path: Optional[str] = None, **overrides):
    """defaults < YAML (with includes) < kwargs. Ref merge `train.py:75-93`."""
    cfg = cls()
    if yaml_path is not None:
        cfg = _merge(cfg, _load_yaml_with_includes(yaml_path))
    return _merge(cfg, overrides)
