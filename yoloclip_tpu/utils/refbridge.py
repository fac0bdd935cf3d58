"""Bridge to the PyTorch reference implementation (oracle harness).

Loads the reference package (default `/root/reference`, override with
`YOLOCLIP_REF_ROOT`) so OUR weights can be run through the reference's own
forward and postprocess as a ground-truth oracle -- used by
tests/test_parity_reference.py and benchmarks/quality_eval.py. Two of the
reference's imports are unavailable here and get stubbed before import:
`clip` (the OpenAI package downloads weights over the network; the offline
vision forward never calls it -- `model/yolo_clip.py:121-129` uses the
injected vocabulary directly) and `cv2` (image IO only; the
postprocess/NMS path `inference/detector.py:163-287` is pure numpy).

This module never runs in the serving path; it exists so parity claims are
checked against reference CODE, not a re-derivation.
"""

from __future__ import annotations

import os
import sys
import types
from typing import Dict, Optional

import numpy as np

REF_ROOT = os.environ.get('YOLOCLIP_REF_ROOT', '/root/reference')


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REF_ROOT, 'yolo_clip_detector'))


def install_stubs() -> None:
    import torch
    if 'clip' not in sys.modules:
        clip_stub = types.ModuleType('clip')

        class _StubCLIPModel(torch.nn.Module):
            def encode_text(self, tokens):
                raise RuntimeError(
                    'stub CLIP: the offline oracle path never encodes text')

        clip_stub.load = lambda name, device=None, **kw: (_StubCLIPModel(),
                                                          lambda im: im)
        clip_stub.tokenize = lambda texts, context_length=77: torch.zeros(
            (len(texts), context_length), dtype=torch.long)
        sys.modules['clip'] = clip_stub
    try:
        import cv2  # noqa: F401
    except ImportError:
        sys.modules.setdefault('cv2', types.ModuleType('cv2'))


def load_reference() -> types.SimpleNamespace:
    """Import the reference package; returns namespace with its modules."""
    install_stubs()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    import yolo_clip_detector.inference.detector as ref_detector
    import yolo_clip_detector.model.yolo_clip as ref_yolo_clip
    return types.SimpleNamespace(yolo_clip=ref_yolo_clip,
                                 detector=ref_detector)


def load_reference_losses() -> types.SimpleNamespace:
    """Import the reference's OWN loss modules (torch-only, no stubs
    needed beyond install_stubs) for use as training-math oracles:
    `loss/region_text_contrastive.py:10`, `loss/iou_loss.py:11`,
    `loss/dfl_loss.py:10`."""
    install_stubs()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    from yolo_clip_detector.loss.dfl_loss import DistributedFocalLoss
    from yolo_clip_detector.loss.iou_loss import IoULoss
    from yolo_clip_detector.loss.region_text_contrastive import \
        RegionTextContrastiveLoss
    return types.SimpleNamespace(
        RegionTextContrastiveLoss=RegionTextContrastiveLoss,
        IoULoss=IoULoss, DistributedFocalLoss=DistributedFocalLoss)


def reference_combined_objective(outputs: Dict, batch: Dict,
                                 loss_weights: Dict[str, float],
                                 temperature: float = 0.1,
                                 iou_type: str = 'ciou',
                                 topk: int = 3,
                                 label_smoothing: float = 0.0):
    """The reference trainer's combined training objective
    (`/root/reference/yolo_clip_detector/train/trainer.py:142-194`) on
    torch tensors, using the reference's OWN loss modules. Only the
    trainer's glue (pred-box truncate/pad at :159-173 and the weighted sum
    at :190-194) is replicated here -- the loss math is reference code.

    The DFL term is a literal 0: the reference dataset never emits
    `box_targets`, so `trainer.py:181` never fires (SURVEY bug #5).
    Returns (total, parts) as torch scalars (differentiable)."""
    import torch
    losses = load_reference_losses()
    cont_mod = losses.RegionTextContrastiveLoss(
        temperature=temperature, topk=topk, label_smoothing=label_smoothing)
    iou_mod = losses.IoULoss(iou_type=iou_type)

    cont = cont_mod(outputs['obj_embeddings'], outputs['text_embeddings'],
                    batch['class_ids'], batch.get('valid_mask'))
    pred_boxes = outputs['boxes']
    boxes = batch['boxes']
    if pred_boxes.shape[1] != boxes.shape[1]:          # trainer.py:159-173
        if pred_boxes.shape[1] > boxes.shape[1]:
            pred_boxes = pred_boxes[:, :boxes.shape[1], :]
        else:
            padding = torch.zeros(pred_boxes.shape[0],
                                  boxes.shape[1] - pred_boxes.shape[1],
                                  pred_boxes.shape[2],
                                  dtype=pred_boxes.dtype)
            pred_boxes = torch.cat([pred_boxes, padding], dim=1)
    iou = iou_mod(pred_boxes, boxes, batch.get('valid_mask'))
    dfl = torch.tensor(0.0)
    total = (loss_weights['contrastive'] * cont
             + loss_weights['iou'] * iou
             + loss_weights['dfl'] * dfl)
    return total, {'loss': total, 'contrastive_loss': cont,
                   'iou_loss': iou, 'dfl_loss': dfl}


def build_reference_composite(cfg, variables: Dict, num_classes: int,
                              text_np: Optional[np.ndarray] = None,
                              ref: Optional[types.SimpleNamespace] = None):
    """Reference YOLOCLIP (offline mode) loaded with OUR flax variables via
    `export_reference_state_dict`; eval mode, vocabulary injected."""
    import torch

    from yoloclip_tpu.utils.convert import export_reference_state_dict
    ref = ref or load_reference()
    model = ref.yolo_clip.YOLOCLIP(
        backbone_variant=cfg.backbone_variant, offline_mode=True,
        num_classes=num_classes, reg_max=cfg.reg_max,
        strides=list(cfg.strides))
    if cfg.backbone_variant != 'n':
        # Reference bug #7 (SURVEY §2.9): I-Pool projections hard-code the
        # 'n' widths (repvl_pan.py:134-138); patch ONLY those three Linear
        # layers so s/m/l can run -- everything else is reference code.
        fc = cfg.feature_channels()
        model.neck.image_pooling_attention.projections = torch.nn.ModuleList(
            [torch.nn.Linear(c, cfg.embed_dim) for c in fc])
    fp32_vars = _as_fp32(variables)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in
          export_reference_state_dict(fp32_vars, cfg).items()}
    missing, unexpected = model.load_state_dict(sd, strict=False)
    # Allowed-missing: BN step counters, and the contrastive heads' box
    # towers when our variables never built them (with_aux_box=False) --
    # the reference DISCARDS their output (`model/yolo_clip.py:177`
    # `obj_embed, _ = head(feat)`; boxes come from the separate BoxHead),
    # so they cannot affect any compared output.
    bad = [m for m in missing if 'num_batches_tracked' not in m
           and '.box_conv.' not in m]
    if bad or unexpected:
        raise ValueError(f'state dict mismatch: missing={bad}, '
                         f'unexpected={unexpected}')
    model.eval()
    if text_np is not None:
        model.offline_vocabulary = torch.from_numpy(
            np.asarray(text_np, np.float32))
    return model


def _as_fp32(tree):
    import jax
    return jax.tree_util.tree_map(lambda x: np.asarray(x, np.float32), tree)


def reference_postprocess(outputs_np: Dict[str, np.ndarray],
                          orig_size, scale: float,
                          conf: float, iou: float,
                          image_size=(640, 640),
                          ref: Optional[types.SimpleNamespace] = None):
    """Run the reference's postprocess_detections/_nms on raw outputs for
    ONE image ({'boxes' (A,4), 'scores' (A,), 'class_ids' (A,)})."""
    import torch
    ref = ref or load_reference()
    det = ref.detector.YOLOCLIPDetector.__new__(
        ref.detector.YOLOCLIPDetector)
    det.conf_threshold = conf
    det.iou_threshold = iou
    det.image_size = tuple(image_size)
    det.class_names = None
    outputs = {k: torch.from_numpy(np.asarray(v)[None].copy())
               for k, v in outputs_np.items()}
    return det.postprocess_detections(outputs, tuple(orig_size), scale)
