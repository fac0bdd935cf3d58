"""Weight conversion between reference (torch) checkpoints and this
framework's flax variable tree.

Lets a user of the reference bring a trained `.pth` straight into the TPU
framework (and export back). The torch-side key layout is defined by the
reference modules (`model/yolo_clip.py:34-100` composition; ConvBlock =
conv/bn pairs; heads' towers are nn.Sequential indices 0/1/2), mapped here
to our NHWC/flax tree:

  torch conv weight (O, I, kH, kW) -> flax kernel (kH, kW, I, O)
  torch linear weight (out, in)    -> flax Dense kernel (in, out)
  BatchNorm weight/bias            -> params.bn.scale / .bias
  BatchNorm running_mean/var       -> batch_stats.bn.mean / .var
  nn.MultiheadAttention            -> identical layout (our MHA stores
                                      torch-style packed in_proj)
  text_encoder.clip_model.*        -> text-tower params via
                                      text.model.convert_openai_state_dict

The map is declarative (torch prefix <-> flax path per block), so the same
table drives import and export; a roundtrip test guards it.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np

from yoloclip_tpu.config import ModelConfig


def _conv_block_entries(tp: str, fp: Tuple[str, ...]):
    """(torch_prefix, flax_path) pairs for a ConvBlock (conv+bn)."""
    return [
        (f'{tp}.conv.weight', ('params',) + fp + ('conv', 'kernel'), 'conv'),
        (f'{tp}.bn.weight', ('params',) + fp + ('bn', 'scale'), 'id'),
        (f'{tp}.bn.bias', ('params',) + fp + ('bn', 'bias'), 'id'),
        (f'{tp}.bn.running_mean', ('batch_stats',) + fp + ('bn', 'mean'), 'id'),
        (f'{tp}.bn.running_var', ('batch_stats',) + fp + ('bn', 'var'), 'id'),
    ]


def _conv2d_entries(tp: str, fp: Tuple[str, ...]):
    """Plain nn.Conv2d with bias -> flax Conv {kernel, bias}."""
    return [
        (f'{tp}.weight', ('params',) + fp + ('kernel',), 'conv'),
        (f'{tp}.bias', ('params',) + fp + ('bias',), 'id'),
    ]


def _linear_entries(tp: str, fp: Tuple[str, ...]):
    return [
        (f'{tp}.weight', ('params',) + fp + ('kernel',), 'linear'),
        (f'{tp}.bias', ('params',) + fp + ('bias',), 'id'),
    ]


def _csp_entries(tp: str, fp: Tuple[str, ...], n_bottlenecks: int,
                 text_guided: bool = False):
    out = []
    for cv in ('cv1', 'cv2', 'cv3'):
        out += _conv_block_entries(f'{tp}.{cv}', fp + (cv,))
    for i in range(n_bottlenecks):
        for cv in ('cv1', 'cv2'):
            out += _conv_block_entries(f'{tp}.bottlenecks.{i}.{cv}',
                                       fp + (f'bottlenecks_{i}', cv))
    if text_guided:
        out += _linear_entries(f'{tp}.text_proj', fp + ('text_proj',))
    return out


def build_key_map(cfg: ModelConfig) -> List[Tuple[str, Tuple[str, ...], str]]:
    """Full (torch_key, flax_path, transform) table for the detector."""
    depths = cfg.backbone_depths()
    entries: List[Tuple[str, Tuple[str, ...], str]] = []

    # backbone (ref yolov8.py:132-157; torch Sequential indices)
    B = ('backbone',)
    entries += _conv_block_entries('backbone.stem', B + ('stem',))
    for s, depth in zip(range(1, 5), depths):
        entries += _conv_block_entries(f'backbone.stage{s}.0',
                                       B + (f'stage{s}_conv',))
        entries += _csp_entries(f'backbone.stage{s}.1',
                                B + (f'stage{s}_csp',), depth)
    for cv in ('cv1', 'cv2'):
        entries += _conv_block_entries(f'backbone.stage4.2.{cv}',
                                       B + ('stage4_sppf', cv))

    # neck (ref repvl_pan.py:206-239)
    N = ('neck',)
    for i in range(3):
        entries += _conv_block_entries(f'neck.lateral_convs.{i}',
                                       N + (f'lateral_convs_{i}',))
        entries += _conv_block_entries(f'neck.fpn_convs.{i}',
                                       N + (f'fpn_convs_{i}',))
        entries += _csp_entries(f'neck.text_csplayers.{i}',
                                N + (f'text_csplayers_{i}',),
                                cfg.neck_bottlenecks, text_guided=True)
    for i in range(2):
        entries += _conv_block_entries(f'neck.up_channels.{i}',
                                       N + (f'up_channels_{i}',))
        entries += _conv_block_entries(f'neck.downsample_convs.{i}',
                                       N + (f'downsample_convs_{i}',))
    ipa = N + ('image_pooling_attention',)
    for i in range(3):
        entries += _linear_entries(
            f'neck.image_pooling_attention.projections.{i}',
            ipa + (f'projections_{i}',))
    for k in ('in_proj_weight', 'in_proj_bias'):
        entries.append((f'neck.image_pooling_attention.mha.{k}',
                        ('params',) + ipa + ('mha', k), 'id'))
    entries.append(('neck.image_pooling_attention.mha.out_proj.weight',
                    ('params',) + ipa + ('mha', 'out_proj_weight'), 'id'))
    entries.append(('neck.image_pooling_attention.mha.out_proj.bias',
                    ('params',) + ipa + ('mha', 'out_proj_bias'), 'id'))

    # heads (ref text_contrastive.py:64-75, box_head.py:55-61)
    for i in range(3):
        H = (f'contrastive_heads_{i}',)
        entries += _conv_block_entries(
            f'contrastive_heads.{i}.obj_embed_conv.0', H + ('obj_0',))
        entries += _conv_block_entries(
            f'contrastive_heads.{i}.obj_embed_conv.1', H + ('obj_1',))
        entries += _conv2d_entries(
            f'contrastive_heads.{i}.obj_embed_conv.2', H + ('obj_2',))
        entries += _conv_block_entries(
            f'contrastive_heads.{i}.box_conv.0', H + ('box_0',))
        entries += _conv_block_entries(
            f'contrastive_heads.{i}.box_conv.1', H + ('box_1',))
        entries += _conv2d_entries(
            f'contrastive_heads.{i}.box_conv.2', H + ('box_2',))
        BH = ('box_head',)
        entries += _conv_block_entries(f'box_head.box_convs.{i}.0',
                                       BH + (f'box_convs_{i}_0',))
        entries += _conv_block_entries(f'box_head.box_convs.{i}.1',
                                       BH + (f'box_convs_{i}_1',))
        entries += _conv2d_entries(f'box_head.box_convs.{i}.2',
                                   BH + (f'box_convs_{i}_2',))
    return entries


def _fwd(arr: np.ndarray, transform: str) -> np.ndarray:
    if transform == 'conv':
        return arr.transpose(2, 3, 1, 0)   # OIHW -> HWIO
    if transform == 'linear':
        return arr.T
    return arr


def _bwd(arr: np.ndarray, transform: str) -> np.ndarray:
    if transform == 'conv':
        return arr.transpose(3, 2, 0, 1)
    if transform == 'linear':
        return arr.T
    return arr


def _set(tree: Dict, path: Tuple[str, ...], value) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _get(tree: Dict, path: Tuple[str, ...]):
    node = tree
    for p in path:
        node = node[p]
    return node


def convert_reference_state_dict(state_dict: Dict[str, Any],
                                 cfg: ModelConfig,
                                 with_aux_box: bool = True) -> Dict[str, Any]:
    """torch reference state_dict -> flax variables
    {'params': ..., 'batch_stats': ...}. text_encoder.* keys are ignored
    here (use `extract_text_tower` for the CLIP tower)."""
    def npy(v):
        if hasattr(v, 'detach'):
            v = v.detach().cpu().float().numpy()
        return np.asarray(v, np.float32)

    variables: Dict[str, Any] = {'params': {}, 'batch_stats': {}}
    for tkey, fpath, transform in build_key_map(cfg):
        if not with_aux_box and '.box_conv.' in tkey:
            continue
        if tkey not in state_dict:
            raise KeyError(f'missing reference key: {tkey}')
        _set(variables, fpath, _fwd(npy(state_dict[tkey]), transform))
    return variables


def export_reference_state_dict(variables: Dict[str, Any],
                                cfg: ModelConfig) -> Dict[str, np.ndarray]:
    """flax variables -> torch-layout state dict (reference key names)."""
    out: Dict[str, np.ndarray] = {}
    for tkey, fpath, transform in build_key_map(cfg):
        try:
            arr = np.asarray(_get(variables, fpath))
        except KeyError:
            continue   # e.g. aux box tower never initialized
        out[tkey] = _bwd(arr, transform)
    return out


def extract_text_tower(state_dict: Dict[str, Any],
                       prefix: str = 'text_encoder.clip_model.'):
    """Pull the CLIP text-transformer weights out of a reference checkpoint
    (full CLIP model lives under text_encoder.clip_model.*,
    ref `clip/text_encoder.py:37`)."""
    from yoloclip_tpu.text.model import convert_openai_state_dict
    sub = {k[len(prefix):]: v for k, v in state_dict.items()
           if k.startswith(prefix)}
    return convert_openai_state_dict(sub)


def load_reference_checkpoint(path: str, cfg: ModelConfig):
    """torch .pth (trainer checkpoint or bare state dict) -> (variables,
    text_tower_params or None). Ref checkpoint layout `trainer.py:457-461`."""
    import torch
    ckpt = torch.load(path, map_location='cpu', weights_only=False)
    sd = ckpt.get('model_state_dict', ckpt) if isinstance(ckpt, dict) else ckpt
    variables = convert_reference_state_dict(sd, cfg)
    text = None
    if any(k.startswith('text_encoder.clip_model.') for k in sd):
        try:
            text = extract_text_tower(sd)
        except KeyError:
            text = None
    return variables, text
