"""Post-training W8A8 int8 quantization for the deploy path.

No reference equivalent (the reference is fp32 torch end-to-end); this is a
pure TPU-rebuild feature motivated by the roofline in benchmarks/RESULTS.md:
the detect pipeline is HBM-bandwidth-bound (~80% of v5e's 819 GB/s at bs=32,
only ~19% MXU), so int8 activations+weights nearly halve the byte traffic
and the s8xs8->s32 convolutions run at the MXU's doubled int8 rate.

Scheme (symmetric, zero-point 0 -- SAME zero padding stays exact):
  * SELECTIVE: only blocks passing `models.layers.quant_eligible` (wide
    3x3 convs) are quantized; narrow/1x1 blocks become BN-folded float
    convs {wf, fbias}. Measured on v5e: blanket int8 was NET-NEGATIVE
    (-20% e2e, +43% HBM bytes by XLA cost analysis -- requantize passes
    around narrow convs outweigh the int8 savings), while wide 3x3 convs
    individually win 1.4-1.5x at the MXU's doubled int8 rate.
  * weights: BatchNorm folded into the conv kernel/bias first
    (w' = k * gamma/sqrt(var+eps), b' = beta - mean*gamma/sqrt(var+eps)),
    then per-output-channel scales wscale[o] = max|w'[..., o]| / 127.
  * activations: per-tensor scales act_scale = amax / 127, where amax is
    the running max-abs of each ConvBlock's input recorded by a short
    calibration run (ConvBlock quant='calib' sows `in_amax` into the
    'intermediates' collection, reduce=max).
  * graph: ConvBlock quant='int8' (models/layers.py) -- quantize input,
    int8 conv, dequant + bias + SiLU, epilogue cast to the compute dtype
    (bf16 epilogues matter: c256@20 is 1.45x with bf16 vs 0.87x fp32).

Kept in float: the similarity einsum + L2 norms, DFL softmax decode, NMS,
the I-Pool attention (dropped in deploy mode anyway, see ops/reparam.py),
the text-projection Dense layers, and the final 1x1 convs of each head
tower (obj_2 / box_convs_i_2) whose outputs feed exp()/cosine math that is
sensitive to quantization error.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from yoloclip_tpu.models.layers import quant_eligible

BN_EPS = 1e-5          # must match ConvBlock's nn.BatchNorm epsilon
_MIN_SCALE = 1e-12


def _as_dict(tree):
    """FrozenDict/dict -> plain nested dict (leaves unchanged)."""
    if hasattr(tree, 'items'):
        return {k: _as_dict(v) for k, v in tree.items()}
    return tree


def _is_convblock(params_node) -> bool:
    return (isinstance(params_node, dict)
            and set(params_node) == {'conv', 'bn'}
            and isinstance(params_node.get('conv'), dict)
            and 'kernel' in params_node['conv'])


def calibrate_amax(model, variables, batches: Iterable[Tuple[Any, Any]],
                   **apply_kwargs) -> Dict:
    """Run calibration forwards, return the per-ConvBlock input-amax tree.

    model: a YOLOCLIP built with cfg.quant='calib'. batches: iterable of
    (images, text_embeddings). apply_kwargs are forwarded to apply, so
    calibration always runs the SAME graph configuration that will be
    served (e.g. skip_image_pool=True only when deploying that opt-in).
    Returns the 'intermediates' subtree: nested dict ending in
    {'in_amax': scalar}.
    """
    # ONE jitted program per input shape -- eager apply would dispatch
    # thousands of ops individually (minutes through a remote-TPU tunnel)
    @jax.jit
    def _calib_step(variables, images, text):
        _, state = model.apply(variables, images, text,
                               mutable=['intermediates'], **apply_kwargs)
        return state['intermediates']

    amax = None
    for images, text in batches:
        # ONE bulk device_get per batch + host-side numpy reduce: per-leaf
        # np.asarray would pay a ~30 ms tunnel RTT per ConvBlock (~60 of
        # them), and a jnp.maximum reduce would re-dispatch device ops
        cur = _as_dict(jax.device_get(_calib_step(variables, images, text)))
        if amax is None:
            amax = cur
        else:
            amax = jax.tree.map(np.maximum, amax, cur)
    if amax is None:
        raise ValueError('calibrate_amax needs at least one batch')
    return amax


def _pick_act_amax(a_node: Optional[Dict], calibration: str):
    """Select the activation range statistic per the calibration scheme:
    'max' -> plain max-abs ('in_amax'); 'percentile' -> 99.9th |x|
    percentile ('in_p999', max-reduced across calibration batches) --
    clips outliers so the bulk of values get finer quantization steps."""
    if a_node is None:
        return None
    if calibration == 'percentile':
        v = a_node.get('in_p999')
        if v is None and 'in_amax' in a_node:
            raise KeyError("calibration='percentile' needs 'in_p999' "
                           "stats: calibrate with quant='calib_pct' "
                           "(quantize_model does this automatically)")
        return v
    if calibration != 'max':
        raise ValueError(f"calibration must be 'max' or 'percentile', "
                         f"got {calibration!r}")
    return a_node.get('in_amax')


def _quantize_convblock(params_node: Dict, stats_node: Dict,
                        amax: Optional[np.ndarray],
                        a_node: Optional[Dict] = None) -> Dict:
    kernel = np.asarray(params_node['conv']['kernel'], np.float32)
    gamma = np.asarray(params_node['bn']['scale'], np.float32)
    beta = np.asarray(params_node['bn']['bias'], np.float32)
    mean = np.asarray(stats_node['bn']['mean'], np.float32)
    var = np.asarray(stats_node['bn']['var'], np.float32)

    s = gamma / np.sqrt(var + BN_EPS)
    w = kernel * s                      # (k, k, I, O) * (O,)
    b = beta - mean * s

    def _out_scale() -> Dict:
        # int8-stored output edge: the calib ConvBlock sowed out_amax +
        # out_store iff its store_out flag AND the element threshold
        # fired -- mirroring exactly when the int8 graph will request the
        # 'out_scale' param (layers.ConvBlock._store)
        if a_node and float(a_node.get('out_store', 0.0)) > 0:
            oa = float(a_node['out_amax'])
            return {'out_scale': np.float32(max(oa / 127.0, _MIN_SCALE))}
        return {}

    k, _, cin, cout = kernel.shape
    if not quant_eligible(k, cin, cout):
        # BN-folded float conv -- mirrors ConvBlock's ineligible branch
        return {'wf': w.astype(np.float32), 'fbias': b.astype(np.float32),
                **_out_scale()}

    if amax is None:
        raise KeyError('missing calibration amax for eligible ConvBlock '
                       '(run calibrate_amax first)')
    wscale = np.maximum(np.abs(w).max(axis=(0, 1, 2)) / 127.0, _MIN_SCALE)
    wq = np.clip(np.round(w / wscale), -127, 127).astype(np.int8)
    act_scale = np.float32(max(float(amax) / 127.0, _MIN_SCALE))
    return {'wq': wq, 'wscale': wscale.astype(np.float32),
            'qbias': b.astype(np.float32), 'act_scale': act_scale,
            **_out_scale()}


def quantize_variables(variables, amax_tree: Dict,
                       calibration: str = 'max') -> Dict:
    """Trained float variables -> int8 deploy variables.

    Walks the params tree; every ConvBlock scope ({'conv','bn'}) is replaced
    by {'wq','wscale','qbias','act_scale'} (if `quant_eligible`) or by the
    BN-folded float {'wf','fbias'} (if not) using the matching batch_stats
    and calibration amax. Everything else passes through unchanged. The
    result has no batch_stats collection (all BatchNorms are folded).
    """
    variables = _as_dict(variables)
    params, stats = variables['params'], variables.get('batch_stats', {})

    def walk(p_node, s_node, a_node, path):
        if _is_convblock(p_node):
            if s_node is None or 'bn' not in s_node:
                raise KeyError(f'missing batch_stats for ConvBlock {path}')
            amax = _pick_act_amax(a_node, calibration)
            try:
                return _quantize_convblock(p_node, s_node, amax, a_node)
            except KeyError as e:
                raise KeyError(f'{e.args[0]}: ConvBlock {path}') from None
        if not isinstance(p_node, dict):
            return p_node
        return {k: walk(v,
                        s_node.get(k) if isinstance(s_node, dict) else None,
                        a_node.get(k) if isinstance(a_node, dict) else None,
                        path + (k,))
                for k, v in p_node.items()}

    qparams = walk(params, stats, amax_tree, ())
    # device arrays, NOT numpy: numpy leaves would re-upload every weight
    # on each jitted call (a fresh host->device transfer per step -- ~20x
    # slower through a remote-TPU tunnel)
    return {'params': jax.tree.map(jnp.asarray, qparams)}


def quantize_model(cfg, variables, calib_batches: Iterable[Tuple[Any, Any]],
                   calibration: str = 'max', **apply_kwargs):
    """(float cfg, float variables) -> (int8 model, int8 variables).

    Convenience wrapper: calibrates on `calib_batches` with the deploy
    graph settings in apply_kwargs, then transforms the variables.
    calibration: 'max' (plain max-abs) or 'percentile' (99.9th |x|,
    outlier-clipping) -- see `_pick_act_amax`.
    """
    from yoloclip_tpu.models.yolo_clip import YOLOCLIP

    calib_quant = 'calib_pct' if calibration == 'percentile' else 'calib'
    calib_cfg = _replace_cfg(cfg, quant=calib_quant)
    amax = calibrate_amax(YOLOCLIP(calib_cfg), variables, calib_batches,
                          **apply_kwargs)
    qcfg = _replace_cfg(cfg, quant='int8')
    return YOLOCLIP(qcfg), quantize_variables(variables, amax, calibration)


def _replace_cfg(cfg, **kw):
    import dataclasses
    return dataclasses.replace(cfg, **kw)


def build_quant_forward(cfg, variables, vocabulary: jax.Array,
                        calib_images: jax.Array,
                        class_mask: Optional[jax.Array] = None,
                        fused_scores: Optional[bool] = None,
                        skip_image_pool: bool = False,
                        nms: Optional[Dict] = None) -> Callable:
    """int8 sibling of `ops.reparam.build_reparam_forward`: returns a jitted
    `fn(images) -> output dict` running the W8A8 deploy graph with the
    vocabulary baked in. Calibration uses `calib_images` (a representative
    (N, H, W, 3) float batch) against the same vocabulary.

    skip_image_pool: ALSO drop I-Pooling -- off by default; on weights
    trained with I-Pooling this zeroes detection quality (max cosine
    score 0.128 < the 0.25 conf threshold; `ops/reparam.py` docstring).

    nms: optional `batched_nms` kwargs dict -- runs NMS inside the SAME
    jitted program so the unused obj_embeddings are dead-code-eliminated
    instead of materializing between two programs (see
    `build_reparam_forward`'s note; worth ~5% e2e at bs=32 on v5e).
    """
    vocab_const = jnp.asarray(vocabulary)
    if fused_scores is None:
        fused_scores = (jax.default_backend() == 'tpu' and class_mask is None)

    qmodel, qvars = quantize_model(
        cfg, variables, [(calib_images, vocab_const)],
        class_mask=class_mask, skip_image_pool=skip_image_pool)
    mask_const = None if class_mask is None else jnp.asarray(class_mask)

    @jax.jit
    def forward(images: jax.Array) -> Dict[str, jax.Array]:
        out = qmodel.apply(qvars, images, vocab_const,
                           class_mask=mask_const,
                           skip_image_pool=skip_image_pool,
                           fused_scores=fused_scores)
        if nms is None:
            return out
        from yoloclip_tpu.ops.nms import batched_nms
        kw = dict(nms)
        conf = kw.pop('conf_threshold', 0.25)
        iou = kw.pop('iou_threshold', 0.45)
        return batched_nms(out['boxes'], out['scores'], out['class_ids'],
                           conf, iou, **kw)

    return forward
