"""Composite YOLO-CLIP detection model (NHWC, flax).

Behavioral contract from
`/root/reference/yolo_clip_detector/model/yolo_clip.py:16-223`: backbone ->
RepVL-PAN (text fused both directions) -> per-level contrastive heads
(similarity vs text) + separate BoxHead (DFL decode) -> output dict with
boxes (B,A,4), scores (B,A) = per-anchor max cosine similarity (raw,
NO sigmoid -- conf threshold 0.25 applies to the cosine scale), class_ids
(B,A), obj_embeddings (B,A,E), text_embeddings (B,C,E) post-I-Pooling, and
the raw per-level box maps for the loss.

TPU-first redesign vs the reference:
  * Text encoding is NOT part of this module. The CLIP text tower runs once
    per vocabulary (see `yoloclip_tpu/text/`), and this graph takes the
    `(num_classes, embed_dim)` matrix as a plain input -- so the whole
    detector is one static-shape jitted program, and vocabulary swaps are
    just new input arrays (no retrace when num_classes is unchanged).
    The reference re-encodes prompts inside forward every step
    (`model/yolo_clip.py:130-165`).
  * Ragged vocabularies are padded to a bucket size with `class_mask`; the
    reference zero-pads without masking (`:153-162`) -- pass class_mask=None
    for exact reference behavior.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from yoloclip_tpu.config import ModelConfig
from yoloclip_tpu.models.backbone import YOLOv8Backbone
from yoloclip_tpu.models.heads import (BoxHead, TextContrastiveHead,
                                       decode_boxes)
from yoloclip_tpu.models.neck import RepVLPAN


class YOLOCLIP(nn.Module):
    cfg: ModelConfig = ModelConfig()

    @nn.compact
    def __call__(self, images: jax.Array, text_embeddings: jax.Array,
                 train: bool = False,
                 class_mask: Optional[jax.Array] = None,
                 with_aux_box: bool = False,
                 skip_image_pool: bool = False,
                 fused_scores: bool = False) -> Dict[str, jax.Array]:
        """images: (B,H,W,3) float in [0,1]; text_embeddings: (B,C,E) or (C,E).

        fused_scores=True (inference, shared vocab only) computes
        scores/class_ids with the Pallas streaming max kernel
        (`ops/pallas/similarity.py`) and omits the `similarity` output: the
        (B, A, C) tensor -- 1.3 GB HBM round-trip at LVIS scale -- is never
        materialized.
        """
        cfg = self.cfg
        dt = jnp.bfloat16 if cfg.dtype == 'bfloat16' else jnp.float32
        B = images.shape[0]

        # alpha > 0 strictly: argmax(alpha*s+beta) == argmax(s) needs it
        use_fused = (fused_scores and class_mask is None
                     and cfg.cls_alpha > 0)
        if text_embeddings.ndim == 2:   # offline vocab broadcast, ref :121-123
            text_embeddings = jnp.broadcast_to(
                text_embeddings[None], (B,) + text_embeddings.shape)
        if class_mask is not None and class_mask.ndim == 1:
            class_mask = jnp.broadcast_to(class_mask[None],
                                          (B,) + class_mask.shape)

        feats = YOLOv8Backbone(cfg.backbone_variant, dtype=dt, quant=cfg.quant,
                               stem_s2d=cfg.stem_s2d,
                               stem_u8_s2d=cfg.stem_u8_s2d,
                               name='backbone')(images.astype(dt), train)

        fc = tuple(cfg.feature_channels())
        pan_feats, text_embeddings = RepVLPAN(
            fc, fc, cfg.embed_dim, cfg.neck_bottlenecks, dtype=dt,
            quant=cfg.quant,
            name='neck')(feats, text_embeddings, train, class_mask,
                         skip_image_pool)

        if use_fused:
            from yoloclip_tpu.ops.pallas.similarity import (
                fused_projected_similarity_argmax)
            txt = text_embeddings.astype(jnp.float32)
            txt_n = txt / jnp.maximum(jnp.linalg.norm(
                txt, axis=-1, keepdims=True), 1e-12)

        sims, obj_embeds, aux_box = [], [], []
        fold_s, fold_ids = [], []
        for i, feat in enumerate(pan_feats):
            head = TextContrastiveHead(
                cfg.embed_dim, cfg.hidden_dim, cfg.reg_max,
                cfg.cls_alpha, cfg.cls_beta, dtype=dt, quant=cfg.quant,
                name=f'contrastive_heads_{i}')
            if use_fused:
                # Projection-folded Pallas scoring, PER LEVEL: the obj_2
                # projection (hidden -> E) moves to the text side, so
                # neither the (B, A, E) obj tensor, the level concat nor
                # the (B, A, C) similarity is ever materialized. Per-image
                # text: I-Pooling makes text embeddings image-dependent,
                # so the kernel batches over B (never text[0]).
                obj, box, (h2, k2, b2) = head(
                    feat, train, with_box=with_aux_box, return_hidden=True)
                Bh, Hh, Wh, Kh = h2.shape
                s_i, id_i = fused_projected_similarity_argmax(
                    h2.reshape(Bh, Hh * Wh, Kh), txt_n, k2, b2)
                fold_s.append(s_i)
                fold_ids.append(id_i)
            else:
                obj, box = head(feat, train, with_box=with_aux_box)
                sim = head.compute_similarity(obj, text_embeddings)
                if class_mask is not None:
                    sim = jnp.where(class_mask[:, None, :], sim, -jnp.inf)
                sims.append(sim)                             # (B,HW,C) fp32
            Bh, H, W, E = obj.shape
            obj_embeds.append(obj.reshape(Bh, H * W, E))
            if with_aux_box:
                aux_box.append(box)

        box_preds = BoxHead(len(pan_feats), cfg.hidden_dim, cfg.reg_max,
                            dtype=dt, quant=cfg.quant,
                            name='box_head')(pan_feats, train)
        boxes = decode_boxes(box_preds, cfg.strides, cfg.reg_max)

        obj_cat = jnp.concatenate(obj_embeds, axis=1)       # compute dtype
        # fp32 copy only for the output contract; serve graphs drop
        # obj_embeddings (e.g. one-program NMS deploy) and XLA dead-code-
        # eliminates this cast AND, in the fused path, the obj_2
        # projection itself (the folded kernel reads the hidden maps)
        obj_embeddings = obj_cat.astype(jnp.float32)

        if use_fused:
            s = jnp.concatenate(fold_s, axis=1)              # (B, A) fp32
            class_ids = jnp.concatenate(fold_ids, axis=1)
            scores = cfg.cls_alpha * s + cfg.cls_beta
            similarity = None
        else:
            similarity = jnp.concatenate(sims, axis=1)      # (B, A, C)
            scores = jnp.max(similarity, axis=-1)           # (B, A)
            class_ids = jnp.argmax(similarity, axis=-1)     # (B, A)

        out = {
            'boxes': boxes,                       # (B, A, 4) xyxy, input px
            'scores': scores,                     # (B, A) raw cosine scale
            'class_ids': class_ids,               # (B, A)
            'obj_embeddings': obj_embeddings,     # (B, A, E)
            'text_embeddings': text_embeddings.astype(jnp.float32),
            'box_preds': box_preds,               # list of (B,H,W,68) raw
        }
        if similarity is not None:
            out['similarity'] = similarity        # (B, A, C) -- rebuild extra
        if with_aux_box:
            out['aux_box_preds'] = aux_box
        return out
