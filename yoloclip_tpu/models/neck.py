"""RepVL-PAN: vision-language path aggregation network (NHWC, flax).

Behavioral contract from
`/root/reference/yolo_clip_detector/model/repvl_pan.py:33-300`:
  * ImagePoolingAttention first: 3x3 adaptive max pool per level -> 27 patch
    tokens -> linear projections to embed_dim -> 8-head MHA with text as
    query -> residual add onto the text embeddings (`repvl_pan.py:140-182`).
  * FPN top-down: 1x1 lateral convs keeping channels, nearest x2 upsample,
    1x1 channel-adjust convs, ADDITION (not concat) (`repvl_pan.py:262-281`).
  * 3x3 fpn convs, then bottom-up PAN with stride-2 downsample convs and a
    TextGuidedCSPLayer at each of the 3 levels (`repvl_pan.py:283-298`).
  * Max-sigmoid text attention inside every bottleneck iteration: project
    text to hidden dim, scores = feat @ text^T, max over classes, sigmoid,
    multiply (`repvl_pan.py:72-95`).

Rebuild notes (deliberate divergences):
  * The reference hard-codes the I-Pool projections to the 'n'-variant
    channel widths (64/128/256), crashing variants s/m/l (`repvl_pan.py:
    134-138`, SURVEY bug #7). Here the projections take the actual level
    channels, so every variant works; for 'n' the math is identical.
  * `reparameterize` (a stub in the reference, `repvl_pan.py:302-315`) is
    implemented for real in `yoloclip_tpu/ops/reparam.py`: with an offline
    vocabulary the text projections fold into constants.
  * Optional `class_mask` input masks padded vocabulary rows out of the
    max-over-classes reduction (the reference zero-pads ragged vocabularies,
    `model/yolo_clip.py:153-162`, which silently lets zero rows win when all
    real scores are negative; masking is exact under jit's static shapes).
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from yoloclip_tpu.models.layers import (ConvBlock, DarkBottleneck,
                                        MultiHeadAttention,
                                        adaptive_max_pool_2d)


def upsample_nearest_2x(x: jax.Array) -> jax.Array:
    """Nearest-neighbor x2 upsample, NHWC. torch nn.Upsample(scale=2) equiv."""
    B, H, W, C = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (B, H, 2, W, 2, C))
    return x.reshape(B, 2 * H, 2 * W, C)


class TextGuidedCSPLayer(nn.Module):
    """CSP layer with max-sigmoid text attention. Ref `repvl_pan.py:33-101`."""

    features: int
    n_bottlenecks: int = 1
    dtype: Any = jnp.float32
    quant: str = 'none'

    @nn.compact
    def __call__(self, x: jax.Array, text_embeddings: jax.Array,
                 train: bool = False,
                 class_mask: Optional[jax.Array] = None) -> jax.Array:
        """x: (B,H,W,Cin); text_embeddings: (B,num_classes,text_dim)."""
        c_ = self.features // 2
        dt, q = self.dtype, self.quant
        y1 = ConvBlock(c_, 1, dtype=dt, quant=q, name='cv1')(x, train)

        # Text projection is iteration-independent in the reference (a single
        # nn.Linear applied inside the loop, `repvl_pan.py:55,77`); hoist it.
        proj = nn.Dense(c_, dtype=dt, param_dtype=jnp.float32,
                        name='text_proj')(text_embeddings)  # (B, C, c_)

        B = x.shape[0]
        for i in range(self.n_bottlenecks):
            y1 = DarkBottleneck(c_, True, dtype=dt, quant=q,
                                name=f'bottlenecks_{i}')(y1, train)
            # scores: (B, H, W, num_classes) = feat . projected_text
            scores = jnp.einsum('bhwc,bnc->bhwn', y1, proj,
                                preferred_element_type=jnp.float32)
            if class_mask is not None:
                scores = jnp.where(class_mask[:, None, None, :], scores,
                                   -jnp.inf)
            max_scores = jnp.max(scores, axis=-1, keepdims=True)
            y1 = y1 * jax.nn.sigmoid(max_scores).astype(dt)

        y2 = ConvBlock(c_, 1, dtype=dt, quant=q, name='cv2')(x, train)
        y = jnp.concatenate([y1, y2], axis=-1)
        return ConvBlock(self.features, 1, dtype=dt, quant=q,
                         name='cv3')(y, train)


class ImagePoolingAttention(nn.Module):
    """Update text embeddings from pooled image context. Ref `repvl_pan.py:119-182`."""

    embed_dim: int
    num_heads: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, text_embeddings: jax.Array,
                 feature_maps: Sequence[jax.Array]) -> jax.Array:
        dt = self.dtype
        tokens = []
        for i, fm in enumerate(feature_maps):
            pooled = adaptive_max_pool_2d(fm, (3, 3))       # (B,3,3,C)
            B, _, _, C = pooled.shape
            patch = pooled.reshape(B, 9, C)
            patch = nn.Dense(self.embed_dim, dtype=dt, param_dtype=jnp.float32,
                             name=f'projections_{i}')(patch)
            tokens.append(patch)
        all_tokens = jnp.concatenate(tokens, axis=1)         # (B,27,E)
        updated = MultiHeadAttention(self.embed_dim, self.num_heads,
                                     dtype=dt, name='mha')(
            text_embeddings.astype(dt), all_tokens, all_tokens)
        return text_embeddings + updated


class RepVLPAN(nn.Module):
    """Ref `repvl_pan.py:185-300` (forward graph identical; see module doc)."""

    in_channels: Tuple[int, ...]
    out_channels: Tuple[int, ...]
    text_dim: int = 512
    n_bottlenecks: int = 1
    dtype: Any = jnp.float32
    quant: str = 'none'

    @nn.compact
    def __call__(self, features: Sequence[jax.Array],
                 text_embeddings: jax.Array, train: bool = False,
                 class_mask: Optional[jax.Array] = None,
                 skip_image_pool: bool = False
                 ) -> Tuple[List[jax.Array], jax.Array]:
        assert len(features) == 3, "RepVLPAN requires (C3, C4, C5)"
        dt, q = self.dtype, self.quant
        ic, oc = self.in_channels, self.out_channels

        # 1. image -> text fusion (dropped in reparameterized deploy mode,
        #    see ops/reparam.py; params still created for checkpoint parity)
        ipa = ImagePoolingAttention(self.text_dim, dtype=dt,
                                    name='image_pooling_attention')
        updated = ipa(text_embeddings, features)
        if not skip_image_pool:
            text_embeddings = updated
        # else: `updated` is unused and XLA dead-code-eliminates the whole
        # I-Pool subgraph; the call still ran so flax creates its params.

        # 2. laterals (channel-preserving 1x1)
        laterals = [
            ConvBlock(ic[i], 1, dtype=dt, quant=q,
                      name=f'lateral_convs_{i}')(features[i], train)
            for i in range(3)
        ]

        # 3. FPN top-down with channel-adjusted nearest upsampling + ADD
        p5 = laterals[2]
        p5_up = ConvBlock(ic[1], 1, dtype=dt, quant=q, name='up_channels_0')(
            upsample_nearest_2x(p5), train)
        p4 = laterals[1] + p5_up
        p4_up = ConvBlock(ic[0], 1, dtype=dt, quant=q, name='up_channels_1')(
            upsample_nearest_2x(p4), train)
        p3 = laterals[0] + p4_up

        fpn = [
            ConvBlock(oc[i], 3, dtype=dt, quant=q,
                      name=f'fpn_convs_{i}')(f, train)
            for i, f in enumerate([p3, p4, p5])
        ]

        # 4. bottom-up PAN with text guidance
        n3 = TextGuidedCSPLayer(oc[0], self.n_bottlenecks, dtype=dt,
                                quant=q, name='text_csplayers_0')(
            fpn[0], text_embeddings, train, class_mask)
        d3 = ConvBlock(oc[1], 3, 2, dtype=dt, quant=q, name='downsample_convs_0')(
            n3, train)
        n4 = TextGuidedCSPLayer(oc[1], self.n_bottlenecks, dtype=dt,
                                quant=q, name='text_csplayers_1')(
            fpn[1] + d3, text_embeddings, train, class_mask)
        d4 = ConvBlock(oc[2], 3, 2, dtype=dt, quant=q, name='downsample_convs_1')(
            n4, train)
        n5 = TextGuidedCSPLayer(oc[2], self.n_bottlenecks, dtype=dt,
                                quant=q, name='text_csplayers_2')(
            fpn[2] + d4, text_embeddings, train, class_mask)

        return [n3, n4, n5], text_embeddings
