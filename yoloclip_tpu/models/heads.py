"""Detection heads (NHWC, flax) + DFL box decode.

Behavioral contracts:
  * TextContrastiveHead: obj-embed tower Conv3x3(C->256) -> Conv3x3(256->256)
    -> Conv1x1(256->512) plus a parallel DFL box tower to 4*(reg_max+1)
    channels (`/root/reference/yolo_clip_detector/model/heads/
    text_contrastive.py:64-75`); similarity = L2-normalized cosine
    obj @ text^T, affine alpha*sim+beta (`:119-153`).
  * BoxHead: same tower shape per level to 68 channels
    (`model/heads/box_head.py:55-61`); decode = per-coordinate softmax over
    reg_max+1 bins -> expectation -> xy=(grid+offset)*stride,
    wh=exp(val)*stride -> xyxy (`box_head.py:179-214`). NOTE: this is the
    reference's non-standard exp-wh decode (SURVEY bug #3) and is reproduced
    exactly for parity.

The decode here is a pure function of the raw head maps so the same code
serves the jitted inference graph and the training loss path.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from yoloclip_tpu.models.layers import ConvBlock


class Proj1x1(nn.Module):
    """1x1 conv with the same param tree/init/math as `nn.Conv(f, (1, 1))`
    (kernel (1,1,Cin,Cout) HWIO + bias), but whose weights are also
    retrievable via `weights()` so the composite can FOLD the projection
    into the text side of the similarity (`ops/pallas/similarity.py::
    fused_projected_similarity_argmax`) instead of materializing the
    (B, A, E) obj embeddings in serve graphs."""

    features: int
    in_features: int
    dtype: Any = jnp.float32

    def setup(self):
        self.kernel = self.param(
            'kernel', nn.initializers.lecun_normal(),
            (1, 1, self.in_features, self.features), jnp.float32)
        self.bias = self.param('bias', nn.initializers.zeros,
                               (self.features,), jnp.float32)

    def __call__(self, x: jax.Array) -> jax.Array:
        dt = self.dtype
        y = jax.lax.conv_general_dilated(
            x.astype(dt), self.kernel.astype(dt), (1, 1), 'VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        return y + self.bias.astype(dt)

    def weights(self) -> Tuple[jax.Array, jax.Array]:
        """(kernel (Cin, Cout), bias (Cout,)) in fp32."""
        return self.kernel[0, 0], self.bias


class TextContrastiveHead(nn.Module):
    """Per-level region-embedding (+ auxiliary DFL) head."""

    embed_dim: int = 512
    hidden_dim: int = 256
    reg_max: int = 16
    cls_alpha: float = 1.0
    cls_beta: float = 0.0
    dtype: Any = jnp.float32
    quant: str = 'none'

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 with_box: bool = False, return_hidden: bool = False
                 ) -> Tuple[jax.Array, ...]:
        """x: (B,H,W,C) -> (obj_embed (B,H,W,E), box_preds or None).

        The composite model never consumes this head's box tower
        (`model/yolo_clip.py:179` discards it); we keep the parameters for
        checkpoint-surface parity but skip the FLOPs unless asked.

        return_hidden=True appends (h, kernel, bias) — the pre-projection
        hidden map and the obj_2 projection params — so the caller can run
        the projection-folded fused scoring (the (B,H,W,E) `obj` is still
        returned for the output contract; XLA dead-code-eliminates it in
        serve graphs that only consume scores/class_ids).
        """
        dt, q = self.dtype, self.quant
        h = ConvBlock(self.hidden_dim, 3, dtype=dt, quant=q,
                      name='obj_0')(x, train)
        h = ConvBlock(self.hidden_dim, 3, dtype=dt, quant=q,
                      name='obj_1')(h, train)
        proj = Proj1x1(self.embed_dim, self.hidden_dim, dtype=dt,
                       name='obj_2')
        obj = proj(h)
        box = None
        if with_box:
            b = ConvBlock(self.hidden_dim, 3, dtype=dt, quant=q,
                          name='box_0')(x, train)
            b = ConvBlock(self.hidden_dim, 3, dtype=dt, quant=q,
                          name='box_1')(b, train)
            box = nn.Conv(4 * (self.reg_max + 1), (1, 1), dtype=dt,
                          param_dtype=jnp.float32, name='box_2')(b)
        if return_hidden:
            kernel, bias = proj.weights()
            return obj, box, (h, kernel, bias)
        return obj, box

    def compute_similarity(self, obj_embed: jax.Array,
                           text_embed: jax.Array) -> jax.Array:
        """Cosine similarity map. Ref `text_contrastive.py:119-153`.

        obj_embed: (B,H,W,E); text_embed: (B,num_classes,E)
        returns (B, H*W, num_classes) in fp32 (raw cosine scale, NO sigmoid).
        """
        return compute_similarity(obj_embed, text_embed,
                                  self.cls_alpha, self.cls_beta)


def compute_similarity(obj_embed: jax.Array, text_embed: jax.Array,
                       cls_alpha: float = 1.0,
                       cls_beta: float = 0.0) -> jax.Array:
    B, H, W, E = obj_embed.shape
    obj = obj_embed.reshape(B, H * W, E).astype(jnp.float32)
    txt = text_embed.astype(jnp.float32)
    obj = obj / jnp.maximum(
        jnp.linalg.norm(obj, axis=-1, keepdims=True), 1e-12)
    txt = txt / jnp.maximum(
        jnp.linalg.norm(txt, axis=-1, keepdims=True), 1e-12)
    sim = jnp.einsum('bre,bce->brc', obj, txt,
                     preferred_element_type=jnp.float32)
    return cls_alpha * sim + cls_beta


class BoxHead(nn.Module):
    """Per-level DFL box towers. Ref `box_head.py:31-113`."""

    num_levels: int = 3
    hidden_dim: int = 256
    reg_max: int = 16
    dtype: Any = jnp.float32
    quant: str = 'none'

    @nn.compact
    def __call__(self, features: Sequence[jax.Array], train: bool = False
                 ) -> List[jax.Array]:
        """features: list of (B,H,W,C) -> list of raw (B,H,W,4*(reg_max+1))."""
        assert len(features) == self.num_levels
        dt, q = self.dtype, self.quant
        preds = []
        for i, feat in enumerate(features):
            h = ConvBlock(self.hidden_dim, 3, dtype=dt, quant=q,
                          name=f'box_convs_{i}_0')(feat, train)
            h = ConvBlock(self.hidden_dim, 3, dtype=dt, quant=q,
                          name=f'box_convs_{i}_1')(h, train)
            p = nn.Conv(4 * (self.reg_max + 1), (1, 1), dtype=dt,
                        param_dtype=jnp.float32,
                        name=f'box_convs_{i}_2')(h)
            preds.append(p)
        return preds


def dfl_expectation(pred: jax.Array, reg_max: int) -> jax.Array:
    """Raw (B,H,W,4*(reg_max+1)) -> expected reg values (B,H,W,4).

    Per-coordinate softmax over reg_max+1 bins then expectation against
    bin indices 0..reg_max. Ref `box_head.py:179-192`. fp32 for stability.
    """
    B, H, W, C = pred.shape
    nbins = reg_max + 1
    assert C == 4 * nbins
    p = pred.reshape(B, H, W, 4, nbins).astype(jnp.float32)
    p = jax.nn.softmax(p, axis=-1)
    bins = jnp.arange(nbins, dtype=jnp.float32)
    return jnp.sum(p * bins, axis=-1)   # (B,H,W,4)


def decode_boxes(box_preds: Sequence[jax.Array],
                 strides: Sequence[int], reg_max: int = 16) -> jax.Array:
    """Decode per-level raw DFL maps to xyxy boxes, concatenated over levels.

    Exact reference math (`box_head.py:150-218`):
        xy_center = (grid_xy + reg[:2]) * stride
        wh        = exp(reg[2:]) * stride
        box       = [cx - w/2, cy - h/2, cx + w/2, cy + h/2]
    Level-major, row-major (y*W + x) anchor order -> (B, total_anchors, 4).
    """
    out = []
    for pred, stride in zip(box_preds, strides):
        B, H, W, _ = pred.shape
        reg = dfl_expectation(pred, reg_max)               # (B,H,W,4)
        gy, gx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                              jnp.arange(W, dtype=jnp.float32), indexing='ij')
        grid_xy = jnp.stack([gx, gy], axis=-1)             # (H,W,2)
        xy = (grid_xy[None] + reg[..., :2]) * float(stride)
        wh = jnp.exp(reg[..., 2:]) * float(stride)
        boxes = jnp.concatenate([xy - wh / 2, xy + wh / 2], axis=-1)
        out.append(boxes.reshape(B, H * W, 4))
    return jnp.concatenate(out, axis=1)
