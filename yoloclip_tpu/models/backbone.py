"""YOLOv8 CSPDarknet backbone (NHWC, flax).

Behavioral contract from
`/root/reference/yolo_clip_detector/model/backbones/yolov8.py:93-179`:
variant width/depth multipliers, channel table max(int(c*w),16) over
[64,128,256,512,1024], depths max(int(d*dm),1) over [1,2,4,8], stem + 4
stages each starting with a stride-2 conv, SPPF closing stage 4, and the
(c3, c4, c5) multi-scale outputs at strides 8/16/32.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from yoloclip_tpu.config import VARIANT_CONFIGS
from yoloclip_tpu.models.layers import ConvBlock, CSPLayer, SPPF


class YOLOv8Backbone(nn.Module):
    variant: str = 'n'
    dtype: Any = jnp.float32
    quant: str = 'none'
    stem_s2d: bool = False
    # serve-only input layout: x is the uint8-scaled (B, H/2, W/2, 12)
    # space-to-depth canvas from letterbox_batch_u8_s2d; the stem folds
    # the /255 into its kernel (ConvBlock.s2d_pre)
    stem_u8_s2d: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False
                 ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """x: (B, H, W, 3) float -> (c3, c4, c5) at strides 8/16/32."""
        wm = VARIANT_CONFIGS[self.variant]['width']
        dm = VARIANT_CONFIGS[self.variant]['depth']
        ch = [max(int(c * wm), 16) for c in [64, 128, 256, 512, 1024]]
        dp = [max(int(d * dm), 1) for d in [1, 2, 4, 8]]
        dt, q = self.dtype, self.quant

        # store_out=True marks edges whose EVERY consumer is QT-aware AND
        # single-consumer: candidates for int8-stored HBM edges in the
        # int8 deploy graph. INERT at the default element threshold --
        # whole-graph benching measured int8 edges net-negative on v5e
        # (see layers.STORE_INT8_MIN_ELEMS); the markers remain for
        # env-gated experimentation. A conv feeding a CSPLayer is read
        # TWICE (cv1 + cv2): storing such an edge measured SLOWER e2e --
        # with two consumers XLA materializes the dequantized tensor as
        # its own pass instead of fusing the dequant into each reader,
        # adding a full extra HBM round trip -- so stage{1..4}_conv stay
        # unmarked; only the csp.cv3 -> next downsample conv edges (one
        # consumer) and stem -> stage1_conv qualify. c3/c4 feed the neck
        # (not QT-aware) -> never storable.
        x = ConvBlock(ch[0], 3, 2, dtype=dt, quant=q, store_out=True,
                      s2d=self.stem_s2d, s2d_pre=self.stem_u8_s2d,
                      name='stem')(x, train)

        x = ConvBlock(ch[1], 3, 2, dtype=dt, quant=q,
                      name='stage1_conv')(x, train)
        x = CSPLayer(ch[1], dp[0], dtype=dt, quant=q, store_out=True,
                     name='stage1_csp')(x, train)

        x = ConvBlock(ch[2], 3, 2, dtype=dt, quant=q,
                      name='stage2_conv')(x, train)
        c3 = CSPLayer(ch[2], dp[1], dtype=dt, quant=q, name='stage2_csp')(x, train)

        x = ConvBlock(ch[3], 3, 2, dtype=dt, quant=q,
                      name='stage3_conv')(c3, train)
        c4 = CSPLayer(ch[3], dp[2], dtype=dt, quant=q, name='stage3_csp')(x, train)

        x = ConvBlock(ch[4], 3, 2, dtype=dt, quant=q,
                      name='stage4_conv')(c4, train)
        x = CSPLayer(ch[4], dp[3], dtype=dt, quant=q, store_out=True,
                     name='stage4_csp')(x, train)
        c5 = SPPF(ch[4], ch[4], 5, dtype=dt, quant=q, name='stage4_sppf')(x, train)

        return c3, c4, c5
