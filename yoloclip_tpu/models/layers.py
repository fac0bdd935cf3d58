"""Shared building blocks, NHWC / flax.linen.

Behavioral contracts come from the reference (cited per class); the
implementation is TPU-idiomatic: NHWC layout so XLA tiles convs onto the MXU,
compute dtype configurable (bf16 on TPU), BatchNorm with torch-compatible
statistics (eps=1e-5, running-stat momentum equivalent to torch's 0.1).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class QT(NamedTuple):
    """An int8-stored activation edge: HBM tensor `q` (int8) + its
    symmetric dequant scale. Produced by ConvBlock(store_out=True) in the
    int8 deploy graph so large inter-block activations cross HBM at half
    the bf16 byte cost; consumers dequantize on read (XLA fuses the
    elementwise dequant into the consumer, so the HBM read stays int8).
    Measured on v5e (benchmarks/probe_int8_edges.py): 1.32x on the big
    early edges (c32@160, 52 MB at bs=32); a LOSS on small/deep edges
    (0.88x at c64@80) -- hence the element threshold below."""
    q: jax.Array
    scale: jax.Array


# Per-SAMPLE output elements (H*W*C) above which an int8-stored edge is
# allowed. DISABLED by default: although the isolated-chain probe
# (benchmarks/probe_int8_edges.py) measured 1.32x on c32@160 edges, the
# FULL deploy graph measured a consistent ~17% e2e LOSS on v5e with any
# edge stored (1319/1304 vs 1581 img/s at bs=32/640px int8 'n' -- with
# every storable edge, and with only the single-consumer
# stage1_csp.cv3->stage2_conv edge, respectively). The isolated win does
# not survive whole-graph compilation (int8 NHWC relayout copies / lost
# producer fusion around the CSP concat are the suspects). The machinery
# stays for experimentation via YOLOCLIP_STORE_INT8_MIN_ELEMS.
import os as _os

STORE_INT8_MIN_ELEMS = int(_os.environ.get('YOLOCLIP_STORE_INT8_MIN_ELEMS',
                                           1 << 62))


def store_int8_eligible(h: int, w: int, c: int) -> bool:
    # c >= 32: int8 tensors tile as (32, 128) sublane x lane on TPU
    # (bf16 tiles (16, 128)), so an int8 edge with c < 32 pads to the
    # same physical bytes as bf16 and only adds quantize overhead.
    return c >= 32 and h * w * c >= STORE_INT8_MIN_ELEMS


def as_float(x: Union[jax.Array, 'QT'], dtype: Dtype) -> jax.Array:
    """Dequantize a QT edge (or pass a float array through)."""
    if isinstance(x, QT):
        return x.q.astype(dtype) * jnp.asarray(x.scale, dtype)
    return x

# W8A8 eligibility thresholds (see quant_eligible). Measured on v5e,
# bs=32 chained-conv probe, 2026-08: int8 wins 1.4-1.5x on wide 3x3 convs
# (c128@40 1.53x, c256@80 1.54x, c256@20 1.45x with bf16 epilogue), is
# break-even at c64 k3 (1.05x), and LOSES badly on narrow 1x1 convs
# (c32 k1 @160: 0.24x -- the requantize pass costs more than the conv).
# Wide 1x1 convs were probed too and are break-even at best (c128 k1
# 0.86-1.10x, c256/512 k1 1.00-1.02x), so k=1 is never eligible.
INT8_MIN_CH = 64
INT8_MAX_CH = 128


def quant_eligible(kernel_size: int, cin: int, cout: int) -> bool:
    """Static per-block policy for the W8A8 deploy path.

    True -> the block runs as an s8xs8->s32 MXU conv; False -> it runs as a
    BN-folded float conv (still faster than the unfused conv+BN train graph).
    `ops/quantize.py::quantize_variables` and `ConvBlock` both key off this
    exact predicate, so the transformed variables always match the traced
    graph. Blanket int8 was measured NET-NEGATIVE end-to-end (-20% and
    +43% HBM traffic by XLA cost analysis): the quantize/dequantize passes
    around narrow convs add more byte traffic than int8 storage saves.
    """
    return (kernel_size == 3 and min(cin, cout) >= INT8_MIN_CH
            and max(cin, cout) >= INT8_MAX_CH)


def space_to_depth2(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, H/2, W/2, 4C); channel index = (a*2+b)*C + c
    for intra-block offsets (a, b). H and W must be even."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H // 2, W // 2, 4 * C)


def s2d_kernel3(w3: jax.Array) -> jax.Array:
    """Rearrange a 3x3/stride-2 conv kernel into the EXACT equivalent
    2x2/stride-1 kernel over the space-to-depth input layout.

    For output (i, j): input row r = 2i + di - 1 (di in 0..2) lives in s2d
    row p = i - 1 + kh with intra-block offset a, where
    (di=0 -> kh=0, a=1), (di=1 -> kh=1, a=0), (di=2 -> kh=1, a=1); columns
    likewise. 7 of the 16 (kh, kw, a, b) taps are structurally zero. Use
    with padding ((1, 0), (1, 0)) to reproduce the 3x3 conv's
    padding=(1, 1) semantics.
    """
    kh_a = {0: (0, 1), 1: (1, 0), 2: (1, 1)}
    _, _, C, O = w3.shape
    w2 = jnp.zeros((2, 2, 4 * C, O), w3.dtype)
    for di in range(3):
        kh, a = kh_a[di]
        for dj in range(3):
            kw, b = kh_a[dj]
            ch = (a * 2 + b) * C
            w2 = w2.at[kh, kw, ch:ch + C].set(w3[di, dj])
    return w2


class _ConvKernel(nn.Module):
    """Bare conv kernel param in nn.Conv's tree layout ('conv'/'kernel'),
    for paths that must transform the kernel before lax.conv (the s2d
    stem) while staying checkpoint-compatible with nn.Conv."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self) -> jax.Array:
        return self.param('kernel', nn.initializers.lecun_normal(),
                          self.shape, jnp.float32)


class ConvBlock(nn.Module):
    """Conv(bias=False) + BatchNorm + SiLU.

    Ref: `/root/reference/yolo_clip_detector/model/backbones/yolov8.py:9-29`
    (same block re-declared in repvl_pan.py / heads). padding = k // 2.

    quant ('none' | 'calib' | 'calib_pct' | 'int8') selects the W8A8
    deploy path (`yoloclip_tpu/ops/quantize.py`):
      * 'calib': float path, but sow the input absmax into the
        'intermediates' collection (reduce=max over calls) for scale
        fitting; 'calib_pct' additionally sows the 99.9th |x| percentile
        for the outlier-clipping calibration scheme.
      * 'int8': SELECTIVE -- blocks passing `quant_eligible` (wide 3x3
        convs, where the MXU's doubled int8 rate wins ~1.5x) get params
        {wq int8 (BN pre-folded, per-out-channel scales), wscale, qbias,
        act_scale} and run quantize -> s8xs8->s32 conv -> dequant + SiLU;
        all other blocks get BN-folded float params {wf, fbias} (narrow
        convs lose up to 4x under int8 -- requantize overhead dominates).
        Interface stays float-in/float-out either way.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    dtype: Dtype = jnp.float32
    quant: str = 'none'
    # int8 deploy graph only: emit the post-SiLU output as an int8-stored
    # QT edge (when large enough per store_int8_eligible). Opt-IN per call
    # site: only blocks whose consumers are ConvBlocks (which dequantize
    # on read) or QT-aware set this -- see models/backbone.py.
    store_out: bool = False
    # Space-to-depth execution of a 3x3/stride-2 conv (the backbone stem):
    # the conv runs as an EXACT 2x2/stride-1 conv over the (H/2, W/2, 4C)
    # layout, turning an MXU-hostile C=3 contraction into a 12-channel
    # one (s2d_kernel3). Params keep the canonical (3,3,C,O) shape, so
    # checkpoints are interchangeable with the plain stem.
    s2d: bool = False
    # Input arrives ALREADY space-to-depth'd as a 0..255-scaled uint8
    # canvas (B, H/2, W/2, 4C) -- the device letterbox emits this layout
    # for free (`ops/preprocess.py::letterbox_batch_u8_s2d`) -- and the
    # /255 normalization folds into the kernel. Measured the only stem
    # layout that beats the plain 3x3/s2 conv on v5e (probe_stem.py:
    # 2.52 vs 3.09 ms/batch; the 1-byte HBM read + a 12-channel MXU
    # contraction). Params keep the canonical (3,3,C,O) shape.
    s2d_pre: bool = False

    def _use_s2d(self, k: int) -> bool:
        return self.s2d and k == 3 and self.stride == 2

    def _use_s2d_pre(self, k: int) -> bool:
        return self.s2d_pre and k == 3 and self.stride == 2

    def _store(self, y: jax.Array) -> Union[jax.Array, QT]:
        """int8 deploy egress: quantize+store when eligible (see QT)."""
        if not (self.store_out
                and store_int8_eligible(y.shape[1], y.shape[2],
                                        y.shape[3])):
            return y.astype(self.dtype)
        out_scale = self.param('out_scale', nn.initializers.ones,
                               (), jnp.float32)
        q = jnp.clip(jnp.round(y.astype(jnp.float32) / out_scale),
                     -127, 127).astype(jnp.int8)
        return QT(q, out_scale)

    @nn.compact
    def __call__(self, x: Union[jax.Array, QT],
                 train: bool = False) -> Union[jax.Array, QT]:
        p = self.kernel_size // 2
        if self.s2d and self.s2d_pre:
            raise ValueError('s2d and s2d_pre are mutually exclusive')
        if self.s2d_pre and not self._use_s2d_pre(self.kernel_size):
            # silently running a plain conv over the 0..255 s2d canvas
            # (no /255 fold, wrong layout) would be wrong math
            raise ValueError(
                's2d_pre requires kernel_size=3, stride=2 (got k=%d, s=%d)'
                % (self.kernel_size, self.stride))
        if self.s2d and not self._use_s2d(self.kernel_size):
            raise ValueError(
                's2d requires kernel_size=3, stride=2 (got k=%d, s=%d)'
                % (self.kernel_size, self.stride))
        if self.quant == 'int8':
            cin = (x.q if isinstance(x, QT) else x).shape[-1]
            k = self.kernel_size
            if self._use_s2d_pre(k):
                cin = cin // 4   # params stay canonical (3, 3, C, O)
            if not quant_eligible(k, cin, self.features):
                wf = self.param('wf', nn.initializers.zeros,
                                (k, k, cin, self.features), jnp.float32)
                fbias = self.param('fbias', nn.initializers.zeros,
                                   (self.features,), jnp.float32)
                xf = as_float(x, self.dtype).astype(self.dtype)
                if self._use_s2d_pre(k):
                    # uint8-scaled s2d input: fold the /255 into the
                    # (BN-pre-folded) kernel, fp32 fold then one cast
                    y = jax.lax.conv_general_dilated(
                        xf,
                        s2d_kernel3((wf * (1.0 / 255.0)).astype(self.dtype)),
                        (1, 1), ((1, 0), (1, 0)),
                        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                        preferred_element_type=jnp.float32)
                elif self._use_s2d(k):
                    y = jax.lax.conv_general_dilated(
                        space_to_depth2(xf),
                        s2d_kernel3(wf.astype(self.dtype)),
                        (1, 1), ((1, 0), (1, 0)),
                        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                        preferred_element_type=jnp.float32)
                else:
                    y = jax.lax.conv_general_dilated(
                        xf, wf.astype(self.dtype),
                        (self.stride, self.stride), ((p, p), (p, p)),
                        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                        preferred_element_type=jnp.float32)
                return self._store(nn.silu(y + fbias))
            # the wq path has no s2d rewrite; it is only unreachable for
            # the stem because cin=3 fails quant_eligible -- keep that
            # invariant explicit against future threshold changes
            assert not (self._use_s2d_pre(k) or self._use_s2d(k)), (
                's2d/s2d_pre blocks must not take the int8 wq path')
            wq = self.param('wq', nn.initializers.zeros,
                            (k, k, cin, self.features), jnp.int8)
            wscale = self.param('wscale', nn.initializers.ones,
                                (self.features,), jnp.float32)
            qbias = self.param('qbias', nn.initializers.zeros,
                               (self.features,), jnp.float32)
            act_scale = self.param('act_scale', nn.initializers.ones,
                                   (), jnp.float32)
            if isinstance(x, QT):
                # already int8 in HBM: consume directly (exact -- the
                # dequant scale just rides the epilogue) and skip the
                # quantize pass entirely
                xq, in_scale = x.q, x.scale
            else:
                in_scale = act_scale
                xq = jnp.clip(jnp.round(x.astype(jnp.float32) / act_scale),
                              -127, 127).astype(jnp.int8)
            acc = jax.lax.conv_general_dilated(
                xq, wq, (self.stride, self.stride), ((p, p), (p, p)),
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                preferred_element_type=jnp.int32)
            y = acc.astype(jnp.float32) * (wscale * in_scale) + qbias
            return self._store(nn.silu(y))

        if self.quant in ('calib', 'calib_pct'):
            ax = jnp.abs(x.astype(jnp.float32))
            self.sow('intermediates', 'in_amax', jnp.max(ax),
                     reduce_fn=jnp.maximum,
                     init_fn=lambda: jnp.zeros((), jnp.float32))
            if self.quant == 'calib_pct':
                # 99.9th percentile of |x| (per batch, max-reduced across
                # batches): the outlier-clipping calibration
                # (`ops/quantize.py` calibration='percentile'). A full
                # sort per block, so it lives behind its own calib mode
                # rather than slowing the default max-abs path.
                self.sow('intermediates', 'in_p999',
                         jnp.quantile(ax, 0.999).astype(jnp.float32),
                         reduce_fn=jnp.maximum,
                         init_fn=lambda: jnp.zeros((), jnp.float32))
        if self._use_s2d_pre(self.kernel_size):
            kernel = _ConvKernel(
                (self.kernel_size, self.kernel_size, x.shape[-1] // 4,
                 self.features), name='conv')()
            x = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                s2d_kernel3((kernel * (1.0 / 255.0)).astype(self.dtype)),
                (1, 1), ((1, 0), (1, 0)),
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        elif self._use_s2d(self.kernel_size):
            cin = x.shape[-1]
            kernel = _ConvKernel(
                (self.kernel_size, self.kernel_size, cin, self.features),
                name='conv')()
            x = jax.lax.conv_general_dilated(
                space_to_depth2(x.astype(self.dtype)),
                s2d_kernel3(kernel.astype(self.dtype)),
                (1, 1), ((1, 0), (1, 0)),
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        else:
            x = nn.Conv(
                self.features,
                (self.kernel_size, self.kernel_size),
                strides=(self.stride, self.stride),
                padding=((p, p), (p, p)),
                use_bias=False,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name='conv',
            )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,        # torch BatchNorm2d momentum=0.1 equivalent
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name='bn',
        )(x)
        y = nn.silu(x)
        if (self.quant in ('calib', 'calib_pct') and self.store_out
                and store_int8_eligible(y.shape[1], y.shape[2],
                                        y.shape[3])):
            # record the post-SiLU range so quantize_variables can fit
            # this block's out_scale (int8-stored edge); 'out_store'
            # flags the decision so the transform mirrors the traced
            # int8 graph exactly
            self.sow('intermediates', 'out_amax',
                     jnp.max(jnp.abs(y.astype(jnp.float32))),
                     reduce_fn=jnp.maximum,
                     init_fn=lambda: jnp.zeros((), jnp.float32))
            self.sow('intermediates', 'out_store', jnp.float32(1.0),
                     reduce_fn=jnp.maximum,
                     init_fn=lambda: jnp.zeros((), jnp.float32))
        return y


class DarkBottleneck(nn.Module):
    """1x1 squeeze -> 3x3 expand, optional residual.

    Ref: `yolov8.py:32-44` (and identical copy `repvl_pan.py:104-116`).
    Residual only when in_channels == out_channels and shortcut=True.
    """

    features: int
    shortcut: bool = True
    dtype: Dtype = jnp.float32
    quant: str = 'none'

    @nn.compact
    def __call__(self, x: Union[jax.Array, QT],
                 train: bool = False) -> jax.Array:
        cin = (x.q if isinstance(x, QT) else x).shape[-1]
        # cv1 -> cv2 is a ConvBlock -> ConvBlock edge: storable; cv2's
        # output feeds the residual add / concat, so never stored
        y = ConvBlock(self.features // 2, 1, dtype=self.dtype,
                      quant=self.quant, store_out=True,
                      name='cv1')(x, train)
        y = ConvBlock(self.features, 3, dtype=self.dtype,
                      quant=self.quant, name='cv2')(y, train)
        if self.shortcut and cin == self.features:
            return as_float(x, self.dtype) + y
        return y


class CSPLayer(nn.Module):
    """Cross Stage Partial layer. Ref: `yolov8.py:47-69`.

    y1 = bottlenecks(cv1(x)); y2 = cv2(x); out = cv3(concat(y1, y2)).
    """

    features: int
    n_bottlenecks: int = 1
    dtype: Dtype = jnp.float32
    quant: str = 'none'
    # whether cv3's output (this layer's output) may be int8-stored --
    # True ONLY when the caller guarantees every consumer handles QT
    # (e.g. the next backbone downsample ConvBlock)
    store_out: bool = False

    @nn.compact
    def __call__(self, x: Union[jax.Array, QT],
                 train: bool = False) -> Union[jax.Array, QT]:
        c_ = self.features // 2
        # cv1 feeds a DarkBottleneck whose residual add reads the input a
        # SECOND time (cin == features here, so the shortcut is always
        # active) -> double-consumer edge, not storable (same measured
        # regression class as the stage convs; see backbone.py). cv2
        # feeds the concat -> float.
        y1 = ConvBlock(c_, 1, dtype=self.dtype, quant=self.quant,
                       name='cv1')(x, train)
        for i in range(self.n_bottlenecks):
            y1 = DarkBottleneck(c_, True, dtype=self.dtype, quant=self.quant,
                                name=f'bottlenecks_{i}')(y1, train)
        y2 = ConvBlock(c_, 1, dtype=self.dtype, quant=self.quant,
                       name='cv2')(x, train)
        y = jnp.concatenate([as_float(y1, self.dtype), y2], axis=-1)
        return ConvBlock(self.features, 1, dtype=self.dtype, quant=self.quant,
                         store_out=self.store_out, name='cv3')(y, train)


def max_pool_same(x: jax.Array, k: int) -> jax.Array:
    """k x k max pool, stride 1, 'same' padding (pad value -inf like torch)."""
    p = k // 2
    return nn.max_pool(x, (k, k), strides=(1, 1), padding=((p, p), (p, p)))


class SPPF(nn.Module):
    """Spatial Pyramid Pooling - Fast. Ref: `yolov8.py:72-90`.

    cv1 to in//2, three chained 5x5 maxpools, concat(x, y1, y2, y3), cv2.
    """

    features: int
    in_features: int
    kernel_size: int = 5
    dtype: Dtype = jnp.float32
    quant: str = 'none'

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c_ = self.in_features // 2
        x = ConvBlock(c_, 1, dtype=self.dtype, quant=self.quant,
                      name='cv1')(x, train)
        y1 = max_pool_same(x, self.kernel_size)
        y2 = max_pool_same(y1, self.kernel_size)
        y3 = max_pool_same(y2, self.kernel_size)
        y = jnp.concatenate([x, y1, y2, y3], axis=-1)
        return ConvBlock(self.features, 1, dtype=self.dtype, quant=self.quant,
                         name='cv2')(y, train)


def adaptive_max_pool_2d(x: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """torch.nn.AdaptiveMaxPool2d semantics on NHWC input.

    Output cell (i, j) maxes over rows [floor(i*H/oh), ceil((i+1)*H/oh)) and
    cols likewise. Shapes are static, so the window slices are compile-time
    constants (ref usage: 3x3 pooling in `repvl_pan.py:130,157`).
    """
    B, H, W, C = x.shape
    oh, ow = out_hw
    rows = []
    for i in range(oh):
        h0, h1 = (i * H) // oh, -(-((i + 1) * H) // oh)
        cols = []
        for j in range(ow):
            w0, w1 = (j * W) // ow, -(-((j + 1) * W) // ow)
            cols.append(jnp.max(x[:, h0:h1, w0:w1, :], axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)  # (B, oh, ow, C)


class MultiHeadAttention(nn.Module):
    """torch.nn.MultiheadAttention-equivalent (batch_first, packed qkv proj).

    Ref usage: 8-head MHA over 27 image-patch tokens with text queries
    (`repvl_pan.py:131,173-177`). Parameters mirror torch's layout
    (in_proj packed as [q; k; v]) so converted weights drop straight in.
    """

    embed_dim: int
    num_heads: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, query: jax.Array, key: jax.Array,
                 value: jax.Array,
                 attn_mask: Optional[jax.Array] = None) -> jax.Array:
        """attn_mask: optional additive (Lq, Lk) fp mask (e.g. causal -inf)."""
        E, H = self.embed_dim, self.num_heads
        hd = E // H
        in_proj_w = self.param(
            'in_proj_weight',
            nn.initializers.xavier_uniform(), (3 * E, E), jnp.float32)
        in_proj_b = self.param(
            'in_proj_bias', nn.initializers.zeros, (3 * E,), jnp.float32)
        out_w = self.param(
            'out_proj_weight',
            nn.initializers.xavier_uniform(), (E, E), jnp.float32)
        out_b = self.param(
            'out_proj_bias', nn.initializers.zeros, (E,), jnp.float32)

        wq, wk, wv = jnp.split(in_proj_w.astype(self.dtype), 3, axis=0)
        bq, bk, bv = jnp.split(in_proj_b.astype(self.dtype), 3, axis=0)
        q = query @ wq.T + bq      # (B, Lq, E)
        k = key @ wk.T + bk        # (B, Lk, E)
        v = value @ wv.T + bv

        B, Lq, _ = q.shape
        Lk = k.shape[1]
        q = q.reshape(B, Lq, H, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, Lk, H, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, Lk, H, hd).transpose(0, 2, 1, 3)

        scores = jnp.einsum('bhqd,bhkd->bhqk', q, k,
                            preferred_element_type=jnp.float32)
        scores = scores / jnp.sqrt(jnp.asarray(hd, jnp.float32))
        if attn_mask is not None:
            scores = scores + attn_mask.astype(jnp.float32)
        attn = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        out = jnp.einsum('bhqk,bhkd->bhqd', attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, Lq, E)
        return out @ out_w.astype(self.dtype).T + out_b.astype(self.dtype)
