"""Full-composite numerical parity harness (SURVEY §7 step 4).

The real reference model can't run here (its `clip` dependency and weights
need network access), so this test re-derives the reference's *vision-side*
forward math in torch from its documented architecture (SURVEY §2.3 /
cited source lines), loads it with OUR exported weights, and asserts the
jax pipeline produces the same boxes/scores/class_ids within fp tolerance.
Text embeddings enter as a shared input, exactly as they enter the
reference's forward after CLIP encoding.

This is the detect-path parity contract: backbone -> I-Pool text update ->
FPN/PAN with max-sigmoid attention -> similarity + DFL decode.
"""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from yoloclip_tpu.config import ModelConfig
from yoloclip_tpu.models.yolo_clip import YOLOCLIP
from yoloclip_tpu.utils.convert import export_reference_state_dict


@pytest.fixture(autouse=True)
def _torch_inference_only():
    """Disable autograd around each test WITHOUT leaking global state.

    A module-level ``torch.set_grad_enabled(False)`` runs at pytest
    collection time and silently breaks grad-dependent tests in OTHER
    modules (test_losses_reference's autograd oracle).
    """
    with torch.no_grad():
        yield


# ---------------------------------------------------------------------------
# torch re-derivation of the reference vision stack (behavior from SURVEY
# §2.3 and the cited reference lines; written against the spec, not copied)
# ---------------------------------------------------------------------------

class TConv(nn.Module):
    def __init__(self, ci, co, k=3, s=1):
        super().__init__()
        self.conv = nn.Conv2d(ci, co, k, s, k // 2, bias=False)
        self.bn = nn.BatchNorm2d(co)

    def forward(self, x):
        return F.silu(self.bn(self.conv(x)))


class TBottleneck(nn.Module):
    def __init__(self, c, shortcut=True):
        super().__init__()
        self.cv1 = TConv(c, c // 2, 1)
        self.cv2 = TConv(c // 2, c, 3)
        self.shortcut = shortcut

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.shortcut else y


class TCSP(nn.Module):
    def __init__(self, ci, co, n):
        super().__init__()
        c_ = co // 2
        self.cv1 = TConv(ci, c_, 1)
        self.cv2 = TConv(ci, c_, 1)
        self.cv3 = TConv(2 * c_, co, 1)
        self.bottlenecks = nn.Sequential(*[TBottleneck(c_) for _ in range(n)])

    def forward(self, x):
        return self.cv3(torch.cat([self.bottlenecks(self.cv1(x)),
                                   self.cv2(x)], 1))


class TSPPF(nn.Module):
    def __init__(self, ci, co):
        super().__init__()
        c_ = ci // 2
        self.cv1 = TConv(ci, c_, 1)
        self.cv2 = TConv(4 * c_, co, 1)

    def forward(self, x):
        x = self.cv1(x)
        y1 = F.max_pool2d(x, 5, 1, 2)
        y2 = F.max_pool2d(y1, 5, 1, 2)
        y3 = F.max_pool2d(y2, 5, 1, 2)
        return self.cv2(torch.cat([x, y1, y2, y3], 1))


class TBackbone(nn.Module):
    def __init__(self, ch, dp):
        super().__init__()
        self.stem = TConv(3, ch[0], 3, 2)
        self.stage1 = nn.Sequential(TConv(ch[0], ch[1], 3, 2),
                                    TCSP(ch[1], ch[1], dp[0]))
        self.stage2 = nn.Sequential(TConv(ch[1], ch[2], 3, 2),
                                    TCSP(ch[2], ch[2], dp[1]))
        self.stage3 = nn.Sequential(TConv(ch[2], ch[3], 3, 2),
                                    TCSP(ch[3], ch[3], dp[2]))
        self.stage4 = nn.Sequential(TConv(ch[3], ch[4], 3, 2),
                                    TCSP(ch[4], ch[4], dp[3]),
                                    TSPPF(ch[4], ch[4]))

    def forward(self, x):
        x = self.stage1(self.stem(x))
        c3 = self.stage2(x)
        c4 = self.stage3(c3)
        c5 = self.stage4(c4)
        return c3, c4, c5


class TTextCSP(nn.Module):
    def __init__(self, c, text_dim, n):
        super().__init__()
        c_ = c // 2
        self.cv1 = TConv(c, c_, 1)
        self.cv2 = TConv(c, c_, 1)
        self.cv3 = TConv(2 * c_, c, 1)
        self.bottlenecks = nn.ModuleList([TBottleneck(c_) for _ in range(n)])
        self.text_proj = nn.Linear(text_dim, c_)

    def forward(self, x, text):
        y1 = self.cv1(x)
        proj = self.text_proj(text)                       # (B, C, c_)
        for b in self.bottlenecks:
            y1 = b(y1)
            B, C, H, W = y1.shape
            flat = y1.permute(0, 2, 3, 1).reshape(B, H * W, C)
            scores = flat @ proj.transpose(-1, -2)        # (B, HW, nC)
            w = torch.sigmoid(scores.max(-1, keepdim=True).values)
            y1 = (flat * w).reshape(B, H, W, C).permute(0, 3, 1, 2)
        return self.cv3(torch.cat([y1, self.cv2(x)], 1))


class TIPool(nn.Module):
    def __init__(self, dims, embed=512):
        super().__init__()
        self.mha = nn.MultiheadAttention(embed, 8, batch_first=True)
        self.projections = nn.ModuleList([nn.Linear(d, embed) for d in dims])

    def forward(self, text, feats):
        toks = []
        for proj, fm in zip(self.projections, feats):
            p = F.adaptive_max_pool2d(fm, (3, 3))
            B, C, _, _ = p.shape
            toks.append(proj(p.permute(0, 2, 3, 1).reshape(B, 9, C)))
        toks = torch.cat(toks, 1)
        upd, _ = self.mha(text, toks, toks)
        return text + upd


class TNeck(nn.Module):
    def __init__(self, ch, text_dim, n):
        super().__init__()
        self.lateral_convs = nn.ModuleList([TConv(c, c, 1) for c in ch])
        self.up_channels = nn.ModuleList([TConv(ch[2], ch[1], 1),
                                          TConv(ch[1], ch[0], 1)])
        self.fpn_convs = nn.ModuleList([TConv(c, c, 3) for c in ch])
        self.downsample_convs = nn.ModuleList([TConv(ch[0], ch[1], 3, 2),
                                               TConv(ch[1], ch[2], 3, 2)])
        self.text_csplayers = nn.ModuleList(
            [TTextCSP(c, text_dim, n) for c in ch])
        self.image_pooling_attention = TIPool(ch, text_dim)

    def forward(self, feats, text):
        text = self.image_pooling_attention(text, feats)
        lat = [conv(f) for conv, f in zip(self.lateral_convs, feats)]
        p5 = lat[2]
        p4 = lat[1] + self.up_channels[0](
            F.interpolate(p5, scale_factor=2, mode='nearest'))
        p3 = lat[0] + self.up_channels[1](
            F.interpolate(p4, scale_factor=2, mode='nearest'))
        fpn = [conv(f) for conv, f in zip(self.fpn_convs, [p3, p4, p5])]
        n3 = self.text_csplayers[0](fpn[0], text)
        n4 = self.text_csplayers[1](fpn[1] + self.downsample_convs[0](n3),
                                    text)
        n5 = self.text_csplayers[2](fpn[2] + self.downsample_convs[1](n4),
                                    text)
        return [n3, n4, n5], text


class THead(nn.Module):
    def __init__(self, ci, embed=512, hidden=256, reg_max=16):
        super().__init__()
        self.obj_embed_conv = nn.Sequential(
            TConv(ci, hidden, 3), TConv(hidden, hidden, 3),
            nn.Conv2d(hidden, embed, 1))
        self.box_conv = nn.Sequential(
            TConv(ci, hidden, 3), TConv(hidden, hidden, 3),
            nn.Conv2d(hidden, 4 * (reg_max + 1), 1))


class TRef(nn.Module):
    """Reference composite vision forward (text supplied externally)."""

    def __init__(self, cfg: ModelConfig):
        super().__init__()
        chs = cfg.backbone_channels()
        dp = cfg.backbone_depths()
        fc = cfg.feature_channels()
        self.backbone = TBackbone(chs, dp)
        self.neck = TNeck(fc, cfg.embed_dim, cfg.neck_bottlenecks)
        self.contrastive_heads = nn.ModuleList([THead(c) for c in fc])
        self.box_head = nn.Module()
        self.box_head.box_convs = nn.ModuleList([
            nn.Sequential(TConv(c, 256, 3), TConv(256, 256, 3),
                          nn.Conv2d(256, 68, 1)) for c in fc])
        self.strides = list(cfg.strides)
        self.reg_max = cfg.reg_max

    def forward(self, images, text):
        feats = self.backbone(images)
        pan, text = self.neck(list(feats), text)
        sims = []
        for head, f in zip(self.contrastive_heads, pan):
            obj = head.obj_embed_conv(f)
            B, E, H, W = obj.shape
            o = F.normalize(obj.permute(0, 2, 3, 1).reshape(B, H * W, E),
                            dim=-1)
            t = F.normalize(text, dim=-1)
            sims.append(o @ t.transpose(1, 2))            # (B, HW, C)
        boxes = []
        for conv, f, stride in zip(self.box_head.box_convs, pan,
                                   self.strides):
            pred = conv(f)
            B, C, H, W = pred.shape
            p = pred.reshape(B, 4, C // 4, H, W).softmax(2)
            reg = (p * torch.arange(C // 4).float().view(1, 1, -1, 1, 1)
                   ).sum(2).permute(0, 2, 3, 1)           # (B, H, W, 4)
            gy, gx = torch.meshgrid(torch.arange(H), torch.arange(W),
                                    indexing='ij')
            grid = torch.stack([gx, gy], -1).float()
            xy = (grid + reg[..., :2]) * stride
            wh = torch.exp(reg[..., 2:]) * stride
            b = torch.cat([xy - wh / 2, xy + wh / 2], -1)
            boxes.append(b.reshape(B, H * W, 4))
        sim = torch.cat(sims, 1)
        return (torch.cat(boxes, 1), sim.max(-1).values, sim.argmax(-1))


def test_full_composite_parity_with_torch():
    cfg = ModelConfig(image_size=(160, 160))
    model = YOLOCLIP(cfg)
    rng = jax.random.PRNGKey(0)
    images = jax.random.uniform(rng, (2, 160, 160, 3))
    text = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 512))
    variables = model.init(rng, images, text, with_aux_box=True)

    # randomize BN stats so eval-mode normalization is non-trivial
    def jitter(tree, key=[0]):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = jitter(v)
            elif k == 'mean':
                out[k] = v + 0.05 * np.random.RandomState(key[0]).randn(
                    *v.shape).astype(np.float32)
            elif k == 'var':
                out[k] = v + 0.3 * np.random.RandomState(key[0] + 1).rand(
                    *v.shape).astype(np.float32)
            else:
                out[k] = v
            key[0] += 1
        return out

    variables = {'params': variables['params'],
                 'batch_stats': jitter(variables['batch_stats'])}

    out = model.apply(variables, images, text)

    # load the same weights into the torch re-derivation
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_reference_state_dict(variables, cfg).items()}
    tref = TRef(cfg)
    missing, unexpected = tref.load_state_dict(sd, strict=False)
    # only BN num_batches_tracked counters may be missing
    assert all('num_batches_tracked' in m for m in missing), missing
    assert not unexpected, unexpected
    tref.eval()

    t_boxes, t_scores, t_ids = tref(
        torch.from_numpy(np.asarray(images).transpose(0, 3, 1, 2)),
        torch.from_numpy(np.asarray(text)))

    np.testing.assert_allclose(np.asarray(out['boxes']), t_boxes.numpy(),
                               rtol=1e-3, atol=0.05)
    np.testing.assert_allclose(np.asarray(out['scores']), t_scores.numpy(),
                               rtol=1e-3, atol=1e-3)
    ids_a = np.asarray(out['class_ids'])
    ids_b = t_ids.numpy()
    # argmax ties can differ at fp noise level; require near-total agreement
    assert (ids_a == ids_b).mean() > 0.99
