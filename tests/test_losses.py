"""Loss parity tests: jnp losses vs independent torch re-derivations of the
reference math (`loss/region_text_contrastive.py`, `loss/iou_loss.py`,
`loss/dfl_loss.py`), same inputs."""

import math

import numpy as np
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as tF

from yoloclip_tpu.train.losses import (combined_loss_compat,
                                       distributed_focal_loss,
                                       dfl_soft_targets, iou_loss,
                                       region_text_contrastive_loss)

RNG = np.random.RandomState(0)


def torch_contrastive(region, text, labels, valid, temperature=0.1, topk=3,
                      label_smoothing=0.0):
    """Independent torch re-derivation of the reference contrastive loss."""
    region = torch.from_numpy(region)
    text = torch.from_numpy(text)
    labels = torch.from_numpy(labels)
    valid = torch.from_numpy(valid)
    B, R, E = region.shape
    C = text.shape[1]
    M = labels.shape[1]
    region = region[:, :M, :]
    region = tF.normalize(region, p=2, dim=-1)
    text = tF.normalize(text, p=2, dim=-1)
    sim = torch.bmm(region, text.transpose(1, 2))
    logits = sim / temperature
    labels_oh = tF.one_hot(labels.long(), C).float()
    if label_smoothing > 0:
        labels_oh = (1 - label_smoothing) * labels_oh + label_smoothing / C
    if topk > 1:
        pos_sim = sim * labels_oh
        tv, _ = torch.topk(pos_sim, min(topk, C), dim=-1)
        topk_min = min(topk, int(labels_oh.sum(-1).clamp(min=1).min().item()))
        w = tv.sum(-1, keepdim=True) / topk_min
        weighted = labels_oh * w
    else:
        weighted = labels_oh
    logp = tF.log_softmax(logits, dim=-1)
    loss = -(weighted * logp)
    mask3 = valid.unsqueeze(-1).expand_as(loss).float()
    loss = loss * mask3
    pos_count = labels_oh.sum(-1).clamp(min=1)
    loss = loss.sum(-1) / pos_count
    return float(loss.sum() / mask3.sum())


@pytest.mark.parametrize('smoothing', [0.0, 0.1])
def test_contrastive_matches_torch(smoothing):
    B, R, M, C, E = 2, 40, 10, 7, 16
    region = RNG.randn(B, R, E).astype(np.float32)
    text = RNG.randn(B, C, E).astype(np.float32)
    labels = RNG.randint(0, C, (B, M)).astype(np.int32)
    valid = RNG.rand(B, M) > 0.3
    want = torch_contrastive(region, text, labels, valid,
                             label_smoothing=smoothing)
    got = float(region_text_contrastive_loss(
        jnp.asarray(region), jnp.asarray(text), jnp.asarray(labels),
        jnp.asarray(valid), label_smoothing=smoothing))
    assert got == pytest.approx(want, rel=1e-5)


def test_contrastive_invalid_labels_masked():
    B, R, M, C, E = 1, 20, 5, 4, 8
    region = RNG.randn(B, R, E).astype(np.float32)
    text = RNG.randn(B, C, E).astype(np.float32)
    labels = np.array([[0, 1, 9, 2, 7]], np.int32)   # 9, 7 out of range
    out = float(region_text_contrastive_loss(
        jnp.asarray(region), jnp.asarray(text), jnp.asarray(labels), None))
    assert np.isfinite(out)
    # equivalent to masking those rows
    valid = np.array([[True, True, False, True, False]])
    safe_labels = np.array([[0, 1, 0, 2, 0]], np.int32)
    want = float(region_text_contrastive_loss(
        jnp.asarray(region), jnp.asarray(text), jnp.asarray(safe_labels),
        jnp.asarray(valid)))
    assert out == pytest.approx(want, rel=1e-6)


def torch_iou_loss(pred, target, weights, iou_type='ciou', eps=1e-7):
    """Independent torch re-derivation of the reference IoU loss family."""
    p = torch.from_numpy(pred)
    t = torch.from_numpy(target)
    px1, py1, px2, py2 = p.unbind(-1)
    tx1, ty1, tx2, ty2 = t.unbind(-1)
    pa = (px2 - px1) * (py2 - py1)
    ta = (tx2 - tx1) * (ty2 - ty1)
    iw = (torch.minimum(px2, tx2) - torch.maximum(px1, tx1)).clamp(min=0)
    ih = (torch.minimum(py2, ty2) - torch.maximum(py1, ty1)).clamp(min=0)
    inter = iw * ih
    union = pa + ta - inter
    iou = inter / (union + eps)
    ex1, ey1 = torch.minimum(px1, tx1), torch.minimum(py1, ty1)
    ex2, ey2 = torch.maximum(px2, tx2), torch.maximum(py2, ty2)
    if iou_type == 'iou':
        loss = 1 - iou
    elif iou_type == 'giou':
        enclose = (ex2 - ex1) * (ey2 - ey1)
        loss = 1 - (iou - (enclose - union) / (enclose + eps))
    else:
        cd2 = ((px1 + px2) / 2 - (tx1 + tx2) / 2) ** 2 + \
              ((py1 + py2) / 2 - (ty1 + ty2) / 2) ** 2
        dg2 = (ex2 - ex1) ** 2 + (ey2 - ey1) ** 2
        if iou_type == 'diou':
            loss = 1 - (iou - cd2 / (dg2 + eps))
        else:
            v = (4 / math.pi ** 2) * (
                torch.atan((px2 - px1) / (py2 - py1 + eps))
                - torch.atan((tx2 - tx1) / (ty2 - ty1 + eps))) ** 2
            alpha = v / (1 - iou + v + eps)
            loss = 1 - (iou - (cd2 / (dg2 + eps) + alpha * v))
    if weights is not None:
        loss = loss * torch.from_numpy(weights.astype(np.float32))
    return float(loss.mean())


@pytest.mark.parametrize('iou_type', ['iou', 'giou', 'diou', 'ciou'])
def test_iou_loss_matches_torch(iou_type):
    B, M = 3, 20
    xy = RNG.rand(B, M, 2).astype(np.float32) * 500
    wh = RNG.rand(B, M, 2).astype(np.float32) * 100 + 1
    pred = np.concatenate([xy, xy + wh], -1)
    xy2 = xy + RNG.randn(B, M, 2).astype(np.float32) * 20
    wh2 = wh * (1 + RNG.randn(B, M, 2).astype(np.float32) * 0.2)
    target = np.concatenate([xy2, xy2 + np.abs(wh2)], -1).astype(np.float32)
    weights = (RNG.rand(B, M) > 0.4)
    want = torch_iou_loss(pred, target, weights, iou_type)
    got = float(iou_loss(jnp.asarray(pred), jnp.asarray(target),
                         jnp.asarray(weights), iou_type=iou_type))
    assert got == pytest.approx(want, rel=1e-4, abs=1e-5)


def test_dfl_matches_torch_cross_entropy():
    N, nb = 50, 17
    logits = RNG.randn(N, nb).astype(np.float32)
    targets = RNG.randint(0, nb, N).astype(np.int32)
    want = float(tF.cross_entropy(torch.from_numpy(logits),
                                  torch.from_numpy(targets.astype(np.int64))))
    got = float(distributed_focal_loss(jnp.asarray(logits),
                                       jnp.asarray(targets), reg_max=16))
    assert got == pytest.approx(want, rel=1e-5)


def test_dfl_soft_targets_expectation_roundtrip():
    d = jnp.asarray([0.0, 3.25, 15.9], jnp.float32)
    t = dfl_soft_targets(d, 16)
    assert t.shape == (3, 17)
    np.testing.assert_allclose(np.asarray(t.sum(-1)), 1.0, rtol=1e-6)
    expect = np.asarray((t * np.arange(17)).sum(-1))
    np.testing.assert_allclose(expect, [0.0, 3.25, 15.9], atol=1e-5)


def test_combined_loss_compat_structure():
    B, A, M, C, E = 2, 60, 10, 5, 16
    outputs = {
        'obj_embeddings': jnp.asarray(RNG.randn(B, A, E), jnp.float32),
        'text_embeddings': jnp.asarray(RNG.randn(B, C, E), jnp.float32),
        'boxes': jnp.asarray(np.abs(RNG.randn(B, A, 4)) * 100, jnp.float32),
    }
    batch = {
        'boxes': jnp.asarray(np.abs(RNG.randn(B, M, 4)) * 100, jnp.float32),
        'class_ids': jnp.asarray(RNG.randint(0, C, (B, M)), jnp.int32),
        'valid_mask': jnp.asarray(RNG.rand(B, M) > 0.5),
    }
    weights = {'contrastive': 1.0, 'iou': 5.0, 'dfl': 1.0}
    total, parts = combined_loss_compat(outputs, batch, weights,
                                        label_smoothing=0.1)
    assert float(parts['dfl_loss']) == 0.0   # reference: permanently inert
    want = (1.0 * float(parts['contrastive_loss'])
            + 5.0 * float(parts['iou_loss']))
    assert float(total) == pytest.approx(want, rel=1e-6)
