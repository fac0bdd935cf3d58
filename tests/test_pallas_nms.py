"""Pallas NMS keep kernel vs the XLA greedy/fixpoint oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from yoloclip_tpu.ops.boxes import pairwise_iou
from yoloclip_tpu.ops.nms import _fixpoint_keep, _greedy_keep
from yoloclip_tpu.ops.pallas.nms import nms_keep_pallas


def random_candidates(rng, n, overlap=0.6):
    """Score-sorted boxes with heavy overlap to force suppression chains."""
    centers = rng.rand(n, 2) * 200
    centers[n // 2:] = centers[:n - n // 2] + rng.randn(n - n // 2, 2) * overlap * 20
    wh = 20 + rng.rand(n, 2) * 60
    boxes = np.concatenate([centers - wh / 2, centers + wh / 2], -1)
    return boxes.astype(np.float32)


@pytest.mark.parametrize('n,valid_frac', [(256, 1.0), (300, 0.5), (64, 0.2)])
def test_pallas_keep_matches_xla(n, valid_frac):
    rng = np.random.RandomState(0)
    boxes = jnp.asarray(random_candidates(rng, n))
    valid = jnp.asarray(rng.rand(n) < valid_frac)
    iou = pairwise_iou(boxes, boxes)
    want_greedy = np.asarray(_greedy_keep(iou, valid, 0.45))
    want_fix = np.asarray(_fixpoint_keep(iou, valid, 0.45))
    np.testing.assert_array_equal(want_greedy, want_fix)

    got = np.asarray(nms_keep_pallas(boxes[None], valid[None],
                                     jnp.float32(0.45))[0])
    np.testing.assert_array_equal(got, want_greedy)


def test_pallas_keep_batched():
    rng = np.random.RandomState(1)
    B, n = 3, 128
    boxes = np.stack([random_candidates(rng, n) for _ in range(B)])
    valid = rng.rand(B, n) < 0.8
    got = np.asarray(nms_keep_pallas(jnp.asarray(boxes),
                                     jnp.asarray(valid),
                                     jnp.float32(0.45)))
    for b in range(B):
        iou = pairwise_iou(jnp.asarray(boxes[b]), jnp.asarray(boxes[b]))
        want = np.asarray(_greedy_keep(iou, jnp.asarray(valid[b]), 0.45))
        np.testing.assert_array_equal(got[b], want)


def test_pallas_keep_long_chain():
    """A chain a>b>c>d... where each suppresses the next: greedy keeps the
    even-ranked ones. Exercises multi-sweep convergence."""
    n = 64
    boxes = np.zeros((n, 4), np.float32)
    for i in range(n):
        boxes[i] = [i * 5.0, 0.0, i * 5.0 + 10.0, 10.0]  # 50% IoU with next
    valid = np.ones(n, bool)
    iou = pairwise_iou(jnp.asarray(boxes), jnp.asarray(boxes))
    want = np.asarray(_greedy_keep(iou, jnp.asarray(valid), 0.3))
    got = np.asarray(nms_keep_pallas(jnp.asarray(boxes)[None],
                                     jnp.asarray(valid)[None],
                                     jnp.float32(0.3))[0])
    np.testing.assert_array_equal(got, want)
    assert want[::2].all() and not want[1::2].any()
